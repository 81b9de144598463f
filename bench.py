"""Benchmark: 1080p path tracing throughput on the local chip.

Prints ONE json line:
  {"metric": ..., "value": N, "unit": "Mrays/s", "vs_baseline": N, ...}

Scenes: the built-in Cornell box (dense-traversal path) and the
procedural 124k-triangle colonnade (pair-list treelet traversal) —
the driver's "Cornell, Sponza-class" pair (BASELINE.md).  Rays are
generated in film-tile order through the same wave machinery the real
renderer uses, so block coherence matches production renders.

The ray metric matches the reference's displayed throughput — ray-scene
intersections per second, counting only closest-hit traversals like
RadianceResult.ray_scene_intersections (yuki/src/integrators/mod.rs:62-74;
shadow rays are traced but not counted).  vs_baseline is against the
driver target of 200 Mrays/s/chip.
"""

import json
import time

import numpy as np


def bench_scene(scene, cam_params, res, spp, max_depth, wave_tiles=1024,
                samples_per_launch=1):
    import jax
    import jax.numpy as jnp

    from yuki_tpu.camera import Camera
    from yuki_tpu.film import FilmSettings, film_tiles
    from yuki_tpu.integrators import PathParams
    from yuki_tpu.renderer import make_wave_renderer
    from yuki_tpu.sampling import UniformSampler

    w, h = res
    camera = Camera.create(cam_params, w, h)
    sampler = UniformSampler(1)
    fs = FilmSettings(res=res, tile_dim=16)
    tiles = film_tiles(fs)
    spl = max(1, min(samples_per_launch, spp))
    while spp % spl:
        spl -= 1
    render = make_wave_renderer(
        scene, camera, sampler, PathParams(max_depth=max_depth), 16,
        wave_tiles, samples_per_launch=spl,
    )

    waves = []
    for w0 in range(0, len(tiles), wave_tiles):
        wave = tiles[w0 : w0 + wave_tiles]
        origins = np.asarray([[t.x0, t.y0] for t in wave], dtype=np.int32)
        if len(wave) < wave_tiles:
            origins = np.concatenate(
                [origins, np.zeros((wave_tiles - len(wave), 2), np.int32)]
            )
        waves.append(jnp.asarray(origins))

    # Warmup/compile on the first wave.  Drain with a SCALAR host fetch:
    # block_until_ready on array outputs does not reliably block on the
    # axon backend (benchmarks/_timing.py), and an undrained warmup puts
    # the minutes-long remote compile INSIDE the timed region — the
    # entire r4 "93x Cornell regression" (BENCH_r04 0.592 vs 55.3) was
    # this: 132.6M rays / 0.592 Mrays/s = 224 s ≈ the cold-cache compile
    # of the (actually 2.3x faster) fused wave, r5_cornell_diag.
    px, rays = render(waves[0], jnp.int32(0), jnp.uint32(1))
    float(rays)

    t0 = time.monotonic()
    total_rays = jnp.float32(0.0)
    for s in range(0, spp, spl):
        for origins in waves:
            px, rays = render(origins, jnp.int32(s), jnp.uint32(1))
            # Accumulate on device; a float() here would force a host sync
            # per wave and serialize the dispatch pipeline.
            total_rays = total_rays + rays
    total_rays = float(total_rays)
    elapsed = time.monotonic() - t0
    return {
        "mrays_s": total_rays / elapsed / 1e6,
        "spp_s": spp / elapsed,
        "elapsed_s": elapsed,
    }


def _stage_knocks(scene):
    """Knockout sets that attribute a scene's wave time to stages.

    Returns [(label, apply_fn, revert_fn)] where apply_fn flips the
    relevant module-level knock knob.  Dense scenes run through the
    fused wave (PATH_FUSED_KNOCK stages); treelet scenes through the
    path_li chain (PATHLI_KNOCK) with traversal sub-knocks
    (TRAVERSE_KNOCK)."""
    from yuki_tpu import traverse
    from yuki_tpu import integrators
    from yuki_tpu.ops import path_fused

    knocks = []
    if scene.meta.traversal == "dense":
        for stage in ("rowsel", "tex", "shade", "occl", "trace"):
            knocks.append(("path_fused." + stage, path_fused,
                           "PATH_FUSED_KNOCK", frozenset([stage])))
    else:
        for stage in ("closest", "shade", "occl", "resolve"):
            knocks.append(("path_li." + stage, integrators,
                           "PATHLI_KNOCK", frozenset([stage])))
        for stage in ("probe", "wide", "bary", "spheres"):
            knocks.append(("traverse." + stage, traverse,
                           "TRAVERSE_KNOCK", frozenset([stage])))
    return knocks


def bench_stages(scene, cam_params, res, max_depth, wave_tiles=1024,
                 samples_per_launch=1):
    """Per-stage attribution by knockout deltas: time ONE production
    wave, then re-time it with each stage knocked out; stage cost ≈
    full − knocked.  Each knock is a separate compile (cached across
    runs via the persistent compilation cache).  Results are WRONG
    images by design — never mixed with the headline numbers."""
    import jax
    import jax.numpy as jnp

    from yuki_tpu.camera import Camera
    from yuki_tpu.film import FilmSettings, film_tiles
    from yuki_tpu.integrators import PathParams
    from yuki_tpu.renderer import make_wave_renderer
    from yuki_tpu.sampling import UniformSampler

    w, h = res
    camera = Camera.create(cam_params, w, h)
    sampler = UniformSampler(1)
    fs = FilmSettings(res=res, tile_dim=16)
    tiles = film_tiles(fs)[:wave_tiles]
    origins = np.asarray([[t.x0, t.y0] for t in tiles], dtype=np.int32)
    if len(tiles) < wave_tiles:
        origins = np.concatenate(
            [origins, np.zeros((wave_tiles - len(tiles), 2), np.int32)]
        )
    origins = jnp.asarray(origins)

    def time_config():
        render = make_wave_renderer(
            scene, camera, sampler, PathParams(max_depth=max_depth), 16,
            wave_tiles, samples_per_launch=samples_per_launch,
        )
        px, rays = render(origins, jnp.int32(0), jnp.uint32(1))
        float(rays)  # drain (block_until_ready is unreliable on axon)
        reps = 3
        t0 = time.monotonic()
        for _ in range(reps):
            px, rays = render(origins, jnp.int32(0), jnp.uint32(1))
        float(rays)
        return (time.monotonic() - t0) / reps * 1e3

    full_ms = time_config()
    stages = {"full_wave_ms": round(full_ms, 1)}
    for label, mod, attr, knockset in _stage_knocks(scene):
        old = getattr(mod, attr)
        setattr(mod, attr, knockset)
        try:
            knocked_ms = time_config()
        finally:
            setattr(mod, attr, old)
        stages[label + "_ms"] = round(full_ms - knocked_ms, 1)
    return stages


def load_atrium():
    """The Sponza-class ASSET scene: generated once to disk, then loaded
    through the pbrt+PLY path like a real asset (loader + treelet build at
    scale — VERDICT r1 item 5)."""
    import os

    from yuki_tpu.app.settings import SceneLoadSettings
    from yuki_tpu.scene.pbrt import load_pbrt

    root = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "scenes", "atrium")
    scene_file = os.path.join(root, "atrium.pbrt")
    if not os.path.exists(scene_file):
        import sys

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tools"))
        from make_atrium_assets import write_scene

        write_scene(root)
    return load_pbrt(SceneLoadSettings(path=scene_file))


def _probe_devices(q):
    # Module-level: the spawn context needs a picklable target.
    import jax

    q.put(len(jax.devices()))


def _device_watchdog(timeout_s: float = 600.0) -> bool:
    """Probe TPU availability in a subprocess with a hard timeout.

    The axon tunnel's device init blocks FOREVER when the remote pool is
    unreachable (observed round 3: multi-hour outage), which would hang
    the driver's round-end bench run.  A subprocess probe + timeout turns
    that into an honest one-line JSON error instead."""
    import multiprocessing as mp
    import sys

    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    p = ctx.Process(target=_probe_devices, args=(q,), daemon=True)
    p.start()
    p.join(timeout_s)
    if p.is_alive() or p.exitcode != 0:
        if p.is_alive():
            p.terminate()
        print(
            json.dumps(
                {
                    "metric": "path_d5_1080p_closest_hit_rays_sponza_class",
                    "value": 0.0,
                    "unit": "Mrays/s",
                    "vs_baseline": 0.0,
                    "error": "tpu backend unavailable (device init timed "
                             f"out after {timeout_s:.0f}s — axon tunnel "
                             "down, not a renderer regression; see "
                             "BENCH_PREVIEW_r02.json for last good run)",
                }
            )
        )
        sys.stdout.flush()
        return False
    return True


def main():
    import os
    import sys

    import jax

    stages_mode = "--stages" in sys.argv[1:]

    # Persistent compilation cache: remote compiles cost minutes; repeat
    # runs of the same graphs (driver round-end, preview iterations)
    # should pay them once.  Same default dir as yuki_tpu/__main__.py.
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("YUKI_TPU_CACHE",
                       os.path.expanduser("~/.yuki_tpu_cache")),
    )

    if os.environ.get("JAX_PLATFORMS", "axon") != "cpu" and not _device_watchdog():
        return

    from yuki_tpu.scene.cornell import cornell
    from yuki_tpu.scene.testscenes import colonnade

    scene_c, cam_c, _ = cornell()
    # Dense-mode waves amortize best large (wave_size_sweep: 33 Mrays/s at
    # 4096 tiles vs 1.5 at 256).
    # samples_per_launch=16 folds a 16-spp pass over each wave into one
    # dispatch (a lax.scan over samples — compile-cheap): the fixed
    # ~80 ms remote dispatch round trip (benchmarks/r3_outxfer.py) was
    # ~36% of the spl=4 e2e; at 16 it is ~9%.
    cornell_stats = bench_scene(scene_c, cam_c, (1920, 1080), spp=16,
                                max_depth=5, wave_tiles=4096,
                                samples_per_launch=16)

    # Treelet scenes: 2048-tile (524k-ray) waves measured +11% over 1024
    # (benchmarks/r5_wavesize.py: 1.251 vs 1.124 Mrays/s — denser waves
    # tighten block coherence and halve dispatch round trips).  4096
    # does NOT compile: the slot stream's prefetched row tables blow the
    # ~1 MB SMEM budget at 1M rays ('prefetched SMEM operand 1' 1.5 MB).
    scene_l, cam_l, _ = colonnade()
    colonnade_stats = bench_scene(
        scene_l, cam_l, (1920, 1080), spp=1, max_depth=5, wave_tiles=2048
    )

    scene_a, cam_a, _ = load_atrium()
    atrium_stats = bench_scene(
        scene_a, cam_a, (1920, 1080), spp=1, max_depth=5, wave_tiles=2048
    )

    stages = {}
    if stages_mode:
        # Per-stage knockout attribution (VERDICT r4 item 6): lets the
        # bench artifact itself diagnose a regression instead of one
        # opaque aggregate.  Not run by the driver (args-less bench.py)
        # — each knockout is its own compile.
        stages["cornell"] = bench_stages(
            scene_c, cam_c, (1920, 1080), max_depth=5, wave_tiles=4096,
            samples_per_launch=16,
        )
        stages["colonnade"] = bench_stages(
            scene_l, cam_l, (1920, 1080), max_depth=5
        )

    # vs_baseline is keyed to the LARGE scene: the driver target is
    # "≥200 Mrays/s/chip on Sponza-class scenes" (BASELINE.md:20-24), and
    # the 124k-triangle colonnade is our Sponza-class workload. Cornell is
    # reported alongside with its own explicit vs_baseline field.
    value = round(colonnade_stats["mrays_s"], 3)
    cornell_v = round(cornell_stats["mrays_s"], 3)
    print(
        json.dumps(
            {
                "metric": "path_d5_1080p_closest_hit_rays_sponza_class",
                "value": value,
                "unit": "Mrays/s",
                "vs_baseline": round(value / 200.0, 4),
                "vs_baseline_sponza_class": round(value / 200.0, 4),
                "vs_baseline_cornell": round(cornell_v / 200.0, 4),
                "cornell_mrays_s": cornell_v,
                "cornell_spp_per_s": round(cornell_stats["spp_s"], 3),
                "colonnade_124k_mrays_s": value,
                "colonnade_spp_per_s": round(colonnade_stats["spp_s"], 3),
                "atrium_asset_mrays_s": round(atrium_stats["mrays_s"], 3),
                "atrium_spp_per_s": round(atrium_stats["spp_s"], 3),
                **({"stages": stages} if stages else {}),
            }
        )
    )


if __name__ == "__main__":
    main()
