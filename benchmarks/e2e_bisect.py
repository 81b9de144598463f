"""Attribute the real colonnade wave cost by knockout: time the actual
make_wave_renderer jit at 1024 tiles with depth 1..5, then with the
occlusion pass and the whole NEE pass stubbed out (module monkeypatch
before trace).  The deltas attribute the fused-graph cost in a way
isolated per-pass jits cannot (XLA fuses differently inside one graph).

    PYTHONPATH=/root/repo:/root/.axon_site nohup python \
        benchmarks/e2e_bisect.py > /tmp/e2e_bisect.log 2>&1 &
"""

import time

import numpy as np

N_TILES = 1024


def bench(scene, cam_params, max_depth, reps=3):
    import jax.numpy as jnp

    from yuki_tpu.camera import Camera
    from yuki_tpu.film import FilmSettings, film_tiles
    from yuki_tpu.integrators import PathParams
    from yuki_tpu.renderer import make_wave_renderer
    from yuki_tpu.sampling import UniformSampler

    camera = Camera.create(cam_params, 1920, 1080)
    tiles = film_tiles(FilmSettings(res=(1920, 1080), tile_dim=16))
    render = make_wave_renderer(
        scene, camera, UniformSampler(1), PathParams(max_depth=max_depth),
        16, N_TILES,
    )
    origins = np.asarray(
        [[t.x0, t.y0] for t in tiles[:N_TILES]], dtype=np.int32
    )
    origins = jnp.asarray(origins)
    t0 = time.monotonic()
    px, _ = render(origins, jnp.int32(0), jnp.uint32(1))
    px.block_until_ready()
    comp = time.monotonic() - t0
    t0 = time.monotonic()
    for s in range(reps):
        px, _ = render(origins, jnp.int32(s + 1), jnp.uint32(1))
    px.block_until_ready()
    return (time.monotonic() - t0) / reps, comp


def main():
    import jax
    import jax.numpy as jnp

    from yuki_tpu import integrators as intg
    from yuki_tpu import traverse
    from yuki_tpu.scene.testscenes import colonnade

    scene, cam, _ = colonnade()
    print(f"backend={jax.default_backend()}", flush=True)

    for d in (1, 2, 3, 5):
        dt, comp = bench(scene, cam, d)
        print(f"[full] depth={d}: {dt*1e3:.0f} ms/wave (compile {comp:.0f}s)",
              flush=True)

    # Knock out occlusion: every shadow ray reports unoccluded.
    real_any = traverse.any_intersect
    traverse.any_intersect = lambda scene, meta, o, d, t, skip: (
        jnp.zeros(o.shape[:-1], bool)
    )
    dt, comp = bench(scene, cam, 5)
    print(f"[no-occlusion] depth=5: {dt*1e3:.0f} ms/wave (compile {comp:.0f}s)",
          flush=True)
    traverse.any_intersect = real_any

    # Knock out NEE entirely (sampling + occlusion + contribution).
    real_nee = intg._nee
    intg._nee = lambda scene, meta, sampler, ctx, si, mp, dim, active: (
        jnp.zeros_like(si.p), dim + 2 * len(meta.light_types)
    )
    dt, comp = bench(scene, cam, 5)
    print(f"[no-nee] depth=5: {dt*1e3:.0f} ms/wave (compile {comp:.0f}s)",
          flush=True)
    intg._nee = real_nee

    # Knock out closest-hit traversal: every ray reports a miss at t_max.
    real_int = traverse.intersect
    traverse.intersect = lambda scene, meta, o, d, t, **kw: traverse.SceneHit(
        hit=jnp.zeros(o.shape[:-1], bool),
        t=t,
        prim=jnp.zeros(o.shape[:-1], jnp.int32),
        sphere=jnp.full(o.shape[:-1], -1, jnp.int32),
        b0=jnp.zeros(o.shape[:-1]),
        b1=jnp.zeros(o.shape[:-1]),
    )
    dt, comp = bench(scene, cam, 5)
    print(f"[no-closest] depth=5: {dt*1e3:.0f} ms/wave (compile {comp:.0f}s)",
          flush=True)
    traverse.intersect = real_int

    print("done", flush=True)


if __name__ == "__main__":
    main()
