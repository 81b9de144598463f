"""Render runtime: host-side manager driving device wavefront launches.

Maps the reference's 3-tier thread topology (SURVEY.md §2.6,
yuki/src/renderer/):
  Renderer facade   -> Renderer here: launch/check_status/kill with a
                       monotone render_id filtering stale progress
                       (renderer/mod.rs:40-178)
  RenderManager     -> a single Python manager thread: orders tiles
                       (spiral), replicates the tile list per sample
                       generation when accumulating
                       (render_manager.rs:130-143), and aggregates
                       progress into Mrays/s + ETA estimates
                       (render_manager.rs:246-322)
  RenderWorker pool -> the TPU itself: a "wave" of tiles is one jitted
                       wavefront dispatch; the mid-tile interrupt
                       predicate (render_worker.rs:240-249) becomes a
                       cancellation check between dispatches.
"""

from __future__ import annotations

import queue
import threading
import time
from collections import deque
from dataclasses import dataclass, field
from typing import Callable, List, Optional, Union

import numpy as np
import jax
import jax.numpy as jnp

from .. import integrators as intg
from ..camera import Camera, CameraParameters
from ..film import Film, FilmSettings, FilmTile, film_tiles
from ..sampling import SampleCtx, Sampler, force_single_sample
from ..scene.data import Scene


@dataclass(frozen=True)
class RenderSettings:
    """renderer/mod.rs:34-38. mark_tiles draws magenta in-progress tiles;
    use_single_render_thread serializes waves to one tile for debugging."""

    mark_tiles: bool = False
    use_single_render_thread: bool = False
    wave_tiles: int = 256  # tiles per device dispatch
    # Sample generations folded into one dispatch (non-accumulate mode
    # only; accumulate shows per-sample progress by design).  Amortizes
    # the fixed per-dispatch cost for dense scenes; the wave loop clamps
    # it to the remaining spp.
    samples_per_launch: int = 1


IntegratorConfig = Union[
    intg.WhittedParams, intg.PathParams, str
]  # str for debug integrators: "bvh_intersections" | "geometry_normals" | ...


def make_wave_renderer(
    scene: Scene,
    camera: Camera,
    sampler: Sampler,
    integrator: IntegratorConfig,
    tile_dim: int,
    wave_tiles: int,
    samples_per_launch: int = 1,
):
    """Build the jitted per-wave render step.

    Returns fn(tile_origins [B,2] i32, sample_index i32, seed u32)
      -> (pixels [B,td,td,3] f32, rays i64-ish f32 scalar).
    Mirrors Integrator::render's per-pixel loop (integrators/mod.rs:119-185)
    flattened into one wavefront: every lane is one pixel sample.

    samples_per_launch > 1 runs that many consecutive sample generations
    (sample_index .. +S-1) inside ONE dispatch, returning their pixel SUM
    (divide by S for the mean).  Every dispatch pays a fixed tunnel round
    trip (~25 ms measured on the axon backend — benchmarks/
    r3_dispatch_latency.py), so dense-scene waves whose per-sample work
    is comparable to that fixed cost amortize it S-fold.  Matches the
    sharded renderer's samples_per_launch (parallel/__init__.py).
    """
    td = tile_dim
    data = scene.data
    meta = scene.meta

    # Scene arrays travel as a jit ARGUMENT, not a closure constant: the
    # remote compiler inlines closure constants into the compile payload,
    # and the chunk + treelet triangle tables alone exceed its request
    # size limit on large scenes (HTTP 413).  Passing the pytree keeps
    # the payload small and the arrays device-resident across calls.
    def render_one(data, origins, sample_index, seed):
        b = origins.shape[0]
        iy, ix = jnp.meshgrid(
            jnp.arange(td, dtype=jnp.int32),
            jnp.arange(td, dtype=jnp.int32),
            indexing="ij",
        )
        px = (origins[:, 0, None, None] + ix[None]).reshape(-1)
        py = (origins[:, 1, None, None] + iy[None]).reshape(-1)
        ctx = SampleCtx(px=px, py=py, sample_index=sample_index, seed=seed)
        if isinstance(integrator, intg.PathParams):
            from .. import traverse
            from ..ops import path_fused

            if path_fused.use_wave_fused(meta, sampler):
                # Fully-fused wave (ops/path_fused.py): raygen + every
                # bounce in Pallas kernels, plane-major carry, no
                # per-bounce XLA.  Consumes the same sampler dims as the
                # raygen + path_li chain below.
                interp = (path_fused.PATH_FUSED_MODE == "interpret"
                          or traverse.FORCE_PALLAS_INTERPRET)
                li, rcount = path_fused.path_li_wave(
                    data, meta, camera, sampler, integrator, px, py,
                    sample_index, seed, interpret=interp,
                )
                return (
                    li.reshape(b, td, td, 3),
                    jnp.sum(rcount.astype(jnp.float32)),
                )
        u = sampler.get_2d(ctx, 0)
        p_film = jnp.stack(
            [px.astype(jnp.float32), py.astype(jnp.float32)], axis=-1
        ) + u
        o, d = camera.ray(p_film)
        if isinstance(integrator, intg.PathParams):
            res = intg.path_li(data, meta, integrator, sampler, ctx, o, d, dim=2)
        elif isinstance(integrator, intg.WhittedParams):
            res = intg.whitted_li(data, meta, integrator, sampler, ctx, o, d, dim=2)
        elif integrator == "bvh_intersections":
            res = intg.bvh_intersections_li(data, meta, o, d)
        elif integrator == "geometry_normals":
            res = intg.geometry_normals_li(data, meta, o, d)
        elif integrator == "shading_normals":
            res = intg.shading_normals_li(data, meta, o, d)
        elif integrator == "shading_uvs":
            res = intg.shading_uvs_li(data, meta, o, d)
        else:
            raise ValueError(f"unknown integrator {integrator!r}")
        pixels = res.li.reshape(b, td, td, 3)
        rays = jnp.sum(res.ray_count.astype(jnp.float32))
        return pixels, rays

    def render_wave(data, origins, sample_index, seed):
        pixels, rays = render_one(data, origins, sample_index, seed)
        if samples_per_launch > 1:
            # lax.scan instead of Python unrolling: the (large) per-sample
            # body compiles ONCE regardless of samples_per_launch, so big
            # launch batches (which amortize the ~80 ms remote-dispatch
            # round trip, benchmarks/r3_outxfer.py) stay compile-cheap.
            # Sequential carry adds keep the sum bitwise identical to the
            # unrolled loop (test_samples_per_launch_bitwise).
            def step(carry, k):
                px_c, r_c = carry
                p_k, r_k = render_one(
                    data, origins, sample_index + k, seed
                )
                return (px_c + p_k, r_c + r_k), None

            (pixels, rays), _ = jax.lax.scan(
                step, (pixels, rays),
                jnp.arange(1, samples_per_launch, dtype=jnp.int32),
            )
        return pixels, rays

    jitted = jax.jit(render_wave)

    def call(origins, sample_index, seed):
        return jitted(data, origins, sample_index, seed)

    return call


# --- status messages (renderer/mod.rs:21-32) ------------------------------


@dataclass
class RenderProgress:
    render_id: int
    tiles_done: int
    tiles_total: int
    current_rays: int
    rays_per_sec: float
    approx_remaining_s: float


@dataclass
class RenderFinished:
    render_id: int
    ray_count: int
    elapsed_s: float


@dataclass
class RenderError:
    """Manager-thread failure surfaced to the caller (the reference panics
    its worker thread and logs via the panic hook, main.rs:74-92; we
    propagate instead)."""

    render_id: int
    message: str


class Renderer:
    """Facade owning the manager thread (renderer/mod.rs:40-184)."""

    def __init__(self):
        self._thread: Optional[threading.Thread] = None
        self._cancel = threading.Event()
        self._msgs: "queue.Queue" = queue.Queue()
        self._render_id = 0
        self._active = False

    def is_active(self) -> bool:
        return self._thread is not None and self._thread.is_alive()

    def launch(
        self,
        scene: Scene,
        camera_params: CameraParameters,
        film: Film,
        sampler: Sampler,
        integrator: IntegratorConfig,
        film_settings: FilmSettings,
        render_settings: RenderSettings = RenderSettings(),
        force_single_sample_flag: bool = False,
        match_seed: int = 0,
    ) -> int:
        """Kills any in-flight render and starts a new one; returns its id."""
        self.kill()
        self._render_id += 1
        rid = self._render_id
        self._cancel = threading.Event()
        args = (
            rid, scene, camera_params, film, sampler, integrator,
            film_settings, render_settings, force_single_sample_flag,
            match_seed, self._cancel, self._msgs,
        )
        self._thread = threading.Thread(
            target=_render_job, args=args, daemon=True
        )
        self._thread.start()
        return rid

    def check_status(self) -> List[Union[RenderProgress, RenderFinished]]:
        """Drains messages, dropping those from stale render ids
        (renderer/mod.rs:61-120)."""
        out = []
        while True:
            try:
                msg = self._msgs.get_nowait()
            except queue.Empty:
                break
            if msg.render_id == self._render_id:
                out.append(msg)
        return out

    def kill(self):
        if self._thread is not None and self._thread.is_alive():
            self._cancel.set()
            self._thread.join()
        self._thread = None

    def __del__(self):
        try:
            self.kill()
        except Exception:
            pass


def _render_job(*args):
    rid, msgs = args[0], args[-1]
    try:
        _render_job_inner(*args)
    except Exception as e:  # surface, don't swallow (thread context)
        import logging, traceback

        logging.getLogger("yuki").error(
            "render job failed: %s\n%s", e, traceback.format_exc()
        )
        msgs.put(RenderError(render_id=rid, message=f"{type(e).__name__}: {e}"))


def _render_job_inner(
    rid, scene, camera_params, film, sampler, integrator,
    film_settings, render_settings, force_single, seed, cancel, msgs,
):
    rx, ry = film_settings.effective_res()
    camera = Camera.create(camera_params, rx, ry)
    if force_single:
        sampler = force_single_sample(sampler)

    tiles = film_tiles(film_settings)
    spp = sampler.samples_per_pixel
    film_generation = film.generation

    # Accumulation replicates the tile list once per sample generation
    # (render_manager.rs:130-143); otherwise each wave loops spp on-device
    # launches sequentially.
    if film_settings.accumulate:
        passes = [
            (s, tiles) for s in range(spp)
        ]
    else:
        passes = [(None, tiles)]

    td = film_settings.tile_dim
    wave_tiles = 1 if render_settings.use_single_render_thread else max(
        1, min(render_settings.wave_tiles, len(tiles))
    )
    # Multi-chip: shard the wave's tiles across all local devices (the
    # reference's worker pool, render_manager.rs:197-244, becomes a mesh
    # axis).  Debug integrators stay single-device.
    import jax as _jax

    n_dev = len(_jax.devices())
    if (
        n_dev > 1
        and not render_settings.use_single_render_thread
        and not isinstance(integrator, str)
    ):
        from ..parallel import default_mesh, make_sharded_wave_renderer

        wave_tiles = max(n_dev, (wave_tiles // n_dev) * n_dev)
        mesh = default_mesh(n_tiles_axis=n_dev, n_samples_axis=1)
        sharded = make_sharded_wave_renderer(
            scene, camera, sampler, integrator, td, mesh,
            samples_per_launch=1,
        )

        def render_fn(origins, sample_index, seed):
            return sharded(origins, jnp.int32(sample_index), seed)

        spl = 1
    else:
        # Clamp the launch batch to spp and only batch when every launch
        # is full (spp % spl == 0 keeps the averaging exact).
        spl = max(1, min(render_settings.samples_per_launch, spp))
        while spp % spl:
            spl -= 1
        if film_settings.accumulate or isinstance(integrator, str):
            spl = 1
        render_fn = make_wave_renderer(
            scene, camera, sampler, integrator, td, wave_tiles,
            samples_per_launch=spl,
        )

    start = time.monotonic()
    total_rays = 0
    # Work unit = tile-sample, both modes (the reference replicates tiles
    # per sample generation, render_manager.rs:130-143, so its tile counts
    # weigh every sample; our non-accumulate waves loop spp dispatches
    # internally and must count each, or ETA treats an spp=256 wave like
    # an spp=1 wave).
    tiles_total = sum(len(t) for _, t in passes) * (
        1 if film_settings.accumulate else spp
    )
    tiles_done = 0
    window = deque(maxlen=16)  # sliding throughput window

    def report(wave_rays, elapsed, units):
        nonlocal tiles_done
        tiles_done += units
        window.append((wave_rays, elapsed, units))
        win_rays = sum(r for r, _, _ in window)
        win_time = max(sum(e for _, e, _ in window), 1e-9)
        rps = win_rays / win_time
        tiles_left = tiles_total - tiles_done
        win_units = max(sum(n for _, _, n in window), 1)
        eta = tiles_left * (win_time / win_units)
        msgs.put(
            RenderProgress(
                render_id=rid,
                tiles_done=tiles_done,
                tiles_total=tiles_total,
                current_rays=total_rays,
                rays_per_sec=rps,
                approx_remaining_s=eta,
            )
        )

    for sample_gen, pass_tiles in passes:
        for w0 in range(0, len(pass_tiles), wave_tiles):
            if cancel.is_set():
                return
            wave = pass_tiles[w0 : w0 + wave_tiles]
            ids = np.asarray([t.index for t in wave], dtype=np.int32)
            origins = np.asarray([[t.x0, t.y0] for t in wave], dtype=np.int32)
            if len(wave) < wave_tiles:
                # Pad to the compiled wave shape; padded ids land out of
                # range and are dropped by the film scatter.
                pad = wave_tiles - len(wave)
                ids = np.concatenate(
                    [ids, np.full(pad, film.n_tiles, dtype=np.int32)]
                )
                origins = np.concatenate(
                    [origins, np.zeros((pad, 2), dtype=np.int32)]
                )
            if render_settings.mark_tiles:
                film.mark_tiles(jnp.asarray(ids))
            if film_settings.accumulate:
                t0 = time.monotonic()
                px, rays = render_fn(
                    jnp.asarray(origins), jnp.int32(sample_gen), jnp.uint32(seed)
                )
                wave_rays = float(rays)
                if film.generation == film_generation:
                    film.add_tiles(jnp.asarray(ids), px)
                total_rays += int(wave_rays)
                report(wave_rays, time.monotonic() - t0, len(wave))
            else:
                acc = None
                rays_acc = None
                t0 = time.monotonic()
                for s in range(0, spp, spl):
                    if cancel.is_set():
                        return
                    # render_fn returns the SUM over spl consecutive
                    # sample generations (one dispatch).  Rays accumulate
                    # ON DEVICE: a float() here would sync the remote
                    # dispatch pipeline every launch (~80 ms round trip,
                    # benchmarks/r3_outxfer.py) — one sync per wave keeps
                    # counts exact and the pipeline full.
                    px, rays = render_fn(
                        jnp.asarray(origins), jnp.int32(s), jnp.uint32(seed)
                    )
                    acc = px if acc is None else acc + px
                    rays_acc = rays if rays_acc is None else rays_acc + rays
                wave_rays = float(rays_acc)
                total_rays += int(wave_rays)
                report(wave_rays, time.monotonic() - t0, len(wave) * spp)
                # One generation holding the spp-sample *average* so the
                # film's count-normalize yields the reference's mean.
                if film.generation == film_generation:
                    film.add_tiles(jnp.asarray(ids), acc / spp)

    msgs.put(
        RenderFinished(
            render_id=rid,
            ray_count=total_rays,
            elapsed_s=time.monotonic() - start,
        )
    )
