"""Cross-kernel scheduling sweep: per-word scalar-branch amortization
(group = rows per grid step) x word-cull on/off, on real sorted bounce
waves.  The cross kernel's measured 44.6/80.2 ms (colonnade/atrium)
sits ~3x above its ~15 ms VPU-op roofline; the gap is per-row overhead
(grid steps + ~0.3 us per pl.when).  group>1 divides both; dropping
the word cull removes the branches entirely (right when divergent rows
cross most words anyway — colonnade bounce rows average 57 crossed
chunks over W=46 words).

    PYTHONPATH=/root/repo:/root/.axon_site nohup python \
        benchmarks/r3_cross_sweep.py > /tmp/r3_cross_sweep.log 2>&1 &
"""

import time

import numpy as np

N_TILES = 1024
TD = 16


def timed(label, fn, *args, reps=5):
    # block_until_ready on array outputs does not drain the axon queue;
    # use the host-fetch protocol (benchmarks/_timing.py).
    from _timing import drained

    return drained(label, fn, *args, reps=reps)


def bounce_wave(scene, cam_params):
    import jax
    import jax.numpy as jnp

    from yuki_tpu import bsdf as bsdf_mod
    from yuki_tpu import traverse
    from yuki_tpu.camera import Camera
    from yuki_tpu.integrators import _BENIGN_D
    from yuki_tpu.sampling import SampleCtx, UniformSampler
    from yuki_tpu.surface import make_surface, spawn_ray

    data, meta = scene.data, scene.meta
    camera = Camera.create(cam_params, 1920, 1080)
    n = N_TILES * TD * TD
    tx = (np.arange(N_TILES) % 120) * TD
    ty = (np.arange(N_TILES) // 120) * TD
    px = np.broadcast_to(
        tx[:, None, None] + np.arange(TD)[None, :, None], (N_TILES, TD, TD)
    ).reshape(-1)
    py = np.broadcast_to(
        ty[:, None, None] + np.arange(TD)[None, None, :], (N_TILES, TD, TD)
    ).reshape(-1)
    ctx = SampleCtx(
        px=jnp.asarray(px, jnp.int32), py=jnp.asarray(py, jnp.int32),
        sample_index=jnp.uint32(0), seed=jnp.uint32(1),
    )
    sampler = UniformSampler(1)
    p_film = jnp.asarray(np.stack([px + 0.5, py + 0.5], -1), jnp.float32)
    o0, d0 = camera.ray(p_film)
    tmax_full = jnp.full(n, traverse.F32_MAX)

    @jax.jit
    def wave(data, o0, d0):
        hit0 = traverse.intersect(data, meta, o0, d0, tmax_full)
        alive = hit0.hit
        si = make_surface(data, hit0, o0, d0)
        mp = bsdf_mod.gather_materials(data, si, meta)
        u = sampler.get_2d(ctx, 6)
        bs = bsdf_mod.bsdf_sample(mp, si, si.wo, u, meta)
        alive = alive & (bs.pdf > 0.0)
        center = 0.5 * (data.world_lo + data.world_hi)
        o1 = jnp.where(alive[..., None], spawn_ray(si, bs.wi), center)
        d1 = jnp.where(alive[..., None], bs.wi, _BENIGN_D)
        t1 = jnp.where(alive, traverse.F32_MAX, 0.0)
        order = jnp.argsort(traverse.ray_sort_key(data, o1, d1))
        return o1[order], d1[order], t1[order]

    return jax.block_until_ready(wave(data, o0, d0))


def sweep(name, scene, cam_params):
    import jax
    from yuki_tpu.ops import trace_stream as ts

    ch = scene.data.chunks
    print(f"== {name}: chunks={ch.n_treelets} "
          f"W={-(-ch.n_treelets // 32)} ==", flush=True)
    o, d, tm = bounce_wave(scene, cam_params)

    f_xla = jax.jit(lambda o, d, t: ts._cross_words_xla(ch, o, d, t))
    timed("xla dense        ", f_xla, o, d, tm)
    for wc in (True, False):
        for g in (1, 2, 4, 8):
            f = jax.jit(
                lambda o, d, t, g=g, wc=wc: ts._cross_words_tpu(
                    ch, o, d, t, group=g, word_cull=wc)
            )
            timed(f"pallas g={g} cull={int(wc)}", f, o, d, tm)


def main():
    import sys

    from yuki_tpu.scene.testscenes import colonnade

    scene, cam, _ = colonnade()
    sweep("colonnade", scene, cam)

    sys.path.insert(0, "/root/repo")
    from bench import load_atrium

    scene_a, cam_a, _ = load_atrium()
    sweep("atrium", scene_a, cam_a)


if __name__ == "__main__":
    main()
