"""Round-5 atrium-residual probe (VERDICT r4 item 8): atrium renders
0.754 Mrays/s vs colonnade's 1.127 on identical wave shapes/bounce
structure.  Name the per-call gap: time intersect/any_intersect on
REAL first-bounce + NEE waves of BOTH scenes back-to-back, print the
candidate-load statistics (chunks crossed/ray, slot demand, overflow
rays) that drive the slot pipeline's cost, and knock out the traversal
sub-stages per scene.

    PYTHONPATH=/root/repo:/root/.axon_site nohup python \
        benchmarks/r5_atrium.py > /tmp/r5_atrium.log 2>&1 &
"""

import time

import numpy as np

import _timing


N_TILES = 1024
TD = 16


def _waves(scene_tuple, n):
    import jax
    import jax.numpy as jnp

    from yuki_tpu import bsdf as bsdf_mod
    from yuki_tpu import lights as lights_mod
    from yuki_tpu import traverse
    from yuki_tpu.camera import Camera
    from yuki_tpu.integrators import _BENIGN_D
    from yuki_tpu.sampling import SampleCtx, UniformSampler
    from yuki_tpu.surface import make_surface, spawn_ray, spawn_ray_to

    scene, cam_params, _ = scene_tuple
    data, meta = scene.data, scene.meta
    camera = Camera.create(cam_params, 1920, 1080)
    tx = (np.arange(N_TILES) % 120) * TD
    ty = (np.arange(N_TILES) // 120) * TD
    px = np.broadcast_to(
        tx[:, None, None] + np.arange(TD)[None, :, None],
        (N_TILES, TD, TD),
    ).reshape(-1)
    py = np.broadcast_to(
        ty[:, None, None] + np.arange(TD)[None, None, :],
        (N_TILES, TD, TD),
    ).reshape(-1)
    ctx = SampleCtx(
        px=jnp.asarray(px, jnp.int32), py=jnp.asarray(py, jnp.int32),
        sample_index=jnp.uint32(0), seed=jnp.uint32(1),
    )
    sampler = UniformSampler(1)
    p_film = jnp.asarray(np.stack([px + 0.5, py + 0.5], -1), jnp.float32)
    o0, d0 = camera.ray(p_film)
    tmax_full = jnp.full(n, traverse.F32_MAX)

    # data rides as a jit ARGUMENT: closure-captured arrays embed as HLO
    # constants and the atrium scene's blow the remote-compile request
    # body limit (HTTP 413).
    @jax.jit
    def mk(data, o0, d0):
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
        uls = sampler.get_2d(ctx, 2)
        ls = lights_mod.sample_li(data, 0, meta.light_types[0], si, uls)
        o_s, d_s = spawn_ray_to(si, ls.target)
        t_s = jnp.where(alive, 0.9999, 0.0)
        return o1, d1, t1, o_s, d_s, t_s

    parts = jax.device_get(mk(data, o0, d0))
    return (data, meta, o0, d0, tmax_full,
            *(jnp.asarray(p) for p in parts))


def main():
    _timing.enable_compile_cache()
    import jax
    import jax.numpy as jnp

    print("backend=", jax.default_backend(), flush=True)

    import sys
    sys.path.insert(0, "/root/repo")
    from bench import load_atrium
    from yuki_tpu import traverse
    from yuki_tpu.ops import trace_stream as ts
    from yuki_tpu.scene.testscenes import colonnade

    n = N_TILES * TD * TD

    def timed(label, fn, *args, reps=4):
        out = fn(*args)
        leaves = [x for x in jax.tree_util.tree_leaves(out)
                  if hasattr(x, "dtype")]
        jax.device_get(leaves[-1].reshape(-1)[:1])
        t0 = time.monotonic()
        for _ in range(reps):
            out = fn(*args)
        leaves = [x for x in jax.tree_util.tree_leaves(out)
                  if hasattr(x, "dtype")]
        jax.device_get(leaves[-1].reshape(-1)[:1])
        dt = (time.monotonic() - t0) / reps * 1e3
        print(f"  {label}: {dt:8.2f} ms", flush=True)
        return dt

    for name, scene_tuple in (("colonnade", colonnade()),
                              ("atrium", load_atrium())):
        (data, meta, o0, d0, tmax_full, o1, d1, t1, o_s, d_s, t_s
         ) = _waves(scene_tuple, n)
        ch = data.chunks
        print(f"--- {name}: chunks={ch.n_treelets} K={ch.leaf_size} "
              f"n_tris={meta.n_tris} n_spheres={meta.n_spheres} "
              f"slot_mult={meta.slot_mult}/{meta.slot_mult_tight}",
              flush=True)

        # Candidate-load stats on the bounce wave (the slot branch's
        # real input): exact crossings per ray, demand vs budget.
        @jax.jit
        def stats_(ch, o, d, t):
            words = ts.cross_words(ch, o, d, t)
            cnt = sum(
                jax.lax.population_count(words[:, w]).astype(jnp.int32)
                for w in range(words.shape[1])
            )
            return (cnt.sum(), (cnt > 0).sum(), cnt.max(),
                    jnp.sort(cnt)[int(n * 0.99)])

        for wave, (o, d, t) in (("bounce", (o1, d1, t1)),
                                ("shadow", (o_s, d_s, t_s))):
            tot, live, mx, p99 = map(int, jax.device_get(
                stats_(ch, o, d, t)))
            print(f"  {wave}: crossings total={tot} live={live} "
                  f"mean/live={tot / max(live, 1):.2f} max={mx} "
                  f"p99={p99}", flush=True)

        @jax.jit
        def close_(data, o, d, t):
            return traverse.intersect(data, meta, o, d, t,
                                      skip_sort=True)

        @jax.jit
        def anyq_(data, o, d, t, sk):
            return traverse.any_intersect(data, meta, o, d, t, sk,
                                          skip_sort=True)

        import functools
        close = functools.partial(close_, data)
        anyq = functools.partial(anyq_, data)

        skip0 = jnp.zeros(n, jnp.int32)
        timed("closest bounce ", close, o1, d1, t1)
        timed("closest primary", close, o0, d0, tmax_full)
        timed("any shadow     ", anyq, o_s, d_s, t_s, skip0)
    print("done", flush=True)


if __name__ == "__main__":
    main()
