"""Round-5 on-chip A/B: fused bundle-walker vs production slot stream.

Times traverse.intersect / any_intersect on REAL colonnade waves
(primary, first-bounce, NEE shadow — generated exactly as path_li
does) with WALKER_* flags off (production slot stream) and on
(ops/trace_walker.py), plus the walker's internal stage split.
Decides the production default per the round-5 hard rule.

    PYTHONPATH=/root/repo:/root/.axon_site nohup python \
        benchmarks/r5_walker.py > /tmp/r5_walker.log 2>&1 &
"""

import time

import numpy as np

import _timing


N_TILES = 1024
TD = 16


def main():
    _timing.enable_compile_cache()
    import jax
    import jax.numpy as jnp

    print("backend=", jax.default_backend(), flush=True)

    from yuki_tpu import bsdf as bsdf_mod
    from yuki_tpu import lights as lights_mod
    from yuki_tpu import traverse
    from yuki_tpu.camera import Camera
    from yuki_tpu.sampling import SampleCtx, UniformSampler
    from yuki_tpu.scene.testscenes import colonnade
    from yuki_tpu.surface import make_surface, spawn_ray, spawn_ray_to
    from yuki_tpu.integrators import _BENIGN_D

    scene, cam_params, _ = colonnade()
    data, meta = scene.data, scene.meta
    print(f"chunks={data.chunks.n_treelets} K={data.chunks.leaf_size}",
          flush=True)

    camera = Camera.create(cam_params, 1920, 1080)
    n = N_TILES * TD * TD
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

    @jax.jit
    def waves(o0, d0):
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

    o1, d1, t1, o_s, d_s, t_s = jax.block_until_ready(waves(o0, d0))
    o1, d1, t1 = map(jnp.asarray, (np.asarray(o1), np.asarray(d1),
                                   np.asarray(t1)))
    skip0 = jnp.zeros(n, jnp.int32)  # NEE wave skips light 0

    def timed(label, fn, *args, reps=4):
        out = fn(*args)
        _timing_drain(out)
        t0 = time.monotonic()
        for _ in range(reps):
            out = fn(*args)
        _timing_drain(out)
        dt = (time.monotonic() - t0) / reps * 1e3
        print(f"  {label}: {dt:8.2f} ms", flush=True)
        return dt

    def _timing_drain(out):
        x = out[0] if isinstance(out, (tuple, list)) else out
        while hasattr(x, "__len__") and not hasattr(x, "block_until_ready"):
            x = x[0]
        float(jnp.sum(x.astype(jnp.float32) if x.dtype != jnp.float32
                      else x).reshape(())[()])

    def make_jits():
        # meta is a static dataclass and the flags are read at trace
        # time, so each configuration needs fresh closures.
        @jax.jit
        def close(o, d, t):
            return traverse.intersect(data, meta, o, d, t,
                                      skip_sort=True)

        @jax.jit
        def anyq(o, d, t, sk):
            return traverse.any_intersect(data, meta, o, d, t, sk,
                                          skip_sort=True)

        return close, anyq

    for walker in (False, True):
        traverse.WALKER_CLOSEST = walker
        traverse.WALKER_ANY = walker
        close, anyq = make_jits()
        tag = "walker" if walker else "stream"
        print(f"--- {tag}", flush=True)
        timed(f"{tag} closest bounce", lambda: close(o1, d1, t1))
        timed(f"{tag} closest primary", lambda: close(o0, d0, tmax_full))
        timed(f"{tag} any shadow", lambda: anyq(o_s, d_s, t_s, skip0))

    # Parity spot-check on-chip (non-interpret Mosaic compile!).
    traverse.WALKER_CLOSEST = False
    traverse.WALKER_ANY = False
    hit_s = jax.block_until_ready(make_jits()[0](o1, d1, t1))
    traverse.WALKER_CLOSEST = True
    traverse.WALKER_ANY = True
    hit_w = jax.block_until_ready(make_jits()[0](o1, d1, t1))
    ps, pw = np.asarray(hit_s.prim), np.asarray(hit_w.prim)
    mism = int((ps != pw).sum())
    print(f"parity: prim mismatches {mism}/{n}", flush=True)
    ts_, tw = np.asarray(hit_s.t), np.asarray(hit_w.t)
    bad = ~np.isclose(ts_, tw, rtol=1e-5)
    print(f"parity: t mismatches {int(bad.sum())}/{n}", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
