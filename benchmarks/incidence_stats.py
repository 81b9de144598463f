"""Size the per-ray incidence stream: for the REAL bounce-1 wave and a
real shadow wave on the colonnade, how many treelet AABBs does each ray
cross?  (mean / p95 / max / total slots), with t unbounded and bounded by
the true closest hit (the perfect-early-exit lower bound).

    PYTHONPATH=/root/repo:/root/.axon_site nohup python \
        benchmarks/incidence_stats.py > /tmp/incidence.log 2>&1 &
"""

import time

import numpy as np

N_TILES = 1024
TD = 16
CHUNK_RAYS = 32768


def main():
    import jax
    import jax.numpy as jnp

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
    tl = data.treelets
    print(f"backend={jax.default_backend()} treelets={tl.n_treelets}",
          flush=True)

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
        hit1 = traverse.intersect(data, meta, o1, d1, t1)
        # shadow wave from primary surfaces toward light 0
        uls = sampler.get_2d(ctx, 2)
        ls = lights_mod.sample_li(data, 0, meta.light_types[0], si, uls)
        o_s, d_s = spawn_ray_to(si, ls.target)
        return o1, d1, t1, hit1.t, o_s, d_s

    o1, d1, t1, t_hit, o_s, d_s = jax.block_until_ready(waves(o0, d0))
    t_shadow = jnp.full(n, 0.9999)

    @jax.jit
    def crossings(o, d, tm):
        """Per-ray count of treelet AABBs crossed within [0, tm]."""
        lo = tl.treelet_bounds[None, :, 0:3]
        hi = tl.treelet_bounds[None, :, 3:6]

        def chunk_body(i, acc):
            sl = jax.lax.dynamic_slice_in_dim
            oc = sl(o, i * CHUNK_RAYS, CHUNK_RAYS)[:, None, :]
            dc = sl(d, i * CHUNK_RAYS, CHUNK_RAYS)[:, None, :]
            tc = sl(tm, i * CHUNK_RAYS, CHUNK_RAYS)[:, None]
            inv = 1.0 / dc
            t0 = (lo - oc) * inv
            t1 = (hi - oc) * inv
            tn = jnp.minimum(t0, t1).max(axis=-1)
            tf = jnp.maximum(t0, t1).min(axis=-1)
            cross = jnp.maximum(tn, 0.0) <= jnp.minimum(tf, tc)
            cnt = cross.sum(axis=1).astype(jnp.int32)
            return jax.lax.dynamic_update_slice_in_dim(
                acc, cnt, i * CHUNK_RAYS, 0)

        acc = jnp.zeros(o.shape[0], jnp.int32)
        return jax.lax.fori_loop(0, o.shape[0] // CHUNK_RAYS, chunk_body, acc)

    def stats(label, o, d, tm):
        t0 = time.monotonic()
        c = np.asarray(jax.block_until_ready(crossings(o, d, tm)))
        dt = time.monotonic() - t0
        print(
            f"{label}: mean={c.mean():.1f} p50={np.percentile(c,50):.0f} "
            f"p95={np.percentile(c,95):.0f} max={c.max()} "
            f"total={c.sum()} ({dt*1e3:.0f} ms incl compile)",
            flush=True,
        )

    stats("bounce t=inf", o1, d1, t1)
    # perfect-early-exit bound: t capped at the true hit distance
    stats("bounce t=hit", o1, d1, jnp.minimum(t1, t_hit * 1.0001))
    stats("shadow segment", o_s, d_s, t_shadow)
    stats("primary t=inf", o0, d0, tmax_full)
    print("done", flush=True)


if __name__ == "__main__":
    main()
