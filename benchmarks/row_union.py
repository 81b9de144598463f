"""Row-union incidence: how many DISTINCT treelets do the 128 rays of a
sorted row cross (exact per-ray test, OR over the row)?  Decides between
the slot-stream pipeline and a per-row mega-kernel.

    PYTHONPATH=/root/repo:/root/.axon_site nohup python \
        benchmarks/row_union.py > /tmp/row_union.log 2>&1 &
"""

import numpy as np

N_TILES = 1024
TD = 16


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
    print(f"backend={jax.default_backend()} T={tl.n_treelets}", flush=True)

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
        uls = sampler.get_2d(ctx, 2)
        ls = lights_mod.sample_li(data, 0, meta.light_types[0], si, uls)
        o_s, d_s = spawn_ray_to(si, ls.target)
        return o1, d1, t1, o_s, d_s

    o1, d1, t1, o_s, d_s = jax.block_until_ready(waves(o0, d0))

    def sort_wave(o, d, tm):
        order = jnp.argsort(traverse.ray_sort_key(data, o, d))
        return o[order], d[order], tm[order]

    tb = tl.treelet_bounds

    import functools

    @functools.partial(jax.jit, static_argnames=("width",))
    def row_union_counts(o, d, tm, width):
        """[n/width] distinct-crossed-treelet count per width-ray row."""
        rows = n // width

        def body(j, acc):
            sl = jax.lax.dynamic_slice_in_dim
            oc = sl(o, j * width, width)[:, None, :]
            dc = sl(d, j * width, width)[:, None, :]
            tc = sl(tm, j * width, width)[:, None]
            inv = 1.0 / dc
            t0 = (tb[None, :, 0:3] - oc) * inv
            t1_ = (tb[None, :, 3:6] - oc) * inv
            tn = jnp.minimum(t0, t1_).max(axis=-1)
            tf = jnp.maximum(t0, t1_).min(axis=-1)
            cross = (jnp.maximum(tn, 0.0) <= jnp.minimum(tf, tc)) & (tc > 0)
            cnt = jnp.any(cross, axis=0).sum().astype(jnp.int32)
            return acc.at[j].set(cnt)

        return jax.lax.fori_loop(
            0, rows, body, jnp.zeros(rows, jnp.int32))

    for label, (o, d, tm) in (
        ("bounce sorted", sort_wave(o1, d1, t1)),
        ("bounce unsorted", (o1, d1, t1)),
        ("shadow sorted", sort_wave(o_s, d_s, jnp.full(n, 0.9999))),
        ("primary", (o0, d0, tmax_full)),
    ):
        for width in (32, 128, 1024):
            c = np.asarray(jax.block_until_ready(
                row_union_counts(o, d, tm, width=width)))
            print(
                f"{label} width={width}: union mean={c.mean():.1f} "
                f"p50={np.percentile(c, 50):.0f} p95={np.percentile(c, 95):.0f}"
                f" max={c.max()}",
                flush=True,
            )
    print("done", flush=True)


if __name__ == "__main__":
    main()
