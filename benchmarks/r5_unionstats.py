"""Round-5 walker sizing: distinct-crossed-CHUNK counts per 8/32/128-ray
group on real colonnade waves, at the production chunk granularity
(data.chunks, K=128) AND a hypothetical K=32 cut — sizes the group-walker
engine's candidate caps and pair budgets (VERDICT r5 item 2).

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/r5_unionstats.py
"""

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from yuki_tpu import bsdf as bsdf_mod
    from yuki_tpu import lights as lights_mod
    from yuki_tpu import traverse
    from yuki_tpu.camera import Camera
    from yuki_tpu.sampling import SampleCtx, UniformSampler
    from yuki_tpu.scene.testscenes import colonnade
    from yuki_tpu.surface import make_surface, spawn_ray, spawn_ray_to
    from yuki_tpu.integrators import _BENIGN_D
    from yuki_tpu.treelets import build_treelets

    scene, cam_params, _ = colonnade()
    data, meta = scene.data, scene.meta

    n_tiles, td = 1024, 16
    camera = Camera.create(cam_params, 1920, 1080)
    n = n_tiles * td * td
    tx = (np.arange(n_tiles) % 120) * td
    ty = (np.arange(n_tiles) // 120) * td
    px = np.broadcast_to(
        tx[:, None, None] + np.arange(td)[None, :, None],
        (n_tiles, td, td),
    ).reshape(-1)
    py = np.broadcast_to(
        ty[:, None, None] + np.arange(td)[None, None, :],
        (n_tiles, td, td),
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

    # Production chunks (K=128) + a finer K=32 cut.
    cuts = {"K128": data.chunks}
    if scene.bvh_host is not None:
        tri_p = np.stack(
            [np.asarray(data.tris.p0), np.asarray(data.tris.p1),
             np.asarray(data.tris.p2)], axis=1,
        )
        cuts["K32"] = build_treelets(
            scene.bvh_host, tri_p,
            np.asarray(data.tris.area_light), leaf_size=32,
            super_size=32, pack_chunks=False,
        )

    import functools

    @functools.partial(jax.jit, static_argnames=("width", "key"))
    def union_counts(o, d, tm, width, key):
        tb = cuts[key].treelet_bounds
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
            cross = (jnp.maximum(tn, 0.0) <= jnp.minimum(tf, tc)) & (
                tc > 0
            )
            cnt = jnp.any(cross, axis=0).sum().astype(jnp.int32)
            per_ray = cross.sum(axis=1).astype(jnp.int32)
            return (
                acc[0].at[j].set(cnt),
                acc[1].at[j].set(per_ray.sum()),
            )

        return jax.lax.fori_loop(
            0, rows, body,
            (jnp.zeros(rows, jnp.int32), jnp.zeros(rows, jnp.int32)),
        )

    for key, ch in cuts.items():
        print(f"--- {key}: {ch.n_treelets} chunks, K={ch.leaf_size}",
              flush=True)
        for label, (o, d, tm) in (
            ("bounce sorted", sort_wave(o1, d1, t1)),
            ("bounce natural", (o1, d1, t1)),
            ("shadow sorted",
             sort_wave(o_s, d_s, jnp.full(n, 0.9999))),
            ("primary", (o0, d0, tmax_full)),
        ):
            for width in (8, 32, 128):
                c, pr = jax.block_until_ready(
                    union_counts(o, d, tm, width, key))
                c = np.asarray(c)
                per_ray = np.asarray(pr).sum() / n
                print(
                    f"{key} {label} width={width}: union mean="
                    f"{c.mean():.1f} p50={np.percentile(c, 50):.0f} "
                    f"p95={np.percentile(c, 95):.0f} max={c.max()} "
                    f"pairs/ray_exact={per_ray:.2f} "
                    f"tests/ray={c.mean() * ch.leaf_size:.0f}",
                    flush=True,
                )
    print("done", flush=True)


if __name__ == "__main__":
    main()
