"""On-chip: closest-hit candidate-width sweep on real bounce waves.

extract/layout-sort/merge all scale with C (the [N,C] candidate
width); colonnade bounce incidence is mean 3.5 / p95 9 / max 70, so
C=16 buys ~2x slack over p95.  Narrower C pushes a few percent of
rays into the tiered wide re-run (OV_SMALL/MID) — this sweep measures
whether the trade pays on production bounce waves (colonnade +
atrium).

    PYTHONPATH=/root/repo:/root/repo/benchmarks:/root/.axon_site \
        nohup python benchmarks/r3_closestc.py > /tmp/r3_closestc.log 2>&1 &
"""

import numpy as np

N_TILES = 1024
TD = 16


def main():
    import jax
    import jax.numpy as jnp

    from _timing import drained
    from yuki_tpu import bsdf as bsdf_mod
    from yuki_tpu import traverse
    from yuki_tpu.camera import Camera
    from yuki_tpu.sampling import SampleCtx, UniformSampler
    from yuki_tpu.scene.testscenes import colonnade
    from yuki_tpu.surface import make_surface, spawn_ray
    import bench

    print(f"backend={jax.default_backend()}", flush=True)
    sampler = UniformSampler(1)

    def bounce_wave(data, meta, camera, ctx, pf, depth):
        @jax.jit
        def go(pf):
            o, d = camera.ray(pf)
            alive = jnp.ones(o.shape[0], bool)
            for b in range(depth):
                t_max = jnp.where(alive, traverse.F32_MAX, 0.0)
                hit = traverse.intersect(data, meta, o, d, t_max,
                                         skip_sort=True)
                alive = alive & hit.hit
                si = make_surface(data, hit, o, d)
                mp = bsdf_mod.gather_materials(data, si, meta)
                uu = sampler.get_2d(ctx, 2 + 7 * b)
                bs = bsdf_mod.bsdf_sample(mp, si, si.wo, uu, meta)
                alive = alive & (bs.pdf > 0)
                center = 0.5 * (data.world_lo + data.world_hi)
                o = jnp.where(alive[:, None], spawn_ray(si, bs.wi), center)
                d = jnp.where(alive[:, None], bs.wi,
                              jnp.asarray([0.0, 0.0, 1.0]))
            t_max = jnp.where(alive, traverse.F32_MAX, 0.0)
            return o, d, t_max

        return go(pf)

    from yuki_tpu.ops import trace_stream as ts

    scenes = [("colonnade",) + colonnade()[:2]]
    try:
        sc_a = bench.load_atrium()
        scenes.append(("atrium", sc_a, colonnade()[1]))
    except Exception as e:
        print(f"atrium unavailable: {e}", flush=True)

    for name, scene, cam_params in scenes:
        data, meta = scene.data, scene.meta
        camera = Camera.create(cam_params, 1920, 1080)
        tx = (np.arange(N_TILES) % 120) * TD
        ty = (np.arange(N_TILES) // 120) * TD
        px = np.broadcast_to(
            tx[:, None, None] + np.arange(TD)[None, :, None],
            (N_TILES, TD, TD),
        ).reshape(-1).astype(np.int32)
        py = np.broadcast_to(
            ty[:, None, None] + np.arange(TD)[None, None, :],
            (N_TILES, TD, TD),
        ).reshape(-1).astype(np.int32)
        px, py = jnp.asarray(px), jnp.asarray(py)
        ctx = SampleCtx(px=px, py=py, sample_index=jnp.uint32(0),
                        seed=jnp.uint32(7))
        u = sampler.get_2d(ctx, 0)
        pf = jnp.stack(
            [px.astype(jnp.float32), py.astype(jnp.float32)], -1
        ) + u

        o, d, t_max = bounce_wave(data, meta, camera, ctx, pf, 2)
        o.block_until_ready()
        print(f"-- {name} bounce-2 closest wave n={int(o.shape[0])}",
              flush=True)
        for C in (16, 12, 8):
            old_c = ts.C_MAIN
            old_scl = ts.stream_closest_l
            ts.C_MAIN = C
            ts.stream_closest_l = (
                lambda *a, C=C, **k: old_scl(*a, **{**k, "C": C})
            )
            try:
                fn = jax.jit(
                    lambda o, d, t: traverse.intersect(
                        data, meta, o, d, t, skip_sort=True
                    ).t.sum()
                )
                drained(f"{name} closest C={C}", fn, o, d, t_max, reps=3)
            finally:
                ts.C_MAIN = old_c
                ts.stream_closest_l = old_scl
    print("done", flush=True)


if __name__ == "__main__":
    main()
