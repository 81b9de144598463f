"""On-chip: production NEE-occlusion strategy sweep (round 3).

The d5 colonnade wave spends ~498 ms in NEE occlusion (r3_knockout).
Production traces shadow waves UNSORTED through the slot branch
(path_li skip_sort=True everywhere); stage2 measured the SORTED rows
path at 119.6 vs slot 158.0 ms on the same 524k b1-NEE wave — but
those numbers predate the fused cull.  This sweep times the REAL
any_intersect call on captured bounce-1/3 shadow waves:

  sorted=False/True x C in {16, 12, 8}

C is threaded via trace_stream.C_MAIN monkeypatch for the sweep only
(production change follows the measurement).

    PYTHONPATH=/root/repo:/root/repo/benchmarks:/root/.axon_site \
        nohup python benchmarks/r3_anysort.py > /tmp/r3_anysort.log 2>&1 &
"""

import numpy as np

N_TILES = 1024
TD = 16


def main():
    import jax
    import jax.numpy as jnp

    from _timing import drained
    from yuki_tpu import bsdf as bsdf_mod
    from yuki_tpu import integrators, traverse
    from yuki_tpu.camera import Camera
    from yuki_tpu.integrators import PathParams, _nee_setup, path_li
    from yuki_tpu.sampling import SampleCtx, UniformSampler
    from yuki_tpu.scene.testscenes import colonnade
    from yuki_tpu.surface import make_surface

    print(f"backend={jax.default_backend()}", flush=True)
    scene, cam_params, _ = colonnade()
    data, meta = scene.data, scene.meta
    n = N_TILES * TD * TD
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
    sampler = UniformSampler(1)
    ctx = SampleCtx(px=px, py=py, sample_index=jnp.uint32(0),
                    seed=jnp.uint32(7))
    u = sampler.get_2d(ctx, 0)
    pf = jnp.stack([px.astype(jnp.float32), py.astype(jnp.float32)], -1) + u
    o0, d0 = camera.ray(pf)

    # Capture bounce-b shadow waves by running path_li to depth b and
    # reconstructing the NEE batch at the last surface.
    import functools

    @functools.partial(jax.jit, static_argnums=(2,))
    def shadow_wave(o, d, depth):
        # March `depth` bounces, then build the NEE batch at that surface.
        beta = jnp.ones_like(o)
        alive = jnp.ones(o.shape[0], bool)
        dim = 2
        dims_per_bounce = 2 * len(meta.light_types) + 3
        for b in range(depth):
            t_max = jnp.where(alive, traverse.F32_MAX, 0.0)
            hit = traverse.intersect(data, meta, o, d, t_max,
                                     skip_sort=True)
            alive = alive & hit.hit
            si = make_surface(data, hit, o, d)
            mp = bsdf_mod.gather_materials(data, si, meta)
            if b == depth - 1:
                ob, db, tb_, sb, wb, cb, _ = _nee_setup(
                    data, meta, sampler, ctx, si, mp,
                    dim + b * dims_per_bounce, alive,
                )
                return ob, db, tb_, sb
            uu = sampler.get_2d(ctx, dim + b * dims_per_bounce
                                + 2 * len(meta.light_types))
            bs = bsdf_mod.bsdf_sample(mp, si, si.wo, uu, meta)
            alive = alive & (bs.pdf > 0)
            center = 0.5 * (data.world_lo + data.world_hi)
            from yuki_tpu.surface import spawn_ray

            o = jnp.where(alive[:, None], spawn_ray(si, bs.wi), center)
            d = jnp.where(alive[:, None], bs.wi,
                          jnp.asarray([0.0, 0.0, 1.0]))
        raise AssertionError

    from yuki_tpu.ops import trace_stream as ts

    for depth in (1, 3):
        ob, db, tb_, sb = shadow_wave(o0, d0, depth)
        ob.block_until_ready()
        nn = int(ob.shape[0])
        print(f"-- shadow wave bounce={depth} n={nn}", flush=True)
        for C in (16, 12, 8):
            old_c = ts.C_MAIN
            old_sal = ts.stream_any_l
            ts.C_MAIN = C
            # stream_any_l's C default binds at def time — inject the
            # sweep value explicitly (candidate_lists_fused reads
            # ts.C_MAIN at trace time, so lists and engine agree).
            ts.stream_any_l = (
                lambda *a, C=C, **k: old_sal(*a, **{**k, "C": C})
            )
            try:
                for sorted_ in (False, True):
                    fn = jax.jit(
                        lambda o, d, t, s, sorted_=sorted_: (
                            traverse.any_intersect(
                                data, meta, o, d, t, s,
                                skip_sort=not sorted_,
                            ).sum()
                        )
                    )
                    drained(
                        f"any C={C} sorted={int(sorted_)}",
                        fn, ob, db, tb_, sb, reps=3,
                    )
            finally:
                ts.C_MAIN = old_c
                ts.stream_any_l = old_sal
    print("done", flush=True)


if __name__ == "__main__":
    main()
