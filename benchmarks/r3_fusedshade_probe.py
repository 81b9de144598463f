"""On-chip probe for the fused shading megakernel (ops/shade_fused.py).

1. Lowering smoke test: one standalone shade_fused call on a small wave
   (catches Mosaic gaps: variable logical shifts, scalar VMEM reads,
   rank-3 blocks) + numeric cross-check against the XLA chain.
2. Production timing: path_li d5 with FUSED_SHADE_MODE off vs auto on
   Cornell (1M wave) and colonnade (262k wave).

    PYTHONPATH=/root/repo:/root/repo/benchmarks:/root/.axon_site \
        nohup python benchmarks/r3_fusedshade_probe.py \
        > /tmp/r3_fusedshade.log 2>&1 &
"""

import numpy as np

TD = 16


def wave(camera_res, n_tiles, cols, sampler):
    import jax.numpy as jnp

    from yuki_tpu.sampling import SampleCtx

    tx = (np.arange(n_tiles) % cols) * TD
    ty = (np.arange(n_tiles) // cols) * TD
    px = np.broadcast_to(
        tx[:, None, None] + np.arange(TD)[None, :, None],
        (n_tiles, TD, TD),
    ).reshape(-1)
    py = np.broadcast_to(
        ty[:, None, None] + np.arange(TD)[None, None, :],
        (n_tiles, TD, TD),
    ).reshape(-1)
    px = jnp.asarray(px.astype(np.int32))
    py = jnp.asarray(py.astype(np.int32))
    ctx = SampleCtx(px=px, py=py, sample_index=jnp.uint32(0),
                    seed=jnp.uint32(7))
    u = sampler.get_2d(ctx, 0)
    pf = jnp.stack([px.astype(jnp.float32), py.astype(jnp.float32)], -1) + u
    return ctx, pf


def main():
    import jax
    import jax.numpy as jnp

    from _timing import drained
    from yuki_tpu import integrators, traverse
    from yuki_tpu.camera import Camera
    from yuki_tpu.integrators import PathParams, path_li
    from yuki_tpu.ops import shade_fused
    from yuki_tpu.sampling import UniformSampler
    from yuki_tpu.scene.cornell import cornell
    from yuki_tpu.scene.testscenes import colonnade

    print(f"backend={jax.default_backend()}", flush=True)
    sampler = UniformSampler(1)

    # ---- 1. smoke + cross-check on a 2048-ray Cornell wave ----------
    scene, cam_params, _ = cornell()
    data, meta = scene.data, scene.meta
    camera = Camera.create(cam_params, 1920, 1080)
    ctx, pf = wave((1920, 1080), 8, 8, sampler)
    o, d = camera.ray(pf)
    t_max = jnp.full(o.shape[0], traverse.F32_MAX)
    hit = jax.jit(lambda o, d, t: traverse.intersect(data, meta, o, d, t))(
        o, d, t_max
    )
    beta = jnp.ones_like(o)
    alive = jnp.asarray(hit.hit)
    spec = jnp.zeros(o.shape[0], bool)

    fused = jax.jit(
        lambda *a: shade_fused.shade_fused(
            data, meta, sampler, ctx, hit, o, d, beta, alive, spec,
            jnp.int32(2), jnp.int32(0),
        )
    )
    out = fused()
    o2 = np.asarray(out[0])
    print(f"smoke ok: o2 mean {o2.mean():.4f} finite={np.isfinite(o2).all()}",
          flush=True)

    # numeric cross-check vs the XLA chain through path_li d2
    def run_mode(mode, scene_t, n_tiles, cols, res, depth):
        sc, cp, _ = scene_t
        cam = Camera.create(cp, *res)
        ctx2, pf2 = wave(res, n_tiles, cols, sampler)
        o3, d3 = cam.ray(pf2)
        old = integrators.FUSED_SHADE_MODE
        integrators.FUSED_SHADE_MODE = mode
        try:
            fn = jax.jit(
                lambda o, d: path_li(
                    sc.data, sc.meta, PathParams(depth), sampler, ctx2,
                    o, d,
                ).li.sum()
            )
            v = float(fn(o3, d3))
        finally:
            integrators.FUSED_SHADE_MODE = old
        return v

    v_off = run_mode("off", cornell(), 8, 8, (1920, 1080), 2)
    v_on = run_mode("auto", cornell(), 8, 8, (1920, 1080), 2)
    rel = abs(v_on - v_off) / max(abs(v_off), 1e-9)
    print(f"cross-check d2 sum: off={v_off:.4f} fused={v_on:.4f} "
          f"rel={rel:.2e}", flush=True)

    # ---- 2. production d5 timing ------------------------------------
    for name, scene_t, n_tiles, cols, res in (
        ("cornell", cornell(), 4096, 120, (1920, 1080)),
        ("colonnade", colonnade(), 1024, 120, (1920, 1080)),
    ):
        sc, cp, _ = scene_t
        cam = Camera.create(cp, *res)
        ctx2, pf2 = wave(res, n_tiles, cols, sampler)
        o3, d3 = cam.ray(pf2)
        for mode in ("off", "auto"):
            old = integrators.FUSED_SHADE_MODE
            integrators.FUSED_SHADE_MODE = mode
            try:
                fn = jax.jit(
                    lambda o, d: (
                        lambda r: r.li.sum() + r.ray_count.sum()
                    )(path_li(sc.data, sc.meta, PathParams(5), sampler,
                              ctx2, o, d))
                )
                drained(f"{name} d5 {n_tiles * TD * TD} mode={mode}",
                        fn, o3, d3, reps=3)
            finally:
                integrators.FUSED_SHADE_MODE = old
    print("done", flush=True)


if __name__ == "__main__":
    main()
