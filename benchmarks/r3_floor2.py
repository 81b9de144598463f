"""Combined knockout: shade driver stub + occlusion zero => only the 5
closest traces + scan glue remain.  Plus standalone production
intersect at 1M rays for the per-call number."""

import numpy as np

TD = 16


def timed(label, fn, *args, reps=6):
    from _timing import drained

    return drained(label, fn, *args, reps=reps)


def main():
    import jax
    import jax.numpy as jnp

    from yuki_tpu import traverse
    from yuki_tpu.camera import Camera
    from yuki_tpu.integrators import PathParams, path_li
    from yuki_tpu.ops import shade_fused as sf
    from yuki_tpu.sampling import SampleCtx, UniformSampler
    from yuki_tpu.scene.cornell import cornell

    scene, cam_params, _ = cornell()
    data, meta = scene.data, scene.meta
    print(f"backend={jax.default_backend()}", flush=True)
    camera = Camera.create(cam_params, 1920, 1080)
    sampler = UniformSampler(1)
    params = PathParams(max_depth=5)
    n_tiles = 4096
    tx = (np.arange(n_tiles) % 120) * TD
    ty = (np.arange(n_tiles) // 120) * TD
    px = np.broadcast_to(
        tx[:, None, None] + np.arange(TD)[None, :, None],
        (n_tiles, TD, TD)).reshape(-1)
    py = np.broadcast_to(
        ty[:, None, None] + np.arange(TD)[None, None, :],
        (n_tiles, TD, TD)).reshape(-1)
    ctx = SampleCtx(
        px=jnp.asarray(px, jnp.int32), py=jnp.asarray(py, jnp.int32),
        sample_index=jnp.uint32(0), seed=jnp.uint32(1),
    )
    p_film = jnp.asarray(np.stack([px + 0.5, py + 0.5], -1), jnp.float32)
    n = n_tiles * TD * TD
    L = len(meta.light_types)

    def chain():
        @jax.jit
        def run(data, p_film):
            o, d = camera.ray(p_film)
            res = path_li(data, meta, params, sampler, ctx, o, d)
            return res.li.sum()

        return run

    # Standalone production intersect at 1M.
    o0, d0 = camera.ray(p_film)
    tm = jnp.full(n, traverse.F32_MAX)

    @jax.jit
    def one_trace(data, o, d):
        hit = traverse.intersect(data, meta, o, d, tm)
        return hit.t.sum()

    timed("one production intersect 1M", one_trace, data, o0, d0)

    @jax.jit
    def one_any(data, o, d):
        occ = traverse.any_intersect(
            data, meta,
            jnp.tile(o, (L, 1)), jnp.tile(d, (L, 1)),
            jnp.full(L * n, 0.5), jnp.full(L * n, -1, jnp.int32),
            skip_sort=True)
        return occ.sum()

    timed("one production any_intersect L*1M", one_any, data, o0, d0)

    def sf_stub(scene, meta2, sampler2, ctx2, hit, o, d, beta, alive,
                specular_bounce, dim0, bounce, interpret=False):
        nn = o.shape[0]
        p = o + hit.t[:, None] * d
        return (p + 1e-3 * d, d, beta * 0.9, alive & hit.hit,
                specular_bounce,
                jnp.tile(p, (L, 1)), jnp.tile(d, (L, 1)),
                jnp.full(L * nn, 0.5), jnp.full(L * nn, -1, jnp.int32),
                jnp.ones(L * nn, bool), jnp.tile(beta, (L, 1)) * 0.25,
                beta * 0.125)

    real_sf = sf.shade_fused
    real_any = traverse.any_intersect
    sf.shade_fused = sf_stub
    traverse.any_intersect = (
        lambda scene, meta, o, d, t_max, skip, **kw: jnp.zeros(
            o.shape[0], bool))
    try:
        timed("d5 shade_stub+any_zero", chain(), data, p_film)
    finally:
        sf.shade_fused = real_sf
        traverse.any_intersect = real_any
    print("done", flush=True)


if __name__ == "__main__":
    main()
