"""Attribute the post-fused Cornell shading remainder (r3_knockout:
full d5 81 ms, trace-only 16 ms => ~66 ms shade+setup) between the two
Pallas kernels' COMPUTE, their PLANE PACKING, and the XLA gathers, by
in-graph monkeypatched stubs on the production path_li chain:

  full          : production d5
  shade_nop     : _shade_kernel's pallas_call replaced by a same-shape
                  broadcast of one input plane (packing + gathers stay)
  resolve_nop   : resolve_fused replaced by a cheap XLA masked add
                  (its plane packing + kernel both knocked out)
  gathers_zero  : rowgather replaced by zeros (one-hot MXU gathers out)

    PYTHONPATH=/root/repo:/root/.axon_site SCENES=cornell nohup python \
        benchmarks/r3_fusedknock.py > /tmp/r3_fusedknock.log 2>&1 &
"""

import numpy as np

TD = 16


def timed(label, fn, *args, reps=3):
    from _timing import drained

    return drained(label, fn, *args, reps=reps)


def profile(name, scene, cam_params, n_tiles):
    import jax
    import jax.numpy as jnp

    from yuki_tpu.camera import Camera
    from yuki_tpu.integrators import PathParams, path_li
    from yuki_tpu.sampling import SampleCtx, UniformSampler
    from yuki_tpu.ops import shade_fused as sf

    data, meta = scene.data, scene.meta
    n = n_tiles * TD * TD
    print(f"== {name}: wave={n} rays", flush=True)
    camera = Camera.create(cam_params, 1920, 1080)
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
    sampler = UniformSampler(1)
    p_film = jnp.asarray(np.stack([px + 0.5, py + 0.5], -1), jnp.float32)
    params = PathParams(max_depth=5)

    def chain():
        @jax.jit
        def run(data, p_film):
            o, d = camera.ray(p_film)
            res = path_li(data, meta, params, sampler, ctx, o, d)
            return res.li.sum()

        return run

    t_full = timed("full d5", chain(), data, p_film)

    # ---- shade kernel nop: same-shape output from one input plane ----
    real_call = sf.pl.pallas_call

    def nop_call(kernel, *a, grid_spec=None, out_shape=None, **kw):
        import functools as ft

        fn = kernel.func if isinstance(kernel, ft.partial) else kernel
        if fn is not sf._shade_kernel:
            return real_call(kernel, *a, grid_spec=grid_spec,
                             out_shape=out_shape, **kw)

        def stub(sc, rh, tr, mp, ph, lt, sp, ms):
            (os_,) = out_shape
            return jnp.broadcast_to(
                rh[:1] + tr[:1] + mp[:1], os_.shape
            ).astype(os_.dtype),

        return stub

    sf.pl.pallas_call = nop_call
    try:
        t_snop = timed("shade_nop d5", chain(), data, p_film)
    finally:
        sf.pl.pallas_call = real_call

    # ---- resolve nop: cheap XLA masked add, no plane packing --------
    real_resolve = sf.resolve_fused

    def resolve_stub(scene, radiance, beta, alive, missed, ne, occ,
                     worth, contrib, bounce, n_lights, clamp,
                     interpret=False):
        return radiance + jnp.where(alive[:, None], beta * ne, 0.0)

    sf.resolve_fused = resolve_stub
    try:
        t_rnop = timed("resolve_nop d5", chain(), data, p_film)
    finally:
        sf.resolve_fused = real_resolve

    # ---- gathers zero ------------------------------------------------
    from yuki_tpu import gathers as g

    real_rg = g.rowgather

    def rg_zero(table, idx):
        return jnp.zeros(
            (idx.shape[0], table.shape[1]), table.dtype
        )

    g.rowgather = rg_zero
    sf_real_rg = getattr(sf, "rowgather", None)
    try:
        t_gz = timed("gathers_zero d5", chain(), data, p_film)
    finally:
        g.rowgather = real_rg

    print(
        f"  => shade kernel+dispatch ~{(t_full - t_snop)*1e3:.1f} ms | "
        f"resolve total ~{(t_full - t_rnop)*1e3:.1f} ms | "
        f"row gathers ~{(t_full - t_gz)*1e3:.1f} ms",
        flush=True,
    )


def main():
    import jax

    print(f"backend={jax.default_backend()}", flush=True)
    from yuki_tpu.scene.cornell import cornell

    scene, cam, _ = cornell()
    profile("cornell", scene, cam, 4096)
    print("done", flush=True)




def profile2(name, scene, cam_params, n_tiles):
    """Variant 2: stub the ENTIRE shade_fused driver (plane packing +
    kernel + unpack) with cheap XLA producing validly-shaped outputs.
    If d5 drops to ~trace+occlusion, the whole remainder lives inside
    the fused driver; if it stays ~81 ms the cost is in the scan body
    OUTSIDE shade (carries, occlusion assembly, trace input prep)."""
    import jax
    import jax.numpy as jnp

    from yuki_tpu.camera import Camera
    from yuki_tpu.integrators import PathParams, path_li
    from yuki_tpu.sampling import SampleCtx, UniformSampler
    from yuki_tpu.ops import shade_fused as sf

    data, meta = scene.data, scene.meta
    n = n_tiles * TD * TD
    camera = Camera.create(cam_params, 1920, 1080)
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
    sampler = UniformSampler(1)
    p_film = jnp.asarray(np.stack([px + 0.5, py + 0.5], -1), jnp.float32)
    params = PathParams(max_depth=5)

    def chain():
        @jax.jit
        def run(data, p_film):
            o, d = camera.ray(p_film)
            res = path_li(data, meta, params, sampler, ctx, o, d)
            return res.li.sum()

        return run

    L = len(meta.light_types)

    real_sf = sf.shade_fused

    def sf_stub(scene, meta2, sampler2, ctx2, hit, o, d, beta, alive,
                specular_bounce, dim0, bounce, interpret=False):
        nn = o.shape[0]
        p = o + hit.t[:, None] * d
        no = jnp.tile(p, (L, 1))
        nd = jnp.tile(d, (L, 1))
        nt = jnp.full(L * nn, 0.5)
        ns = jnp.full(L * nn, -1, jnp.int32)
        nw = jnp.ones(L * nn, bool)
        nc = jnp.tile(beta, (L, 1)) * 0.25
        ne = beta * 0.125
        return (p + 1e-3 * d, d, beta * 0.9, alive & hit.hit,
                specular_bounce, no, nd, nt, ns, nw, nc, ne)

    sf.shade_fused = sf_stub
    try:
        t_all = timed("shade_all_nop d5", chain(), data, p_film)
    finally:
        sf.shade_fused = real_sf
    print(f"  => full-driver knockout: {t_all*1e3:.1f} ms", flush=True)


def main2():
    import jax

    print(f"backend={jax.default_backend()}", flush=True)
    from yuki_tpu.scene.cornell import cornell

    scene, cam, _ = cornell()
    profile2("cornell", scene, cam, 4096)
    print("done", flush=True)


if __name__ == "__main__":
    import os as _os
    if _os.environ.get("VARIANT") == "2":
        main2()
        raise SystemExit
    main()
