"""Round-3 knockout attribution of the PRODUCTION path chain (jitted
lax.scan, no per-call dispatch floors): time the full d5 wave, then
variants with passes knocked out, on colonnade + Cornell + atrium.

  full      : path_li d5 exactly as the renderer runs it
  no_nee    : _nee's any_intersect replaced by "unoccluded"
  d1        : depth=1 (primary trace + NEE + shade, no bounce traces)
  trace_only: scan body reduced to closest-hit only (d5 re-trace chain)

full - no_nee      = all NEE occlusion traversal
full - trace_only  = all shading/sampling/NEE-setup XLA
full - d1 (/4)     = per-bounce marginal cost

    PYTHONPATH=/root/repo:/root/.axon_site nohup python \
        benchmarks/r3_knockout.py > /tmp/r3_knockout.log 2>&1 &
"""

import time

import numpy as np

N_TILES = 1024
TD = 16


def timed(label, fn, *args, reps=3):
    # Drain protocol: block_until_ready on arrays does not block here.
    from _timing import drained

    return drained(label, fn, *args, reps=reps)


def profile(name, scene, cam_params, n_tiles):
    import jax
    import jax.numpy as jnp

    from yuki_tpu import integrators
    from yuki_tpu.camera import Camera
    from yuki_tpu.integrators import PathParams, path_li
    from yuki_tpu.sampling import SampleCtx, UniformSampler
    from yuki_tpu import traverse

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

    def chain(depth):
        params = PathParams(max_depth=depth)

        @jax.jit
        def run(data, p_film):
            o, d = camera.ray(p_film)
            res = path_li(data, meta, params, sampler, ctx, o, d)
            return res.li.sum()

        return run

    t5 = timed("full d5", chain(5), data, p_film)
    t1 = timed("d1", chain(1), data, p_film)

    # Knockout: neutralize NEE occlusion (monkeypatch any_intersect).
    real_any = traverse.any_intersect
    traverse.any_intersect = (
        lambda scene, meta, o, d, t_max, skip, **kw: jnp.zeros(
            o.shape[0], bool)
    )
    try:
        tn = timed("no_nee d5", chain(5), data, p_film)
    finally:
        traverse.any_intersect = real_any

    # Trace-only: repeated closest-hit chain, no shading.
    @jax.jit
    def trace_only(data, p_film):
        o, d = camera.ray(p_film)
        t_max = jnp.full(o.shape[0], traverse.F32_MAX)

        def body(carry, _):
            o, d = carry
            hit = traverse.intersect(data, meta, o, d, t_max)
            # fake bounce: reflect around a fixed axis, offset origin
            p = o + hit.t[:, None] * d
            d2 = jnp.where((hit.prim % 2 == 0)[:, None], d, -d)
            return (p + 1e-3 * d2, d2), hit.t.sum()

        (_, _), ts = jax.lax.scan(body, (o, d), None, length=5)
        return ts.sum()

    tt = timed("trace_only x5", trace_only, data, p_film)

    print(f"  => occlusion total ~{(t5 - tn)*1e3:.0f} ms | "
          f"shading+setup ~{(t5 - tt)*1e3:.0f} ms | "
          f"per-bounce marginal ~{(t5 - t1)/4*1e3:.0f} ms", flush=True)


def main():
    import os

    import jax

    scenes = os.environ.get("SCENES", "colonnade,cornell,atrium").split(",")
    print(f"backend={jax.default_backend()} scenes={scenes}", flush=True)

    if "colonnade" in scenes:
        from yuki_tpu.scene.testscenes import colonnade

        scene, cam, _ = colonnade()
        profile("colonnade", scene, cam, N_TILES)

    if "cornell" in scenes:
        from yuki_tpu.scene.cornell import cornell

        scene_c, cam_c, _ = cornell()
        profile("cornell", scene_c, cam_c, 4096)

    if "atrium" in scenes:
        import sys

        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        from bench import load_atrium

        scene_a, cam_a, _ = load_atrium()
        profile("atrium", scene_a, cam_a, N_TILES)
    print("done", flush=True)


if __name__ == "__main__":
    main()
