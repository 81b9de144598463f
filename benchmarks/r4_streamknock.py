"""Round-4: name the treelet per-call residual (VERDICT item 2).

Round-3 stage sums for a 262k colonnade closest call: probe 4.7 +
fused cull ~10 + layout 6.1 + fill 0.3 + pack 25.0 + kernel 9.9 +
merge/overflow/bary 19.5 ~= 75 ms, but the standalone jitted
production call costs ~116-142 ms (r3_dispatch_diag) — a ~54 ms/call
residual.  This probe times the SAME production intersect() /
any_intersect() (skip_sort=True, the path_li configuration) with
pieces knocked out via traverse.TRAVERSE_KNOCK, on a real b1 bounce
wave + its 2x262k NEE batch.

    PYTHONPATH=/root/repo:/root/.axon_site nohup python \
        benchmarks/r4_streamknock.py > /tmp/r4_streamknock.log 2>&1 &
"""

import numpy as np

import _timing

N_TILES = 1024
TD = 16

VARIANTS = [
    ("full", frozenset()),
    ("-probe", frozenset({"probe"})),
    ("-wide", frozenset({"wide"})),
    ("-bary", frozenset({"bary"})),
    ("-fallback", frozenset({"fallback"})),
    ("-spheres", frozenset({"spheres"})),
    ("-all", frozenset({"probe", "wide", "bary", "fallback", "spheres"})),
]


def main():
    import jax
    import jax.numpy as jnp

    _timing.enable_compile_cache()
    print("backend=", jax.default_backend(), flush=True)

    from yuki_tpu import bsdf as bsdf_mod
    from yuki_tpu import lights as lights_mod
    from yuki_tpu import traverse
    from yuki_tpu.camera import Camera
    from yuki_tpu.integrators import _BENIGN_D
    from yuki_tpu.sampling import SampleCtx, UniformSampler
    from yuki_tpu.surface import make_surface, spawn_ray, spawn_ray_to
    from yuki_tpu.scene.testscenes import colonnade

    scene, cam_params, _ = colonnade()
    data, meta = scene.data, scene.meta
    n = N_TILES * TD * TD

    camera = Camera.create(cam_params, 1920, 1080)
    tx = (np.arange(N_TILES) % 120) * TD
    ty = (np.arange(N_TILES) // 120) * TD
    px = np.broadcast_to(
        tx[:, None, None] + np.arange(TD)[None, :, None],
        (N_TILES, TD, TD)).reshape(-1)
    py = np.broadcast_to(
        ty[:, None, None] + np.arange(TD)[None, None, :],
        (N_TILES, TD, TD)).reshape(-1)
    ctx = SampleCtx(
        px=jnp.asarray(px, jnp.int32), py=jnp.asarray(py, jnp.int32),
        sample_index=jnp.uint32(0), seed=jnp.uint32(1),
    )
    sampler = UniformSampler(1)
    p_film = jnp.asarray(np.stack([px + 0.5, py + 0.5], -1), jnp.float32)

    # Build the b1 bounce wave + its NEE batch once (jitted, full path).
    center = 0.5 * (data.world_lo + data.world_hi)

    @jax.jit
    def build(data):
        o, d = camera.ray(p_film)
        t_max = jnp.full(n, traverse.F32_MAX)
        hit = traverse.intersect(data, meta, o, d, t_max, skip_sort=True)
        alive = hit.hit
        si = make_surface(data, hit, o, d)
        mp = bsdf_mod.gather_materials(data, si, meta)
        o_parts, d_parts, t_parts, s_parts = [], [], [], []
        for li_idx, ltype in enumerate(meta.light_types):
            u = sampler.get_2d(ctx, 2 + 2 * li_idx)
            ls = lights_mod.sample_li(data, li_idx, ltype, si, u)
            o_b, d_b = spawn_ray_to(si, ls.target)
            o_parts.append(jnp.where(alive[:, None], o_b, center))
            d_parts.append(jnp.where(alive[:, None], d_b, _BENIGN_D))
            t_parts.append(jnp.where(alive, 0.9999, 0.0))
            s_parts.append(
                jnp.broadcast_to(ls.skip_light, (n,)).astype(jnp.int32))
        u = sampler.get_2d(ctx, 2 + 2 * len(meta.light_types))
        bs = bsdf_mod.bsdf_sample(mp, si, si.wo, u, meta)
        alive = alive & (bs.pdf > 0.0)
        o1 = jnp.where(alive[:, None], spawn_ray(si, bs.wi), center)
        d1 = jnp.where(alive[:, None], bs.wi, _BENIGN_D)
        t1 = jnp.where(alive, traverse.F32_MAX, 0.0)
        return (o1, d1, t1,
                jnp.concatenate(o_parts), jnp.concatenate(d_parts),
                jnp.concatenate(t_parts), jnp.concatenate(s_parts))

    o1, d1, t1, o_sh, d_sh, t_sh, s_sh = jax.block_until_ready(build(data))
    print(f"b1 wave built: {n} closest + {o_sh.shape[0]} shadow",
          flush=True)

    for label, knock in VARIANTS:
        traverse.TRAVERSE_KNOCK = knock

        @jax.jit
        def closest(data, o, d, tm):
            hit = traverse.intersect(data, meta, o, d, tm, skip_sort=True)
            return hit.t, hit.prim

        @jax.jit
        def anyhit(data, o, d, tm, sk):
            return traverse.any_intersect(data, meta, o, d, tm, sk,
                                          skip_sort=True)

        _timing.drained(f"closest {label}", closest, data, o1, d1, t1,
                        reps=3)
        _timing.drained(f"any     {label}", anyhit, data, o_sh, d_sh,
                        t_sh, s_sh, reps=3)
    traverse.TRAVERSE_KNOCK = frozenset()
    print("done", flush=True)


if __name__ == "__main__":
    main()
