"""Per-pass timing of ONE real path-tracer bounce on the colonnade, using
the actual integrator state (not synthetic rays): camera wave -> closest
hit -> surface/material gathers -> per-light NEE occlusion -> bsdf sample
-> next-bounce closest hit.

Isolates where the e2e wave time goes (wave_size_sweep measured ~1.4 s per
bounce at 262k rays while the sorted traversal alone is ~10 ms).

    PYTHONPATH=/root/repo:/root/.axon_site nohup python \
        benchmarks/e2e_pass_profile.py > /tmp/pass_profile.log 2>&1 &
"""

import functools
import time

import numpy as np

N_TILES = 1024  # 262k rays
TD = 16


def timed(label, fn, *args):
    import jax

    out = jax.block_until_ready(fn(*args))
    t0 = time.monotonic()
    for _ in range(3):
        out = jax.block_until_ready(fn(*args))
    dt = (time.monotonic() - t0) / 3
    print(f"{label}: {dt*1e3:.1f} ms", flush=True)
    return out


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
    from yuki_tpu.vecmath import dot, is_black

    scene, cam_params, _ = colonnade()
    data, meta = scene.data, scene.meta
    print(f"backend={jax.default_backend()} lights={meta.light_types}",
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
    tmax = jnp.full(n, traverse.F32_MAX)

    intersect = jax.jit(
        lambda o, d: traverse.intersect(data, meta, o, d, tmax)
    )
    hit = timed("closest (primary)", intersect, o0, d0)

    @jax.jit
    def surf_and_mats(o, d):
        si = make_surface(data, hit, o, d)
        mp = bsdf_mod.gather_materials(data, si, meta)
        return si, mp

    si, mp = timed("surface+material gathers", surf_and_mats, o0, d0)

    for li_idx, ltype in enumerate(meta.light_types):

        @jax.jit
        def nee_ray(si):
            u = sampler.get_2d(ctx, 2 + 2 * li_idx)
            ls = lights_mod.sample_li(data, li_idx, ltype, si, u)
            o_s, d_s = spawn_ray_to(si, ls.target)
            return o_s, d_s, ls.skip_light

        o_s, d_s, skip = timed(f"nee sample+spawn (light {li_idx})",
                               nee_ray, si)

        occl = jax.jit(
            lambda o_s, d_s, skip: traverse.any_intersect(
                data, meta, o_s, d_s, jnp.full(n, 0.9999), skip
            )
        )
        timed(f"occlusion (light {li_idx})", occl, o_s, d_s, skip)

    @jax.jit
    def bsdf_next(si, mp):
        u = sampler.get_2d(ctx, 6)
        bs = bsdf_mod.bsdf_sample(mp, si, si.wo, u, meta)
        return spawn_ray(si, bs.wi), bs.wi

    (o1, d1) = timed("bsdf sample+spawn", bsdf_next, si, mp)

    hit1 = timed("closest (bounce 1)", intersect, o1, d1)

    @jax.jit
    def surf1(o, d):
        si = make_surface(data, hit1, o, d)
        return bsdf_mod.gather_materials(data, si, meta)[1]

    timed("surface+material gathers (bounce)", surf1, o1, d1)

    # Shadow rays FROM bounce-1 surfaces (divergent origins).
    @jax.jit
    def si1_of(o, d):
        return make_surface(data, hit1, o, d)

    si1 = jax.block_until_ready(si1_of(o1, d1))
    for li_idx, ltype in enumerate(meta.light_types):

        @jax.jit
        def nee_ray1(si1):
            u = sampler.get_2d(ctx, 8 + 2 * li_idx)
            ls = lights_mod.sample_li(data, li_idx, ltype, si1, u)
            o_s, d_s = spawn_ray_to(si1, ls.target)
            return o_s, d_s, ls.skip_light

        o_s, d_s, skip = jax.block_until_ready(nee_ray1(si1))
        occl = jax.jit(
            lambda o_s, d_s, skip: traverse.any_intersect(
                data, meta, o_s, d_s, jnp.full(n, 0.9999), skip
            )
        )
        timed(f"occlusion bounce (light {li_idx})", occl, o_s, d_s, skip)

    print("done", flush=True)


if __name__ == "__main__":
    main()
