"""Round-4: is the per-bounce TEXTURE chain (uv + per-lane texel gather,
~6.8 ms standalone at 1M) the real beast inside the measured ~35 ms/wave
fused-driver input glue?  Lean 5-bounce chain (r3_floor4 'B' shape) with
real shade_fused, textured vs has_textures knocked out."""

import dataclasses

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
    from yuki_tpu.ops import shade_fused as sf
    from yuki_tpu.sampling import SampleCtx, UniformSampler
    from yuki_tpu.scene.cornell import cornell

    scene, cam_params, _ = cornell()
    data, meta = scene.data, scene.meta
    meta_notex = dataclasses.replace(
        meta, has_textures=False, has_sigma_tex=False)
    print(f"backend={jax.default_backend()}", flush=True)
    camera = Camera.create(cam_params, 1920, 1080)
    sampler = UniformSampler(1)
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
    tm = jnp.full(n, traverse.F32_MAX)
    L = len(meta.light_types)

    def chain(m):
        @jax.jit
        def run(data, p_film):
            o, d = camera.ray(p_film)
            beta = jnp.ones_like(o)
            rad = jnp.zeros_like(o)
            alive = jnp.ones(n, bool)
            spec = jnp.ones(n, bool)

            def body(carry, bounce):
                o, d, beta, rad, alive, spec = carry
                hit = traverse.intersect(data, m, o, d, tm)
                missed = alive & ~hit.hit
                alive2 = alive & hit.hit
                (o2, d2, beta2, alive3, spec2, no, nd, nt, ns_k, nw,
                 nc, ne) = sf.shade_fused(
                    data, m, sampler, ctx, hit, o, d, beta, alive2,
                    spec, jnp.int32(2), bounce)
                occ = traverse.any_intersect(
                    data, m, no, nd, nt, ns_k, skip_sort=True)
                rad = sf.resolve_fused(
                    data, rad, beta, alive2, missed, ne, occ, nw,
                    nc, bounce, L, None)
                return (o2, d2, beta2, rad, alive3, spec2), None

            carry, _ = jax.lax.scan(
                body, (o, d, beta, rad, alive, spec),
                jnp.arange(5, dtype=jnp.int32))
            return carry[3].sum()

        return run

    timed("B textured (production meta)", chain(meta), data, p_film)
    timed("B has_textures knocked out", chain(meta_notex), data, p_film)
    print("done", flush=True)


if __name__ == "__main__":
    main()
