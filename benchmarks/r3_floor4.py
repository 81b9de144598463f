"""Build floor3's lean 15.8 ms trace+any scan stepwise toward the
81 ms production path_li to find the cliff:
  A trace+any           : floor3 baseline
  B +shade_fused real   : insert the real fused shade (pack+kernel+
                          unpack) between trace and any, its outputs
                          feeding the next bounce + the any call
  C +resolve real       : + the real resolve_fused on the any verdict
  D production path_li  : the real thing for reference
"""

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

    def chain(kind):
        @jax.jit
        def run(data, p_film):
            o, d = camera.ray(p_film)
            beta = jnp.ones_like(o)
            rad = jnp.zeros_like(o)
            alive = jnp.ones(n, bool)
            spec = jnp.ones(n, bool)

            def body(carry, bounce):
                o, d, beta, rad, alive, spec = carry
                hit = traverse.intersect(data, meta, o, d, tm)
                missed = alive & ~hit.hit
                alive2 = alive & hit.hit
                if kind == "A":
                    occ = traverse.any_intersect(
                        data, meta, o, d, tm * 0.5,
                        jnp.full(n, -1, jnp.int32), skip_sort=True)
                    rad = rad + jnp.where(
                        (alive2 & ~occ)[:, None], beta * 0.1, 0.0)
                    o2 = o + hit.t[:, None] * d
                    d2 = jnp.where(alive2[:, None], -d, d)
                    return (o2, d2, beta * 0.9, rad, alive2, spec), None
                (o2, d2, beta2, alive3, spec2, no, nd, nt, ns_k, nw,
                 nc, ne) = sf.shade_fused(
                    data, meta, sampler, ctx, hit, o, d, beta, alive2,
                    spec, jnp.int32(2), bounce)
                occ = traverse.any_intersect(
                    data, meta, no, nd, nt, ns_k, skip_sort=True)
                if kind == "B":
                    rad = rad + jnp.where(
                        (alive2 & ~occ[:n])[:, None],
                        beta * (nc[:n] + ne), 0.0)
                else:  # C
                    rad = sf.resolve_fused(
                        data, rad, beta, alive2, missed, ne, occ, nw,
                        nc, bounce, L, None)
                return (o2, d2, beta2, rad, alive3, spec2), None

            carry, _ = jax.lax.scan(
                body, (o, d, beta, rad, alive, spec),
                jnp.arange(5, dtype=jnp.int32))
            return carry[3].sum()

        return run

    timed("A trace+any", chain("A"), data, p_film)
    timed("B +shade_fused", chain("B"), data, p_film)
    timed("C +resolve", chain("C"), data, p_film)

    params = PathParams(max_depth=5)

    @jax.jit
    def prod(data, p_film):
        o, d = camera.ray(p_film)
        return path_li(
            data, meta, params, sampler, ctx, o, d).li.sum()

    timed("D production path_li", prod, data, p_film)
    print("done", flush=True)


if __name__ == "__main__":
    main()
