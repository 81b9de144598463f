"""Split the fused-shade driver's ~35 ms between input packing and
output unpacking: lean chain (r3_floor4) variants
  B_full   : real shade_fused, all outputs consumed (= floor4 B)
  B_scalar : real shade_fused but only a scalar of its output consumed
             (XLA DCEs the unpack; pack+kernel stay live)
pack+kernel = B_scalar - A(15.5); unpack = B_full - B_scalar."""

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

    def chain(scalar_only):
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
                alive2 = alive & hit.hit
                (o2, d2, beta2, alive3, spec2, no, nd, nt, ns_k, nw,
                 nc, ne) = sf.shade_fused(
                    data, meta, sampler, ctx, hit, o, d, beta, alive2,
                    spec, jnp.int32(2), bounce)
                if scalar_only:
                    # consume one scalar: pack+kernel live, unpack DCEd
                    rad = rad + ne[:1, :1] * 1e-30
                    occ = traverse.any_intersect(
                        data, meta, o, d, tm * 0.5,
                        jnp.full(n, -1, jnp.int32), skip_sort=True)
                    rad = rad + jnp.where(
                        (alive2 & ~occ)[:, None], beta * 0.1, 0.0)
                    o2 = o + hit.t[:, None] * d
                    d2 = jnp.where(alive2[:, None], -d, d)
                    return (o2, d2, beta * 0.9, rad, alive2, spec), None
                occ = traverse.any_intersect(
                    data, meta, no, nd, nt, ns_k, skip_sort=True)
                rad = rad + jnp.where(
                    (alive2 & ~occ[:n])[:, None], beta * (nc[:n] + ne),
                    0.0)
                return (o2, d2, beta2, rad, alive3, spec2), None

            carry, _ = jax.lax.scan(
                body, (o, d, beta, rad, alive, spec),
                jnp.arange(5, dtype=jnp.int32))
            return carry[3].sum()

        return run

    timed("B_scalar (pack+kernel, no unpack)", chain(True), data, p_film)
    timed("B_full", chain(False), data, p_film)
    print("done", flush=True)


if __name__ == "__main__":
    main()
