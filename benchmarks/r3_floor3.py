"""Decisive probe: scan-iteration overhead on this backend.  Bodies of
increasing content over a path_li-shaped carry at 1M rays:
  identity+eps : carry arithmetic only, no pallas
  trace        : + one production intersect per iteration
  trace+any    : + one L*N any_intersect per iteration
If identity+eps already costs tens of ms/iter, the per-bounce floor is
carry materialization, not pass content."""

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
    from yuki_tpu.sampling import SampleCtx
    from yuki_tpu.scene.cornell import cornell

    scene, cam_params, _ = cornell()
    data, meta = scene.data, scene.meta
    print(f"backend={jax.default_backend()}", flush=True)
    camera = Camera.create(cam_params, 1920, 1080)
    n_tiles = 4096
    tx = (np.arange(n_tiles) % 120) * TD
    ty = (np.arange(n_tiles) // 120) * TD
    px = np.broadcast_to(
        tx[:, None, None] + np.arange(TD)[None, :, None],
        (n_tiles, TD, TD)).reshape(-1)
    py = np.broadcast_to(
        ty[:, None, None] + np.arange(TD)[None, None, :],
        (n_tiles, TD, TD)).reshape(-1)
    p_film = jnp.asarray(np.stack([px + 0.5, py + 0.5], -1), jnp.float32)
    n = n_tiles * TD * TD
    tm = jnp.full(n, traverse.F32_MAX)

    def chain(body_kind):
        @jax.jit
        def run(data, p_film):
            o, d = camera.ray(p_film)
            beta = jnp.ones_like(o)
            rad = jnp.zeros_like(o)
            alive = jnp.ones(n, bool)

            def body(carry, _):
                o, d, beta, rad, alive = carry
                if body_kind in ("trace", "trace+any"):
                    hit = traverse.intersect(data, meta, o, d, tm)
                    t = hit.t
                    alive = alive & hit.hit
                else:
                    t = (o[:, 0] + d[:, 1]) * 1e-6
                if body_kind == "trace+any":
                    occ = traverse.any_intersect(
                        data, meta, o, d, tm * 0.5,
                        jnp.full(n, -1, jnp.int32), skip_sort=True)
                    rad = rad + jnp.where(
                        (alive & ~occ)[:, None], beta * 0.1, 0.0)
                o2 = o + t[:, None] * d
                d2 = jnp.where(alive[:, None], -d, d)
                beta2 = beta * 0.9
                rad2 = rad + jnp.where(alive[:, None], beta * 0.01, 0.0)
                return (o2, d2, beta2, rad2, alive), None

            carry, _ = jax.lax.scan(
                body, (o, d, beta, rad, alive), None, length=5)
            return carry[3].sum()

        return run

    timed("scan5 identity+eps", chain("id"), data, p_film)
    timed("scan5 trace", chain("trace"), data, p_film)
    timed("scan5 trace+any", chain("trace+any"), data, p_film)
    print("done", flush=True)


if __name__ == "__main__":
    main()
