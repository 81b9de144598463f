"""Is the Cornell d5 wave time a fixed per-dispatch floor?  Time the
production chain at 4096 vs 1024 tiles, at reps 3 vs 12 (pipelining),
and a trivial jitted fn taking the same (data, p_film) pytree."""

import numpy as np

TD = 16


def timed(label, fn, *args, reps=3):
    from _timing import drained

    return drained(label, fn, *args, reps=reps)


def main():
    import jax
    import jax.numpy as jnp

    from yuki_tpu.camera import Camera
    from yuki_tpu.integrators import PathParams, path_li
    from yuki_tpu.sampling import SampleCtx, UniformSampler
    from yuki_tpu.scene.cornell import cornell

    scene, cam_params, _ = cornell()
    data, meta = scene.data, scene.meta
    print(f"backend={jax.default_backend()}", flush=True)
    camera = Camera.create(cam_params, 1920, 1080)
    sampler = UniformSampler(1)
    params = PathParams(max_depth=5)

    def make(n_tiles):
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
        p_film = jnp.asarray(
            np.stack([px + 0.5, py + 0.5], -1), jnp.float32)

        @jax.jit
        def run(data, p_film):
            o, d = camera.ray(p_film)
            res = path_li(data, meta, params, sampler, ctx, o, d)
            return res.li.sum()

        return run, p_film

    run4k, pf4k = make(4096)
    run1k, pf1k = make(1024)

    @jax.jit
    def trivial(data, p_film):
        return data.tris.p0.sum() + p_film.sum()

    timed("trivial (same args)", trivial, data, pf4k, reps=10)
    timed("d5 4096 tiles reps=3", run4k, data, pf4k, reps=3)
    timed("d5 4096 tiles reps=12", run4k, data, pf4k, reps=12)
    timed("d5 1024 tiles reps=3", run1k, data, pf1k, reps=3)
    timed("d5 1024 tiles reps=12", run1k, data, pf1k, reps=12)
    print("done", flush=True)


if __name__ == "__main__":
    main()
