"""Stream traversal vs the pair-list path on REAL colonnade waves:
primary, bounce-1 closest, and bounce shadow segments.

    PYTHONPATH=/root/repo:/root/.axon_site nohup python \
        benchmarks/stream_bench.py > /tmp/stream_bench.log 2>&1 &
"""

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
    from yuki_tpu.integrators import _BENIGN_D
    from yuki_tpu.ops.trace_stream import stream_closest, stream_any

    scene, cam_params, _ = colonnade()
    data, meta = scene.data, scene.meta
    print(f"backend={jax.default_backend()} chunks={data.chunks.n_treelets}",
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
    tmax_full = jnp.full(n, traverse.F32_MAX)

    ch = data.chunks
    sp = data.tris.shading_packed
    sc_jit = jax.jit(lambda o, d, t: stream_closest(ch, sp, o, d, t)[:2])
    sa_jit = jax.jit(
        lambda o, d, t, s: stream_any(ch, o, d, t, s)[0].sum()
        .astype(jnp.float32)
    )

    t0, p0_ = timed("stream_closest primary", sc_jit, o0, d0, tmax_full)

    @jax.jit
    def bounce_wave(o0, d0):
        hit = traverse.intersect(data, meta, o0, d0, tmax_full)
        alive = hit.hit
        si = make_surface(data, hit, o0, d0)
        mp = bsdf_mod.gather_materials(data, si, meta)
        u = sampler.get_2d(ctx, 6)
        bs = bsdf_mod.bsdf_sample(mp, si, si.wo, u, meta)
        alive = alive & (bs.pdf > 0.0)
        center = 0.5 * (data.world_lo + data.world_hi)
        o1 = jnp.where(alive[..., None], spawn_ray(si, bs.wi), center)
        d1 = jnp.where(alive[..., None], bs.wi, _BENIGN_D)
        t1 = jnp.where(alive, traverse.F32_MAX, 0.0)
        uls = sampler.get_2d(ctx, 2)
        ls = lights_mod.sample_li(data, 0, meta.light_types[0], si, uls)
        o_s, d_s = spawn_ray_to(si, ls.target)
        return o1, d1, t1, o_s, d_s, ls.skip_light

    o1, d1, t1, o_s, d_s, skip = jax.block_until_ready(bounce_wave(o0, d0))

    timed("stream_closest bounce", sc_jit, o1, d1, t1)
    timed("stream_any shadow", sa_jit, o_s, d_s, jnp.full(n, 0.9999), skip)
    timed("traverse.intersect e2e bounce (stream+spheres+cond)",
          jax.jit(lambda o, d, t: traverse.intersect(data, meta, o, d, t).t
                  .sum()),
          o1, d1, t1)
    timed("traverse.any_intersect e2e shadow",
          jax.jit(lambda o, d, t, s: traverse.any_intersect(
              data, meta, o, d, t, s).sum().astype(jnp.float32)),
          o_s, d_s, jnp.full(n, 0.9999), skip)
    print("done", flush=True)


if __name__ == "__main__":
    main()
