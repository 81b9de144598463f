"""Calibrate the 8-ray sublane-bundle cull for the planned bundle
engine: per-bundle (8 sorted rays) candidate-chunk counts — exact OR of
the per-ray cull vs the conservative interval cull — on primary /
bounce / shadow waves (colonnade + atrium).  The design's work model:

  kernel tests / wave = sum over bundles of (candidates x 8 x 128)
  pack row-gathers   = total (bundle, chunk) pairs  (vs per-ray slots)

so bundle-mean-vs-per-ray-mean is the amplification the sublane layout
pays, and pairs/8-bundle vs pairs/ray is the pack-gather reduction.

    PYTHONPATH=/root/repo nohup python \
        benchmarks/bundle_stats.py > /tmp/bundle_stats.log 2>&1 &
"""

import numpy as np

N_TILES = 1024
TD = 16

_POP = np.array([bin(v).count("1") for v in range(256)], np.int32)


def popcounts(words):
    b = words.view(np.uint8)
    return _POP[b.astype(np.int32)].reshape(words.shape[0], -1).sum(axis=1)


def stats(label, counts):
    print(
        f"  {label}: mean={counts.mean():.2f} "
        f"p50={np.percentile(counts, 50):.0f} "
        f"p95={np.percentile(counts, 95):.0f} "
        f"p99={np.percentile(counts, 99):.0f} max={counts.max()}",
        flush=True,
    )


def run(label, scene_fn):
    import jax
    import jax.numpy as jnp

    from yuki_tpu import bsdf as bsdf_mod
    from yuki_tpu import lights as lights_mod
    from yuki_tpu import traverse
    from yuki_tpu.camera import Camera
    from yuki_tpu.integrators import _BENIGN_D
    from yuki_tpu.sampling import SampleCtx, UniformSampler
    from yuki_tpu.surface import make_surface, spawn_ray, spawn_ray_to
    from yuki_tpu.ops.trace_rows import row_words_interval
    from yuki_tpu.ops.trace_stream import _cross_words_xla

    scene, cam_params, _ = scene_fn()
    data, meta = scene.data, scene.meta
    ch = data.chunks
    print(f"== {label}: chunks={ch.n_treelets}", flush=True)

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

    @jax.jit
    def waves(o0, d0):
        hit0 = traverse.intersect(data, meta, o0, d0, tmax_full)
        alive = hit0.hit
        si = make_surface(data, hit0, o0, d0)
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
        o_s = jnp.where(alive[..., None], o_s, center)
        d_s = jnp.where(alive[..., None], d_s, _BENIGN_D)
        t_s = jnp.where(alive, 0.9999, 0.0)
        return o1, d1, t1, o_s, d_s, t_s

    o1, d1, t1, o_s, d_s, t_s = jax.block_until_ready(waves(o0, d0))

    def sort_wave(o, d, tm):
        order = jnp.argsort(traverse.ray_sort_key(data, o, d))
        return o[order], d[order], tm[order]

    wavesets = {
        "primary": (o0, d0, tmax_full),
        "bounce": sort_wave(o1, d1, t1),
        "shadow": sort_wave(o_s, d_s, t_s),
    }

    blk = 32768
    f_int8 = jax.jit(
        lambda o_, d_, t_: row_words_interval(ch, o_, d_, t_, group=8)
    )
    f_exact = jax.jit(lambda o_, d_, t_: _cross_words_xla(ch, o_, d_, t_))
    for wname, (o, d, tm) in wavesets.items():
        ints, exacts = [], []
        for i in range(0, n, blk):
            ints.append(
                np.asarray(f_int8(o[i:i+blk], d[i:i+blk], tm[i:i+blk]))
            )
            exacts.append(
                np.asarray(f_exact(o[i:i+blk], d[i:i+blk], tm[i:i+blk]))
            )
        wi8 = np.concatenate(ints)  # [n//8, W] interval bundle words
        we = np.concatenate(exacts)  # [n, W] exact per-ray words
        w = we.shape[1]
        we8 = np.bitwise_or.reduce(we.reshape(n // 8, 8, w), axis=1)
        missing = np.any(we8 & ~wi8)
        print(f" {wname}: superset={'OK' if not missing else 'VIOLATED'}",
              flush=True)
        stats("per-ray exact   ", popcounts(we))
        stats("bundle8 exact-or", popcounts(we8))
        stats("bundle8 interval", popcounts(wi8))
        # Work model: kernel tests scale with bundle counts x 8; pack
        # gathers scale with total pairs at each granularity.
        pr = popcounts(we).sum()
        b8e = popcounts(we8).sum()
        b8i = popcounts(wi8).sum()
        print(
            f"  pairs: per-ray={pr}  bundle8-exact={b8e} "
            f"(test-amp x{8*b8e/max(pr,1):.2f}, gathers x{b8e/max(pr,1):.3f})"
            f"  bundle8-interval={b8i} (test-amp x{8*b8i/max(pr,1):.2f})",
            flush=True,
        )


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from yuki_tpu.scene.testscenes import colonnade

    run("colonnade", colonnade)
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import load_atrium

    scene_a, cam_a, _ = load_atrium()
    run("atrium", lambda: (scene_a, cam_a, None))
    print("done", flush=True)


if __name__ == "__main__":
    main()
