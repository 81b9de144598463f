"""Per-ray WORD-BOX crossing stats: sizes the two-level exact cull.

Level 1 of the proposed two-level cull tests each ray against the
union AABB of every 32-chunk word (the same boxes the cross kernel's
word cull uses, trace_stream._cross_words_tpu); level 2 tests only the
crossed words' chunks.  Work per ray becomes W + 32*S where S is the
per-ray crossed-WORD count — this script measures S's distribution on
real bounce/shadow waves (CPU backend) to size the static slot cap and
predict the work cut vs the flat O(chunks) cull.

    PYTHONPATH=/root/repo python benchmarks/r3_superstats.py
"""

import numpy as np


def wave(scene, cam_params, kind):
    import jax
    import jax.numpy as jnp

    from yuki_tpu import bsdf as bsdf_mod
    from yuki_tpu import lights as lights_mod
    from yuki_tpu import traverse
    from yuki_tpu.camera import Camera
    from yuki_tpu.integrators import _BENIGN_D
    from yuki_tpu.sampling import SampleCtx, UniformSampler
    from yuki_tpu.surface import make_surface, spawn_ray, spawn_ray_to

    data, meta = scene.data, scene.meta
    n_tiles, td = 512, 16
    n = n_tiles * td * td
    camera = Camera.create(cam_params, 1920, 1080)
    tx = (np.arange(n_tiles) % 120) * td
    ty = (np.arange(n_tiles) // 120) * td
    px = np.broadcast_to(
        tx[:, None, None] + np.arange(td)[None, :, None],
        (n_tiles, td, td)).reshape(-1)
    py = np.broadcast_to(
        ty[:, None, None] + np.arange(td)[None, None, :],
        (n_tiles, td, td)).reshape(-1)
    ctx = SampleCtx(
        px=jnp.asarray(px, jnp.int32), py=jnp.asarray(py, jnp.int32),
        sample_index=jnp.uint32(0), seed=jnp.uint32(1),
    )
    sampler = UniformSampler(1)
    p_film = jnp.asarray(np.stack([px + 0.5, py + 0.5], -1), jnp.float32)
    o0, d0 = camera.ray(p_film)
    tm0 = jnp.full(n, traverse.F32_MAX)
    if kind == "primary":
        return data, o0, d0, tm0
    hit = traverse.intersect(data, meta, o0, d0, tm0)
    alive = hit.hit
    si = make_surface(data, hit, o0, d0)
    center = 0.5 * (data.world_lo + data.world_hi)
    if kind == "shadow":
        u = sampler.get_2d(ctx, 2)
        ls = lights_mod.sample_li(data, 0, meta.light_types[0], si, u)
        o_s, d_s = spawn_ray_to(si, ls.target)
        o_s = jnp.where(alive[:, None], o_s, center)
        d_s = jnp.where(alive[:, None], d_s, _BENIGN_D)
        t_s = jnp.where(alive, 0.9999, 0.0)
        return data, o_s, d_s, t_s
    mp = bsdf_mod.gather_materials(data, si, meta)
    u = sampler.get_2d(ctx, 6)
    bs = bsdf_mod.bsdf_sample(mp, si, si.wo, u, meta)
    alive = alive & (bs.pdf > 0.0)
    o1 = jnp.where(alive[:, None], spawn_ray(si, bs.wi), center)
    d1 = jnp.where(alive[:, None], bs.wi, _BENIGN_D)
    t1 = jnp.where(alive, traverse.F32_MAX, 0.0)
    return data, o1, d1, t1


def stats(name, scene, cam_params):
    import jax
    import jax.numpy as jnp

    from yuki_tpu.ops import trace_stream as ts
    from yuki_tpu.traverse import ray_sort_key

    ch = scene.data.chunks
    n_c = ch.n_treelets
    w_words = -(-n_c // 32)
    cb = np.asarray(ch.treelet_bounds[:, :6])
    pad = w_words * 32 - n_c
    cbp = np.concatenate([cb, np.full((pad, 6), np.inf, np.float32)], 0)
    bb_lo = cbp[:, 0:3].reshape(w_words, 32, 3).min(axis=1)
    bb_hi = cbp[:, 3:6].reshape(w_words, 32, 3).max(axis=1)

    print(f"== {name}: chunks={n_c} W={w_words}", flush=True)
    for kind in ("primary", "shadow", "bounce"):
        data, o, d, tm = wave(scene, cam_params, kind)
        order = jnp.argsort(ray_sort_key(data, o, d))
        o, d, tm = o[order], d[order], tm[order]
        on = np.asarray(o)
        dn = np.asarray(d)
        tn = np.asarray(tm)
        live = tn > 0
        inv = np.where(dn >= 0, 1.0, -1.0) / np.maximum(np.abs(dn), 1e-30)
        # per-ray x word-box slab (numpy, [N, W])
        t0 = (bb_lo[None] - on[:, None]) * inv[:, None]
        t1 = (bb_hi[None] - on[:, None]) * inv[:, None]
        tn_ = np.maximum(np.minimum(t0, t1).max(axis=2), 0.0)
        tf_ = np.maximum(t0, t1).min(axis=2)
        crossed = (tn_ <= np.minimum(tf_, tn[:, None])) & live[:, None]
        s = crossed.sum(axis=1)
        sl = s[live]
        # exact chunk crossings for comparison
        words = np.asarray(ts._cross_words_xla(
            data.chunks, jnp.asarray(on), jnp.asarray(dn), jnp.asarray(tn)))
        cnt = np.unpackbits(
            words.view(np.uint8), axis=1).sum(axis=1)[live]
        # chunks inside crossed words (= level-2 test count / 32)
        print(
            f"  {kind:8s} live={live.sum():7d} | words/ray mean "
            f"{sl.mean():.2f} p95 {np.percentile(sl, 95):.0f} p99 "
            f"{np.percentile(sl, 99):.0f} max {sl.max()} | exact "
            f"chunks/ray mean {cnt.mean():.2f} | L1+L2 tests/ray "
            f"{w_words + 32 * sl.mean():.0f} vs flat {n_c}",
            flush=True,
        )


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from yuki_tpu.scene.testscenes import colonnade

    scene, cam, _ = colonnade()
    stats("colonnade", scene, cam)

    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import load_atrium

    scene_a, cam_a, _ = load_atrium()
    stats("atrium", scene_a, cam_a)


if __name__ == "__main__":
    main()
