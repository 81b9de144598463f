"""CPU-side chunk-size (K) sweep predictor for the incidence cull.

The divergent-path cost terms scale as:
  cross_words / extract / wide-pass  ~ O(rays x n_chunks)   [the atrium wall]
  sort / pack / merge                ~ O(total pairs)
  Pallas walk kernel                 ~ O(pair tests) = pairs x K  (per-ray)
                                       or bundle-pairs x 8 x K    (bundles)

Bigger K divides n_chunks (and W words) by K/128 while multiplying the
kernel's per-pair test count by the same factor — whether it pays
depends on how sub-linearly the PAIR count falls with K.  This script
measures exactly that with host numpy slab tests on real (CPU-traced)
bounce/shadow waves, colonnade + atrium, K in {128, 256, 512}.

    PYTHONPATH=/root/repo nohup python \
        benchmarks/r3_kstats.py > /tmp/r3_kstats.log 2>&1 &
"""

import time

import numpy as np

N_TILES = 512  # 131k rays is plenty for statistics, CPU traces faster
TD = 16


def ray_waves(scene):
    """Trace primaries on CPU; return sorted bounce + shadow waves."""
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
    camera = Camera.create(scene.cam_params, 1920, 1080)
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
        key = traverse.ray_sort_key(data, o1, d1)
        order = jnp.argsort(key)
        key_s = traverse.ray_sort_key(data, o_s, d_s)
        order_s = jnp.argsort(key_s)
        return (
            o1[order], d1[order], t1[order],
            o_s[order_s], d_s[order_s], t_s[order_s],
        )

    import jax

    out = jax.block_until_ready(waves(o0, d0))
    return tuple(np.asarray(a) for a in out)


def crossings_per_ray(bounds, o, d, tm, blk=8192):
    """Exact slab-test crossed-chunk counts [N] plus per-8-bundle OR
    counts [N//8] (numpy, blocked over rays)."""
    lo = bounds[:, 0:3]  # [T,3]
    hi = bounds[:, 3:6]
    n = o.shape[0]
    per_ray = np.empty(n, np.int32)
    per_b8 = np.empty(n // 8, np.int32)
    pairs_b8 = 0
    for i in range(0, n, blk):
        ob, db, tb = o[i:i + blk], d[i:i + blk], tm[i:i + blk]
        inv = np.where(db != 0.0, 1.0 / np.where(db == 0.0, 1.0, db), np.inf)
        t0 = (lo[None] - ob[:, None]) * inv[:, None]  # [B,T,3]
        t1 = (hi[None] - ob[:, None]) * inv[:, None]
        tn = np.minimum(t0, t1).max(axis=2)
        tf = np.maximum(t0, t1).min(axis=2)
        hit = (tn <= tf) & (tf >= 0.0) & (tn <= tb[:, None])
        per_ray[i:i + blk] = hit.sum(axis=1)
        h8 = hit.reshape(-1, 8, hit.shape[1]).any(axis=1)
        per_b8[i // 8:(i + blk) // 8] = h8.sum(axis=1)
        pairs_b8 += int(h8.sum())
    return per_ray, per_b8


def stats(label, c):
    print(
        f"    {label}: mean={c.mean():6.2f} p95={np.percentile(c, 95):4.0f} "
        f"p99={np.percentile(c, 99):4.0f} max={c.max():5d} sum={int(c.sum())}",
        flush=True,
    )


def sweep(label, scene):
    from yuki_tpu.treelets import build_treelets

    data = scene.data
    tri_p = np.stack(
        [np.asarray(data.tris.p0), np.asarray(data.tris.p1),
         np.asarray(data.tris.p2)], axis=1,
    )
    tri_light = np.asarray(data.tris.area_light)
    print(f"== {label}: {tri_p.shape[0]} tris ==", flush=True)
    t0 = time.monotonic()
    o1, d1, t1, o_s, d_s, t_s = ray_waves(scene)
    print(f"  waves traced in {time.monotonic()-t0:.0f}s", flush=True)

    for K in (128, 256, 512):
        t0 = time.monotonic()
        ch = build_treelets(
            scene.bvh_host, tri_p, tri_light, leaf_size=K, super_size=K,
        )
        cb = np.asarray(ch.treelet_bounds)
        T = ch.n_treelets
        W = -(-T // 32)
        print(f"  K={K}: chunks={T} words={W} "
              f"(build {time.monotonic()-t0:.0f}s)", flush=True)
        for wname, (o, d, tm) in (
            ("bounce", (o1, d1, t1)),
            ("shadow", (o_s, d_s, t_s)),
        ):
            pr, pb8 = crossings_per_ray(cb, o, d, tm)
            stats(f"{wname} per-ray ", pr)
            stats(f"{wname} bundle8 ", pb8)
            # Cost model (relative units): cull ~ rays*T; kernel tests.
            print(
                f"      cull~rays*T={o.shape[0]*T/1e6:.0f}M  "
                f"ray-tests={int(pr.sum())*K/1e6:.0f}M  "
                f"bundle-tests={int(pb8.sum())*8*K/1e6:.0f}M",
                flush=True,
            )


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from types import SimpleNamespace

    from yuki_tpu.scene.testscenes import colonnade

    scene, cam, _ = colonnade()
    scene.cam_params = cam
    sweep("colonnade", scene)

    import sys

    sys.path.insert(0, "/root/repo")
    from bench import load_atrium

    scene_a, cam_a, _ = load_atrium()
    scene_a.cam_params = cam_a
    sweep("atrium", scene_a)


if __name__ == "__main__":
    main()
