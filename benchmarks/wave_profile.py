"""Profile traversal candidate counts + current kernel timings on the
colonnade for (a) a coherent primary wave and (b) a divergent bounce-like
wave.  Decides the round-2 per-ray dispatch design's capacity constants.

    nohup python benchmarks/wave_profile.py > /tmp/wave_profile.log 2>&1 &
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from yuki_tpu.camera import Camera
    from yuki_tpu.scene.testscenes import colonnade
    from yuki_tpu.ops.trace_pairs import pairs_closest, block_candidate_pairs

    scene, cam_params, _ = colonnade()
    tl = scene.data.treelets
    n_tris = scene.data.tris.p0.shape[0]
    print(f"backend={jax.default_backend()} tris={n_tris} "
          f"treelets={tl.n_treelets} supers={tl.n_supers} K={tl.leaf_size}",
          flush=True)

    n = 65536
    camera = Camera.create(cam_params, 1920, 1080)

    # Primary wave: tile-ordered film samples (matches bench waves).
    tiles = 256
    td = 16
    tx = (np.arange(tiles) % 32) * td
    ty = (np.arange(tiles) // 32) * td
    px = (tx[:, None, None] + np.arange(td)[None, :, None] + 0.5)
    py = (ty[:, None, None] + np.arange(td)[None, None, :] + 0.5)
    p_film = jnp.asarray(
        np.stack([np.broadcast_to(px, (tiles, td, td)).reshape(-1),
                  np.broadcast_to(py, (tiles, td, td)).reshape(-1)], axis=-1),
        jnp.float32)
    o_p, d_p = camera.ray(p_film)
    t_p = jnp.full(n, 3.4e38, jnp.float32)

    # Divergent wave: origins on random triangles, cosine-ish directions.
    rng = np.random.default_rng(7)
    p0 = np.asarray(scene.data.tris.p0)
    p1 = np.asarray(scene.data.tris.p1)
    p2 = np.asarray(scene.data.tris.p2)
    ids = rng.integers(0, n_tris, n)
    u = rng.random((n, 1)).astype(np.float32)
    v = (rng.random((n, 1)) * (1 - u)).astype(np.float32)
    orig = p0[ids] + u * (p1[ids] - p0[ids]) + v * (p2[ids] - p0[ids])
    nrm = np.cross(p1[ids] - p0[ids], p2[ids] - p0[ids])
    nrm /= np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-12)
    dirs = rng.standard_normal((n, 3)).astype(np.float32)
    dirs /= np.maximum(np.linalg.norm(dirs, axis=1, keepdims=True), 1e-12)
    flip = (dirs * nrm).sum(1, keepdims=True) < 0
    dirs = np.where(flip, -dirs, dirs).astype(np.float32)
    orig = (orig + 1e-3 * nrm).astype(np.float32)
    o_b = jnp.asarray(orig)
    d_b = jnp.asarray(dirs)
    t_b = jnp.full(n, 3.4e38, jnp.float32)

    @jax.jit
    def exact_counts(bounds, o, d, tm):
        inv = 1.0 / jnp.where(jnp.abs(d) < 1e-20, 1e-20, d)
        lo = bounds[:, 0:3]
        hi = bounds[:, 3:6]
        t0 = (lo[:, None, :] - o[None, :, :]) * inv[None, :, :]
        t1 = (hi[:, None, :] - o[None, :, :]) * inv[None, :, :]
        tmin = jnp.minimum(t0, t1).max(axis=-1)
        tmax = jnp.maximum(t0, t1).min(axis=-1)
        h = jnp.maximum(tmin, 0.0) <= jnp.minimum(tmax, tm[None, :])
        per_ray = h.sum(axis=0)
        return per_ray

    for name, o, d, tm in [("primary", o_p, d_p, t_p),
                           ("bounce", o_b, d_b, t_b)]:
        c_t = np.asarray(exact_counts(tl.treelet_bounds, o, d, tm))
        c_s = np.asarray(exact_counts(tl.super_bounds, o, d, tm))
        # Block-conservative pairs (today's cull)
        _, _, n_pairs, n_blocks = jax.jit(
            lambda o, d, tm: block_candidate_pairs(tl, o, d, tm, 393216)
        )(o, d, tm)
        print(f"[{name}] exact treelet cands/ray: mean={c_t.mean():.1f} "
              f"p50={np.percentile(c_t,50):.0f} p95={np.percentile(c_t,95):.0f} "
              f"max={c_t.max()} total={c_t.sum()}", flush=True)
        print(f"[{name}] exact super cands/ray: mean={c_s.mean():.1f} "
              f"p95={np.percentile(c_s,95):.0f} total={c_s.sum()}", flush=True)
        print(f"[{name}] today's block pairs: {int(n_pairs)} "
              f"(x1024 rays x64 tris each)", flush=True)

        # Time today's pairs_closest.
        out = pairs_closest(tl, o, d, tm)
        jax.block_until_ready(out)
        t0 = time.monotonic()
        for _ in range(3):
            out = pairs_closest(tl, o, d, tm)
            jax.block_until_ready(out)
        dt = (time.monotonic() - t0) / 3
        print(f"[{name}] pairs_closest today: {dt*1e3:.1f} ms", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
