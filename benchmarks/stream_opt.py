"""Optimization experiments for the two hot v2 stages: the ray pack
(gather+transpose) and the traversal kernel (leaf-size sweep).
Cumulative-prefix timing; deltas vs a shared base cancel the dispatch
floor.

    PYTHONPATH=/root/repo:/root/.axon_site nohup python \
        benchmarks/stream_opt.py > /tmp/stream_opt.log 2>&1 &
"""

import functools
import time

import numpy as np

N_TILES = 1024
TD = 16


def timed(label, fn, *args):
    import jax

    out = jax.block_until_ready(fn(*args))
    t0 = time.monotonic()
    for _ in range(3):
        out = jax.block_until_ready(fn(*args))
    dt = (time.monotonic() - t0) / 3
    print(f"{label}: {dt*1e3:.1f} ms", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    from yuki_tpu import traverse
    from yuki_tpu.camera import Camera
    from yuki_tpu.scene.testscenes import colonnade
    from yuki_tpu.treelets import build_treelets
    import yuki_tpu.ops.trace_stream as ts

    scene, cam_params, _ = colonnade()
    data = scene.data
    ch128 = data.chunks
    sp = data.tris.shading_packed
    print(f"backend={jax.default_backend()}", flush=True)

    tri_p = np.stack(
        [np.asarray(data.tris.p0), np.asarray(data.tris.p1),
         np.asarray(data.tris.p2)], axis=1)
    tri_l = np.asarray(data.tris.area_light)
    ch64 = build_treelets(scene.bvh_host, tri_p, tri_l,
                          leaf_size=64, super_size=64)
    print(f"chunks128={ch128.n_treelets} chunks64={ch64.n_treelets}",
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
    p_film = jnp.asarray(np.stack([px + 0.5, py + 0.5], -1), jnp.float32)
    o, d = camera.ray(p_film)
    t_max = jnp.full(n, traverse.F32_MAX)

    C = ts.C_MAIN
    n_c = ch128.n_treelets
    max_rows = ts._max_rows(n, C, n_c, 6)

    # Shared base: everything through slots (floor included once).
    def base(o, d, t):
        lists, _ = ts.candidate_lists(ch128, o, d, t, C)
        slot_pos, row_chunk, valid, ok = ts.build_slots(
            n, n_c, lists, C, max_rows)
        slot_ray = jnp.where(valid, slot_pos // C, 0)
        return slot_ray, valid, row_chunk

    t_base = timed("base (cand+sort+slots)", jax.jit(
        lambda o, d, t: sum(x.sum() for x in base(o, d, t))), o, d, t_max)

    def pack_now(o, d, t):
        slot_ray, valid, _ = base(o, d, t)
        return ts._pack_stream(o, d, t, slot_ray, valid, max_rows).sum()

    def pack_barrier(o, d, t):
        slot_ray, valid, _ = base(o, d, t)
        ray_tab = jnp.concatenate(
            [o, d, t[:, None], jnp.zeros((n, 121), o.dtype)], axis=1)
        flat = jnp.where(valid, slot_ray, 0).reshape(-1)
        stream = jax.lax.optimization_barrier(ray_tab[flat])
        planes = stream[:, :8].reshape(max_rows, 128, 8).transpose(0, 2, 1)
        planes = planes.at[:, 6, :].set(
            jnp.where(valid, planes[:, 6, :], -1.0))
        return planes.reshape(max_rows * 8, 128).sum()

    def pack_notranspose(o, d, t):
        # timing-only: full-width gather, no narrowing, no transpose
        slot_ray, valid, _ = base(o, d, t)
        ray_tab = jnp.concatenate(
            [o, d, t[:, None], jnp.zeros((n, 121), o.dtype)], axis=1)
        flat = jnp.where(valid, slot_ray, 0).reshape(-1)
        return ray_tab[flat].sum()

    def pack_16wide(o, d, t):
        # 16-wide ray table: 8x less gather traffic IF the fast path
        # still triggers at 16 lanes.
        slot_ray, valid, _ = base(o, d, t)
        ray_tab = jnp.concatenate(
            [o, d, t[:, None], jnp.zeros((n, 9), o.dtype)], axis=1)
        flat = jnp.where(valid, slot_ray, 0).reshape(-1)
        stream = ray_tab[flat][:, :8]
        planes = stream.reshape(max_rows, 128, 8).transpose(0, 2, 1)
        return planes.reshape(max_rows * 8, 128).sum()

    t1 = timed("pack current", jax.jit(pack_now), o, d, t_max)
    t2 = timed("pack +barrier", jax.jit(pack_barrier), o, d, t_max)
    t3 = timed("pack gather-only-128", jax.jit(pack_notranspose), o, d,
               t_max)
    t4 = timed("pack 16-wide tab", jax.jit(pack_16wide), o, d, t_max)
    print(f"  pack deltas vs base: now={1e3*(t1-t_base):.1f} "
          f"barrier={1e3*(t2-t_base):.1f} gather128={1e3*(t3-t_base):.1f} "
          f"tab16={1e3*(t4-t_base):.1f}", flush=True)

    # Full pipeline with 64-leaf chunks, C=24.
    def full64(o, d, t):
        return ts.stream_closest(ch64, sp, o, d, t, C=24, mult=8)[0].sum()

    def full128(o, d, t):
        return ts.stream_closest(ch128, sp, o, d, t)[0].sum()

    timed("full chunks128 C16", jax.jit(full128), o, d, t_max)
    timed("full chunks64 C24", jax.jit(full64), o, d, t_max)
    print("done", flush=True)


if __name__ == "__main__":
    main()
