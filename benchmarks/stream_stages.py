"""Per-stage timing of the incidence-stream path on a real primary wave:
level-1 cross, level-2 cross, compactions, sort, layout, pack, kernel,
merge — find the pathological stage.

    PYTHONPATH=/root/repo:/root/.axon_site nohup python \
        benchmarks/stream_stages.py > /tmp/stream_stages.log 2>&1 &
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
    return out


def main():
    import jax
    import jax.numpy as jnp

    from yuki_tpu import traverse
    from yuki_tpu.camera import Camera
    from yuki_tpu.scene.testscenes import colonnade
    import yuki_tpu.ops.trace_stream as ts

    scene, cam_params, _ = colonnade()
    data = scene.data
    tl = data.treelets
    print(f"backend={jax.default_backend()}", flush=True)

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

    cap1, cap2, max_slots = ts._caps(n, tl.n_treelets)
    max_rows = max_slots // ts.LANES
    print(f"cap1={cap1} cap2={cap2} max_slots={max_slots} "
          f"max_rows={max_rows}", flush=True)

    n_t = tl.n_treelets
    n_s = tl.n_supers
    ts_pad = max(8, -(-tl.ts_max // 8) * 8)

    # stage 1: level-1 cross + compact
    @jax.jit
    def lvl1(o, d, t_max):
        cross1 = ts._cross_bounds(tl.super_bounds, o, d, t_max)
        packed1 = jax.lax.broadcasted_iota(
            jnp.int32, (n, n_s), 0
        ) * jnp.int32(n_s) + jax.lax.broadcasted_iota(jnp.int32, (n, n_s), 1)
        pair1, n_p1 = ts._compact(
            cross1.reshape(-1), packed1.reshape(-1), cap1, jnp.int32(-1))
        return pair1, n_p1

    pair1, n_p1 = timed("lvl1 cross+compact", lvl1, o, d, t_max)
    print(f"  n_p1={int(n_p1)}", flush=True)

    # stage 2: level-2 gathers + slab + compact
    @jax.jit
    def lvl2(pair1, o, d, t_max):
        p1_ray = jnp.where(pair1 >= 0, pair1 // n_s, -1)
        p1_sup = jnp.where(pair1 >= 0, pair1 % n_s, 0)
        p1_ray_c = jnp.maximum(p1_ray, 0)
        o_g = o[p1_ray_c]
        d_g = d[p1_ray_c]
        t_g = jnp.where(pair1 >= 0, t_max[p1_ray_c], 0.0)
        t_first = tl.super_range[p1_sup, 0]
        t_count = tl.super_range[p1_sup, 1]
        local = jax.lax.broadcasted_iota(jnp.int32, (cap1, ts_pad), 1)
        tre_ids = jnp.minimum(t_first[:, None] + local, jnp.int32(n_t - 1))
        valid2 = (local < t_count[:, None]) & (pair1 >= 0)[:, None]
        tb = tl.treelet_bounds
        tn = jnp.zeros((cap1, ts_pad), o.dtype)
        tf = jnp.broadcast_to(t_g[:, None], (cap1, ts_pad))
        for a in range(3):
            inv = (1.0 / d_g[:, a])[:, None]
            tn, tf = ts._slab_axis(
                tb[tre_ids, a], tb[tre_ids, 3 + a], o_g[:, a][:, None],
                inv, tn, tf)
        cross2 = (tn <= tf) & (t_g > 0.0)[:, None] & valid2
        flat2 = cross2.reshape(-1)
        ray2 = jnp.broadcast_to(
            p1_ray_c[:, None], (cap1, ts_pad)).reshape(-1)
        tre2 = tre_ids.reshape(-1)
        pair_t, n_p2 = ts._compact(flat2, tre2, cap2, jnp.int32(n_t))
        pair_r, _ = ts._compact(flat2, ray2, cap2, jnp.int32(-1))
        return pair_t, pair_r, n_p2

    pair_t, pair_r, n_p2 = timed("lvl2 gather+slab+compact", lvl2,
                                 pair1, o, d, t_max)
    print(f"  n_p2={int(n_p2)}", flush=True)

    # stage 3: sort
    sort_jit = jax.jit(lambda pt, pr: jax.lax.sort(
        (pt, pr), num_keys=1, is_stable=True))
    pair_ts, pair_rs = timed("sort", sort_jit, pair_t, pair_r)

    # stage 4: layout (searchsorted + cumsum + scatter)
    @jax.jit
    def layout(pair_t, pair_r):
        seg = jnp.searchsorted(
            pair_t, jnp.arange(n_t + 1, dtype=jnp.int32), side="left"
        ).astype(jnp.int32)
        counts = seg[1:] - seg[:-1]
        aligned = -(-counts // ts.LANES) * ts.LANES
        aligned_off = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.cumsum(aligned)])
        i = jnp.arange(cap2, dtype=jnp.int32)
        tk = jnp.minimum(pair_t, n_t)
        rank = i - seg[tk]
        slot = jnp.where(
            pair_t < n_t, aligned_off[tk] + rank, jnp.int32(max_slots))
        slot_ray = jnp.full(max_slots, -1, jnp.int32).at[slot].set(
            pair_r, mode="drop")
        row_off = aligned_off // ts.LANES
        row_treelet = jnp.clip(jnp.searchsorted(
            row_off, jnp.arange(max_rows, dtype=jnp.int32), side="right"
        ).astype(jnp.int32) - 1, 0, n_t - 1)
        return slot_ray, row_treelet

    slot_ray, row_treelet = timed("layout", layout, pair_ts, pair_rs)

    # stage 5: pack
    pack_jit = jax.jit(functools.partial(ts._pack_stream, max_rows=max_rows))
    packed = timed("pack", pack_jit, o, d, t_max, slot_ray)

    # stage 6: kernel
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    k = tl.leaf_size

    @jax.jit
    def kernel(row_treelet, packed):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(max_rows,),
            in_specs=[
                pl.BlockSpec((k, 128), lambda p, rt: (rt[p], 0)),
                pl.BlockSpec((8, ts.LANES), lambda p, rt: (p, 0)),
            ],
            out_specs=[pl.BlockSpec((8, ts.LANES), lambda p, rt: (p, 0))],
        )
        (out,) = pl.pallas_call(
            functools.partial(ts._stream_closest_kernel, leaf_size=k),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((max_rows * 8, ts.LANES), jnp.float32)
            ],
        )(row_treelet, tl.tris_padded, packed)
        return out

    out = timed("kernel", kernel, row_treelet, packed)

    # stage 7: merge
    @jax.jit
    def merge(out, slot_ray, t_max):
        out = out.reshape(max_rows, 8, ts.LANES)
        slot_t = out[:, 0, :].reshape(-1)
        slot_prim = out[:, 1, :].reshape(-1)
        valid = (slot_ray >= 0) & (slot_prim >= 0.0)
        bucket = jnp.where(valid, slot_ray, n)
        t_best = jnp.full(n + 1, ts.F32_MAX).at[bucket].min(
            jnp.where(valid, slot_t, ts.F32_MAX))
        return t_best

    timed("merge (t only)", merge, out, slot_ray, t_max)
    print("done", flush=True)


if __name__ == "__main__":
    main()
