"""Exact per-ray incidence stream traversal — the divergent-wave engine.

Why this exists: block-granularity culling (trace_pairs.py) conservatively
unions 1024 divergent bounce rays, which measured ~750 candidate treelets
per block on the colonnade while the true PER-RAY incidence is only ~3.5
treelet AABBs (benchmarks/incidence_stats.py) — a ~200x work amplification
that made one bounce wave cost ~900 ms.  Here the cull is exact per ray
and the kernel does zero wasted triangle loops:

  1. Hierarchical incidence (all dense XLA, no [N,T] materialization):
     rays x super AABBs -> compacted (ray, super) pairs -> each pair tests
     its super's <= ts_max treelet AABBs -> compacted (ray, treelet)
     incidence pairs.  Counts match the reference's per-ray front-to-back
     traversal reach (bvh.rs:160-232) without per-lane stacks.
  2. The pairs are sorted treelet-major (one stable lax.sort) and laid out
     in a SLOT STREAM: each treelet's incident rays padded to 128-lane
     rows, so every Pallas grid step processes one (128-ray row, treelet)
     with perfect lane occupancy.
  3. The kernel streams each row's gathered rays from one packed plane
     array and walks the treelet's K triangles 8 AT A TIME: triangle
     components load as (8,1) sublane vectors broadcasting against (1,128)
     ray lanes, so one VPU op tests 8 triangles x 128 rays (K/8 steps
     instead of K).
  4. Results merge back per ray with scatter-min on t (closest) or
     scatter-or (any); ties break on lowest prim id, deterministically.

No ray sorting, no conservative recheck, no chunked cond-launch ladder:
one pallas_call, grid = stream rows.  Capacity overflow (pathological
waves) is reported via an `ok` flag; the caller falls back to the exact
in-kernel treelet walk.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .trace import _watertight, F32_MAX, LANES

BIG = 3.0e38


def _slab_axis(lo, hi, o, inv, tn, tf):
    """Fold one axis into running slab interval [tn, tf]; NaN (origin on a
    parallel slab plane) leaves the axis unconstrained — conservative and
    exactly the inside-slab case."""
    t0 = (lo - o) * inv
    t1 = (hi - o) * inv
    a = jnp.minimum(t0, t1)
    b = jnp.maximum(t0, t1)
    a = jnp.where(jnp.isnan(a), -jnp.inf, a)
    b = jnp.where(jnp.isnan(b), jnp.inf, b)
    return jnp.maximum(tn, a), jnp.minimum(tf, b)


def _cross_bounds(bounds, o, d, t_max):
    """bounds [M, 8] vs rays [N,...]: bool [N, M] crossing within [0,t]."""
    tn = jnp.zeros((o.shape[0], 1), o.dtype)
    tf = t_max[:, None]
    for a in range(3):
        inv = (1.0 / d[:, a])[:, None]
        tn, tf = _slab_axis(
            bounds[None, :, a], bounds[None, :, 3 + a], o[:, a][:, None],
            inv, tn, tf,
        )
    return (tn <= tf) & (t_max > 0.0)[:, None]


def _compact(flat_mask, flat_payload, cap, sentinel):
    """Indices-where via cumsum+scatter (jnp.nonzero lowers pathologically
    on TPU).  Returns (compacted [cap] payload, count)."""
    pos = jnp.cumsum(flat_mask.astype(jnp.int32))
    count = pos[-1]
    tgt = jnp.where(flat_mask, pos - 1, cap)
    out = jnp.full(cap, sentinel, flat_payload.dtype).at[tgt].set(
        flat_payload, mode="drop"
    )
    return out, count


def build_stream(tl, o, d, t_max, cap1: int, cap2: int, max_slots: int):
    """Exact incidence -> treelet-major 128-aligned slot stream.

    Returns (slot_ray [max_slots] i32 (-1 = empty), row_treelet
    [max_slots//128] i32, ok bool scalar)."""
    n = o.shape[0]
    n_t = tl.n_treelets
    ts_pad = max(8, -(-tl.ts_max // 8) * 8)

    # --- level 1: ray x super ---------------------------------------
    cross1 = _cross_bounds(tl.super_bounds, o, d, t_max)  # [N, S]
    n_s = tl.n_supers
    flat1 = cross1.reshape(-1)
    # Pack (ray, super) into one i32 so one compaction pass carries both.
    packed1 = jax.lax.broadcasted_iota(
        jnp.int32, (n, n_s), 0
    ) * jnp.int32(n_s) + jax.lax.broadcasted_iota(jnp.int32, (n, n_s), 1)
    pair1, n_p1 = _compact(flat1, packed1.reshape(-1), cap1, jnp.int32(-1))
    p1_ray = jnp.where(pair1 >= 0, pair1 // n_s, -1)
    p1_sup = jnp.where(pair1 >= 0, pair1 % n_s, 0)

    # --- level 2: (ray, super) x the super's treelets ----------------
    p1_ray_c = jnp.maximum(p1_ray, 0)
    o_g = o[p1_ray_c]
    d_g = d[p1_ray_c]
    t_g = jnp.where(pair1 >= 0, t_max[p1_ray_c], 0.0)
    t_first = tl.super_range[p1_sup, 0]  # [P1]
    t_count = tl.super_range[p1_sup, 1]
    local = jax.lax.broadcasted_iota(jnp.int32, (cap1, ts_pad), 1)
    tre_ids = jnp.minimum(
        t_first[:, None] + local, jnp.int32(n_t - 1)
    )  # clamped gather index
    valid2 = (local < t_count[:, None]) & (pair1 >= 0)[:, None]

    tb = tl.treelet_bounds  # [T, 8]
    tn = jnp.zeros((cap1, ts_pad), o.dtype)
    tf = jnp.broadcast_to(t_g[:, None], (cap1, ts_pad))
    for a in range(3):
        inv = (1.0 / d_g[:, a])[:, None]
        tn, tf = _slab_axis(
            tb[tre_ids, a], tb[tre_ids, 3 + a], o_g[:, a][:, None], inv,
            tn, tf,
        )
    cross2 = (tn <= tf) & (t_g > 0.0)[:, None] & valid2

    flat2 = cross2.reshape(-1)
    ray2 = jnp.broadcast_to(p1_ray_c[:, None], (cap1, ts_pad)).reshape(-1)
    tre2 = tre_ids.reshape(-1)
    pair_t, n_p2 = _compact(flat2, tre2, cap2, jnp.int32(n_t))
    pair_r, _ = _compact(flat2, ray2, cap2, jnp.int32(-1))

    # --- treelet-major order + 128-aligned slot layout ---------------
    pair_t, pair_r = jax.lax.sort((pair_t, pair_r), num_keys=1, is_stable=True)
    seg = jnp.searchsorted(
        pair_t, jnp.arange(n_t + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)  # [T+1]; seg[T] == n_p2
    counts = seg[1:] - seg[:-1]  # [T]
    aligned = -(-counts // LANES) * LANES
    aligned_off = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(aligned)]
    )  # [T+1]
    total_slots = aligned_off[-1]

    i = jnp.arange(cap2, dtype=jnp.int32)
    tk = jnp.minimum(pair_t, n_t)
    rank = i - seg[tk]
    slot = jnp.where(
        pair_t < n_t, aligned_off[tk] + rank, jnp.int32(max_slots)
    )
    slot_ray = jnp.full(max_slots, -1, jnp.int32).at[slot].set(
        pair_r, mode="drop"
    )

    max_rows = max_slots // LANES
    row_off = aligned_off // LANES  # exact: aligned are LANES multiples
    row_treelet = (
        jnp.searchsorted(
            row_off, jnp.arange(max_rows, dtype=jnp.int32), side="right"
        ).astype(jnp.int32)
        - 1
    )
    row_treelet = jnp.clip(row_treelet, 0, n_t - 1)

    ok = (n_p1 <= cap1) & (n_p2 <= cap2) & (total_slots <= max_slots)
    return slot_ray, row_treelet, ok


def _pack_stream(o, d, t_max, slot_ray, max_rows, extra=None):
    """Gather ray planes into the slot stream -> packed [max_rows*8, 128]
    f32 where each row's 7 (8 with `extra`) planes are CONSECUTIVE
    SUBLANES of its own (8,128) block: sublane 0..2 = o, 3..5 = d, 6 = t,
    7 = skip/pad.  This keeps every kernel access a static sublane slice —
    Mosaic rejects dynamic single-sublane loads ("unaligned indices").
    Empty slots carry t = -1 (dead lanes)."""
    idx = jnp.maximum(slot_ray, 0)
    live = slot_ray >= 0

    def plane(x, dead):
        return jnp.where(live, x[idx], dead).reshape(max_rows, LANES)

    planes = [plane(o[:, k], 0.0) for k in range(3)]
    planes += [plane(d[:, k], 1.0) for k in range(3)]
    planes.append(plane(t_max, -1.0))
    if extra is not None:
        planes.append(plane(extra.astype(jnp.float32), -2.0))
    else:
        planes.append(jnp.zeros((max_rows, LANES), jnp.float32))
    return jnp.stack(planes, axis=1).reshape(max_rows * 8, LANES)


def _stream_closest_kernel(rt_ref, tri_ref, rp_ref, out_ref, *, leaf_size):
    ox = rp_ref[0:1, :]
    oy = rp_ref[1:2, :]
    oz = rp_ref[2:3, :]
    dx = rp_ref[3:4, :]
    dy = rp_ref[4:5, :]
    dz = rp_ref[5:6, :]
    tm = rp_ref[6:7, :]

    # Row result defaults (also covers fully-dead rows).
    out_ref[0:1, :] = tm
    out_ref[1:2, :] = jnp.full(tm.shape, -1.0, jnp.float32)
    out_ref[2:3, :] = jnp.zeros(tm.shape, jnp.float32)
    out_ref[3:4, :] = jnp.zeros(tm.shape, jnp.float32)
    out_ref[4:8, :] = jnp.zeros((4, LANES), jnp.float32)

    @pl.when(jnp.any(tm > 0.0))
    def _():
        def step(g, carry):
            t_best, prim_b, b0_b, b1_b = carry
            blk = tri_ref[pl.ds(g * 8, 8), :]  # (8, 128): 8 triangles
            cols = [blk[:, c : c + 1] for c in range(9)]  # (8,1) each
            hit, t, b0, b1 = _watertight(ox, oy, oz, dx, dy, dz, t_best, cols)
            pid = blk[:, 10:11]
            closer = hit & (t < t_best) & (pid >= 0.0)
            t_m = jnp.where(closer, t, F32_MAX)
            t_min = jnp.min(t_m, axis=0, keepdims=True)
            improved = t_min < t_best
            pid_b = jnp.broadcast_to(pid, t_m.shape)
            win = closer & (t_m == t_min)
            pid_w = jnp.min(jnp.where(win, pid_b, BIG), axis=0, keepdims=True)
            sel = win & (pid_b == pid_w)
            b0_w = jnp.max(jnp.where(sel, b0, -BIG), axis=0, keepdims=True)
            b1_w = jnp.max(jnp.where(sel, b1, -BIG), axis=0, keepdims=True)
            return (
                jnp.where(improved, t_min, t_best),
                jnp.where(improved, pid_w, prim_b),
                jnp.where(improved, b0_w, b0_b),
                jnp.where(improved, b1_w, b1_b),
            )

        init = (
            jnp.maximum(tm, 0.0),
            jnp.full(tm.shape, -1.0, jnp.float32),
            jnp.zeros(tm.shape, jnp.float32),
            jnp.zeros(tm.shape, jnp.float32),
        )
        t_best, prim_b, b0_b, b1_b = jax.lax.fori_loop(
            0, leaf_size // 8, step, init
        )
        out_ref[0:1, :] = t_best
        out_ref[1:2, :] = prim_b
        out_ref[2:3, :] = b0_b
        out_ref[3:4, :] = b1_b


def _stream_any_kernel(rt_ref, tri_ref, rp_ref, occ_ref, *, leaf_size):
    ox = rp_ref[0:1, :]
    oy = rp_ref[1:2, :]
    oz = rp_ref[2:3, :]
    dx = rp_ref[3:4, :]
    dy = rp_ref[4:5, :]
    dz = rp_ref[5:6, :]
    tm = rp_ref[6:7, :]
    skip = rp_ref[7:8, :]

    occ_ref[0:8, :] = jnp.zeros((8, LANES), jnp.int32)

    @pl.when(jnp.any(tm > 0.0))
    def _():
        def step(g, occ):
            blk = tri_ref[pl.ds(g * 8, 8), :]
            cols = [blk[:, c : c + 1] for c in range(9)]
            hit, _, _, _ = _watertight(ox, oy, oz, dx, dy, dz, tm, cols)
            light = blk[:, 9:10]
            pid = blk[:, 10:11]
            blocked = hit & (light != skip) & (pid >= 0.0)
            return occ | jnp.max(
                blocked.astype(jnp.int32), axis=0, keepdims=True
            )

        occ = jax.lax.fori_loop(
            0, leaf_size // 8, step, jnp.zeros(tm.shape, jnp.int32)
        )
        occ_ref[0:1, :] = occ


def _caps(n: int, n_treelets: int):
    """Static capacities: measured real-wave incidence on the colonnade is
    ~3.5 treelets/ray mean, p95 9, max 70 (bounce, t unbounded) and ~5.8
    for primaries; supers crossed per ray is strictly smaller.  Slot
    capacity adds the worst-case per-treelet 128-alignment padding.
    Note cap1 drives the level-2 matrix footprint ([cap1, ts_pad] f32
    temporaries), so waves above ~1M rays should be split by the caller."""
    cap1 = max(1 << 14, 4 * n)
    cap2 = max(1 << 16, 12 * n)
    max_slots = cap2 + n_treelets * LANES
    max_slots = -(-max_slots // (8 * LANES)) * (8 * LANES)
    return cap1, cap2, max_slots


@functools.partial(jax.jit, static_argnames=("interpret",))
def stream_closest(tl, o, d, t_max, interpret: bool = False):
    """Closest hit over the incidence stream.  Returns (t, prim, b0, b1,
    ok); results are garbage when ok is False (caller must fall back)."""
    n = o.shape[0]
    cap1, cap2, max_slots = _caps(n, tl.n_treelets)
    max_rows = max_slots // LANES
    slot_ray, row_treelet, ok = build_stream(
        tl, o, d, t_max, cap1, cap2, max_slots
    )
    packed = _pack_stream(o, d, t_max, slot_ray, max_rows)
    k = tl.leaf_size

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(max_rows,),
        in_specs=[
            pl.BlockSpec((k, 128), lambda p, rt: (rt[p], 0)),
            pl.BlockSpec((8, LANES), lambda p, rt: (p, 0)),
        ],
        out_specs=[pl.BlockSpec((8, LANES), lambda p, rt: (p, 0))],
    )
    (out,) = pl.pallas_call(
        functools.partial(_stream_closest_kernel, leaf_size=k),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((max_rows * 8, LANES), jnp.float32)
        ],
        interpret=interpret,
    )(row_treelet, tl.tris_padded, packed)

    out = out.reshape(max_rows, 8, LANES)
    slot_t = out[:, 0, :].reshape(-1)
    slot_prim = out[:, 1, :].reshape(-1)
    slot_b0 = out[:, 2, :].reshape(-1)
    slot_b1 = out[:, 3, :].reshape(-1)

    # Per-ray min-t merge; ties (equal t from different treelets) break on
    # lowest prim id so results don't depend on stream order.
    valid = (slot_ray >= 0) & (slot_prim >= 0.0)
    bucket = jnp.where(valid, slot_ray, n)
    t_best = jnp.full(n + 1, F32_MAX).at[bucket].min(
        jnp.where(valid, slot_t, F32_MAX)
    )
    is_w = valid & (slot_t <= t_best[bucket])
    wbucket = jnp.where(is_w, bucket, n)
    prim_w = jnp.full(n + 1, BIG).at[wbucket].min(
        jnp.where(is_w, slot_prim, BIG)
    )
    is_w2 = is_w & (slot_prim == prim_w[bucket])
    w2bucket = jnp.where(is_w2, bucket, n)
    b0_w = jnp.zeros(n + 1).at[w2bucket].max(jnp.where(is_w2, slot_b0, 0.0))
    b1_w = jnp.zeros(n + 1).at[w2bucket].max(jnp.where(is_w2, slot_b1, 0.0))

    hit = t_best[:n] < F32_MAX
    t = jnp.where(hit, t_best[:n], t_max)
    prim = jnp.where(hit, prim_w[:n], -1.0).astype(jnp.int32)
    return t, prim, b0_w[:n], b1_w[:n], ok


@functools.partial(jax.jit, static_argnames=("interpret",))
def stream_any(tl, o, d, t_max, skip_light, interpret: bool = False):
    """Occlusion over the incidence stream.  Returns (occluded, ok)."""
    n = o.shape[0]
    cap1, cap2, max_slots = _caps(n, tl.n_treelets)
    max_rows = max_slots // LANES
    slot_ray, row_treelet, ok = build_stream(
        tl, o, d, t_max, cap1, cap2, max_slots
    )
    packed = _pack_stream(o, d, t_max, slot_ray, max_rows, extra=skip_light)
    k = tl.leaf_size

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(max_rows,),
        in_specs=[
            pl.BlockSpec((k, 128), lambda p, rt: (rt[p], 0)),
            pl.BlockSpec((8, LANES), lambda p, rt: (p, 0)),
        ],
        out_specs=[pl.BlockSpec((8, LANES), lambda p, rt: (p, 0))],
    )
    (occ,) = pl.pallas_call(
        functools.partial(_stream_any_kernel, leaf_size=k),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((max_rows * 8, LANES), jnp.int32)],
        interpret=interpret,
    )(row_treelet, tl.tris_padded, packed)

    occ_slots = occ.reshape(max_rows, 8, LANES)[:, 0, :].reshape(-1)
    bucket = jnp.where(slot_ray >= 0, slot_ray, n)
    occ_ray = jnp.zeros(n + 1, jnp.int32).at[bucket].max(occ_slots)
    return occ_ray[:n] > 0, ok
