"""Fused bundle-walker traversal — the round-5 slot-pipeline successor.

The round-4 roofline verdict (ARCHITECTURE.md) proved the per-ray slot
stream structurally short of its targets: every (ray, chunk) slot pays
XLA-side data movement — sort key, pack-table row gather, merge lane —
and those latency/bandwidth terms (~25 ms pack + ~19.5 ms merge of an
85 ms colonnade closest call) do not shrink with scheduling; they only
disappear by deleting the slot materialization.  This engine deletes it:

  - Work unit = (8-ray bundle, chunk) pair, BUNDLE-major (the natural
    order of the per-bundle candidate lists — no chunk-major sort, no
    slot layout, no pack gathers, no merge scatters).
  - Per-bundle candidate lists = OR of the 8 rays' exact crossing words
    (trace_stream.cross_words), C lowest-set-bit extractions — measured
    union 9.3 chunks/bundle sorted, 14.3 natural on colonnade bounce
    waves at K=128 (benchmarks/r5_unionstats.py) vs 3.45 per-ray exact:
    ~3x test amplification in exchange for zero slot data movement.
  - One Pallas kernel walks the pair list: grid = pair quads; the
    chunk's triangle block arrives PLANE-MAJOR (16 field rows x 128
    triangle lanes, 8 KB) by scalar-prefetch index_map DMA; the
    bundle's 8 rays sit on SUBLANES so ONE (8,128) VPU op tests
    8 rays x 128 triangles; the scaled closest carry (ts, det, prim —
    one lane per triangle slot) lives in the bundle's revisited VMEM
    out block across its whole list, exactly like the rows engine
    carries per-row state (trace_rows.py).
  - The 128-lane carry folds to per-ray winners ONCE at the end, in
    dense XLA (cross-multiplied scaled compares, lowest-prim ties —
    the same total order every other engine resolves with).

Correctness under the OR-superset: any triangle a ray can hit within
[0, t_max] lies in a chunk the ray's own exact slab test crosses, so
bundle-extra chunks add no accepted hits — results are independent of
bundle composition (same argument as trace_bundles.py; exercised by
tests/test_walker.py against the dense sweep oracle).

Reference parity: replaces the per-ray front-to-back BVH walk of
yuki/src/bvh.rs:160-302 for divergent waves; the sampled-area-light
skip (bvh.rs:287-293) rides a per-ray lane like every other engine.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .trace import (
    F32_MAX,
    LANES,
    _ray_shear,
    _watertight_scaled,
)
from .trace_stream import BIG, cross_words, extract_lists

BUN = 8  # rays per bundle = one sublane group
QUAD = 4  # pairs per grid step (amortizes per-step scalar overhead and
# hides the next step's four 8 KB chunk DMAs behind compute)
C_WALK = 64  # candidates per bundle (colonnade bounce p95 = 27 sorted /
# 32 natural at width 8, max 109; atrium growth bounded by the same
# overflow->wide machinery as every other engine)
N_TF = 16  # plane-major triangle field rows per chunk (9 corners +
# area-light + prim id + 5 pad)
SEG_B = 2048  # bundles per pallas_call segment: the prefetched pair
# scalars live in SMEM (~1 MB), so a whole 262k-ray wave's per-pair
# tables (pair_chunk cap*4 B + quad_b cap B at cap ~ mult*n_b) blow the
# budget 3-6x (measured on-chip: 'prefetched SMEM operand 0' 1.5 MB vs
# 1 MB at mult_wide=48).  2048 bundles (16k rays) caps the wide tier at
# ~480 KB; segments run as one lax.map'd pallas_call (sequential, one
# compile) with per-segment tight/wide tier choice.


def walker_tri_planes(ch):
    """Chunk triangle table, plane-major: [T * N_TF, 128] f32 where
    chunk c's block row f holds field f of its 128 triangle slots
    (fields 0-8 = p0/p1/p2 xyz, 9 = area-light id, 10 = prim id).
    Built from the row-major tris_padded [T*K, 128] (cols 0-10) by one
    dense transpose — jit-traced per render, so XLA computes it once
    per call chain (~24 MB moved on the colonnade, ~0.05 ms at HBM
    rate)."""
    k = ch.leaf_size
    t = ch.n_treelets
    rows = ch.tris_padded.reshape(t, k, 128)[:, :, :N_TF]
    planes = rows.transpose(0, 2, 1)  # [T, N_TF, k]
    if k < LANES:
        # Lane-pad to the DMA width with dead slots: prim id -1 (masked
        # by the kernels), light id -3 (never matches a skip value),
        # degenerate zero corners.
        pad = jnp.zeros((t, N_TF, LANES - k), planes.dtype)
        pad = pad.at[:, 10, :].set(-1.0)
        pad = pad.at[:, 9, :].set(-3.0)
        planes = jnp.concatenate([planes, pad], axis=2)
    return planes.reshape(t * N_TF, LANES)


def _bundle_ray_table(o, d, t_max, skip, n_b: int):
    """Per-bundle ray blocks [n_b, 8, 128]: bundle g's block has
    ray r on sublane r, fields on lanes 0-7 (ox oy oz dx dy dz tm
    skip).  The caller appends a per-segment dead sentinel block
    (tm = 0) for padded pairs."""
    planes = [
        o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2], t_max,
        jnp.zeros_like(t_max) if skip is None else skip.astype(jnp.float32),
    ]
    tab = jnp.stack(planes, axis=1)  # [n, 8] fields on axis 1
    tab = tab.reshape(n_b, BUN, 8)
    return jnp.concatenate(
        [tab, jnp.zeros((n_b, BUN, LANES - 8), tab.dtype)], axis=2
    )


def _seg_b(n_b: int) -> int:
    """Segment size: SEG_B for production waves, the whole wave when it
    is already under budget (small/compacted waves pay zero padding)."""
    return min(SEG_B, max(n_b, 1))


def _segments(lists, rtab, t_max, n_b: int, seg_b: int):
    """Pad the wave to a seg_b multiple and split: returns (nseg,
    lists3 [nseg, seg_b, C], rtab3 [nseg, (seg_b+1)*8, 128] with a dead
    sentinel block per segment, tmax3 [nseg, seg_b*8]).  Padded bundles
    are dead (tm=0, empty lists -> QUAD pad pairs of chunk -1)."""
    nseg = max(1, -(-n_b // seg_b))
    nbp = nseg * seg_b
    if nbp != n_b:
        lists = jnp.concatenate(
            [lists,
             jnp.full((nbp - n_b, lists.shape[1]), -1, lists.dtype)]
        )
        rtab = jnp.concatenate(
            [rtab, jnp.zeros((nbp - n_b, BUN, LANES), rtab.dtype)]
        )
        t_max = jnp.concatenate(
            [t_max, jnp.zeros((nbp - n_b) * BUN, t_max.dtype)]
        )
    lists3 = lists.reshape(nseg, seg_b, lists.shape[1])
    rt = rtab.reshape(nseg, seg_b, BUN, LANES)
    dead = jnp.zeros((nseg, 1, BUN, LANES), rtab.dtype)
    rtab3 = jnp.concatenate([rt, dead], axis=1).reshape(
        nseg, (seg_b + 1) * BUN, LANES
    )
    return nseg, lists3, rtab3, t_max.reshape(nseg, seg_b * BUN)


def _bundle_pairs(lists, n_b: int, cap: int):
    """[n_b, C] candidate lists -> bundle-major (bundle, chunk) pair
    arrays, each bundle's run padded to a QUAD multiple so one grid
    step's pairs share a single ray/carry block (pad pairs chunk = -1;
    fully-padded trailing quads bundle = n_b).  Identical construction
    to trace_rows._row_pairs at bundle granularity."""
    c = lists.shape[1]
    mask = lists >= 0
    counts = mask.sum(axis=1)
    aligned = -(-jnp.maximum(counts, 1) // QUAD) * QUAD
    off = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(aligned)]
    ).astype(jnp.int32)
    n_pairs = off[-1]
    jpos = jnp.cumsum(mask.astype(jnp.int32), axis=1) - 1
    tgt = jnp.where(mask, off[:-1][:, None] + jpos, cap).reshape(-1)
    pair_chunk = jnp.full(cap, -1, jnp.int32).at[tgt].set(
        jnp.where(mask.reshape(-1), lists.reshape(-1), -1), mode="drop"
    )
    head = off[:-1] // QUAD
    quad_b = jnp.full(cap // QUAD, n_b, jnp.int32).at[head].set(
        jnp.arange(n_b, dtype=jnp.int32), mode="drop"
    )
    quad_b = jnp.where(
        jnp.arange(cap // QUAD) * QUAD < n_pairs,
        jax.lax.associative_scan(
            jnp.maximum, jnp.where(quad_b < n_b, quad_b, -1)
        ),
        n_b,
    )
    quad_b = jnp.where(quad_b < 0, n_b, quad_b)
    return pair_chunk, quad_b, n_pairs


def _bounds_recheck(cb_ref, tt, ox, oy, oz, dx, dy, dz, t_bound):
    """(8,1) slab test of chunk tt's AABB against each bundle ray's
    current t bound (plain t units)."""
    ix = jnp.where(dx >= 0.0, 1.0, -1.0) / jnp.maximum(jnp.abs(dx), 1e-30)
    iy = jnp.where(dy >= 0.0, 1.0, -1.0) / jnp.maximum(jnp.abs(dy), 1e-30)
    iz = jnp.where(dz >= 0.0, 1.0, -1.0) / jnp.maximum(jnp.abs(dz), 1e-30)
    t0x = (cb_ref[tt, 0] - ox) * ix
    t1x = (cb_ref[tt, 3] - ox) * ix
    t0y = (cb_ref[tt, 1] - oy) * iy
    t1y = (cb_ref[tt, 4] - oy) * iy
    t0z = (cb_ref[tt, 2] - oz) * iz
    t1z = (cb_ref[tt, 5] - oz) * iz
    tn = jnp.maximum(
        jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
        jnp.minimum(t0z, t1z),
    )
    tf = jnp.minimum(
        jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
        jnp.maximum(t0z, t1z),
    )
    return (jnp.maximum(tn, 0.0) <= jnp.minimum(tf, t_bound))


def _walker_closest_kernel(qb_ref, pc_ref, cb_ref, t0_ref, t1_ref,
                           t2_ref, t3_ref, rp_ref, out_ref, *,
                           with_skip=False):
    """One grid step = QUAD (bundle, chunk) pairs of ONE bundle.
    rp block (8,128): sublane r = ray r, lanes 0-7 = fields.
    out block (24,128): rows 0-7 scaled ts, 8-15 det, 16-23 prim —
    lane j carries the best over triangle SLOT j of every walked
    chunk; the caller lane-folds once in XLA."""
    p = pl.program_id(0)
    b = qb_ref[p]
    is_first = jnp.logical_or(p == 0, qb_ref[jnp.maximum(p - 1, 0)] != b)

    ox = rp_ref[:, 0:1]
    oy = rp_ref[:, 1:2]
    oz = rp_ref[:, 2:3]
    dx = rp_ref[:, 3:4]
    dy = rp_ref[:, 4:5]
    dz = rp_ref[:, 5:6]
    tm = rp_ref[:, 6:7]
    sk = rp_ref[:, 7:8] if with_skip else None

    @pl.when(is_first)
    def _():
        out_ref[0:8, :] = jnp.broadcast_to(tm, (8, LANES))
        out_ref[8:16, :] = jnp.ones((8, LANES), jnp.float32)
        out_ref[16:24, :] = jnp.full((8, LANES), -1.0, jnp.float32)

    pre = _ray_shear(dx, dy, dz)
    tris = (t0_ref, t1_ref, t2_ref, t3_ref)
    for i in range(QUAD):
        tt = pc_ref[QUAD * p + i]
        ts_b = out_ref[0:8, :]
        det_b = out_ref[8:16, :]
        # Current per-ray upper bound for the prune: the lane-fold has
        # not happened yet, so bound by the MIN over lanes (a real t
        # needs one divide per ray per pair; min(ts/det) <= min over
        # lanes of ts/det — use the cheap per-lane divide's row-min).
        t_cur = jnp.min(ts_b / det_b, axis=1, keepdims=True)
        live = (tm > 0.0) & _bounds_recheck(
            cb_ref, jnp.maximum(tt, 0), ox, oy, oz, dx, dy, dz, t_cur
        )
        go = (tt >= 0) & jnp.any(live)

        @pl.when(go)
        def _(i=i, ts_b=ts_b, det_b=det_b, live=live):
            blk = tris[i]
            cols = [blk[c : c + 1, :] for c in range(9)]
            ok, ts_c, det_c = _watertight_scaled(pre, ox, oy, oz, cols)
            pid = blk[10:11, :]
            prim_b = out_ref[16:24, :]
            closer = (
                ok
                & live
                & (pid >= 0.0)
                & (ts_c * det_b < ts_b * det_c)
            )
            if sk is not None:
                closer = closer & (blk[9:10, :] != sk)
            out_ref[0:8, :] = jnp.where(closer, ts_c, ts_b)
            out_ref[8:16, :] = jnp.where(closer, det_c, det_b)
            out_ref[16:24, :] = jnp.where(
                closer, jnp.broadcast_to(pid, (8, LANES)), prim_b
            )


def _walker_any_kernel(qb_ref, pc_ref, cb_ref, t0_ref, t1_ref, t2_ref,
                       t3_ref, rp_ref, occ_ref):
    """Occlusion variant: carry = (8,128) i32 occlusion bits (lane =
    triangle slot); a bundle whose every live ray is already occluded
    skips its remaining chunks (bvh.rs:235-302 early exit, bundle
    granular)."""
    p = pl.program_id(0)
    b = qb_ref[p]
    is_first = jnp.logical_or(p == 0, qb_ref[jnp.maximum(p - 1, 0)] != b)

    ox = rp_ref[:, 0:1]
    oy = rp_ref[:, 1:2]
    oz = rp_ref[:, 2:3]
    dx = rp_ref[:, 3:4]
    dy = rp_ref[:, 4:5]
    dz = rp_ref[:, 5:6]
    tm = rp_ref[:, 6:7]
    skip = rp_ref[:, 7:8]

    @pl.when(is_first)
    def _():
        occ_ref[0:8, :] = jnp.zeros((8, LANES), jnp.int32)

    pre = _ray_shear(dx, dy, dz)
    tris = (t0_ref, t1_ref, t2_ref, t3_ref)
    for i in range(QUAD):
        tt = pc_ref[QUAD * p + i]
        occ = occ_ref[0:8, :]
        ray_occ = jnp.max(occ, axis=1, keepdims=True)  # (8,1)
        live = (tm > 0.0) & (ray_occ == 0) & _bounds_recheck(
            cb_ref, jnp.maximum(tt, 0), ox, oy, oz, dx, dy, dz, tm
        )
        go = (tt >= 0) & jnp.any(live)

        @pl.when(go)
        def _(i=i, occ=occ, live=live):
            blk = tris[i]
            cols = [blk[c : c + 1, :] for c in range(9)]
            ok, ts_c, det_c = _watertight_scaled(pre, ox, oy, oz, cols)
            hit = ok & live & (ts_c <= tm * det_c)
            blocked = (
                hit & (blk[9:10, :] != skip) & (blk[10:11, :] >= 0.0)
            )
            occ_ref[0:8, :] = occ | blocked.astype(jnp.int32)


def _grid_call(kernel, ch, tp, quad_b, pair_chunk, rtab, n_b, cap,
               out_rows, out_dtype, interpret):
    def tri_spec(i):
        return pl.BlockSpec(
            (N_TF, 128),
            lambda p, qb, pc, i=i: (jnp.maximum(pc[QUAD * p + i], 0), 0),
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(cap // QUAD,),
        in_specs=[
            pl.BlockSpec(ch.treelet_bounds.shape, lambda p, qb, pc: (0, 0)),
        ]
        + [tri_spec(i) for i in range(QUAD)]
        + [
            pl.BlockSpec(
                (BUN, LANES),
                lambda p, qb, pc: (jnp.minimum(qb[p], n_b), 0),
            )
        ],
        out_specs=[
            pl.BlockSpec(
                (out_rows, LANES),
                lambda p, qb, pc: (jnp.minimum(qb[p], n_b), 0),
            )
        ],
    )
    (out,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(((n_b + 1) * out_rows, LANES), out_dtype)
        ],
        interpret=interpret,
    )(quad_b, pair_chunk, ch.treelet_bounds, *([tp] * QUAD), rtab)
    return out.reshape(n_b + 1, out_rows, LANES)[:n_b]


def _lane_fold_closest(out, t_max, n: int):
    """[n_b, 24, 128] scaled carries -> per-ray (t, prim): the winner
    over the 128 triangle-slot lanes by cross-multiplied scaled compare
    with lowest-prim ties (the same total order _scaled_min8 /
    _scaled_fold use), then ONE divide per ray."""
    n_b = out.shape[0]
    ts = out[:, 0:8, :].reshape(n, LANES)
    det = out[:, 8:16, :].reshape(n, LANES)
    prim = out[:, 16:24, :].reshape(n, LANES)
    miss = prim < 0.0
    ts = jnp.where(miss, F32_MAX, ts)
    det = jnp.where(miss, 1.0, det)
    prim = jnp.where(miss, BIG, prim)
    while ts.shape[1] > 1:
        h = ts.shape[1] // 2
        ts_a, ts_b = ts[:, :h], ts[:, h:]
        det_a, det_b = det[:, :h], det[:, h:]
        pr_a, pr_b = prim[:, :h], prim[:, h:]
        lhs = ts_b * det_a
        rhs = ts_a * det_b
        take_b = (lhs < rhs) | ((lhs == rhs) & (pr_b < pr_a))
        ts = jnp.where(take_b, ts_b, ts_a)
        det = jnp.where(take_b, det_b, det_a)
        prim = jnp.where(take_b, pr_b, pr_a)
    hit = prim[:, 0] < BIG
    t = jnp.where(hit, ts[:, 0] / det[:, 0], t_max)
    return t, jnp.where(hit, prim[:, 0], -1.0).astype(jnp.int32)


def _mult_cap(n_b: int, mult: int) -> int:
    return -(-(mult * n_b) // (2 * QUAD)) * 2 * QUAD


def walker_closest_w(ch, words, o, d, t_max, C: int = C_WALK,
                     mult: int = 16, mult_wide: int | None = None,
                     interpret: bool = False, skip=None):
    """Closest hit over the bundle-walker, from per-ray crossing words
    [N, W].  stream_closest_w contract: returns (t, prim, overflow[n],
    ok) — overflow marks rays of bundles whose list exceeded C; ok
    False means the pair budget blew and the caller must fall back.
    ``skip``: per-ray area-light id plane (combined closest+shadow
    waves) or None.  The wave runs as SEG_B-bundle segments (SMEM pair
    budget, see SEG_B) via one lax.map'd pallas_call, each segment
    picking its own tight/wide tier."""
    n = o.shape[0]
    n_b = n // BUN
    from .trace_bundles import bundle_words

    lists, ov_b = extract_lists(bundle_words(words, BUN), C)
    rtab = _bundle_ray_table(o, d, t_max, skip, n_b)
    tp = walker_tri_planes(ch)
    seg_b = _seg_b(n_b)
    nseg, lists3, rtab3, tmax3 = _segments(lists, rtab, t_max, n_b,
                                           seg_b)
    kern = functools.partial(
        _walker_closest_kernel, with_skip=skip is not None
    )
    cap_a = _mult_cap(seg_b, mult)
    cap_b = (
        _mult_cap(seg_b, mult_wide)
        if mult_wide is not None and mult_wide > mult else None
    )

    def seg(args):
        lst, rt, tm = args

        def tier(cap):
            def run(_):
                pair_chunk, quad_b, _ = _bundle_pairs(lst, seg_b, cap)
                out = _grid_call(
                    kern, ch, tp, quad_b, pair_chunk, rt, seg_b, cap,
                    24, jnp.float32, interpret,
                )
                return _lane_fold_closest(out, tm, seg_b * BUN)
            return run

        counts = (lst >= 0).sum(axis=1)
        demand = (-(-jnp.maximum(counts, 1) // QUAD) * QUAD).sum()
        ok_s = demand <= cap_a
        if cap_b is not None:
            t, prim = jax.lax.cond(ok_s, tier(cap_a), tier(cap_b),
                                   None)
            ok_s = demand <= cap_b
        else:
            t, prim = tier(cap_a)(None)
        return t, prim, ok_s

    t3, prim3, ok3 = jax.lax.map(seg, (lists3, rtab3, tmax3))
    t = t3.reshape(-1)[:n]
    prim = prim3.reshape(-1)[:n]
    overflow = jnp.repeat(ov_b, BUN)
    return t, prim, overflow, ok3.all()


def walker_any_w(ch, words, o, d, t_max, skip_light, C: int = C_WALK,
                 mult: int = 12, mult_wide: int | None = None,
                 interpret: bool = False):
    """Occlusion over the bundle-walker (stream_any_w contract):
    returns (occluded[n], overflow[n], ok).  Segmented like
    walker_closest_w."""
    n = o.shape[0]
    n_b = n // BUN
    from .trace_bundles import bundle_words

    lists, ov_b = extract_lists(bundle_words(words, BUN), C)
    rtab = _bundle_ray_table(o, d, t_max, skip_light, n_b)
    tp = walker_tri_planes(ch)
    seg_b = _seg_b(n_b)
    nseg, lists3, rtab3, _ = _segments(lists, rtab, t_max, n_b, seg_b)
    cap_a = _mult_cap(seg_b, mult)
    cap_b = (
        _mult_cap(seg_b, mult_wide)
        if mult_wide is not None and mult_wide > mult else None
    )

    def seg(args):
        lst, rt = args

        def tier(cap):
            def run(_):
                pair_chunk, quad_b, _ = _bundle_pairs(lst, seg_b, cap)
                out = _grid_call(
                    _walker_any_kernel, ch, tp, quad_b, pair_chunk, rt,
                    seg_b, cap, 8, jnp.int32, interpret,
                )
                return jnp.max(
                    out.reshape(seg_b * BUN, LANES), axis=1
                ) > 0
            return run

        counts = (lst >= 0).sum(axis=1)
        demand = (-(-jnp.maximum(counts, 1) // QUAD) * QUAD).sum()
        ok_s = demand <= cap_a
        if cap_b is not None:
            occ = jax.lax.cond(ok_s, tier(cap_a), tier(cap_b), None)
            ok_s = demand <= cap_b
        else:
            occ = tier(cap_a)(None)
        return occ, ok_s

    occ3, ok3 = jax.lax.map(seg, (lists3, rtab3))
    occ = occ3.reshape(-1)[:n]
    overflow = jnp.repeat(ov_b, BUN)
    return occ, overflow, ok3.all()
