"""Row-union chunk traversal — the coherent-wave engine.

For COHERENT waves (primary rays, shadow segments) the 128 rays of a
film-order row cross only ~8-9 distinct chunks in union
(benchmarks/row_union.py), so there is no need for the slot-stream's
gather/sort/merge machinery: walk each row through its own union
candidate list with rays in NATURAL order.

  - Per-row candidate chunk lists come from OR-ing the per-ray crossing
    bitmasks over the row, then lowest-set-bit extraction — all dense.
  - The kernel grid is (row, candidate-j): consecutive steps revisit the
    same ray/out block in VMEM, carrying running per-lane state (closest
    t or occlusion bits) across the row's candidates, so a per-step AABB
    recheck against the CURRENT t prunes far chunks — the early-exit the
    slot stream cannot do.
  - Rays reach the kernel by a dense plane-major transpose (no gather);
    results come back per-ray in place (no scatter).

Divergent bounce waves (row union ~99) stay on the slot stream
(trace_stream.py); this module is the cheap path for everything else.
Reference bar: per-ray front-to-back traversal (bvh.rs:160-302).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .trace import _watertight, F32_MAX, LANES
from .trace_stream import (BIG, cross_words, extract_lists)

C_ROW = 64  # union candidates per 128-ray row (coherent p95 ~26, max 47)


def row_words_of(words, rows: int):
    """Per-ray crossing words [N, W] -> per-row union words [rows, W]."""
    w = words.shape[1]
    return jax.lax.reduce(
        words.reshape(rows, LANES, w),
        jnp.uint32(0),
        jax.lax.bitwise_or,
        (1,),
    )


def row_candidate_lists(ch, o, d, t_max, C: int):
    """Per-ROW union crossed-chunk lists.

    Returns (lists [rows, C] i32 (-1 pad), row_overflow [rows] bool)."""
    words = cross_words(ch, o, d, t_max)
    return extract_lists(row_words_of(words, o.shape[0] // LANES), C)


def row_words_interval(ch, o, d, t_max, group: int = LANES):
    """Conservative per-row crossing words [rows, W] u32 by interval
    arithmetic over each 128-ray row's bundle (origin box, per-axis
    direction interval, max t) — O(rows x chunks), 128x less work than
    the exact per-ray cull whose OR-reduction the rows path previously
    consumed.  Supersets of the exact row union are safe everywhere they
    feed: the rows kernels re-test each candidate chunk's AABB per lane
    and walk masked, so extra candidates cost skipped steps, never wrong
    results (same conservativeness argument as trace_pairs
    block_candidate_pairs, here at 128-ray granularity).  Parked lanes
    (center origin, +z dir, t=0) only widen the intervals.

    ``group`` generalizes the bundle width: 128 for rows-dispatch rows,
    8 for the sublane-bundle engine's per-bundle cull (trace_bundles)."""
    n = o.shape[0]
    rows = n // group
    n_c = ch.n_treelets
    w = -(-n_c // 32)
    ch_pad = w * 32

    ob = o.reshape(rows, group, 3)
    db = d.reshape(rows, group, 3)
    o_lo = ob.min(axis=1)[:, None, :]  # [rows, 1, 3]
    o_hi = ob.max(axis=1)[:, None, :]
    d_lo = db.min(axis=1)[:, None, :]
    d_hi = db.max(axis=1)[:, None, :]
    t_hi = t_max.reshape(rows, group).max(axis=1)  # [rows]

    cb = ch.treelet_bounds
    pad = ch_pad - n_c
    # Pad chunks at lo = hi = +inf: enter/exit both +-inf same sign ->
    # never crossed (see _cross_words_xla).
    lo_t = jnp.concatenate([cb[:, 0:3], jnp.full((pad, 3), jnp.inf)], 0)
    hi_t = jnp.concatenate([cb[:, 3:6], jnp.full((pad, 3), jnp.inf)], 0)
    lo_t = lo_t[None, :, :]  # [1, ch_pad, 3]
    hi_t = hi_t[None, :, :]

    def axis_interval(lo_a, hi_a, olo, ohi, dlo, dhi):
        """Conservative [t_enter_lb, t_exit_ub] for one axis; direction
        intervals spanning zero give no constraint (trace_pairs:86-101)."""
        pos = dlo > 0.0
        neg = dhi < 0.0
        n_lo = lo_a - ohi
        t_en_pos = n_lo / jnp.where(n_lo >= 0.0, dhi, dlo)
        m_hi = hi_a - olo
        t_ex_pos = m_hi / jnp.where(m_hi >= 0.0, dlo, dhi)
        n_hi = hi_a - olo
        t_en_neg = n_hi / jnp.where(n_hi <= 0.0, dlo, dhi)
        m_lo = lo_a - ohi
        t_ex_neg = m_lo / jnp.where(m_lo <= 0.0, dhi, dlo)
        t_en = jnp.where(pos, t_en_pos, jnp.where(neg, t_en_neg, 0.0))
        t_ex = jnp.where(pos, t_ex_pos, jnp.where(neg, t_ex_neg, jnp.inf))
        return t_en, t_ex

    t_en = jnp.zeros((rows, 1))
    t_ex = jnp.broadcast_to(t_hi[:, None], (rows, ch_pad))
    for a in range(3):
        en, ex = axis_interval(
            lo_t[..., a], hi_t[..., a], o_lo[..., a], o_hi[..., a],
            d_lo[..., a], d_hi[..., a],
        )
        en = jnp.where(jnp.isnan(en), 0.0, en)
        ex = jnp.where(jnp.isnan(ex), jnp.inf, ex)
        t_en = jnp.maximum(t_en, en)
        t_ex = jnp.minimum(t_ex, ex)
    crossed = (jnp.maximum(t_en, 0.0) <= t_ex) & (t_hi > 0.0)[:, None]
    # A row whose direction intervals span zero on ALL axes is fully
    # unconstrained and would mark even the +inf PAD chunks crossed
    # (unlike the exact slab math, where pads never cross); mask pads so
    # extract_lists can never emit out-of-range chunk ids.
    crossed = crossed & (
        jax.lax.broadcasted_iota(jnp.int32, (1, ch_pad), 1) < n_c
    )

    bits = jax.lax.broadcasted_iota(jnp.uint32, (1, 1, 32), 2)
    return (
        (crossed.reshape(rows, w, 32).astype(jnp.uint32) << bits)
        .sum(axis=2)
        .astype(jnp.uint32)
    )


def _pack_planes(arrs, rows):
    """[N]-planes -> plane-major [(rows+1)*8, 128] (dense transpose, no
    gather) with a trailing DEAD row block (t = -1) that padded pairs
    target.  arrs: list of up to 8 [N] arrays; index 6 is t."""
    planes = [a.reshape(rows, LANES) for a in arrs]
    while len(planes) < 8:
        planes.append(jnp.zeros((rows, LANES), planes[0].dtype))
    packed = jnp.stack(planes, axis=1)
    dead = jnp.zeros((1, 8, LANES), packed.dtype).at[0, 6, :].set(-1.0)
    return jnp.concatenate([packed, dead], axis=0).reshape(
        (rows + 1) * 8, LANES)


QUAD = 4  # pairs per grid step (shared row): hides the four triangle
# block DMAs behind ~4 us of compute instead of stalling every step

SEG_R = 2048  # rows per pallas_call segment: the prefetched pair
# scalars (quad_row cap/4 B + pair_chunk cap*4 B at cap ~ mult*rows)
# live in ~1 MB SMEM; a 1M-ray wave (8192 rows) blows it ('prefetched
# SMEM operand 1' 1.5 MB on-chip, r5_wavesize 4096-tile attempt), which
# capped treelet waves at 262k rays.  2048 rows caps the tables at
# ~0.5 MB; segments run as one lax.map'd pallas_call (sequential, one
# compile) — same scheme as trace_walker.SEG_B.


def _row_segments(lists, planes, rows: int):
    """Pad the wave to a segment multiple and split for lax.map:
    returns (nseg, seg_r, lists3 [nseg, seg_r, C], planes3 list of
    [nseg, seg_r * LANES]).  Padded rows have empty lists (no pairs)
    and dead rays; their out blocks are never read."""
    seg_r = min(SEG_R, max(rows, 1))
    nseg = max(1, -(-rows // seg_r))
    rp = nseg * seg_r
    if rp != rows:
        pad_r = rp - rows
        lists = jnp.concatenate(
            [lists, jnp.full((pad_r, lists.shape[1]), -1, lists.dtype)]
        )
        planes = [
            jnp.concatenate([p, jnp.zeros(pad_r * LANES, p.dtype)])
            for p in planes
        ]
    lists3 = lists.reshape(nseg, seg_r, lists.shape[1])
    planes3 = [p.reshape(nseg, seg_r * LANES) for p in planes]
    return nseg, seg_r, lists3, planes3


def _row_pairs(lists, rows: int, C: int, cap: int):
    """[rows, C] candidate lists -> compacted row-major (row, chunk) pair
    arrays, each row's run padded to a QUAD multiple so one grid step's
    four pairs share a single ray/out row (pad pairs: chunk == -1; fully
    padded trailing quads: row == rows).  Compaction scatter input is
    rows*C — wave-row scale, cheap."""
    mask = lists >= 0
    counts = mask.sum(axis=1)
    aligned = -(-counts // QUAD) * QUAD
    off = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(aligned)]
    ).astype(jnp.int32)
    n_pairs = off[-1]
    jpos = jnp.cumsum(mask.astype(jnp.int32), axis=1) - 1
    tgt = jnp.where(mask, off[:-1][:, None] + jpos, cap).reshape(-1)
    rid = jax.lax.broadcasted_iota(jnp.int32, (rows, C), 0).reshape(-1)
    pair_row = jnp.full(cap, rows, jnp.int32).at[tgt].set(rid, mode="drop")
    pair_chunk = jnp.full(cap, -1, jnp.int32).at[tgt].set(
        jnp.where(mask.reshape(-1), lists.reshape(-1), -1), mode="drop")
    # In-row pad pairs need their OWNING row id (the quad's out block is
    # addressed by the quad-leading pair): scatter row ids at quad heads.
    head = off[:-1] // QUAD
    quad_row = jnp.full(cap // QUAD, rows, jnp.int32).at[head].set(
        jnp.arange(rows, dtype=jnp.int32), mode="drop")
    # forward-fill within each row's quads: rows with multiple quads have
    # heads only at the first — fill by max-accumulate (row ids ascend).
    quad_row = jnp.where(
        jnp.arange(cap // QUAD) * QUAD < n_pairs,
        jax.lax.associative_scan(jnp.maximum, jnp.where(
            quad_row < rows, quad_row, -1)),
        rows,
    )
    quad_row = jnp.where(quad_row < 0, rows, quad_row)
    return pair_row, pair_chunk, quad_row, n_pairs


def _recheck(cb_ref, tt, ox, oy, oz, dx, dy, dz, ts_cur, det_cur):
    """Per-lane slab test of chunk tt's AABB against the current SCALED
    best (ts, det) with t = ts/det, det > 0: the t-bound compare is
    cross-multiplied so the running carry never needs a divide."""
    ix, iy, iz = 1.0 / dx, 1.0 / dy, 1.0 / dz
    t0x = (cb_ref[tt, 0] - ox) * ix
    t1x = (cb_ref[tt, 3] - ox) * ix
    t0y = (cb_ref[tt, 1] - oy) * iy
    t1y = (cb_ref[tt, 4] - oy) * iy
    t0z = (cb_ref[tt, 2] - oz) * iz
    t1z = (cb_ref[tt, 5] - oz) * iz
    tmin = jnp.maximum(
        jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
        jnp.minimum(t0z, t1z),
    )
    tmax_box = jnp.minimum(
        jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
        jnp.maximum(t0z, t1z),
    )
    tmin = jnp.maximum(tmin, 0.0)
    return (tmin <= tmax_box) & (tmin * det_cur <= ts_cur)


def _rows_closest_kernel(qr_ref, pc_ref, cb_ref, t0_ref, t1_ref, t2_ref,
                         t3_ref, rp_ref, out_ref, *, leaf_size,
                         with_skip=False):
    # Out sublanes: 0 = scaled ts, 1 = prim, 2 = det (> 0); the caller
    # divides ts/det once per ray (see trace_stream.closest_walk).
    # with_skip: plane 7 carries a per-lane area-light id to ignore
    # (combined closest+shadow waves, trace_stream.closest_walk).
    from .trace_stream import closest_walk

    p = pl.program_id(0)
    row = qr_ref[p]
    is_first = jnp.logical_or(p == 0, qr_ref[jnp.maximum(p - 1, 0)] != row)
    ox = rp_ref[0:1, :]
    oy = rp_ref[1:2, :]
    oz = rp_ref[2:3, :]
    dx = rp_ref[3:4, :]
    dy = rp_ref[4:5, :]
    dz = rp_ref[5:6, :]
    tm = rp_ref[6:7, :]
    sk = rp_ref[7:8, :] if with_skip else None

    @pl.when(is_first)
    def _():
        out_ref[0:1, :] = tm
        out_ref[1:2, :] = jnp.full(tm.shape, -1.0, jnp.float32)
        out_ref[2:3, :] = jnp.ones(tm.shape, jnp.float32)
        out_ref[3:8, :] = jnp.zeros((5, LANES), jnp.float32)

    tris = (t0_ref, t1_ref, t2_ref, t3_ref)
    for i in range(QUAD):
        tt = pc_ref[QUAD * p + i]
        ts_cur = out_ref[0:1, :]
        det_cur = out_ref[2:3, :]
        alive = (
            (tt >= 0)
            & jnp.any(
                (tm > 0.0)
                & _recheck(cb_ref, jnp.maximum(tt, 0), ox, oy, oz, dx, dy,
                           dz, ts_cur, det_cur)
            )
        )

        @pl.when(alive)
        def _(i=i, ts_cur=ts_cur, det_cur=det_cur):
            ts_b, det_b, prim_b = closest_walk(
                tris[i], ox, oy, oz, dx, dy, dz, ts_cur, det_cur,
                out_ref[1:2, :], leaf_size=leaf_size, skip=sk,
            )
            out_ref[0:1, :] = ts_b
            out_ref[1:2, :] = prim_b
            out_ref[2:3, :] = det_b


def _rows_any_kernel(qr_ref, pc_ref, cb_ref, t0_ref, t1_ref, t2_ref,
                     t3_ref, rp_ref, occ_ref, *, leaf_size):
    from .trace_stream import any_walk

    p = pl.program_id(0)
    row = qr_ref[p]
    is_first = jnp.logical_or(p == 0, qr_ref[jnp.maximum(p - 1, 0)] != row)
    ox = rp_ref[0:1, :]
    oy = rp_ref[1:2, :]
    oz = rp_ref[2:3, :]
    dx = rp_ref[3:4, :]
    dy = rp_ref[4:5, :]
    dz = rp_ref[5:6, :]
    tm = rp_ref[6:7, :]
    skip = rp_ref[7:8, :]

    @pl.when(is_first)
    def _():
        occ_ref[0:8, :] = jnp.zeros((8, LANES), jnp.int32)

    tris = (t0_ref, t1_ref, t2_ref, t3_ref)
    for i in range(QUAD):
        tt = pc_ref[QUAD * p + i]
        occ = occ_ref[0:1, :]
        crossing = (tm > 0.0) & _recheck(
            cb_ref, jnp.maximum(tt, 0), ox, oy, oz, dx, dy, dz, tm,
            jnp.ones(tm.shape, jnp.float32),
        )
        go = (tt >= 0) & jnp.any(crossing & (occ == 0))

        @pl.when(go)
        def _(i=i, occ=occ, crossing=crossing):
            occ2 = any_walk(
                tris[i], ox, oy, oz, dx, dy, dz, tm, skip, occ, crossing,
                leaf_size=leaf_size,
            )
            occ_ref[0:1, :] = occ2


def _grid_call(kernel, ch, quad_row, pair_chunk, packed, rows, cap,
               out_dtype, interpret):
    k = ch.leaf_size

    def tri_spec(i):
        return pl.BlockSpec(
            (k, 128),
            lambda p, qr, pc, i=i: (jnp.maximum(pc[QUAD * p + i], 0), 0),
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(cap // QUAD,),
        in_specs=[
            pl.BlockSpec(ch.treelet_bounds.shape, lambda p, qr, pc: (0, 0)),
        ]
        + [tri_spec(i) for i in range(QUAD)]
        + [
            pl.BlockSpec(
                (8, LANES), lambda p, qr, pc: (jnp.minimum(qr[p], rows), 0)
            )
        ],
        out_specs=[
            pl.BlockSpec(
                (8, LANES), lambda p, qr, pc: (jnp.minimum(qr[p], rows), 0)
            )
        ],
    )
    (out,) = pl.pallas_call(
        functools.partial(kernel, leaf_size=k),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(((rows + 1) * 8, LANES), out_dtype)
        ],
        interpret=interpret,
    )(quad_row, pair_chunk, ch.treelet_bounds,
      *([ch.tris_padded] * QUAD), packed)
    return out.reshape(rows + 1, 8, LANES)[:rows]


def rows_closest_w(ch, row_words, o, d, t_max, C: int = C_ROW,
                   mult: int = 16, interpret: bool = False,
                   skip_light=None):
    """Closest hit via row-union walk from precomputed per-row union
    words.  Returns (t, prim, overflow per ray).  Callers re-run overflow
    rays elsewhere (their results may miss hits).  `mult`: average union
    pairs budgeted per row (primary mean 8.1, p95 26 on the colonnade).
    ``skip_light`` [N] (or None): per-ray area-light id to ignore, for
    combined closest+shadow waves (trace_stream.closest_walk)."""
    n = o.shape[0]
    rows = n // LANES
    lists, overflow = extract_lists(row_words, C)
    # Every row needs >= 1 pair so its out block's is_first defaults get
    # written (empty rows would otherwise return uninitialized memory).
    lists = lists.at[:, 0].set(jnp.maximum(lists[:, 0], 0))
    planes = [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2], t_max]
    if skip_light is not None:
        planes.append(skip_light.astype(jnp.float32))
    nseg, seg_r, lists3, planes3 = _row_segments(lists, planes, rows)
    cap = -(-(mult * seg_r) // (2 * QUAD)) * 2 * QUAD
    kern = (functools.partial(_rows_closest_kernel, with_skip=True)
            if skip_light is not None else _rows_closest_kernel)

    def seg(args):
        lst, pls = args[0], args[1:]
        _, pair_chunk, quad_row, n_pairs = _row_pairs(lst, seg_r, C, cap)
        packed = _pack_planes(list(pls), seg_r)
        out = _grid_call(
            kern, ch, quad_row, pair_chunk, packed, seg_r, cap,
            jnp.float32, interpret,
        )
        # ONE divide per ray resolves the scaled (ts, det) carry.
        t = (out[:, 0, :] / out[:, 2, :]).reshape(-1)
        prim = out[:, 1, :].reshape(-1)
        return t, prim, n_pairs > cap

    t3, prim3, ov3 = jax.lax.map(seg, (lists3, *planes3))
    t = t3.reshape(-1)[:n]
    prim = prim3.reshape(-1)[:n]
    hit = prim >= 0.0
    t = jnp.where(hit, t, t_max)
    ov = (
        jnp.broadcast_to(overflow[:, None], (rows, LANES)).reshape(-1)
        | jnp.repeat(ov3, seg_r * LANES)[:n]
    )
    return t, prim.astype(jnp.int32), ov


@functools.partial(
    jax.jit, static_argnames=("C", "mult", "interpret"))
def rows_closest(ch, o, d, t_max, C: int = C_ROW, mult: int = 16,
                 interpret: bool = False):
    """Standalone row-union closest hit (computes words internally)."""
    rw = row_words_of(cross_words(ch, o, d, t_max), o.shape[0] // LANES)
    return rows_closest_w(ch, rw, o, d, t_max, C=C, mult=mult,
                          interpret=interpret)


def rows_any_w(ch, row_words, o, d, t_max, skip_light, C: int = C_ROW,
               mult: int = 16, interpret: bool = False):
    """Occlusion via row-union walk from precomputed per-row union words.
    Returns (occluded, overflow per ray); overflow rays may falsely report
    unoccluded."""
    n = o.shape[0]
    rows = n // LANES
    lists, overflow = extract_lists(row_words, C)
    # Every row needs >= 1 pair so its out block's is_first defaults get
    # written (empty rows would otherwise return uninitialized memory).
    lists = lists.at[:, 0].set(jnp.maximum(lists[:, 0], 0))
    planes = [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
              t_max, skip_light.astype(jnp.float32)]
    nseg, seg_r, lists3, planes3 = _row_segments(lists, planes, rows)
    cap = -(-(mult * seg_r) // (2 * QUAD)) * 2 * QUAD

    def seg(args):
        lst, pls = args[0], args[1:]
        _, pair_chunk, quad_row, n_pairs = _row_pairs(lst, seg_r, C, cap)
        packed = _pack_planes(list(pls), seg_r)
        occ = _grid_call(
            _rows_any_kernel, ch, quad_row, pair_chunk, packed, seg_r,
            cap, jnp.int32, interpret,
        )
        return occ[:, 0, :].reshape(-1), n_pairs > cap

    occ3, ov3 = jax.lax.map(seg, (lists3, *planes3))
    ov = (
        jnp.broadcast_to(overflow[:, None], (rows, LANES)).reshape(-1)
        | jnp.repeat(ov3, seg_r * LANES)[:n]
    )
    return occ3.reshape(-1)[:n] > 0, ov


@functools.partial(
    jax.jit, static_argnames=("C", "mult", "interpret"))
def rows_any(ch, o, d, t_max, skip_light, C: int = C_ROW, mult: int = 16,
             interpret: bool = False):
    """Standalone row-union occlusion (computes words internally)."""
    rw = row_words_of(cross_words(ch, o, d, t_max), o.shape[0] // LANES)
    return rows_any_w(ch, rw, o, d, t_max, skip_light, C=C, mult=mult,
                      interpret=interpret)
