"""Pair-list treelet traversal: the block-sparse formulation.

The in-kernel treelet cull (trace_treelets.py) spends most of its time on
scalar bound loads for treelets nobody hits.  Here the cull moves OUT of
the kernel into dense XLA:

  1. `block_candidate_pairs` computes a conservative interval slab test of
     each ray *block bundle* (origin box x direction box) against every
     treelet AABB — one fully-vectorized [B,T] op on the VPU — and
     compacts the survivors into a flat (block, treelet) pair list sorted
     block-major (jnp.nonzero order).
  2. The Pallas kernel runs one grid step per pair.  A
     PrefetchScalarGridSpec prefetches the pair arrays so the BlockSpec
     index maps pick each step's ray block and treelet triangle rows —
     Mosaic's pipeline then streams the right HBM blocks into VMEM with
     automatic double buffering (no hand-written DMA at all).  Because
     pairs are block-major, each ray block's output stays resident in
     VMEM across its pairs, carrying the running closest-hit state; a
     cheap per-pair vector recheck of the treelet AABB against the
     *current* t skips far geometry as hits accumulate front-to-back.

This is the same shape as a block-sparse matmul over a prefetched index
list — the TPU-idiomatic answer to "visit only the boxes you might hit".
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .trace import _watertight, F32_MAX, LANES

BLOCK_ROWS = 8  # rays per block = BLOCK_ROWS * 128


def _bundle_bounds(x):
    """[B, R] -> per-block (min, max) [B]."""
    return x.min(axis=1), x.max(axis=1)


def block_candidate_pairs(tl, o, d, t_max, max_pairs: int):
    """Conservative block-vs-treelet cull -> (pair_block, pair_treelet,
    n_pairs, n_blocks).  Padded entries point at block id B (a dummy
    row) / treelet 0."""
    n = o.shape[0]
    rows = max((n + LANES - 1) // LANES, 1)
    rows = ((rows + BLOCK_ROWS - 1) // BLOCK_ROWS) * BLOCK_ROWS
    n_blocks = rows // BLOCK_ROWS
    pad = rows * LANES - n
    per = BLOCK_ROWS * LANES

    def blocks_of(x, cv=0.0):
        return jnp.pad(x, (0, pad), constant_values=cv).reshape(n_blocks, per)

    o_lo = jnp.stack([blocks_of(o[:, k]).min(axis=1) for k in range(3)], axis=1)
    o_hi = jnp.stack([blocks_of(o[:, k]).max(axis=1) for k in range(3)], axis=1)
    # Pad directions with an existing direction so bundles don't widen.
    d_lo = jnp.stack(
        [blocks_of(d[:, k], cv=1.0).min(axis=1) for k in range(3)], axis=1
    )
    d_hi = jnp.stack(
        [blocks_of(d[:, k], cv=1.0).max(axis=1) for k in range(3)], axis=1
    )
    # Padding lanes carry d=1 per axis which can only WIDEN the direction
    # intervals — conservative, never incorrect.
    t_hi = blocks_of(t_max).max(axis=1)  # [B]

    lo = tl.treelet_bounds[None, :, 0:3]  # [1,T,3]
    hi = tl.treelet_bounds[None, :, 3:6]
    o_lo_, o_hi_ = o_lo[:, None, :], o_hi[:, None, :]
    d_lo_, d_hi_ = d_lo[:, None, :], d_hi[:, None, :]

    def axis_interval(lo_a, hi_a, olo, ohi, dlo, dhi):
        """Conservative [t_enter_lb, t_exit_ub] for one axis; directions
        whose sign interval spans zero give no constraint."""
        pos = dlo > 0.0
        neg = dhi < 0.0
        # positive d: enter at lo slab, exit at hi slab
        n_lo = lo_a - ohi  # min numerator for entry
        t_en_pos = n_lo / jnp.where(n_lo >= 0.0, dhi, dlo)
        m_hi = hi_a - olo
        t_ex_pos = m_hi / jnp.where(m_hi >= 0.0, dlo, dhi)
        # negative d: mirror
        n_hi = hi_a - olo
        t_en_neg = n_hi / jnp.where(n_hi <= 0.0, dlo, dhi)
        m_lo = lo_a - ohi
        t_ex_neg = m_lo / jnp.where(m_lo <= 0.0, dhi, dlo)
        t_en = jnp.where(pos, t_en_pos, jnp.where(neg, t_en_neg, 0.0))
        t_ex = jnp.where(pos, t_ex_pos, jnp.where(neg, t_ex_neg, jnp.inf))
        return t_en, t_ex

    enters = []
    exits = []
    for a in range(3):
        en, ex = axis_interval(
            lo[..., a], hi[..., a],
            o_lo_[..., a], o_hi_[..., a],
            d_lo_[..., a], d_hi_[..., a],
        )
        enters.append(en)
        exits.append(ex)
    t_enter = jnp.maximum(jnp.maximum(enters[0], enters[1]), enters[2])
    t_exit = jnp.minimum(jnp.minimum(exits[0], exits[1]), exits[2])
    hit = jnp.maximum(t_enter, 0.0) <= jnp.minimum(t_exit, t_hi[:, None])
    # Every block must appear at least once so its closest-hit output gets
    # initialized by the kernel's is_first path.
    hit = hit.at[:, 0].set(True)

    n_t = tl.n_treelets
    flat = hit.reshape(-1)
    # Compaction via cumsum + scatter: jnp.nonzero lowers to something
    # pathological on TPU (measured 108 ms for this matrix; this is 0.1 ms).
    pos = jnp.cumsum(flat.astype(jnp.int32))
    n_pairs = pos[-1]
    tgt = jnp.where(flat, pos - 1, max_pairs)
    src = jax.lax.broadcasted_iota(jnp.int32, (flat.shape[0], 1), 0)[:, 0]
    idx = jnp.full(max_pairs, n_blocks * n_t, jnp.int32).at[tgt].set(
        src, mode="drop"
    )
    pair_block = (idx // n_t).astype(jnp.int32)
    pair_treelet = (idx % n_t).astype(jnp.int32)
    return pair_block, pair_treelet, n_pairs, n_blocks


def _pairs_kernel(
    pb_ref, pt_ref,  # scalar-prefetch: pair block / treelet ids [P]
    tb_ref,  # treelet bounds [T, 8] (VMEM, whole table)
    tri_ref,  # this pair's treelet triangle rows (K, 128)
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
    t_out, prim_out, b0_out, b1_out,
    *, leaf_size: int,
):
    p = pl.program_id(0)
    blk = pb_ref[p]
    # First step for this output block: initialize the closest-hit state.
    is_first = jnp.logical_or(
        p == 0, pb_ref[jnp.maximum(p - 1, 0)] != blk
    )

    @pl.when(is_first)
    def _():
        t_out[:] = tmax_ref[:]
        prim_out[:] = jnp.full(t_out.shape, -1, jnp.int32)
        b0_out[:] = jnp.zeros(t_out.shape, jnp.float32)
        b1_out[:] = jnp.zeros(t_out.shape, jnp.float32)

    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]

    # Per-lane recheck against the *current* t (front-to-back DFS order
    # shrinks t early): skip the triangle loop when no lane can improve.
    tt = pt_ref[p]
    ix, iy, iz = 1.0 / dx, 1.0 / dy, 1.0 / dz
    t_cur0 = t_out[:]
    t0x = (tb_ref[tt, 0] - ox) * ix
    t1x = (tb_ref[tt, 3] - ox) * ix
    t0y = (tb_ref[tt, 1] - oy) * iy
    t1y = (tb_ref[tt, 4] - oy) * iy
    t0z = (tb_ref[tt, 2] - oz) * iz
    t1z = (tb_ref[tt, 5] - oz) * iz
    tmin = jnp.maximum(
        jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
        jnp.minimum(t0z, t1z),
    )
    tmax_box = jnp.minimum(
        jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
        jnp.maximum(t0z, t1z),
    )
    alive = jnp.maximum(tmin, 0.0) <= jnp.minimum(tmax_box, t_cur0)

    @pl.when(jnp.any(alive))
    def _():
        def tri_body(k, _):
            cols = [tri_ref[k, c] for c in range(9)]
            t_cur = t_out[:]
            hit, ti, bi0, bi1 = _watertight(
                ox, oy, oz, dx, dy, dz, t_cur, cols
            )
            pid = tri_ref[k, 10].astype(jnp.int32)
            closer = hit & (ti < t_cur) & (pid >= 0)
            t_out[:] = jnp.where(closer, ti, t_cur)
            prim_out[:] = jnp.where(closer, pid, prim_out[:])
            b0_out[:] = jnp.where(closer, bi0, b0_out[:])
            b1_out[:] = jnp.where(closer, bi1, b1_out[:])
            return 0

        jax.lax.fori_loop(0, leaf_size, tri_body, 0)


CHUNK = 8192  # pairs per launch: grid bookkeeping costs ~0.8us/step, so
# small chunks + lax.cond-skipped dead chunks beat one SMEM-sized launch
MAX_CHUNKS = 48  # total pair capacity per traversal = 393216


@functools.partial(jax.jit, static_argnames=("max_pairs", "interpret"))
def pairs_closest(tl, o, d, t_max, max_pairs: int = CHUNK * MAX_CHUNKS,
                  interpret: bool = False):
    """Closest hit via the pair-list walk.

    The pair list is processed in CHUNK-sized kernel launches (the
    scalar-prefetch arrays live in 1 MB SMEM) whose per-launch results
    merge by min-t in XLA; launches whose chunk lies beyond n_pairs are
    skipped with lax.cond.  Returns (t, prim, b0, b1, n_pairs) — caller
    falls back to treelet_closest when n_pairs exceeds max_pairs."""
    n = o.shape[0]
    pair_block, pair_treelet, n_pairs, n_blocks = block_candidate_pairs(
        tl, o, d, t_max, max_pairs
    )
    rows = n_blocks * BLOCK_ROWS
    pad = rows * LANES - n

    def plane(x, cv=0.0):
        return jnp.pad(x, (0, pad), constant_values=cv).reshape(rows, LANES)

    planes = [plane(o[:, k]) for k in range(3)]
    planes += [plane(d[:, k], cv=1.0) for k in range(3)]
    planes.append(plane(t_max))

    k = tl.leaf_size
    # One dummy block row is appended for padded pairs (block id == B).
    out_rows = rows + BLOCK_ROWS

    ray_spec = pl.BlockSpec(
        (BLOCK_ROWS, LANES),
        lambda p, pb, pt: (jnp.minimum(pb[p], out_rows // BLOCK_ROWS - 1), 0),
    )
    tri_spec = pl.BlockSpec((k, 128), lambda p, pb, pt: (pt[p], 0))
    tb_spec = pl.BlockSpec(tl.treelet_bounds.shape, lambda p, pb, pt: (0, 0))
    chunk = min(CHUNK, max_pairs)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(chunk,),
        in_specs=[tb_spec, tri_spec] + [ray_spec] * 7,
        out_specs=[ray_spec] * 4,
    )
    out_f = jax.ShapeDtypeStruct((out_rows, LANES), jnp.float32)
    # Ray planes padded with a dummy block row whose t_max is -1, so padded
    # pairs fail the in-kernel recheck and skip their triangle loops —
    # otherwise every unused grid step up to CHUNK does real work.
    fills = [1.0, 1.0, 1.0, 1.0, 1.0, 1.0, -1.0]
    planes = [
        jnp.concatenate(
            [pl_, jnp.full((BLOCK_ROWS, LANES), fv, pl_.dtype)], axis=0
        )
        for pl_, fv in zip(planes, fills)
    ]

    n_chunks = (max_pairs + chunk - 1) // chunk
    best_t = jnp.concatenate(
        [plane(t_max), jnp.full((BLOCK_ROWS, LANES), -1.0)], axis=0
    )
    best_prim = jnp.full((out_rows, LANES), -1, jnp.int32)
    best_b0 = jnp.zeros((out_rows, LANES), jnp.float32)
    best_b1 = jnp.zeros((out_rows, LANES), jnp.float32)

    for c in range(n_chunks):
        pb_c = jax.lax.dynamic_slice(pair_block, (c * chunk,), (chunk,))
        pt_c = jax.lax.dynamic_slice(pair_treelet, (c * chunk,), (chunk,))

        def run_chunk(_):
            return pl.pallas_call(
                functools.partial(_pairs_kernel, leaf_size=k),
                grid_spec=grid_spec,
                out_shape=[
                    out_f,
                    jax.ShapeDtypeStruct((out_rows, LANES), jnp.int32),
                    out_f,
                    out_f,
                ],
                interpret=interpret,
            )(pb_c, pt_c, tl.treelet_bounds, tl.tris_padded, *planes)

        def skip_chunk(_):
            return (
                jnp.full((out_rows, LANES), F32_MAX, jnp.float32),
                jnp.full((out_rows, LANES), -1, jnp.int32),
                jnp.zeros((out_rows, LANES), jnp.float32),
                jnp.zeros((out_rows, LANES), jnp.float32),
            )

        t_c, p_c, b0_c, b1_c = jax.lax.cond(
            c * chunk < n_pairs, run_chunk, skip_chunk, None
        )
        # Blocks untouched by this chunk hold uninitialized memory: merge
        # only rows whose block actually appeared in the chunk's pair list.
        touched = jnp.zeros(out_rows // BLOCK_ROWS + 1, bool).at[
            jnp.minimum(pb_c, out_rows // BLOCK_ROWS)
        ].set(True, mode="drop")[: out_rows // BLOCK_ROWS]
        touched_rows = jnp.repeat(touched, BLOCK_ROWS)[:, None]
        better = touched_rows & (t_c < best_t)
        best_t = jnp.where(better, t_c, best_t)
        best_prim = jnp.where(better, p_c, best_prim)
        best_b0 = jnp.where(better, b0_c, best_b0)
        best_b1 = jnp.where(better, b1_c, best_b1)

    return (
        best_t.reshape(-1)[:n],
        best_prim.reshape(-1)[:n],
        best_b0.reshape(-1)[:n],
        best_b1.reshape(-1)[:n],
        n_pairs,
    )


def _pairs_any_kernel(
    pb_ref, pt_ref,
    tb_ref, tri_ref,
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref, skip_ref,
    occ_out,
    *, leaf_size: int,
):
    p = pl.program_id(0)
    blk = pb_ref[p]
    is_first = jnp.logical_or(p == 0, pb_ref[jnp.maximum(p - 1, 0)] != blk)

    @pl.when(is_first)
    def _():
        occ_out[:] = jnp.zeros(occ_out.shape, jnp.int32)

    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    t_max = tmax_ref[:]
    skip = skip_ref[:].astype(jnp.float32)

    tt = pt_ref[p]
    ix, iy, iz = 1.0 / dx, 1.0 / dy, 1.0 / dz
    t0x = (tb_ref[tt, 0] - ox) * ix
    t1x = (tb_ref[tt, 3] - ox) * ix
    t0y = (tb_ref[tt, 1] - oy) * iy
    t1y = (tb_ref[tt, 4] - oy) * iy
    t0z = (tb_ref[tt, 2] - oz) * iz
    t1z = (tb_ref[tt, 5] - oz) * iz
    tmin = jnp.maximum(
        jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
        jnp.minimum(t0z, t1z),
    )
    tmax_box = jnp.minimum(
        jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
        jnp.maximum(t0z, t1z),
    )
    alive = (jnp.maximum(tmin, 0.0) <= jnp.minimum(tmax_box, t_max)) & (
        occ_out[:] == 0
    )

    @pl.when(jnp.any(alive))
    def _():
        def tri_body(k, _):
            cols = [tri_ref[k, c] for c in range(9)]
            hit, _, _, _ = _watertight(ox, oy, oz, dx, dy, dz, t_max, cols)
            light = tri_ref[k, 9]
            pid = tri_ref[k, 10]
            blocked = hit & (light != skip) & (pid >= 0.0)
            occ_out[:] = occ_out[:] | blocked.astype(jnp.int32)
            return 0

        jax.lax.fori_loop(0, leaf_size, tri_body, 0)


@functools.partial(jax.jit, static_argnames=("max_pairs", "interpret"))
def pairs_any(tl, o, d, t_max, skip_light, max_pairs: int = CHUNK * MAX_CHUNKS,
              interpret: bool = False):
    """Occlusion via the chunked pair-list walk. Returns (occluded [N]
    bool, n_pairs) — caller falls back when n_pairs > max_pairs."""
    n = o.shape[0]
    pair_block, pair_treelet, n_pairs, n_blocks = block_candidate_pairs(
        tl, o, d, t_max, max_pairs
    )
    rows = n_blocks * BLOCK_ROWS
    pad = rows * LANES - n

    def plane(x, cv=0.0):
        return jnp.pad(x, (0, pad), constant_values=cv).reshape(rows, LANES)

    planes = [plane(o[:, k]) for k in range(3)]
    planes += [plane(d[:, k], cv=1.0) for k in range(3)]
    planes.append(plane(t_max))
    planes.append(
        jnp.pad(skip_light, (0, pad), constant_values=-2).reshape(rows, LANES)
    )
    fills = [1.0, 1.0, 1.0, 1.0, 1.0, 1.0, -1.0, -2]
    planes = [
        jnp.concatenate(
            [pl_, jnp.full((BLOCK_ROWS, LANES), fv, pl_.dtype)], axis=0
        )
        for pl_, fv in zip(planes, fills)
    ]

    k = tl.leaf_size
    out_rows = rows + BLOCK_ROWS
    ray_spec = pl.BlockSpec(
        (BLOCK_ROWS, LANES),
        lambda p, pb, pt: (jnp.minimum(pb[p], out_rows // BLOCK_ROWS - 1), 0),
    )
    tri_spec = pl.BlockSpec((k, 128), lambda p, pb, pt: (pt[p], 0))
    tb_spec = pl.BlockSpec(tl.treelet_bounds.shape, lambda p, pb, pt: (0, 0))
    chunk = min(CHUNK, max_pairs)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(chunk,),
        in_specs=[tb_spec, tri_spec] + [ray_spec] * 8,
        out_specs=[ray_spec],
    )

    n_chunks = (max_pairs + chunk - 1) // chunk
    occ_best = jnp.zeros((out_rows, LANES), jnp.int32)
    for c in range(n_chunks):
        pb_c = jax.lax.dynamic_slice(pair_block, (c * chunk,), (chunk,))
        pt_c = jax.lax.dynamic_slice(pair_treelet, (c * chunk,), (chunk,))

        def run_chunk(_):
            (occ,) = pl.pallas_call(
                functools.partial(_pairs_any_kernel, leaf_size=k),
                grid_spec=grid_spec,
                out_shape=[jax.ShapeDtypeStruct((out_rows, LANES), jnp.int32)],
                interpret=interpret,
            )(pb_c, pt_c, tl.treelet_bounds, tl.tris_padded, *planes)
            return occ

        def skip_chunk(_):
            return jnp.zeros((out_rows, LANES), jnp.int32)

        occ_c = jax.lax.cond(c * chunk < n_pairs, run_chunk, skip_chunk, None)
        touched = jnp.zeros(out_rows // BLOCK_ROWS + 1, bool).at[
            jnp.minimum(pb_c, out_rows // BLOCK_ROWS)
        ].set(True, mode="drop")[: out_rows // BLOCK_ROWS]
        touched_rows = jnp.repeat(touched, BLOCK_ROWS)[:, None]
        occ_best = occ_best | jnp.where(touched_rows, occ_c, 0)

    return occ_best.reshape(-1)[:n] > 0, n_pairs
