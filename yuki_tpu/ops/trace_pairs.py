"""Pair-list treelet traversal: the block-sparse formulation.

The in-kernel treelet cull (trace_treelets.py) spends most of its time on
scalar bound loads for treelets nobody hits.  Here the cull moves OUT of
the kernel into dense XLA:

  1. `block_candidate_pairs` computes a conservative interval slab test of
     each ray *block bundle* (origin box x direction box) against every
     treelet AABB — one fully-vectorized [B,T] op on the VPU — and
     compacts the survivors into a flat (block, treelet) pair list sorted
     block-major (cumsum + scatter; jnp.nonzero lowers pathologically).
  2. The Pallas kernel runs one grid step per pair.  A
     PrefetchScalarGridSpec prefetches the pair arrays so the BlockSpec
     index maps pick each step's ray block and treelet triangle rows —
     Mosaic's pipeline then streams the right HBM blocks into VMEM with
     automatic double buffering (no hand-written DMA at all).  Because
     pairs are block-major, each ray block's output stays resident in
     VMEM across its pairs, carrying the running closest-hit state; a
     cheap per-pair vector recheck of the treelet AABB against the
     *current* t skips far geometry as hits accumulate front-to-back.
  3. Pair lists longer than one launch's SMEM budget run as multiple
     CHUNK-sized launches (dead chunks skipped by lax.cond) whose
     per-chunk results merge by min-t under a touched-block mask.

Buffer packing matters: grid-step pipeline bookkeeping costs scale with
the number of blocked operands, so the seven ray planes travel as ONE
[rows, 896] array (static 128-wide column slices in-kernel) and the four
closest-hit outputs as ONE [rows, 512] array (prim ids stored as exact
small floats).

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
CHUNK = 8192  # pairs per launch: grid bookkeeping is ~us-scale per step,
# so small cond-skipped chunks beat one SMEM-sized launch
MAX_CHUNKS = 48  # pair capacity 393216/traversal (bounce waves at 64k
# rays measured up to ~200k pairs in the colonnade; each chunk adds a
# cond+pallas_call to the graph, trading capacity against compile time —
# 12 chunks measured a 35% e2e regression from overflow fallbacks)


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
    # Front-to-back pair order: sort each block's pairs by the conservative
    # t_enter so the kernel's running-t recheck prunes far treelets as
    # early as possible (closest) and occluded lanes retire sooner (any).
    # Stable variadic sort keyed (block, t_enter); padded entries carry
    # pair_block == n_blocks so they sort to the tail automatically.
    t_en_flat = jnp.where(
        jnp.isnan(t_enter), jnp.inf, jnp.maximum(t_enter, 0.0)
    ).reshape(-1)
    pad_row = jnp.full(1, jnp.inf, t_en_flat.dtype)
    pair_ten = jnp.concatenate([t_en_flat, pad_row])[
        jnp.minimum(idx, n_blocks * n_t)
    ]
    pair_block, _, pair_treelet = jax.lax.sort(
        (pair_block, pair_ten, pair_treelet), num_keys=2, is_stable=False
    )
    return pair_block, pair_treelet, n_pairs, n_blocks


def _ray_cols(rp_ref):
    """Unpack the packed ray block [BLOCK_ROWS, 896] into 7 planes."""
    return [rp_ref[:, k * 128 : (k + 1) * 128] for k in range(7)]


def _recheck(tb_ref, tt, ox, oy, oz, dx, dy, dz, t_cur):
    """Per-lane slab test of treelet tt's AABB against current t."""
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
    return jnp.maximum(tmin, 0.0) <= jnp.minimum(tmax_box, t_cur)


def _pairs_kernel(
    pb_ref, pt_ref,  # scalar-prefetch: pair block / treelet ids [P]
    tb_ref,  # treelet bounds [T, 8] (VMEM, whole table)
    tri_ref,  # this pair's treelet triangle rows (K, 128)
    rp_ref,  # packed ray planes (BLOCK_ROWS, 896)
    out_ref,  # packed outputs (BLOCK_ROWS, 512): t | prim(f32) | b0 | b1
    *, leaf_size: int,
):
    p = pl.program_id(0)
    blk = pb_ref[p]
    is_first = jnp.logical_or(p == 0, pb_ref[jnp.maximum(p - 1, 0)] != blk)
    ox, oy, oz, dx, dy, dz, tmax = _ray_cols(rp_ref)

    @pl.when(is_first)
    def _():
        out_ref[:, 0:128] = tmax
        out_ref[:, 128:256] = jnp.full(tmax.shape, -1.0, jnp.float32)
        out_ref[:, 256:512] = jnp.zeros((tmax.shape[0], 256), jnp.float32)

    tt = pt_ref[p]
    alive = _recheck(tb_ref, tt, ox, oy, oz, dx, dy, dz, out_ref[:, 0:128])

    @pl.when(jnp.any(alive))
    def _():
        def tri_body(k, _):
            cols = [tri_ref[k, c] for c in range(9)]
            t_cur = out_ref[:, 0:128]
            hit, ti, bi0, bi1 = _watertight(
                ox, oy, oz, dx, dy, dz, t_cur, cols
            )
            pid = tri_ref[k, 10]
            # pid < 0 marks padding rows; FMA contraction can give
            # degenerate zero-area padding a nonzero edge function.
            closer = hit & (ti < t_cur) & (pid >= 0.0)
            out_ref[:, 0:128] = jnp.where(closer, ti, t_cur)
            out_ref[:, 128:256] = jnp.where(closer, pid, out_ref[:, 128:256])
            out_ref[:, 256:384] = jnp.where(closer, bi0, out_ref[:, 256:384])
            out_ref[:, 384:512] = jnp.where(closer, bi1, out_ref[:, 384:512])
            return 0

        jax.lax.fori_loop(0, leaf_size, tri_body, 0)


def _pairs_any_kernel(
    pb_ref, pt_ref,
    tb_ref, tri_ref,
    rp_ref,  # packed (BLOCK_ROWS, 1024): 7 planes + skip
    occ_out,  # (BLOCK_ROWS, 128) i32
    *, leaf_size: int,
):
    p = pl.program_id(0)
    blk = pb_ref[p]
    is_first = jnp.logical_or(p == 0, pb_ref[jnp.maximum(p - 1, 0)] != blk)
    ox, oy, oz, dx, dy, dz, t_max = _ray_cols(rp_ref)
    skip = rp_ref[:, 896:1024]

    @pl.when(is_first)
    def _():
        occ_out[:] = jnp.zeros(occ_out.shape, jnp.int32)

    tt = pt_ref[p]
    crossing = _recheck(tb_ref, tt, ox, oy, oz, dx, dy, dz, t_max)
    alive = crossing & (occ_out[:] == 0)

    @pl.when(jnp.any(alive))
    def _():
        # Early-exit triangle loop: an any-hit query is done the moment
        # every corridor-crossing lane is occluded — unlike closest-hit
        # there is no t to keep refining (bvh.rs:235-302's first-hit
        # return, expressed at block granularity).
        crossing_i = crossing.astype(jnp.int32)

        def cond(s):
            k, done = s
            return (k < leaf_size) & (done == 0)

        def body(s):
            k, _ = s
            cols = [tri_ref[k, c] for c in range(9)]
            hit, _, _, _ = _watertight(ox, oy, oz, dx, dy, dz, t_max, cols)
            light = tri_ref[k, 9]
            pid = tri_ref[k, 10]
            blocked = hit & (light != skip) & (pid >= 0.0)
            occ_out[:] = occ_out[:] | blocked.astype(jnp.int32)
            still = jnp.any(crossing_i > occ_out[:])
            return k + 1, jnp.where(still, 0, 1)

        jax.lax.while_loop(cond, body, (0, 0))


def _pack_rays(o, d, t_max, n_blocks, extra=None):
    """Rays -> one packed [rows+BLOCK_ROWS, 7*128 (+128)] array with a dummy
    trailing block whose t_max=-1 (padded pairs fail the recheck)."""
    n = o.shape[0]
    rows = n_blocks * BLOCK_ROWS
    pad = rows * LANES - n

    def plane(x, cv=0.0):
        return jnp.pad(x, (0, pad), constant_values=cv).reshape(rows, LANES)

    cols = [plane(o[:, k]) for k in range(3)]
    cols += [plane(d[:, k], cv=1.0) for k in range(3)]
    cols.append(plane(t_max))
    fills = [1.0, 1.0, 1.0, 1.0, 1.0, 1.0, -1.0]
    if extra is not None:
        cols.append(
            jnp.pad(extra, (0, pad), constant_values=-2).reshape(rows, LANES)
        )
        fills.append(-2.0)
    packed = jnp.concatenate(
        [
            jnp.concatenate(
                [c, jnp.full((BLOCK_ROWS, LANES), fv, c.dtype)], axis=0
            )
            for c, fv in zip(cols, fills)
        ],
        axis=1,
    )
    return packed.astype(jnp.float32), n


def _specs(tl, out_rows, k, n_planes):
    ray_spec = pl.BlockSpec(
        (BLOCK_ROWS, n_planes * LANES),
        lambda p, pb, pt: (jnp.minimum(pb[p], out_rows // BLOCK_ROWS - 1), 0),
    )
    tri_spec = pl.BlockSpec((k, 128), lambda p, pb, pt: (pt[p], 0))
    tb_spec = pl.BlockSpec(tl.treelet_bounds.shape, lambda p, pb, pt: (0, 0))
    return ray_spec, tri_spec, tb_spec


def _out_spec(out_rows, width):
    return pl.BlockSpec(
        (BLOCK_ROWS, width),
        lambda p, pb, pt: (jnp.minimum(pb[p], out_rows // BLOCK_ROWS - 1), 0),
    )


def _touched_rows(pb_c, out_rows):
    touched = jnp.zeros(out_rows // BLOCK_ROWS + 1, bool).at[
        jnp.minimum(pb_c, out_rows // BLOCK_ROWS)
    ].set(True, mode="drop")[: out_rows // BLOCK_ROWS]
    return jnp.repeat(touched, BLOCK_ROWS)[:, None]


@functools.partial(jax.jit, static_argnames=("max_pairs", "interpret"))
def pairs_closest(tl, o, d, t_max, max_pairs: int = CHUNK * MAX_CHUNKS,
                  interpret: bool = False):
    """Closest hit via the chunked pair-list walk. Returns (t, prim, b0,
    b1, n_pairs) — caller falls back when n_pairs exceeds max_pairs."""
    n = o.shape[0]
    pair_block, pair_treelet, n_pairs, n_blocks = block_candidate_pairs(
        tl, o, d, t_max, max_pairs
    )
    packed, _ = _pack_rays(o, d, t_max, n_blocks)
    k = tl.leaf_size
    out_rows = (n_blocks + 1) * BLOCK_ROWS
    ray_spec, tri_spec, tb_spec = _specs(tl, out_rows, k, 7)
    # Big waves need big pair capacity; grow the per-launch chunk (not the
    # chunk count) so the compiled graph stays at <= MAX_CHUNKS pallas
    # calls regardless of capacity.
    chunk = min(max(CHUNK, -(-max_pairs // MAX_CHUNKS)), max_pairs)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(chunk,),
        in_specs=[tb_spec, tri_spec, ray_spec],
        out_specs=[_out_spec(out_rows, 512)],
    )

    n_chunks = (max_pairs + chunk - 1) // chunk
    # best: packed [out_rows, 512] with t initialized to this ray's t_max.
    tmax_rows = jnp.concatenate(
        [packed[:, 6 * 128 : 7 * 128]], axis=1
    )
    best = jnp.concatenate(
        [
            tmax_rows,
            jnp.full((out_rows, 128), -1.0, jnp.float32),
            jnp.zeros((out_rows, 256), jnp.float32),
        ],
        axis=1,
    )

    for c in range(n_chunks):
        pb_c = jax.lax.dynamic_slice(pair_block, (c * chunk,), (chunk,))
        pt_c = jax.lax.dynamic_slice(pair_treelet, (c * chunk,), (chunk,))

        def run_chunk(_):
            (out,) = pl.pallas_call(
                functools.partial(_pairs_kernel, leaf_size=k),
                grid_spec=grid_spec,
                out_shape=[
                    jax.ShapeDtypeStruct((out_rows, 512), jnp.float32)
                ],
                interpret=interpret,
            )(pb_c, pt_c, tl.treelet_bounds, tl.tris_padded, packed)
            return out

        def skip_chunk(_):
            return jnp.full((out_rows, 512), F32_MAX, jnp.float32)

        out_c = jax.lax.cond(c * chunk < n_pairs, run_chunk, skip_chunk, None)
        better = _touched_rows(pb_c, out_rows) & (
            out_c[:, 0:128] < best[:, 0:128]
        )
        best = jnp.where(
            jnp.concatenate([better] * 4, axis=1), out_c, best
        )

    return (
        best[:, 0:128].reshape(-1)[:n],
        best[:, 128:256].astype(jnp.int32).reshape(-1)[:n],
        best[:, 256:384].reshape(-1)[:n],
        best[:, 384:512].reshape(-1)[:n],
        n_pairs,
    )


@functools.partial(jax.jit, static_argnames=("max_pairs", "interpret"))
def pairs_any(tl, o, d, t_max, skip_light, max_pairs: int = CHUNK * MAX_CHUNKS,
              interpret: bool = False):
    """Occlusion via the chunked pair-list walk. Returns (occluded [N]
    bool, n_pairs)."""
    n = o.shape[0]
    pair_block, pair_treelet, n_pairs, n_blocks = block_candidate_pairs(
        tl, o, d, t_max, max_pairs
    )
    packed, _ = _pack_rays(o, d, t_max, n_blocks, extra=skip_light)
    k = tl.leaf_size
    out_rows = (n_blocks + 1) * BLOCK_ROWS
    ray_spec, tri_spec, tb_spec = _specs(tl, out_rows, k, 8)
    chunk = min(max(CHUNK, -(-max_pairs // MAX_CHUNKS)), max_pairs)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(chunk,),
        in_specs=[tb_spec, tri_spec, ray_spec],
        out_specs=[_out_spec(out_rows, LANES)],
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
            )(pb_c, pt_c, tl.treelet_bounds, tl.tris_padded, packed)
            return occ

        def skip_chunk(_):
            return jnp.zeros((out_rows, LANES), jnp.int32)

        occ_c = jax.lax.cond(c * chunk < n_pairs, run_chunk, skip_chunk, None)
        occ_best = occ_best | jnp.where(_touched_rows(pb_c, out_rows), occ_c, 0)

    return occ_best.reshape(-1)[:n] > 0, n_pairs
