"""Exact per-ray incidence stream traversal — the divergent-wave engine.

Why this exists: block-granularity culling (trace_pairs.py) conservatively
unions 1024 divergent bounce rays, which measured ~750 candidate treelets
per block on the colonnade while the true PER-RAY incidence is only ~3.5
AABBs (benchmarks/incidence_stats.py) — a ~200x work amplification that
made one bounce wave cost ~900 ms.  Sorting doesn't fix it: even a sorted
128-ray row crosses ~99 distinct treelets (benchmarks/row_union.py).
Work must scale with TRUE per-ray incidence, which forces a
chunk-major gathered ray stream.

The build avoids every slow XLA lowering this chip has
(benchmarks/gather_micro4.py: scalar/narrow gathers and scatters run
~7-10 ns/element, while 128-lane row gathers stream at ~340 GB/s and
cumsum/sort/searchsorted are fast):

  1. Scene cut: flat ~128-triangle BVH chunks (treelets.py with
     supers == chunks); the whole chunk-bounds table is dense.
  2. Per-ray candidate lists [N, C]: dense slab matrix [N, Ch] packed to
     uint32 bitmasks, then C lowest-set-bit extractions — all dense VPU
     ops, no compaction.  Rays crossing more than C chunks are flagged
     and re-run through a second, wider instantiation (the caller feeds
     a compacted mini-wave).
  3. ONE lax.sort of (chunk_key, flat_pos) over [N*C] groups candidates
     chunk-major; sentinel keys sort to the tail for free.
  4. Slot layout: each chunk's pairs padded to 128-lane rows.  Slot
     contents come from the sorted pos array via TWO fast row-gathers
     plus seven masked lane-rolls (a per-row variable shift decomposed
     into static power-of-2 rotations) — zero scatters.
  5. Ray planes reach the kernel through one [N, 128] row-gather (the
     DMA fast path), transposed to plane-major (8, 128) blocks.
  6. The Pallas kernel runs one grid step per slot row: the chunk's
     triangles stream as (8, 1) sublane vectors against (1, 128) ray
     lanes — one VPU op tests 8 triangles x 128 rays.  Emits (t, prim).
  7. Merge: results scatter by their ORIGINAL flat position into the
     dense [N, C] matrix (positions are unique — no combiner races),
     then a dense min over C with lowest-prim tie-break.  Barycentrics
     are recomputed for the single winning triangle from the packed
     shading row (cheaper than carrying them through the merge).

Reference parity: visits the same leaves a per-ray front-to-back stack
traversal would (bvh.rs:160-302) without per-lane stacks or pointer
chasing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .trace import (
    _ray_shear,
    _scaled_min8,
    _watertight,
    _watertight_scaled,
    F32_MAX,
    LANES,
)

BIG = 3.0e38
C_MAIN = 16  # candidate-list width (colonnade bounce p95 = 9)
C_WIDE = 128  # overflow pass width.  Sized ABOVE the worst measured
# per-ray incidence (atrium bounce-4 max = 88, r3_bounce_growth.py;
# colonnade max 70): a wide-pass overflow flips the WHOLE wave to the
# slow treelet fallback, so margin here is cheap insurance — the pass
# runs on <= OV_CAP compacted rays, where extraction at C=128 is small.
OV_CAP = 16384  # static mini-wave size for overflow rays
OV_MID = 8192  # middle overflow tier: atrium bounce waves overflow
# ~6.8k rays EVERY bounce (r3_dispatch_diag on-chip) — above OV_SMALL,
# well under OV_CAP — so without this tier they paid the full-cap wide
# pass per bounce
OV_SMALL = 2048  # tight overflow tier: typical colonnade waves overflow
# well under 1%, so the caller lax.conds to the cheapest instantiation
# that fits the actual overflow count
WIDE_TIGHT_MULT = 40  # tight slot budget of the wide re-run: overflow
# rays carry (C_MAIN, C_WIDE] candidates but their measured mean is far
# below C_WIDE (colonnade primary-overflow mean ~20, atrium bounce max
# 88), while mult=C_WIDE sized the pack/kernel/merge for EVERY ray at
# full width — ~3x the slot rows the wave actually needs.  The tiered
# budget (slot_layout demand -> lax.cond) spills to mult=C_WIDE only
# when a wave genuinely demands it.
WIDE_LOW_MULT = 8  # low tier of the wide re-run: ROWS-branch overflow
# rays overflowed their 128-ray ROW'S union (>_ROWS_C), not their own
# list — per-RAY incidence stays near the wave mean (~6 on colonnade
# primaries), so the re-run's slot demand is tiny and the 40x budget
# paid pack+kernel on ~700k dead slots (r3_dispatch_diag: b0 closest
# 116 ms with an 8976-ray rows overflow spilling to the OV_CAP tier).


def _safe_inv(dc):
    """NaN-free slab reciprocal: |d| clamps to 1e-30 so inv stays FINITE
    (sign-preserving, ~1e30 max).  (lo-o)*inv can then never produce the
    0*inf NaN of a plain 1/d — a parallel ray ON a slab plane gets t0=0
    with the other plane at +-huge, the same verdict the NaN-patching
    form computed — and each axis fold drops its 2 isnan + 2 select ops,
    ~30% of the cross kernel's per-block VPU work."""
    return jnp.where(dc >= 0.0, 1.0, -1.0) / jnp.maximum(
        jnp.abs(dc), 1e-30
    )


def _slab_axis(lo, hi, o, inv, tn, tf):
    """Fold one axis into the running slab interval [tn, tf].  `inv` must
    come from _safe_inv (finite): min/max then need no NaN patching."""
    t0 = (lo - o) * inv
    t1 = (hi - o) * inv
    return (
        jnp.maximum(tn, jnp.minimum(t0, t1)),
        jnp.minimum(tf, jnp.maximum(t0, t1)),
    )


def _cross_words_kernel(bb_ref, cb_ref, rp_ref, out_ref, pln_ref, *,
                        w_words, w_pad, group=1, word_cull=True):
    """Per-128-ray-row crossing bitmask: chunks stream through VMEM as
    (8,1) sublane vectors against (1,128) ray lanes; bits pack across
    sublanes by disjoint-bit weighted sums (two's-complement adds of
    disjoint bits == OR).  Out: (group*w_pad, 128) i32 — subrow g's
    word w lives at sublane g*w_pad + w.

    HIERARCHICAL (round 3): each 32-chunk word carries a union AABB
    (bb_ref [w_pad8, 8] — lo xyz cols 0-2, hi xyz cols 3-5); one
    vectorized (w_pad8, 128) slab pass per subrow tests every word box
    against every lane, then a word none of the GROUP's rays enter
    skips its 4x(8,128) chunk passes entirely, cutting the per-row
    cull from O(total chunks) to O(chunks in crossed words) — the flat
    cull was the atrium scaling wall (W=123 words at 347k tris,
    round-2 verdict item 2).  Chunks are in BVH DFS order, so 32-chunk
    words are spatially compact.  An 8-chunk-block granularity was
    measured and REJECTED (round 3): 4x the scalar pl.when branches
    cost more than the extra chunk-pass skips saved (colonnade cross
    44.6 -> 73.5 ms, atrium 80.2 -> 116.5 ms).  The slab folds use
    _safe_inv's finite reciprocals — no NaN patching ops in the loop.

    `group` batches several 128-ray rows per grid step: the per-word
    scalar branch (measured ~0.3 us each) is paid once per GROUP
    instead of once per row, at the cost of a group-granular (looser)
    word cull; the chunk passes run per subrow inside a fori_loop so
    kernel code size stays O(w_words), not O(w_words * group).
    `word_cull=False` drops the hierarchy entirely (no scalar branches
    at all) — the right trade for small-W scenes on divergent waves
    where rows cross most words anyway."""
    wpad8 = bb_ref.shape[0]
    sub = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)

    out_ref[0 : group * w_pad, :] = jnp.zeros(
        (group * w_pad, LANES), jnp.int32
    )

    def axis(lo, hi, o_, inv, tn, tf):
        t0 = (lo - o_) * inv
        t1 = (hi - o_) * inv
        return (
            jnp.maximum(tn, jnp.minimum(t0, t1)),
            jnp.minimum(tf, jnp.maximum(t0, t1)),
        )

    any_live = jnp.any(rp_ref[6:7, :] > 0.0)
    for g in range(1, group):
        any_live |= jnp.any(rp_ref[g * 8 + 6 : g * 8 + 7, :] > 0.0)

    @pl.when(any_live)
    def _():
        # Precompute per-subrow derived planes ONCE into VMEM scratch:
        # rows g*8 + [ox, oy, oz, ix, iy, iz, tm, live].  Staged through
        # a ref because the fori body below needs a DYNAMIC subrow slice
        # and Mosaic has no lowering for dynamic_slice on traced VALUES —
        # only on refs via pl.ds (sublane dim).
        w_live_or = None
        for g in range(group):
            ox = rp_ref[g * 8 + 0 : g * 8 + 1, :]
            oy = rp_ref[g * 8 + 1 : g * 8 + 2, :]
            oz = rp_ref[g * 8 + 2 : g * 8 + 3, :]
            dx = rp_ref[g * 8 + 3 : g * 8 + 4, :]
            dy = rp_ref[g * 8 + 4 : g * 8 + 5, :]
            dz = rp_ref[g * 8 + 5 : g * 8 + 6, :]
            tm = rp_ref[g * 8 + 6 : g * 8 + 7, :]
            ix, iy, iz = _safe_inv(dx), _safe_inv(dy), _safe_inv(dz)
            live = (tm > 0.0).astype(jnp.float32)
            pln_ref[g * 8 : (g + 1) * 8, :] = jnp.concatenate(
                [ox, oy, oz, ix, iy, iz, tm, live], axis=0
            )
            if word_cull:
                # Word-level union-AABB cull, vectorized over all words.
                tnw = jnp.zeros((wpad8, LANES), jnp.float32)
                tfw = jnp.broadcast_to(tm, (wpad8, LANES))
                tnw, tfw = axis(bb_ref[:, 0:1], bb_ref[:, 3:4], ox, ix,
                                tnw, tfw)
                tnw, tfw = axis(bb_ref[:, 1:2], bb_ref[:, 4:5], oy, iy,
                                tnw, tfw)
                tnw, tfw = axis(bb_ref[:, 2:3], bb_ref[:, 5:6], oz, iz,
                                tnw, tfw)
                wl = (tnw <= tfw) & (tm > 0.0)
                w_live_or = wl if w_live_or is None else (w_live_or | wl)

        def word_body(wi, maybe_when):
            def subrows(_):
                def g_body(g, _):
                    sl = pln_ref[pl.ds(g * 8, 8), :]
                    ox, oy, oz = sl[0:1, :], sl[1:2, :], sl[2:3, :]
                    ix, iy, iz = sl[3:4, :], sl[4:5, :], sl[5:6, :]
                    tm, lv = sl[6:7, :], sl[7:8, :]
                    # Bit-pack with ONE cross-sublane reduction per word:
                    # sublane s of acc8 accumulates bits q*8+s (disjoint
                    # across q), so the expensive sublane sum happens
                    # once instead of per q-block.
                    acc8 = jnp.zeros((8, LANES), jnp.int32)
                    for q in range(4):
                        cb0 = (wi * 4 + q) * 8
                        blk = cb_ref[pl.ds(cb0, 8), :]  # (8,8) chunk bounds
                        tn = jnp.zeros((1, LANES), jnp.float32)
                        tf = tm
                        tn, tf = axis(blk[:, 0:1], blk[:, 3:4], ox, ix,
                                      tn, tf)
                        tn, tf = axis(blk[:, 1:2], blk[:, 4:5], oy, iy,
                                      tn, tf)
                        tn, tf = axis(blk[:, 2:3], blk[:, 5:6], oz, iz,
                                      tn, tf)
                        cross = (tn <= tf) & (lv > 0.0)
                        weight = jnp.int32(1) << (sub + 8 * q)
                        acc8 = acc8 + cross.astype(jnp.int32) * weight
                    acc = jnp.sum(acc8, axis=0, keepdims=True)
                    out_ref[pl.ds(g * w_pad + wi, 1), :] = acc
                    return _

                jax.lax.fori_loop(0, group, g_body, 0)

            if maybe_when is None:
                subrows(None)
            else:
                pl.when(maybe_when)(lambda: subrows(None))

        for wi in range(w_words):
            word_body(
                wi,
                jnp.any(w_live_or[wi : wi + 1, :]) if word_cull else None,
            )


def _cross_words_tpu(ch, o, d, t_max, interpret=False, group=1,
                     word_cull=True):
    """Pallas cross_words: the [N, Ch] slab matrix never touches HBM."""
    n = o.shape[0]
    rows = n // LANES
    gpad_rows = (-rows) % group
    n_c = ch.n_treelets
    w_words = -(-n_c // 32)
    w_pad = -(-w_words // 8) * 8
    gpad = w_words * 4 * 8 - n_c  # bounds rows up to full words
    cb = jnp.concatenate(
        [ch.treelet_bounds[:, :8],
         jnp.full((gpad, 8), jnp.inf, jnp.float32)], axis=0
    )
    # Word-union AABBs for the kernel's hierarchical cull.  Pad chunks
    # are lo = hi = +inf: lo-min keeps real mins; hi-max goes +inf only
    # for the (single) partially-filled word — conservative, never
    # flipped (lo=+inf/hi=-inf would unbound the slab interval).  A word
    # of ONLY pad chunks degenerates to a point at +inf: never crossed.
    wpad8 = -(-w_words // 8) * 8
    bb_lo = cb[:, 0:3].reshape(w_words, 32, 3).min(axis=1)
    bb_hi = cb[:, 3:6].reshape(w_words, 32, 3).max(axis=1)
    bb = jnp.concatenate(
        [bb_lo, bb_hi, jnp.zeros((w_words, 2), jnp.float32)], axis=1
    )
    bb = jnp.concatenate(
        [bb, jnp.full((wpad8 - w_words, 8), jnp.inf, jnp.float32)], axis=0
    )

    planes = [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2], t_max,
              jnp.zeros_like(t_max)]
    packed = jnp.stack(
        [p.reshape(rows, LANES) for p in planes], axis=1
    ).reshape(rows * 8, LANES)
    if gpad_rows:
        # Pad the wave to a whole number of row-groups with dead rows
        # (t_max = 0 -> every test is masked off).
        packed = jnp.concatenate(
            [packed, jnp.zeros((gpad_rows * 8, LANES), jnp.float32)], axis=0
        )
    grows = (rows + gpad_rows) // group

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(grows,),
        in_specs=[
            pl.BlockSpec(bb.shape, lambda p: (0, 0)),
            pl.BlockSpec(cb.shape, lambda p: (0, 0)),
            pl.BlockSpec((8 * group, LANES), lambda p: (p, 0)),
        ],
        out_specs=[pl.BlockSpec((group * w_pad, LANES), lambda p: (p, 0))],
        scratch_shapes=[pltpu.VMEM((group * 8, LANES), jnp.float32)],
    )
    (out,) = pl.pallas_call(
        functools.partial(_cross_words_kernel, w_words=w_words, w_pad=w_pad,
                          group=group, word_cull=word_cull),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((grows * group * w_pad, LANES), jnp.int32)
        ],
        interpret=interpret,
    )(bb, cb, packed)
    words = (
        out.reshape(rows + gpad_rows, w_pad, LANES)[:rows, :w_words, :]
        .transpose(0, 2, 1)
        .reshape(n, w_words)
    )
    return jax.lax.bitcast_convert_type(words, jnp.uint32)


# Grid-step row batching of the cross kernel (see _cross_words_kernel):
# the per-word scalar branch amortizes across CROSS_GROUP rows.  1 until
# on-chip measurement picks the production value.
CROSS_GROUP = 1
CROSS_WORD_CULL = True


def cross_words(ch, o, d, t_max, interpret: bool = False):
    """Dense exact crossing bitmask: uint32 words [N, ceil(Ch/32)].
    Computed ONCE per wave and shared by the coherent (row-union) and
    divergent (slot-stream) paths plus the adaptive-dispatch probe.
    Pallas on TPU (the slab matrix stays in VMEM; the XLA form measured
    ~30 ms per 262k wave in HBM traffic); dense XLA elsewhere."""
    import jax as _jax

    n = o.shape[0]
    if (interpret or _jax.default_backend() == "tpu") and n % LANES == 0:
        return _cross_words_tpu(ch, o, d, t_max, interpret=interpret,
                                group=CROSS_GROUP,
                                word_cull=CROSS_WORD_CULL)
    return _cross_words_xla(ch, o, d, t_max)


def _cross_words_xla(ch, o, d, t_max):
    """Reference dense-XLA crossing words (CPU tests, odd wave sizes)."""
    n = o.shape[0]
    n_c = ch.n_treelets
    w = -(-n_c // 32)
    ch_pad = w * 32

    # Dense [N, ch_pad] crossing matrix (padded chunks get empty boxes).
    cb = ch.treelet_bounds
    pad = ch_pad - n_c
    # Padding chunks use lo = hi = +inf: the slab interval degenerates to
    # a point at t = +-inf on every axis, which can never satisfy
    # max(tn,0) <= min(tf, t).  (lo=+inf/hi=-inf would FLIP the min/max
    # and make the interval unbounded instead.)
    lo_t = jnp.concatenate([cb[:, 0:3], jnp.full((pad, 3), jnp.inf)], 0)
    hi_t = jnp.concatenate([cb[:, 3:6], jnp.full((pad, 3), jnp.inf)], 0)
    tn = jnp.zeros((n, 1), o.dtype)
    tf = t_max[:, None]
    for a in range(3):
        inv = _safe_inv(d[:, a])[:, None]
        tn, tf = _slab_axis(
            lo_t[None, :, a], hi_t[None, :, a], o[:, a][:, None], inv, tn, tf
        )
    cross = (tn <= tf) & (t_max > 0.0)[:, None]  # [N, ch_pad]

    bits = jax.lax.broadcasted_iota(jnp.uint32, (1, 1, 32), 2)
    return (
        (cross.reshape(n, w, 32).astype(jnp.uint32) << bits)
        .sum(axis=2)
        .astype(jnp.uint32)
    )  # [N, W]


def _extract_phase2(words, word_base, C: int):
    """C lowest-set-bit extractions from bitmask words [R, w] (ascending
    id order, -1 pad).  word_base [R, w] i32 gives each COLUMN's chunk-id
    base (compacted layouts); None means column index * 32 (dense)."""
    r, w = words.shape
    w_iota = jax.lax.broadcasted_iota(jnp.int32, (r, w), 1)
    cols = []
    for _ in range(C):
        nz = words != 0
        first_w = jnp.argmin(
            jnp.where(nz, w_iota, w), axis=1
        ).astype(jnp.int32)  # [R]
        sel = w_iota == first_w[:, None]
        word_sel = jnp.where(sel, words, 0).sum(axis=1).astype(jnp.uint32)
        lsb = word_sel & (~word_sel + jnp.uint32(1))
        bit_idx = jax.lax.population_count(lsb - jnp.uint32(1)).astype(
            jnp.int32
        )
        valid = word_sel != 0
        if word_base is None:
            base = first_w * 32
        else:
            # One-hot select, not a gather (narrow per-row gathers are
            # the slow scalar path on this chip).
            base = jnp.where(sel, word_base, 0).sum(axis=1)
        cols.append(
            jnp.where(valid, base + bit_idx, -1).astype(jnp.int32)
        )
        words = jnp.where(sel, words & ~lsb[:, None], words)
    return jnp.stack(cols, axis=1)


def extract_compact(words, word_base, C: int):
    """(lists, overflow) from a pre-compacted word layout: words [R, wc]
    u32 with word_base [R, wc] i32 chunk-id bases (-32 pad columns).
    The direct consumer of cross_compact's output — no dense [R, W]
    rebuild between the two-level cull and extraction."""
    count = jax.lax.population_count(words).sum(axis=1)
    return _extract_phase2(words, word_base, C), count > C


def extract_lists(words, C: int, wc: int | None = None):
    """uint32 bitmask words [R, W] -> (lists [R, C] i32 (-1 pad, ascending
    id order), overflow [R] bool) via C lowest-set-bit extractions.

    With `wc` set, extraction runs in two phases: first compact the (at
    most wc) NONZERO words per row, then extract bits from the compacted
    [R, wc] matrix — O(R*(wc*W + C*wc)) instead of O(R*C*W), ~2x fewer
    ops at atrium scale (W=123).  Rows with more than wc nonzero words
    are flagged overflow (they re-run through the wide pass), exactly
    like rows with more than C candidates."""
    r, w = words.shape
    count = jax.lax.population_count(words).sum(axis=1)
    overflow = count > C

    if wc is not None and wc < w:
        nzw = (words != 0).sum(axis=1)
        overflow = overflow | (nzw > wc)
        w_iota = jax.lax.broadcasted_iota(jnp.int32, (r, w), 1)
        wrds = words
        comp_words, comp_ids = [], []
        for _ in range(wc):
            nz = wrds != 0
            first_w = jnp.argmin(
                jnp.where(nz, w_iota, w), axis=1
            ).astype(jnp.int32)
            sel = w_iota == first_w[:, None]
            word_sel = jnp.where(sel, wrds, 0).sum(axis=1).astype(jnp.uint32)
            comp_words.append(word_sel)
            comp_ids.append(jnp.where(word_sel != 0, first_w, -1))
            wrds = jnp.where(sel, 0, wrds)
        words = jnp.stack(comp_words, axis=1)  # [R, wc]
        word_base = jnp.stack(comp_ids, axis=1) * 32  # [R, wc], -32 pad
    else:
        word_base = None

    return _extract_phase2(words, word_base, C), overflow


def candidate_lists(ch, o, d, t_max, C: int):
    """Exact per-ray crossed-chunk lists (cross_words + extract_lists)."""
    return extract_lists(cross_words(ch, o, d, t_max), C)


# ---------------------------------------------------------------------
# Two-level exact cull: the flat cross is O(rays x chunks) — the atrium
# scaling wall (W=123 words at 347k tris).  Level 1 slab-tests each ray
# against the union AABB of every 32-chunk WORD (~W tests); level 2
# tests only the crossed words' 32 chunks, fetched by an exact one-hot
# MXU gather (gathers.py pattern).  Measured per-ray crossed words
# (benchmarks/r3_superstats.py): colonnade bounce mean 6.6 / max 21,
# atrium primary mean 11.9 / max 19 -> W + 32*S_true = 258-500 slab
# tests/ray vs the flat 1454/3935, all dense VPU/MXU work.  Output is
# the compacted (words, base) layout extract_compact consumes directly
# — the dense [N, W] matrix is never materialized.
# ---------------------------------------------------------------------

# Static dispatch floor for the two-level cull: below this chunk count
# the flat dense cross is at most ~32 word-columns wide and the L2
# one-hot matmuls cost more than they save.  w = n_c/32 vs L2's S*32
# slab tests puts break-even near n_c ~ 800-1000.
CROSS_2L_MIN_CHUNKS = 1024

CROSS_S = 24  # crossed-word slots per ray.  Covers every measured max
# (21 colonnade bounce, 19 atrium primary); rays crossing more words
# are flagged overflow and re-run through the wide pass, whose dense
# cross is exact at any incidence.


def _word_tables(ch):
    """Per-word union AABBs [W, 3]x2 (level 1) and the MXU bounds table
    [W, 192] = 32 chunks x (lo.xyz, hi.xyz) per word (level 2).  Pad
    chunks carry lo = hi = BIG (finite: +inf would turn the one-hot
    matmul's 0*inf products into NaN); level 2 masks pad bits by global
    chunk id, so the BIG box's measure-zero 'equal slab on all axes'
    crossing can never emit an out-of-range candidate."""
    n_c = ch.n_treelets
    w = -(-n_c // 32)
    pad = w * 32 - n_c
    cb = ch.treelet_bounds[:, :6]
    lo_pad = jnp.concatenate([cb[:, 0:3], jnp.full((pad, 3), jnp.inf)], 0)
    hi_pad = jnp.concatenate([cb[:, 3:6], jnp.full((pad, 3), -jnp.inf)], 0)
    bb_lo = lo_pad.reshape(w, 32, 3).min(axis=1)
    bb_hi = hi_pad.reshape(w, 32, 3).max(axis=1)
    tab = jnp.concatenate(
        [cb, jnp.full((pad, 6), BIG, jnp.float32)], 0
    ).reshape(w, 32 * 6)
    return bb_lo, bb_hi, tab


def cross_compact(ch, o, d, t_max, S: int = CROSS_S):
    """Two-level exact crossing cull.  Returns (words [N, S] u32,
    word_base [N, S] i32 (-32 pad), overflow [N] bool): bit j of words
    column s is set iff the ray EXACTLY crosses chunk word_base + j —
    identical bits to cross_words for every non-overflow ray, in the
    compacted layout extract_compact consumes."""
    n = o.shape[0]
    n_c = ch.n_treelets
    w = -(-n_c // 32)
    bb_lo, bb_hi, tab = _word_tables(ch)
    live = t_max > 0.0

    # Level 1: per-ray x word-box slab matrix [N, w].
    inv = [_safe_inv(d[:, a])[:, None] for a in range(3)]
    tn = jnp.zeros((n, 1), o.dtype)
    tf = t_max[:, None]
    for a in range(3):
        tn, tf = _slab_axis(
            bb_lo[None, :, a], bb_hi[None, :, a], o[:, a][:, None],
            inv[a], tn, tf,
        )
    crossed_w = (tn <= tf) & live[:, None]  # [N, w]

    # Pack word crossings and extract up to S word ids (ascending).
    w2 = -(-w // 32)
    pad_w = w2 * 32 - w
    if pad_w:
        crossed_w = jnp.concatenate(
            [crossed_w, jnp.zeros((n, pad_w), bool)], axis=1
        )
    bits32 = jax.lax.broadcasted_iota(jnp.uint32, (1, 1, 32), 2)
    ww = (
        (crossed_w.reshape(n, w2, 32).astype(jnp.uint32) << bits32)
        .sum(axis=2)
        .astype(jnp.uint32)
    )
    wlists = _extract_phase2(ww, None, S)  # [N, S] word ids, -1 pad
    overflow = crossed_w.sum(axis=1) > S

    # Level 2: each slot's 32 chunk bounds via one exact one-hot MXU
    # matmul ([N, w] @ [w, 192], HIGHEST precision — every output is a
    # single exact 1.0 * value product), then the exact per-chunk slab.
    w_ids = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    j32 = jax.lax.broadcasted_iota(jnp.int32, (1, 32), 1)
    comp_words, comp_base = [], []
    for s in range(S):
        ids = wlists[:, s]
        valid = ids >= 0
        oh = (ids[:, None] == w_ids).astype(jnp.float32)  # invalid -> 0
        g = jax.lax.dot_general(
            oh, tab, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        ).reshape(n, 32, 6)
        tn = jnp.zeros((n, 1), o.dtype)
        tf = t_max[:, None]
        for a in range(3):
            tn, tf = _slab_axis(
                g[:, :, a], g[:, :, 3 + a], o[:, a][:, None], inv[a],
                tn, tf,
            )
        in_range = (ids[:, None] * 32 + j32) < n_c
        cr = (tn <= tf) & valid[:, None] & live[:, None] & in_range
        comp_words.append(
            (cr.astype(jnp.uint32) << bits32[0]).sum(axis=1)
            .astype(jnp.uint32)
        )
        comp_base.append(jnp.where(valid, ids * 32, -32))
    return (
        jnp.stack(comp_words, axis=1),
        jnp.stack(comp_base, axis=1),
        overflow,
    )


def candidate_lists_2l(ch, o, d, t_max, C: int, S: int = CROSS_S):
    """Exact per-ray crossed-chunk lists via the two-level cull.
    Bitwise-identical lists to candidate_lists for non-overflow rays."""
    cw, cb2, ov1 = cross_compact(ch, o, d, t_max, S)
    lists, ov2 = extract_compact(cw, cb2, C)
    return lists, ov1 | ov2


def _var_roll(cat, sh):
    """Per-row variable left-rotate of [R, 2*LANES] by sh[R] in [0, LANES):
    seven static power-of-2 lane rolls gated by the shift bits.  This is
    how a per-row dynamic shift stays a dense VPU op."""
    for k in range(7):
        amt = 1 << k
        on = ((sh >> k) & 1)[:, None] == 1
        cat = jnp.where(on, jnp.roll(cat, -amt, axis=1), cat)
    return cat


def slot_layout(n: int, n_chunks: int, lists, C: int):
    """Cap-independent half of the slot build: ONE lax.sort groups
    candidates chunk-major and the aligned per-chunk offsets (and the
    wave's true slot demand) fall out of a cumsum.  Split from slot_fill
    so the caller can pick the slot-row budget TIER by the actual demand
    before paying the budget-proportional pack/kernel/merge costs.
    Returns (pos_s, seg, aligned_off, total_slots)."""
    total_cap = n * C
    keys = jnp.where(lists >= 0, lists, n_chunks).reshape(-1)
    pos = jnp.arange(total_cap, dtype=jnp.int32)
    keys_s, pos_s = jax.lax.sort((keys, pos), num_keys=1)

    seg = jnp.searchsorted(
        keys_s, jnp.arange(n_chunks + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    counts = seg[1:] - seg[:-1]
    aligned = -(-counts // LANES) * LANES
    aligned_off = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(aligned)]
    )
    return pos_s, seg, aligned_off, aligned_off[-1]


def slot_fill(n: int, n_chunks: int, pos_s, seg, aligned_off, C: int,
              max_rows: int):
    """Budget-dependent half of the slot build (see slot_layout).
    Returns (slot_pos [max_rows, 128] i32 (sentinel n*C when empty),
    row_chunk [max_rows] i32, valid [max_rows, 128] bool)."""
    total_cap = n * C
    total_slots = aligned_off[-1]
    g_tab = aligned_off[:-1] - seg[:-1]  # [Ch], nonnegative, nondecreasing
    row_off = aligned_off // LANES
    rows_iota = jnp.arange(max_rows, dtype=jnp.int32)
    row_chunk = jnp.clip(
        jnp.searchsorted(row_off, rows_iota, side="right").astype(jnp.int32)
        - 1,
        0,
        n_chunks - 1,
    )
    row_start = rows_iota * LANES - g_tab[row_chunk]
    seg_end = seg[row_chunk + 1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (max_rows, LANES), 1)
    valid = (
        (row_start[:, None] + lane < seg_end[:, None])
        & (rows_iota[:, None] * LANES < total_slots)
    )

    # Slot contents from pos_s: two row-gathers + variable roll.
    pos_rows = -(-total_cap // LANES)
    pos2d = jnp.concatenate(
        [pos_s, jnp.full((-total_cap) % LANES, total_cap, jnp.int32)]
    ).reshape(pos_rows, LANES)
    r0 = jnp.clip(row_start // LANES, 0, pos_rows - 1)
    r1 = jnp.clip(r0 + 1, 0, pos_rows - 1)
    cat = jnp.concatenate([pos2d[r0], pos2d[r1]], axis=1)
    slot_pos = _var_roll(cat, row_start % LANES)[:, :LANES]
    slot_pos = jnp.where(valid, slot_pos, total_cap)
    return slot_pos, row_chunk, valid


def build_slots(n: int, n_chunks: int, lists, C: int, max_rows: int):
    """Sorted chunk-major 128-aligned slot layout (layout + fill).

    Returns (slot_pos [max_rows, 128] i32 (sentinel n*C when empty),
    row_chunk [max_rows] i32, valid [max_rows, 128] bool, ok)."""
    pos_s, seg, aligned_off, total_slots = slot_layout(n, n_chunks, lists, C)
    ok = total_slots <= max_rows * LANES
    slot_pos, row_chunk, valid = slot_fill(
        n, n_chunks, pos_s, seg, aligned_off, C, max_rows
    )
    return slot_pos, row_chunk, valid, ok


PACK_RPR = 2  # rays per pack-table row (1 = legacy [N,128] layout).
# Row gathers are LATENCY-bound at ~15 ns/row from a [262144, 128]
# table but ~6.7 ns/row once the table is <= [131072, 128]
# (benchmarks/r3_packshapes.py) — packing rays 2-per-row halves the
# table at the cost of one masked lane-roll on the gathered stream.
# On-chip sweep (benchmarks/r3_packsweep.py, r3 combined waves):
# rpr=2 beats 1/4/8 at BOTH production scales (262k: 17.8 vs
# 23.3/22.7/26.8 ms; 786k combined: 33.6 vs 48.6/45.5/58.3).


def _pack_stream(o, d, t_max, slot_ray, valid, max_rows, extra=None,
                 rpr: int | None = None):
    """Ray planes -> plane-major stream [max_rows*8, 128] via ONE wide
    row-gather (the only fast gather shape on this chip): PACK_RPR rays
    of 8 floats live per [*, 128] table row (o xyz, d xyz, t, extra);
    slots gather whole rows and rotate their ray's 8-float block to the
    front with log2(PACK_RPR) masked lane-rolls.  ``extra`` ([n] f32,
    e.g. the occlusion skip-light plane) rides float 7.
    ``rpr`` overrides PACK_RPR (bench sweeps; production uses the
    default)."""
    n = o.shape[0]
    rpr = PACK_RPR if rpr is None else rpr
    p8 = jnp.concatenate(
        [o, d, t_max[:, None],
         (jnp.zeros((n, 1), o.dtype) if extra is None
          else extra[:, None].astype(o.dtype))],
        axis=1,
    )  # [n, 8]
    flat_ray = jnp.where(valid, slot_ray, 0).reshape(-1)
    if rpr == 1:
        tab = jnp.concatenate(
            [p8, jnp.zeros((n, LANES - 8), o.dtype)], axis=1
        )
        stream = tab[flat_ray][:, :8]  # [max_rows*128, 8]
    else:
        npad = -(-n // rpr) * rpr
        if npad != n:
            p8 = jnp.concatenate(
                [p8, jnp.zeros((npad - n, 8), o.dtype)], axis=0
            )
        tab = p8.reshape(npad // rpr, rpr * 8)
        if rpr * 8 < LANES:
            tab = jnp.concatenate(
                [tab, jnp.zeros((npad // rpr, LANES - rpr * 8), o.dtype)],
                axis=1,
            )
        rows = tab[flat_ray // rpr]  # [slots, 128]
        sh = (flat_ray % rpr) * 8
        k = 3
        while (1 << k) < rpr * 8:
            amt = 1 << k
            on = ((sh >> k) & 1)[:, None] == 1
            rows = jnp.where(on, jnp.roll(rows, -amt, axis=1), rows)
            k += 1
        stream = rows[:, :8]
    planes = stream.reshape(max_rows, LANES, 8).transpose(0, 2, 1)
    # Dead lanes (invalid slots) carry t = -1.
    planes = planes.at[:, 6, :].set(
        jnp.where(valid, planes[:, 6, :], -1.0)
    )
    return planes.reshape(max_rows * 8, LANES)


def closest_walk(tri_ref, ox, oy, oz, dx, dy, dz, ts0, det0, prim0,
                 *, leaf_size, skip=None):
    """Walk one chunk's triangle block for a (1,128) ray group carrying a
    SCALED closest hit (ts, det, prim) with t = ts/det, det > 0.
    8 triangles per VPU op.

    Round-3 compute cuts (the slot kernel was measured compute-bound at
    ~60 VPU ops/pair): the per-ray shear setup + 1/dz divide hoist out of
    the triangle loop (_ray_shear), the per-step 1/det divide and
    cross-sublane winner reduction are gone — each SUBLANE carries its own
    scaled best, compared by cross-multiplication, and one tournament
    (_scaled_min8) resolves the block at the end.  The caller performs
    the single ts/det divide per ray outside the loop.

    ``skip`` ((1,128) f32 plane or None): triangles whose area-light id
    (tris col 9) equals the lane's skip value are ignored — the
    reference's sampled-light exclusion (bvh.rs:287-293) so ONE walk can
    serve combined closest + shadow-occlusion waves (shadow lanes set
    their light id, closest lanes -2 which matches nothing)."""
    pre = _ray_shear(dx, dy, dz)
    shape8 = (8, LANES)
    carry0 = (
        jnp.broadcast_to(ts0, shape8),
        jnp.broadcast_to(det0, shape8),
        jnp.broadcast_to(prim0, shape8),
    )

    def step(g, carry):
        ts_b, det_b, prim_b = carry
        blk = tri_ref[pl.ds(g * 8, 8), :]  # (8, 128): 8 triangles
        cols = [blk[:, c : c + 1] for c in range(9)]
        ok, ts_c, det_c = _watertight_scaled(pre, ox, oy, oz, cols)
        pid = blk[:, 10:11]
        closer = ok & (pid >= 0.0) & (ts_c * det_b < ts_b * det_c)
        if skip is not None:
            closer = closer & (blk[:, 9:10] != skip)
        pid_b = jnp.broadcast_to(pid, shape8)
        return (
            jnp.where(closer, ts_c, ts_b),
            jnp.where(closer, det_c, det_b),
            jnp.where(closer, pid_b, prim_b),
        )

    ts, det, prim = jax.lax.fori_loop(0, leaf_size // 8, step, carry0)
    return _scaled_min8(ts, det, prim)


def any_walk(tri_ref, ox, oy, oz, dx, dy, dz, tm, skip, occ0, crossing,
             *, leaf_size):
    """Early-exit occlusion walk of one chunk's triangles: done the moment
    every crossing lane is occluded (bvh.rs:235-302's first-hit return).
    Divide-free: occlusion needs only the hit predicate, so the scaled
    test plus one cross-multiplied upper bound replaces _watertight's
    per-step 1/det (and its two wasted barycentric multiplies)."""
    pre = _ray_shear(dx, dy, dz)
    crossing_i = crossing.astype(jnp.int32)

    def cond(s):
        g, done, _ = s
        return (g < leaf_size // 8) & (done == 0)

    def body(s):
        g, _, occ = s
        blk = tri_ref[pl.ds(g * 8, 8), :]
        cols = [blk[:, c : c + 1] for c in range(9)]
        ok, ts, det = _watertight_scaled(pre, ox, oy, oz, cols)
        hit = ok & (ts <= tm * det)
        light = blk[:, 9:10]
        pid = blk[:, 10:11]
        blocked = hit & (light != skip) & (pid >= 0.0)
        occ = occ | jnp.max(blocked.astype(jnp.int32), axis=0, keepdims=True)
        still = jnp.any(crossing_i > occ)
        return g + 1, jnp.where(still, 0, 1), occ

    _, _, occ = jax.lax.while_loop(cond, body, (0, 0, occ0))
    return occ


QUAD = 4  # slot rows per grid step: quadruple per-step compute so the
# next step's four 64KB triangle-block DMAs hide behind it (measured
# ~0.9 us/step pipeline stall at one row per step)


def _closest_kernel(rc_ref, *refs, leaf_size, quad=QUAD, with_skip=False):
    # Out sublanes per slot row: 0 = scaled ts, 1 = prim, 2 = det (> 0);
    # the caller divides ts/det ONCE per slot in XLA (closest_walk
    # docstring) instead of the kernel dividing every step.
    # with_skip: plane 7 carries a per-lane area-light id to ignore
    # (combined closest+shadow waves; see closest_walk).
    tris, (rp_ref, out_ref) = refs[:quad], refs[quad:]
    for i in range(quad):
        b = 8 * i
        ox = rp_ref[b : b + 1, :]
        oy = rp_ref[b + 1 : b + 2, :]
        oz = rp_ref[b + 2 : b + 3, :]
        dx = rp_ref[b + 3 : b + 4, :]
        dy = rp_ref[b + 4 : b + 5, :]
        dz = rp_ref[b + 5 : b + 6, :]
        tm = rp_ref[b + 6 : b + 7, :]
        sk = rp_ref[b + 7 : b + 8, :] if with_skip else None

        out_ref[b : b + 1, :] = tm
        out_ref[b + 1 : b + 2, :] = jnp.full(tm.shape, -1.0, jnp.float32)
        out_ref[b + 2 : b + 3, :] = jnp.ones(tm.shape, jnp.float32)
        out_ref[b + 3 : b + 8, :] = jnp.zeros((5, LANES), jnp.float32)

        @pl.when(jnp.any(tm > 0.0))
        def _(i=i, ox=ox, oy=oy, oz=oz, dx=dx, dy=dy, dz=dz, tm=tm, b=b,
              sk=sk):
            ts_b, det_b, prim_b = closest_walk(
                tris[i], ox, oy, oz, dx, dy, dz,
                jnp.maximum(tm, 0.0),
                jnp.ones(tm.shape, jnp.float32),
                jnp.full(tm.shape, -1.0, jnp.float32),
                leaf_size=leaf_size, skip=sk,
            )
            out_ref[b : b + 1, :] = ts_b
            out_ref[b + 1 : b + 2, :] = prim_b
            out_ref[b + 2 : b + 3, :] = det_b


def _any_kernel(rc_ref, *refs, leaf_size, quad=QUAD):
    tris, (rp_ref, occ_ref) = refs[:quad], refs[quad:]
    for i in range(quad):
        b = 8 * i
        ox = rp_ref[b : b + 1, :]
        oy = rp_ref[b + 1 : b + 2, :]
        oz = rp_ref[b + 2 : b + 3, :]
        dx = rp_ref[b + 3 : b + 4, :]
        dy = rp_ref[b + 4 : b + 5, :]
        dz = rp_ref[b + 5 : b + 6, :]
        tm = rp_ref[b + 6 : b + 7, :]
        skip = rp_ref[b + 7 : b + 8, :]

        occ_ref[b : b + 8, :] = jnp.zeros((8, LANES), jnp.int32)

        @pl.when(jnp.any(tm > 0.0))
        def _(i=i, ox=ox, oy=oy, oz=oz, dx=dx, dy=dy, dz=dz, tm=tm,
              skip=skip, b=b):
            crossing = tm > 0.0
            occ = any_walk(
                tris[i], ox, oy, oz, dx, dy, dz, tm, skip,
                jnp.zeros(tm.shape, jnp.int32), crossing,
                leaf_size=leaf_size,
            )
            occ_ref[b : b + 1, :] = occ


def _max_rows(n: int, C: int, n_chunks: int, mult: int) -> int:
    """Static slot-row budget: `mult`x rays of real pairs (colonnade
    means: primary 5.8, bounce 3.5, shadow 2.2 per ray) plus worst-case
    per-chunk 128-alignment padding."""
    slots = mult * n + n_chunks * LANES
    return -(-slots // (8 * LANES)) * 8


def _tier_mults(mult, mult_wide):
    """Normalize (mult, mult_wide) into an ascending tier list: `mult`
    may be an int or a tuple of ints (extra LOW tiers for the overflow
    re-run, whose rows-branch-origin rays need ~1/5 the budget)."""
    ms = list(mult) if isinstance(mult, (tuple, list)) else [mult]
    if mult_wide is not None and mult_wide > ms[-1]:
        ms.append(mult_wide)
    return ms


def _run_tiered(tier, tiers_rows, total_slots):
    """Dispatch to the cheapest tier whose static budget covers the
    wave's true aligned slot demand (nested lax.cond; budget-
    proportional pack/kernel/merge run at the selected size only)."""
    def pick(i):
        if i == len(tiers_rows) - 1:
            return tier(tiers_rows[i])
        return lambda _: jax.lax.cond(
            total_slots <= tiers_rows[i] * LANES,
            tier(tiers_rows[i]), pick(i + 1), None,
        )
    return pick(0)(None)


def _run_kernel(kernel, ch, row_chunk, packed, max_rows, out_dtype,
                interpret, quad: int = QUAD):
    k = ch.leaf_size

    def tri_spec(i):
        return pl.BlockSpec(
            (k, 128), lambda p, rc, i=i: (rc[quad * p + i], 0)
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(max_rows // quad,),
        in_specs=[tri_spec(i) for i in range(quad)]
        + [pl.BlockSpec((8 * quad, LANES), lambda p, rc: (p, 0))],
        out_specs=[pl.BlockSpec((8 * quad, LANES), lambda p, rc: (p, 0))],
    )
    (out,) = pl.pallas_call(
        functools.partial(kernel, leaf_size=k, quad=quad),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((max_rows * 8, LANES), out_dtype)],
        interpret=interpret,
    )(row_chunk, *([ch.tris_padded] * quad), packed)
    return out.reshape(max_rows, 8, LANES)


def _recompute_bary(shading_packed, o, d, t, prim):
    """Winner-triangle barycentrics from the packed shading row — cheaper
    than carrying b0/b1 through the slot merge (one [N, 32] row-gather +
    a dense watertight pass on exactly one triangle per ray)."""
    from ..gathers import rowgather

    row = rowgather(shading_packed, jnp.maximum(prim, 0))
    cols = [row[:, c] for c in range(9)]
    hit_mask = prim >= 0
    t_cur = jnp.where(hit_mask, t * 1.0001 + 1e-6, 0.0)
    _, _, b0, b1 = _watertight(
        o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2], t_cur, cols
    )
    return (
        jnp.where(hit_mask, b0, 0.0),
        jnp.where(hit_mask, b1, 0.0),
    )


def stream_closest_w(ch, words, o, d, t_max, C: int = C_MAIN,
                     mult: int = 6, mult_wide: int | None = None,
                     interpret: bool = False, skip=None):
    """Closest hit over the exact incidence stream, from precomputed
    crossing words (dense [N, W] layout; extracts lists then defers to
    stream_closest_l)."""
    lists, overflow = extract_lists(words, C)
    return stream_closest_l(
        ch, lists, overflow, o, d, t_max, C=C, mult=mult,
        mult_wide=mult_wide, interpret=interpret, skip=skip,
    )


def stream_closest_l(ch, lists, overflow, o, d, t_max, C: int = C_MAIN,
                     mult: int = 6, mult_wide: int | None = None,
                     interpret: bool = False, quad: int = QUAD,
                     skip=None):
    """Closest hit over the exact incidence stream, from extracted
    candidate lists [N, C] (-1 pad, ascending chunk id).

    Returns (t, prim, overflow, ok): `overflow` marks rays whose candidate
    list exceeded C (their results may MISS hits — the caller re-runs them
    wider); `ok` False means the slot budget overflowed and the whole wave
    must fall back.  Barycentrics are NOT computed here — the caller
    recomputes them once for final winners (_recompute_bary).

    TIERED BUDGET (round 3): pack/kernel/merge all cost proportional to
    the STATIC slot-row budget, and the build-time estimate must cover
    p95 waves, so typical waves overpaid ~2x (measured: true bounce
    incidence 3.45 slots/ray vs a 9.7 budget).  slot_layout exposes the
    wave's true demand before any budget-proportional work; a lax.cond
    then runs the tight tier (`mult`) and only spills to `mult_wide`
    when the wave actually needs it."""
    n = o.shape[0]
    n_c = ch.n_treelets

    pos_s, seg, aligned_off, total_slots = slot_layout(n, n_c, lists, C)

    def tier(max_rows):
        def run(_):
            slot_pos, row_chunk, valid = slot_fill(
                n, n_c, pos_s, seg, aligned_off, C, max_rows
            )
            slot_ray = jnp.where(valid, slot_pos // C, 0)
            packed = _pack_stream(o, d, t_max, slot_ray, valid, max_rows,
                                  extra=skip)
            kern = (functools.partial(_closest_kernel, with_skip=True)
                    if skip is not None else _closest_kernel)
            out = _run_kernel(
                kern, ch, row_chunk, packed, max_rows,
                jnp.float32, interpret, quad=quad,
            )

            # ONE divide per slot resolves the scaled (ts, det) carry.
            slot_t = out[:, 0, :] / out[:, 2, :]
            slot_prim = out[:, 1, :]
            hitv = valid & (slot_prim >= 0.0)
            pos_flat = jnp.where(hitv, slot_pos, n * C).reshape(-1)
            # Positions are unique (one slot per candidate) — plain set
            # scatters.  Sentinel position n*C is out of bounds ->
            # genuinely dropped, so the unique-indices promise holds for
            # the surviving writes.
            tmat = (
                jnp.full(n * C, F32_MAX)
                .at[pos_flat]
                .set(jnp.where(hitv, slot_t, F32_MAX).reshape(-1),
                     mode="drop", unique_indices=True)
                .reshape(n, C)
            )
            pmat = (
                jnp.full(n * C, BIG)
                .at[pos_flat]
                .set(jnp.where(hitv, slot_prim, BIG).reshape(-1),
                     mode="drop", unique_indices=True)
                .reshape(n, C)
            )
            t_win = tmat.min(axis=1)
            # Lowest prim id among exact-t ties (deterministic).
            prim_w = jnp.where(tmat == t_win[:, None], pmat, BIG).min(axis=1)
            hit = t_win < F32_MAX
            t_out = jnp.where(hit, t_win, t_max)
            prim = jnp.where(hit, prim_w, -1.0).astype(jnp.int32)
            return t_out, prim
        return run

    tiers_rows = [_max_rows(n, C, n_c, m) for m in _tier_mults(mult, mult_wide)]
    ok = total_slots <= tiers_rows[-1] * LANES
    t_out, prim = _run_tiered(tier, tiers_rows, total_slots)
    return t_out, prim, overflow, ok


@functools.partial(
    jax.jit, static_argnames=("C", "mult", "mult_wide", "interpret")
)
def stream_closest(ch, shading_packed, o, d, t_max, C: int = C_MAIN,
                   mult: int = 6, mult_wide: int | None = None,
                   interpret: bool = False, skip=None):
    """Standalone slot-stream closest hit (computes words + bary)."""
    words = cross_words(ch, o, d, t_max)
    t, prim, overflow, ok = stream_closest_w(
        ch, words, o, d, t_max, C=C, mult=mult, mult_wide=mult_wide,
        interpret=interpret, skip=skip,
    )
    b0, b1 = _recompute_bary(shading_packed, o, d, t, prim)
    return t, prim, b0, b1, overflow, ok


def stream_any_w(ch, words, o, d, t_max, skip_light, C: int = C_MAIN,
                 mult: int = 5, mult_wide: int | None = None,
                 interpret: bool = False):
    """Occlusion over the exact incidence stream, from precomputed
    crossing words (dense layout; extracts then defers to stream_any_l)."""
    lists, overflow = extract_lists(words, C)
    return stream_any_l(
        ch, lists, overflow, o, d, t_max, skip_light, C=C, mult=mult,
        mult_wide=mult_wide, interpret=interpret,
    )


def stream_any_l(ch, lists, overflow, o, d, t_max, skip_light,
                 C: int = C_MAIN, mult: int = 5,
                 mult_wide: int | None = None, interpret: bool = False,
                 quad: int = QUAD):
    """Occlusion over the exact incidence stream, from extracted candidate
    lists.  Returns (occluded, overflow, ok); overflow rays may report
    unoccluded falsely and must be re-checked by the caller.  Tiered
    slot-row budget like stream_closest_l."""
    n = o.shape[0]
    n_c = ch.n_treelets

    pos_s, seg, aligned_off, total_slots = slot_layout(n, n_c, lists, C)

    def tier(max_rows):
        def run(_):
            slot_pos, row_chunk, valid = slot_fill(
                n, n_c, pos_s, seg, aligned_off, C, max_rows
            )
            slot_ray = jnp.where(valid, slot_pos // C, 0)
            # skip plane rides float 7 of the pack.
            packed = _pack_stream(
                o, d, t_max, slot_ray, valid, max_rows,
                extra=skip_light.astype(jnp.float32),
            )

            occ = _run_kernel(
                _any_kernel, ch, row_chunk, packed, max_rows, jnp.int32,
                interpret, quad=quad,
            )
            occ_slot = (occ[:, 0, :] > 0) & valid
            bucket = jnp.where(occ_slot, slot_ray, n).reshape(-1)
            occ_ray = (
                jnp.zeros(n + 1, jnp.int32)
                .at[bucket]
                .max(occ_slot.astype(jnp.int32).reshape(-1), mode="drop")
            )
            return occ_ray[:n] > 0
        return run

    tiers_rows = [_max_rows(n, C, n_c, m) for m in _tier_mults(mult, mult_wide)]
    ok = total_slots <= tiers_rows[-1] * LANES
    occ_out = _run_tiered(tier, tiers_rows, total_slots)
    return occ_out, overflow, ok


@functools.partial(
    jax.jit, static_argnames=("C", "mult", "mult_wide", "interpret")
)
def stream_any(ch, o, d, t_max, skip_light, C: int = C_MAIN,
               mult: int = 5, mult_wide: int | None = None,
               interpret: bool = False):
    """Standalone slot-stream occlusion (computes words internally)."""
    words = cross_words(ch, o, d, t_max)
    return stream_any_w(
        ch, words, o, d, t_max, skip_light, C=C, mult=mult,
        mult_wide=mult_wide, interpret=interpret,
    )
