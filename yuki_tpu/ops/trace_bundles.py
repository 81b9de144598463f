"""Sublane-bundle slot traversal — the divergent-wave engine, round 3.

The per-ray slot stream (trace_stream.py) pays its pipeline costs per
(ray, chunk) pair: the candidate extraction, the chunk-major sort, and
above all the pack row-gather (measured 51 ms of a 128 ms bounce call)
all scale with ray-slots.  This engine regroups the SAME kernels around
bundles of `bun` consecutive *sorted* rays (bun in {2,4,8,16}; the
production defaults are B=4 for closest-hit and B=8 for occlusion,
SceneMeta.bun_closest/bun_any):

  - slot unit = (bundle, chunk); 128/bun bundle-slots per 128-lane row
  - candidates per BUNDLE: OR of the bundle rays' exact crossing words
    (measured colonnade bounce at B=8: 12.2/bundle vs 3.45/ray ->
    2.3x fewer pairs, so extraction + sort shrink ~2-4x)
  - pack gathers ONE 128-wide row per bundle-slot instead of one per
    ray-slot: bun-times fewer gathers on the dominant pack term
  - the Pallas kernels (closest/any walk) run UNCHANGED: a slot row is
    still 128 lanes x one chunk; lanes just belong to 128/bun bundles

Cost trade: each bundle-slot tests all bun rays against the chunk even
when only some cross (measured test amplification x1.8-2.1 at B=4 /
x2.6-3.3 at B=8 on bounce waves after the direction-bit sort key,
x1.1-1.6 on occlusion ones) — kernel time rises, everything else
falls; per-query bundle sizes pick each side of the trade.

Correctness under the OR-superset: any triangle a ray can hit within
[0, t_max] lies inside a chunk whose AABB the ray's EXACT slab test
crosses (tri is contained in the chunk box, so the hit point witnesses
the slab overlap).  Extra superset chunks therefore contribute no new
accepted hits — per-ray results are bitwise identical to the exact
per-ray stream, and independent of bundle composition (same argument
that makes the row-union engine partition-invariant, test_parallel.py).

Reference parity: this replaces the per-ray front-to-back BVH walk of
yuki/src/bvh.rs:160-302 for incoherent waves.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .trace import F32_MAX, LANES
from .trace_stream import (
    BIG,
    _any_kernel,
    _closest_kernel,
    _run_kernel,
    extract_lists,
)

BUN = 8  # default rays per bundle = one sublane group.  Every entry
# point below also takes bun=4 (or 2): smaller bundles trade fewer
# shared-candidate kernel tests (colonnade bounce amp x2.25 at B=4 vs
# x3.46 at B=8, benchmarks/r3_bunsize.py) for more bundle rows; the
# right value per query type is picked on-chip.
SPR = LANES // BUN  # bundle-slots per 128-lane slot row (at default BUN)
C_BUN = 96  # candidates per bundle.  Sized from CPU bounce-growth waves
# (benchmarks/r3_bounce_growth.py): at C=48 late atrium bounces overflow
# ~6% of bundles (~13k rays at 262k production waves — above OV_SMALL,
# near OV_CAP, i.e. the expensive wide pass EVERY call and occasional
# whole-wave treelet fallbacks); at C=96 overflow is 0.17% worst-case
# (~450 rays -> the cheap OV_SMALL tier).  Extraction is O(C) but runs
# on n/8 bundle rows, so C=96 here costs about what C=16 per-ray did.



def _auto_wc(w: int) -> int | None:
    """Two-phase extraction cap for wide-word scenes: bundles never
    cross more than ~26 distinct words (measured max, colonnade+atrium,
    B=4/8 — benchmarks + /tmp wc stats recorded in ARCHITECTURE.md), so
    compacting to 32 nonzero words first cuts extract ops ~1.75x at
    W=123 with zero added truncation overflow; bundles beyond the cap
    are flagged and re-run through the wide pass like any overflow."""
    return 32 if w > 48 else None


def bundle_words(words, bun: int = BUN):
    """Per-ray crossing words [N, W] -> per-bundle OR words [N//bun, W]."""
    n, w = words.shape
    return jax.lax.reduce(
        words.reshape(n // bun, bun, w),
        jnp.uint32(0),
        jax.lax.bitwise_or,
        (1,),
    )


def bundle_slot_layout(n_b: int, n_chunks: int, lists, C: int,
                       spr: int = SPR):
    """Chunk-major bundle-slot layout: ONE lax.sort groups (bundle,
    chunk) candidates chunk-major; per-chunk runs align to spr slots so
    every slot ROW serves a single chunk (the kernels' contract).
    Returns (pos_s, seg, aligned_off, total_slots[bundle-slot units])."""
    total_cap = n_b * C
    keys = jnp.where(lists >= 0, lists, n_chunks).reshape(-1)
    pos = jnp.arange(total_cap, dtype=jnp.int32)
    keys_s, pos_s = jax.lax.sort((keys, pos), num_keys=1)
    seg = jnp.searchsorted(
        keys_s, jnp.arange(n_chunks + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    counts = seg[1:] - seg[:-1]
    aligned = -(-counts // spr) * spr
    aligned_off = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(aligned)]
    )
    return pos_s, seg, aligned_off, aligned_off[-1]


def _var_rollp(cat, sh, spr):
    """Per-row variable left-rotate of [R, 2*spr] by sh[R] in [0, spr):
    log2(spr) static power-of-2 rolls gated by the shift bits (the
    power-of-two sibling of trace_stream._var_roll)."""
    for k in range(spr.bit_length() - 1):
        amt = 1 << k
        on = ((sh >> k) & 1)[:, None] == 1
        cat = jnp.where(on, jnp.roll(cat, -amt, axis=1), cat)
    return cat


def bundle_slot_fill(n_b: int, n_chunks: int, pos_s, seg, aligned_off,
                     C: int, max_rows: int, spr: int = SPR):
    """Budget-dependent half of the bundle-slot build.
    Returns (slot_pos [max_rows, spr] i32 (sentinel n_b*C when empty),
    row_chunk [max_rows] i32, valid [max_rows, spr] bool)."""
    total_cap = n_b * C
    total_slots = aligned_off[-1]
    g_tab = aligned_off[:-1] - seg[:-1]
    row_off = aligned_off // spr
    rows_iota = jnp.arange(max_rows, dtype=jnp.int32)
    row_chunk = jnp.clip(
        jnp.searchsorted(row_off, rows_iota, side="right").astype(jnp.int32)
        - 1,
        0,
        n_chunks - 1,
    )
    row_start = rows_iota * spr - g_tab[row_chunk]
    seg_end = seg[row_chunk + 1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (max_rows, spr), 1)
    valid = (
        (row_start[:, None] + lane < seg_end[:, None])
        & (rows_iota[:, None] * spr < total_slots)
    )

    pos_rows = -(-total_cap // spr)
    pos2d = jnp.concatenate(
        [pos_s, jnp.full((-total_cap) % spr, total_cap, jnp.int32)]
    ).reshape(pos_rows, spr)
    r0 = jnp.clip(row_start // spr, 0, pos_rows - 1)
    r1 = jnp.clip(r0 + 1, 0, pos_rows - 1)
    cat = jnp.concatenate([pos2d[r0], pos2d[r1]], axis=1)
    slot_pos = _var_rollp(cat, row_start % spr, spr)[:, :spr]
    slot_pos = jnp.where(valid, slot_pos, total_cap)
    return slot_pos, row_chunk, valid


def _bundle_table(o, d, t_max, extra, bun: int = BUN):
    """Ray planes -> bundle-major table [n_b, 128]: column p*bun + r is
    plane p of the bundle's ray r (8*bun live columns, padded to the
    fast 128-wide row-gather shape)."""
    n = o.shape[0]
    planes = [
        o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2], t_max,
        jnp.zeros_like(t_max) if extra is None
        else extra.astype(jnp.float32),
    ]
    tab = jnp.stack(planes, axis=1)  # [n, 8]
    tab = (
        tab.reshape(n // bun, bun, 8)
        .transpose(0, 2, 1)
        .reshape(n // bun, 8 * bun)
    )
    if 8 * bun == LANES:
        return tab
    return jnp.concatenate(
        [tab, jnp.zeros((n // bun, LANES - 8 * bun), tab.dtype)], axis=1
    )


def _pack_bundles(tab, slot_bun, valid, max_rows, bun: int = BUN,
                  spr: int = SPR):
    """Bundle table -> plane-major kernel stream [max_rows*8, 128] via
    ONE row-gather per bundle-slot (bun-times fewer than per-ray
    packing).  Dead slots carry t = -1 on every lane."""
    flat = jnp.where(valid, slot_bun, 0).reshape(-1)
    g = tab[flat][:, : 8 * bun]  # [max_rows*spr, 8*bun]
    planes = (
        g.reshape(max_rows, spr, 8, bun)
        .transpose(0, 2, 1, 3)
        .reshape(max_rows, 8, LANES)
    )
    valid_lane = jnp.repeat(valid, bun, axis=1)  # [max_rows, 128]
    planes = planes.at[:, 6, :].set(
        jnp.where(valid_lane, planes[:, 6, :], -1.0)
    )
    return planes.reshape(max_rows * 8, LANES)


def _max_rows_b(n_b: int, C: int, n_chunks: int, mult: int,
                spr: int = SPR) -> int:
    """Static bundle-slot-row budget: `mult` candidates per bundle on
    average plus worst-case per-chunk spr alignment padding."""
    slots = mult * n_b + n_chunks * spr
    return -(-slots // (8 * spr)) * 8


def _scaled_fold(C: int, ts, det, prim):
    """Reduce [n_b, C, BUN] scaled-hit triples over the C axis: smallest
    ts/det wins, lowest prim id among exact ties (both by
    cross-multiplication — no divides)."""
    b_ts, b_det, b_prim = ts[:, 0], det[:, 0], prim[:, 0]
    for c in range(1, C):
        c_ts, c_det, c_prim = ts[:, c], det[:, c], prim[:, c]
        lhs = c_ts * b_det
        rhs = b_ts * c_det
        closer = (lhs < rhs) | ((lhs == rhs) & (c_prim < b_prim))
        b_ts = jnp.where(closer, c_ts, b_ts)
        b_det = jnp.where(closer, c_det, b_det)
        b_prim = jnp.where(closer, c_prim, b_prim)
    return b_ts, b_det, b_prim


def bundles_closest_w(ch, bwords, o, d, t_max, C: int = C_BUN,
                      mult: int = 18, mult_wide: int | None = None,
                      interpret: bool = False, bun: int = BUN):
    """Closest hit over the bundle-slot stream, from per-bundle OR'd
    crossing words [n//bun, W].  Same contract as stream_closest_w:
    returns (t, prim, overflow[n], ok) — overflow marks every ray of a
    bundle whose candidate list exceeded C; ok False means the slot
    budget blew and the wave must fall back.  Tiered budget like
    stream_closest_w (tight tier unless the wave's true demand spills)."""
    n = o.shape[0]
    n_b = n // bun
    spr = LANES // bun
    n_c = ch.n_treelets

    lists, ov_b = extract_lists(bwords, C, wc=_auto_wc(bwords.shape[1]))
    pos_s, seg, aligned_off, total_slots = bundle_slot_layout(
        n_b, n_c, lists, C, spr
    )
    tab = _bundle_table(o, d, t_max, None, bun)

    def tier(max_rows):
        def run(_):
            slot_pos, row_chunk, valid = bundle_slot_fill(
                n_b, n_c, pos_s, seg, aligned_off, C, max_rows, spr
            )
            slot_bun = jnp.where(valid, slot_pos // C, 0)
            packed = _pack_bundles(tab, slot_bun, valid, max_rows, bun, spr)
            out = _run_kernel(
                _closest_kernel, ch, row_chunk, packed, max_rows,
                jnp.float32, interpret,
            )
            # Scaled triples stay scaled through the merge; ONE divide
            # per ray at the very end (vs one per slot in the per-ray
            # stream).
            ts = out[:, 0, :].reshape(max_rows, spr, bun)
            det = out[:, 2, :].reshape(max_rows, spr, bun)
            prim = out[:, 1, :].reshape(max_rows, spr, bun)
            miss = ~valid[..., None] | (prim < 0.0)
            ts = jnp.where(miss, F32_MAX, ts)
            det = jnp.where(miss, 1.0, det)
            prim = jnp.where(miss, BIG, prim)
            pos_flat = jnp.where(valid, slot_pos, n_b * C).reshape(-1)
            # Row scatters at bundle-slot granularity (unique positions;
            # sentinel row n_b*C dropped).
            def scat(v, fill):
                return (
                    jnp.full((n_b * C, bun), fill)
                    .at[pos_flat]
                    .set(v.reshape(-1, bun), mode="drop",
                         unique_indices=True)
                    .reshape(n_b, C, bun)
                )
            tmat = scat(ts, F32_MAX)
            dmat = scat(det, 1.0)
            pmat = scat(prim, BIG)
            b_ts, b_det, b_prim = _scaled_fold(C, tmat, dmat, pmat)
            hit = b_prim < BIG
            t_out = jnp.where(hit, b_ts / b_det, t_max.reshape(n_b, bun))
            prim_out = jnp.where(hit, b_prim, -1.0).astype(jnp.int32)
            return t_out.reshape(n), prim_out.reshape(n)
        return run

    rows_a = _max_rows_b(n_b, C, n_c, mult, spr)
    ok_a = total_slots <= rows_a * spr
    if mult_wide is not None and mult_wide > mult:
        rows_b = _max_rows_b(n_b, C, n_c, mult_wide, spr)
        ok = total_slots <= rows_b * spr
        t_out, prim = jax.lax.cond(ok_a, tier(rows_a), tier(rows_b), None)
    else:
        ok = ok_a
        t_out, prim = tier(rows_a)(None)
    overflow = jnp.repeat(ov_b, bun)
    return t_out, prim, overflow, ok


def bundles_any_w(ch, bwords, o, d, t_max, skip_light, C: int = C_BUN,
                  mult: int = 14, mult_wide: int | None = None,
                  interpret: bool = False, bun: int = BUN):
    """Occlusion over the bundle-slot stream (per-bundle OR'd words).
    Returns (occluded[n], overflow[n], ok) — stream_any_w contract."""
    n = o.shape[0]
    n_b = n // bun
    spr = LANES // bun
    n_c = ch.n_treelets

    lists, ov_b = extract_lists(bwords, C, wc=_auto_wc(bwords.shape[1]))
    pos_s, seg, aligned_off, total_slots = bundle_slot_layout(
        n_b, n_c, lists, C, spr
    )
    tab = _bundle_table(o, d, t_max, skip_light, bun)

    def tier(max_rows):
        def run(_):
            slot_pos, row_chunk, valid = bundle_slot_fill(
                n_b, n_c, pos_s, seg, aligned_off, C, max_rows, spr
            )
            slot_bun = jnp.where(valid, slot_pos // C, 0)
            packed = _pack_bundles(tab, slot_bun, valid, max_rows, bun, spr)
            occ = _run_kernel(
                _any_kernel, ch, row_chunk, packed, max_rows, jnp.int32,
                interpret,
            )
            occ_rows = occ[:, 0, :].reshape(max_rows, spr, bun)
            occ_rows = jnp.where(valid[..., None], occ_rows, 0)
            # Scatter-max per bundle row (duplicate bundle targets are
            # fine under max).
            flat = jnp.where(valid, slot_bun, n_b).reshape(-1)
            occ_b = (
                jnp.zeros((n_b + 1, bun), jnp.int32)
                .at[flat]
                .max(occ_rows.reshape(-1, bun), mode="drop")
            )
            return occ_b[:n_b].reshape(n) > 0
        return run

    rows_a = _max_rows_b(n_b, C, n_c, mult, spr)
    ok_a = total_slots <= rows_a * spr
    if mult_wide is not None and mult_wide > mult:
        rows_b = _max_rows_b(n_b, C, n_c, mult_wide, spr)
        ok = total_slots <= rows_b * spr
        occ_out = jax.lax.cond(ok_a, tier(rows_a), tier(rows_b), None)
    else:
        ok = ok_a
        occ_out = tier(rows_a)(None)
    overflow = jnp.repeat(ov_b, bun)
    return occ_out, overflow, ok
