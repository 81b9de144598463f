"""Fused two-level cull + candidate extraction — one Pallas kernel.

The production slot path built its per-ray candidate lists through four
XLA stages (cross_compact L1 slab, S one-hot MXU gathers + L2 slabs,
word compaction, C lowest-set-bit extractions), every one of which
streams [N, W]-to-[N, S*32]-sized intermediates through HBM — measured
~40-60 ms per 262k-ray call on the colonnade and ~2.6x that on the
atrium (W=123), the dominant per-call term after the round-3 OV fix
(benchmarks/r3_stage2.py).  This kernel runs the whole build per
128-ray row inside VMEM and writes only the [N, C] candidate lists
(+overflow bits) back — the [N, W] crossing matrix, the compacted word
layout, and the one-hot operands never exist in HBM.

Per grid step (one 128-ray row; rays on lanes):
  1. L1: slab-test every 32-chunk WORD's union AABB (words on sublanes,
     one vectorized pass) -> crossed-word mask.
  2. Word loop (while_loop, early exit when every lane's words are
     consumed): per iteration extract each lane's LOWEST crossed word,
     fetch that word's 32 chunk AABBs with six exact one-hot MXU
     matmuls ((32, W) @ (W, 128) per bound axis — each output element
     is a single 1.0 * value product at HIGHEST precision), slab-test
     the 32 chunks, and append the packed 32-bit crossing word + base
     to VMEM scratch.
  3. C lowest-set-bit extractions from the scratch words (static loop,
     dense selects — the per-lane word index varies, so the clear step
     is a dense masked update, never a per-lane dynamic index).

Outputs are BITWISE-identical to trace_stream.candidate_lists_2l
(same S/C caps, same ascending id order, same overflow semantics:
more than S crossed words or more than C crossed chunks).

Reference parity: the exact per-ray BVH cut incidence a front-to-back
stack traversal would visit (yuki/src/bvh.rs:160-232), batched.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .trace import LANES
from .trace_stream import _safe_inv, CROSS_S, C_MAIN

BIG = 3.0e38


def _fold_axis(lo, hi, o, inv, tn, tf):
    t0 = (lo - o) * inv
    t1 = (hi - o) * inv
    return (
        jnp.maximum(tn, jnp.minimum(t0, t1)),
        jnp.minimum(tf, jnp.maximum(t0, t1)),
    )


def _cull_kernel(wb_ref, tlo_ref, thi_ref, rp_ref, out_ref,
                 words_ref, base_ref, rem_ref, *,
                 n_words, n_chunks, S, C, group):
    """One 128-ray row (per group subrow) -> (C lists + overflow) rows.

    wb_ref  (Wp8, 8): word union AABBs, lo xyz cols 0-2, hi cols 3-5;
                      pad words lo=hi=+inf (never crossed).
    tlo_ref (32*3, Wp): chunk lo bounds; rows j*3+a = axis a of chunk
                      slot j; column w = word w.  Pad chunks BIG.
    thi_ref (32*3, Wp): chunk hi bounds, same layout.
    rp_ref  (8*group, LANES): ray planes ox oy oz dx dy dz tm pad.
    out_ref ((C+8-C%8 or C)+... , LANES) per subrow: rows 0..C-1 lists,
                      row C overflow (i32 0/1), rest zero.
    Scratch: words/base (S, LANES) i32 per subrow stacked (group*S),
             rem (Wp8, LANES) i32 crossed-word mask (live words = 1).
    """
    wp8 = wb_ref.shape[0]
    out_rows = out_ref.shape[0] // group
    w_iota8 = jax.lax.broadcasted_iota(jnp.int32, (wp8, 1), 0)
    j32 = jax.lax.broadcasted_iota(jnp.int32, (32, 1), 0)
    sub = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    s_iota = jax.lax.broadcasted_iota(
        jnp.int32, (-(-S // 8) * 8, 1), 0
    )

    for g in range(group):
        b = g * 8
        ox = rp_ref[b : b + 1, :]
        oy = rp_ref[b + 1 : b + 2, :]
        oz = rp_ref[b + 2 : b + 3, :]
        dx = rp_ref[b + 3 : b + 4, :]
        dy = rp_ref[b + 4 : b + 5, :]
        dz = rp_ref[b + 5 : b + 6, :]
        tm = rp_ref[b + 6 : b + 7, :]
        ix, iy, iz = _safe_inv(dx), _safe_inv(dy), _safe_inv(dz)
        live = tm > 0.0

        out_ref[g * out_rows : (g + 1) * out_rows, :] = jnp.full(
            (out_rows, LANES), -1, jnp.int32
        )

        @pl.when(jnp.any(live))
        def _(g=g, ox=ox, oy=oy, oz=oz, ix=ix, iy=iy, iz=iz, tm=tm,
              live=live):
            # ---- L1: word union boxes, words on sublanes ----
            tn = jnp.zeros((wp8, LANES), jnp.float32)
            tf = jnp.broadcast_to(tm, (wp8, LANES))
            tn, tf = _fold_axis(wb_ref[:, 0:1], wb_ref[:, 3:4], ox, ix,
                                tn, tf)
            tn, tf = _fold_axis(wb_ref[:, 1:2], wb_ref[:, 4:5], oy, iy,
                                tn, tf)
            tn, tf = _fold_axis(wb_ref[:, 2:3], wb_ref[:, 5:6], oz, iz,
                                tn, tf)
            crossed = (tn <= tf) & live & (w_iota8 < n_words)
            rem_ref[:, :] = crossed.astype(jnp.int32)
            n_cw = jnp.sum(crossed.astype(jnp.int32), axis=0,
                           keepdims=True)  # (1, LANES)

            # ---- word loop: extract ascending crossed words ----
            # Carry is (s, more) scalars only; the crossed-word mask
            # lives in the rem_ref scratch (cond must not read refs).
            def cond(carry):
                s, more = carry
                return (s < S) & (more > 0)

            def body(carry):
                s, _ = carry
                rem = rem_ref[:, :]
                idx = jnp.min(
                    jnp.where(rem > 0, w_iota8, n_words), axis=0,
                    keepdims=True,
                )  # (1, LANES)
                valid = idx < n_words
                rem_new = jnp.where(w_iota8 == idx, 0, rem)
                rem_ref[:, :] = rem_new
                # One-hot over words: (Wp, LANES).  Pad-word columns of
                # tlo/thi are BIG so an (impossible) pad selection still
                # can't cross; invalid lanes get all-zero columns.
                wp = tlo_ref.shape[1]
                oh = (
                    (jax.lax.broadcasted_iota(jnp.int32, (wp, 1), 0)
                     == idx)
                    & valid
                ).astype(jnp.float32)
                glo = jax.lax.dot_general(
                    tlo_ref[:, :], oh, (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                )  # (96, LANES)
                ghi = jax.lax.dot_general(
                    thi_ref[:, :], oh, (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                )
                tn2 = jnp.zeros((32, LANES), jnp.float32)
                tf2 = jnp.broadcast_to(tm, (32, LANES))
                # Axis-major rows: a*32+j (contiguous 32-row slices —
                # Mosaic has no strided sublane slicing).
                tn2, tf2 = _fold_axis(glo[0:32, :], ghi[0:32, :], ox, ix,
                                      tn2, tf2)
                tn2, tf2 = _fold_axis(glo[32:64, :], ghi[32:64, :], oy, iy,
                                      tn2, tf2)
                tn2, tf2 = _fold_axis(glo[64:96, :], ghi[64:96, :], oz, iz,
                                      tn2, tf2)
                in_rng = (idx * 32 + j32) < n_chunks
                cr = (tn2 <= tf2) & valid & live & in_rng
                # Pack 32 crossing bits: disjoint-bit weighted adds, one
                # cross-sublane reduction (8 sublanes x 4 bit groups).
                acc8 = jnp.zeros((8, LANES), jnp.int32)
                for q in range(4):
                    blk = cr[q * 8 : (q + 1) * 8, :]
                    weight = jnp.int32(1) << (sub + 8 * q)
                    acc8 = acc8 + blk.astype(jnp.int32) * weight
                packed = jnp.sum(acc8, axis=0, keepdims=True)
                words_ref[pl.ds(g * S + s, 1), :] = packed
                base_ref[pl.ds(g * S + s, 1), :] = jnp.where(
                    valid, idx * 32, -32
                )
                more = jnp.max(rem_new)
                return s + 1, more

            # Scratch init: un-run iterations must read as empty.
            words_ref[pl.ds(g * S, S), :] = jnp.zeros(
                (S, LANES), jnp.int32
            )
            base_ref[pl.ds(g * S, S), :] = jnp.full(
                (S, LANES), -32, jnp.int32
            )
            more0 = jnp.max(crossed.astype(jnp.int32))
            jax.lax.while_loop(cond, body, (jnp.int32(0), more0))

            # ---- phase 2: C lowest-set-bit extractions ----
            sp8 = -(-S // 8) * 8
            pad_s = sp8 - S
            w_all = words_ref[pl.ds(g * S, S), :]
            b_all = base_ref[pl.ds(g * S, S), :]
            if pad_s:
                w_all = jnp.concatenate(
                    [w_all, jnp.zeros((pad_s, LANES), jnp.int32)], axis=0
                )
                b_all = jnp.concatenate(
                    [b_all, jnp.full((pad_s, LANES), -32, jnp.int32)],
                    axis=0,
                )
            count = jnp.sum(
                jax.lax.population_count(w_all), axis=0, keepdims=True
            )
            for c in range(C):
                nz = w_all != 0
                sidx = jnp.min(
                    jnp.where(nz, s_iota, sp8), axis=0, keepdims=True
                )
                sel = s_iota == sidx
                w_sel = jnp.sum(
                    jnp.where(sel, w_all, 0), axis=0, keepdims=True
                )
                b_sel = jnp.sum(
                    jnp.where(sel, b_all, 0), axis=0, keepdims=True
                )
                lsb = w_sel & (-w_sel)
                bit = jax.lax.population_count(lsb - 1)
                out_ref[g * out_rows + c : g * out_rows + c + 1, :] = (
                    jnp.where(w_sel != 0, b_sel + bit, -1)
                )
                w_all = jnp.where(sel, w_all & ~lsb, w_all)
            ov = (n_cw > S) | (count > C)
            out_ref[g * out_rows + C : g * out_rows + C + 1, :] = (
                ov.astype(jnp.int32)
            )


def _word_tables_kernel(ch):
    """Host-graph prep: word union boxes (Wp8, 8) and the transposed
    chunk-bound tables (96, Wp) the kernel's one-hot dots consume.
    Same padding rules as trace_stream._word_tables (BIG pad chunks,
    +inf pad words)."""
    n_c = ch.n_treelets
    w = -(-n_c // 32)
    wp8 = -(-w // 8) * 8
    wp = -(-w // LANES) * LANES
    pad = w * 32 - n_c
    cb = ch.treelet_bounds[:, :6]
    lo_pad = jnp.concatenate([cb[:, 0:3], jnp.full((pad, 3), jnp.inf)], 0)
    hi_pad = jnp.concatenate([cb[:, 3:6], jnp.full((pad, 3), -jnp.inf)], 0)
    bb_lo = lo_pad.reshape(w, 32, 3).min(axis=1)
    bb_hi = hi_pad.reshape(w, 32, 3).max(axis=1)
    wb = jnp.concatenate(
        [bb_lo, bb_hi, jnp.zeros((w, 2), jnp.float32)], axis=1
    )
    wb = jnp.concatenate(
        [wb, jnp.full((wp8 - w, 8), jnp.inf, jnp.float32)], axis=0
    )

    full = jnp.concatenate([cb, jnp.full((pad, 6), BIG, jnp.float32)], 0)
    full = full.reshape(w, 32, 6)
    full = jnp.concatenate(
        [full, jnp.full((wp - w, 32, 6), BIG, jnp.float32)], axis=0
    )
    # Axis-major (96, Wp): row a*32+j = axis a of in-word chunk slot j.
    tlo = jnp.concatenate([full[:, :, a].T for a in range(3)], axis=0)
    thi = jnp.concatenate([full[:, :, 3 + a].T for a in range(3)], axis=0)
    return wb, tlo, thi


CULL_GROUP = 1


def candidate_lists_fused(ch, o, d, t_max, C: int = C_MAIN,
                          S: int = CROSS_S, interpret: bool = False,
                          group: int | None = None):
    """Fused-kernel drop-in for trace_stream.candidate_lists_2l:
    (lists [N, C] i32 ascending (-1 pad), overflow [N] bool)."""
    if group is None:
        group = CULL_GROUP
    n = o.shape[0]
    rows = n // LANES
    gpad_rows = (-rows) % group
    n_c = ch.n_treelets
    n_words = -(-n_c // 32)
    wb, tlo, thi = _word_tables_kernel(ch)

    planes = [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
              t_max, jnp.zeros_like(t_max)]
    packed = jnp.stack(
        [p.reshape(rows, LANES) for p in planes], axis=1
    ).reshape(rows * 8, LANES)
    if gpad_rows:
        packed = jnp.concatenate(
            [packed, jnp.zeros((gpad_rows * 8, LANES), jnp.float32)],
            axis=0,
        )
    grows = (rows + gpad_rows) // group

    out_rows = -(-(C + 1) // 8) * 8
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(grows,),
        in_specs=[
            pl.BlockSpec(wb.shape, lambda p: (0, 0)),
            pl.BlockSpec(tlo.shape, lambda p: (0, 0)),
            pl.BlockSpec(thi.shape, lambda p: (0, 0)),
            pl.BlockSpec((8 * group, LANES), lambda p: (p, 0)),
        ],
        out_specs=[
            pl.BlockSpec((group * out_rows, LANES), lambda p: (p, 0))
        ],
        scratch_shapes=[
            pltpu.VMEM((group * S, LANES), jnp.int32),
            pltpu.VMEM((group * S, LANES), jnp.int32),
            pltpu.VMEM((wb.shape[0], LANES), jnp.int32),
        ],
    )
    (out,) = pl.pallas_call(
        functools.partial(
            _cull_kernel, n_words=n_words, n_chunks=n_c, S=S, C=C,
            group=group,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(
                (grows * group * out_rows, LANES), jnp.int32
            )
        ],
        interpret=interpret,
    )(wb, tlo, thi, packed)
    out = out.reshape(rows + gpad_rows, out_rows, LANES)[:rows]
    lists = out[:, :C, :].transpose(0, 2, 1).reshape(n, C)
    overflow = out[:, C, :].reshape(n) > 0
    return lists, overflow
