"""Wavefront BVH traversal — closest-hit and any-hit (shadow) queries.

TPU design (SURVEY.md §7 "hard parts"): the reference traverses with a
per-ray 64-entry stack and front-to-back child ordering (yuki/src/bvh.rs:
160-302).  Divergent per-lane stacks don't vectorize, so we run the whole
wavefront in lockstep through the *octant-threaded* BVH built in bvh.py:
each step every live ray (a) slab-tests its current node, (b) if the node
is a leaf, tests its <=max_leaf primitives masked, and (c) follows the
precomputed hit/miss link for its direction octant.  State per ray is one
node id — no stack, no dynamic shapes — and the visit order equals the
reference's dir_is_neg near-to-far order, so t_max shrinks as early.

The loop runs until every lane reaches the sentinel; rays that finish early
idle (masked).  Shadow rays use the early-exit variant that retires a lane
the moment any occluder is found (bvh.rs:235-302), skipping primitives that
belong to the sampled area light — the reference's pointer-identity check
(bvh.rs:287-293) becomes an integer light-id compare.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .intersect import F32_MAX, ray_triangle, slab_test, ray_spheres
from .transforms import apply_p_jax, apply_v_jax
from .vecmath import dot


# Test hook: force the treelet/stream Pallas engines in INTERPRET mode on
# the CPU backend, so multi-chip (shard_map) tests can exercise the exact
# production large-scene dispatch — round-2 verdict weak #4: shard_map +
# adaptive treelet dispatch was a combination no test had ever run.
FORCE_PALLAS_INTERPRET = False

# Perf-attribution knockouts for the treelet dispatch
# (benchmarks/r4_streamknock.py): subset of {"probe", "wide", "bary",
# "fallback", "spheres"} disabling that piece of intersect()/
# any_intersect().  NEVER set in production — results are wrong.
TRAVERSE_KNOCK = frozenset()

# Round-5 divergent-branch engine select: True routes the slot branch
# through the fused bundle-walker (ops/trace_walker.py — no
# sort/pack/merge stages); False keeps the per-ray slot stream.
# DECIDED by the on-chip A/B (benchmarks/r5_walker.py, 262k-ray
# colonnade waves): walker 468.9/307.6 ms vs stream 81.7/60.1
# (closest/any) — Mosaic per-grid-step overhead (~2.4 us) dwarfs the
# 8-ray-bundle work unit; see ARCHITECTURE.md "Round-5: the
# bundle-walker A/B".  Parity was exact (0/262k).  Stays off.
WALKER_CLOSEST = False
WALKER_ANY = False
# Pair budgets (candidates per 8-ray bundle): colonnade bounce union
# mean 14.3 natural-order at K=128 (benchmarks/r5_unionstats.py),
# atrium late bounces grow like the bundle engine's (C_BUN sizing).
WALKER_MULT = (24, 48)  # closest (tight, wide) tiers
WALKER_MULT_ANY = (16, 32)


def _backend_tpu() -> bool:
    import jax

    return jax.default_backend() == "tpu"


def _use_pallas() -> bool:
    """Pallas kernels compile only on the TPU backend; tests on CPU use the
    XLA fallbacks (interpret mode is too slow inside integrator loops)
    unless FORCE_PALLAS_INTERPRET opts in."""
    import jax

    return jax.default_backend() == "tpu" or FORCE_PALLAS_INTERPRET


def intersect_dense(scene, o, d, t_max, skip_light=None):
    """Closest-hit by dense sweep over all triangles.

    On TPU this dispatches to the Pallas block kernel (ops/trace.py):
    ray-block state lives in VMEM for the whole triangle loop, measured
    ~28x the XLA sweep below (84 Gtest/s on Cornell).  The XLA fallback
    broadcasts ONE triangle per fori step to all lanes — still ~45x faster
    per ray than pointer-chasing BVH gathers, and numerically identical to
    the kernel.  O(T) per ray, so the scene builder selects dense mode only
    under DENSE_TRI_THRESHOLD triangles.

    ``skip_light`` [N] i32 (or None): per-lane area-light id whose
    triangles are ignored — lets ONE sweep serve combined closest +
    shadow-occlusion waves (the reference's sampled-light skip,
    bvh.rs:287-293; closest lanes pass -2 which matches nothing).
    Returns (t, prim, b0, b1)."""
    if _backend_tpu():
        from .ops.trace import (dense_trace, dense_trace_skip,
                                pack_triangles)

        tp = pack_triangles(scene.tris.p0, scene.tris.p1, scene.tris.p2)
        if skip_light is None:
            return dense_trace(tp, o, d, t_max)
        return dense_trace_skip(
            tp, scene.tris.area_light[:, None], o, d, t_max, skip_light
        )
    tris = scene.tris
    n = tris.p0.shape[0]
    shape = o.shape[:-1]

    def body(i, s):
        t, prim, b0, b1 = s
        th = ray_triangle(o, d, t, tris.p0[i], tris.p1[i], tris.p2[i])
        closer = th.hit & (th.t < t)
        if skip_light is not None:
            closer = closer & (tris.area_light[i] != skip_light)
        return (
            jnp.where(closer, th.t, t),
            jnp.where(closer, i, prim),
            jnp.where(closer, th.b0, b0),
            jnp.where(closer, th.b1, b1),
        )

    init = (
        t_max.astype(jnp.float32),
        jnp.full(shape, -1, dtype=jnp.int32),
        jnp.zeros(shape),
        jnp.zeros(shape),
    )
    return jax.lax.fori_loop(0, n, body, init, unroll=4)


def any_intersect_dense(scene, o, d, t_max, skip_light):
    """Occlusion by dense sweep (no early exit — lockstep lanes would wait
    anyway; the full O(T) sweep is still far cheaper than gathers).
    Dispatches to the Pallas kernel on TPU like intersect_dense."""
    if _backend_tpu():
        from .ops.trace import any_trace, pack_triangles

        tp = pack_triangles(scene.tris.p0, scene.tris.p1, scene.tris.p2)
        return any_trace(
            tp, scene.tris.area_light[:, None], o, d, t_max, skip_light
        )
    tris = scene.tris
    n = tris.p0.shape[0]
    shape = o.shape[:-1]

    def body(i, occ):
        th = ray_triangle(o, d, t_max, tris.p0[i], tris.p1[i], tris.p2[i])
        return occ | (th.hit & (tris.area_light[i] != skip_light))

    return jax.lax.fori_loop(
        0, n, body, jnp.zeros(shape, dtype=bool), unroll=4
    )


class SceneHit(NamedTuple):
    """Closest hit over the whole scene. All [N]."""

    hit: jnp.ndarray  # bool
    t: jnp.ndarray
    prim: jnp.ndarray  # triangle index or -1
    sphere: jnp.ndarray  # sphere index or -1 (exclusive with prim)
    b0: jnp.ndarray
    b1: jnp.ndarray


def _octant(d: jnp.ndarray) -> jnp.ndarray:
    return (
        (d[..., 0] < 0).astype(jnp.int32)
        | ((d[..., 1] < 0).astype(jnp.int32) << 1)
        | ((d[..., 2] < 0).astype(jnp.int32) << 2)
    )


def intersect_bvh(scene, o, d, t_max, max_leaf: int, with_stats: bool = False,
                  skip_light=None):
    """Closest-hit triangles-only traversal. Returns (t, prim, b0, b1[, steps]).
    ``skip_light``: see intersect_dense (per-lane area-light exclusion)."""
    bvh = scene.bvh
    n_nodes = bvh.node_lo.shape[0]
    inv_d = 1.0 / d
    oct_base = _octant(d) * n_nodes  # row into flattened links
    links = bvh.links.reshape(-1, 2)

    shape = o.shape[:-1]
    node0 = jnp.zeros(shape, dtype=jnp.int32)
    state = (
        node0,
        t_max.astype(jnp.float32),
        jnp.full(shape, -1, dtype=jnp.int32),  # prim
        jnp.zeros(shape),  # b0
        jnp.zeros(shape),  # b1
        jnp.zeros(shape, dtype=jnp.int32),  # steps (nodes visited)
    )

    def cond(s):
        return jnp.any(s[0] >= 0)

    def body(s):
        node, t, prim, b0, b1, steps = s
        active = node >= 0
        nd = jnp.maximum(node, 0)
        lo = bvh.node_lo[nd]
        hi = bvh.node_hi[nd]
        box_hit = slab_test(o, inv_d, t, lo, hi) & active
        count = bvh.prim_count[nd]
        offset = bvh.prim_offset[nd]
        leaf_live = box_hit & (count > 0)
        # Masked unrolled leaf primitive tests.
        for k in range(max_leaf):
            lane = leaf_live & (k < count)
            pidx = bvh.prim_order[jnp.minimum(offset + k, bvh.prim_order.shape[0] - 1)]
            th = ray_triangle(
                o, d, t, scene.tris.p0[pidx], scene.tris.p1[pidx], scene.tris.p2[pidx]
            )
            closer = lane & th.hit & (th.t < t)
            if skip_light is not None:
                closer = closer & (scene.tris.area_light[pidx] != skip_light)
            t = jnp.where(closer, th.t, t)
            prim = jnp.where(closer, pidx, prim)
            b0 = jnp.where(closer, th.b0, b0)
            b1 = jnp.where(closer, th.b1, b1)
        link = links[oct_base + nd]
        nxt = jnp.where(box_hit, link[..., 0], link[..., 1])
        node = jnp.where(active, nxt, node)
        steps = steps + active.astype(jnp.int32)
        return node, t, prim, b0, b1, steps

    node, t, prim, b0, b1, steps = jax.lax.while_loop(cond, body, state)
    if with_stats:
        return t, prim, b0, b1, steps
    return t, prim, b0, b1


def _morton_part(x: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of x so they occupy every 3rd bit (the
    classic Morton bit-interleave expansion)."""
    x = (x | (x << 16)) & jnp.uint32(0x030000FF)
    x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
    x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
    x = (x | (x << 2)) & jnp.uint32(0x09249249)
    return x


def ray_sort_key(scene, o, d):
    """Coherence key for wavefront ray sorting: Morton-interleaved origin
    cell in a 32^3 grid over the scene bounds + direction octant.  Sorting
    bounce/shadow rays by this key makes the pair-list cull's ray-block
    bundles tight again — the standard wavefront-path-tracer reordering,
    done with one argsort.

    Key structure (most-significant first): direction octant, then the
    Morton cell, then 6 direction-magnitude bits.  Octant-MAJOR is
    load-bearing: the interval cull derives its t-bounds from per-axis
    direction SIGNS, so a block that mixes octants constrains nothing
    (t in [0, inf) on every axis -> the block matches every treelet;
    measured exactly that — 2940/2940 treelets per block — on 65k-ray
    bounce waves with a cell-major key).  Morton (interleaved) cell bits
    beat raster order for the same reason blocks beat scanlines:
    consecutive keys stay inside compact cubes, so the block origin box
    stays small.  The LOW direction bits (2 magnitude bits per axis)
    sub-sort each cell by ray direction, which tightens the bundle
    engine's OR-cull: measured bounce-wave amplification falls
    x2.25 -> x1.84 (B=4) / x3.45 -> x2.65 (B=8) on the colonnade and
    x2.54 -> x2.13 / x4.10 -> x3.26 on the atrium while the coherent
    rows branch IMPROVES (273 -> 245 interval pairs/row); putting the
    direction bits ABOVE the cell instead wrecks the rows branch
    (486 pairs/row) — benchmarks/r3_keysweep.py."""
    lo = scene.world_lo
    inv_ext = 31.0 / jnp.maximum(scene.world_hi - lo, 1e-6)
    cell = jnp.clip(((o - lo) * inv_ext), 0, 31).astype(jnp.uint32)
    morton = (
        (_morton_part(cell[..., 0]) << 2)
        | (_morton_part(cell[..., 1]) << 1)
        | _morton_part(cell[..., 2])
    )
    # Normalize by the max component first: shadow rays arrive
    # UNNORMALIZED (spawn_ray_to's d = target - o, magnitude = distance
    # to the light), so raw |d| saturates every bit to 3 exactly on
    # occlusion waves; the linf-normalized form cuts colonnade shadow
    # B=8 amplification x1.58 -> x1.41 and is neutral-or-better
    # everywhere else (benchmarks/r3_keysweep.py dirnorm variant).
    ad = jnp.abs(d)
    ad = ad / jnp.maximum(ad.max(axis=-1, keepdims=True), 1e-30)
    db = jnp.clip((ad * 3.999).astype(jnp.uint32), 0, 3)
    dir6 = (db[..., 0] << 4) | (db[..., 1] << 2) | db[..., 2]
    return (
        (_octant(d).astype(jnp.uint32) << 21) | (morton << 6) | dir6
    )


def _pair_capacity(n_rays: int) -> int:
    """Static pair-list budget for a wave of n_rays.

    Measured sorted-divergent-wave demand on the colonnade: 2.0 pairs/ray
    at 65k rays, 1.25 at 262k (density improves block coherence), so 2x
    rays is a comfortable ceiling; the historical 393216 floor keeps
    small-wave graphs unchanged.  Overflow still falls back to the exact
    in-kernel treelet walk."""
    return max(393216, 2 * n_rays)


_Z_DIR = jnp.asarray([0.0, 0.0, 1.0])

# Adaptive traversal dispatch: a wave whose per-row CONSERVATIVE
# (interval-cull) candidate demand fits the rows-branch capacity walks
# rows (coherent path); above it the per-ray slot stream wins.  The
# dispatch probe is the O(rows x chunks) interval cull — 128x cheaper
# than the exact per-ray cull, which only the slot branch needs (and now
# computes inside the branch).  Measured interval counts/row on the
# colonnade (benchmarks/interval_rows.py): primary 7.1 (exact 6.9),
# shadow 14.8 (exact 6.5), bounce 272 (exact 76) — the capacity gate
# separates cleanly with headroom for batched-NEE shadow waves.
# Rows-branch budgets under interval words: extraction width C covers the
# shadow p99 of 86 (<96); the pair budget covers the shadow MEAN of 14.8
# + QUAD alignment + forced pairs for empty rows.
# Extraction width C: sized over the coherent-wave row-union TAIL, not
# just the p99 — a row whose union exceeds C flags ALL 128 of its rays
# overflow, and r3_dispatch_diag measured film-order primary waves
# overflowing 8976 rays (70 rows) at C=96, each paying the wide re-run
# every wave.  At 160 the extraction cost grows ~1.7x at wave-row scale
# (trivial) and the heavy-row pairs land in the demand gate instead.
_ROWS_C = 160
_ROWS_MULT = 24


def _rows_demand(row_words):
    """EXACT pair demand the rows engine would allocate for this wave:
    per-row popcount, clamped to the extraction width C (extract_lists
    truncates beyond C — overflow rays re-run through the wide pass, so
    capacity is only consumed up to C), floored at 1 (empty rows carry a
    forced pair), padded to a QUAD multiple (trace_rows._row_pairs).
    Gating the dispatch on THIS against the rows cap (instead of the raw
    mean-pairs threshold the round-2 advisor flagged) makes near-
    threshold waves take the rows branch only when they actually fit —
    n_pairs > cap in the engine flags EVERY ray as overflow and dumps
    the whole wave on the slow fallback."""
    from .ops.trace_rows import QUAD as RQ

    pc = jax.lax.population_count(row_words).sum(axis=-1)
    pc = jnp.minimum(jnp.maximum(pc, 1), _ROWS_C)
    aligned = -(-pc // RQ) * RQ
    return aligned.sum().astype(jnp.int32)


def _compact_indices(mask, cap: int):
    """Indices of set mask lanes, padded with n (out of bounds) to a
    static cap.  cumsum + one N-input scatter (~2 ms at 262k — fine at
    wave scale, never at slot scale)."""
    n = mask.shape[0]
    posn = jnp.cumsum(mask.astype(jnp.int32))
    cnt = posn[-1]
    tgt = jnp.where(mask, posn - 1, cap)
    idx = jnp.full(cap, n, jnp.int32).at[tgt].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop"
    )
    return idx, cnt


def _pad128(scene, o, d, t_max, *extras):
    """Pad a ray batch to the next 128 multiple with benign parked rays
    (center origin, unit z, t_max=0 — dead for every cull/kernel).  The
    treelet engines reshape [n] -> [n//128, 128]; arbitrary batch sizes
    (viewer debug rays start at ONE ray) must pad or crash at trace time
    (advisor round-2 finding).  Returns (o, d, t_max, *extras) padded."""
    n = o.shape[0]
    pad = (-n) % 128
    if pad == 0:
        return (o, d, t_max) + extras
    center = jnp.broadcast_to(
        0.5 * (scene.world_lo + scene.world_hi), (pad, 3)
    )
    out = (
        jnp.concatenate([o, center]),
        jnp.concatenate([d, jnp.broadcast_to(_Z_DIR, (pad, 3))]),
        jnp.concatenate([t_max, jnp.zeros(pad, t_max.dtype)]),
    )
    for e in extras:
        out = out + (
            jnp.concatenate([e, jnp.full(pad, -2, e.dtype)]),
        )
    return out


def _sorted_call(scene, o, d, t_max, extra, fn, skip_sort: bool = False):
    """Sort rays by coherence key, call fn on the sorted SoA, unsort.

    ``skip_sort`` runs fn on the natural ray order: with the fused
    per-ray exact cull (ops/trace_cull.py) the DIVERGENT slot pipeline
    is order-independent (per-ray lists, chunk-major slot sort, per-ray
    merge — bitwise-identical results either way), so bounce waves,
    which always dispatch to the slot branch (measured probe 114-1267
    pairs/row, r3_dispatch_diag), can skip the argsort + 3 gathers + 1
    unsort scatter entirely.  The dispatch probe still runs: a wave
    that IS coherent in natural order (e.g. specular bounces in film
    order) still takes the rows branch.

    Load-bearing for every treelet-path query (round-3 finding: the
    integrators hand over UNSORTED bounce/shadow waves, but the whole
    traversal stack is built around sorted 128-ray rows — the interval
    row cull, the rows-branch dispatch, and the cross kernel's 8-chunk
    block skip all collapse to worst case on unsorted rows; measured
    shadow waves only take the cheap rows branch at all when sorted).
    Cost: one u32 argsort + two gathers + one inverse gather, ~5 ms at
    262k — repaid ~10x by the cull tightness it buys."""
    if skip_sort:
        return tuple(fn(o, d, t_max, extra))
    n = o.shape[0]
    order = jnp.argsort(ray_sort_key(scene, o, d))
    o_s, d_s, t_s = o[order], d[order], t_max[order]
    extra_s = None if extra is None else extra[order]
    outs = fn(o_s, d_s, t_s, extra_s)
    # Invert the permutation with one scatter instead of a second
    # argsort (order is a permutation, so targets are unique).
    inv = (
        jnp.zeros(n, jnp.int32)
        .at[order]
        .set(jnp.arange(n, dtype=jnp.int32), unique_indices=True)
    )
    return tuple(x[inv] if x.ndim else x for x in outs)


def intersect(scene, meta, o, d, t_max, with_stats: bool = False,
              skip_sort: bool = False, skip_light=None,
              bary_count: int | None = None):
    """Full scene closest hit: triangles (dense sweep or threaded BVH,
    chosen statically by the scene builder) + brute-force spheres
    (divergence from the reference, which BVHs spheres too — see
    scene/data.py docstring). Returns SceneHit[, steps].

    ``skip_sort``: see _sorted_call — bounce waves skip the coherence
    sort (slot pipeline is order-independent; bitwise-same results).

    ``skip_light`` [N] i32 (or None): per-lane area-light id whose
    triangles are excluded from the walk (bvh.rs:287-293).  This lets
    path_li trace next-bounce rays and NEE shadow rays in ONE combined
    call — shadow lanes pass their sampled light id (occluded == .hit,
    since t_max is the 0.9999 chord), closest lanes pass -2.  With
    skip_light=None every engine runs its unchanged (bitwise-identical)
    no-skip graph.

    ``bary_count`` (static, treelet path, requires skip_sort): only the
    first bary_count lanes get barycentrics recomputed — shadow lanes of
    a combined wave never consume b0/b1, and the recompute is a [N,32]
    row-gather + dense watertight pass that would otherwise run on 3x
    the lanes."""
    if meta.traversal == "dense" and not with_stats:
        t, prim, b0, b1 = intersect_dense(scene, o, d, t_max, skip_light)
    elif meta.traversal == "treelet" and not with_stats and _use_pallas():
        from .ops import trace_bundles as tb
        from .ops import trace_rows as tr
        from .ops import trace_stream as ts
        from .ops.trace_treelets import treelet_closest

        # Adaptive exact-incidence traversal: the crossing bitmask is
        # computed once; the per-row union pair count decides AT RUNTIME
        # between the coherent row-union walk (primary-style waves, no
        # gather/sort/merge) and the divergent slot stream (bounce waves).
        # Rays whose candidate list overflows re-run as a compacted
        # mini-wave through a wider instantiation; a capacity blow-out
        # falls back to the in-kernel treelet walk.
        sp = scene.tris.shading_packed
        ch = scene.chunks
        interp = FORCE_PALLAS_INTERPRET

        def run_sorted(o, d, t_max, sk):
            n0 = o.shape[0]
            if sk is None:
                o, d, t_max = _pad128(scene, o, d, t_max)
            else:
                o, d, t_max, sk = _pad128(scene, o, d, t_max, sk)
            n = o.shape[0]
            rows = n // 128
            if "probe" in TRAVERSE_KNOCK:  # pragma: no cover - perf only
                row_words = jnp.zeros(
                    (rows, -(-ch.n_treelets // 32)), dtype=jnp.uint32)
                coherent = jnp.asarray(False)
            else:
                row_words = tr.row_words_interval(ch, o, d, t_max)
                coherent = _rows_demand(row_words) <= rows * _ROWS_MULT

            def rows_branch(_):
                t_r, p_r, ov_r = tr.rows_closest_w(
                    ch, row_words, o, d, t_max, C=_ROWS_C,
                    mult=_ROWS_MULT, interpret=interp, skip_light=sk,
                )
                return t_r, p_r, ov_r, jnp.asarray(True)

            def slot_branch(_):
                # Round-5: the fused bundle-walker deletes the slot
                # stream's sort/pack/merge data movement entirely
                # (ops/trace_walker.py; roofline verdict successor).
                if WALKER_CLOSEST:
                    from .ops.trace_walker import walker_closest_w

                    words = ts.cross_words(ch, o, d, t_max,
                                           interpret=interp)
                    return walker_closest_w(
                        ch, words, o, d, t_max,
                        mult=WALKER_MULT[0], mult_wide=WALKER_MULT[1],
                        interpret=interp, skip=sk,
                    )
                # Only the divergent branch needs the exact per-ray
                # cull; coherent waves skip its cost entirely (the
                # interval probe above is rows-granular).  Round-3
                # NEGATIVE result: the sublane-bundle engine
                # (ops/trace_bundles.py) measured 3.2x SLOWER than the
                # per-ray stream on real bounce waves (343 vs 108 ms,
                # benchmarks/r3_bundle_stages.py on-chip) — its merge
                # scatters narrow [*, bun] rows (the slow scalar path)
                # and the OR'd kernel amplification exceeds the
                # extraction savings.  Per-ray stream is production;
                # bundles stay behind meta.bun_closest > 1.
                if meta.bun_closest > 1 and sk is None:
                    words = ts.cross_words(ch, o, d, t_max, interpret=interp)
                    bw = tb.bundle_words(words, meta.bun_closest)
                    return tb.bundles_closest_w(
                        ch, bw, o, d, t_max, C=meta.c_closest,
                        mult=4 * meta.slot_mult_tight,
                        mult_wide=4 * meta.slot_mult + 4, interpret=interp,
                        bun=meta.bun_closest,
                    )
                if ch.n_treelets >= ts.CROSS_2L_MIN_CHUNKS:
                    # Fused two-level exact cull (ops/trace_cull.py):
                    # O(words + true incidence) per ray AND zero HBM
                    # intermediates — the XLA 2L build streamed [N, W]
                    # one-hot/slab matrices per stage (the dominant
                    # per-call term, r3_stage2.py).  Word-overflow rays
                    # fold into the existing wide re-run, whose dense
                    # cross is exact at any incidence.
                    from .ops.trace_cull import candidate_lists_fused

                    lists, ov = candidate_lists_fused(
                        ch, o, d, t_max, ts.C_MAIN, interpret=interp
                    )
                    return ts.stream_closest_l(
                        ch, lists, ov, o, d, t_max,
                        mult=meta.slot_mult_tight, mult_wide=meta.slot_mult,
                        interpret=interp, skip=sk,
                    )
                words = ts.cross_words(ch, o, d, t_max, interpret=interp)
                return ts.stream_closest_w(
                    ch, words, o, d, t_max,
                    mult=meta.slot_mult_tight, mult_wide=meta.slot_mult,
                    interpret=interp, skip=sk,
                )

            t_s, prim_s, ov, ok = jax.lax.cond(
                coherent, rows_branch, slot_branch, None
            )

            idx, n_ov = _compact_indices(ov, ts.OV_CAP)
            live = jnp.arange(ts.OV_CAP) < n_ov
            o2 = jnp.where(live[:, None], o[idx], 0.0)
            d2 = jnp.where(live[:, None], d[idx], _Z_DIR)
            t2 = jnp.where(live, t_max[idx], 0.0)
            s2 = (None if sk is None
                  else jnp.where(live, sk[idx], -2))

            def run_wide_cap(cap):
                def run(_):
                    t_w, p_w, _, _, ov2, ok2 = ts.stream_closest(
                        ch, sp, o2[:cap], d2[:cap], t2[:cap],
                        C=ts.C_WIDE,
                        mult=(ts.WIDE_LOW_MULT, ts.WIDE_TIGHT_MULT),
                        mult_wide=ts.C_WIDE, interpret=interp,
                        skip=None if s2 is None else s2[:cap],
                    )
                    idxc, livec = idx[:cap], live[:cap]
                    return (
                        t_s.at[idxc].set(
                            jnp.where(livec, t_w, t_s[idxc]), mode="drop"),
                        prim_s.at[idxc].set(
                            jnp.where(livec, p_w, prim_s[idxc]),
                            mode="drop"),
                        ok2 & ~jnp.any(ov2 & livec),
                    )
                return run

            def run_wide(_):
                # Tiered mini-wave: the wide pass is budget-proportional
                # and typical waves overflow only a handful of rays —
                # but atrium bounce waves overflow ~6.8k EVERY bounce
                # (r3_dispatch_diag), hence the OV_MID tier.
                return jax.lax.cond(
                    n_ov <= ts.OV_SMALL,
                    run_wide_cap(ts.OV_SMALL),
                    lambda _: jax.lax.cond(
                        n_ov <= ts.OV_MID,
                        run_wide_cap(ts.OV_MID),
                        run_wide_cap(ts.OV_CAP),
                        None,
                    ),
                    None,
                )

            def skip_wide(_):
                return t_s, prim_s, jnp.asarray(True)

            if "wide" in TRAVERSE_KNOCK:  # pragma: no cover - perf only
                ok2 = jnp.asarray(True)
            else:
                t_s, prim_s, ok2 = jax.lax.cond(
                    n_ov > 0, run_wide, skip_wide, None
                )
            ok = ok & ok2 & (n_ov <= ts.OV_CAP)
            nb = n if bary_count is None or not skip_sort else min(
                -(-bary_count // 128) * 128, n)
            if "bary" in TRAVERSE_KNOCK:  # pragma: no cover - perf only
                b0_s = jnp.zeros(n, t_s.dtype)
                b1_s = jnp.zeros(n, t_s.dtype)
            else:
                b0_s, b1_s = ts._recompute_bary(
                    sp, o[:nb], d[:nb], t_s[:nb], prim_s[:nb])
                if nb < n:
                    pad = jnp.zeros(n - nb, b0_s.dtype)
                    b0_s = jnp.concatenate([b0_s, pad])
                    b1_s = jnp.concatenate([b1_s, pad])

            def fallback(_):
                # Capacity blow-out escape hatch.  The treelet walk has
                # no light-skip; with a combined wave, patch the shadow
                # lanes' prim from a skip-aware occlusion walk (their t /
                # bary are never consumed — only .hit is).
                t_f, p_f, b0_f, b1_f = treelet_closest(
                    scene.treelets, o, d, t_max, interpret=interp)
                if sk is not None:
                    from .ops.trace_treelets import treelet_any

                    occ_f = treelet_any(scene.treelets, o, d, t_max, sk,
                                        interpret=interp)
                    is_shadow = sk != -2
                    p_f = jnp.where(
                        is_shadow, jnp.where(occ_f, 0, -1), p_f)
                return t_f, p_f, b0_f, b1_f

            if "fallback" in TRAVERSE_KNOCK:  # pragma: no cover - perf
                t, prim, b0, b1 = t_s, prim_s, b0_s, b1_s
            else:
                t, prim, b0, b1 = jax.lax.cond(
                    ok,
                    lambda _: (t_s, prim_s, b0_s, b1_s),
                    fallback,
                    None,
                )
            return t[:n0], prim[:n0], b0[:n0], b1[:n0]

        t, prim, b0, b1 = _sorted_call(
            scene, o, d, t_max, skip_light, run_sorted, skip_sort=skip_sort
        )
    else:
        res = intersect_bvh(scene, o, d, t_max, meta.bvh_max_leaf, with_stats,
                            skip_light=skip_light)
        if with_stats:
            t, prim, b0, b1, steps = res
        else:
            t, prim, b0, b1 = res
    if "spheres" in TRAVERSE_KNOCK:  # pragma: no cover - perf only
        out = SceneHit(
            hit=prim >= 0, t=t, prim=prim,
            sphere=jnp.full_like(prim, -1), b0=b0, b1=b1,
        )
        return (out, steps) if with_stats else out
    sh = ray_spheres(o, d, t_max, scene.spheres)
    sphere_wins = sh.hit & (sh.t < t)
    out = SceneHit(
        hit=(prim >= 0) | sphere_wins,
        t=jnp.where(sphere_wins, sh.t, t),
        prim=jnp.where(sphere_wins, -1, prim),
        sphere=jnp.where(sphere_wins, sh.sphere, -1),
        b0=b0,
        b1=b1,
    )
    if with_stats:
        return out, steps
    return out


def any_intersect(scene, meta, o, d, t_max, skip_light,
                  skip_sort: bool = False) -> jnp.ndarray:
    """Occlusion query (bvh.rs any_intersect).

    skip_light: [N] i32 — triangles whose area_light id equals this lane's
    value are ignored (the reference skips the sampled light by pointer
    identity, bvh.rs:287-293).
    ``skip_sort``: see _sorted_call (divergent-wave fast path).
    Returns occluded mask [N] bool.
    """
    if meta.traversal == "dense":
        occ = any_intersect_dense(scene, o, d, t_max, skip_light)
        sh = ray_spheres(o, d, t_max, scene.spheres)
        return occ | sh.hit
    if meta.traversal == "treelet" and _use_pallas():
        from .ops import trace_bundles as tb
        from .ops import trace_rows as tr
        from .ops import trace_stream as ts
        from .ops.trace_treelets import treelet_any

        # Adaptive occlusion: row-union walk for coherent waves, slot
        # stream for divergent ones (see intersect above); overflow rays
        # re-run per-ray through the wide slot stream.
        ch = scene.chunks
        interp = FORCE_PALLAS_INTERPRET

        def run_sorted(o, d, t_max, skip_light):
            n0 = o.shape[0]
            o, d, t_max, skip_light = _pad128(
                scene, o, d, t_max, skip_light
            )
            n = o.shape[0]
            rows = n // 128
            if "probe" in TRAVERSE_KNOCK:  # pragma: no cover - perf only
                row_words = jnp.zeros(
                    (rows, -(-ch.n_treelets // 32)), dtype=jnp.uint32)
                coherent = jnp.asarray(False)
            else:
                row_words = tr.row_words_interval(ch, o, d, t_max)
                coherent = _rows_demand(row_words) <= rows * _ROWS_MULT

            def rows_branch(_):
                occ_r, ov_r = tr.rows_any_w(
                    ch, row_words, o, d, t_max, skip_light,
                    C=_ROWS_C, mult=_ROWS_MULT, interpret=interp,
                )
                return occ_r, ov_r, jnp.asarray(True)

            def slot_branch(_):
                # Round-5 walker (see intersect above).
                if WALKER_ANY:
                    from .ops.trace_walker import walker_any_w

                    words = ts.cross_words(ch, o, d, t_max,
                                           interpret=interp)
                    return walker_any_w(
                        ch, words, o, d, t_max, skip_light,
                        mult=WALKER_MULT_ANY[0],
                        mult_wide=WALKER_MULT_ANY[1],
                        interpret=interp,
                    )
                # Per-ray stream is production (see intersect: bundles
                # measured slower on-chip); bundles behind bun_any > 1.
                if meta.bun_any > 1:
                    words = ts.cross_words(ch, o, d, t_max, interpret=interp)
                    bw = tb.bundle_words(words, meta.bun_any)
                    return tb.bundles_any_w(
                        ch, bw, o, d, t_max, skip_light, C=meta.c_any,
                        mult=4 * max(3, meta.slot_mult_tight - 1),
                        mult_wide=4 * max(4, meta.slot_mult - 2) + 4,
                        interpret=interp, bun=meta.bun_any,
                    )
                if ch.n_treelets >= ts.CROSS_2L_MIN_CHUNKS:
                    # Fused two-level exact cull (see intersect above).
                    from .ops.trace_cull import candidate_lists_fused

                    lists, ov = candidate_lists_fused(
                        ch, o, d, t_max, ts.C_MAIN, interpret=interp
                    )
                    return ts.stream_any_l(
                        ch, lists, ov, o, d, t_max, skip_light,
                        mult=max(3, meta.slot_mult_tight - 1),
                        mult_wide=max(4, meta.slot_mult - 2),
                        interpret=interp,
                    )
                words = ts.cross_words(ch, o, d, t_max, interpret=interp)
                return ts.stream_any_w(
                    ch, words, o, d, t_max, skip_light,
                    mult=max(3, meta.slot_mult_tight - 1),
                    mult_wide=max(4, meta.slot_mult - 2),
                    interpret=interp,
                )

            occ_s, ov, ok = jax.lax.cond(
                coherent, rows_branch, slot_branch, None
            )
            # Occlusion is monotone in the candidate set: a truncated
            # list that already found an occluder is FINAL (extra chunks
            # can only add occluders) — only unoccluded overflow rays
            # need the wide re-run.  Cuts the per-bounce overflow
            # mini-wave population (whose slot layout has an
            # n_chunks*128 padding floor — 504k slots on the atrium).
            ov = ov & ~occ_s
            idx, n_ov = _compact_indices(ov, ts.OV_CAP)
            live = jnp.arange(ts.OV_CAP) < n_ov
            o2 = jnp.where(live[:, None], o[idx], 0.0)
            d2 = jnp.where(live[:, None], d[idx], _Z_DIR)
            t2 = jnp.where(live, t_max[idx], 0.0)
            s2 = jnp.where(live, skip_light[idx], -2)

            def run_wide_cap(cap):
                def run(_):
                    occ_w, ov2, ok2 = ts.stream_any(
                        scene.chunks, o2[:cap], d2[:cap], t2[:cap],
                        s2[:cap], C=ts.C_WIDE,
                        mult=(ts.WIDE_LOW_MULT, ts.WIDE_TIGHT_MULT),
                        mult_wide=ts.C_WIDE, interpret=interp,
                    )
                    idxc, livec = idx[:cap], live[:cap]
                    return (
                        occ_s.at[idxc].set(
                            jnp.where(livec, occ_w, occ_s[idxc]),
                            mode="drop"),
                        # Occluded verdicts are final even when the
                        # wide list truncated (monotonicity, as above).
                        ok2 & ~jnp.any(ov2 & livec & ~occ_w),
                    )
                return run

            def run_wide(_):
                return jax.lax.cond(
                    n_ov <= ts.OV_SMALL,
                    run_wide_cap(ts.OV_SMALL),
                    lambda _: jax.lax.cond(
                        n_ov <= ts.OV_MID,
                        run_wide_cap(ts.OV_MID),
                        run_wide_cap(ts.OV_CAP),
                        None,
                    ),
                    None,
                )

            def skip_wide(_):
                return occ_s, jnp.asarray(True)

            if "wide" in TRAVERSE_KNOCK:  # pragma: no cover - perf only
                ok2 = jnp.asarray(True)
            else:
                occ_s, ok2 = jax.lax.cond(
                    n_ov > 0, run_wide, skip_wide, None)
            ok = ok & ok2 & (n_ov <= ts.OV_CAP)
            if "fallback" in TRAVERSE_KNOCK:  # pragma: no cover - perf
                occ = occ_s
            else:
                occ = jax.lax.cond(
                    ok,
                    lambda _: occ_s,
                    lambda _: treelet_any(scene.treelets, o, d, t_max,
                                          skip_light, interpret=interp),
                    None,
                )
            return (occ[:n0],)

        (occ,) = _sorted_call(
            scene, o, d, t_max, skip_light, run_sorted, skip_sort=skip_sort
        )
        if "spheres" in TRAVERSE_KNOCK:  # pragma: no cover - perf only
            return occ
        sh = ray_spheres(o, d, t_max, scene.spheres)
        return occ | sh.hit
    max_leaf = meta.bvh_max_leaf
    bvh = scene.bvh
    n_nodes = bvh.node_lo.shape[0]
    inv_d = 1.0 / d
    oct_base = _octant(d) * n_nodes
    links = bvh.links.reshape(-1, 2)

    shape = o.shape[:-1]
    state = (
        jnp.zeros(shape, dtype=jnp.int32),
        jnp.zeros(shape, dtype=bool),
    )

    def cond(s):
        return jnp.any(s[0] >= 0)

    def body(s):
        node, occ = s
        active = (node >= 0) & ~occ
        nd = jnp.maximum(node, 0)
        box_hit = slab_test(o, inv_d, t_max, bvh.node_lo[nd], bvh.node_hi[nd]) & active
        count = bvh.prim_count[nd]
        offset = bvh.prim_offset[nd]
        leaf_live = box_hit & (count > 0)
        for k in range(bvh_max_leaf_static(scene, max_leaf)):
            lane = leaf_live & (k < count)
            pidx = bvh.prim_order[jnp.minimum(offset + k, bvh.prim_order.shape[0] - 1)]
            th = ray_triangle(
                o, d, t_max, scene.tris.p0[pidx], scene.tris.p1[pidx], scene.tris.p2[pidx]
            )
            blocked = lane & th.hit & (scene.tris.area_light[pidx] != skip_light)
            occ = occ | blocked
        link = links[oct_base + nd]
        nxt = jnp.where(box_hit, link[..., 0], link[..., 1])
        node = jnp.where(active, jnp.where(occ, -1, nxt), -1)
        return node, occ

    _, occ = jax.lax.while_loop(cond, body, state)

    # Spheres can also occlude (none of them carry area lights).
    sh = ray_spheres(o, d, t_max, scene.spheres)
    return occ | sh.hit


def bvh_max_leaf_static(scene, max_leaf: int) -> int:
    return max_leaf
