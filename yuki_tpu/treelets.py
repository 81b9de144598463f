"""Two-level treelet acceleration structure for large scenes.

TPU-native replacement for per-ray BVH descent (SURVEY.md §7 "hard
parts"): per-lane node pointers force gathers, which are catastrophically
slow on TPU, so instead the BVH is *cut* into two levels of spatial blocks
whose data every lane reads in lockstep (broadcast scalar loads — free):

  super-treelets : subtrees holding <= super_size triangles
  treelets       : subtrees holding <= leaf_size triangles (padded to
                   exactly leaf_size with degenerate triangles)

Traversal (ops/trace.py two-level kernel) walks supers in BVH DFS order;
a whole ray block skips a super when NO lane's slab test hits it (a scalar
branch), recurses similarly over its treelets, and tests a hit treelet's
padded triangle block.  BVH DFS order keeps spatially close geometry
adjacent, so coherent ray blocks skip most supers.  Because the reference
BVH build appends leaf primitives in DFS order (bvh.rs:305-390), each
subtree's triangles are CONTIGUOUS in prim_order — the cut needs no
re-sorting.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from .bvh import BvhHost


@dataclass
class TreeletArrays:
    """Device pytree: the two-level structure + padded triangle blocks."""

    super_bounds: Any  # [S, 8] f32: lo(3), hi(3), pad
    super_range: Any  # [S, 2] i32: first treelet, treelet count
    treelet_bounds: Any  # [T, 8] f32
    # One HBM row per TRIANGLE slot: [T*K, 16] f32 with cols
    # (p0,p1,p2 | area_light | prim_id | pad...).  Treelet tt owns rows
    # [tt*K, (tt+1)*K); kernels DMA that row block into a (K,16) scratch so
    # the inner loop's dynamic index lands on the sublane dim (Mosaic
    # cannot prove alignment for dynamic LANE indices).
    tris_padded: Any  # [T*K, 128] f32 (DMA slices need 128-lane alignment)
    leaf_size: int  # static K
    n_supers: int
    n_treelets: int
    ts_max: int = 0  # static max treelets in any one super (stream cull)


jax.tree_util.register_pytree_node(
    TreeletArrays,
    lambda t: (
        [t.super_bounds, t.super_range, t.treelet_bounds, t.tris_padded],
        (t.leaf_size, t.n_supers, t.n_treelets, t.ts_max),
    ),
    lambda aux, ch: TreeletArrays(*ch, *aux),
)


def build_treelets(
    bvh: BvhHost,
    tri_p: np.ndarray,  # [N,3,3] world-space corners (builder order)
    tri_light: np.ndarray,  # [N] i32
    leaf_size: int = 16,
    super_size: int = 2048,
    pack_chunks: bool = False,
) -> TreeletArrays:
    """Cut the built BVH into supers/treelets (host, vectorized-ish).

    ``pack_chunks`` (chunk mode, super_size == leaf_size only; benchmark
    use — benchmarks/r3_chunkpack.py): greedily merge DFS-consecutive cut
    subtrees into one chunk while the combined prim count fits leaf_size.
    Measured a clear NEGATIVE for production (see ARCHITECTURE.md round-3
    negative results): chunk count falls only ~6% (fill is already ~86/128
    raw mean, so consecutive pairs rarely fit) while the spatially loose
    DFS unions DOUBLE per-ray bounce crossings (3.54 -> 7.34 on the
    colonnade) — the pack/kernel terms scale with crossings and dominate
    the O(rays x W) cross term the merge shrinks."""
    n_nodes = len(bvh.child0)

    # Subtree prim counts + first-prim offsets via reverse topological
    # order (children always have higher indices than parents in our
    # build's preorder numbering).
    counts = bvh.prim_count.astype(np.int64).copy()
    first = bvh.prim_offset.astype(np.int64).copy()
    for n in range(n_nodes - 1, -1, -1):
        c0, c1 = bvh.child0[n], bvh.child1[n]
        if c0 >= 0:
            counts[n] = counts[c0] + counts[c1]
            first[n] = min(first[c0], first[c1])

    # DFS cut: collect roots of subtrees small enough for each level.
    def cut(limit):
        roots = []
        stack = [0]
        while stack:
            n = stack.pop()
            if counts[n] <= limit or bvh.child0[n] < 0:
                roots.append(n)
            else:
                stack.append(bvh.child1[n])
                stack.append(bvh.child0[n])
        return roots

    super_roots = cut(super_size)
    s_first = first[super_roots]
    order = np.argsort(s_first, kind="stable")  # DFS order == prim order
    super_roots = [super_roots[i] for i in order]

    treelets = []  # (lo, hi, prim_start, prim_count)
    super_rows = []  # (lo, hi, t_first, t_count)
    if pack_chunks:
        assert super_size == leaf_size, "pack_chunks is chunk-mode only"
        groups = []  # lists of member roots
        cur, cur_n = [], 0
        for n in super_roots:
            c = int(counts[n])
            if cur and cur_n + c > leaf_size:
                groups.append(cur)
                cur, cur_n = [], 0
            cur.append(n)
            cur_n += c
        if cur:
            groups.append(cur)
        for g in groups:
            lo = np.min([bvh.node_lo[n] for n in g], axis=0)
            hi = np.max([bvh.node_hi[n] for n in g], axis=0)
            start = int(min(first[n] for n in g))
            count = int(sum(counts[n] for n in g))
            super_rows.append((lo, hi, len(treelets), 1))
            treelets.append((lo, hi, start, count))
        super_roots = []
    for sr in super_roots:
        t_first = len(treelets)
        stack = [sr]
        local = []
        while stack:
            n = stack.pop()
            if counts[n] <= leaf_size or bvh.child0[n] < 0:
                local.append(n)
            else:
                stack.append(bvh.child1[n])
                stack.append(bvh.child0[n])
        local.sort(key=lambda n: first[n])
        for n in local:
            treelets.append(
                (bvh.node_lo[n], bvh.node_hi[n], int(first[n]), int(counts[n]))
            )
        super_rows.append(
            (bvh.node_lo[sr], bvh.node_hi[sr], t_first, len(local))
        )

    n_t = len(treelets)
    k = leaf_size
    # One row per triangle slot, 128 cols (Mosaic DMA lane alignment).  Padding rows are all-zero
    # degenerate triangles (identical corners -> zero edge functions ->
    # det == 0 -> miss; NaN padding would sneak through the comparisons)
    # and additionally carry prim_id -1 so kernels can mask them — FMA
    # contraction can still make degenerate edges epsilon-nonzero.
    rows_out = np.zeros((n_t * k, 128), dtype=np.float32)
    rows_out[:, 9] = -3.0  # padding never matches a shadow skip id
    rows_out[:, 10] = -1.0
    t_bounds = np.zeros((n_t, 8), dtype=np.float32)
    for ti, (lo, hi, start, count) in enumerate(treelets):
        t_bounds[ti, 0:3] = lo
        t_bounds[ti, 3:6] = hi
        ids = bvh.prim_order[start : start + count]
        r0 = ti * k
        rows_out[r0 : r0 + count, 0:9] = tri_p[ids].reshape(count, 9)
        rows_out[r0 : r0 + count, 9] = tri_light[ids]
        rows_out[r0 : r0 + count, 10] = ids

    s_bounds = np.zeros((len(super_rows), 8), dtype=np.float32)
    s_range = np.zeros((len(super_rows), 2), dtype=np.int32)
    for si_, (lo, hi, t0, tc) in enumerate(super_rows):
        s_bounds[si_, 0:3] = lo
        s_bounds[si_, 3:6] = hi
        s_range[si_] = (t0, tc)

    return TreeletArrays(
        super_bounds=jnp.asarray(s_bounds),
        super_range=jnp.asarray(s_range),
        treelet_bounds=jnp.asarray(t_bounds),
        tris_padded=jnp.asarray(rows_out),
        leaf_size=k,
        n_supers=len(super_rows),
        n_treelets=n_t,
        ts_max=int(s_range[:, 1].max()) if len(super_rows) else 0,
    )
