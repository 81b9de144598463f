"""Host-side BVH build + TPU-friendly stackless layout.

Build semantics follow the reference (yuki/src/bvh.rs:305-522): recursive
top-down build over primitive centroids with three split methods —
  * "sah"          : 12-bucket surface-area heuristic (bvh.rs:452-522)
  * "middle"       : centroid-midpoint partition (bvh.rs:438-450)
  * "equal_counts" : median split (bvh.rs:422-436)
SAH/middle fall back to equal-counts on degenerate splits, exactly like the
reference (bvh.rs:347-365).

Layout diverges deliberately: the reference flattens to a 32-byte node array
and traverses with a 64-entry stack ordered by dir_is_neg[axis]
(bvh.rs:160-232).  Per-lane stacks are poison for a lockstep vector machine,
so we instead *thread* the tree: for each of the 8 ray-direction octants we
precompute (hit_link, miss_link) per node, where hit_link of an interior
node is its near child for that octant and miss_link skips the subtree.
Traversal is then a single while-loop with no stack and the same
near-to-far visit order the reference's stack achieves — state per ray is
just the current node id.

Leaves are additionally capped at ``max_leaf_size`` prims (the builder
splits any fatter SAH leaf with equal-counts) so the leaf test unrolls to a
fixed, maskable number of primitive intersections per visit.
"""

from __future__ import annotations

import sys
from dataclasses import dataclass
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

SENTINEL = np.int32(-1)


@dataclass
class BvhArrays:
    """Device pytree of the threaded BVH."""

    node_lo: Any  # [M,3] f32
    node_hi: Any  # [M,3] f32
    prim_offset: Any  # [M] i32 (leaf: first index into prim_order)
    prim_count: Any  # [M] i32 (0 = interior)
    links: Any  # [8, M, 2] i32 — per octant (hit, miss)
    prim_order: Any  # [P] i32 — BVH leaf order -> original prim index


jax.tree_util.register_pytree_node(
    BvhArrays,
    lambda b: (
        [b.node_lo, b.node_hi, b.prim_offset, b.prim_count, b.links, b.prim_order],
        None,
    ),
    lambda _, ch: BvhArrays(*ch),
)


@dataclass
class BvhHost:
    """Host numpy BVH + tree structure, kept for visualization
    (node_bounds(level), bvh.rs:121-157) and bounds queries."""

    node_lo: np.ndarray
    node_hi: np.ndarray
    prim_offset: np.ndarray
    prim_count: np.ndarray
    child0: np.ndarray  # [M] i32, -1 for leaf
    child1: np.ndarray
    axis: np.ndarray  # [M] u8 split axis
    depth: np.ndarray  # [M] i32 node depth
    links: np.ndarray  # [8,M,2]
    prim_order: np.ndarray
    max_leaf: int

    def bounds(self) -> tuple[np.ndarray, np.ndarray]:
        return self.node_lo[0], self.node_hi[0]

    def node_bounds(self, level: int) -> tuple[np.ndarray, np.ndarray]:
        """AABBs of nodes at tree depth `level` (leaves above that level are
        included at their own depth), for BVH visualization."""
        at = self.depth == level
        # Include shallower leaves like the reference's recursion terminating early.
        leaf_above = (self.depth < level) & (self.prim_count > 0)
        sel = at | leaf_above
        return self.node_lo[sel], self.node_hi[sel]

    def to_device(self) -> BvhArrays:
        return BvhArrays(
            node_lo=jnp.asarray(self.node_lo),
            node_hi=jnp.asarray(self.node_hi),
            prim_offset=jnp.asarray(self.prim_offset),
            prim_count=jnp.asarray(self.prim_count),
            links=jnp.asarray(self.links),
            prim_order=jnp.asarray(self.prim_order),
        )


def _surface_area(lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    d = np.maximum(hi - lo, 0.0)
    return 2.0 * (d[..., 0] * d[..., 1] + d[..., 2] * d[..., 1] + d[..., 0] * d[..., 2])


def build_bvh(
    tri_p: np.ndarray,
    split_method: str = "sah",
    max_shapes_in_node: int = 1,
    max_leaf_size: int = 4,
    use_native: bool = True,
) -> BvhHost:
    """Build over triangle soup tri_p [T,3,3] (corner-major).

    Dispatches to the C++ builder (native/bvh_builder.cpp — same algorithm,
    ~30x faster on the single host core) and falls back to this python
    implementation when the toolchain is unavailable."""
    n = tri_p.shape[0]
    lo = tri_p.min(axis=1).astype(np.float32)  # [T,3]
    hi = tri_p.max(axis=1).astype(np.float32)
    if use_native:
        from .native import native_build_bvh

        fields = native_build_bvh(
            lo, hi, split_method, max(1, int(max_shapes_in_node)),
            int(max_leaf_size),
        )
        if fields is not None:
            return BvhHost(
                prim_order=fields.pop("prim_order"),
                max_leaf=int(fields["prim_count"].max()),
                **fields,
            )
    centroid = (0.5 * (lo + hi)).astype(np.float32)
    max_shapes_in_node = max(1, int(max_shapes_in_node))
    max_leaf = max(max_shapes_in_node, int(max_leaf_size))

    # indices permuted in place during the build; leaves reference ranges of it
    order = np.arange(n, dtype=np.int32)

    node_lo, node_hi = [], []
    prim_offset, prim_count = [], []
    child0, child1, axis_l, depth_l = [], [], [], []
    ordered = []  # final prim order

    sys.setrecursionlimit(max(10000, sys.getrecursionlimit()))

    def new_node(depth):
        i = len(node_lo)
        node_lo.append(None)
        node_hi.append(None)
        prim_offset.append(0)
        prim_count.append(0)
        child0.append(-1)
        child1.append(-1)
        axis_l.append(0)
        depth_l.append(depth)
        return i

    def build_range(start: int, end: int, depth: int) -> int:
        node = new_node(depth)
        idx = order[start:end]
        b_lo = lo[idx].min(axis=0)
        b_hi = hi[idx].max(axis=0)
        node_lo[node] = b_lo
        node_hi[node] = b_hi
        count = end - start

        def make_leaf():
            prim_offset[node] = len(ordered)
            prim_count[node] = count
            ordered.extend(idx.tolist())
            return node

        if count <= max_shapes_in_node:
            return make_leaf()

        c = centroid[idx]
        c_lo, c_hi = c.min(axis=0), c.max(axis=0)
        axis = int(np.argmax(c_hi - c_lo))
        if c_hi[axis] == c_lo[axis]:
            if count <= max_leaf:
                return make_leaf()
            # Degenerate centroids but leaf too fat for the vector leaf
            # test: split by equal counts anyway (divergence: reference
            # would emit one fat leaf here).
            mid = start + count // 2
        else:
            mid = None
            if split_method == "sah":
                mid = _split_sah(idx, c, c_lo, c_hi, axis, b_lo, b_hi, start)
                if mid is not None and mid < 0:  # SAH says leaf
                    if count <= max_leaf:
                        return make_leaf()
                    mid = None  # forced split for the vector leaf test
                if mid in (start, end):
                    mid = None
            elif split_method == "middle":
                mid = _split_middle(idx, c, c_lo, c_hi, axis, start)
                if mid in (start, end):
                    mid = None
            if mid is None:
                mid = _split_equal(idx, c, axis, start)

        axis_l[node] = axis
        c0 = build_range(start, mid, depth + 1)
        c1 = build_range(mid, end, depth + 1)
        child0[node] = c0
        child1[node] = c1
        return node

    def _split_equal(idx, c, axis, start):
        count = len(idx)
        mid_off = count // 2
        part = np.argpartition(c[:, axis], mid_off)
        order[start : start + count] = idx[part]
        return start + mid_off

    def _split_middle(idx, c, c_lo, c_hi, axis, start):
        mid_value = 0.5 * (c_lo[axis] + c_hi[axis])
        mask = c[:, axis] < mid_value
        left = idx[mask]
        right = idx[~mask]
        order[start : start + len(idx)] = np.concatenate([left, right])
        return start + len(left)

    def _split_sah(idx, c, c_lo, c_hi, axis, b_lo, b_hi, start):
        count = len(idx)
        if count <= 2:
            return start  # reference: mid = start -> caller falls back
        n_buckets = 12
        offs = (c[:, axis] - c_lo[axis]) / (c_hi[axis] - c_lo[axis])
        b = np.minimum((n_buckets * offs).astype(np.int64), n_buckets - 1)
        b = np.maximum(b, 0)
        # Per-bucket bounds/counts, vectorized.
        counts = np.bincount(b, minlength=n_buckets)
        blo = np.full((n_buckets, 3), np.inf, dtype=np.float32)
        bhi = np.full((n_buckets, 3), -np.inf, dtype=np.float32)
        for k in range(3):
            np.minimum.at(blo[:, k], b, lo[idx][:, k])
            np.maximum.at(bhi[:, k], b, hi[idx][:, k])
        # Prefix/suffix bound scans.
        pre_lo = np.minimum.accumulate(blo, axis=0)
        pre_hi = np.maximum.accumulate(bhi, axis=0)
        suf_lo = np.minimum.accumulate(blo[::-1], axis=0)[::-1]
        suf_hi = np.maximum.accumulate(bhi[::-1], axis=0)[::-1]
        pre_n = np.cumsum(counts)
        suf_n = np.cumsum(counts[::-1])[::-1]
        total_sa = max(_surface_area(b_lo, b_hi), 1e-10)
        i = np.arange(n_buckets - 1)
        sa0 = np.where(pre_n[i] > 0, _surface_area(pre_lo[i], pre_hi[i]), 0.0)
        sa1 = np.where(suf_n[i + 1] > 0, _surface_area(suf_lo[i + 1], suf_hi[i + 1]), 0.0)
        costs = 1.0 + (pre_n[i] * sa0 + suf_n[i + 1] * sa1) / total_sa
        best = int(np.argmin(costs))
        if costs[best] < count:  # leaf_cost = shape_count (bvh.rs:513)
            mask = b <= best
            left = idx[mask]
            right = idx[~mask]
            order[start : start + count] = np.concatenate([left, right])
            return start + len(left)
        return -1  # leaf

    build_range(0, n, 0)

    m = len(node_lo)
    host = BvhHost(
        node_lo=np.stack(node_lo).astype(np.float32),
        node_hi=np.stack(node_hi).astype(np.float32),
        prim_offset=np.asarray(prim_offset, dtype=np.int32),
        prim_count=np.asarray(prim_count, dtype=np.int32),
        child0=np.asarray(child0, dtype=np.int32),
        child1=np.asarray(child1, dtype=np.int32),
        axis=np.asarray(axis_l, dtype=np.int32),
        depth=np.asarray(depth_l, dtype=np.int32),
        links=np.zeros((8, m, 2), dtype=np.int32),
        prim_order=np.asarray(ordered, dtype=np.int32),
        # Actual fattest leaf: static unroll bound for the masked leaf test.
        max_leaf=int(np.max(np.asarray(prim_count, dtype=np.int32))),
    )
    host.links = _thread_links(host)
    return host


def _thread_links(h: BvhHost) -> np.ndarray:
    """Compute per-octant (hit, miss) link tables.

    Octant o encodes direction signs: bit0 = d.x < 0, bit1 = d.y < 0,
    bit2 = d.z < 0.  The near child of an interior node for octant o is
    child0 if the ray direction is non-negative along the split axis
    (matching the reference's dir_is_neg front-to-back order, bvh.rs:197-207).
    """
    m = len(h.child0)
    links = np.zeros((8, m, 2), dtype=np.int32)
    is_leaf = h.prim_count > 0
    for o in range(8):
        neg = [(o >> k) & 1 for k in range(3)]
        hit = np.full(m, SENTINEL, dtype=np.int32)
        miss = np.full(m, SENTINEL, dtype=np.int32)
        stack = [(0, SENTINEL)]
        while stack:
            node, miss_t = stack.pop()
            miss[node] = miss_t
            if is_leaf[node]:
                hit[node] = miss_t
            else:
                c0, c1 = h.child0[node], h.child1[node]
                if neg[h.axis[node]]:
                    near, far = c1, c0
                else:
                    near, far = c0, c1
                hit[node] = near
                stack.append((far, miss_t))
                stack.append((near, far))
        links[o, :, 0] = hit
        links[o, :, 1] = miss
    return links
