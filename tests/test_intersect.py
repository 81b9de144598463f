"""Geometry kernel tests: triangle/sphere/AABB and BVH-vs-dense agreement."""

import numpy as np
import jax.numpy as jnp

from yuki_tpu import bvh as bvh_mod
from yuki_tpu import intersect as ix
from yuki_tpu import traverse
from yuki_tpu import transforms as tf
from yuki_tpu.scene.data import SceneBuilder


def make_rays(n, seed=0, origin_box=2.0):
    rng = np.random.default_rng(seed)
    o = (rng.random((n, 3), dtype=np.float32) - 0.5) * origin_box
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


class TestTriangle:
    def test_basic_hit(self):
        p0 = jnp.asarray([[0.0, 0, 0]])
        p1 = jnp.asarray([[1.0, 0, 0]])
        p2 = jnp.asarray([[0.0, 1, 0]])
        o = jnp.asarray([[0.2, 0.2, 1.0]])
        d = jnp.asarray([[0.0, 0, -1.0]])
        h = ix.ray_triangle(o, d, jnp.asarray([1e30]), p0, p1, p2)
        assert bool(h.hit[0])
        assert float(h.t[0]) == 1.0

    def test_miss_outside(self):
        p0 = jnp.asarray([[0.0, 0, 0]])
        p1 = jnp.asarray([[1.0, 0, 0]])
        p2 = jnp.asarray([[0.0, 1, 0]])
        o = jnp.asarray([[0.9, 0.9, 1.0]])
        d = jnp.asarray([[0.0, 0, -1.0]])
        h = ix.ray_triangle(o, d, jnp.asarray([1e30]), p0, p1, p2)
        assert not bool(h.hit[0])

    def test_respects_t_max(self):
        p0 = jnp.asarray([[0.0, 0, 0]])
        p1 = jnp.asarray([[1.0, 0, 0]])
        p2 = jnp.asarray([[0.0, 1, 0]])
        o = jnp.asarray([[0.2, 0.2, 1.0]])
        d = jnp.asarray([[0.0, 0, -1.0]])
        h = ix.ray_triangle(o, d, jnp.asarray([0.5]), p0, p1, p2)
        assert not bool(h.hit[0])

    def test_behind_origin_misses(self):
        p0 = jnp.asarray([[0.0, 0, 2]])
        p1 = jnp.asarray([[1.0, 0, 2]])
        p2 = jnp.asarray([[0.0, 1, 2]])
        o = jnp.asarray([[0.2, 0.2, 1.0]])
        d = jnp.asarray([[0.0, 0, -1.0]])
        h = ix.ray_triangle(o, d, jnp.asarray([1e30]), p0, p1, p2)
        assert not bool(h.hit[0])

    def test_barycentric_interp(self):
        p0 = jnp.asarray([[0.0, 0, 0]])
        p1 = jnp.asarray([[1.0, 0, 0]])
        p2 = jnp.asarray([[0.0, 1, 0]])
        o = jnp.asarray([[0.25, 0.25, 1.0]])
        d = jnp.asarray([[0.0, 0, -1.0]])
        h = ix.ray_triangle(o, d, jnp.asarray([1e30]), p0, p1, p2)
        p_hit = (
            h.b0[:, None] * p0 + h.b1[:, None] * p1 + (1 - h.b0 - h.b1)[:, None] * p2
        )
        assert np.allclose(p_hit, [[0.25, 0.25, 0.0]], atol=1e-6)


class TestSlab:
    def test_hit_and_miss(self):
        o = jnp.asarray([[0.0, 0, -5], [0, 3, -5]])
        d = jnp.asarray([[0.0, 0, 1], [0, 0, 1.0]])
        inv_d = 1.0 / d
        lo = jnp.asarray([-1.0, -1, -1])
        hi = jnp.asarray([1.0, 1, 1])
        t_max = jnp.asarray([1e30, 1e30])
        hit = ix.slab_test(o, inv_d, t_max, lo, hi)
        assert bool(hit[0]) and not bool(hit[1])

    def test_origin_inside(self):
        o = jnp.asarray([[0.0, 0, 0]])
        d = jnp.asarray([[0.0, 0, 1.0]])
        hit = ix.slab_test(
            o, 1.0 / d, jnp.asarray([1e30]),
            jnp.asarray([-1.0, -1, -1]), jnp.asarray([1.0, 1, 1]),
        )
        assert bool(hit[0])

    def test_axis_parallel_on_plane(self):
        """Ray origin exactly on a slab plane with parallel direction:
        0*inf=NaN flows through Rust-style NaN-ignoring min/max and the
        reference reports a *miss* here (t1.x -> NaN, fmax(-inf,NaN) = -inf
        caps tmax).  We must match that, and crucially never produce NaN."""
        o = jnp.asarray([[1.0, 0.0, -5.0]])  # exactly on x=1 plane
        d = jnp.asarray([[0.0, 0.0, 1.0]])
        hit = ix.slab_test(
            o, 1.0 / d, jnp.asarray([1e30]),
            jnp.asarray([-1.0, -1, -1]), jnp.asarray([1.0, 1, 1]),
        )
        assert not bool(hit[0])  # reference (Rust f32 min/max) parity
        # ...but just inside the plane it hits.
        o2 = jnp.asarray([[1.0 - 1e-4, 0.0, -5.0]])
        hit2 = ix.slab_test(
            o2, 1.0 / d, jnp.asarray([1e30]),
            jnp.asarray([-1.0, -1, -1]), jnp.asarray([1.0, 1, 1]),
        )
        assert bool(hit2[0])


class TestSphere:
    def _unit_spheres(self):
        b = SceneBuilder()
        m = b.add_matte()
        b.add_sphere(tf.translation((0, 0, 0)), 1.0, m)
        b.add_mesh(tf.Transform.identity(), [0, 1, 2],
                   [(10, 10, 10), (11, 10, 10), (10, 11, 10)], material=m)
        return b.build()

    def test_hit_front(self):
        sc = self._unit_spheres()
        o = jnp.asarray([[0.0, 0, 5]])
        d = jnp.asarray([[0.0, 0, -1.0]])
        h = ix.ray_spheres(o, d, jnp.asarray([1e30]), sc.data.spheres)
        assert bool(h.hit[0])
        assert float(h.t[0]) == np.float32(4.0)

    def test_inside_hits_far_side(self):
        sc = self._unit_spheres()
        o = jnp.asarray([[0.0, 0, 0]])
        d = jnp.asarray([[0.0, 0, -1.0]])
        h = ix.ray_spheres(o, d, jnp.asarray([1e30]), sc.data.spheres)
        assert bool(h.hit[0])
        assert abs(float(h.t[0]) - 1.0) < 1e-5


def _random_soup(n_tris=200, seed=0):
    rng = np.random.default_rng(seed)
    base = (rng.random((n_tris, 1, 3)) - 0.5) * 4
    tri = base + rng.standard_normal((n_tris, 3, 3)) * 0.3
    return tri.astype(np.float32)


class TestBvhMatchesDense:
    def test_closest_hit_agreement(self):
        tri = _random_soup()
        b = SceneBuilder()
        m = b.add_matte()
        for t in tri:
            b.add_mesh(tf.Transform.identity(), [0, 1, 2], t, material=m)
        for split in ("sah", "middle", "equal_counts"):
            sc = b.build(split_method=split)
            o, d = make_rays(512, seed=split.__hash__() % 100)
            t_max = jnp.full(512, ix.F32_MAX)
            td, pd, _, _ = traverse.intersect_dense(sc.data, o, d, t_max)
            tb, pb, _, _ = traverse.intersect_bvh(
                sc.data, o, d, t_max, sc.meta.bvh_max_leaf
            )
            # t must agree wherever either hits (prims may differ on exact
            # ties at shared edges).
            assert np.allclose(np.asarray(td), np.asarray(tb), rtol=1e-5), split
            assert np.array_equal(np.asarray(pd) >= 0, np.asarray(pb) >= 0), split

    def test_any_hit_agreement(self):
        tri = _random_soup(100, seed=5)
        b = SceneBuilder()
        m = b.add_matte()
        for t in tri:
            b.add_mesh(tf.Transform.identity(), [0, 1, 2], t, material=m)
        sc = b.build()
        o, d = make_rays(512, seed=9)
        t_max = jnp.full(512, 1.0)
        skip = jnp.full(512, -1, dtype=jnp.int32)
        dense = traverse.any_intersect_dense(sc.data, o, d, t_max, skip)

        class MetaBvh:
            traversal = "bvh"
            bvh_max_leaf = sc.meta.bvh_max_leaf

        via_bvh = traverse.any_intersect(sc.data, MetaBvh, o, d, t_max, skip)
        # dense path doesn't include spheres; none present here
        assert np.array_equal(np.asarray(dense), np.asarray(via_bvh))


class TestBvhStructure:
    def test_leaf_partition(self):
        tri = _random_soup(137, seed=2)
        h = bvh_mod.build_bvh(tri, split_method="sah", max_leaf_size=4)
        # every prim appears exactly once in leaf order
        assert sorted(h.prim_order.tolist()) == list(range(137))
        assert h.prim_count.max() <= 4
        # leaf ranges tile prim_order
        leaves = [(o, c) for o, c in zip(h.prim_offset, h.prim_count) if c > 0]
        covered = sorted(
            i for o, c in leaves for i in range(o, o + c)
        )
        assert covered == list(range(137))

    def test_links_terminate(self):
        tri = _random_soup(64, seed=3)
        h = bvh_mod.build_bvh(tri)
        m = len(h.child0)
        for o in range(8):
            # following miss links from any node must reach -1 within m steps
            node = 0
            for _ in range(m + 1):
                node = h.links[o, node, 1]
                if node == -1:
                    break
            assert node == -1

    def test_node_bounds_contain_children(self):
        tri = _random_soup(64, seed=4)
        h = bvh_mod.build_bvh(tri)
        for n in range(len(h.child0)):
            for c in (h.child0[n], h.child1[n]):
                if c >= 0:
                    assert (h.node_lo[n] <= h.node_lo[c] + 1e-6).all()
                    assert (h.node_hi[n] >= h.node_hi[c] - 1e-6).all()
