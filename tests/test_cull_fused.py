"""Fused cull kernel (ops/trace_cull.py) parity tests — interpret mode.

candidate_lists_fused must be BITWISE-identical to the XLA reference
candidate_lists_2l (same lists, same order, same overflow flags) on
live rays, dead lanes, misses, and overflow-inducing dense clusters.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from yuki_tpu import transforms as tf
from yuki_tpu.intersect import F32_MAX
from yuki_tpu.ops.trace_cull import candidate_lists_fused
from yuki_tpu.ops.trace_stream import candidate_lists_2l
from yuki_tpu.scene.data import SceneBuilder
from yuki_tpu.treelets import build_treelets


@pytest.fixture(scope="module")
def soup():
    rng = np.random.default_rng(23)
    n_tris = 900
    base = (rng.random((n_tris, 1, 3)) - 0.5) * 6
    tri = (base + rng.standard_normal((n_tris, 3, 3)) * 0.25).astype(
        np.float32)
    b = SceneBuilder()
    m = b.add_matte()
    for t in tri:
        b.add_mesh(tf.Transform.identity(), [0, 1, 2], t, material=m)
    sc = b.build(split_method="sah", max_shapes_in_node=4)
    ch = build_treelets(
        sc.bvh_host,
        np.stack(
            [np.asarray(sc.data.tris.p0), np.asarray(sc.data.tris.p1),
             np.asarray(sc.data.tris.p2)], axis=1,
        ),
        np.asarray(sc.data.tris.area_light),
        leaf_size=16,
        super_size=16,
    )
    return sc, ch


def rays(n, seed):
    rng = np.random.default_rng(seed)
    o = jnp.asarray((rng.random((n, 3), np.float32) - 0.5) * 6)
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o, jnp.asarray(d)


def assert_bitwise(ch, o, d, tm, C=8, S=6):
    ref_l, ref_ov = candidate_lists_2l(ch, o, d, tm, C, S=S)
    got_l, got_ov = candidate_lists_fused(
        ch, o, d, tm, C=C, S=S, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_ov), np.asarray(ref_ov))
    ok = ~np.asarray(ref_ov)
    np.testing.assert_array_equal(
        np.asarray(got_l)[ok], np.asarray(ref_l)[ok])


class TestFusedCull:
    def test_bitwise_vs_2l(self, soup):
        sc, ch = soup
        o, d = rays(256, 3)
        tm = jnp.full(256, F32_MAX)
        assert_bitwise(ch, o, d, tm)

    def test_dead_and_short_lanes(self, soup):
        sc, ch = soup
        o, d = rays(256, 9)
        rng = np.random.default_rng(4)
        tm = jnp.asarray(
            np.where(rng.random(256) < 0.3, 0.0,
                     np.where(rng.random(256) < 0.5, 0.8, F32_MAX))
            .astype(np.float32))
        assert_bitwise(ch, o, d, tm)

    def test_overflow_flags(self, soup):
        sc, ch = soup
        # Rays through the soup center cross many chunks: force C/S
        # overflow and check flags match the reference exactly.
        o, d = rays(128, 7)
        o = o * 0.05
        tm = jnp.full(128, F32_MAX)
        assert_bitwise(ch, o, d, tm, C=4, S=3)

    def test_group_batching(self, soup):
        sc, ch = soup
        o, d = rays(384, 5)
        tm = jnp.full(384, F32_MAX)
        ref_l, ref_ov = candidate_lists_fused(
            ch, o, d, tm, C=8, S=6, interpret=True, group=1)
        for g in (2, 3):
            got_l, got_ov = candidate_lists_fused(
                ch, o, d, tm, C=8, S=6, interpret=True, group=g)
            np.testing.assert_array_equal(
                np.asarray(got_l), np.asarray(ref_l))
            np.testing.assert_array_equal(
                np.asarray(got_ov), np.asarray(ref_ov))


class TestSkipSort:
    @pytest.fixture(scope="class")
    def treelet_scene(self):
        from yuki_tpu.scene.data import DENSE_TRI_THRESHOLD

        rng = np.random.default_rng(31)
        n_tris = DENSE_TRI_THRESHOLD + 64
        base = (rng.random((n_tris, 1, 3)) - 0.5) * 8
        tri = (base + rng.standard_normal((n_tris, 3, 3)) * 0.3).astype(
            np.float32)
        b = SceneBuilder("skip-sort-soup")
        m = b.add_matte(kd=(0.7, 0.6, 0.5))
        for t in tri:
            b.add_mesh(tf.Transform.identity(), [0, 1, 2], t, material=m)
        sc = b.build(split_method="sah", max_shapes_in_node=4)
        assert sc.meta.traversal == "treelet"
        return sc

    def test_skip_sort_bitwise(self, treelet_scene):
        """skip_sort must be bitwise-neutral: the slot pipeline is
        order-independent (per-ray lists, chunk-major slot sort,
        per-ray merge)."""
        from yuki_tpu import traverse

        sc = treelet_scene
        data, meta = sc.data, sc.meta
        o, d = rays(256, 13)
        o = o * 1.5
        tm = jnp.full(256, F32_MAX)
        old = traverse.FORCE_PALLAS_INTERPRET
        traverse.FORCE_PALLAS_INTERPRET = True
        try:
            a = traverse.intersect(data, meta, o, d, tm, skip_sort=False)
            b = traverse.intersect(data, meta, o, d, tm, skip_sort=True)
            np.testing.assert_array_equal(np.asarray(a.t), np.asarray(b.t))
            np.testing.assert_array_equal(
                np.asarray(a.prim), np.asarray(b.prim))
            skip = jnp.full(256, -2, jnp.int32)
            oa = traverse.any_intersect(data, meta, o, d, tm, skip,
                                        skip_sort=False)
            ob = traverse.any_intersect(data, meta, o, d, tm, skip,
                                        skip_sort=True)
            np.testing.assert_array_equal(np.asarray(oa), np.asarray(ob))
        finally:
            traverse.FORCE_PALLAS_INTERPRET = old
