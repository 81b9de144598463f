"""Bundle-walker traversal tests (ops/trace_walker.py, interpret mode).

The walker replaces the slot stream's sort/pack/merge with bundle-major
in-kernel carries; per-ray results must stay exact vs the dense sweep
(the OR-superset containment argument of its docstring), including
misses, dead lanes, overflow flagging, tie determinism, the area-light
skip, and partition invariance."""

import numpy as np
import jax.numpy as jnp
import pytest

from yuki_tpu import transforms as tf
from yuki_tpu import traverse
from yuki_tpu.intersect import F32_MAX
from yuki_tpu.ops.trace_stream import cross_words
from yuki_tpu.ops.trace_walker import (
    BUN,
    _bundle_pairs,
    walker_any_w,
    walker_closest_w,
)
from yuki_tpu.scene.data import SceneBuilder
from yuki_tpu.treelets import build_treelets


def _chunks_of(sc, leaf=16):
    return build_treelets(
        sc.bvh_host,
        np.stack(
            [np.asarray(sc.data.tris.p0), np.asarray(sc.data.tris.p1),
             np.asarray(sc.data.tris.p2)], axis=1,
        ),
        np.asarray(sc.data.tris.area_light),
        leaf_size=leaf,
        super_size=leaf,
    )


@pytest.fixture(scope="module")
def soup():
    rng = np.random.default_rng(11)
    n_tris = 500
    base = (rng.random((n_tris, 1, 3)) - 0.5) * 6
    tri = (base + rng.standard_normal((n_tris, 3, 3)) * 0.25).astype(
        np.float32)
    b = SceneBuilder()
    m = b.add_matte()
    for t in tri:
        b.add_mesh(tf.Transform.identity(), [0, 1, 2], t, material=m)
    sc = b.build(split_method="sah", max_shapes_in_node=4)
    return sc, _chunks_of(sc)


@pytest.fixture(scope="module")
def lit():
    """Scene with a rect area light: exercises the sampled-light skip
    (bvh.rs:287-293 parity through the walker's skip lane)."""
    rng = np.random.default_rng(23)
    b = SceneBuilder()
    m = b.add_matte()
    for i in range(200):
        base = (rng.random((1, 3)) - 0.5) * 6
        t = (base + rng.standard_normal((3, 3)) * 0.3).astype(np.float32)
        b.add_mesh(tf.Transform.identity(), [0, 1, 2], t, material=m)
    b.add_rect_light(
        tf.translation((0.0, 2.5, 0.0)), (4.0, 4.0, 4.0), (2.0, 2.0)
    )
    sc = b.build(split_method="sah", max_shapes_in_node=4)
    return sc, _chunks_of(sc)


def rays(n, seed):
    rng = np.random.default_rng(seed)
    o = jnp.asarray((rng.random((n, 3), np.float32) - 0.5) * 6)
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o, jnp.asarray(d)


def closest(ch, o, d, t_max, C=64, mult=None, skip=None):
    if mult is None:
        mult = C + 4
    w = cross_words(ch, o, d, t_max)
    return walker_closest_w(
        ch, w, o, d, t_max, C=C, mult=mult, interpret=True, skip=skip
    )


class TestBundlePairs:
    def test_pairs_complete_and_bundle_major(self):
        lists = jnp.asarray(
            [[3, 7, -1, -1], [-1, -1, -1, -1], [0, 1, 2, 5]], jnp.int32
        )
        pc, qb, n_pairs = _bundle_pairs(lists, 3, 16)
        pc, qb = np.asarray(pc), np.asarray(qb)
        assert int(n_pairs) == 4 + 4 + 4
        # bundle 0: chunks 3,7 then pads; bundle 1: forced empty quad;
        # bundle 2: 0,1,2,5.
        assert list(pc[:12]) == [3, 7, -1, -1, -1, -1, -1, -1, 0, 1, 2, 5]
        assert list(qb[:3]) == [0, 1, 2]
        assert (qb[3:] == 3).all()


class TestWalkerClosest:
    def test_matches_dense(self, soup):
        sc, ch = soup
        o, d = rays(1024, 1)
        t_max = jnp.full(1024, F32_MAX)
        tref, pref, _, _ = traverse.intersect_dense(sc.data, o, d, t_max)
        t, p, ov, ok = closest(ch, o, d, t_max, C=64)
        assert bool(ok)
        assert not bool(ov.any())
        assert np.array_equal(np.asarray(p), np.asarray(pref))
        assert np.allclose(np.asarray(t), np.asarray(tref), rtol=1e-5)

    def test_overflow_flagged_small_C(self, soup):
        sc, ch = soup
        o, d = rays(512, 2)
        t_max = jnp.full(512, F32_MAX)
        tref, pref, _, _ = traverse.intersect_dense(sc.data, o, d, t_max)
        t, p, ov, ok = closest(ch, o, d, t_max, C=8)
        assert bool(ok)
        ov = np.asarray(ov)
        assert ov.any()
        keep = ~ov
        assert np.array_equal(np.asarray(p)[keep], np.asarray(pref)[keep])

    def test_missing_rays_get_defaults(self, soup):
        sc, ch = soup
        n = 256
        o = jnp.broadcast_to(jnp.asarray([100.0, 100.0, 100.0]), (n, 3))
        d = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), (n, 3))
        t_max = jnp.full(n, F32_MAX)
        t, p, ov, ok = closest(ch, o, d, t_max, C=16)
        assert bool(ok)
        assert (np.asarray(p) == -1).all()
        assert np.allclose(np.asarray(t), F32_MAX)

    def test_mixed_live_dead(self, soup):
        sc, ch = soup
        o, d = rays(512, 3)
        t_max = jnp.where(jnp.arange(512) % 3 == 0, 0.0, F32_MAX)
        tref, pref, _, _ = traverse.intersect_dense(sc.data, o, d, t_max)
        t, p, ov, ok = closest(ch, o, d, t_max, C=64)
        assert bool(ok)
        keep = ~np.asarray(ov)
        dead = np.asarray(t_max) == 0.0
        assert (np.asarray(p)[dead] == -1).all()
        assert np.array_equal(np.asarray(p)[keep & ~dead],
                              np.asarray(pref)[keep & ~dead])

    def test_partition_invariant(self, soup):
        sc, ch = soup
        o, d = rays(256, 4)
        t_max = jnp.full(256, F32_MAX)
        t_a, p_a, _, _ = closest(ch, o, d, t_max, C=64)
        o2, d2 = rays(256, 5)
        o_mix = jnp.concatenate([o2, o])
        d_mix = jnp.concatenate([d2, d])
        t_mix = jnp.full(512, F32_MAX)
        t_b, p_b, _, _ = closest(ch, o_mix, d_mix, t_mix, C=64)
        assert np.array_equal(np.asarray(p_a), np.asarray(p_b)[256:])
        assert np.array_equal(np.asarray(t_a), np.asarray(t_b)[256:])

    def test_multi_segment_parity(self, soup, monkeypatch):
        """Forcing several SMEM segments (SEG_B below the wave's bundle
        count) must be result-invariant: per-bundle runs never split
        across segments and padded bundles are dead."""
        from yuki_tpu.ops import trace_walker as tw

        sc, ch = soup
        o, d = rays(1024, 12)
        t_max = jnp.full(1024, F32_MAX)
        t_ref, p_ref, _, _ = closest(ch, o, d, t_max, C=64)
        monkeypatch.setattr(tw, "SEG_B", 32)  # 128 bundles -> 4 segs
        t, p, ov, ok = closest(ch, o, d, t_max, C=64)
        assert bool(ok)
        assert np.array_equal(np.asarray(p), np.asarray(p_ref))
        assert np.array_equal(np.asarray(t), np.asarray(t_ref))

    def test_multi_segment_any(self, soup, monkeypatch):
        from yuki_tpu.ops import trace_walker as tw

        sc, ch = soup
        o, d = rays(512, 13)
        t_max = jnp.full(512, F32_MAX)
        skip = jnp.full(512, -2, jnp.int32)
        w = cross_words(ch, o, d, t_max)
        occ_ref, _, _ = walker_any_w(
            ch, w, o, d, t_max, skip, C=64, mult=70, interpret=True)
        monkeypatch.setattr(tw, "SEG_B", 16)  # 64 bundles -> 4 segs
        occ, ov, ok = walker_any_w(
            ch, w, o, d, t_max, skip, C=64, mult=70, interpret=True)
        assert bool(ok)
        assert np.array_equal(np.asarray(occ), np.asarray(occ_ref))

    def test_budget_blowout_flags_not_ok(self, soup):
        sc, ch = soup
        o, d = rays(256, 6)
        t_max = jnp.full(256, F32_MAX)
        _, _, _, ok = closest(ch, o, d, t_max, C=64, mult=1)
        assert not bool(ok)

    def test_skip_light_combined_wave(self, lit):
        sc, ch = lit
        o, d = rays(512, 7)
        t_max = jnp.full(512, F32_MAX)
        # Half the lanes skip area light 0 (a shadow sub-wave), half
        # trace normally.
        skip = jnp.where(jnp.arange(512) % 2 == 0, 0, -2).astype(
            jnp.int32)
        tref, pref, _, _ = traverse.intersect_dense(
            sc.data, o, d, t_max, skip_light=skip)
        t, p, ov, ok = closest(
            ch, o, d, t_max, C=64, skip=skip.astype(jnp.float32))
        assert bool(ok)
        keep = ~np.asarray(ov)
        assert np.array_equal(np.asarray(p)[keep], np.asarray(pref)[keep])
        assert np.allclose(np.asarray(t)[keep], np.asarray(tref)[keep],
                           rtol=1e-5)


class TestWalkerAny:
    def test_matches_dense(self, soup):
        sc, ch = soup
        o, d = rays(1024, 8)
        t_max = jnp.full(1024, F32_MAX)
        _, pref, _, _ = traverse.intersect_dense(sc.data, o, d, t_max)
        skip = jnp.full(1024, -2, jnp.int32)
        w = cross_words(ch, o, d, t_max)
        occ, ov, ok = walker_any_w(
            ch, w, o, d, t_max, skip, C=64, mult=70, interpret=True)
        assert bool(ok)
        assert not bool(ov.any())
        assert np.array_equal(np.asarray(occ), np.asarray(pref) >= 0)

    def test_skip_light(self, lit):
        sc, ch = lit
        o, d = rays(512, 9)
        t_max = jnp.full(512, F32_MAX)
        skip = jnp.zeros(512, jnp.int32)  # skip area light 0
        occ_ref = traverse.any_intersect_dense(
            sc.data, o, d, t_max, skip)
        w = cross_words(ch, o, d, t_max)
        occ, ov, ok = walker_any_w(
            ch, w, o, d, t_max, skip, C=64, mult=70, interpret=True)
        assert bool(ok)
        keep = ~np.asarray(ov)
        assert np.array_equal(np.asarray(occ)[keep],
                              np.asarray(occ_ref)[keep])

    def test_dead_lanes_unoccluded(self, soup):
        sc, ch = soup
        o, d = rays(256, 10)
        t_max = jnp.zeros(256)
        skip = jnp.full(256, -2, jnp.int32)
        w = cross_words(ch, o, d, t_max)
        occ, ov, ok = walker_any_w(
            ch, w, o, d, t_max, skip, C=16, mult=20, interpret=True)
        assert not bool(occ.any())


class TestDispatchIntegration:
    """The walker behind traverse's production dispatch (slot branch)
    agrees with the stream engine it replaces, through the full
    intersect()/any_intersect() entry points on a real treelet-mode
    scene (FORCE_PALLAS_INTERPRET)."""

    @pytest.fixture(scope="class")
    def treelet_scene(self):
        rng = np.random.default_rng(31)
        n_tris = 5000
        base = (rng.random((n_tris, 1, 3)) - 0.5) * 8
        tri = (base + rng.standard_normal((n_tris, 3, 3)) * 0.3).astype(
            np.float32)
        verts = tri.reshape(-1, 3)
        faces = np.arange(n_tris * 3, dtype=np.int32).reshape(-1, 3)
        b = SceneBuilder()
        m = b.add_matte()
        b.add_mesh(tf.Transform.identity(), faces, verts, material=m)
        sc = b.build(split_method="sah", max_shapes_in_node=4)
        assert sc.meta.traversal == "treelet"
        return sc

    def _flags(self, walker):
        traverse.FORCE_PALLAS_INTERPRET = True
        traverse.WALKER_CLOSEST = walker
        traverse.WALKER_ANY = walker

    def _restore(self):
        traverse.FORCE_PALLAS_INTERPRET = False
        traverse.WALKER_CLOSEST = False
        traverse.WALKER_ANY = False

    def test_intersect_parity(self, treelet_scene):
        sc = treelet_scene
        o, d = rays(512, 33)
        tm = jnp.full(512, F32_MAX)
        try:
            self._flags(False)
            ref = traverse.intersect(sc.data, sc.meta, o, d, tm,
                                     skip_sort=True)
            self._flags(True)
            got = traverse.intersect(sc.data, sc.meta, o, d, tm,
                                     skip_sort=True)
        finally:
            self._restore()
        assert np.array_equal(np.asarray(ref.prim), np.asarray(got.prim))
        assert np.allclose(np.asarray(ref.t), np.asarray(got.t),
                           rtol=1e-6)

    def test_any_parity(self, treelet_scene):
        sc = treelet_scene
        o, d = rays(512, 35)
        tm = jnp.full(512, 0.9999)
        skip = jnp.full(512, -2, jnp.int32)
        try:
            self._flags(False)
            ref = traverse.any_intersect(sc.data, sc.meta, o, d, tm,
                                         skip, skip_sort=True)
            self._flags(True)
            got = traverse.any_intersect(sc.data, sc.meta, o, d, tm,
                                         skip, skip_sort=True)
        finally:
            self._restore()
        assert np.array_equal(np.asarray(ref), np.asarray(got))
