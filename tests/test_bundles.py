"""Sublane-bundle slot traversal tests (interpret mode on CPU).

The bundle engine (ops/trace_bundles.py) regroups the slot stream around
8-ray bundles with per-bundle OR'd candidate words; results must stay
bitwise-exact vs the dense sweep (the OR superset adds no accepted hits
— see the module docstring's containment argument), including misses,
dead lanes, overflow flagging, and tie determinism."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yuki_tpu import transforms as tf
from yuki_tpu import traverse
from yuki_tpu.intersect import F32_MAX
from yuki_tpu.ops.trace_stream import cross_words
from yuki_tpu.ops.trace_bundles import (
    BUN,
    SPR,
    bundle_slot_layout,
    bundle_slot_fill,
    bundle_words,
    bundles_any_w,
    bundles_closest_w,
)
from yuki_tpu.scene.data import SceneBuilder
from yuki_tpu.treelets import build_treelets


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


def closest(ch, o, d, t_max, C=64, mult=None):
    n_b = o.shape[0] // BUN
    if mult is None:
        mult = (n_b * C) // max(n_b, 1) + SPR  # generous
    bw = bundle_words(cross_words(ch, o, d, t_max))
    return bundles_closest_w(
        ch, bw, o, d, t_max, C=C, mult=mult, interpret=True
    )


class TestBundleSlots:
    def test_layout_exact_complete(self, soup):
        """Every valid bundle-slot maps to a real (bundle, chunk)
        candidate of its row's chunk; every candidate gets one slot."""
        from yuki_tpu.ops.trace_stream import extract_lists

        sc, ch = soup
        n, C = 256, 16
        n_b = n // BUN
        o, d = rays(n, 8)
        tm = jnp.full(n, F32_MAX)
        lists, _ = extract_lists(
            bundle_words(cross_words(ch, o, d, tm)), C)
        max_rows = -(-(2 * n_b * C + ch.n_treelets * SPR) // SPR // 8) * 8
        pos_s, seg, aligned_off, total = bundle_slot_layout(
            n_b, ch.n_treelets, lists, C)
        slot_pos, row_chunk, valid = jax.jit(
            bundle_slot_fill, static_argnums=(0, 1, 5, 6)
        )(n_b, ch.n_treelets, pos_s, seg, aligned_off, C, max_rows)
        assert int(total) <= max_rows * SPR
        lists = np.asarray(lists)
        slot_pos, row_chunk, valid = map(
            np.asarray, (slot_pos, row_chunk, valid))
        seen = set()
        for j in range(max_rows):
            for l in range(SPR):
                if valid[j, l]:
                    p = slot_pos[j, l]
                    b_, m = p // C, p % C
                    assert lists[b_, m] == row_chunk[j], (j, l, p)
                    assert p not in seen
                    seen.add(p)
        want = {(b_ * C + m) for b_ in range(n_b) for m in range(C)
                if lists[b_, m] >= 0}
        assert seen == want

    def test_rows_single_chunk(self, soup):
        """SPR alignment guarantees one chunk per slot row (the kernel
        contract): no row may hold two chunks' slots."""
        from yuki_tpu.ops.trace_stream import extract_lists

        sc, ch = soup
        n, C = 512, 32
        n_b = n // BUN
        o, d = rays(n, 12)
        tm = jnp.full(n, F32_MAX)
        lists, _ = extract_lists(
            bundle_words(cross_words(ch, o, d, tm)), C)
        max_rows = -(-(2 * n_b * C + ch.n_treelets * SPR) // SPR // 8) * 8
        pos_s, seg, aligned_off, _ = bundle_slot_layout(
            n_b, ch.n_treelets, lists, C)
        slot_pos, row_chunk, valid = bundle_slot_fill(
            n_b, ch.n_treelets, pos_s, seg, aligned_off, C, max_rows)
        lists = np.asarray(lists)
        slot_pos, row_chunk, valid = map(
            np.asarray, (slot_pos, row_chunk, valid))
        for j in range(max_rows):
            chunks = {
                lists[slot_pos[j, l] // C, slot_pos[j, l] % C]
                for l in range(SPR) if valid[j, l]
            }
            assert len(chunks) <= 1


class TestBundlesClosest:
    def test_matches_dense(self, soup):
        sc, ch = soup
        o, d = rays(1024, 1)
        t_max = jnp.full(1024, F32_MAX)
        tref, pref, _, _ = traverse.intersect_dense(sc.data, o, d, t_max)
        t, p, ov, ok = closest(ch, o, d, t_max, C=64, mult=80)
        assert bool(ok)
        assert not bool(ov.any())
        assert np.array_equal(np.asarray(p), np.asarray(pref))
        assert np.allclose(np.asarray(t), np.asarray(tref), rtol=1e-5)

    def test_non_overflow_exact_under_small_C(self, soup):
        sc, ch = soup
        o, d = rays(512, 2)
        t_max = jnp.full(512, F32_MAX)
        tref, pref, _, _ = traverse.intersect_dense(sc.data, o, d, t_max)
        t, p, ov, ok = closest(ch, o, d, t_max, C=8, mult=12)
        assert bool(ok)
        ov = np.asarray(ov)
        assert ov.any()
        keep = ~ov
        assert np.array_equal(np.asarray(p)[keep], np.asarray(pref)[keep])
        assert np.allclose(np.asarray(t)[keep], np.asarray(tref)[keep],
                           rtol=1e-5)

    def test_missing_rays_get_defaults(self, soup):
        sc, ch = soup
        n = 256
        o = jnp.broadcast_to(jnp.asarray([100.0, 100.0, 100.0]), (n, 3))
        d = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), (n, 3))
        t_max = jnp.full(n, F32_MAX)
        t, p, ov, ok = closest(ch, o, d, t_max, C=16, mult=20)
        assert bool(ok)
        assert (np.asarray(p) == -1).all()
        assert np.allclose(np.asarray(t), F32_MAX)

    def test_mixed_live_dead(self, soup):
        sc, ch = soup
        o, d = rays(512, 3)
        t_max = jnp.where(jnp.arange(512) % 3 == 0, 0.0, F32_MAX)
        tref, pref, _, _ = traverse.intersect_dense(sc.data, o, d, t_max)
        t, p, ov, ok = closest(ch, o, d, t_max, C=64, mult=80)
        assert bool(ok)
        keep = ~np.asarray(ov)
        dead = np.asarray(t_max) == 0.0
        assert (np.asarray(p)[dead] == -1).all()
        assert np.array_equal(np.asarray(p)[keep & ~dead],
                              np.asarray(pref)[keep & ~dead])

    def test_partition_invariant(self, soup):
        """Bundle composition must not change per-ray results: the same
        rays traced inside two different wave mixtures agree bitwise."""
        sc, ch = soup
        o, d = rays(256, 4)
        t_max = jnp.full(256, F32_MAX)
        t_a, p_a, _, _ = closest(ch, o, d, t_max, C=64, mult=80)
        o2, d2 = rays(256, 5)
        o_mix = jnp.concatenate([o2, o])
        d_mix = jnp.concatenate([d2, d])
        t_mix = jnp.full(512, F32_MAX)
        t_b, p_b, _, _ = closest(ch, o_mix, d_mix, t_mix, C=64, mult=80)
        assert np.array_equal(np.asarray(p_a), np.asarray(p_b)[256:])
        assert np.array_equal(np.asarray(t_a), np.asarray(t_b)[256:])


class TestBundlesAny:
    def test_matches_dense(self, soup):
        sc, ch = soup
        o, d = rays(1024, 6)
        t_max = jnp.full(1024, F32_MAX)
        _, pref, _, _ = traverse.intersect_dense(sc.data, o, d, t_max)
        skip = jnp.full(1024, -2, jnp.int32)
        bw = bundle_words(cross_words(ch, o, d, t_max))
        occ, ov, ok = bundles_any_w(
            ch, bw, o, d, t_max, skip, C=64, mult=80, interpret=True)
        assert bool(ok)
        assert not bool(ov.any())
        assert np.array_equal(np.asarray(occ), np.asarray(pref) >= 0)

    def test_dead_lanes_unoccluded(self, soup):
        sc, ch = soup
        o, d = rays(256, 7)
        t_max = jnp.zeros(256)
        skip = jnp.full(256, -2, jnp.int32)
        bw = bundle_words(cross_words(ch, o, d, t_max))
        occ, ov, ok = bundles_any_w(
            ch, bw, o, d, t_max, skip, C=16, mult=20, interpret=True)
        assert not bool(occ.any())


class TestBundleSizes:
    """bun is a pure scheduling knob: any bundle size must reproduce the
    dense reference exactly (closest AND any), including mixed live/dead
    lanes."""

    @pytest.mark.parametrize("bun", [2, 4, 16])
    def test_closest_matches_dense(self, soup, bun):
        sc, ch = soup
        o, d = rays(512, 8)
        t_max = jnp.where(jnp.arange(512) % 5 == 0, 0.0, F32_MAX)
        tref, pref, _, _ = traverse.intersect_dense(sc.data, o, d, t_max)
        bw = bundle_words(cross_words(ch, o, d, t_max), bun)
        t, p, ov, ok = bundles_closest_w(
            ch, bw, o, d, t_max, C=64, mult=80, interpret=True, bun=bun)
        assert bool(ok)
        keep = ~np.asarray(ov)
        assert np.array_equal(np.asarray(p)[keep], np.asarray(pref)[keep])
        assert np.allclose(np.asarray(t)[keep], np.asarray(tref)[keep],
                           rtol=1e-5)

    @pytest.mark.parametrize("bun", [4, 16])
    def test_any_matches_dense(self, soup, bun):
        sc, ch = soup
        o, d = rays(512, 9)
        t_max = jnp.full(512, F32_MAX)
        _, pref, _, _ = traverse.intersect_dense(sc.data, o, d, t_max)
        skip = jnp.full(512, -2, jnp.int32)
        bw = bundle_words(cross_words(ch, o, d, t_max), bun)
        occ, ov, ok = bundles_any_w(
            ch, bw, o, d, t_max, skip, C=64, mult=80, interpret=True,
            bun=bun)
        assert bool(ok)
        keep = ~np.asarray(ov)
        assert np.array_equal(np.asarray(occ)[keep],
                              (np.asarray(pref) >= 0)[keep])
