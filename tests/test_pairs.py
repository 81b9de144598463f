"""Pair-list traversal tests (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from yuki_tpu import transforms as tf
from yuki_tpu import traverse
from yuki_tpu.intersect import F32_MAX
from yuki_tpu.ops.trace_pairs import (
    block_candidate_pairs,
    pairs_any,
    pairs_closest,
)
from yuki_tpu.scene.data import SceneBuilder
from yuki_tpu.treelets import build_treelets


@pytest.fixture(scope="module")
def soup():
    rng = np.random.default_rng(11)
    n_tris = 500
    base = (rng.random((n_tris, 1, 3)) - 0.5) * 6
    tri = (base + rng.standard_normal((n_tris, 3, 3)) * 0.25).astype(np.float32)
    b = SceneBuilder()
    m = b.add_matte()
    for t in tri:
        b.add_mesh(tf.Transform.identity(), [0, 1, 2], t, material=m)
    sc = b.build(split_method="sah", max_shapes_in_node=4)
    tl = build_treelets(
        sc.bvh_host,
        np.stack(
            [np.asarray(sc.data.tris.p0), np.asarray(sc.data.tris.p1),
             np.asarray(sc.data.tris.p2)], axis=1,
        ),
        np.asarray(sc.data.tris.area_light),
        leaf_size=16,
        super_size=128,
    )
    return sc, tl


def rays(n, seed):
    rng = np.random.default_rng(seed)
    o = jnp.asarray((rng.random((n, 3), np.float32) - 0.5) * 6)
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o, jnp.asarray(d)


class TestCull:
    def test_conservative(self, soup):
        """The bundle cull must never drop a treelet any block ray hits:
        check by comparing final hits against the dense reference."""
        sc, tl = soup
        o, d = rays(1024, 1)
        t_max = jnp.full(1024, F32_MAX)
        tref, pref, _, _ = traverse.intersect_dense(sc.data, o, d, t_max)
        t, p, _, _, n_pairs = pairs_closest(
            tl, o, d, t_max, max_pairs=8192, interpret=True
        )
        assert int(n_pairs) <= 8192
        assert np.allclose(np.asarray(t), np.asarray(tref), rtol=1e-5)
        assert np.array_equal(np.asarray(p), np.asarray(pref))

    def test_padding_entries_are_dummy(self, soup):
        _, tl = soup
        o, d = rays(256, 2)
        pb, pt, n_pairs, n_blocks = block_candidate_pairs(
            tl, o, d, jnp.full(256, F32_MAX), 4096
        )
        pb = np.asarray(pb)
        n = int(n_pairs)
        assert (pb[:n] < n_blocks).all()
        assert (pb[n:] == n_blocks).all()
        # Block-major sorted.
        assert (np.diff(pb[:n]) >= 0).all()

    def test_every_block_initialized(self, soup):
        """Rays that miss everything must still return t_max/-1 (their
        block's output is initialized by the forced pair 0)."""
        sc, tl = soup
        n = 512
        o = jnp.broadcast_to(jnp.asarray([100.0, 100.0, 100.0]), (n, 3))
        d = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), (n, 3))
        t_max = jnp.full(n, F32_MAX)
        t, p, _, _, _ = pairs_closest(tl, o, d, t_max, max_pairs=4096,
                                      interpret=True)
        assert (np.asarray(p) == -1).all()
        assert np.allclose(np.asarray(t), F32_MAX)


class TestAny:
    def test_matches_dense(self, soup):
        sc, tl = soup
        o, d = rays(1024, 3)
        t_max = jnp.full(1024, 2.5)
        skip = jnp.full(1024, -2, jnp.int32)
        ref = traverse.any_intersect_dense(sc.data, o, d, t_max, skip)
        occ, n_pairs = pairs_any(tl, o, d, t_max, skip, max_pairs=8192,
                                 interpret=True)
        assert np.array_equal(np.asarray(occ), np.asarray(ref))


class TestSortKey:
    def test_sorted_call_roundtrip(self, soup):
        """_sorted_call must return results in original ray order."""
        sc, tl = soup
        o, d = rays(777, 4)
        t_max = jnp.full(777, F32_MAX)
        tref, pref, _, _ = traverse.intersect_dense(sc.data, o, d, t_max)

        def run(o_s, d_s, t_s, _):
            return traverse.intersect_dense(sc.data, o_s, d_s, t_s)

        t, p, b0, b1 = traverse._sorted_call(sc.data, o, d, t_max, None, run)
        assert np.allclose(np.asarray(t), np.asarray(tref), rtol=1e-6)
        assert np.array_equal(np.asarray(p), np.asarray(pref))


class TestChunking:
    def test_multi_chunk_merge(self, soup, monkeypatch):
        """Results must be identical when the pair list spans many small
        chunks (blocks split across chunk boundaries re-merge by min-t)."""
        import yuki_tpu.ops.trace_pairs as tp

        sc, tl = soup
        o, d = rays(1024, 5)
        t_max = jnp.full(1024, F32_MAX)
        tref, pref, _, _, n_pairs = pairs_closest(
            tl, o, d, t_max, max_pairs=8192, interpret=True
        )
        monkeypatch.setattr(tp, "CHUNK", 64)  # force many chunks
        t, p, _, _, _ = tp.pairs_closest(
            tl, o, d, t_max, max_pairs=int(n_pairs) + 63, interpret=True
        )
        assert np.allclose(np.asarray(t), np.asarray(tref), rtol=1e-6)
        assert np.array_equal(np.asarray(p), np.asarray(pref))

    def test_multi_chunk_any(self, soup, monkeypatch):
        import yuki_tpu.ops.trace_pairs as tp

        sc, tl = soup
        o, d = rays(512, 6)
        t_max = jnp.full(512, 2.5)
        skip = jnp.full(512, -2, jnp.int32)
        ref, n_pairs = pairs_any(tl, o, d, t_max, skip, max_pairs=8192,
                                 interpret=True)
        monkeypatch.setattr(tp, "CHUNK", 64)
        occ, _ = tp.pairs_any(
            tl, o, d, t_max, skip, max_pairs=int(n_pairs) + 63, interpret=True
        )
        assert np.array_equal(np.asarray(occ), np.asarray(ref))
