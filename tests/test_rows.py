"""Row-union traversal tests (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yuki_tpu import transforms as tf
from yuki_tpu import traverse
from yuki_tpu.intersect import F32_MAX
from yuki_tpu.ops.trace_rows import (
    row_candidate_lists,
    rows_any,
    rows_closest,
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


class TestRows:
    def test_closest_matches_dense(self, soup):
        sc, ch = soup
        o, d = rays(1024, 1)
        t_max = jnp.full(1024, F32_MAX)
        tref, pref, _, _ = traverse.intersect_dense(sc.data, o, d, t_max)
        # soup chunks are tiny (leaf 16) so row unions are large: C=64
        t, p, ov = rows_closest(ch, o, d, t_max, C=64, mult=64,
                                interpret=True)
        keep = ~np.asarray(ov)
        assert keep.any()
        assert np.array_equal(np.asarray(p)[keep], np.asarray(pref)[keep])
        assert np.allclose(np.asarray(t)[keep], np.asarray(tref)[keep],
                           rtol=1e-5)

    def test_any_matches_dense(self, soup):
        sc, ch = soup
        o, d = rays(1024, 3)
        t_max = jnp.full(1024, 2.5)
        skip = jnp.full(1024, -2, jnp.int32)
        ref = traverse.any_intersect_dense(sc.data, o, d, t_max, skip)
        occ, ov = rows_any(ch, o, d, t_max, skip, C=64, mult=64,
                           interpret=True)
        keep = ~np.asarray(ov)
        assert keep.any()
        assert np.array_equal(np.asarray(occ)[keep], np.asarray(ref)[keep])

    def test_multi_segment_parity(self, soup, monkeypatch):
        """Forcing several SMEM row segments (SEG_R below the wave's row
        count) must be result-invariant — rows never split across
        segments (see trace_rows.SEG_R)."""
        from yuki_tpu.ops import trace_rows as trm

        sc, ch = soup
        o, d = rays(1024, 7)
        t_max = jnp.full(1024, F32_MAX)
        t_ref, p_ref, ov_ref = rows_closest(ch, o, d, t_max, C=64,
                                            mult=64, interpret=True)
        skip = jnp.full(1024, -2, jnp.int32)
        occ_ref, _ = rows_any(ch, o, d, t_max, skip, C=64, mult=64,
                              interpret=True)
        monkeypatch.setattr(trm, "SEG_R", 2)  # 8 rows -> 4 segments
        t, p, ov = rows_closest(ch, o, d, t_max, C=64, mult=64,
                                interpret=True)
        occ, _ = rows_any(ch, o, d, t_max, skip, C=64, mult=64,
                          interpret=True)
        keep = ~np.asarray(ov_ref)
        assert np.array_equal(np.asarray(p)[keep],
                              np.asarray(p_ref)[keep])
        assert np.array_equal(np.asarray(t)[keep],
                              np.asarray(t_ref)[keep])
        assert np.array_equal(np.asarray(occ), np.asarray(occ_ref))

    def test_row_overflow_flagged(self, soup):
        sc, ch = soup
        o, d = rays(256, 5)
        t_max = jnp.full(256, F32_MAX)
        lists, ov = jax.jit(
            row_candidate_lists, static_argnums=(4,)
        )(ch, o, d, t_max, 4)
        lists, ov = np.asarray(lists), np.asarray(ov)
        # every non-overflow row's list is exact: check against per-ray
        # reference crossings OR'd per row
        cb = np.asarray(ch.treelet_bounds)
        on, dn = np.asarray(o), np.asarray(d)
        for j in range(2):
            union = set()
            for l in range(128):
                r = j * 128 + l
                with np.errstate(divide="ignore", invalid="ignore"):
                    t0 = (cb[:, 0:3] - on[r]) / dn[r]
                    t1 = (cb[:, 3:6] - on[r]) / dn[r]
                lo = np.nan_to_num(np.minimum(t0, t1), nan=-np.inf).max(1)
                hi = np.nan_to_num(np.maximum(t0, t1), nan=np.inf).min(1)
                union |= set(np.nonzero(np.maximum(lo, 0) <= hi)[0])
            assert ov[j] == (len(union) > 4)
            if not ov[j]:
                assert set(lists[j][lists[j] >= 0]) == union

    def test_dead_lanes(self, soup):
        sc, ch = soup
        o, d = rays(256, 6)
        t, p, ov = rows_closest(ch, o, d, jnp.zeros(256), C=64, mult=64,
                                interpret=True)
        assert (np.asarray(p) == -1).all()

    def test_mixed_live_dead(self, soup):
        sc, ch = soup
        o, d = rays(256, 7)
        alive = jnp.arange(256) % 2 == 0
        t_max = jnp.where(alive, F32_MAX, 0.0)
        tref, pref, _, _ = traverse.intersect_dense(sc.data, o, d, t_max)
        t, p, ov = rows_closest(ch, o, d, t_max, C=64, mult=64,
                                interpret=True)
        keep = np.asarray(alive) & ~np.asarray(ov)
        assert np.array_equal(np.asarray(p)[keep], np.asarray(pref)[keep])
        dead = ~np.asarray(alive)
        assert (np.asarray(p)[dead] == -1).all()


class TestRowWordsInterval:
    def test_superset_of_exact_union(self, soup):
        """The conservative interval row cull must cover every bit of the
        exact per-ray union (supersets are safe: rows kernels re-test each
        chunk per lane), and stay EXACT-tight for coherent bundles."""
        from yuki_tpu.ops.trace_rows import row_words_interval, row_words_of
        from yuki_tpu.ops.trace_stream import _cross_words_xla

        sc, ch = soup
        o, d = rays(512, 31)
        # A mix: some dead lanes, one axis-aligned sub-bundle.
        t_max = jnp.where(jnp.arange(512) % 5 == 0, 0.0, F32_MAX)
        d = d.at[0:128].set(jnp.asarray([0.0, 0.0, 1.0]))
        exact = row_words_of(_cross_words_xla(ch, o, d, t_max), 4)
        cons = row_words_interval(ch, o, d, t_max)
        assert not bool(jnp.any(exact & ~cons))

    def test_all_dead_row_is_empty(self, soup):
        from yuki_tpu.ops.trace_rows import row_words_interval

        sc, ch = soup
        o, d = rays(128, 32)
        cons = row_words_interval(ch, o, d, jnp.zeros(128))
        assert not bool(jnp.any(cons))

    def test_no_pad_chunk_bits(self, soup):
        """Fully-unconstrained rows (mixed direction signs on all axes)
        must never mark the +inf PAD chunks crossed — their ids are out of
        range for the kernels."""
        from yuki_tpu.ops.trace_rows import row_words_interval

        sc, ch = soup
        o, d = rays(128, 33)  # random soup directions span all octants
        cons = np.asarray(row_words_interval(ch, o, d, jnp.full(128, F32_MAX)))
        n_c = ch.n_treelets
        w = cons.shape[1]
        tail_bits = 32 * w - n_c
        if tail_bits:
            last = cons[:, -1]
            assert not np.any(last >> (32 - tail_bits))
