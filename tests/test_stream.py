"""Incidence-stream traversal tests (interpret mode on CPU).

The stream path (ops/trace_stream.py) must agree exactly with the dense
sweep on closest hits and occlusion, including rays that miss everything,
dead lanes (t_max = 0), candidate-list overflow, and the slot layout's
exactness/completeness."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yuki_tpu import transforms as tf
from yuki_tpu import traverse
from yuki_tpu.intersect import F32_MAX
from yuki_tpu.ops.trace_stream import (
    build_slots,
    candidate_lists,
    stream_any,
    stream_closest,
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


def np_crossings(ch, o, d, tm):
    """Reference per-ray crossed-chunk sets."""
    cb = np.asarray(ch.treelet_bounds)
    on, dn, tn = np.asarray(o), np.asarray(d), np.asarray(tm)
    out = []
    for r in range(on.shape[0]):
        s = set()
        if tn[r] > 0:
            with np.errstate(divide="ignore", invalid="ignore"):
                t0 = (cb[:, 0:3] - on[r]) / dn[r]
                t1 = (cb[:, 3:6] - on[r]) / dn[r]
            lo = np.nan_to_num(np.minimum(t0, t1), nan=-np.inf).max(axis=1)
            hi = np.nan_to_num(np.maximum(t0, t1), nan=np.inf).min(axis=1)
            s = set(np.nonzero(np.maximum(lo, 0.0) <= np.minimum(hi, tn[r]))[0])
        out.append(s)
    return out


class TestCandidates:
    def test_lists_exact_and_complete(self, soup):
        sc, ch = soup
        o, d = rays(192, 5)
        tm = jnp.full(192, F32_MAX)
        lists, ov = jax.jit(
            candidate_lists, static_argnums=(4,)
        )(ch, o, d, tm, 64)
        assert not bool(ov.any())
        ref = np_crossings(ch, o, d, tm)
        lists = np.asarray(lists)
        for r in range(192):
            got = set(lists[r][lists[r] >= 0])
            assert got == ref[r], (r, got, ref[r])

    def test_overflow_flagged(self, soup):
        sc, ch = soup
        o, d = rays(192, 6)
        tm = jnp.full(192, F32_MAX)
        lists, ov = jax.jit(
            candidate_lists, static_argnums=(4,)
        )(ch, o, d, tm, 2)
        ref = np_crossings(ch, o, d, tm)
        ov = np.asarray(ov)
        for r in range(192):
            assert ov[r] == (len(ref[r]) > 2)

    def test_dead_lanes_empty(self, soup):
        sc, ch = soup
        o, d = rays(64, 7)
        lists, ov = jax.jit(
            candidate_lists, static_argnums=(4,)
        )(ch, o, d, jnp.zeros(64), 8)
        assert (np.asarray(lists) == -1).all()
        assert not bool(ov.any())


class TestSlots:
    def test_layout_exact_complete(self, soup):
        """Every valid slot's pos maps to a real (ray, chunk) candidate of
        its row's chunk; every candidate gets exactly one slot."""
        sc, ch = soup
        n, C = 256, 16
        o, d = rays(n, 8)
        tm = jnp.full(n, F32_MAX)
        lists, _ = candidate_lists(ch, o, d, tm, C)
        max_rows = 2 * n * C // 128 + ch.n_treelets + 8
        slot_pos, row_chunk, valid, ok = jax.jit(
            build_slots, static_argnums=(0, 1, 3, 4)
        )(n, ch.n_treelets, lists, C, max_rows)
        assert bool(ok)
        lists = np.asarray(lists)
        slot_pos, row_chunk, valid = map(
            np.asarray, (slot_pos, row_chunk, valid))
        seen = set()
        for j in range(max_rows):
            for l in range(128):
                if valid[j, l]:
                    p = slot_pos[j, l]
                    r, m = p // C, p % C
                    assert lists[r, m] == row_chunk[j], (j, l, p)
                    assert p not in seen
                    seen.add(p)
        want = {(r * C + m) for r in range(n) for m in range(C)
                if lists[r, m] >= 0}
        assert seen == want

    def test_overflow_reported(self, soup):
        sc, ch = soup
        n, C = 256, 16
        o, d = rays(n, 9)
        lists, _ = candidate_lists(ch, o, d, jnp.full(n, F32_MAX), C)
        _, _, _, ok = jax.jit(build_slots, static_argnums=(0, 1, 3, 4))(
            n, ch.n_treelets, lists, C, 2
        )
        assert not bool(ok)


class TestStream:
    def test_closest_matches_dense(self, soup):
        sc, ch = soup
        o, d = rays(1024, 1)
        t_max = jnp.full(1024, F32_MAX)
        tref, pref, b0ref, b1ref = traverse.intersect_dense(
            sc.data, o, d, t_max
        )
        t, p, b0, b1, ov, ok = stream_closest(
            ch, sc.data.tris.shading_packed, o, d, t_max, C=64,
            interpret=True,
        )
        assert bool(ok)
        assert not bool(ov.any())
        assert np.array_equal(np.asarray(p), np.asarray(pref))
        assert np.allclose(np.asarray(t), np.asarray(tref), rtol=1e-5)
        hit = np.asarray(pref) >= 0
        assert np.allclose(np.asarray(b0)[hit], np.asarray(b0ref)[hit],
                           atol=1e-5)
        assert np.allclose(np.asarray(b1)[hit], np.asarray(b1ref)[hit],
                           atol=1e-5)

    def test_non_overflow_rays_exact_under_small_C(self, soup):
        """With a small C, flagged rays may miss hits but unflagged rays
        must still be exact (the caller re-runs flagged rays wider)."""
        sc, ch = soup
        o, d = rays(512, 2)
        t_max = jnp.full(512, F32_MAX)
        tref, pref, _, _ = traverse.intersect_dense(sc.data, o, d, t_max)
        t, p, _, _, ov, ok = stream_closest(
            ch, sc.data.tris.shading_packed, o, d, t_max, C=4, mult=8,
            interpret=True,
        )
        assert bool(ok)
        ov = np.asarray(ov)
        assert ov.any()  # the soup is dense enough that some rays overflow
        keep = ~ov
        assert np.array_equal(np.asarray(p)[keep], np.asarray(pref)[keep])
        assert np.allclose(np.asarray(t)[keep], np.asarray(tref)[keep],
                           rtol=1e-5)

    def test_missing_rays_get_defaults(self, soup):
        sc, ch = soup
        n = 512
        o = jnp.broadcast_to(jnp.asarray([100.0, 100.0, 100.0]), (n, 3))
        d = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), (n, 3))
        t_max = jnp.full(n, F32_MAX)
        t, p, _, _, ov, ok = stream_closest(
            ch, sc.data.tris.shading_packed, o, d, t_max, interpret=True
        )
        assert bool(ok)
        assert (np.asarray(p) == -1).all()
        assert np.allclose(np.asarray(t), F32_MAX)

    def test_mixed_live_dead(self, soup):
        sc, ch = soup
        o, d = rays(512, 4)
        alive = jnp.arange(512) % 2 == 0
        t_max = jnp.where(alive, F32_MAX, 0.0)
        tref, pref, _, _ = traverse.intersect_dense(sc.data, o, d, t_max)
        t, p, _, _, ov, ok = stream_closest(
            ch, sc.data.tris.shading_packed, o, d, t_max, C=64,
            interpret=True,
        )
        a = np.asarray(alive)
        assert np.array_equal(np.asarray(p)[a], np.asarray(pref)[a])
        assert (np.asarray(p)[~a] == -1).all()

    def test_any_matches_dense(self, soup):
        sc, ch = soup
        o, d = rays(1024, 3)
        t_max = jnp.full(1024, 2.5)
        skip = jnp.full(1024, -2, jnp.int32)
        ref = traverse.any_intersect_dense(sc.data, o, d, t_max, skip)
        occ, ov, ok = stream_any(ch, o, d, t_max, skip, C=64,
                                 interpret=True)
        assert bool(ok)
        assert not bool(ov.any())
        assert np.array_equal(np.asarray(occ), np.asarray(ref))

    def test_axis_aligned_dirs(self, soup):
        """Zero direction components must not NaN-poison the cull."""
        sc, ch = soup
        o, _ = rays(512, 10)
        d0 = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (512, 3))
        t_max = jnp.full(512, F32_MAX)
        tref, pref, _, _ = traverse.intersect_dense(sc.data, o, d0, t_max)
        t, p, _, _, _, ok = stream_closest(
            ch, sc.data.tris.shading_packed, o, d0, t_max, C=64,
            interpret=True,
        )
        assert bool(ok)
        assert np.array_equal(np.asarray(p), np.asarray(pref))


class TestCrossWordsKernel:
    def test_matches_xla(self, soup):
        """The Pallas cross-words kernel must produce bitwise-identical
        words to the dense XLA reference, including dead lanes and
        axis-aligned directions."""
        import yuki_tpu.ops.trace_stream as ts

        sc, ch = soup
        o, d = rays(512, 21)
        d = d.at[0:64].set(jnp.asarray([0.0, 0.0, 1.0]))
        t_max = jnp.where(jnp.arange(512) % 3 == 0, 0.0, F32_MAX)
        ref = ts._cross_words_xla(ch, o, d, t_max)
        got = ts._cross_words_tpu(ch, o, d, t_max, interpret=True)
        assert np.array_equal(np.asarray(got), np.asarray(ref))

    @pytest.mark.parametrize("group,word_cull", [
        (2, True), (4, True), (1, False), (4, False), (3, True),
    ])
    def test_grouped_matches_xla(self, soup, group, word_cull):
        """Row-group batching and the no-hierarchy variant are pure
        scheduling knobs: words stay bitwise identical, including when
        the row count is not a multiple of the group (pad rows)."""
        import yuki_tpu.ops.trace_stream as ts

        sc, ch = soup
        o, d = rays(512, 21)
        d = d.at[0:64].set(jnp.asarray([0.0, 0.0, 1.0]))
        t_max = jnp.where(jnp.arange(512) % 3 == 0, 0.0, F32_MAX)
        ref = ts._cross_words_xla(ch, o, d, t_max)
        got = ts._cross_words_tpu(ch, o, d, t_max, interpret=True,
                                  group=group, word_cull=word_cull)
        assert np.array_equal(np.asarray(got), np.asarray(ref))


class TestExtractLists:
    def test_two_phase_matches_exact(self):
        """Word-compacted extraction must produce identical lists and a
        superset-consistent overflow flag (rows over the word cap are
        flagged, like rows over the candidate cap)."""
        import yuki_tpu.ops.trace_stream as ts

        rng = np.random.default_rng(5)
        r, w = 257, 17
        words = jnp.asarray(
            (rng.random((r, w)) < 0.04).astype(np.uint32)
            * rng.integers(1, 2**32, (r, w), dtype=np.uint32)
        )
        ref_l, ref_ov = ts.extract_lists(words, 24)
        got_l, got_ov = ts.extract_lists(words, 24, wc=12)
        nzw = np.asarray((np.asarray(words) != 0).sum(axis=1))
        ok_rows = nzw <= 12
        assert np.array_equal(np.asarray(got_l)[ok_rows],
                              np.asarray(ref_l)[ok_rows])
        got_ov = np.asarray(got_ov)
        assert np.array_equal(got_ov[ok_rows], np.asarray(ref_ov)[ok_rows])
        assert got_ov[~ok_rows].all()


class TestTwoLevelCull:
    """candidate_lists_2l must be bitwise-identical to candidate_lists for
    every non-overflow ray, and flag overflow conservatively (never emit a
    truncated list without the flag)."""

    def test_matches_flat(self, soup):
        import yuki_tpu.ops.trace_stream as ts
        sc, ch = soup
        n, C = 384, 64
        o, d = rays(n, 21)
        tm = jnp.full(n, F32_MAX)
        ref_l, ref_ov = jax.jit(
            ts.candidate_lists, static_argnums=(4,))(ch, o, d, tm, C)
        got_l, got_ov = jax.jit(
            ts.candidate_lists_2l, static_argnums=(4, 5))(ch, o, d, tm, C)
        ref_l, ref_ov = np.asarray(ref_l), np.asarray(ref_ov)
        got_l, got_ov = np.asarray(got_l), np.asarray(got_ov)
        ok = ~got_ov
        assert ok.any()
        assert np.array_equal(got_l[ok], ref_l[ok])
        # Flat overflow implies 2l overflow (2l can also overflow on S).
        assert (got_ov | ~ref_ov).all()

    def test_word_overflow_flagged(self, soup):
        """Rays crossing more than S words must be flagged, and their
        emitted lists must still be a prefix-exact subset."""
        import yuki_tpu.ops.trace_stream as ts
        sc, ch = soup
        n, C = 192, 64
        o, d = rays(n, 22)
        tm = jnp.full(n, F32_MAX)
        got_l, got_ov = jax.jit(
            ts.candidate_lists_2l, static_argnums=(4, 5))(ch, o, d, tm, C, 2)
        ref = np_crossings(ch, o, d, tm)
        got_l, got_ov = np.asarray(got_l), np.asarray(got_ov)
        for r in range(n):
            got = set(got_l[r][got_l[r] >= 0])
            if not got_ov[r]:
                assert got == ref[r], r
            else:
                assert got <= ref[r], r

    def test_dead_lanes(self, soup):
        import yuki_tpu.ops.trace_stream as ts
        sc, ch = soup
        o, d = rays(64, 23)
        lists, ov = jax.jit(
            ts.candidate_lists_2l, static_argnums=(4, 5)
        )(ch, o, d, jnp.zeros(64), 8)
        assert (np.asarray(lists) == -1).all()
        assert not bool(np.asarray(ov).any())

    def test_stream_l_e2e_matches_dense(self, soup):
        """Full 2l pipeline (cross_compact -> extract_compact ->
        stream_*_l) must agree with the dense sweep for non-overflow
        rays — exactly the production slot-branch composition."""
        import yuki_tpu.ops.trace_stream as ts
        sc, ch = soup
        n = 512
        o, d = rays(n, 24)
        tm = jnp.full(n, F32_MAX)
        tref, pref, _, _ = traverse.intersect_dense(sc.data, o, d, tm)
        lists, ov = ts.candidate_lists_2l(ch, o, d, tm, 64)
        t, p, ov2, ok = ts.stream_closest_l(
            ch, lists, ov, o, d, tm, C=64, interpret=True)
        assert bool(ok)
        keep = ~np.asarray(ov2)
        assert keep.any()
        assert np.array_equal(np.asarray(p)[keep], np.asarray(pref)[keep])
        assert np.allclose(np.asarray(t)[keep], np.asarray(tref)[keep],
                           rtol=1e-5)
        skip = jnp.full(n, -2, jnp.int32)
        tm2 = jnp.full(n, 2.5)
        refocc = traverse.any_intersect_dense(sc.data, o, d, tm2, skip)
        lists2, ovl = ts.candidate_lists_2l(ch, o, d, tm2, 64)
        occ, ov3, ok2 = ts.stream_any_l(
            ch, lists2, ovl, o, d, tm2, skip, C=64, interpret=True)
        assert bool(ok2)
        keep2 = ~np.asarray(ov3)
        assert np.array_equal(np.asarray(occ)[keep2],
                              np.asarray(refocc)[keep2])
