"""Per-lane ``skip_light`` contracts on every closest engine (the
reference's sampled-light exclusion, bvh.rs:287-293):

  - skip_light = -2 everywhere is BITWISE the plain closest query;
  - for shadow-style lanes, ``intersect(skip).hit`` must equal
    ``any_intersect(skip)`` (occluded == any non-skipped hit before
    t_max) on every engine.

NOTE: the round-3 path_li COMBINED-trace restructure that motivated
this plumbing was reverted (lane-proportional stage costs made it a
net loss, see ARCHITECTURE.md) — the skip_light capability itself
stays supported for callers that need it.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from yuki_tpu import transforms as tf
from yuki_tpu import traverse
from yuki_tpu.intersect import F32_MAX
from yuki_tpu.scene.data import SceneBuilder
from yuki_tpu.treelets import build_treelets


def _soup_scene(n_tris=300, with_light=True, seed=3):
    rng = np.random.default_rng(seed)
    base = (rng.random((n_tris, 1, 3)) - 0.5) * 6
    tri = (base + rng.standard_normal((n_tris, 3, 3)) * 0.3).astype(
        np.float32
    )
    b = SceneBuilder()
    m = b.add_matte()
    for t in tri[: n_tris // 2]:
        b.add_mesh(tf.Transform.identity(), [0, 1, 2], t, material=m)
    if with_light:
        # Half the soup carries area-light id 0 (skip target).
        for t in tri[n_tris // 2:]:
            b.add_mesh(tf.Transform.identity(), [0, 1, 2], t, material=m,
                       area_light=0)
    return b.build(split_method="sah", max_shapes_in_node=4)


def _rays(n, seed):
    rng = np.random.default_rng(seed)
    o = jnp.asarray((rng.random((n, 3), np.float32) - 0.5) * 6)
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o, jnp.asarray(d)


class TestSkipNeutral:
    """skip_light = -2 is bitwise the plain query (every engine)."""

    def test_bvh_fallback(self):
        sc = _soup_scene()
        o, d = _rays(256, 7)
        tm = jnp.full(256, F32_MAX)
        ref = traverse.intersect(sc.data, sc.meta, o, d, tm)
        got = traverse.intersect(
            sc.data, sc.meta, o, d, tm,
            skip_light=jnp.full(256, -2, jnp.int32),
        )
        for a, b in zip(ref, got):
            assert np.array_equal(np.asarray(a), np.asarray(b))

    def test_dense_fallback(self):
        sc = _soup_scene(n_tris=40)
        assert sc.meta.traversal in ("dense", "treelet")
        o, d = _rays(192, 9)
        tm = jnp.full(192, F32_MAX)
        t0, p0, b00, b10 = traverse.intersect_dense(sc.data, o, d, tm)
        t1, p1, b01, b11 = traverse.intersect_dense(
            sc.data, o, d, tm, skip_light=jnp.full(192, -2, jnp.int32)
        )
        assert np.array_equal(np.asarray(p0), np.asarray(p1))
        assert np.array_equal(np.asarray(t0), np.asarray(t1))


class TestSkipOcclusionParity:
    """intersect(skip).hit == any_intersect(skip) for shadow lanes."""

    def _check(self, sc, o, d, tm, skip):
        hit = traverse.intersect(sc.data, sc.meta, o, d, tm,
                                 skip_light=skip)
        occ = traverse.any_intersect(sc.data, sc.meta, o, d, tm, skip)
        assert np.array_equal(np.asarray(hit.hit), np.asarray(occ))

    def test_bvh_fallback_parity(self):
        sc = _soup_scene()
        o, d = _rays(384, 11)
        tm = jnp.full(384, 0.9999)
        # Alternate lanes skip the area light / skip nothing.
        skip = jnp.asarray(
            np.where(np.arange(384) % 2 == 0, 0, -2).astype(np.int32)
        )
        self._check(sc, o, d, tm, skip)

    def test_dense_parity(self):
        sc = _soup_scene(n_tris=40)
        o, d = _rays(256, 13)
        tm = jnp.full(256, 0.9999)
        skip = jnp.asarray(
            np.where(np.arange(256) % 3 == 0, 0, -2).astype(np.int32)
        )
        # Dense closest-with-skip vs dense any (XLA fallbacks on CPU).
        t, p, b0, b1 = traverse.intersect_dense(sc.data, o, d, tm, skip)
        occ_d = traverse.any_intersect_dense(sc.data, o, d, tm, skip)
        assert np.array_equal(np.asarray(p >= 0), np.asarray(occ_d))

    def test_stream_interpret_parity(self):
        """The production slot pipeline (fused cull + skip-aware closest
        kernel) agrees with stream_any in interpret mode."""
        sc = _soup_scene()
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
        from yuki_tpu.ops.trace_stream import stream_any, stream_closest

        o, d = _rays(256, 17)
        tm = jnp.full(256, 0.9999)
        skip = jnp.asarray(
            np.where(np.arange(256) % 2 == 0, 0, -2).astype(np.int32)
        )
        sp = sc.data.tris.shading_packed
        t, p, _, _, ovc, okc = stream_closest(
            ch, sp, o, d, tm, C=64, mult=64, interpret=True, skip=skip
        )
        occ, ova, oka = stream_any(
            ch, o, d, tm, skip, C=64, mult=64, interpret=True
        )
        assert bool(okc) and bool(oka)
        keep = ~(np.asarray(ovc) | np.asarray(ova))
        assert np.array_equal(
            np.asarray(p >= 0)[keep], np.asarray(occ)[keep]
        )

    def test_rows_interpret_parity(self):
        """Rows closest kernel with a skip plane agrees with rows_any."""
        sc = _soup_scene()
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
        from yuki_tpu.ops.trace_rows import rows_any, rows_closest_w
        from yuki_tpu.ops.trace_rows import row_words_of
        from yuki_tpu.ops.trace_stream import cross_words

        o, d = _rays(256, 19)
        tm = jnp.full(256, 0.9999)
        skip = jnp.asarray(
            np.where(np.arange(256) % 2 == 0, 0, -2).astype(np.int32)
        )
        rw = row_words_of(cross_words(ch, o, d, tm), 2)
        t, p, ovc = rows_closest_w(
            ch, rw, o, d, tm, C=64, mult=64, interpret=True,
            skip_light=skip,
        )
        occ, ova = rows_any(
            ch, o, d, tm, skip, C=64, mult=64, interpret=True
        )
        keep = ~(np.asarray(ovc) | np.asarray(ova))
        assert np.array_equal(
            np.asarray(p >= 0)[keep], np.asarray(occ)[keep]
        )
