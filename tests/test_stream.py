"""Incidence-stream traversal tests (interpret mode on CPU).

The stream path (ops/trace_stream.py) must agree exactly with the dense
sweep on closest hits and occlusion, including rays that miss everything,
dead lanes (t_max = 0), and capacity-overflow reporting."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yuki_tpu import transforms as tf
from yuki_tpu import traverse
from yuki_tpu.intersect import F32_MAX
from yuki_tpu.ops.trace_stream import (
    build_stream,
    stream_any,
    stream_closest,
    _caps,
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


class TestStream:
    def test_closest_matches_dense(self, soup):
        sc, tl = soup
        o, d = rays(1024, 1)
        t_max = jnp.full(1024, F32_MAX)
        tref, pref, b0ref, b1ref = traverse.intersect_dense(
            sc.data, o, d, t_max
        )
        t, p, b0, b1, ok = stream_closest(tl, o, d, t_max, interpret=True)
        assert bool(ok)
        assert np.array_equal(np.asarray(p), np.asarray(pref))
        assert np.allclose(np.asarray(t), np.asarray(tref), rtol=1e-5)
        hit = np.asarray(pref) >= 0
        assert np.allclose(np.asarray(b0)[hit], np.asarray(b0ref)[hit],
                           atol=1e-5)
        assert np.allclose(np.asarray(b1)[hit], np.asarray(b1ref)[hit],
                           atol=1e-5)

    def test_missing_rays_get_defaults(self, soup):
        sc, tl = soup
        n = 512
        o = jnp.broadcast_to(jnp.asarray([100.0, 100.0, 100.0]), (n, 3))
        d = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), (n, 3))
        t_max = jnp.full(n, F32_MAX)
        t, p, _, _, ok = stream_closest(tl, o, d, t_max, interpret=True)
        assert bool(ok)
        assert (np.asarray(p) == -1).all()
        assert np.allclose(np.asarray(t), F32_MAX)

    def test_dead_lanes_skip(self, soup):
        """t_max = 0 lanes (parked rays) must produce no incidence and no
        hits, even with origins inside the scene."""
        sc, tl = soup
        o, d = rays(512, 2)
        t_max = jnp.zeros(512)
        t, p, _, _, ok = stream_closest(tl, o, d, t_max, interpret=True)
        assert bool(ok)
        assert (np.asarray(p) == -1).all()
        # axis-aligned direction with zero components must not NaN-poison
        d0 = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (512, 3))
        t, p, _, _, ok = stream_closest(
            tl, o, d0, jnp.full(512, F32_MAX), interpret=True
        )
        tref, pref, _, _ = traverse.intersect_dense(
            sc.data, o, d0, jnp.full(512, F32_MAX)
        )
        assert np.array_equal(np.asarray(p), np.asarray(pref))

    def test_any_matches_dense(self, soup):
        sc, tl = soup
        o, d = rays(1024, 3)
        t_max = jnp.full(1024, 2.5)
        skip = jnp.full(1024, -2, jnp.int32)
        ref = traverse.any_intersect_dense(sc.data, o, d, t_max, skip)
        occ, ok = stream_any(tl, o, d, t_max, skip, interpret=True)
        assert bool(ok)
        assert np.array_equal(np.asarray(occ), np.asarray(ref))

    def test_mixed_live_dead(self, soup):
        """Half the wave parked: live lanes must still match dense."""
        sc, tl = soup
        o, d = rays(512, 4)
        alive = jnp.arange(512) % 2 == 0
        t_max = jnp.where(alive, F32_MAX, 0.0)
        tref, pref, _, _ = traverse.intersect_dense(sc.data, o, d, t_max)
        t, p, _, _, ok = stream_closest(tl, o, d, t_max, interpret=True)
        a = np.asarray(alive)
        assert np.array_equal(np.asarray(p)[a], np.asarray(pref)[a])
        assert (np.asarray(p)[~a] == -1).all()


class TestBuild:
    def test_stream_layout(self, soup):
        """Every slot's ray must actually cross its row's treelet AABB
        (exactness), and every (ray, crossed-treelet) incidence must have a
        slot (completeness)."""
        sc, tl = soup
        n = 256
        o, d = rays(n, 5)
        t_max = jnp.full(n, F32_MAX)
        cap1, cap2, max_slots = _caps(n, tl.n_treelets)
        slot_ray, row_treelet, ok = jax.jit(
            build_stream, static_argnums=(4, 5, 6)
        )(tl, o, d, t_max, cap1, cap2, max_slots)
        assert bool(ok)
        slot_ray = np.asarray(slot_ray)
        row_treelet = np.asarray(row_treelet)
        tb = np.asarray(tl.treelet_bounds)
        on, dn = np.asarray(o), np.asarray(d)

        def crosses(r, t):
            with np.errstate(divide="ignore", invalid="ignore"):
                t0 = (tb[t, 0:3] - on[r]) / dn[r]
                t1 = (tb[t, 3:6] - on[r]) / dn[r]
            lo = np.nan_to_num(np.minimum(t0, t1), nan=-np.inf)
            hi = np.nan_to_num(np.maximum(t0, t1), nan=np.inf)
            return max(lo.max(), 0.0) <= hi.min()

        # exactness on every filled slot
        filled = np.nonzero(slot_ray >= 0)[0]
        got = set()
        for s in filled:
            t = row_treelet[s // 128]
            assert crosses(slot_ray[s], t), (s, slot_ray[s], t)
            got.add((slot_ray[s], t))
        # completeness on a sample of rays
        for r in range(0, n, 37):
            for t in range(tl.n_treelets):
                if crosses(r, t):
                    assert (r, t) in got, (r, t)

    def test_overflow_reported(self, soup):
        sc, tl = soup
        o, d = rays(256, 6)
        t_max = jnp.full(256, F32_MAX)
        _, _, ok = jax.jit(build_stream, static_argnums=(4, 5, 6))(
            tl, o, d, t_max, 8, 8, 1024
        )
        assert not bool(ok)
