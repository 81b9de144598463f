"""Treelet structure + kernel tests (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from yuki_tpu import transforms as tf
from yuki_tpu import traverse
from yuki_tpu.intersect import F32_MAX
from yuki_tpu.ops.trace_treelets import treelet_any, treelet_closest
from yuki_tpu.scene.data import SceneBuilder
from yuki_tpu.treelets import build_treelets


@pytest.fixture(scope="module")
def soup_scene():
    rng = np.random.default_rng(7)
    n_tris = 300
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
        super_size=64,
    )
    return sc, tl


def rays(n, seed=0):
    rng = np.random.default_rng(seed)
    o = jnp.asarray((rng.random((n, 3), np.float32) - 0.5) * 6)
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o, jnp.asarray(d)


class TestStructure:
    def test_every_prim_once(self, soup_scene):
        sc, tl = soup_scene
        rows = np.asarray(tl.tris_padded)
        ids = rows[:, 10].astype(int)
        real = ids[ids >= 0]
        assert sorted(real.tolist()) == list(range(sc.meta.n_tris))

    def test_bounds_contain_triangles(self, soup_scene):
        sc, tl = soup_scene
        k = tl.leaf_size
        rows = np.asarray(tl.tris_padded)
        tb = np.asarray(tl.treelet_bounds)
        for ti in range(tl.n_treelets):
            blk = rows[ti * k : (ti + 1) * k]
            live = blk[:, 10] >= 0
            pts = blk[live, :9].reshape(-1, 3)
            assert (pts >= tb[ti, 0:3] - 1e-4).all()
            assert (pts <= tb[ti, 3:6] + 1e-4).all()

    def test_supers_contain_treelets(self, soup_scene):
        _, tl = soup_scene
        sb = np.asarray(tl.super_bounds)
        sr = np.asarray(tl.super_range)
        tb = np.asarray(tl.treelet_bounds)
        covered = []
        for s in range(tl.n_supers):
            t0, tc = sr[s]
            covered.extend(range(t0, t0 + tc))
            assert (tb[t0:t0 + tc, 0:3] >= sb[s, 0:3] - 1e-4).all()
            assert (tb[t0:t0 + tc, 3:6] <= sb[s, 3:6] + 1e-4).all()
        assert sorted(covered) == list(range(tl.n_treelets))


class TestKernels:
    def test_closest_matches_dense(self, soup_scene):
        sc, tl = soup_scene
        o, d = rays(1024, seed=1)
        t_max = jnp.full(1024, F32_MAX)
        tref, pref, b0r, b1r = traverse.intersect_dense(sc.data, o, d, t_max)
        t, p, b0, b1 = treelet_closest(tl, o, d, t_max, interpret=True)
        assert np.allclose(np.asarray(t), np.asarray(tref), rtol=1e-5)
        assert np.array_equal(np.asarray(p), np.asarray(pref))
        hit = np.asarray(p) >= 0
        assert np.allclose(np.asarray(b0)[hit], np.asarray(b0r)[hit], atol=1e-5)

    def test_any_matches_dense(self, soup_scene):
        sc, tl = soup_scene
        o, d = rays(1024, seed=2)
        t_max = jnp.full(1024, 2.5)
        skip = jnp.full(1024, -1, jnp.int32)
        ref = traverse.any_intersect_dense(sc.data, o, d, t_max, skip)
        occ = treelet_any(tl, o, d, t_max, skip, interpret=True)
        assert np.array_equal(np.asarray(occ), np.asarray(ref))

    def test_skip_semantics(self, soup_scene):
        """The non-area-light sentinel (-2) must not skip ordinary geometry
        (whose area_light id is -1); skip == -1 would disable all point/
        spot/distant shadows — regression test for exactly that bug."""
        sc, tl = soup_scene
        o, d = rays(256, seed=3)
        t_max = jnp.full(256, 2.5)
        occ = treelet_any(tl, o, d, t_max, jnp.full(256, -2, jnp.int32),
                          interpret=True)
        assert np.asarray(occ).any()
        # Passing -1 would match every ordinary triangle's "no light" id
        # and skip the whole scene:
        occ_none = treelet_any(tl, o, d, t_max, jnp.full(256, -1, jnp.int32),
                               interpret=True)
        assert not np.asarray(occ_none).any()
