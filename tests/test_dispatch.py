"""Per-ray dispatch traversal tests (interpret mode on CPU).

Checks the MoE-style traversal (ops/trace_dispatch.py) against the dense
sweep oracle — same parity bar as the pair-list tests (test_pairs.py),
plus the tile-construction invariants and the overflow contract.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from yuki_tpu import transforms as tf
from yuki_tpu import traverse
from yuki_tpu.intersect import F32_MAX
from yuki_tpu.ops.trace_dispatch import (
    TILE,
    dispatch_any,
    dispatch_closest,
    ray_candidate_tiles,
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


class TestTiles:
    def test_every_candidate_has_a_slot(self, soup):
        """Each (ray, treelet) slab hit must land in exactly one pair slot
        of a tile owned by that treelet."""
        _, tl = soup
        o, d = rays(513, 3)
        t_max = jnp.full(513, F32_MAX)
        max_tiles = 256
        tile_treelet, pair_ray, n_tiles = ray_candidate_tiles(
            tl, o, d, t_max, max_tiles
        )
        tile_treelet = np.asarray(tile_treelet)
        pair_ray = np.asarray(pair_ray)
        n_tiles = int(n_tiles)
        assert n_tiles <= max_tiles

        # Reference hits, computed directly.
        tb = np.asarray(tl.treelet_bounds)
        on, dn = np.asarray(o), np.asarray(d)
        inv = 1.0 / np.where(np.abs(dn) < 1e-20, 1e-20, dn)
        t0 = (tb[:, None, 0:3] - on[None]) * inv[None]
        t1 = (tb[:, None, 3:6] - on[None]) * inv[None]
        tmin = np.minimum(t0, t1).max(-1)
        tmax = np.maximum(t0, t1).min(-1)
        hits = np.maximum(tmin, 0.0) <= tmax  # [T, N]

        got = set()
        for g in range(n_tiles):
            for s in range(TILE):
                r = pair_ray[g * TILE + s]
                if r < 513:
                    got.add((tile_treelet[g], r))
        want = {(t, r) for t, r in zip(*np.nonzero(hits))}
        assert got == want
        # Slots beyond n_tiles stay dummies.
        assert (pair_ray[n_tiles * TILE:] == 513).all()

    def test_empty_wave(self, soup):
        """Rays that hit nothing produce tiles only for padding."""
        _, tl = soup
        n = 8
        o = jnp.full((n, 3), 100.0)
        d = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (n, 1))
        t, p, b0, b1, n_tiles = dispatch_closest(
            tl, o, d, jnp.full(n, F32_MAX), max_tiles=64, interpret=True
        )
        assert (np.asarray(p) == -1).all()
        assert np.allclose(np.asarray(t), F32_MAX)


class TestClosest:
    def test_matches_dense(self, soup):
        sc, tl = soup
        o, d = rays(2048, 5)
        t_max = jnp.full(2048, F32_MAX)
        tref, pref, b0r, b1r = traverse.intersect_dense(sc.data, o, d, t_max)
        t, p, b0, b1, n_tiles = dispatch_closest(
            tl, o, d, t_max, max_tiles=512, interpret=True
        )
        assert int(n_tiles) <= 512
        np.testing.assert_array_equal(np.asarray(p), np.asarray(pref))
        np.testing.assert_allclose(np.asarray(t), np.asarray(tref), rtol=1e-4, atol=1e-8)
        hit = np.asarray(pref) >= 0
        np.testing.assert_allclose(
            np.asarray(b0)[hit], np.asarray(b0r)[hit], atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(b1)[hit], np.asarray(b1r)[hit], atol=1e-5
        )

    def test_respects_t_max(self, soup):
        sc, tl = soup
        o, d = rays(512, 9)
        t_max = jnp.full(512, 0.7)
        tref, pref, _, _ = traverse.intersect_dense(sc.data, o, d, t_max)
        t, p, _, _, _ = dispatch_closest(
            tl, o, d, t_max, max_tiles=512, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(p), np.asarray(pref))
        np.testing.assert_allclose(np.asarray(t), np.asarray(tref), rtol=1e-4, atol=1e-8)

    def test_overflow_reported(self, soup):
        """When max_tiles is too small, n_tiles still reports the true
        requirement so the caller can fall back."""
        _, tl = soup
        o, d = rays(2048, 5)
        t_max = jnp.full(2048, F32_MAX)
        _, _, n_full = ray_candidate_tiles(tl, o, d, t_max, 512)
        _, _, n_small = ray_candidate_tiles(tl, o, d, t_max, 4)
        assert int(n_full) == int(n_small)
        assert int(n_full) > 4


class TestAny:
    def test_matches_dense(self, soup):
        sc, tl = soup
        o, d = rays(1024, 6)
        t_max = jnp.full(1024, 2.0)
        skip = jnp.full(1024, -1, jnp.int32)
        occ_ref = traverse.any_intersect_dense(sc.data, o, d, t_max, skip)
        occ, n_tiles = dispatch_any(
            tl, o, d, t_max, skip, max_tiles=512, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(occ), np.asarray(occ_ref))

    def test_skip_light(self, soup):
        """Lanes whose skip id matches a triangle's area light ignore it:
        build the check synthetically by tagging every triangle as light 3
        via the tl arrays."""
        sc, tl = soup
        o, d = rays(256, 8)
        t_max = jnp.full(256, 2.0)
        # tag all real triangle rows as light id 3
        rows = np.asarray(tl.tris_padded).copy()
        real = rows[:, 10] >= 0
        rows[real, 9] = 3.0
        tl3 = tl.__class__(
            super_bounds=tl.super_bounds,
            super_range=tl.super_range,
            treelet_bounds=tl.treelet_bounds,
            tris_padded=jnp.asarray(rows),
            leaf_size=tl.leaf_size,
            n_supers=tl.n_supers,
            n_treelets=tl.n_treelets,
        )
        occ_all_skip, _ = dispatch_any(
            tl3, o, d, t_max, jnp.full(256, 3, jnp.int32),
            max_tiles=512, interpret=True,
        )
        assert not np.asarray(occ_all_skip).any()
        # -2 is the integrators' no-skip sentinel (never a light id).
        occ_no_skip, _ = dispatch_any(
            tl3, o, d, t_max, jnp.full(256, -2, jnp.int32),
            max_tiles=512, interpret=True,
        )
        occ_ref = traverse.any_intersect_dense(
            sc.data, o, d, t_max, jnp.full(256, -2, jnp.int32)
        )
        np.testing.assert_array_equal(
            np.asarray(occ_no_skip), np.asarray(occ_ref)
        )
