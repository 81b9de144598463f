"""Sampler contract tests (sampling/mod.rs:46-57 seeking semantics)."""

import numpy as np
import jax.numpy as jnp

from yuki_tpu.sampling import (
    SampleCtx,
    StratifiedSampler,
    UniformSampler,
    concentric_sample_disk,
    cosine_sample_hemisphere,
    force_single_sample,
    pcg_hash,
    permutation_element,
    u32_to_unit_float,
)


def ctx_for(n=1024, sample_index=0, seed=7):
    px = jnp.arange(n, dtype=jnp.uint32) % 64
    py = jnp.arange(n, dtype=jnp.uint32) // 64
    return SampleCtx(px=px, py=py, sample_index=jnp.uint32(sample_index), seed=jnp.uint32(seed))


class TestHashes:
    def test_pcg_hash_deterministic(self):
        a = pcg_hash(jnp.arange(100, dtype=jnp.uint32))
        b = pcg_hash(jnp.arange(100, dtype=jnp.uint32))
        assert np.array_equal(a, b)
        assert len(np.unique(np.asarray(a))) == 100  # no collisions here

    def test_unit_float_range(self):
        f = u32_to_unit_float(pcg_hash(jnp.arange(10000, dtype=jnp.uint32)))
        f = np.asarray(f)
        assert f.min() >= 0.0 and f.max() < 1.0
        assert abs(f.mean() - 0.5) < 0.01

    def test_permutation_element_is_permutation(self):
        for l in (3, 4, 7, 16, 100):
            p = jnp.uint32(1234)
            perm = np.asarray(
                permutation_element(jnp.arange(l, dtype=jnp.uint32), l, p)
            )
            assert sorted(perm.tolist()) == list(range(l))

    def test_permutation_keyed(self):
        l = 16
        a = np.asarray(permutation_element(jnp.arange(l, dtype=jnp.uint32), l, jnp.uint32(1)))
        b = np.asarray(permutation_element(jnp.arange(l, dtype=jnp.uint32), l, jnp.uint32(2)))
        assert not np.array_equal(a, b)


class TestSeekingContract:
    """Value depends only on (seed, pixel, sample_index, dimension)."""

    def test_uniform_deterministic(self):
        s = UniformSampler(4)
        a = s.get_1d(ctx_for(), 5)
        b = s.get_1d(ctx_for(), 5)
        assert np.array_equal(np.asarray(a), np.asarray(b))

    def test_dims_differ(self):
        s = UniformSampler(4)
        a = np.asarray(s.get_1d(ctx_for(), 3))
        b = np.asarray(s.get_1d(ctx_for(), 4))
        assert not np.array_equal(a, b)

    def test_seeds_differ(self):
        s = UniformSampler(4)
        a = np.asarray(s.get_1d(ctx_for(seed=1), 3))
        b = np.asarray(s.get_1d(ctx_for(seed=2), 3))
        assert not np.array_equal(a, b)

    def test_stratified_stratum_coverage(self):
        """Over all sample indices, each pixel's 2d samples cover every
        stratum exactly once (the point of stratification)."""
        s = StratifiedSampler(pixel_samples_x=4, pixel_samples_y=4)
        n = 64
        strata_hit = np.zeros((n, 16), dtype=bool)
        for si in range(16):
            u = np.asarray(s.get_2d(ctx_for(n=n, sample_index=si), 7))
            sx = np.clip((u[:, 0] * 4).astype(int), 0, 3)
            sy = np.clip((u[:, 1] * 4).astype(int), 0, 3)
            strata_hit[np.arange(n), sy * 4 + sx] = True
        assert strata_hit.all()

    def test_force_single_sample(self):
        assert force_single_sample(UniformSampler(16)).samples_per_pixel == 1
        assert force_single_sample(StratifiedSampler(4, 4)).samples_per_pixel == 1

    def test_uniform_distribution(self):
        s = UniformSampler(1)
        u = np.asarray(s.get_2d(ctx_for(n=16384), 2))
        assert abs(u.mean() - 0.5) < 0.01
        assert u.min() >= 0 and u.max() < 1


class TestMappings:
    def test_concentric_disk(self):
        u = jnp.asarray(
            np.random.default_rng(0).random((4096, 2), dtype=np.float32)
        )
        d = np.asarray(concentric_sample_disk(u))
        r = np.hypot(d[:, 0], d[:, 1])
        assert r.max() <= 1.0 + 1e-6
        # Area-uniform: mean radius of uniform disk = 2/3.
        assert abs(r.mean() - 2 / 3) < 0.02
        # Center maps to center.
        c = np.asarray(concentric_sample_disk(jnp.asarray([[0.5, 0.5]])))
        assert np.allclose(c, 0.0)

    def test_cosine_hemisphere(self):
        u = jnp.asarray(
            np.random.default_rng(1).random((4096, 2), dtype=np.float32)
        )
        w = np.asarray(cosine_sample_hemisphere(u))
        assert (w[:, 2] >= 0).all()
        assert np.allclose(np.linalg.norm(w, axis=1), 1.0, atol=1e-4)
        # E[cos theta] = 2/3 for cosine-weighted hemisphere.
        assert abs(w[:, 2].mean() - 2 / 3) < 0.02
