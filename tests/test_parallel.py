"""Multi-chip sharding tests on the 8-virtual-device CPU mesh
(SURVEY.md §4: the rebuild's distributed test strategy)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yuki_tpu.camera import Camera
from yuki_tpu.integrators import PathParams
from yuki_tpu.parallel import default_mesh, make_sharded_wave_renderer
from yuki_tpu.renderer import make_wave_renderer
from yuki_tpu.sampling import UniformSampler
from yuki_tpu.scene.cornell import cornell


@pytest.fixture(scope="module")
def setup():
    scene, cam_params, _ = cornell()
    camera = Camera.create(cam_params, 64, 48)
    return scene, camera


def origins_for(b, td):
    return jnp.asarray(
        np.stack(
            [np.arange(b, dtype=np.int32) % 4 * td,
             np.arange(b, dtype=np.int32) // 4 * td], axis=1
        )
    )


class TestShardedRenderer:
    def test_matches_single_device(self, setup):
        """Tile-sharded rendering must produce bitwise the same tiles as the
        unsharded path — the stateless sampler keys make this exact."""
        scene, camera = setup
        td = 8
        b = 8
        sampler = UniformSampler(1)
        integ = PathParams(max_depth=2)
        origins = origins_for(b, td)

        single = make_wave_renderer(scene, camera, sampler, integ, td, b)
        ref_px, ref_rays = single(origins, jnp.int32(0), jnp.uint32(7))

        mesh = default_mesh(n_tiles_axis=8, n_samples_axis=1)
        sharded = make_sharded_wave_renderer(
            scene, camera, sampler, integ, td, mesh, samples_per_launch=1
        )
        px, rays = sharded(origins, jnp.int32(0), jnp.uint32(7))
        assert np.array_equal(np.asarray(px), np.asarray(ref_px))
        assert float(rays) == float(jnp.asarray(ref_rays))

    def test_sample_axis_psum(self, setup):
        """samples axis: 2 chips each render one generation; the psum'd
        result equals the sum of the two single-chip generations."""
        scene, camera = setup
        td = 8
        b = 4
        sampler = UniformSampler(1)
        integ = PathParams(max_depth=2)
        origins = origins_for(b, td)

        single = make_wave_renderer(scene, camera, sampler, integ, td, b)
        g0, _ = single(origins, jnp.int32(0), jnp.uint32(3))
        g1, _ = single(origins, jnp.int32(1), jnp.uint32(3))

        mesh = default_mesh(n_tiles_axis=4, n_samples_axis=2)
        sharded = make_sharded_wave_renderer(
            scene, camera, sampler, integ, td, mesh, samples_per_launch=2
        )
        px, _ = sharded(origins, jnp.int32(0), jnp.uint32(3))
        assert np.allclose(np.asarray(px), np.asarray(g0 + g1), atol=1e-5)

    def test_graft_entry(self):
        import __graft_entry__ as g

        fn, args = g.entry()
        px, rays = fn(*args)
        assert np.isfinite(np.asarray(px)).all()
        g.dryrun_multichip(8)
