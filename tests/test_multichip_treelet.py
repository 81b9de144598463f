"""Multi-chip x treelet-engine composition test (round-2 verdict #4).

The production large-scene traversal (adaptive rows/stream dispatch +
overflow tiers + treelet fallback, traverse.py) was only ever exercised
on the real TPU backend, while shard_map tests rendered Cornell through
the dense path — the flagship combination had no coverage.  Here a
>DENSE_TRI_THRESHOLD soup forces treelet mode, FORCE_PALLAS_INTERPRET
runs the actual Pallas kernels in interpret mode on the 8-virtual-device
CPU mesh, and the sharded render must match the single-device render
BITWISE (parity bar: the reference's worker pool renders any scene
identically regardless of partitioning, render_manager.rs:197-244).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yuki_tpu import transforms as tf
from yuki_tpu import traverse
from yuki_tpu.camera import Camera, CameraParameters, FoV
from yuki_tpu.integrators import PathParams
from yuki_tpu.parallel import default_mesh, make_sharded_wave_renderer
from yuki_tpu.renderer import make_wave_renderer
from yuki_tpu.sampling import UniformSampler
from yuki_tpu.scene.data import SceneBuilder, DENSE_TRI_THRESHOLD


@pytest.fixture(scope="module")
def treelet_scene():
    """Random soup just above the dense/treelet threshold, with a point
    light + distant light so NEE occlusion waves run too."""
    rng = np.random.default_rng(23)
    n_tris = DENSE_TRI_THRESHOLD + 128
    base = (rng.random((n_tris, 1, 3)) - 0.5) * 8
    tri = (base + rng.standard_normal((n_tris, 3, 3)) * 0.3).astype(
        np.float32
    )
    b = SceneBuilder("treelet-soup")
    m = b.add_matte(kd=(0.7, 0.6, 0.5))
    for t in tri:
        b.add_mesh(tf.Transform.identity(), [0, 1, 2], t, material=m)
    b.add_point_light(
        tf.translation((0.0, 6.0, 0.0)), (60.0, 60.0, 60.0)
    )
    sc = b.build(split_method="sah", max_shapes_in_node=4)
    assert sc.meta.traversal == "treelet"
    cam = CameraParameters(
        position=(0.0, 0.0, 14.0), target=(0.0, 0.0, 0.0),
        up=(0.0, 1.0, 0.0), fov=FoV.y(45.0),
    )
    return sc, Camera.create(cam, 32, 32)


@pytest.fixture(scope="module", autouse=True)
def force_interpret():
    old = traverse.FORCE_PALLAS_INTERPRET
    traverse.FORCE_PALLAS_INTERPRET = True
    yield
    traverse.FORCE_PALLAS_INTERPRET = old


def test_sharded_treelet_matches_single_device(treelet_scene):
    scene, camera = treelet_scene
    td = 8
    b = 8
    sampler = UniformSampler(1)
    integ = PathParams(max_depth=2)
    origins = jnp.asarray(
        np.stack(
            [np.arange(b, dtype=np.int32) % 4 * td,
             np.arange(b, dtype=np.int32) // 4 * td], axis=1,
        )
    )

    single = make_wave_renderer(scene, camera, sampler, integ, td, b)
    ref_px, ref_rays = single(origins, jnp.int32(0), jnp.uint32(7))

    mesh = default_mesh(n_tiles_axis=8, n_samples_axis=1)
    sharded = make_sharded_wave_renderer(
        scene, camera, sampler, integ, td, mesh, samples_per_launch=1
    )
    px, rays = sharded(origins, jnp.int32(0), jnp.uint32(7))

    ref_np = np.asarray(ref_px)
    assert np.isfinite(ref_np).all()
    assert (ref_np > 0).any()  # the wave actually shades something
    assert np.array_equal(np.asarray(px), ref_np)
    assert float(rays) == float(jnp.asarray(ref_rays))
