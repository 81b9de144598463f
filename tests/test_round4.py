"""Round-4 regression tests.

The big one: the fused-shade support gate must be decidable UNDER JIT
TRACING.  Round 3's gate probed np.asarray(scene.spheres.material),
which raises on tracers; the try/except turned that into False, so
every production render of a sphere scene (Cornell included) silently
ran the slow XLA shading chain while every standalone benchmark
(concrete arrays) exercised the fused kernel — the round-3 "all
knockouts are flat" paradox."""

import jax
import jax.numpy as jnp
import numpy as np

from yuki_tpu.ops.shade_fused import fused_shade_supported
from yuki_tpu.sampling import StratifiedSampler, UniformSampler
from yuki_tpu.scene.cornell import cornell


def test_fused_gate_under_tracing():
    scene, _, _ = cornell()
    data, meta = scene.data, scene.meta
    sampler = UniformSampler(1)
    assert fused_shade_supported(data, meta, sampler)

    seen = []

    def probe(data):
        seen.append(fused_shade_supported(data, meta, sampler))
        return data.tris.p0.sum()

    jax.jit(probe)(data)
    assert seen == [True], (
        "fused-shade gate must not flip under tracing (round-3 bug: "
        "np.asarray on traced arrays -> except -> False)"
    )


def test_fused_gate_statics():
    scene, _, _ = cornell()
    data, meta = scene.data, scene.meta
    # Cornell: sphere material is untextured glass-ish -> supported.
    assert meta.n_spheres == 1
    assert meta.sphere_mats_untextured
    # Round-4 queue item 4 landed: the driver precomputes the
    # stratified sample planes in the XLA prologue, so Stratified now
    # takes the fused kernel too (tests/test_shade_fused.py parity).
    assert fused_shade_supported(data, meta, StratifiedSampler(2, 2))


def test_sphere_textured_gate():
    """A scene whose sphere material binds a texture must NOT take the
    fused path (sphere lanes skip uv)."""
    from yuki_tpu import transforms as tf
    from yuki_tpu.scene.data import SceneBuilder

    b = SceneBuilder("s")
    tex = b.add_texture(np.full((4, 4, 3), 0.5, np.float32))
    m = b.add_matte(kd=(1.0, 1.0, 1.0), kd_tex=tex)
    b.add_sphere(tf.translation((0.0, 0.0, 0.0)), 1.0, m)
    b.add_mesh(
        tf.translation((0.0, 0.0, 0.0)),
        np.array([[0, 1, 2]], np.int32),
        np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32),
        material=m,
    )
    b.add_point_light(tf.translation((0.0, 3.0, 0.0)), (1.0, 1.0, 1.0))
    scene = b.build()
    assert not scene.meta.sphere_mats_untextured
    assert not fused_shade_supported(
        scene.data, scene.meta, UniformSampler(1)
    )
