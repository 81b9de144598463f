"""Equivalence tests for the fused shading megakernel
(ops/shade_fused.py) against the reference XLA shading chain.

The kernel is a formula-for-formula SoA port of make_surface +
gather_materials + _nee_setup + bsdf_sample + the path_li shade tail,
so full renders through both paths must agree to float-reassociation
tolerance (the kernel reorders some reductions, e.g. SoA dot products).
Runs in Pallas interpret mode on the CPU backend."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yuki_tpu import integrators
from yuki_tpu.camera import Camera
from yuki_tpu.integrators import PathParams
from yuki_tpu.ops import shade_fused
from yuki_tpu.renderer import make_wave_renderer
from yuki_tpu.sampling import SampleCtx, UniformSampler, StratifiedSampler, pcg_hash
from yuki_tpu.scene.cornell import cornell
from yuki_tpu.scene.testscenes import colonnade


def test_pcg_i32_matches_u32():
    """The kernel's i32 PCG (wrapping mul + logical shifts) must be
    bit-identical to sampling.pcg_hash's u32 form."""
    rng = np.random.default_rng(3)
    x = rng.integers(0, 2**32, 4096, dtype=np.uint32)
    ref = np.asarray(pcg_hash(jnp.asarray(x)))
    xi = jax.lax.bitcast_convert_type(jnp.asarray(x), jnp.int32)
    got = np.asarray(
        jax.lax.bitcast_convert_type(shade_fused._pcg(xi), jnp.uint32)
    )
    assert np.array_equal(ref, got)


def _render(scene_tuple, mode, depth=5, spp=1, res=(64, 48), td=8,
            tiles=12, sampler=None):
    scene, cam_params, _ = scene_tuple
    camera = Camera.create(cam_params, *res)
    if sampler is None:
        sampler = UniformSampler(spp)
    origins = jnp.asarray(
        np.stack(
            [np.arange(tiles, dtype=np.int32) % 4 * td,
             np.arange(tiles, dtype=np.int32) // 4 * td], axis=1,
        )
    )
    old = integrators.FUSED_SHADE_MODE
    integrators.FUSED_SHADE_MODE = mode
    try:
        render = make_wave_renderer(
            scene, camera, sampler, PathParams(max_depth=depth), td, tiles
        )
        px, rays = render(origins, jnp.int32(0), jnp.uint32(7))
        return np.asarray(px), float(rays)
    finally:
        integrators.FUSED_SHADE_MODE = old


@pytest.mark.parametrize("depth", [2, 5])
def test_fused_matches_xla_cornell(depth):
    """Cornell (dense traversal, matte+glass+metal, rect area light,
    texture-bound back wall, one sphere): full render parity.

    Depth >= 4 cannot demand bitwise liveness parity: the kernel
    reorders float reductions, and a borderline intersection/RR
    decision (measured: ONE ray of ~2.9k at depth 5, two pixels) flips
    and cascades chaotically through the rest of that path.  Shallow
    depths stay strict; deep depths bound the flip count and the
    divergent-pixel set instead.  (Round 3's version of this test
    asserted exact equality and "passed" — vacuously: the support gate
    np.asarray'd traced arrays and silently disabled the kernel, so
    both sides ran XLA.  See tests/test_round4.py.)"""
    ref, rays_ref = _render(cornell(), "off", depth=depth)
    got, rays_got = _render(cornell(), "interpret", depth=depth)
    if depth <= 3:
        assert rays_ref == rays_got  # liveness chain identical
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
    else:
        assert abs(rays_ref - rays_got) <= 8  # of ~2.9k: borderline flips
        bad = np.abs(got - ref) > 2e-4 + 2e-4 * np.abs(ref)
        n_px = got.shape[0] * got.shape[1] if got.ndim >= 2 else len(got)
        assert bad.any(axis=-1).sum() <= max(4, n_px // 100), (
            f"{bad.any(axis=-1).sum()} divergent pixels"
        )
        # Energy agreement: chaos flips single paths, not the mean.
        np.testing.assert_allclose(got.mean(), ref.mean(), rtol=1e-3)


def test_fused_matches_xla_colonnade():
    """Colonnade (treelet scene, multiple lights): parity through the
    combined-trace path on the CPU fallback engines."""
    ref, rays_ref = _render(colonnade(), "off", depth=3)
    got, rays_got = _render(colonnade(), "interpret", depth=3)
    assert rays_ref == rays_got
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_fused_matches_xla_point_spot():
    """Point + spot light kernel branches (not exercised by Cornell's
    rect or colonnade's rect+distant): single-bounce NEE on a matte
    plane, fused vs XLA.  Also exercises the BLOCK_RAYS padding path
    (n=160 rays)."""
    from yuki_tpu.scene.data import SceneBuilder
    from yuki_tpu import transforms as tf
    from yuki_tpu import integrators as intg
    from yuki_tpu.sampling import SampleCtx

    b = SceneBuilder("pointspot")
    m = b.add_matte(kd=(0.6, 0.5, 0.4), sigma=0.3)
    s = 20.0
    b.add_mesh(
        tf.translation((0.0, 0.0, 0.0)),
        np.array([[0, 1, 2], [0, 2, 3]], np.int32),
        np.array([[-s, -s, 0], [s, -s, 0], [s, s, 0], [-s, s, 0]],
                 np.float32),
        material=m,
    )
    b.add_point_light(tf.translation((1.0, 0.0, 3.0)), (9.0, 8.0, 7.0))
    b.add_spot_light(
        tf.translation((-1.0, 0.5, 4.0)), (20.0, 20.0, 22.0),
        total_width_deg=40.0, falloff_start_deg=20.0,
    )
    scene = b.build()

    n = 160
    x = np.linspace(-3.0, 3.0, n, dtype=np.float32)
    o = jnp.asarray(np.stack([x, 0.1 * x, np.full(n, 5.0)], -1))
    d = jnp.asarray(np.tile(np.array([[0, 0, -1.0]], np.float32), (n, 1)))
    ctx = SampleCtx(
        px=jnp.arange(n, dtype=jnp.int32),
        py=jnp.zeros(n, jnp.int32),
        sample_index=jnp.uint32(0), seed=jnp.uint32(3),
    )

    def li(mode):
        old = integrators.FUSED_SHADE_MODE
        integrators.FUSED_SHADE_MODE = mode
        try:
            return np.asarray(
                intg.path_li(
                    scene.data, scene.meta, PathParams(max_depth=3),
                    UniformSampler(1), ctx, o, d,
                ).li
            )
        finally:
            integrators.FUSED_SHADE_MODE = old

    ref = li("off")
    got = li("interpret")
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=1e-6)


def test_supported_gate():
    scene, _, _ = cornell()
    assert shade_fused.fused_shade_supported(
        scene.data, scene.meta, UniformSampler(1)
    )
    # Round-4 (VERDICT item 4): stratified supported — the rejection
    # loop runs in the XLA prologue, never in the kernel.
    assert shade_fused.fused_shade_supported(
        scene.data, scene.meta, StratifiedSampler(2, 2)
    )


def test_fused_matches_xla_stratified():
    """StratifiedSampler through the fused kernel (round-4): the driver
    hoists the bounce's strata+jitter to an XLA prologue computed by the
    sampler itself, so the values entering the math are identical by
    construction and parity matches the uniform regime
    (stratified.rs:104-178 semantics)."""
    s = StratifiedSampler(pixel_samples_x=2, pixel_samples_y=2)
    ref, rays_ref = _render(cornell(), "off", depth=3, sampler=s)
    got, rays_got = _render(cornell(), "interpret", depth=3, sampler=s)
    assert rays_ref == rays_got
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
    # Non-power-of-two strata grid: exercises the rejection loop.
    s = StratifiedSampler(pixel_samples_x=3, pixel_samples_y=3)
    ref, rays_ref = _render(cornell(), "off", depth=2, sampler=s)
    got, rays_got = _render(cornell(), "interpret", depth=2, sampler=s)
    assert rays_ref == rays_got
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
