"""Round-3 hygiene regressions: advisor round-2 findings + verdict items.

Covers: Whitted glass step budget (verdict #6), treelet-path batch
padding (advisor medium #1), integer gather1d exactness above 2^24
(advisor medium #2), float imagemap sigma textures (advisor low #3),
distant-light shadow segment slack (advisor low #5).
"""

import jax.numpy as jnp
import numpy as np

from yuki_tpu.integrators import whitted_step_budget, _MAX_SPECULAR_STEPS


def test_whitted_step_budget_glass_free_is_one():
    for depth in (1, 3, 12):
        assert whitted_step_budget(depth, has_glass=False) == 1


def test_whitted_step_budget_glass_capped():
    assert whitted_step_budget(3, has_glass=True) == 7
    # Viewer max depth 12 must not be able to request a 4095-step scan.
    assert whitted_step_budget(12, has_glass=True) == _MAX_SPECULAR_STEPS
    assert _MAX_SPECULAR_STEPS <= 255


def test_gather1d_int_large_values_exact():
    # The naive f32 MXU round-trip corrupts ints above 2^24 (advisor
    # round-2 medium finding); the hi/lo-split MXU path must be exact
    # for EVERY int32, including >2^24 offsets and negatives.
    from yuki_tpu.gathers import gather1d

    big = np.array(
        [0, 2**24 + 1, 2**25 + 3, 123456789, -5, -(2**24) - 7,
         2**31 - 1, -(2**31)],
        dtype=np.int32,
    )
    idx = jnp.asarray([1, 2, 3, 0, 4, 5, 6, 7, 0, 6], dtype=jnp.int32)
    out = np.asarray(gather1d(jnp.asarray(big), idx))
    np.testing.assert_array_equal(out, big[np.asarray(idx)])


def test_eval_texture_large_offset_exact():
    # Descriptor fetches ride ONE MXU row; the offset's hi/lo split must
    # address texels above 2^24 exactly.
    from yuki_tpu.scene.data import TextureAtlas
    from yuki_tpu.textures import eval_texture

    n_texels = 2**24 + 64
    texels = jnp.zeros((n_texels, 3), jnp.float32)
    texels = texels.at[2**24 + 5].set(jnp.asarray([0.25, 0.5, 0.75]))
    atlas = TextureAtlas(
        texels=texels,
        offset=jnp.asarray([0, 2**24], jnp.int32),
        width=jnp.asarray([4, 8], jnp.int32),
        height=jnp.asarray([4, 8], jnp.int32),
    )
    # Texture 1, texel (x=5, y=0): off + y*w + x = 2^24 + 5.
    # eval_texture flips t: use t just under 1/8 so yi == h-1... pick
    # uv that lands on y=0 after the flip: t = 1 - eps -> yi = 0.
    uv = jnp.asarray([[(5.0 + 0.5) / 8.0, 1.0 - 1e-4]])
    out = np.asarray(
        eval_texture(atlas, jnp.asarray([1], jnp.int32), uv)
    )
    np.testing.assert_allclose(out[0], [0.25, 0.5, 0.75], rtol=0)


def test_pad128_shapes_and_benign_tail():
    from yuki_tpu.scene.cornell import cornell
    from yuki_tpu.traverse import _pad128

    scene, _, _ = cornell()
    data = scene.data
    n = 3
    o = jnp.zeros((n, 3))
    d = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]]), (n, 1))
    t = jnp.full((n,), 5.0)
    skip = jnp.full((n,), 7, jnp.int32)
    op, dp, tp, sp = _pad128(data, o, d, t, skip)
    assert op.shape == (128, 3) and sp.shape == (128,)
    # Pad lanes are parked: t_max 0 (dead for every cull), skip -2.
    assert float(jnp.max(tp[n:])) == 0.0
    assert int(sp[n]) == -2
    # Original lanes unchanged.
    np.testing.assert_allclose(np.asarray(op[:n]), np.asarray(o))
    np.testing.assert_allclose(np.asarray(tp[:n]), np.asarray(t))


def test_pbrt_float_imagemap_sigma_loads(tmp_path):
    # A matte whose sigma binds a "float" imagemap texture must load (the
    # type a Texture<f32> sigma binding actually uses in pbrt); advisor
    # round-2: these scenes previously failed to load entirely.
    from PIL import Image

    from yuki_tpu.app.settings import SceneLoadSettings
    from yuki_tpu.scene.pbrt import load_pbrt

    img = (np.ones((4, 4), dtype=np.uint8) * 128)
    Image.fromarray(img, mode="L").save(tmp_path / "sigma.png")
    (tmp_path / "s.pbrt").write_text(
        """
LookAt 0 0 5  0 0 0  0 1 0
Camera "perspective" "float fov" [45]
Film "image" "integer xresolution" [8] "integer yresolution" [8]
WorldBegin
Texture "sig" "float" "imagemap" "string filename" ["sigma.png"]
Material "matte" "rgb Kd" [.5 .5 .5] "texture sigma" ["sig"]
Shape "trianglemesh" "integer indices" [0 1 2]
  "point P" [-1 -1 0  1 -1 0  0 1 0]
WorldEnd
"""
    )
    scene, _cam, _film = load_pbrt(SceneLoadSettings(path=str(tmp_path / "s.pbrt")))
    assert scene.data.tris.p0.shape[0] == 1


def test_distant_light_segment_covers_full_diagonal():
    # target length * 0.9999 (the _nee t_max) must still exceed the AABB
    # diagonal (advisor round-2 low finding).
    from yuki_tpu.scene.cornell import cornell

    scene, _, _ = cornell()
    data = scene.data
    diag = float(jnp.linalg.norm(data.world_hi - data.world_lo))
    scaled = diag * 1.002 + 1e-3
    assert scaled * 0.9999 > diag


class TestRowsDispatchCapacity:
    """Advisor round-2 low #4: the rows-branch dispatch must gate on the
    engine's QUAD-aligned pair demand, not the raw popcount mean — a
    near-threshold wave otherwise overflows the cap, flags every ray,
    and dumps the whole wave on the slow fallback."""

    def test_demand_counts_alignment_forced_and_clamp(self):
        import numpy as np
        import jax.numpy as jnp

        from yuki_tpu import traverse
        from yuki_tpu.ops.trace_rows import QUAD

        w = np.zeros((3, 7), np.int32)
        w[1, 0] = 0b11111  # 5 pairs -> padded to 8
        w[2, :] = -1  # 224 pairs -> clamped to _ROWS_C
        demand = int(traverse._rows_demand(jnp.asarray(w)))
        assert demand == QUAD + 8 + traverse._ROWS_C

    def test_demand_never_exceeds_engine_cap_when_dispatched(self):
        # The dispatch predicate (demand <= rows * _ROWS_MULT) implies
        # n_pairs <= cap in rows_closest_w: cap rounds mult*rows UP.
        import numpy as np
        import jax.numpy as jnp

        from yuki_tpu import traverse
        from yuki_tpu.ops.trace_rows import QUAD

        rows = 16
        rng = np.random.default_rng(0)
        w = rng.integers(0, 2, (rows, 7), np.int32) * -1
        demand = int(traverse._rows_demand(jnp.asarray(w)))
        cap = -(-(traverse._ROWS_MULT * rows) // (2 * QUAD)) * 2 * QUAD
        if demand <= rows * traverse._ROWS_MULT:
            assert demand <= cap
