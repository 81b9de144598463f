"""Tonemap + texture unit tests (renderpasses/tonemap.rs, textures/)."""

import numpy as np
import jax.numpy as jnp

from yuki_tpu.tonemap import (
    FilmicParams,
    HeatmapParams,
    aces_fitted,
    filmic,
    find_min_max,
    heatmap,
    srgb_encode,
)
from yuki_tpu.textures import eval_texture
from yuki_tpu.scene.data import SceneBuilder


class TestAces:
    def test_range(self):
        c = jnp.asarray(np.random.default_rng(0).random((64, 3)) * 10)
        out = np.asarray(aces_fitted(c))
        assert (out >= 0).all() and (out <= 1).all()

    def test_monotone_luminance(self):
        greys = jnp.stack([jnp.linspace(0, 8, 50)] * 3, axis=-1)
        out = np.asarray(aces_fitted(greys))
        assert (np.diff(out[:, 1]) >= -1e-6).all()

    def test_black_stays_black(self):
        out = np.asarray(aces_fitted(jnp.zeros((1, 3))))
        assert np.allclose(out, 0.0, atol=1e-4)

    def test_exposure_scales(self):
        c = jnp.asarray([[0.2, 0.2, 0.2]])
        lo = np.asarray(filmic(c, FilmicParams(exposure=0.5)))
        hi = np.asarray(filmic(c, FilmicParams(exposure=2.0)))
        assert (hi > lo).all()


class TestHeatmap:
    def test_gradient_endpoints(self):
        p = HeatmapParams(min_val=0.0, max_val=1.0)
        lum = lambda v: jnp.full((1, 3), v)
        lo = np.asarray(heatmap(lum(0.0), p))[0]
        mid = np.asarray(heatmap(lum(0.5), p))[0]
        hi = np.asarray(heatmap(lum(1.0), p))[0]
        assert np.allclose(lo, [0, 0, 1], atol=1e-5)  # blue
        assert np.allclose(mid, [0, 1, 0], atol=1e-5)  # green
        assert np.allclose(hi, [1, 0, 0], atol=1e-5)  # red

    def test_channel_select(self):
        c = jnp.asarray([[0.0, 1.0, 0.0]])
        p = HeatmapParams(channel=1, min_val=0.0, max_val=1.0)
        assert np.allclose(np.asarray(heatmap(c, p))[0], [1, 0, 0], atol=1e-5)

    def test_find_min_max(self):
        img = np.zeros((4, 4, 3), np.float32)
        img[1, 1] = [0, 4.0, 0]
        mn, mx = find_min_max(img, None)
        assert mn == 0.0
        assert abs(mx - 4.0 * 0.7152) < 1e-5


class TestSrgb:
    def test_roundtrip_range(self):
        c = jnp.linspace(0, 1, 32)
        out = np.asarray(srgb_encode(c))
        assert (out >= 0).all() and (out <= 1).all()
        assert (np.diff(out) > 0).all()


class TestTextures:
    def _atlas(self):
        b = SceneBuilder()
        img = np.zeros((2, 2, 3), np.float32)
        img[0, 0] = [1, 0, 0]  # top-left
        img[0, 1] = [0, 1, 0]
        img[1, 0] = [0, 0, 1]
        img[1, 1] = [1, 1, 0]
        b.add_texture(img)
        m = b.add_matte()
        import yuki_tpu.transforms as tf
        b.add_mesh(tf.Transform.identity(), [0, 1, 2],
                   [(0, 0, 0), (1, 0, 0), (0, 1, 0)], material=m)
        return b.build().data.textures

    def test_point_sampling_y_flip(self):
        atlas = self._atlas()
        tid = jnp.zeros(4, jnp.int32)
        # uv y is flipped (image_texture.rs:100); uv (0.25,0.75) -> row 0 col 0
        uv = jnp.asarray([
            [0.25, 0.75], [0.75, 0.75], [0.25, 0.25], [0.75, 0.25],
        ])
        out = np.asarray(eval_texture(atlas, tid, uv))
        assert np.allclose(out[0], [1, 0, 0])
        assert np.allclose(out[1], [0, 1, 0])
        assert np.allclose(out[2], [0, 0, 1])
        assert np.allclose(out[3], [1, 1, 0])

    def test_repeat_wrap(self):
        atlas = self._atlas()
        tid = jnp.zeros(2, jnp.int32)
        uv = jnp.asarray([[0.25, 0.75], [1.25, -0.25]])  # +1 wraps
        out = np.asarray(eval_texture(atlas, tid, uv))
        assert np.allclose(out[0], out[1])
