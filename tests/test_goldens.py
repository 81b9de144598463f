"""Golden-image regression tests.

The reference ships no image tests (SURVEY.md §4); these pin the CPU-
backend renders of the built-in Cornell box so any unintended change to
sampling, shading, traversal or light math shows up as an image diff.
Goldens are committed npz files produced by this exact configuration;
regenerate deliberately when semantics change on purpose.
"""

from pathlib import Path

import numpy as np
import jax.numpy as jnp
import pytest

from yuki_tpu import integrators as intg
from yuki_tpu.camera import Camera
from yuki_tpu.sampling import SampleCtx, UniformSampler
from yuki_tpu.scene.cornell import cornell

GOLDENS = Path(__file__).parent / "goldens"


@pytest.fixture(scope="module")
def setup():
    scene, cam_params, _ = cornell()
    cam = Camera.create(cam_params, 64, 48)
    return scene, cam


def render(scene, cam, integrator_fn, spp):
    W, H = 64, 48
    sampler = UniformSampler(1)
    acc = None
    for s in range(spp):
        px, py = jnp.meshgrid(
            jnp.arange(W, dtype=jnp.int32), jnp.arange(H, dtype=jnp.int32),
            indexing="xy",
        )
        px, py = px.reshape(-1), py.reshape(-1)
        ctx = SampleCtx(px=px, py=py, sample_index=jnp.uint32(s),
                        seed=jnp.uint32(42))
        u = sampler.get_2d(ctx, 0)
        p_film = jnp.stack(
            [px.astype(jnp.float32), py.astype(jnp.float32)], -1
        ) + u
        o, d = cam.ray(p_film)
        r = integrator_fn(scene, sampler, ctx, o, d)
        acc = r if acc is None else acc + r
    return np.asarray(acc / spp).reshape(H, W, 3)


class TestGoldens:
    def test_path(self, setup):
        scene, cam = setup
        img = render(
            scene, cam,
            lambda sc, sa, ctx, o, d: intg.path_li(
                sc.data, sc.meta, intg.PathParams(4), sa, ctx, o, d
            ).li,
            spp=8,
        )
        gold = np.load(GOLDENS / "cornell_64x48_path4_8spp_seed42.npz")["img"]
        rmse = float(np.sqrt(np.mean((img - gold) ** 2)))
        assert rmse < 1e-4, f"path render diverged from golden (RMSE {rmse})"

    def test_whitted(self, setup):
        scene, cam = setup
        img = render(
            scene, cam,
            lambda sc, sa, ctx, o, d: intg.whitted_li(
                sc.data, sc.meta, intg.WhittedParams(3), sa, ctx, o, d
            ).li,
            spp=2,
        )
        gold = np.load(
            GOLDENS / "cornell_64x48_whitted3_2spp_seed42.npz"
        )["img"]
        rmse = float(np.sqrt(np.mean((img - gold) ** 2)))
        assert rmse < 1e-4, f"whitted render diverged (RMSE {rmse})"
