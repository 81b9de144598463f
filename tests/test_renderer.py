"""Render-runtime integration tests (manager thread, film updates,
cancellation, accumulation) on the CPU backend."""

import time

import numpy as np
import jax.numpy as jnp
import pytest

from yuki_tpu.film import FilmSettings, film_or_new, film_tiles
from yuki_tpu.integrators import PathParams
from yuki_tpu.renderer import (
    Renderer,
    RenderError,
    RenderFinished,
    RenderProgress,
    RenderSettings,
)
from yuki_tpu.sampling import UniformSampler
from yuki_tpu.scene.cornell import cornell


@pytest.fixture(scope="module")
def scene_and_cam():
    scene, cam_params, _ = cornell()
    return scene, cam_params


def run_to_completion(renderer, timeout=120.0):
    msgs = []
    t0 = time.monotonic()
    while time.monotonic() - t0 < timeout:
        time.sleep(0.05)
        for m in renderer.check_status():
            msgs.append(m)
            if isinstance(m, (RenderFinished, RenderError)):
                return msgs
        if not renderer.is_active():
            break
    return msgs


class TestRenderer:
    def test_full_render_finishes(self, scene_and_cam):
        scene, cam = scene_and_cam
        fs = FilmSettings(res=(64, 48), tile_dim=16)
        film = film_or_new(None, fs)
        r = Renderer()
        r.launch(scene, cam, film, UniformSampler(2), PathParams(2), fs,
                 RenderSettings(wave_tiles=6))
        msgs = run_to_completion(r)
        assert isinstance(msgs[-1], RenderFinished)
        assert msgs[-1].ray_count > 0
        img = film.image()
        assert img.shape == (48, 64, 3)
        assert np.isfinite(img).all()
        assert img.mean() > 0.01
        # Every tile got its spp-average exactly once.
        assert (np.asarray(film.samples) == 1).all()
        r.kill()

    def test_progress_messages(self, scene_and_cam):
        scene, cam = scene_and_cam
        fs = FilmSettings(res=(64, 48), tile_dim=16)
        film = film_or_new(None, fs)
        r = Renderer()
        r.launch(scene, cam, film, UniformSampler(1), PathParams(1), fs,
                 RenderSettings(wave_tiles=2))
        msgs = run_to_completion(r)
        progress = [m for m in msgs if isinstance(m, RenderProgress)]
        assert progress, "expected progress messages"
        assert progress[-1].tiles_done == progress[-1].tiles_total
        assert progress[-1].rays_per_sec > 0
        r.kill()

    def test_accumulation_generations(self, scene_and_cam):
        """Accumulate mode: each launch adds sample generations; tile
        counts track them (render_manager.rs:130-143 semantics)."""
        scene, cam = scene_and_cam
        fs = FilmSettings(res=(32, 32), tile_dim=16, accumulate=True)
        film = film_or_new(None, fs)
        r = Renderer()
        r.launch(scene, cam, film, UniformSampler(2), PathParams(1), fs)
        msgs = run_to_completion(r)
        assert isinstance(msgs[-1], RenderFinished)
        assert (np.asarray(film.samples) == 2).all()  # spp generations
        r.kill()

    def test_kill_cancels(self, scene_and_cam):
        scene, cam = scene_and_cam
        fs = FilmSettings(res=(128, 96), tile_dim=16)
        film = film_or_new(None, fs)
        r = Renderer()
        r.launch(scene, cam, film, UniformSampler(8), PathParams(3), fs,
                 RenderSettings(wave_tiles=1))
        time.sleep(0.2)
        r.kill()
        assert not r.is_active()

    def test_stale_render_filtered(self, scene_and_cam):
        """Relaunching bumps render_id; old messages are dropped
        (renderer/mod.rs:61-120)."""
        scene, cam = scene_and_cam
        fs = FilmSettings(res=(32, 32), tile_dim=16)
        film = film_or_new(None, fs)
        r = Renderer()
        r.launch(scene, cam, film, UniformSampler(1), PathParams(1), fs)
        rid2 = r.launch(scene, cam, film, UniformSampler(1), PathParams(1), fs)
        msgs = run_to_completion(r)
        assert all(m.render_id == rid2 for m in msgs)
        r.kill()

    def test_deterministic_across_runs(self, scene_and_cam):
        """Same seed => identical film regardless of wave partitioning
        (the reference's per-tile deterministic reseeding guarantee,
        integrators/mod.rs:135-142)."""
        scene, cam = scene_and_cam
        fs = FilmSettings(res=(64, 48), tile_dim=16)
        imgs = []
        for wave in (3, 12):
            film = film_or_new(None, fs)
            r = Renderer()
            r.launch(scene, cam, film, UniformSampler(2), PathParams(2), fs,
                     RenderSettings(wave_tiles=wave), match_seed=42)
            msgs = run_to_completion(r)
            assert isinstance(msgs[-1], RenderFinished)
            imgs.append(film.image())
            r.kill()
        assert np.array_equal(imgs[0], imgs[1])


class TestSampleBatching:
    def test_samples_per_launch_bitwise(self, scene_and_cam):
        """A samples_per_launch=S dispatch returns the exact SUM of the S
        single-sample dispatches (the stateless seeking sampler hashes
        (pixel, sample_index), so batching cannot change any sample)."""
        import jax.numpy as jnp

        from yuki_tpu.camera import Camera
        from yuki_tpu.renderer import make_wave_renderer

        scene, cam = scene_and_cam
        camera = Camera.create(cam, 64, 48)
        sampler = UniformSampler(1)
        origins = jnp.asarray([[0, 0], [16, 16], [32, 32]], jnp.int32)

        single = make_wave_renderer(
            scene, camera, sampler, PathParams(2), 16, 3,
        )
        batched = make_wave_renderer(
            scene, camera, sampler, PathParams(2), 16, 3,
            samples_per_launch=4,
        )
        acc = None
        rays_sum = 0.0
        for s in range(4):
            px, r = single(origins, jnp.int32(s), jnp.uint32(7))
            acc = px if acc is None else acc + px
            rays_sum += float(r)
        px_b, r_b = batched(origins, jnp.int32(0), jnp.uint32(7))
        assert np.allclose(np.asarray(px_b), np.asarray(acc), atol=1e-6)
        assert float(r_b) == rays_sum

    def test_render_job_samples_per_launch(self, scene_and_cam):
        """Non-accumulate render with samples_per_launch>1 produces the
        same film as the per-sample loop (single-device path)."""
        import jax

        if len(jax.devices()) > 1:
            pytest.skip("single-device batching path only")
        scene, cam = scene_and_cam
        fs = FilmSettings(res=(32, 32), tile_dim=16)
        imgs = []
        for spl in (1, 2):
            film = film_or_new(None, fs)
            r = Renderer()
            r.launch(scene, cam, film, UniformSampler(4), PathParams(2), fs,
                     RenderSettings(wave_tiles=2, samples_per_launch=spl),
                     match_seed=3)
            msgs = run_to_completion(r)
            assert isinstance(msgs[-1], RenderFinished)
            imgs.append(film.image())
            r.kill()
        assert np.allclose(imgs[0], imgs[1], atol=1e-6)


class TestMultiDevice:
    def test_renderer_uses_all_devices(self, scene_and_cam):
        """On the 8-virtual-device CPU mesh the render manager shards waves
        across devices and still produces the exact single-device image
        (stateless samplers make this bitwise)."""
        import jax

        assert len(jax.devices()) == 8  # conftest forces the virtual mesh
        scene, cam = scene_and_cam
        fs = FilmSettings(res=(64, 48), tile_dim=16)
        imgs = []
        for single in (True, False):
            film = film_or_new(None, fs)
            r = Renderer()
            r.launch(scene, cam, film, UniformSampler(1), PathParams(2), fs,
                     RenderSettings(wave_tiles=8,
                                    use_single_render_thread=single),
                     match_seed=5)
            msgs = run_to_completion(r)
            assert isinstance(msgs[-1], RenderFinished)
            imgs.append(film.image())
            r.kill()
        assert np.array_equal(imgs[0], imgs[1])
