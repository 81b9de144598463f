"""Settings yaml round-trip (InitialSettings parity, app/mod.rs:19-26)."""

import numpy as np

from yuki_tpu.app.settings import (
    InitialSettings,
    SceneLoadSettings,
    ToneMapSettings,
    load_settings,
    save_settings,
)
from yuki_tpu.film import FilmSettings
from yuki_tpu.integrators import PathParams, WhittedParams
from yuki_tpu.renderer import RenderSettings
from yuki_tpu.sampling import StratifiedSampler, UniformSampler


class TestSettings:
    def test_defaults_match_reference(self):
        s = InitialSettings()
        assert s.film_settings.res == (640, 480)
        assert s.film_settings.tile_dim == 16
        assert isinstance(s.sampler, StratifiedSampler)
        assert isinstance(s.integrator, WhittedParams)
        assert s.integrator.max_depth == 3

    def test_roundtrip(self, tmp_path):
        s = InitialSettings(
            film_settings=FilmSettings(res=(320, 200), tile_dim=8,
                                       accumulate=True, sixteenth_res=True),
            sampler=UniformSampler(pixel_samples=16),
            integrator=PathParams(max_depth=7, indirect_clamp=2.5),
            tone_map=ToneMapSettings(kind="Heatmap", exposure=1.5,
                                     channel=2, min_val=0.1, max_val=9.0),
            render_settings=RenderSettings(mark_tiles=True, wave_tiles=32),
            load_settings=SceneLoadSettings(path="x.pbrt",
                                            split_method="Middle",
                                            max_shapes_in_node=4),
        )
        p = str(tmp_path / "settings.yaml")
        save_settings(s, p)
        back = load_settings(p)
        assert back.film_settings == s.film_settings
        assert back.sampler == s.sampler
        assert back.integrator == s.integrator
        assert back.tone_map.kind == "Heatmap"
        assert back.tone_map.channel == 2
        assert back.render_settings == s.render_settings
        assert back.load_settings.split_method_key() == "middle"

    def test_debug_integrator_roundtrip(self, tmp_path):
        s = InitialSettings(integrator="bvh_intersections")
        p = str(tmp_path / "s.yaml")
        save_settings(s, p)
        assert load_settings(p).integrator == "bvh_intersections"

    def test_missing_file_gives_defaults(self):
        s = load_settings(None)
        assert s.film_settings.res == (640, 480)

    def test_stratified_roundtrip(self, tmp_path):
        s = InitialSettings(
            sampler=StratifiedSampler(pixel_samples_x=4, pixel_samples_y=2,
                                      jitter=False)
        )
        p = str(tmp_path / "s.yaml")
        save_settings(s, p)
        back = load_settings(p)
        assert back.sampler.pixel_samples_x == 4
        assert back.sampler.pixel_samples_y == 2
        assert back.sampler.jitter is False
