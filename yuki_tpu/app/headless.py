"""Headless rendering (app/headless.rs:24-158): render to an EXR with a
CR-overwritten progress line, polling the renderer every 100 ms."""

from __future__ import annotations

import sys
import time

import numpy as np
import jax.numpy as jnp

from ..film import Film, film_or_new
from ..renderer import Renderer, RenderError, RenderFinished, RenderProgress
from ..sampling import StratifiedSampler, UniformSampler
from ..tonemap import FilmicParams, HeatmapParams, filmic, heatmap
from .settings import InitialSettings
from .util import try_load_scene, write_exr


def render(settings: InitialSettings, out_path: str, quiet: bool = False) -> dict:
    """Blocking headless render; returns stats {rays, elapsed_s, mrays_s}."""
    scene, cam_params, scene_film, _secs = try_load_scene(settings.load_settings)
    film_settings = settings.film_settings
    if settings.load_settings.path:
        # Scene files carry their own film settings like the reference; CLI
        # settings override resolution only if explicitly provided.
        film_settings = scene_film if film_settings is None else film_settings

    film = film_or_new(None, film_settings)
    renderer = Renderer()
    renderer.launch(
        scene,
        cam_params,
        film,
        settings.sampler,
        settings.integrator,
        film_settings,
        settings.render_settings,
        match_seed=0,
    )

    stats = {}
    done = False
    while not done:
        time.sleep(0.1)
        for msg in renderer.check_status():
            if isinstance(msg, RenderProgress):
                if not quiet:
                    sys.stdout.write(
                        f"\r{msg.tiles_done}/{msg.tiles_total} tiles "
                        f"{msg.rays_per_sec / 1e6:5.2f} Mrays/s "
                        f"ETA {msg.approx_remaining_s:5.1f}s   "
                    )
                    sys.stdout.flush()
            elif isinstance(msg, RenderError):
                renderer.kill()
                raise RuntimeError(f"render failed: {msg.message}")
            elif isinstance(msg, RenderFinished):
                stats = {
                    "rays": msg.ray_count,
                    "elapsed_s": msg.elapsed_s,
                    "mrays_s": msg.ray_count / max(msg.elapsed_s, 1e-9) / 1e6,
                }
                done = True
        if not renderer.is_active() and not done:
            break
    renderer.kill()
    if not quiet:
        print()

    img = film.image_device()  # sample-normalized [H,W,3]
    tm = settings.tone_map
    if tm.kind == "Filmic":
        img = filmic(img, FilmicParams(exposure=tm.exposure))
    elif tm.kind == "Heatmap":
        img = heatmap(
            img,
            HeatmapParams(
                channel=tm.channel, min_val=tm.min_val, max_val=tm.max_val
            ),
        )
    # Raw: sample-normalized linear radiance, like the reference's raw EXR.
    write_exr(out_path, np.asarray(img))
    if not quiet:
        print(
            f"Wrote {out_path}: {stats.get('rays', 0)} rays in "
            f"{stats.get('elapsed_s', 0.0):.2f}s "
            f"({stats.get('mrays_s', 0.0):.2f} Mrays/s)"
        )
    return stats
