"""Tonemapping as JAX image ops.

The reference runs these as GLSL fullscreen passes (app/renderpasses/
tonemap.rs); on TPU they are plain array ops over the film plane:
  * Filmic: sample-count normalize + exposure + the Stephen Hill ACES fit
    (MJP/Neubelt port, tonemap.rs:318-385).
  * Heatmap: channel-or-luminance -> blue/green/red gradient with min/max
    bounds (tonemap.rs:387-422).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np
import jax.numpy as jnp

ACES_INPUT = jnp.array(
    [
        [0.59719, 0.35458, 0.04823],
        [0.07600, 0.90834, 0.01566],
        [0.02840, 0.13383, 0.83777],
    ],
    dtype=jnp.float32,
)

ACES_OUTPUT = jnp.array(
    [
        [1.60475, -0.53108, -0.07367],
        [-0.10208, 1.10813, -0.00605],
        [-0.00327, -0.07276, 1.07602],
    ],
    dtype=jnp.float32,
)


@dataclass(frozen=True)
class FilmicParams:
    exposure: float = 1.0


@dataclass(frozen=True)
class HeatmapParams:
    channel: Optional[int] = None  # None = luminance, else 0/1/2
    min_val: float = 0.0
    max_val: float = 1.0


def _rrt_odt_fit(v: jnp.ndarray) -> jnp.ndarray:
    a = v * (v + 0.0245786) - 0.000090537
    b = v * (0.983729 * v + 0.4329510) + 0.238081
    return a / b


def aces_fitted(color: jnp.ndarray) -> jnp.ndarray:
    """color [...,3] linear -> tonemapped [0,1]."""
    c = jnp.einsum("ij,...j->...i", ACES_INPUT, color)
    c = _rrt_odt_fit(c)
    c = jnp.einsum("ij,...j->...i", ACES_OUTPUT, c)
    return jnp.clip(c, 0.0, 1.0)


def filmic(color: jnp.ndarray, params: FilmicParams = FilmicParams()) -> jnp.ndarray:
    """Exposure + ACES. Caller handles sample-count normalization."""
    return aces_fitted(color * params.exposure)


def heatmap(color: jnp.ndarray, params: HeatmapParams) -> jnp.ndarray:
    if params.channel is not None and 0 < params.channel < 3:
        value = color[..., params.channel]
    else:
        value = (
            0.2126 * color[..., 0]
            + 0.7152 * color[..., 1]
            + 0.0722 * color[..., 2]
        )
    scaled = (value - params.min_val) / (params.max_val - params.min_val)
    low = jnp.array([0.0, 0.0, 1.0])
    mid = jnp.array([0.0, 1.0, 0.0])
    high = jnp.array([1.0, 0.0, 0.0])
    t1 = jnp.clip(scaled * 2.0, 0.0, 1.0)[..., None]
    t2 = jnp.clip(scaled * 2.0 - 1.0, 0.0, 1.0)[..., None]
    return (low + (mid - low) * t1) * (1.0 - t2) + high * t2


def find_min_max(color: np.ndarray, channel: Optional[int]) -> tuple[float, float]:
    """CPU scan used to auto-range the heatmap (tonemap.rs:447-472)."""
    if channel is not None and 0 < channel < 3:
        v = color[..., channel]
    else:
        v = (
            0.2126 * color[..., 0]
            + 0.7152 * color[..., 1]
            + 0.0722 * color[..., 2]
        )
    return float(v.min()), float(v.max())


def srgb_encode(c: jnp.ndarray) -> jnp.ndarray:
    """Shader-side sRGB gamma (renderpasses/scale_output.rs:60-117)."""
    c = jnp.clip(c, 0.0, 1.0)
    return jnp.where(
        c <= 0.0031308, 12.92 * c, 1.055 * jnp.power(c, 1.0 / 2.4) - 0.055
    )
