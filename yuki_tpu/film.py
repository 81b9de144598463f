"""Film: tile-major device pixel storage + host-side tile bookkeeping.

TPU redesign of the reference film (yuki/src/film.rs): instead of a flat
[H,W] mutex-guarded pixel vector updated tile-by-tile from worker threads
(film.rs:210-282), pixels live on device in *tile-major* layout
``[n_tiles, tile_dim, tile_dim, 3]`` so a whole wave of rendered tiles lands
with one scatter-add, and sample counts are a ``[n_tiles]`` device vector.
``image()`` reassembles (and sample-normalizes) the [H,W,3] plane.

Sums + counts unify the reference's two write modes: non-accumulating
renders add spp samples then divide on read; accumulate mode (+= per
generation, film.rs:260-282) is the same thing with counts growing over
launches.  Tile generation and the center-out spiral order
(film.rs:299-376) are host numpy.  Staleness uses the same
generation-token scheme (film.rs:68-140).
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass
from typing import List, Tuple

import numpy as np
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class FilmSettings:
    """FilmSettings (film.rs:13-39); defaults match the reference."""

    res: Tuple[int, int] = (640, 480)  # (x, y)
    tile_dim: int = 16
    clear: bool = True
    accumulate: bool = False
    sixteenth_res: bool = False

    def effective_res(self) -> Tuple[int, int]:
        """1/16th-res preview divides each axis by 4 (film.rs:25-26)."""
        if self.sixteenth_res:
            return (max(self.res[0] // 4, 1), max(self.res[1] // 4, 1))
        return self.res


@dataclass(frozen=True)
class FilmTile:
    """Pixel-bounds tile; sample = accumulation generation (film.rs:41-65)."""

    x0: int
    y0: int
    index: int  # flat tile index in the tile-major buffer
    sample: int = 0


def tile_grid(res_x: int, res_y: int, tile_dim: int) -> Tuple[int, int]:
    return (
        (res_x + tile_dim - 1) // tile_dim,
        (res_y + tile_dim - 1) // tile_dim,
    )


def generate_tiles(res_x: int, res_y: int, tile_dim: int) -> dict:
    """Grid partition hashed by tile coords (film.rs:299-331)."""
    tiles = {}
    tx, _ = tile_grid(res_x, res_y, tile_dim)
    for tj, j in enumerate(range(0, res_y, tile_dim)):
        for ti, i in enumerate(range(0, res_x, tile_dim)):
            tiles[(ti, tj)] = FilmTile(i, j, tj * tx + ti)
    return tiles


def outward_spiral(tiles: dict, res_x: int, res_y: int, tile_dim: int) -> List[FilmTile]:
    """Center-out spiral ordering (film.rs:333-376)."""
    h_tiles, v_tiles = tile_grid(res_x, res_y, tile_dim)
    center_x = (h_tiles // 2) - (1 - h_tiles % 2)
    center_y = (v_tiles // 2) - (1 - v_tiles % 2)
    max_dim = max(h_tiles, v_tiles)
    x = y = 0
    dx, dy = 0, -1
    order = []
    for _ in range(max_dim * max_dim):
        tx, ty = center_x + x, center_y + y
        if 0 <= tx < h_tiles and 0 <= ty < v_tiles:
            order.append(tiles.pop((tx, ty)))
        if x == y or (x < 0 and x == -y) or (x > 0 and x == 1 - y):
            dx, dy = -dy, dx
        x += dx
        y += dy
    return order


def film_tiles(settings: FilmSettings) -> List[FilmTile]:
    rx, ry = settings.effective_res()
    td = settings.tile_dim
    return outward_spiral(generate_tiles(rx, ry, td), rx, ry, td)


class Film:
    """Tile-major device pixel sums + per-tile sample counts."""

    _next_id = itertools.count(1)

    def __init__(self, res_x: int, res_y: int, tile_dim: int):
        self.res = (res_x, res_y)
        self.tile_dim = tile_dim
        self.grid = tile_grid(res_x, res_y, tile_dim)
        n_tiles = self.grid[0] * self.grid[1]
        self.tiles_buf = jnp.zeros(
            (n_tiles, tile_dim, tile_dim, 3), dtype=jnp.float32
        )
        self.samples = jnp.zeros((n_tiles,), dtype=jnp.int32)
        self.generation = 0
        self.film_id = next(Film._next_id)
        self.dirty = True

    @property
    def n_tiles(self) -> int:
        return self.tiles_buf.shape[0]

    def clear(self):
        self.tiles_buf = jnp.zeros_like(self.tiles_buf)
        self.samples = jnp.zeros_like(self.samples)
        self.generation += 1
        self.dirty = True

    def add_tiles(self, tile_ids: jnp.ndarray, tile_pixels: jnp.ndarray):
        """Scatter-add a rendered wave: tile_ids [B], pixels [B,td,td,3].
        Each tile contributes one sample generation.  Out-of-range ids
        (wave padding) are dropped."""
        self.tiles_buf = self.tiles_buf.at[tile_ids].add(tile_pixels, mode="drop")
        self.samples = self.samples.at[tile_ids].add(1, mode="drop")
        self.dirty = True

    def mark_tiles(self, tile_ids: np.ndarray):
        """Magenta in-progress markers (film.rs:184-207) — sets the tiles to
        magenta * current sample count so the displayed average is magenta."""
        n = jnp.maximum(self.samples[jnp.minimum(tile_ids, self.n_tiles - 1)], 1)
        magenta = jnp.array([1.0, 0.0, 1.0], dtype=jnp.float32)
        self.tiles_buf = self.tiles_buf.at[tile_ids].set(
            magenta * n.astype(jnp.float32)[:, None, None, None], mode="drop"
        )
        self.dirty = True

    def image_device(self) -> jnp.ndarray:
        """Sample-normalized [H,W,3] device image."""
        tx, ty = self.grid
        td = self.tile_dim
        counts = jnp.maximum(self.samples, 1).astype(jnp.float32)
        norm = self.tiles_buf / counts[:, None, None, None]
        img = norm.reshape(ty, tx, td, td, 3).transpose(0, 2, 1, 3, 4)
        img = img.reshape(ty * td, tx * td, 3)
        return img[: self.res[1], : self.res[0]]

    def image(self) -> np.ndarray:
        return np.asarray(self.image_device())

    def raw_sums(self) -> np.ndarray:
        """Unnormalized [H,W,3] sums (for parity with the reference's raw
        EXR in non-accumulating mode divide by spp yourself)."""
        tx, ty = self.grid
        td = self.tile_dim
        img = np.asarray(self.tiles_buf).reshape(ty, tx, td, td, 3)
        img = img.transpose(0, 2, 1, 3, 4).reshape(ty * td, tx * td, 3)
        return img[: self.res[1], : self.res[0]]


def film_or_new(film: Film | None, settings: FilmSettings) -> Film:
    """Reuse-or-realloc on settings change (film.rs:378-406)."""
    rx, ry = settings.effective_res()
    if (
        film is None
        or settings.clear
        or film.res != (rx, ry)
        or film.tile_dim != settings.tile_dim
    ):
        return Film(rx, ry, settings.tile_dim)
    film.generation += 1
    return film
