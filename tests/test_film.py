"""Film/tile tests (film.rs semantics)."""

import numpy as np
import jax.numpy as jnp

from yuki_tpu.film import (
    Film,
    FilmSettings,
    film_or_new,
    film_tiles,
    generate_tiles,
    outward_spiral,
)


class TestTiles:
    def test_cover_film_exactly_once(self):
        tiles = generate_tiles(100, 70, 16)
        seen = np.zeros((70, 100), dtype=int)
        for t in tiles.values():
            x1 = min(t.x0 + 16, 100)
            y1 = min(t.y0 + 16, 70)
            seen[t.y0:y1, t.x0:x1] += 1
        assert (seen == 1).all()

    def test_spiral_is_permutation(self):
        tiles = generate_tiles(64, 64, 16)
        n = len(tiles)
        order = outward_spiral(dict(tiles), 64, 64, 16)
        assert len(order) == n
        assert len({t.index for t in order}) == n

    def test_spiral_starts_near_center(self):
        order = film_tiles(FilmSettings(res=(160, 160), tile_dim=16))
        first = order[0]
        # center tile of a 10x10 grid is index (4,4) -> x0=64,y0=64
        assert first.x0 == 64 and first.y0 == 64

    def test_sixteenth_res(self):
        s = FilmSettings(res=(640, 480), sixteenth_res=True)
        assert s.effective_res() == (160, 120)


class TestFilm:
    def test_add_and_image(self):
        f = Film(32, 32, 16)
        ids = jnp.asarray([0, 3], dtype=jnp.int32)
        px = jnp.ones((2, 16, 16, 3)) * jnp.asarray([1.0, 2.0])[:, None, None, None]
        f.add_tiles(ids, px)
        img = f.image()
        assert img.shape == (32, 32, 3)
        assert np.allclose(img[0, 0], 1.0)  # tile 0 top-left
        assert np.allclose(img[16, 16], 2.0)  # tile 3 bottom-right
        assert np.allclose(img[0, 16], 0.0)  # untouched

    def test_accumulation_normalizes(self):
        f = Film(16, 16, 16)
        ids = jnp.asarray([0], dtype=jnp.int32)
        f.add_tiles(ids, jnp.ones((1, 16, 16, 3)) * 2.0)
        f.add_tiles(ids, jnp.ones((1, 16, 16, 3)) * 4.0)
        assert np.allclose(f.image(), 3.0)

    def test_padding_dropped(self):
        f = Film(16, 16, 16)
        ids = jnp.asarray([0, 99], dtype=jnp.int32)  # 99 out of range
        f.add_tiles(ids, jnp.ones((2, 16, 16, 3)))
        assert np.allclose(f.image(), np.concatenate([np.ones((16, 16, 3))]))
        assert int(f.samples.sum()) == 1

    def test_film_or_new_generation(self):
        s = FilmSettings(res=(32, 32), tile_dim=16, clear=False)
        f1 = film_or_new(None, s)
        g = f1.generation
        f2 = film_or_new(f1, s)
        assert f2 is f1 and f2.generation == g + 1
        f3 = film_or_new(f1, FilmSettings(res=(64, 32), tile_dim=16, clear=False))
        assert f3 is not f1

    def test_partial_edge_tiles_cropped(self):
        f = Film(20, 20, 16)  # grid 2x2, padded to 32x32 internally
        assert f.n_tiles == 4
        f.add_tiles(jnp.asarray([0, 1, 2, 3], dtype=jnp.int32), jnp.ones((4, 16, 16, 3)))
        assert f.image().shape == (20, 20, 3)
