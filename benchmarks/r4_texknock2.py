"""Round-4: SUB-attribution of the fused Cornell wave's tex stage
(~10.7 ms of 33.8, benchmarks/r4_waveknock.py after the MXU row select
landed).  The palette select (1/3 the MXU work of the 3-channel
select) measured NEUTRAL, so the dots are suspected cheap; this probe
knocks out the stage's three internal parts one at a time:

  -texidx : _tex_index (descriptor row select + wrap/clamp math)
  -texdot : the [256,Q]x[Q,128] MXU one-hot dots (masks+reduce stay)
  -texred : the colmask multiply-reduce (dots+masks stay)
  -tex    : the whole stage (reference delta)

Bench Cornell wave shape: 4096 tiles x 256 px, spl=16, d5.
"""

import numpy as np

import jax
import jax.numpy as jnp

import _timing


VARIANTS = [
    ("full", frozenset()),
    ("-texidx", frozenset({"texidx"})),
    ("-texdot", frozenset({"texdot"})),
    ("-texred", frozenset({"texred"})),
    ("-tex", frozenset({"tex"})),
]


def main():
    _timing.enable_compile_cache()
    print("backend=", jax.default_backend(), flush=True)

    from yuki_tpu.camera import Camera
    from yuki_tpu.film import FilmSettings, film_tiles
    from yuki_tpu.integrators import PathParams
    from yuki_tpu.ops import path_fused
    from yuki_tpu.renderer import make_wave_renderer
    from yuki_tpu.sampling import UniformSampler
    from yuki_tpu.scene.cornell import cornell

    scene, cam_params, _ = cornell()
    w, h = 1920, 1080
    camera = Camera.create(cam_params, w, h)
    sampler = UniformSampler(1)
    fs = FilmSettings(res=(w, h), tile_dim=16)
    tiles = film_tiles(fs)[:4096]
    origins = jnp.asarray(
        np.asarray([[t.x0, t.y0] for t in tiles], dtype=np.int32)
    )
    assert path_fused.wave_supported(scene.meta, sampler)

    for label, knock in VARIANTS:
        path_fused.PATH_FUSED_KNOCK = knock
        render = make_wave_renderer(
            scene, camera, sampler, PathParams(max_depth=5), 16, 4096
        )

        def run(origins):
            px, rays = render(origins, jnp.int32(0), jnp.uint32(1))
            return rays

        _timing.drained(label, run, origins, reps=5)
    path_fused.PATH_FUSED_KNOCK = frozenset()
    print("done", flush=True)


if __name__ == "__main__":
    main()
