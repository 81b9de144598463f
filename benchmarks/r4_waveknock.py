"""Round-4: knockout attribution of the fused path wave
(ops/path_fused.py) on the chip, at the bench Cornell wave shape
(4096 tiles x 256 px, spl=16, d5).

Baseline: fused wave 42.9 ms vs 15.5 ms round-3 trace+occlusion floor
(benchmarks/r4_pathfused.py) -> ~27 ms to attribute.  Each variant
disables one stage of the bounce kernel via PATH_FUSED_KNOCK; "all"
leaves only the carry copy + miss/resolve glue (raygen + scan
overhead).
"""

import numpy as np

import jax
import jax.numpy as jnp

import _timing


VARIANTS = [
    ("full", frozenset()),
    ("-rowsel", frozenset({"rowsel"})),
    ("-tex", frozenset({"tex"})),
    ("-occl", frozenset({"occl"})),
    ("-shade", frozenset({"shade"})),
    ("-trace", frozenset({"trace"})),
    ("-all", frozenset({"rowsel", "tex", "occl", "shade", "trace"})),
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
