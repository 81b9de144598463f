"""Round-4: wave-level attribution of the colonnade production render
(the bench shape: 1024 tiles x 256 px = 262144 lanes, d5, uniform 1
spp, spl=1).  r4_streamknock timed the ENGINES standalone (closest
85.1 ms, any 147.3 ms at this scale); this probe times the production
wave end-to-end with whole path_li STAGES knocked out via
integrators.PATHLI_KNOCK, naming the glue outside the engines.

    PYTHONPATH=/root/repo:/root/.axon_site nohup python \
        benchmarks/r4_colwave.py > /tmp/r4_colwave.log 2>&1 &
"""

import numpy as np

import jax
import jax.numpy as jnp

import _timing


VARIANTS = [
    ("full", frozenset()),
    ("-closest", frozenset({"closest"})),
    ("-shade", frozenset({"shade"})),
    ("-occl", frozenset({"occl"})),
    ("-resolve", frozenset({"resolve"})),
    ("-all", frozenset({"closest", "shade", "occl", "resolve"})),
]


def main():
    _timing.enable_compile_cache()
    print("backend=", jax.default_backend(), flush=True)

    from yuki_tpu import integrators
    from yuki_tpu.camera import Camera
    from yuki_tpu.film import FilmSettings, film_tiles
    from yuki_tpu.integrators import PathParams
    from yuki_tpu.renderer import make_wave_renderer
    from yuki_tpu.sampling import UniformSampler
    from yuki_tpu.scene.testscenes import colonnade

    scene, cam_params, _ = colonnade()
    w, h = 1920, 1080
    camera = Camera.create(cam_params, w, h)
    sampler = UniformSampler(1)
    fs = FilmSettings(res=(w, h), tile_dim=16)
    tiles = film_tiles(fs)[:1024]
    origins = jnp.asarray(
        np.asarray([[t.x0, t.y0] for t in tiles], dtype=np.int32)
    )

    for label, knock in VARIANTS:
        integrators.PATHLI_KNOCK = knock
        render = make_wave_renderer(
            scene, camera, sampler, PathParams(max_depth=5), 16, 1024
        )

        def run(origins):
            px, rays = render(origins, jnp.int32(0), jnp.uint32(1))
            return rays

        _timing.drained(label, run, origins, reps=3)
    integrators.PATHLI_KNOCK = frozenset()
    print("done", flush=True)


if __name__ == "__main__":
    main()
