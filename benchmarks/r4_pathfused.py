"""Round-4: on-chip timing of the fully-fused path wave
(ops/path_fused.py) vs the per-call production chain, at the bench
Cornell wave shape (4096 tiles x 256 px = 1M rays, d5).

Round-3 floors for context (ARCHITECTURE.md): production 76-81 ms/wave,
lean chain 50-53, trace+occlusion floor 15.5.
"""

import numpy as np

import jax
import jax.numpy as jnp

import _timing


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

    for mode, label in (("off", "production per-call chain"),
                        ("auto", "fused wave")):
        path_fused.PATH_FUSED_MODE = mode
        render = make_wave_renderer(
            scene, camera, sampler, PathParams(max_depth=5), 16, 4096
        )

        def run(origins):
            px, rays = render(origins, jnp.int32(0), jnp.uint32(1))
            return rays

        dt = _timing.drained(label, run, origins, reps=5)
        # rays/wave for Mrays/s conversion
        rays = float(run(origins))
        print(f"    closest rays {rays:.0f} -> "
              f"{rays / dt / 1e6:.1f} Mrays/s", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
