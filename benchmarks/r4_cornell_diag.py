"""Round-4: diagnose the Cornell bench collapse (55.3 -> 0.311 Mrays/s
in the round-4 preview).  Times the EXACT bench protocol step by step:
warmup, then each dispatch individually (drained), at spl 16 and 1,
fused and off."""

import time

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
    camera = Camera.create(cam_params, 1920, 1080)
    sampler = UniformSampler(1)
    fs = FilmSettings(res=(1920, 1080), tile_dim=16)
    tiles = film_tiles(fs)
    waves = []
    for w0 in range(0, len(tiles), 4096):
        wave = tiles[w0 : w0 + 4096]
        orig = np.asarray([[t.x0, t.y0] for t in wave], np.int32)
        if len(wave) < 4096:
            orig = np.concatenate(
                [orig, np.zeros((4096 - len(wave), 2), np.int32)]
            )
        waves.append(jnp.asarray(orig))
    print("waves:", len(waves), flush=True)
    print("gate:", path_fused.use_wave_fused(scene.meta, sampler),
          flush=True)

    for mode, spl in (("auto", 16), ("auto", 1), ("off", 16)):
        path_fused.PATH_FUSED_MODE = mode
        render = make_wave_renderer(
            scene, camera, sampler, PathParams(max_depth=5), 16, 4096,
            samples_per_launch=spl,
        )
        t0 = time.monotonic()
        px, rays = render(waves[0], jnp.int32(0), jnp.uint32(1))
        r0 = float(rays)  # drain
        t1 = time.monotonic()
        print(f"mode={mode} spl={spl}: warmup+drain {t1-t0:.1f}s "
              f"rays={r0:.0f}", flush=True)
        for it in range(3):
            for wi, origins in enumerate(waves):
                t0 = time.monotonic()
                px, rays = render(origins, jnp.int32(0), jnp.uint32(1))
                r = float(rays)
                dt = time.monotonic() - t0
                print(f"  it{it} wave{wi}: {dt*1e3:8.1f} ms "
                      f"{r/dt/1e6:8.2f} Mrays/s", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
