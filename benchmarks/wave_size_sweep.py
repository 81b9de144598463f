"""End-to-end wave-size sweep: time the REAL per-wave render step on the
chip for Cornell and the colonnade at several wave_tiles.

Decides the production wave size: launch overhead + cull fixed costs push
toward frame-sized waves; HBM footprint and pair capacity push back.

    PYTHONPATH=/root/repo:/root/.axon_site nohup python \
        benchmarks/wave_size_sweep.py > /tmp/wave_sweep.log 2>&1 &
"""

import time

import numpy as np


def bench(scene, cam_params, wave_tiles, spp_reps=3, max_depth=5,
          res=(1920, 1080)):
    import jax.numpy as jnp

    from yuki_tpu.camera import Camera
    from yuki_tpu.film import FilmSettings, film_tiles
    from yuki_tpu.integrators import PathParams
    from yuki_tpu.renderer import make_wave_renderer
    from yuki_tpu.sampling import UniformSampler

    w, h = res
    camera = Camera.create(cam_params, w, h)
    sampler = UniformSampler(1)
    tiles = film_tiles(FilmSettings(res=res, tile_dim=16))
    render = make_wave_renderer(
        scene, camera, sampler, PathParams(max_depth=max_depth), 16,
        wave_tiles,
    )

    wave = tiles[:wave_tiles]
    origins = np.asarray([[t.x0, t.y0] for t in wave], dtype=np.int32)
    if len(wave) < wave_tiles:
        origins = np.concatenate(
            [origins, np.zeros((wave_tiles - len(wave), 2), np.int32)]
        )
    origins = jnp.asarray(origins)

    t_c0 = time.monotonic()
    px, rays = render(origins, jnp.int32(0), jnp.uint32(1))
    px.block_until_ready()
    compile_s = time.monotonic() - t_c0

    t0 = time.monotonic()
    total = jnp.float32(0.0)
    for s in range(spp_reps):
        px, rays = render(origins, jnp.int32(s + 1), jnp.uint32(1))
        total = total + rays
    total = float(total)  # host sync
    dt = (time.monotonic() - t0) / spp_reps
    n_rays = total / spp_reps
    return dt, n_rays, compile_s


def main():
    import jax

    from yuki_tpu.scene.cornell import cornell
    from yuki_tpu.scene.testscenes import colonnade

    print(f"backend={jax.default_backend()}", flush=True)

    for name, (scene, cam, _) in (
        ("cornell", cornell()),
        ("colonnade", colonnade()),
    ):
        for wt in (256, 1024, 4096, 8160):
            try:
                dt, n_rays, comp = bench(scene, cam, wt)
            except Exception as e:
                print(f"[{name}] wave_tiles={wt}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)
                continue
            n_px = wt * 256
            print(
                f"[{name}] wave_tiles={wt} ({n_px/1e3:.0f}k rays): "
                f"{dt*1e3:.1f} ms/wave, {n_rays/dt/1e6:.2f} Mrays/s "
                f"(compile {comp:.0f}s)",
                flush=True,
            )

    print("done", flush=True)


if __name__ == "__main__":
    main()
