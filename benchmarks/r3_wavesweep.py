"""Production-path wave-size sweep: colonnade + atrium d5 e2e.

Round-2 finding #5: ray density is a coherence lever (sorted bounce
pairs/block 2043 @65k, 1282 @262k, 908 @1M) and every per-call fixed
cost (sort, cross, searchsorted, dispatch) amortizes with the wave.
bench.py still drives the large scenes at wave_tiles=1024 (262k rays);
Cornell already adopted 4096 (wave_size_sweep: 33 Mrays/s vs 1.5 at
256).  This times the REAL production renderer (make_wave_renderer,
path d5) per wave size and reports effective Mrays/s so bench.py can
adopt the winner.

    PYTHONPATH=/root/repo:/root/.axon_site nohup python \
        benchmarks/r3_wavesweep.py > /tmp/r3_wavesweep.log 2>&1 &
"""

import sys
import time


def sweep(name, scene, cam_params, sizes):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from yuki_tpu.camera import Camera
    from yuki_tpu.film import FilmSettings, film_tiles
    from yuki_tpu.integrators import PathParams
    from yuki_tpu.renderer import make_wave_renderer
    from yuki_tpu.sampling import UniformSampler

    res = (1920, 1080)
    camera = Camera.create(cam_params, res[0], res[1])
    sampler = UniformSampler(1)
    fs = FilmSettings(res=res, tile_dim=16)
    tiles = film_tiles(fs)
    print(f"== {name}: {len(tiles)} tiles ==", flush=True)

    for wave_tiles in sizes:
        try:
            render = make_wave_renderer(
                scene, camera, sampler, PathParams(max_depth=5), 16,
                wave_tiles,
            )
            wave = tiles[:wave_tiles]
            origins = np.asarray(
                [[t.x0, t.y0] for t in wave], dtype=np.int32)
            if len(wave) < wave_tiles:
                origins = np.concatenate(
                    [origins,
                     np.zeros((wave_tiles - len(wave), 2), np.int32)])
            origins = jnp.asarray(origins)
            t0 = time.monotonic()
            px, rays = render(origins, jnp.int32(0), jnp.uint32(1))
            # Scalar fetch drains the queue (block_until_ready on array
            # outputs does NOT block on this backend — _timing.py).
            float(jax.device_get(rays))
            compile_s = time.monotonic() - t0
            reps = 3
            t0 = time.monotonic()
            for s in range(reps):
                px, rays = render(origins, jnp.int32(s + 1), jnp.uint32(1))
            r = float(jax.device_get(rays))
            dt = (time.monotonic() - t0) / reps
            print(
                f"  wave_tiles={wave_tiles:5d} ({wave_tiles * 256:8d} rays)"
                f": {dt * 1e3:8.1f} ms/wave  {r / dt / 1e6:7.2f} Mrays/s"
                f"  (compile {compile_s:.0f}s)",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001 - sweep must report and go on
            print(f"  wave_tiles={wave_tiles}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


def main():
    from yuki_tpu.scene.testscenes import colonnade

    scene, cam, _ = colonnade()
    sweep("colonnade", scene, cam, [1024, 2048, 4096, 8192])

    sys.path.insert(0, "/root/repo")
    from bench import load_atrium

    scene_a, cam_a, _ = load_atrium()
    sweep("atrium", scene_a, cam_a, [1024, 2048, 4096])


if __name__ == "__main__":
    main()
