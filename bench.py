"""Benchmark: Cornell 1080p path tracing throughput on the local chip.

Prints ONE json line:
  {"metric": ..., "value": N, "unit": "Mrays/s", "vs_baseline": N}

The metric matches the reference's displayed throughput — ray-scene
intersections per second, counting only closest-hit traversals like
RadianceResult.ray_scene_intersections (yuki/src/integrators/mod.rs:62-74;
shadow rays are traced but not counted, exactly like the reference).
vs_baseline is against the driver target of 200 Mrays/s/chip
(BASELINE.md).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from yuki_tpu.camera import Camera
    from yuki_tpu.integrators import PathParams, path_li
    from yuki_tpu.sampling import SampleCtx, UniformSampler
    from yuki_tpu.scene.cornell import cornell

    W, H = 1920, 1080
    scene, cam_params, _ = cornell()
    camera = Camera.create(cam_params, W, H)
    sampler = UniformSampler(1)
    params = PathParams(max_depth=5)
    data, meta = scene.data, scene.meta

    # Split the film into row bands so each dispatch stays in comfortable
    # HBM territory; all lanes of a band render one sample generation.
    BANDS = 4
    band_h = H // BANDS

    @jax.jit
    def render_band(band, sample_index, seed):
        py, px = jnp.meshgrid(
            jnp.arange(band_h, dtype=jnp.int32),
            jnp.arange(W, dtype=jnp.int32),
            indexing="ij",
        )
        px = px.reshape(-1)
        py = (py + band * band_h).reshape(-1)
        ctx = SampleCtx(px=px, py=py, sample_index=sample_index, seed=seed)
        u = sampler.get_2d(ctx, 0)
        p_film = jnp.stack(
            [px.astype(jnp.float32), py.astype(jnp.float32)], axis=-1
        ) + u
        o, d = camera.ray(p_film)
        res = path_li(data, meta, params, sampler, ctx, o, d)
        return res.li, jnp.sum(res.ray_count.astype(jnp.float64))

    # Warmup/compile.
    li, rays = render_band(jnp.int32(0), jnp.uint32(0), jnp.uint32(1))
    li.block_until_ready()

    # Timed: SPP sample generations over the whole film.
    SPP = 4
    t0 = time.monotonic()
    total_rays = 0.0
    for s in range(SPP):
        for band in range(BANDS):
            li, rays = render_band(
                jnp.int32(band), jnp.uint32(s), jnp.uint32(1)
            )
            total_rays += float(rays)
    li.block_until_ready()
    elapsed = time.monotonic() - t0

    mrays = total_rays / elapsed / 1e6
    spp_s = SPP / elapsed
    print(
        json.dumps(
            {
                "metric": "cornell_1080p_path_d5_closest_hit_rays",
                "value": round(mrays, 3),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / 200.0, 4),
                "spp_per_s_1080p": round(spp_s, 3),
                "elapsed_s": round(elapsed, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
