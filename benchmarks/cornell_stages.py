"""Per-pass timing of one Cornell (dense-mode) path bounce at bench wave
size (4096 tiles = 1M rays): where does the ~80 ms/bounce XLA shading
remainder actually go?  Cumulative prefixes over the REAL integrator
bounce body: trace | +surface | +materials | +nee-setup (no occlusion) |
+occlusion | +bsdf-sample | full bounce.

    PYTHONPATH=/root/repo:/root/.axon_site nohup python \
        benchmarks/cornell_stages.py > /tmp/cornell_stages.log 2>&1 &
"""

import time

import numpy as np

N_TILES = 4096
TD = 16


def timed(label, fn, *args, reps=3):
    # Drain protocol: block_until_ready on arrays does not block here.
    from _timing import drained

    return drained(label, fn, *args, reps=reps)


def main():
    import jax
    import jax.numpy as jnp

    from yuki_tpu import bsdf as bsdf_mod
    from yuki_tpu import lights as lights_mod
    from yuki_tpu import traverse
    from yuki_tpu.camera import Camera
    from yuki_tpu.sampling import SampleCtx, UniformSampler
    from yuki_tpu.scene.cornell import cornell
    from yuki_tpu.surface import make_surface, spawn_ray, spawn_ray_to
    from yuki_tpu.vecmath import dot, is_black
    from yuki_tpu.integrators import _BENIGN_D

    scene, cam_params, _ = cornell()
    data, meta = scene.data, scene.meta
    print(f"backend={jax.default_backend()} tris={meta.n_tris} "
          f"lights={meta.light_types} mats={meta.material_types}",
          flush=True)

    camera = Camera.create(cam_params, 1920, 1080)
    n = N_TILES * TD * TD
    tx = (np.arange(N_TILES) % 120) * TD
    ty = (np.arange(N_TILES) // 120) * TD
    px = np.broadcast_to(
        tx[:, None, None] + np.arange(TD)[None, :, None], (N_TILES, TD, TD)
    ).reshape(-1)
    py = np.broadcast_to(
        ty[:, None, None] + np.arange(TD)[None, None, :], (N_TILES, TD, TD)
    ).reshape(-1)
    ctx = SampleCtx(
        px=jnp.asarray(px, jnp.int32), py=jnp.asarray(py, jnp.int32),
        sample_index=jnp.uint32(0), seed=jnp.uint32(1),
    )
    sampler = UniformSampler(1)
    p_film = jnp.asarray(np.stack([px + 0.5, py + 0.5], -1), jnp.float32)
    o0, d0 = camera.ray(p_film)
    t_full = jnp.full(n, traverse.F32_MAX)
    print(f"  wave = {n} rays", flush=True)

    def trace(data, o, d):
        return traverse.intersect(data, meta, o, d, t_full)

    def surface(data, o, d):
        hit = trace(data, o, d)
        si = make_surface(data, hit, o, d)
        return si, hit

    def materials(data, o, d):
        si, hit = surface(data, o, d)
        mp = bsdf_mod.gather_materials(data, si, meta)
        return si, hit, mp

    def nee_setup(data, o, d):
        """NEE minus the occlusion traversal: light sample + bsdf_f."""
        si, hit, mp = materials(data, o, d)
        total = jnp.zeros_like(si.p)
        dim = 2
        for li_idx, ltype in enumerate(meta.light_types):
            u = sampler.get_2d(ctx, dim)
            dim += 2
            ls = lights_mod.sample_li(data, li_idx, ltype, si, u)
            f = bsdf_mod.bsdf_f(mp, si, si.wo, ls.l, meta)
            cos = jnp.clip(dot(si.ns, ls.l), 0.0, 1.0)
            worth = hit.hit & ~is_black(ls.li) & ~is_black(f) & (cos > 0.0)
            contrib = f * ls.li * (cos / jnp.maximum(ls.pdf, 1e-30))[..., None]
            total += jnp.where(worth[..., None], contrib, 0.0)
        return total, si, hit, mp

    def occlusion(data, o, d):
        """NEE including the fused occlusion call (as _nee now runs)."""
        total, si, hit, mp = nee_setup(data, o, d)
        from yuki_tpu.integrators import _nee
        r, _ = _nee(data, meta, sampler, ctx, si, mp, 2, hit.hit)
        return r

    def bsdf_sample(data, o, d):
        si, hit, mp = materials(data, o, d)
        u = sampler.get_2d(ctx, 8)
        bs = bsdf_mod.bsdf_sample(mp, si, si.wo, u, meta)
        return bs.f.sum() + bs.pdf.sum() + bs.wi.sum()

    def full_bounce(data, o, d):
        """One full path bounce as path_li's scan body runs it."""
        from yuki_tpu.integrators import _nee
        hit = trace(data, o, d)
        alive = hit.hit
        si = make_surface(data, hit, o, d)
        mp = bsdf_mod.gather_materials(data, si, meta)
        r, dimn = _nee(data, meta, sampler, ctx, si, mp, 2, alive)
        emitted = lights_mod.area_light_radiance(data, si, -d)
        u = sampler.get_2d(ctx, dimn)
        bs = bsdf_mod.bsdf_sample(mp, si, si.wo, u, meta)
        beta = bs.f * (jnp.abs(dot(bs.wi, si.ns))
                       / jnp.maximum(bs.pdf, 1e-30))[..., None]
        center = 0.5 * (data.world_lo + data.world_hi)
        o1 = jnp.where(alive[..., None], spawn_ray(si, bs.wi), center)
        d1 = jnp.where(alive[..., None], bs.wi, _BENIGN_D)
        return (r + emitted).sum() + beta.sum() + o1.sum() + d1.sum()

    jj = jax.jit
    timed("trace", jj(lambda s, o, d: trace(s, o, d).t.sum()),
          data, o0, d0)
    timed("+surface", jj(lambda s, o, d: surface(s, o, d)[0].p.sum()),
          data, o0, d0)
    timed("+materials",
          jj(lambda s, o, d: materials(s, o, d)[2].c0.sum()),
          data, o0, d0)
    timed("+nee_setup (no occl)",
          jj(lambda s, o, d: nee_setup(s, o, d)[0].sum()), data, o0, d0)
    timed("+occlusion (fused _nee)",
          jj(lambda s, o, d: occlusion(s, o, d).sum()), data, o0, d0)
    timed("materials+bsdf_sample", jj(bsdf_sample), data, o0, d0)
    timed("full bounce", jj(full_bounce), data, o0, d0)

    # Reference wave throughput through the production renderer path.
    from yuki_tpu.film import FilmSettings, film_tiles
    from yuki_tpu.integrators import PathParams
    from yuki_tpu.renderer import make_wave_renderer

    fs = FilmSettings(res=(1920, 1080), tile_dim=16)
    tiles = film_tiles(fs)
    render = make_wave_renderer(
        scene, camera, sampler, PathParams(max_depth=5), 16, N_TILES
    )
    origins = np.asarray([[t.x0, t.y0] for t in tiles[:N_TILES]],
                         dtype=np.int32)
    origins = jnp.asarray(origins)

    def run(origins):
        px_, rays = render(origins, jnp.int32(0), jnp.uint32(1))
        return rays

    timed("production wave (d5)", run, origins)


if __name__ == "__main__":
    main()
