"""Row-union traversal on real colonnade waves (primary closest, shadow
occlusion from primary hits, bounce shadow, and e2e any_intersect).

    PYTHONPATH=/root/repo:/root/.axon_site nohup python \
        benchmarks/rows_bench.py > /tmp/rows_bench.log 2>&1 &
"""

import time

import numpy as np

N_TILES = 1024
TD = 16


def timed(label, fn, *args):
    import jax

    out = jax.block_until_ready(fn(*args))
    t0 = time.monotonic()
    for _ in range(3):
        out = jax.block_until_ready(fn(*args))
    dt = (time.monotonic() - t0) / 3
    print(f"{label}: {dt*1e3:.1f} ms", flush=True)
    return out


def main():
    import jax
    import jax.numpy as jnp

    from yuki_tpu import bsdf as bsdf_mod
    from yuki_tpu import lights as lights_mod
    from yuki_tpu import traverse
    from yuki_tpu.camera import Camera
    from yuki_tpu.sampling import SampleCtx, UniformSampler
    from yuki_tpu.scene.testscenes import colonnade
    from yuki_tpu.surface import make_surface, spawn_ray, spawn_ray_to
    from yuki_tpu.integrators import _BENIGN_D
    from yuki_tpu.ops.trace_rows import rows_any, rows_closest

    scene, cam_params, _ = colonnade()
    data, meta = scene.data, scene.meta
    ch = data.chunks
    print(f"backend={jax.default_backend()}", flush=True)

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
    tmax_full = jnp.full(n, traverse.F32_MAX)

    rc_jit = jax.jit(lambda o, d, t: rows_closest(ch, o, d, t)[0].sum())
    ra_jit = jax.jit(
        lambda o, d, t, s: rows_any(ch, o, d, t, s)[0].sum()
        .astype(jnp.float32))

    timed("rows_closest primary", rc_jit, o0, d0, tmax_full)

    @jax.jit
    def waves(o0, d0):
        hit = traverse.intersect(data, meta, o0, d0, tmax_full)
        alive = hit.hit
        si = make_surface(data, hit, o0, d0)
        mp = bsdf_mod.gather_materials(data, si, meta)
        u = sampler.get_2d(ctx, 6)
        bs = bsdf_mod.bsdf_sample(mp, si, si.wo, u, meta)
        alive = alive & (bs.pdf > 0.0)
        center = 0.5 * (data.world_lo + data.world_hi)
        o1 = jnp.where(alive[..., None], spawn_ray(si, bs.wi), center)
        d1 = jnp.where(alive[..., None], bs.wi, _BENIGN_D)
        t1 = jnp.where(alive, traverse.F32_MAX, 0.0)
        uls = sampler.get_2d(ctx, 2)
        ls = lights_mod.sample_li(data, 0, meta.light_types[0], si, uls)
        o_s, d_s = spawn_ray_to(si, ls.target)
        # bounce-1 surfaces -> shadow
        hit1 = traverse.intersect(data, meta, o1, d1, t1)
        si1 = make_surface(data, hit1, o1, d1)
        ls1 = lights_mod.sample_li(data, 0, meta.light_types[0], si1, uls)
        o_s1, d_s1 = spawn_ray_to(si1, ls1.target)
        return (o1, d1, t1, o_s, d_s, ls.skip_light, o_s1, d_s1,
                ls1.skip_light, hit1.hit)

    (o1, d1, t1, o_s, d_s, skip, o_s1, d_s1, skip1, alive1) = (
        jax.block_until_ready(waves(o0, d0)))
    t_sh = jnp.full(n, 0.9999)
    t_sh1 = jnp.where(alive1, 0.9999, 0.0)

    from yuki_tpu.ops.trace_rows import row_candidate_lists, _row_pairs

    @jax.jit
    def stats(o, d, t):
        lists, ov = row_candidate_lists(ch, o, d, t, 64)
        _, _, _, n_pairs = _row_pairs(lists, n // 128, 64, n)
        return n_pairs, ov.sum()

    for lbl, (oo, dd, tt) in (
        ("primary", (o0, d0, tmax_full)),
        ("shadow(primary)", (o_s, d_s, t_sh)),
        ("shadow(bounce1)", (o_s1, d_s1, t_sh1)),
        ("bounce", (o1, d1, t1)),
    ):
        np_, ov_ = stats(oo, dd, tt)
        print(f"  {lbl}: pairs={int(np_)} ({int(np_)/(n//128):.1f}/row) "
              f"ov_rows={int(ov_)}", flush=True)

    timed("rows_any shadow(primary)", ra_jit, o_s, d_s, t_sh, skip)
    ra64 = jax.jit(
        lambda o, d, t, s: rows_any(ch, o, d, t, s, mult=64)[0].sum()
        .astype(jnp.float32))
    timed("rows_any shadow(primary) mult64", ra64, o_s, d_s, t_sh, skip)
    timed("rows_any shadow(bounce1)", ra_jit, o_s1, d_s1, t_sh1, skip1)
    timed("rows_closest bounce", rc_jit, o1, d1, t1)
    timed("traverse.any_intersect e2e shadow",
          jax.jit(lambda o, d, t, s: traverse.any_intersect(
              data, meta, o, d, t, s).sum().astype(jnp.float32)),
          o_s, d_s, t_sh, skip)
    print("done", flush=True)


if __name__ == "__main__":
    main()
