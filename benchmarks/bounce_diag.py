"""Why is the in-graph bounce closest-hit ~1.4 s when isolated sorted
pairs_closest is ~10 ms?  Reproduce the REAL bounce-1 wave exactly as the
path integrator forms it (alive mask, parked dead lanes, t_max gating) and
measure each piece separately:

  - n_pairs of the real sorted wave vs the pair budget (does the lax.cond
    take the slow treelet_closest fallback?)
  - pairs_closest alone on the real sorted rays
  - treelet_closest alone on the real sorted rays
  - traverse.intersect end-to-end (sort + cond + spheres)

    PYTHONPATH=/root/repo:/root/.axon_site nohup python \
        benchmarks/bounce_diag.py > /tmp/bounce_diag.log 2>&1 &
"""

import time

import numpy as np

N_TILES = 1024  # 262k rays
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
    from yuki_tpu import traverse
    from yuki_tpu.camera import Camera
    from yuki_tpu.sampling import SampleCtx, UniformSampler
    from yuki_tpu.scene.testscenes import colonnade
    from yuki_tpu.surface import make_surface, spawn_ray
    from yuki_tpu.integrators import _BENIGN_D

    scene, cam_params, _ = colonnade()
    data, meta = scene.data, scene.meta
    print(f"backend={jax.default_backend()} spheres={data.spheres.radius.shape[0]}",
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
    tmax_full = jnp.full(n, traverse.F32_MAX)

    @jax.jit
    def bounce_wave(o0, d0):
        """EXACT integrator bounce-ray formation (integrators/__init__.py
        path_li body): alive gating, parked dead lanes, t_max by alive."""
        hit = traverse.intersect(data, meta, o0, d0, tmax_full)
        alive = hit.hit
        si = make_surface(data, hit, o0, d0)
        mp = bsdf_mod.gather_materials(data, si, meta)
        u = sampler.get_2d(ctx, 6)
        bs = bsdf_mod.bsdf_sample(mp, si, si.wo, u, meta)
        alive = alive & ~((bs.pdf == 0.0))
        center = 0.5 * (data.world_lo + data.world_hi)
        o1 = jnp.where(alive[..., None], spawn_ray(si, bs.wi), center)
        d1 = jnp.where(alive[..., None], bs.wi, _BENIGN_D)
        t1 = jnp.where(alive, traverse.F32_MAX, 0.0)
        return o1, d1, t1, alive

    o1, d1, t1, alive = jax.block_until_ready(bounce_wave(o0, d0))
    n_alive = int(alive.sum())
    print(f"alive after bounce ray formation: {n_alive}/{n}", flush=True)

    from yuki_tpu.ops.trace_pairs import block_candidate_pairs, pairs_closest
    from yuki_tpu.ops.trace_treelets import treelet_closest
    tl = data.treelets
    cap = traverse._pair_capacity(n)
    print(f"pair budget cap={cap}", flush=True)

    @jax.jit
    def sort_rays(o, d, tm):
        order = jnp.argsort(traverse.ray_sort_key(data, o, d))
        return o[order], d[order], tm[order]

    o_s, d_s, t_s = jax.block_until_ready(sort_rays(o1, d1, t1))
    n_pairs = int(jax.jit(
        lambda o, d, t: block_candidate_pairs(tl, o, d, t, cap)[2]
    )(o_s, d_s, t_s))
    n_blocks = (n + 1023) // 1024
    print(
        f"real bounce wave: pairs={n_pairs} ({n_pairs/n_blocks:.1f}/block) "
        f"cap {'OVERFLOW -> treelet fallback' if n_pairs > cap else 'ok'}",
        flush=True,
    )

    timed("pairs_closest (real sorted, cap)",
          jax.jit(lambda o, d, t: pairs_closest(tl, o, d, t, max_pairs=cap)[0]
                  .sum()),
          o_s, d_s, t_s)
    timed("treelet_closest (real sorted)",
          jax.jit(lambda o, d, t: treelet_closest(tl, o, d, t)[0].sum()),
          o_s, d_s, t_s)
    timed("traverse.intersect e2e (real unsorted)",
          jax.jit(lambda o, d, t: traverse.intersect(data, meta, o, d, t).t
                  .sum()),
          o1, d1, t1)

    # Does the t_max=0 parking actually gate? compare against all-F32_MAX.
    t_all = jnp.full(n, traverse.F32_MAX)
    o_s2, d_s2, t_s2 = jax.block_until_ready(sort_rays(o1, d1, t_all))
    n_pairs2 = int(jax.jit(
        lambda o, d, t: block_candidate_pairs(tl, o, d, t, cap)[2]
    )(o_s2, d_s2, t_s2))
    print(f"same wave, t_max=inf everywhere: pairs={n_pairs2}", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
