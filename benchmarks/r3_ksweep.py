"""Round-3 chunk-size sweep: the exact-incidence cull's dominant costs
(cross_words O(rays x chunks), extract O(rays x words), pack O(slots))
all scale with CHUNK COUNT, while the Pallas walk kernels run at peak
VPU flops — so bigger chunks should trade cheap kernel flops for the
expensive cull terms.  Round-2's negative result went the OTHER way
(64-tri chunks); this measures K in {128, 256, 512} for both the
stream (per-ray) and bundle (8-ray) engines on real sorted bounce
waves, colonnade + atrium.

    PYTHONPATH=/root/repo:/root/.axon_site nohup python \
        benchmarks/r3_ksweep.py > /tmp/r3_ksweep.log 2>&1 &
"""

import time

import numpy as np

N_TILES = 1024  # 262k rays
TD = 16


def timed(label, fn, *args, reps=3):
    import jax

    out = jax.block_until_ready(fn(*args))
    t0 = time.monotonic()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    dt = (time.monotonic() - t0) / reps
    print(f"    {label}: {dt*1e3:.1f} ms", flush=True)
    return dt


def bounce_wave(scene, cam_params):
    import jax
    import jax.numpy as jnp

    from yuki_tpu import bsdf as bsdf_mod
    from yuki_tpu import traverse
    from yuki_tpu.camera import Camera
    from yuki_tpu.sampling import SampleCtx, UniformSampler
    from yuki_tpu.surface import make_surface, spawn_ray
    from yuki_tpu.integrators import _BENIGN_D

    data, meta = scene.data, scene.meta
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
    def wave(data, o0, d0):
        hit = traverse.intersect(data, meta, o0, d0, tmax_full)
        alive = hit.hit
        si = make_surface(data, hit, o0, d0)
        mp = bsdf_mod.gather_materials(data, si, meta)
        u = sampler.get_2d(ctx, 6)
        bs = bsdf_mod.bsdf_sample(mp, si, si.wo, u, meta)
        alive = alive & ~(bs.pdf == 0.0)
        center = 0.5 * (data.world_lo + data.world_hi)
        o1 = jnp.where(alive[..., None], spawn_ray(si, bs.wi), center)
        d1 = jnp.where(alive[..., None], bs.wi, _BENIGN_D)
        t1 = jnp.where(alive, traverse.F32_MAX, 0.0)
        return o1, d1, t1

    o1, d1, t1 = jax.block_until_ready(wave(data, o0, d0))

    @jax.jit
    def sort_rays(data, o, d, tm):
        order = jnp.argsort(traverse.ray_sort_key(data, o, d))
        return o[order], d[order], tm[order]

    return jax.block_until_ready(sort_rays(data, o1, d1, t1))


def sweep(name, scene, cam_params):
    import jax
    import jax.numpy as jnp

    import yuki_tpu.ops.trace_bundles as tb
    import yuki_tpu.ops.trace_stream as ts
    from yuki_tpu.scene.data import _estimate_slot_mult
    from yuki_tpu.treelets import build_treelets

    data = scene.data
    tri_p = np.stack(
        [np.asarray(data.tris.p0), np.asarray(data.tris.p1),
         np.asarray(data.tris.p2)], axis=1)
    tri_light = np.asarray(data.tris.area_light)
    n_tris = tri_p.shape[0]
    o_s, d_s, t_s = bounce_wave(scene, cam_params)
    n = o_s.shape[0]
    skip = jnp.full(n, -2, jnp.int32)

    print(f"== {name}: tris={n_tris}", flush=True)
    for K in (128, 256, 512):
        ch = build_treelets(
            scene.bvh_host, tri_p, tri_light, leaf_size=K, super_size=K)
        mt, mw = _estimate_slot_mult(ch, tri_p)
        n_c = ch.n_treelets
        print(f"  K={K}: chunks={n_c} words={-(-n_c//32)} "
              f"mult={mt}/{mw}", flush=True)

        @jax.jit
        def x_cross(ch, o, d, t):
            return ts.cross_words(ch, o, d, t).sum()

        @jax.jit
        def st_full(ch, o, d, t):
            w = ts.cross_words(ch, o, d, t)
            t_o, p_o, ov, ok = ts.stream_closest_w(
                ch, w, o, d, t, mult=mt, mult_wide=mw)
            return t_o.sum() + p_o.sum() + ov.sum() + ok

        @jax.jit
        def st_any(ch, o, d, t):
            w = ts.cross_words(ch, o, d, t)
            occ, ov, ok = ts.stream_any_w(
                ch, w, o, d, t, skip,
                mult=max(3, mt - 1), mult_wide=max(4, mw - 2))
            return occ.sum() + ov.sum() + ok

        @jax.jit
        def b_full(ch, o, d, t):
            bw = tb.bundle_words(ts.cross_words(ch, o, d, t))
            t_o, p_o, ov, ok = tb.bundles_closest_w(
                ch, bw, o, d, t, mult=4 * mt, mult_wide=4 * mw + 4)
            return t_o.sum() + p_o.sum() + ov.sum() + ok

        @jax.jit
        def b_any(ch, o, d, t):
            bw = tb.bundle_words(ts.cross_words(ch, o, d, t))
            occ, ov, ok = tb.bundles_any_w(
                ch, bw, o, d, t, skip,
                mult=4 * max(3, mt - 1), mult_wide=4 * max(4, mw - 2) + 4)
            return occ.sum() + ov.sum() + ok

        timed("cross", x_cross, ch, o_s, d_s, t_s)
        timed("stream closest", st_full, ch, o_s, d_s, t_s)
        timed("stream any", st_any, ch, o_s, d_s, t_s)
        timed("bundle closest", b_full, ch, o_s, d_s, t_s)
        timed("bundle any", b_any, ch, o_s, d_s, t_s)

        @jax.jit
        def stats(ch, o, d, t):
            w = ts.cross_words(ch, o, d, t)
            cnt = jax.lax.population_count(w).sum(axis=1)
            bw = tb.bundle_words(w)
            bcnt = jax.lax.population_count(bw).sum(axis=1)
            return ((cnt > ts.C_MAIN).sum(), cnt.sum(), cnt.max(),
                    (bcnt > tb.C_BUN).sum(), bcnt.sum(), bcnt.max())

        novf, tot, mx, bovf, btot, bmx = stats(ch, o_s, d_s, t_s)
        print(f"    pairs/ray={float(tot)/n:.2f} max={int(mx)} "
              f"ov_rays={int(novf)} | bundle pairs/b={float(btot)/(n//8):.2f} "
              f"max={int(bmx)} ov_bundles={int(bovf)}", flush=True)


def main():
    import jax

    print(f"backend={jax.default_backend()}", flush=True)

    from yuki_tpu.scene.testscenes import colonnade

    scene, cam, _ = colonnade()
    sweep("colonnade", scene, cam)

    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench import load_atrium

    scene_a, cam_a, _ = load_atrium()
    sweep("atrium", scene_a, cam_a)


if __name__ == "__main__":
    main()
