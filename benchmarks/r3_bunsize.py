"""Bundle-size sweep (CPU): per-B-ray-bundle OR'd crossing stats for
B in {1, 2, 4, 8, 16} on sorted bounce/shadow waves.  Decides the
bundle engine's BUN constant: kernel tests scale with amp(B) =
B * bundle_pairs / ray_pairs, pack gathers with bundle_pairs /
ray_pairs, extract/sort with rows = n / B.  BUN=8 measured amp x3.5 on
colonnade bounces — if amp(4) is ~2 while still cutting gathers ~4x,
the smaller bundle dominates for closest-hit waves.

    PYTHONPATH=/root/repo nohup python \
        benchmarks/r3_bunsize.py > /tmp/r3_bunsize.log 2>&1 &
"""

import numpy as np

N_TILES = 512
TD = 16

_POP = np.array([bin(v).count("1") for v in range(256)], np.int32)


def pop(words):
    return _POP[words.view(np.uint8).astype(np.int32)].reshape(
        words.shape[0], -1
    ).sum(axis=1)


def sweep(label, scene):
    import jax
    import jax.numpy as jnp

    from yuki_tpu import bsdf as bsdf_mod
    from yuki_tpu import lights as lights_mod
    from yuki_tpu import traverse
    from yuki_tpu.camera import Camera
    from yuki_tpu.integrators import _BENIGN_D
    from yuki_tpu.ops import trace_stream as ts
    from yuki_tpu.sampling import SampleCtx, UniformSampler
    from yuki_tpu.surface import make_surface, spawn_ray, spawn_ray_to

    data, meta = scene.data, scene.meta
    ch = data.chunks
    print(f"== {label} ==", flush=True)
    camera = Camera.create(scene.cam_params, 1920, 1080)
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
    def waves(o0, d0):
        hit0 = traverse.intersect(data, meta, o0, d0, tmax_full)
        alive = hit0.hit
        si = make_surface(data, hit0, o0, d0)
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
        o_s = jnp.where(alive[..., None], o_s, center)
        d_s = jnp.where(alive[..., None], d_s, _BENIGN_D)
        t_s = jnp.where(alive, 0.9999, 0.0)

        def srt(o, d, tm):
            k = traverse.ray_sort_key(data, o, d)
            i = jnp.argsort(k)
            return o[i], d[i], tm[i]

        ob, db, tb = srt(o1, d1, t1)
        os_, ds_, tss = srt(o_s, d_s, t_s)
        wb = ts._cross_words_xla(ch, ob, db, tb)
        wsh = ts._cross_words_xla(ch, os_, ds_, tss)
        return wb, wsh

    wb, wsh = jax.block_until_ready(waves(o0, d0))
    for wname, we in (("bounce", np.asarray(wb)), ("shadow", np.asarray(wsh))):
        base = int(pop(we).sum())
        print(f"  {wname}: per-ray pairs={base}", flush=True)
        for B in (2, 4, 8, 16):
            w8 = np.bitwise_or.reduce(
                we.reshape(n // B, B, we.shape[1]), axis=1
            )
            c = pop(w8)
            print(
                f"    B={B:2d}: pairs={int(c.sum()):8d} "
                f"amp=x{B*c.sum()/base:4.2f} gathers=x{c.sum()/base:5.3f} "
                f"mean={c.mean():6.2f} p99={np.percentile(c, 99):4.0f} "
                f"max={int(c.max())}",
                flush=True,
            )


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import sys

    from yuki_tpu.scene.testscenes import colonnade

    scene, cam, _ = colonnade()
    scene.cam_params = cam
    sweep("colonnade", scene)

    sys.path.insert(0, "/root/repo")
    from bench import load_atrium

    scene_a, cam_a, _ = load_atrium()
    scene_a.cam_params = cam_a
    sweep("atrium", scene_a)


if __name__ == "__main__":
    main()
