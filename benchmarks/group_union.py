"""Group-union incidence over the CHUNK cut: how many distinct ~128-tri
chunks do the W rays of a sorted group cross in union, for W in
{1, 8, 16, 32, 128}?  Sizes the round-3 group-stream engine (8 rays on
sublanes x 128 chunk triangles on lanes -> one VPU op per (group, chunk)
pair): per-group union count = kernel steps per group; the W=1 row is the
true per-ray incidence floor.

    PYTHONPATH=/root/repo:/root/.axon_site nohup python \
        benchmarks/group_union.py > /tmp/group_union.log 2>&1 &
"""

import functools

import numpy as np

N_TILES = 1024
TD = 16


def make_wave(scene_fn, label):
    import jax
    import jax.numpy as jnp

    from yuki_tpu import bsdf as bsdf_mod
    from yuki_tpu import lights as lights_mod
    from yuki_tpu import traverse
    from yuki_tpu.camera import Camera
    from yuki_tpu.integrators import _BENIGN_D
    from yuki_tpu.sampling import SampleCtx, UniformSampler
    from yuki_tpu.surface import make_surface, spawn_ray, spawn_ray_to

    scene, cam_params, _ = scene_fn()
    data, meta = scene.data, scene.meta
    ch = data.chunks
    print(f"{label}: chunks={ch.n_treelets} tris={data.tris.p0.shape[0]}",
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
        t_s = jnp.where(alive, 0.9999, 0.0)
        return o1, d1, t1, o_s, d_s, t_s

    o1, d1, t1, o_s, d_s, t_s = jax.block_until_ready(waves(o0, d0))

    def sort_wave(o, d, tm):
        order = jnp.argsort(traverse.ray_sort_key(data, o, d))
        return o[order], d[order], tm[order]

    return data, {
        "primary": (o0, d0, tmax_full),
        "bounce": sort_wave(o1, d1, t1),
        "shadow": sort_wave(o_s, d_s, t_s),
    }


def all_words(data, o, d, tm):
    """Per-ray crossing words [N, W] via the dense XLA cull, in ray
    blocks to bound the [blk, chunks] intermediate."""
    import jax
    import jax.numpy as jnp

    from yuki_tpu.ops.trace_stream import _cross_words_xla

    ch = data.chunks
    n = o.shape[0]
    blk = 32768
    f = jax.jit(lambda o_, d_, t_: _cross_words_xla(ch, o_, d_, t_))
    outs = [
        np.asarray(f(o[i : i + blk], d[i : i + blk], tm[i : i + blk]))
        for i in range(0, n, blk)
    ]
    return np.concatenate(outs, axis=0)


_POP = np.array([bin(v).count("1") for v in range(256)], np.int32)


def union_counts(words, width):
    n, w = words.shape
    g = words.reshape(n // width, width, w)
    u = g[:, 0]
    for i in range(1, width):
        u = u | g[:, i]
    b = u.view(np.uint8)
    return _POP[b.astype(np.int32)].reshape(n // width, -1).sum(axis=1)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from yuki_tpu.scene.testscenes import colonnade

    jobs = [("colonnade", colonnade)]
    try:
        import sys, os

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        from bench import load_atrium

        jobs.append(("atrium", load_atrium))
    except Exception as e:  # atrium assets absent: still report colonnade
        print(f"atrium skipped: {e}", flush=True)

    for label, fn in jobs:
        data, waves = make_wave(fn, label)
        for wl, (o, d, tm) in waves.items():
            words = all_words(data, o, d, tm)
            for width in (1, 8, 16, 32, 128):
                c = union_counts(words, width)
                print(
                    f"{label} {wl} W={width}: mean={c.mean():.2f} "
                    f"p50={np.percentile(c, 50):.0f} "
                    f"p95={np.percentile(c, 95):.0f} max={c.max()} "
                    f"steps/ray={c.sum() / len(c) / width:.3f}",
                    flush=True,
                )
    print("done", flush=True)


if __name__ == "__main__":
    main()
