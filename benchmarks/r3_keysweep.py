"""Sort-key sweep (CPU): bundle amplification vs sort-key structure.

Bundle mates are CONSECUTIVE sorted rays, so the sort key directly
controls the OR-cull amplification the bundle engine pays.  The
production key is octant(3) | morton32^3(15).  Variants measured here:

  base     octant | morton32
  m64      octant | morton64 (finer origin cells)
  dirlo    octant | morton32 | dir6   (direction sub-bits below cell)
  dirhi    octant | dir6 | morton32   (direction-major inside octant)
  m64dir   octant | morton64 | dir6

dir6 = 2 magnitude bits per |d| axis.  Reported: per-B bundle pairs and
amplification on bounce + shadow waves (colonnade + atrium), plus the
rows-branch interval pairs/row (the key must not regress the coherent
path's block tightness).

    PYTHONPATH=/root/repo nohup python \
        benchmarks/r3_keysweep.py > /tmp/r3_keysweep.log 2>&1 &
"""

import numpy as np

N_TILES = 512
TD = 16

_POP = np.array([bin(v).count("1") for v in range(256)], np.int32)


def pop(words):
    return _POP[words.view(np.uint8).astype(np.int32)].reshape(
        words.shape[0], -1
    ).sum(axis=1)


def _morton_part_np(x):
    x = x.astype(np.uint32) & 0x3FF
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def keys_variant(name, o, d, lo, hi):
    o = np.asarray(o)
    d = np.asarray(d)
    ext = np.maximum(hi - lo, 1e-6)
    oct_ = (
        (d[:, 0] < 0).astype(np.uint64) << 2
        | (d[:, 1] < 0).astype(np.uint64) << 1
        | (d[:, 2] < 0).astype(np.uint64)
    )
    ad = np.abs(d)
    dir6 = np.zeros(len(d), np.uint64)
    for ax in range(3):
        b = np.clip((ad[:, ax] * 3.999).astype(np.uint64), 0, 3)
        dir6 |= b << np.uint64(2 * (2 - ax))

    def morton(bits):
        n_cells = (1 << bits) - 1
        cell = np.clip(
            (o - lo) / ext * (n_cells + 0.999), 0, n_cells
        ).astype(np.uint32)
        return (
            _morton_part_np(cell[:, 0]).astype(np.uint64) << 2
            | _morton_part_np(cell[:, 1]).astype(np.uint64) << 1
            | _morton_part_np(cell[:, 2]).astype(np.uint64)
        )

    dir9 = np.zeros(len(d), np.uint64)
    for ax in range(3):
        b = np.clip((ad[:, ax] * 7.999).astype(np.uint64), 0, 7)
        dir9 |= b << np.uint64(3 * (2 - ax))
    # Interleaved (Morton) direction bits: bit k of each axis adjacent.
    dirm6 = np.zeros(len(d), np.uint64)
    for ax in range(3):
        b = np.clip((ad[:, ax] * 3.999).astype(np.uint64), 0, 3)
        for k in range(2):
            dirm6 |= ((b >> np.uint64(k)) & np.uint64(1)) << np.uint64(
                3 * k + (2 - ax)
            )

    m32 = morton(5)   # 15 bits
    m64 = morton(6)   # 18 bits
    if name == "base":
        return oct_ << np.uint64(15) | m32
    if name == "m64":
        return oct_ << np.uint64(18) | m64
    if name == "dirlo":
        return oct_ << np.uint64(21) | m32 << np.uint64(6) | dir6
    if name == "dirhi":
        return oct_ << np.uint64(21) | dir6 << np.uint64(15) | m32
    if name == "m64dir":
        return oct_ << np.uint64(24) | m64 << np.uint64(6) | dir6
    if name == "dir9":
        return oct_ << np.uint64(24) | m32 << np.uint64(9) | dir9
    if name == "dirm6":
        return oct_ << np.uint64(21) | m32 << np.uint64(6) | dirm6
    raise ValueError(name)


def sweep(label, scene):
    import jax
    import jax.numpy as jnp

    from yuki_tpu import bsdf as bsdf_mod
    from yuki_tpu import lights as lights_mod
    from yuki_tpu import traverse
    from yuki_tpu.camera import Camera
    from yuki_tpu.integrators import _BENIGN_D
    from yuki_tpu.ops import trace_stream as ts
    from yuki_tpu.ops.trace_rows import row_words_interval
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
        # Crossing words in UNSORTED lane order; keys reorder host-side.
        wb = ts._cross_words_xla(ch, o1, d1, t1)
        wsh = ts._cross_words_xla(ch, o_s, d_s, t_s)
        iv_in = (o1, d1, t1, o_s, d_s, t_s)
        return wb, wsh, iv_in

    wb, wsh, iv_in = jax.block_until_ready(waves(o0, d0))
    o1, d1, t1, o_s, d_s, t_s = [np.asarray(x) for x in iv_in]
    lo = np.asarray(scene.data.world_lo)
    hi = np.asarray(scene.data.world_hi)

    import jax.numpy as jnp  # noqa: F811

    f_iv = None

    for wname, we_u, (ow, dw, tw) in (
        ("bounce", np.asarray(wb), (o1, d1, t1)),
        ("shadow", np.asarray(wsh), (o_s, d_s, t_s)),
    ):
        base_pairs = int(pop(we_u).sum())
        print(f"  {wname}: per-ray pairs={base_pairs}", flush=True)
        for kname in ("base", "m64", "dirlo", "dirhi", "m64dir", "dir9",
                      "dirm6"):
            keys = keys_variant(kname, ow, dw, lo, hi)
            order = np.argsort(keys, kind="stable")
            we = we_u[order]
            msg = f"    {kname:7s}:"
            for B in (4, 8):
                w8 = np.bitwise_or.reduce(
                    we.reshape(n // B, B, we.shape[1]), axis=1
                )
                c = pop(w8)
                msg += (
                    f"  B{B} amp=x{B*c.sum()/base_pairs:4.2f}"
                    f" p99={np.percentile(c, 99):3.0f}"
                )
            # Rows-branch probe: interval pairs/row under this order.
            import jax as _jax

            if f_iv is None:
                f_iv = _jax.jit(
                    lambda o_, d_, t_: row_words_interval(ch, o_, d_, t_)
                )
            rw = np.asarray(
                f_iv(jnp.asarray(ow[order]), jnp.asarray(dw[order]),
                     jnp.asarray(tw[order]))
            )
            msg += f"  rows-pairs/row={pop(rw).mean():6.1f}"
            print(msg, flush=True)


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
