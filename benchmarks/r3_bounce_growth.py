"""Per-bounce divergence growth predictor (CPU): the round-3 mystery is
production bounces costing ~6x their bounce-1 stage measurements
(atrium 1800 ms/bounce vs 283 measured at b1).  Hypothesis: divergence
GROWS with bounce depth — later waves cross more chunks per ray, push
past the tight slot tier, overflow C more often, and never take the
cheap rows branch — so bounce-1 stage numbers undercount production.

For each bounce wave b1..b4 (traced on the CPU backend) this measures:
  - alive fraction (does the wave even shrink?)
  - interval row-cull pairs/row (the production dispatch probe) vs the
    coherent threshold
  - exact per-ray and per-8-bundle crossed-chunk stats
  - overflow rates vs the bundle C and the per-ray C_MAIN
  - slot demand vs the tight/wide budget tiers

    PYTHONPATH=/root/repo nohup python \
        benchmarks/r3_bounce_growth.py > /tmp/r3_bounce_growth.log 2>&1 &
"""

import time

import numpy as np

N_TILES = 512
TD = 16
N_BOUNCES = 4


def stats_line(label, c):
    return (
        f"{label}: mean={c.mean():6.2f} p95={np.percentile(c, 95):4.0f} "
        f"p99={np.percentile(c, 99):4.0f} max={int(c.max()):5d}"
    )


def run(label, scene):
    import jax
    import jax.numpy as jnp

    from yuki_tpu import bsdf as bsdf_mod
    from yuki_tpu import lights as lights_mod
    from yuki_tpu import traverse
    from yuki_tpu.camera import Camera
    from yuki_tpu.integrators import _BENIGN_D
    from yuki_tpu.ops import trace_bundles as tb
    from yuki_tpu.ops import trace_stream as ts
    from yuki_tpu.ops.trace_rows import row_words_interval
    from yuki_tpu.sampling import SampleCtx, UniformSampler
    from yuki_tpu.surface import make_surface, spawn_ray, spawn_ray_to

    data, meta = scene.data, scene.meta
    ch = data.chunks
    n_c = ch.n_treelets
    print(f"== {label}: chunks={n_c} slot_mult={meta.slot_mult_tight}/"
          f"{meta.slot_mult} ==", flush=True)

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
    o, d = camera.ray(p_film)
    t_max = jnp.full(n, traverse.F32_MAX)
    alive = jnp.ones(n, bool)
    center = 0.5 * (data.world_lo + data.world_hi)

    @jax.jit
    def step(o, d, t_max, alive, bounce):
        """One production bounce: closest hit -> shadow wave + next ray."""
        hit = traverse.intersect(data, meta, o, d, t_max)
        alive = alive & hit.hit
        si = make_surface(data, hit, o, d)
        mp = bsdf_mod.gather_materials(data, si, meta)
        u = sampler.get_2d(ctx, 6 + bounce * 5)
        bs = bsdf_mod.bsdf_sample(mp, si, si.wo, u, meta)
        alive2 = alive & (bs.pdf > 0.0)
        o2 = jnp.where(alive2[..., None], spawn_ray(si, bs.wi), center)
        d2 = jnp.where(alive2[..., None], bs.wi, _BENIGN_D)
        t2 = jnp.where(alive2, traverse.F32_MAX, 0.0)
        uls = sampler.get_2d(ctx, 4 + bounce * 5)
        ls = lights_mod.sample_li(data, 0, meta.light_types[0], si, uls)
        o_s, d_s = spawn_ray_to(si, ls.target)
        o_s = jnp.where(alive[..., None], o_s, center)
        d_s = jnp.where(alive[..., None], d_s, _BENIGN_D)
        t_s = jnp.where(alive, 0.9999, 0.0)
        return o2, d2, t2, alive2, o_s, d_s, t_s

    @jax.jit
    def wave_stats(o, d, tm):
        order = jnp.argsort(traverse.ray_sort_key(data, o, d))
        o, d, tm = o[order], d[order], tm[order]
        rw = row_words_interval(ch, o, d, tm)
        row_pairs = jax.lax.population_count(rw).sum(axis=1)
        words = ts._cross_words_xla(ch, o, d, tm)
        return row_pairs, words

    for b in range(N_BOUNCES):
        t0 = time.monotonic()
        o, d, t_max, alive, o_s, d_s, t_s = jax.block_until_ready(
            step(o, d, t_max, alive, jnp.int32(b))
        )
        dt = time.monotonic() - t0
        for wname, (ow, dw, tw) in (
            (f"b{b+1} bounce", (o, d, t_max)),
            (f"b{b+1} shadow", (o_s, d_s, t_s)),
        ):
            row_pairs, words = jax.block_until_ready(wave_stats(ow, dw, tw))
            rp = np.asarray(row_pairs)
            we = np.asarray(words)
            per_ray = np.unpackbits(
                we.view(np.uint8), axis=1, bitorder="little"
            ).sum(axis=1)
            w8 = np.bitwise_or.reduce(
                we.reshape(n // 8, 8, we.shape[1]), axis=1
            )
            per_b8 = np.unpackbits(
                w8.view(np.uint8), axis=1, bitorder="little"
            ).sum(axis=1)
            coherent = rp.sum() <= (n // 128) * 32  # _COHERENT_ROW_PAIRS
            # Slot/budget arithmetic mirrors traverse.py's slot branch
            # (approximate: ignores per-chunk SPR alignment padding).
            mult_t, mult_w = 4 * meta.slot_mult_tight, 4 * meta.slot_mult + 4
            n_b = n // 8
            demand = int(per_b8.sum())
            cap_t = mult_t * n_b + n_c * 16
            cap_w = mult_w * n_b + n_c * 16
            print(
                f"  {stats_line(wname + ' per-ray', per_ray)}  "
                f"b8 mean={per_b8.mean():5.2f} p99={np.percentile(per_b8, 99):3.0f} "
                f"max={int(per_b8.max())}",
                flush=True,
            )
            print(
                f"    rows-pairs/row mean={rp.mean():6.1f} -> "
                f"{'ROWS' if coherent else 'SLOT'} branch | "
                f"bundle C48 ov={(per_b8 > 48).mean()*100:.2f}% "
                f"C96 ov={(per_b8 > 96).mean()*100:.3f}% | "
                f"slot demand {demand} vs tight {cap_t} wide {cap_w} "
                f"({'tight' if demand <= cap_t else 'WIDE' if demand <= cap_w else 'BLOWN'})",
                flush=True,
            )
        alive_frac = float(np.asarray(alive).mean())
        print(f"  b{b+1}: alive={alive_frac*100:.1f}%  (step {dt:.0f}s)",
              flush=True)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import sys

    from yuki_tpu.scene.testscenes import colonnade

    scene, cam, _ = colonnade()
    scene.cam_params = cam
    run("colonnade", scene)

    sys.path.insert(0, "/root/repo")
    from bench import load_atrium

    scene_a, cam_a, _ = load_atrium()
    scene_a.cam_params = cam_a
    run("atrium", scene_a)


if __name__ == "__main__":
    main()
