"""Per-bounce dispatch diagnostics of the REAL path chain: for every
closest/any call of an unrolled d5 colonnade/atrium wave, report which
branch the adaptive dispatch takes and whether budgets/overflows spill —
the suspects for production bounces costing 6x their bounce-1 stage
measurements (atrium knockout: 1800 ms/bounce vs 283 ms at b1).

For each traversal call:
  alive, interval-row pairs/row (the dispatch probe), coherent?,
  bundle-pair demand vs tight/wide slot budgets, overflow rays vs
  OV_CAP, rows-branch demand vs its cap, and the blocked call time.

    PYTHONPATH=/root/repo:/root/.axon_site nohup python \
        benchmarks/r3_dispatch_diag.py > /tmp/r3_dispatch_diag.log 2>&1 &
"""

import time

import numpy as np

N_TILES = 1024
TD = 16


def diag(name, scene, cam_params):
    import jax
    import jax.numpy as jnp

    from yuki_tpu import bsdf as bsdf_mod
    from yuki_tpu import lights as lights_mod
    from yuki_tpu import traverse
    from yuki_tpu.camera import Camera
    from yuki_tpu.integrators import _BENIGN_D
    from yuki_tpu.sampling import SampleCtx, UniformSampler
    from yuki_tpu.surface import make_surface, spawn_ray, spawn_ray_to
    from yuki_tpu.ops import trace_bundles as tb
    from yuki_tpu.ops import trace_rows as trr
    from yuki_tpu.ops import trace_stream as ts

    data, meta = scene.data, scene.meta
    ch = data.chunks
    n = N_TILES * TD * TD
    print(f"== {name}: chunks={ch.n_treelets} "
          f"slot_mult={meta.slot_mult_tight}/{meta.slot_mult} "
          f"lights={meta.light_types}", flush=True)

    camera = Camera.create(cam_params, 1920, 1080)
    tx = (np.arange(N_TILES) % 120) * TD
    ty = (np.arange(N_TILES) // 120) * TD
    px = np.broadcast_to(
        tx[:, None, None] + np.arange(TD)[None, :, None],
        (N_TILES, TD, TD)).reshape(-1)
    py = np.broadcast_to(
        ty[:, None, None] + np.arange(TD)[None, None, :],
        (N_TILES, TD, TD)).reshape(-1)
    ctx = SampleCtx(
        px=jnp.asarray(px, jnp.int32), py=jnp.asarray(py, jnp.int32),
        sample_index=jnp.uint32(0), seed=jnp.uint32(1),
    )
    sampler = UniformSampler(1)
    p_film = jnp.asarray(np.stack([px + 0.5, py + 0.5], -1), jnp.float32)
    o, d = camera.ray(p_film)
    t_max = jnp.full(n, traverse.F32_MAX)

    from yuki_tpu.traverse import _ROWS_MULT, _rows_demand, ray_sort_key

    @jax.jit
    def wave_stats(data, o, d, tm):
        # skip_sort production order: stats on the NATURAL wave.
        rows = n // 128
        rw = trr.row_words_interval(ch, o, d, tm)
        demand = _rows_demand(rw)
        cnt_nz = jax.lax.population_count(rw).sum()
        words = ts.cross_words(ch, o, d, tm)
        cnt = jax.lax.population_count(words).sum(axis=1)
        # Fused-cull overflow semantics: > C chunks or > S words.
        nw = jax.lax.population_count(
            (words != 0).astype(jnp.uint32)).sum(axis=1)
        ov = (cnt > ts.C_MAIN) | (nw > ts.CROSS_S)
        # True aligned slot demand (what the tier cond sees).
        lists, _ = ts.extract_lists(words, ts.C_MAIN)
        _, _, _, total_s = ts.slot_layout(n, ch.n_treelets, lists,
                                          ts.C_MAIN)
        return (
            (tm > 0).sum(), demand, cnt_nz, cnt.sum(), ov.sum(), total_s,
        )

    def report(tag, o, d, tm):
        alive, demand, rp, pairs, n_ov, total_s = map(
            int, jax.block_until_ready(wave_stats(data, o, d, tm)))
        rows = n // 128
        coh = demand <= rows * _ROWS_MULT
        tight = ts._max_rows(n, ts.C_MAIN, ch.n_treelets,
                             meta.slot_mult_tight) * 128
        wide = ts._max_rows(n, ts.C_MAIN, ch.n_treelets,
                            meta.slot_mult) * 128
        print(
            f"  {tag}: alive={alive} | probe demand {demand} "
            f"(cap {rows * _ROWS_MULT}) -> "
            f"{'ROWS' if coh else 'SLOTS'} | exact pairs {pairs} "
            f"({pairs/max(alive,1):.2f}/alive-ray) | slot demand "
            f"{total_s} tight={tight} wide={wide}"
            f"{' SPILL' if total_s > tight else ''}"
            f"{' BLOWN' if total_s > wide else ''} | ray-ov {n_ov} "
            f"(tiers {ts.OV_SMALL}/{ts.OV_MID}/{ts.OV_CAP})",
            flush=True,
        )

    @jax.jit
    def closest(data, o, d, tm):
        return traverse.intersect(data, meta, o, d, tm)

    @jax.jit
    def anyhit(data, o, d, tm, skip):
        return traverse.any_intersect(data, meta, o, d, tm, skip)

    def timed(label, fn, *args):
        # Drain protocol: block_until_ready on arrays does not block here
        # (benchmarks/_timing.py) — fetch one element of the last leaf.
        from _timing import _drain

        out = fn(*args)
        _drain(out)
        t0 = time.monotonic()
        out = fn(*args)
        _drain(out)
        print(f"    {label}: {(time.monotonic()-t0)*1e3:.1f} ms",
              flush=True)
        return out

    center = 0.5 * (data.world_lo + data.world_hi)
    dim = 2
    for b in range(4):
        report(f"b{b} closest", o, d, t_max)
        hit = timed(f"b{b} closest", closest, data, o, d, t_max)
        alive = hit.hit
        si = make_surface(data, hit, o, d)
        mp = bsdf_mod.gather_materials(data, si, meta)
        # NEE batch exactly as _nee builds it
        o_parts, d_parts, t_parts, s_parts = [], [], [], []
        for li_idx, ltype in enumerate(meta.light_types):
            u = sampler.get_2d(ctx, dim + 2 * li_idx)
            ls = lights_mod.sample_li(data, li_idx, ltype, si, u)
            o_b, d_b = spawn_ray_to(si, ls.target)
            o_parts.append(jnp.where(alive[:, None], o_b, center))
            d_parts.append(jnp.where(alive[:, None], d_b, _BENIGN_D))
            t_parts.append(jnp.where(alive, 0.9999, 0.0))
            s_parts.append(jnp.broadcast_to(ls.skip_light, (n,)).astype(jnp.int32))
        o_sh = jnp.concatenate(o_parts)
        d_sh = jnp.concatenate(d_parts)
        t_sh = jnp.concatenate(t_parts)
        s_sh = jnp.concatenate(s_parts)
        nl = len(meta.light_types)
        print(f"  b{b} NEE batch = {nl}x{n}", flush=True)
        report_batched(name, data, meta, ch, o_sh, d_sh, t_sh)
        timed(f"b{b} any (batched NEE)", anyhit, data, o_sh, d_sh, t_sh, s_sh)

        u = sampler.get_2d(ctx, dim + 2 * nl)
        bs = bsdf_mod.bsdf_sample(mp, si, si.wo, u, meta)
        alive = alive & (bs.pdf > 0.0)
        o = jnp.where(alive[:, None], spawn_ray(si, bs.wi), center)
        d = jnp.where(alive[:, None], bs.wi, _BENIGN_D)
        t_max = jnp.where(alive, traverse.F32_MAX, 0.0)
        dim += 2 * nl + 3


def report_batched(name, data, meta, ch, o, d, tm):
    import jax
    import jax.numpy as jnp

    from yuki_tpu.ops import trace_rows as trr
    from yuki_tpu.ops import trace_stream as ts
    from yuki_tpu.traverse import _ROWS_MULT, _rows_demand

    n = o.shape[0]
    pad = (-n) % 128
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3))])
        d = jnp.concatenate([d, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]),
                                         (pad, 1))])
        tm = jnp.concatenate([tm, jnp.zeros(pad)])
        n = o.shape[0]

    @jax.jit
    def stats(data, o, d, tm):
        rows = n // 128
        rw = trr.row_words_interval(ch, o, d, tm)
        demand = _rows_demand(rw)
        words = ts.cross_words(ch, o, d, tm)
        cnt = jax.lax.population_count(words).sum(axis=1)
        nw = jax.lax.population_count(
            (words != 0).astype(jnp.uint32)).sum(axis=1)
        ov = (cnt > ts.C_MAIN) | (nw > ts.CROSS_S)
        lists, _ = ts.extract_lists(words, ts.C_MAIN)
        _, _, _, total_s = ts.slot_layout(n, ch.n_treelets, lists,
                                          ts.C_MAIN)
        return (tm > 0).sum(), demand, cnt.sum(), ov.sum(), total_s

    alive, demand, pairs, n_ov, total_s = map(int, jax.block_until_ready(
        stats(data, o, d, tm)))
    rows = n // 128
    coh = demand <= rows * _ROWS_MULT
    tight = ts._max_rows(n, ts.C_MAIN, ch.n_treelets,
                         max(3, meta.slot_mult_tight - 1)) * 128
    wide = ts._max_rows(n, ts.C_MAIN, ch.n_treelets,
                        max(4, meta.slot_mult - 2)) * 128
    print(
        f"    shadow: alive={alive} demand {demand} "
        f"(cap {rows*_ROWS_MULT}) -> {'ROWS' if coh else 'SLOTS'} | "
        f"exact pairs {pairs} ({pairs/max(alive,1):.2f}/alive-ray) | "
        f"slot demand {total_s} tight={tight} wide={wide}"
        f"{' SPILL' if total_s > tight else ''}"
        f"{' BLOWN' if total_s > wide else ''} | ray-ov {n_ov}",
        flush=True,
    )


def main():
    import jax

    print(f"backend={jax.default_backend()}", flush=True)
    from yuki_tpu.scene.testscenes import colonnade

    scene, cam, _ = colonnade()
    diag("colonnade", scene, cam)

    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import load_atrium

    scene_a, cam_a, _ = load_atrium()
    diag("atrium", scene_a, cam_a)
    print("done", flush=True)


if __name__ == "__main__":
    main()
