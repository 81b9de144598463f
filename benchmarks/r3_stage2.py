"""Cumulative stage attribution of the PRODUCTION traversal dispatch.

The dispatch-diag blocked-call times (r3_dispatch_diag) exceed the sum
of every stage we had measured standalone by ~100 ms per call; this
script times cumulative PREFIXES of the exact production pipeline
(traverse.intersect / any_intersect internals, 2L cull path) so the
deltas attribute every millisecond.  Each prefix is its own jit with
drained timing (benchmarks/_timing.py); the constant dispatch round
trip cancels in deltas.

Waves: a real bounce-1 closest wave (262k divergent) and the b1 NEE
shadow wave (2x262k) built by unrolling one bounce exactly like
r3_dispatch_diag.

    PYTHONPATH=/root/repo:/root/repo/benchmarks:/root/.axon_site \
        nohup python benchmarks/r3_stage2.py > /tmp/r3_stage2.log 2>&1 &
"""

import time

import numpy as np

N_TILES = 1024
TD = 16


def timed(label, fn, *args, reps=3):
    from _timing import drained

    return drained(label, fn, *args, reps=reps)


def build_waves(scene, cam_params):
    """Replicate r3_dispatch_diag's bounce-1 wave construction."""
    import jax
    import jax.numpy as jnp

    from yuki_tpu import bsdf as bsdf_mod
    from yuki_tpu import lights as lights_mod
    from yuki_tpu import traverse
    from yuki_tpu.camera import Camera
    from yuki_tpu.integrators import _BENIGN_D
    from yuki_tpu.sampling import SampleCtx, UniformSampler
    from yuki_tpu.surface import make_surface, spawn_ray, spawn_ray_to

    data, meta = scene.data, scene.meta
    n = N_TILES * TD * TD
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
    center = 0.5 * (data.world_lo + data.world_hi)

    @jax.jit
    def prep(data, p_film):
        o, d = camera.ray(p_film)
        t_max = jnp.full(n, traverse.F32_MAX)
        hit = traverse.intersect(data, meta, o, d, t_max)
        alive = hit.hit
        si = make_surface(data, hit, o, d)
        mp = bsdf_mod.gather_materials(data, si, meta)
        o_p, d_p, t_p, s_p = [], [], [], []
        for li_idx, ltype in enumerate(meta.light_types):
            u = sampler.get_2d(ctx, 2 + 2 * li_idx)
            ls = lights_mod.sample_li(data, li_idx, ltype, si, u)
            o_b, d_b = spawn_ray_to(si, ls.target)
            o_p.append(jnp.where(alive[:, None], o_b, center))
            d_p.append(jnp.where(alive[:, None], d_b, _BENIGN_D))
            t_p.append(jnp.where(alive, 0.9999, 0.0))
            s_p.append(jnp.broadcast_to(ls.skip_light, (n,)).astype(
                jnp.int32))
        o_sh = jnp.concatenate(o_p)
        d_sh = jnp.concatenate(d_p)
        t_sh = jnp.concatenate(t_p)
        s_sh = jnp.concatenate(s_p)
        nl = len(meta.light_types)
        u = sampler.get_2d(ctx, 2 + 2 * nl)
        bs = bsdf_mod.bsdf_sample(mp, si, si.wo, u, meta)
        alive2 = alive & (bs.pdf > 0.0)
        o2 = jnp.where(alive2[:, None], spawn_ray(si, bs.wi), center)
        d2 = jnp.where(alive2[:, None], bs.wi, _BENIGN_D)
        t2 = jnp.where(alive2, traverse.F32_MAX, 0.0)
        return o2, d2, t2, o_sh, d_sh, t_sh, s_sh

    outs = jax.block_until_ready(prep(data, p_film))
    return outs


def stage_slot_closest(name, scene, o, d, t_max):
    """Cumulative prefixes of the slot-branch closest pipeline."""
    import functools

    import jax
    import jax.numpy as jnp

    from yuki_tpu import traverse
    from yuki_tpu.ops import trace_rows as trr
    from yuki_tpu.ops import trace_stream as ts
    from yuki_tpu.ops.trace_cull import candidate_lists_fused as _clf

    data, meta = scene.data, scene.meta
    ch = data.chunks
    n = o.shape[0]
    C = ts.C_MAIN
    use_2l = ch.n_treelets >= ts.CROSS_2L_MIN_CHUNKS

    def sort_only(o, d, tm):
        order = jnp.argsort(traverse.ray_sort_key(data, o, d))
        o_s, d_s, t_s = o[order], d[order], tm[order]
        inv = (jnp.zeros(n, jnp.int32).at[order]
               .set(jnp.arange(n, dtype=jnp.int32), unique_indices=True))
        return o_s, d_s, t_s, inv

    def mk(stage):
        @jax.jit
        def run(o, d, tm):
            o_s, d_s, t_s, inv = sort_only(o, d, tm)
            out = stage(o_s, d_s, t_s)
            leaves = [x for x in jax.tree_util.tree_leaves(out)]
            return leaves[-1], inv
        return run

    def s_sort(o_s, d_s, t_s):
        return t_s

    def s_probe(o_s, d_s, t_s):
        rw = trr.row_words_interval(ch, o_s, d_s, t_s)
        return jax.lax.population_count(rw).sum()

    def s_cross(o_s, d_s, t_s):
        if use_2l:
            cw, cb2, ov = ts.cross_compact(ch, o_s, d_s, t_s)
            return cw.sum()
        return ts.cross_words(ch, o_s, d_s, t_s).sum()

    def s_extract(o_s, d_s, t_s):
        if use_2l:
            lists, ov = _clf(ch, o_s, d_s, t_s, C)
        else:
            lists, ov = ts.candidate_lists(ch, o_s, d_s, t_s, C)
        return lists.sum()

    def lists_of(o_s, d_s, t_s):
        if use_2l:
            return _clf(ch, o_s, d_s, t_s, C)
        return ts.candidate_lists(ch, o_s, d_s, t_s, C)

    def s_layout(o_s, d_s, t_s):
        lists, ov = lists_of(o_s, d_s, t_s)
        pos_s, seg, aligned_off, total = ts.slot_layout(
            n, ch.n_treelets, lists, C)
        return pos_s.sum() + total

    def s_fill(o_s, d_s, t_s):
        lists, ov = lists_of(o_s, d_s, t_s)
        pos_s, seg, aligned_off, total = ts.slot_layout(
            n, ch.n_treelets, lists, C)
        rows_a = ts._max_rows(n, C, ch.n_treelets, meta.slot_mult_tight)
        slot_pos, row_chunk, valid = ts.slot_fill(
            n, ch.n_treelets, pos_s, seg, aligned_off, C, rows_a)
        return slot_pos.sum()

    def s_pack(o_s, d_s, t_s):
        lists, ov = lists_of(o_s, d_s, t_s)
        pos_s, seg, aligned_off, total = ts.slot_layout(
            n, ch.n_treelets, lists, C)
        rows_a = ts._max_rows(n, C, ch.n_treelets, meta.slot_mult_tight)
        slot_pos, row_chunk, valid = ts.slot_fill(
            n, ch.n_treelets, pos_s, seg, aligned_off, C, rows_a)
        slot_ray = jnp.where(valid, slot_pos // C, 0)
        packed = ts._pack_stream(o_s, d_s, t_s, slot_ray, valid, rows_a)
        return packed.sum()

    def s_kernel(o_s, d_s, t_s):
        lists, ov = lists_of(o_s, d_s, t_s)
        pos_s, seg, aligned_off, total = ts.slot_layout(
            n, ch.n_treelets, lists, C)
        rows_a = ts._max_rows(n, C, ch.n_treelets, meta.slot_mult_tight)
        slot_pos, row_chunk, valid = ts.slot_fill(
            n, ch.n_treelets, pos_s, seg, aligned_off, C, rows_a)
        slot_ray = jnp.where(valid, slot_pos // C, 0)
        packed = ts._pack_stream(o_s, d_s, t_s, slot_ray, valid, rows_a)
        out = ts._run_kernel(ts._closest_kernel, ch, row_chunk, packed,
                             rows_a, jnp.float32, False)
        return out.sum()

    def s_stream(o_s, d_s, t_s):
        lists, ov = lists_of(o_s, d_s, t_s)
        t, prim, ovr, ok = ts.stream_closest_l(
            ch, lists, ov, o_s, d_s, t_s,
            mult=meta.slot_mult_tight, mult_wide=meta.slot_mult)
        return t.sum() + prim.sum()

    @jax.jit
    def s_e2e(o, d, tm):
        hit = traverse.intersect(data, meta, o, d, tm)
        return hit.t.sum(), hit.prim.sum()

    print(f"-- {name} closest slot-stage (n={n})", flush=True)
    prev = 0.0
    for label, fn in [
        ("sort", mk(s_sort)), ("probe", mk(s_probe)),
        ("cross", mk(s_cross)), ("extract", mk(s_extract)),
        ("layout", mk(s_layout)), ("fill", mk(s_fill)),
        ("pack", mk(s_pack)), ("kernel", mk(s_kernel)),
        ("stream(all)", mk(s_stream)),
    ]:
        dt = timed(label, fn, o, d, t_max)
        print(f"      delta {label}: {(dt - prev) * 1e3:+.1f} ms",
              flush=True)
        prev = dt
    timed("e2e intersect", s_e2e, o, d, t_max)


def stage_any(name, scene, o, d, t_max, skip):
    """Cumulative prefixes of any_intersect (rows or slot, per probe)."""
    import jax
    import jax.numpy as jnp

    from yuki_tpu import traverse
    from yuki_tpu.ops import trace_rows as trr
    from yuki_tpu.ops import trace_stream as ts
    from yuki_tpu.ops.trace_cull import candidate_lists_fused as _clf

    data, meta = scene.data, scene.meta
    ch = data.chunks
    n0 = o.shape[0]
    pad = (-n0) % 128
    if pad:
        center = 0.5 * (np.asarray(data.world_lo)
                        + np.asarray(data.world_hi))
        o = jnp.concatenate([o, jnp.broadcast_to(center, (pad, 3))])
        d = jnp.concatenate(
            [d, jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (pad, 3))])
        t_max = jnp.concatenate([t_max, jnp.zeros(pad)])
        skip = jnp.concatenate([skip, jnp.full(pad, -2, skip.dtype)])
    import jax.numpy as jnp
    n = o.shape[0]
    rows = n // 128
    use_2l = ch.n_treelets >= ts.CROSS_2L_MIN_CHUNKS

    def mk(stage):
        @jax.jit
        def run(o, d, tm, sk):
            order = jnp.argsort(traverse.ray_sort_key(data, o, d))
            o_s, d_s, t_s, s_s = o[order], d[order], tm[order], sk[order]
            out = stage(o_s, d_s, t_s, s_s)
            leaves = [x for x in jax.tree_util.tree_leaves(out)]
            return leaves[-1]
        return run

    def s_sort(o_s, d_s, t_s, s_s):
        return t_s

    def s_probe(o_s, d_s, t_s, s_s):
        rw = trr.row_words_interval(ch, o_s, d_s, t_s)
        return jax.lax.population_count(rw).sum()

    # rows branch prefixes
    def s_rows_extract(o_s, d_s, t_s, s_s):
        rw = trr.row_words_interval(ch, o_s, d_s, t_s)
        lists, ov = ts.extract_lists(rw, traverse._ROWS_C)
        return lists.sum()

    def s_rows_pairs(o_s, d_s, t_s, s_s):
        rw = trr.row_words_interval(ch, o_s, d_s, t_s)
        lists, ov = ts.extract_lists(rw, traverse._ROWS_C)
        cap = rows * traverse._ROWS_MULT
        pr, pc, qr, npair = trr._row_pairs(lists, rows, traverse._ROWS_C,
                                           cap)
        return pc.sum() + qr.sum()

    def s_rows_full(o_s, d_s, t_s, s_s):
        rw = trr.row_words_interval(ch, o_s, d_s, t_s)
        occ, ov = trr.rows_any_w(ch, rw, o_s, d_s, t_s, s_s,
                                 C=traverse._ROWS_C,
                                 mult=traverse._ROWS_MULT)
        return occ.sum()

    # slot branch prefixes
    def s_slot_extract(o_s, d_s, t_s, s_s):
        if use_2l:
            lists, ov = _clf(ch, o_s, d_s, t_s, ts.C_MAIN)
        else:
            lists, ov = ts.candidate_lists(ch, o_s, d_s, t_s, ts.C_MAIN)
        return lists.sum()

    def s_slot_full(o_s, d_s, t_s, s_s):
        if use_2l:
            lists, ov = _clf(ch, o_s, d_s, t_s, ts.C_MAIN)
        else:
            lists, ov = ts.candidate_lists(ch, o_s, d_s, t_s, ts.C_MAIN)
        occ, ovr, ok = ts.stream_any_l(
            ch, lists, ov, o_s, d_s, t_s, s_s,
            mult=max(3, meta.slot_mult_tight - 1),
            mult_wide=max(4, meta.slot_mult - 2))
        return occ.sum()

    @jax.jit
    def s_e2e(o, d, tm, sk):
        return traverse.any_intersect(data, meta, o, d, tm, sk).sum()

    print(f"-- {name} any stage (n={n})", flush=True)
    prev = 0.0
    for label, fn in [
        ("sort", mk(s_sort)), ("probe", mk(s_probe)),
        ("rows_extract", mk(s_rows_extract)),
        ("rows_pairs", mk(s_rows_pairs)),
        ("rows_full", mk(s_rows_full)),
        ("slot_extract", mk(s_slot_extract)),
        ("slot_full", mk(s_slot_full)),
    ]:
        dt = timed(label, fn, o, d, t_max, skip)
        print(f"      delta {label}: {(dt - prev) * 1e3:+.1f} ms",
              flush=True)
        prev = dt
    timed("e2e any_intersect", s_e2e, o, d, t_max, skip)


def main():
    import jax

    print(f"backend={jax.default_backend()}", flush=True)
    from yuki_tpu.scene.testscenes import colonnade

    scene, cam, _ = colonnade()
    o2, d2, t2, o_sh, d_sh, t_sh, s_sh = build_waves(scene, cam)
    stage_slot_closest("colonnade b1", scene, o2, d2, t2)
    stage_any("colonnade b1-NEE", scene, o_sh, d_sh, t_sh, s_sh)

    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import load_atrium

    scene_a, cam_a, _ = load_atrium()
    o2, d2, t2, o_sh, d_sh, t_sh, s_sh = build_waves(scene_a, cam_a)
    stage_slot_closest("atrium b1", scene_a, o2, d2, t2)
    stage_any("atrium b1-NEE", scene_a, o_sh, d_sh, t_sh, s_sh)
    print("done", flush=True)


if __name__ == "__main__":
    main()
