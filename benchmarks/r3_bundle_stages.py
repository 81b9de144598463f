"""Round-3 bundle-engine timing: the 8-ray sublane-bundle slot stream
(ops/trace_bundles.py) vs the per-ray slot stream (ops/trace_stream.py)
on REAL sorted bounce-1 waves, colonnade + atrium.

Times the shared cross_words, then each engine's full closest/any call,
plus bundle-stage prefixes (bwords | extract | layout | pack | kernel),
and the e2e dispatched traverse.intersect / any_intersect with the
round-3 wiring (slot branch = bundles).

    PYTHONPATH=/root/repo:/root/.axon_site nohup python \
        benchmarks/r3_bundle_stages.py > /tmp/r3_bundle_stages.log 2>&1 &
"""

import functools
import time

import numpy as np

N_TILES = 1024  # 262k rays
TD = 16


def timed(label, fn, *args, reps=3):
    # block_until_ready on array outputs does not drain the axon queue;
    # use the host-fetch protocol (benchmarks/_timing.py).
    from _timing import drained

    return drained(label, fn, *args, reps=reps)


def profile_scene(name, scene, cam_params):
    import jax
    import jax.numpy as jnp

    from yuki_tpu import bsdf as bsdf_mod
    from yuki_tpu import traverse
    from yuki_tpu.camera import Camera
    from yuki_tpu.sampling import SampleCtx, UniformSampler
    from yuki_tpu.surface import make_surface, spawn_ray
    from yuki_tpu.integrators import _BENIGN_D
    import yuki_tpu.ops.trace_stream as ts
    import yuki_tpu.ops.trace_bundles as tb

    data, meta = scene.data, scene.meta
    ch = data.chunks
    n_c = ch.n_treelets
    print(
        f"== {name}: chunks={n_c} words={-(-n_c // 32)} "
        f"slot_mult={meta.slot_mult_tight}/{meta.slot_mult}",
        flush=True,
    )

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
    def bounce_wave(data, o0, d0):
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
        return o1, d1, t1, alive

    o1, d1, t1, alive = jax.block_until_ready(bounce_wave(data, o0, d0))
    print(f"  alive bounce rays: {int(alive.sum())}/{n}", flush=True)

    @jax.jit
    def sort_rays(data, o, d, tm):
        order = jnp.argsort(traverse.ray_sort_key(data, o, d))
        return o[order], d[order], tm[order]

    o_s, d_s, t_s = jax.block_until_ready(sort_rays(data, o1, d1, t1))

    n_b = n // tb.BUN
    C = tb.C_BUN
    mult = 4 * meta.slot_mult + 4
    max_rows = tb._max_rows_b(n_b, C, n_c, mult)
    print(f"  C={C} mult={mult} max_rows={max_rows} "
          f"({max_rows*128/n:.1f} slot-lanes/ray budget)", flush=True)

    jit = functools.partial(jax.jit)
    skip = jnp.full(n, -2, jnp.int32)

    # --- baseline: per-ray stream full calls ---
    @jit
    def st_full(ch, o, d, t):
        w = ts.cross_words(ch, o, d, t)
        t_o, p_o, ov, ok = ts.stream_closest_w(
            ch, w, o, d, t, mult=meta.slot_mult_tight,
            mult_wide=meta.slot_mult)
        return t_o.sum() + p_o.sum()

    @jit
    def st_any(ch, o, d, t):
        w = ts.cross_words(ch, o, d, t)
        occ, ov, ok = ts.stream_any_w(
            ch, w, o, d, t, skip,
            mult=max(3, meta.slot_mult_tight - 1),
            mult_wide=max(4, meta.slot_mult - 2))
        return occ.sum()

    timed("stream closest (full)", st_full, ch, o_s, d_s, t_s)
    timed("stream any (full)", st_any, ch, o_s, d_s, t_s)

    # --- bundle cumulative stage prefixes ---
    @jit
    def b_cross(ch, o, d, t):
        return ts.cross_words(ch, o, d, t).sum()

    @jit
    def b_words(ch, o, d, t):
        return tb.bundle_words(ts.cross_words(ch, o, d, t)).sum()

    @jit
    def b_extract(ch, o, d, t):
        bw = tb.bundle_words(ts.cross_words(ch, o, d, t))
        lists, ov = ts.extract_lists(bw, C)
        return lists.sum() + ov.sum()

    @jit
    def b_layout(ch, o, d, t):
        bw = tb.bundle_words(ts.cross_words(ch, o, d, t))
        lists, ov = ts.extract_lists(bw, C)
        pos_s, seg, aligned_off, total = tb.bundle_slot_layout(
            n_b, n_c, lists, C)
        slot_pos, row_chunk, valid = tb.bundle_slot_fill(
            n_b, n_c, pos_s, seg, aligned_off, C, max_rows)
        return slot_pos.sum() + row_chunk.sum() + valid.sum()

    @jit
    def b_pack(ch, o, d, t):
        bw = tb.bundle_words(ts.cross_words(ch, o, d, t))
        lists, ov = ts.extract_lists(bw, C)
        pos_s, seg, aligned_off, total = tb.bundle_slot_layout(
            n_b, n_c, lists, C)
        slot_pos, row_chunk, valid = tb.bundle_slot_fill(
            n_b, n_c, pos_s, seg, aligned_off, C, max_rows)
        tab = tb._bundle_table(o, d, t, None)
        slot_bun = jnp.where(valid, slot_pos // C, 0)
        packed = tb._pack_bundles(tab, slot_bun, valid, max_rows)
        return packed.sum()

    @jit
    def b_kernel(ch, o, d, t):
        bw = tb.bundle_words(ts.cross_words(ch, o, d, t))
        lists, ov = ts.extract_lists(bw, C)
        pos_s, seg, aligned_off, total = tb.bundle_slot_layout(
            n_b, n_c, lists, C)
        slot_pos, row_chunk, valid = tb.bundle_slot_fill(
            n_b, n_c, pos_s, seg, aligned_off, C, max_rows)
        tab = tb._bundle_table(o, d, t, None)
        slot_bun = jnp.where(valid, slot_pos // C, 0)
        packed = tb._pack_bundles(tab, slot_bun, valid, max_rows)
        out = ts._run_kernel(
            ts._closest_kernel, ch, row_chunk, packed, max_rows,
            jnp.float32, False)
        return out.sum()

    @jit
    def b_full(ch, o, d, t):
        w = ts.cross_words(ch, o, d, t)
        bw = tb.bundle_words(w)
        t_o, p_o, ov, ok = tb.bundles_closest_w(
            ch, bw, o, d, t, mult=4 * meta.slot_mult_tight,
            mult_wide=mult)
        return t_o.sum() + p_o.sum()

    @jit
    def b_any(ch, o, d, t):
        w = ts.cross_words(ch, o, d, t)
        bw = tb.bundle_words(w)
        occ, ov, ok = tb.bundles_any_w(
            ch, bw, o, d, t, skip,
            mult=4 * max(3, meta.slot_mult_tight - 1),
            mult_wide=4 * max(4, meta.slot_mult - 2) + 4)
        return occ.sum()

    timed("cross", b_cross, ch, o_s, d_s, t_s)
    timed("+bwords", b_words, ch, o_s, d_s, t_s)
    timed("+extract", b_extract, ch, o_s, d_s, t_s)
    timed("+layout", b_layout, ch, o_s, d_s, t_s)
    timed("+pack", b_pack, ch, o_s, d_s, t_s)
    timed("+kernel", b_kernel, ch, o_s, d_s, t_s)
    timed("bundle closest (full)", b_full, ch, o_s, d_s, t_s)
    timed("bundle any (full)", b_any, ch, o_s, d_s, t_s)

    # --- bundle-size sweep (bun=4 halves the kernel amplification at
    # ~1.7x the pack gathers; candidate caps sized per-B from
    # benchmarks/r3_bunsize.py p99/max: B=2 -> 64 covers max 74,
    # B=4 -> 64 covers p99 48 / max 104 via the overflow tier) ---
    for bun, C_b in ((2, 64), (4, 64)):
        @jit
        def b_full_b(ch, o, d, t, bun=bun, C_b=C_b):
            bw = tb.bundle_words(ts.cross_words(ch, o, d, t), bun)
            t_o, p_o, ov, ok = tb.bundles_closest_w(
                ch, bw, o, d, t, C=C_b, mult=4 * meta.slot_mult_tight,
                mult_wide=mult, bun=bun)
            return t_o.sum() + p_o.sum()

        @jit
        def b_any_b(ch, o, d, t, bun=bun, C_b=C_b):
            bw = tb.bundle_words(ts.cross_words(ch, o, d, t), bun)
            occ, ov, ok = tb.bundles_any_w(
                ch, bw, o, d, t, skip, C=C_b,
                mult=4 * max(3, meta.slot_mult_tight - 1),
                mult_wide=4 * max(4, meta.slot_mult - 2) + 4, bun=bun)
            return occ.sum()

        timed(f"bundle closest bun={bun}", b_full_b, ch, o_s, d_s, t_s)
        timed(f"bundle any bun={bun}", b_any_b, ch, o_s, d_s, t_s)

    # --- correctness on the real wave: bundle vs stream bitwise ---
    @jit
    def both(ch, o, d, t):
        w = ts.cross_words(ch, o, d, t)
        t_a, p_a, ov_a, ok_a = ts.stream_closest_w(
            ch, w, o, d, t, mult=meta.slot_mult_tight,
            mult_wide=meta.slot_mult)
        bw = tb.bundle_words(w)
        t_b, p_b, ov_b, ok_b = tb.bundles_closest_w(
            ch, bw, o, d, t, mult=4 * meta.slot_mult_tight,
            mult_wide=mult)
        return t_a, p_a, ov_a, ok_a, t_b, p_b, ov_b, ok_b

    t_a, p_a, ov_a, ok_a, t_b, p_b, ov_b, ok_b = jax.block_until_ready(
        both(ch, o_s, d_s, t_s))
    keep = ~(np.asarray(ov_a) | np.asarray(ov_b))
    match_p = np.array_equal(np.asarray(p_a)[keep], np.asarray(p_b)[keep])
    match_t = np.allclose(np.asarray(t_a)[keep], np.asarray(t_b)[keep],
                          rtol=1e-5)
    print(f"  parity: ok_a={bool(ok_a)} ok_b={bool(ok_b)} "
          f"ov_a={int(np.asarray(ov_a).sum())} "
          f"ov_b={int(np.asarray(ov_b).sum())} "
          f"prims_match={match_p} t_match={match_t}", flush=True)

    # --- e2e dispatched (round-3 wiring: slot branch = bundles) ---
    @jit
    def e2e_closest(data, o, d, t):
        hit = traverse.intersect(data, meta, o, d, t)
        return hit.t.sum()

    @jit
    def e2e_any(data, o, d, t):
        occ = traverse.any_intersect(data, meta, o, d, t, skip)
        return occ.sum()

    timed("e2e intersect (bounce)", e2e_closest, data, o1, d1, t1)
    timed("e2e any_intersect (bounce)", e2e_any, data, o1, d1, t1)
    timed("e2e intersect (primary)", e2e_closest, data, o0, d0, tmax_full)


def main():
    import jax

    print(f"backend={jax.default_backend()}", flush=True)

    from yuki_tpu.scene.testscenes import colonnade

    scene, cam, _ = colonnade()
    profile_scene("colonnade", scene, cam)

    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench import load_atrium

    scene_a, cam_a, _ = load_atrium()
    profile_scene("atrium", scene_a, cam_a)


if __name__ == "__main__":
    main()
