"""Round-3 per-stage cost attribution of the divergent slot-stream
pipeline, on REAL bounce-1 waves (exact integrator ray formation) for
both the colonnade (124k tris) and the atrium asset scene (347k tris).

Times cumulative prefixes (differences cancel the ~30 ms dispatch
floor):  cross | +extract | +slots(sort) | +pack | +kernel | full.
Also: the overflow wide-pass cost in isolation (it runs whenever ANY
ray of the wave overflows C=16), rows path, and e2e intersect /
any_intersect / full-bounce.

    PYTHONPATH=/root/repo:/root/.axon_site nohup python \
        benchmarks/r3_stages.py > /tmp/r3_stages.log 2>&1 &
"""

import functools
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
    print(f"  {label}: {dt*1e3:.1f} ms", flush=True)
    return dt


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
    import yuki_tpu.ops.trace_rows as tr

    data, meta = scene.data, scene.meta
    ch = data.chunks
    sp = data.tris.shading_packed
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

    C = ts.C_MAIN
    mult = meta.slot_mult
    max_rows = ts._max_rows(n, C, n_c, mult)
    print(f"  C={C} mult={mult} max_rows={max_rows} "
          f"({max_rows*128/n:.1f} slots/ray budget)", flush=True)

    # --- cumulative stage prefixes on the sorted bounce wave ---
    jit = functools.partial(jax.jit)

    @jit
    def s_cross(ch, o, d, t):
        w = ts.cross_words(ch, o, d, t)
        return w.sum()

    @jit
    def s_extract(ch, o, d, t):
        w = ts.cross_words(ch, o, d, t)
        lists, ov = ts.extract_lists(w, C)
        return lists.sum() + ov.sum()

    @jit
    def s_slots(ch, o, d, t):
        w = ts.cross_words(ch, o, d, t)
        lists, ov = ts.extract_lists(w, C)
        slot_pos, row_chunk, valid, ok = ts.build_slots(
            n, n_c, lists, C, max_rows)
        return slot_pos.sum() + row_chunk.sum() + valid.sum()

    @jit
    def s_pack(ch, o, d, t):
        w = ts.cross_words(ch, o, d, t)
        lists, ov = ts.extract_lists(w, C)
        slot_pos, row_chunk, valid, ok = ts.build_slots(
            n, n_c, lists, C, max_rows)
        slot_ray = jnp.where(valid, slot_pos // C, 0)
        packed = ts._pack_stream(o, d, t, slot_ray, valid, max_rows)
        return packed.sum()

    @jit
    def s_kernel(ch, o, d, t):
        w = ts.cross_words(ch, o, d, t)
        lists, ov = ts.extract_lists(w, C)
        slot_pos, row_chunk, valid, ok = ts.build_slots(
            n, n_c, lists, C, max_rows)
        slot_ray = jnp.where(valid, slot_pos // C, 0)
        packed = ts._pack_stream(o, d, t, slot_ray, valid, max_rows)
        out = ts._run_kernel(
            ts._closest_kernel, ch, row_chunk, packed, max_rows,
            jnp.float32, False)
        return out.sum()

    @jit
    def s_full(ch, o, d, t):
        w = ts.cross_words(ch, o, d, t)
        t_o, p_o, ov, ok = ts.stream_closest_w(
            ch, w, o, d, t, mult=meta.slot_mult_tight, mult_wide=mult)
        return t_o.sum() + p_o.sum()

    timed("cross", s_cross, ch, o_s, d_s, t_s)
    timed("+extract", s_extract, ch, o_s, d_s, t_s)
    timed("+slots", s_slots, ch, o_s, d_s, t_s)
    timed("+pack", s_pack, ch, o_s, d_s, t_s)
    timed("+kernel", s_kernel, ch, o_s, d_s, t_s)
    timed("full(stream_closest_w)", s_full, ch, o_s, d_s, t_s)

    # --- occlusion stream on the same wave shape ---
    skip = jnp.full(n, -2, jnp.int32)

    @jit
    def s_any(ch, o, d, t):
        w = ts.cross_words(ch, o, d, t)
        occ, ov, ok = ts.stream_any_w(
            ch, w, o, d, t, skip,
            mult=max(3, meta.slot_mult_tight - 1),
            mult_wide=max(4, mult - 2))
        return occ.sum()

    timed("stream_any_w", s_any, ch, o_s, d_s, t_s)

    # --- overflow wide pass in isolation (OV_CAP rays at C_WIDE) ---
    o_w = o_s[: ts.OV_CAP]
    d_w = d_s[: ts.OV_CAP]
    t_w = t_s[: ts.OV_CAP]

    @jit
    def s_wide(ch, sp, o, d, t):
        t_o, p_o, b0, b1, ov, ok = ts.stream_closest(
            ch, sp, o, d, t, C=ts.C_WIDE, mult=ts.C_WIDE)
        return t_o.sum()

    timed("wide pass (OV_CAP x C_WIDE)", s_wide, ch, sp, o_w, d_w, t_w)

    @jit
    def s_wide_any(ch, o, d, t):
        occ, ov, ok = ts.stream_any(
            ch, o, d, t, skip[: ts.OV_CAP], C=ts.C_WIDE, mult=ts.C_WIDE)
        return occ.sum()

    timed("wide any (OV_CAP x C_WIDE)", s_wide_any, ch, o_w, d_w, t_w)

    # --- e2e dispatched engines (sorted-call + adaptive cond + wide) ---
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

    # overflow stats of this wave
    @jit
    def ov_count(ch, o, d, t):
        w = ts.cross_words(ch, o, d, t)
        cnt = jax.lax.population_count(w).sum(axis=1)
        return (cnt > C).sum(), cnt.sum(), cnt.max()

    novf, tot, mx = ov_count(ch, o_s, d_s, t_s)
    print(f"  overflow rays: {int(novf)}  pairs: {int(tot)} "
          f"({float(tot)/n:.2f}/ray, max {int(mx)})", flush=True)


def main():
    import jax

    print(f"backend={jax.default_backend()}", flush=True)

    from yuki_tpu.scene.testscenes import colonnade

    scene, cam, _ = colonnade()
    profile_scene("colonnade", scene, cam)

    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
    from bench import load_atrium

    scene_a, cam_a, _ = load_atrium()
    profile_scene("atrium", scene_a, cam_a)


if __name__ == "__main__":
    main()
