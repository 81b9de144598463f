"""Two-level exact cull vs flat dense cross, on real sorted bounce waves.

The flat cross is O(rays x chunks) — the atrium scaling wall (VERDICT r2
weak #2): W=123 words/ray at 347k tris.  cross_compact does W word-box
tests + 32 tests per crossed word (measured mean 6.6-11.9, max 21 ->
258-500 tests/ray vs the flat 1454-3935).  This script times the
candidate stage and the full divergent slot call both ways, plus the 2l
overflow incidence (overflow rays re-run through the wide pass, so their
rate bounds the hidden extra cost).

    PYTHONPATH=/root/repo:/root/.axon_site nohup python \
        benchmarks/r3_cull2l.py > /tmp/r3_cull2l.log 2>&1 &
"""

import time

import numpy as np

from r3_cross_sweep import bounce_wave, timed  # noqa: E402


def run(name, scene, cam_params):
    import jax
    import jax.numpy as jnp
    from yuki_tpu.ops import trace_stream as ts

    meta = scene.meta
    ch = scene.data.chunks
    print(f"== {name}: chunks={ch.n_treelets} "
          f"W={-(-ch.n_treelets // 32)} ==", flush=True)
    o, d, tm = bounce_wave(scene, cam_params)
    n = o.shape[0]
    alive = int(jax.device_get((tm > 0).sum()))
    print(f"  wave n={n} alive={alive}", flush=True)
    C = ts.C_MAIN

    # Candidate stage: flat (pallas cross + extract) vs 2l.
    flat = jax.jit(lambda ch, o, d, t: ts.extract_lists(
        ts.cross_words(ch, o, d, t), C))
    two = jax.jit(lambda ch, o, d, t: ts.candidate_lists_2l(ch, o, d, t, C))
    cross_only = jax.jit(lambda ch, o, d, t: ts.cross_words(ch, o, d, t))
    compact_only = jax.jit(
        lambda ch, o, d, t: ts.cross_compact(ch, o, d, t))
    timed("cross (pallas) only   ", cross_only, ch, o, d, tm)
    timed("cross_compact only    ", compact_only, ch, o, d, tm)
    timed("flat cands (cross+ext)", flat, ch, o, d, tm)
    timed("2l   cands            ", two, ch, o, d, tm)

    lists_f, ov_f = jax.device_get(flat(ch, o, d, tm))
    lists_2, ov_2 = jax.device_get(two(ch, o, d, tm))
    match = np.array_equal(lists_f[~ov_2], lists_2[~ov_2])
    print(f"  ov flat={ov_f.sum()} 2l={ov_2.sum()} "
          f"(cap {ts.OV_CAP}); non-ov lists match: {match}", flush=True)

    # Full divergent slot call, production mults.
    cl_flat = jax.jit(lambda ch, o, d, t: ts.stream_closest_w(
        ch, ts.cross_words(ch, o, d, t), o, d, t,
        mult=meta.slot_mult_tight, mult_wide=meta.slot_mult))
    def _cl2(ch, o, d, t):
        lists, ov = ts.candidate_lists_2l(ch, o, d, t, C)
        return ts.stream_closest_l(ch, lists, ov, o, d, t,
                                   mult=meta.slot_mult_tight,
                                   mult_wide=meta.slot_mult)
    cl_two = jax.jit(_cl2)
    timed("closest flat          ", cl_flat, ch, o, d, tm)
    timed("closest 2l            ", cl_two, ch, o, d, tm)

    skip = jnp.full(n, -2, jnp.int32)
    am, aw = max(3, meta.slot_mult_tight - 1), max(4, meta.slot_mult - 2)
    any_flat = jax.jit(lambda ch, o, d, t, s: ts.stream_any_w(
        ch, ts.cross_words(ch, o, d, t), o, d, t, s, mult=am,
        mult_wide=aw))
    def _an2(ch, o, d, t, s):
        lists, ov = ts.candidate_lists_2l(ch, o, d, t, C)
        return ts.stream_any_l(ch, lists, ov, o, d, t, s, mult=am,
                               mult_wide=aw)
    any_two = jax.jit(_an2)
    timed("any flat              ", any_flat, ch, o, d, tm, skip)
    timed("any 2l                ", any_two, ch, o, d, tm, skip)


def main():
    import sys

    from yuki_tpu.scene.testscenes import colonnade

    scene, cam, _ = colonnade()
    run("colonnade", scene, cam)

    sys.path.insert(0, "/root/repo")
    from bench import load_atrium

    scene_a, cam_a, _ = load_atrium()
    run("atrium", scene_a, cam_a)


if __name__ == "__main__":
    main()
