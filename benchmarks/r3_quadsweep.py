"""On-chip sweep: slot-kernel rows-per-grid-step (quad) for closest+any
on real bounce waves.  The round-3 cost model puts the slot kernel at
~26 ms/262k-call vs a ~15 ms VPU-op roofline — the gap is per-step
scheduling + DMA stalls, both amortized by more rows per step.

    PYTHONPATH=/root/repo:/root/repo/benchmarks:/root/.axon_site \
        nohup python benchmarks/r3_quadsweep.py > /tmp/r3_quad.log 2>&1 &
"""

import numpy as np

N = 262144


def run_scene(name, scene, cam_params):
    import jax
    import jax.numpy as jnp

    from _timing import drained
    from yuki_tpu import traverse
    from yuki_tpu.camera import Camera
    from yuki_tpu.ops import trace_stream as ts
    from yuki_tpu.ops.trace_cull import candidate_lists_fused

    data, meta = scene.data, scene.meta
    ch = data.chunks
    camera = Camera.create(cam_params, 1920, 1080)
    rng = np.random.default_rng(3)
    px = rng.integers(0, 1920, N).astype(np.float32) + 0.5
    py = rng.integers(0, 1080, N).astype(np.float32) + 0.5
    o, d = camera.ray(jnp.asarray(np.stack([px, py], -1)))
    tm = jnp.full(N, traverse.F32_MAX)
    hit = jax.jit(lambda data, o, d: traverse.intersect(
        data, meta, o, d, tm))(data, o, d)
    p = o + hit.t[:, None] * d
    h = np.random.default_rng(5).standard_normal((N, 3)).astype(np.float32)
    h /= np.linalg.norm(h, axis=1, keepdims=True)
    d2 = jnp.asarray(h)
    o2 = jnp.where(hit.hit[:, None], p + 1e-3 * d2,
                   0.5 * (data.world_lo + data.world_hi))
    t2 = jnp.where(hit.hit, traverse.F32_MAX, 0.0)
    skip = jnp.full(N, -1, jnp.int32)

    print(f"== {name}: chunks={ch.n_treelets} leaf={ch.leaf_size}",
          flush=True)

    lists, ov = jax.jit(
        lambda o, d, tm: candidate_lists_fused(ch, o, d, tm, ts.C_MAIN)
    )(o2, d2, t2)

    ref = {}
    for q in (2, 4, 8):
        @jax.jit
        def closest(lists, ov, o, d, tm, q=q):
            t, p, ovr, ok = ts.stream_closest_l(
                ch, lists, ov, o, d, tm, mult=meta.slot_mult_tight,
                mult_wide=meta.slot_mult, quad=q)
            return t, p

        @jax.jit
        def anyh(lists, ov, o, d, tm, skip, q=q):
            occ, ovr, ok = ts.stream_any_l(
                ch, lists, ov, o, d, tm, skip,
                mult=meta.slot_mult_tight, mult_wide=meta.slot_mult,
                quad=q)
            return occ

        drained(f"closest q={q}", closest, lists, ov, o2, d2, t2)
        drained(f"any     q={q}", anyh, lists, ov, o2, d2, t2, skip)
        t, p = closest(lists, ov, o2, d2, t2)
        occ = anyh(lists, ov, o2, d2, t2, skip)
        ref[q] = (np.asarray(t), np.asarray(p), np.asarray(occ))

    same = all(
        np.array_equal(ref[q][i], ref[4][i])
        for q in (2, 8) for i in range(3)
    )
    print(f"  parity across quads: {same}", flush=True)

    # e2e production paths (current defaults) for the cost model.
    @jax.jit
    def e2e_c(o, d, tm):
        h = traverse.intersect(data, meta, o, d, tm, skip_sort=True)
        return h.t.sum()

    @jax.jit
    def e2e_a(o, d, tm, skip):
        return traverse.any_intersect(
            data, meta, o, d, tm, skip, skip_sort=True).sum()

    drained("e2e intersect (skip_sort)", e2e_c, o2, d2, t2)
    drained("e2e any (skip_sort)", e2e_a, o2, d2, t2, skip)


def main():
    import jax

    print(f"backend={jax.default_backend()}", flush=True)
    from yuki_tpu.scene.testscenes import colonnade

    scene, cam, _ = colonnade()
    run_scene("colonnade", scene, cam)

    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import load_atrium

    scene_a, cam_a, _ = load_atrium()
    run_scene("atrium", scene_a, cam_a)
    print("done", flush=True)


if __name__ == "__main__":
    main()
