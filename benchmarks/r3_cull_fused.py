"""On-chip: fused cull kernel vs the XLA 2L build, bounce-wave shapes.

    PYTHONPATH=/root/repo:/root/repo/benchmarks:/root/.axon_site \
        nohup python benchmarks/r3_cull_fused.py > /tmp/r3_cull.log 2>&1 &
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
    # Make a bounce-like wave: reflect at the first hit with a hash dir.
    hit = jax.jit(lambda data, o, d: traverse.intersect(
        data, meta, o, d, tm))(data, o, d)
    p = o + hit.t[:, None] * d
    h = np.random.default_rng(5).standard_normal((N, 3)).astype(np.float32)
    h /= np.linalg.norm(h, axis=1, keepdims=True)
    d2 = jnp.asarray(h)
    o2 = jnp.where(hit.hit[:, None], p + 1e-3 * d2,
                   0.5 * (data.world_lo + data.world_hi))
    t2 = jnp.where(hit.hit, traverse.F32_MAX, 0.0)
    order = jnp.argsort(traverse.ray_sort_key(data, o2, d2))
    o2, d2, t2 = o2[order], d2[order], t2[order]

    print(f"== {name}: chunks={ch.n_treelets} "
          f"W={-(-ch.n_treelets // 32)}", flush=True)

    @jax.jit
    def xla_2l(o, d, tm):
        lists, ov = ts.candidate_lists_2l(ch, o, d, tm, ts.C_MAIN)
        return lists.sum(), ov.sum()

    drained("xla 2L cross+extract", xla_2l, o2, d2, t2)

    for g in (1, 2, 4, 8):
        fn = jax.jit(lambda o, d, tm, g=g: candidate_lists_fused(
            ch, o, d, tm, ts.C_MAIN, group=g))

        def s(o, d, tm, fn=fn):
            lists, ov = fn(o, d, tm)
            return lists.sum(), ov.sum()

        drained(f"fused g={g}", jax.jit(s), o2, d2, t2)

    # Parity on-chip (not just interpret).
    import jax as _j
    l_ref, ov_ref = _j.jit(
        lambda o, d, tm: ts.candidate_lists_2l(ch, o, d, tm, ts.C_MAIN)
    )(o2, d2, t2)
    l_f, ov_f = _j.jit(
        lambda o, d, tm: candidate_lists_fused(ch, o, d, tm, ts.C_MAIN)
    )(o2, d2, t2)
    ok_mask = ~np.asarray(ov_ref)
    same = np.array_equal(np.asarray(l_f)[ok_mask],
                          np.asarray(l_ref)[ok_mask])
    same_ov = np.array_equal(np.asarray(ov_f), np.asarray(ov_ref))
    print(f"  parity: lists={same} ov={same_ov} "
          f"n_ov={int(np.asarray(ov_ref).sum())}", flush=True)


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
