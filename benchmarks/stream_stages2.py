"""Stage timing of the v2 chunk-stream pipeline via cumulative prefixes
(differences cancel the ~30 ms dispatch floor): candidates | +sort |
+slots | +pack | +kernel | +merge, on the real 262k primary wave.

    PYTHONPATH=/root/repo:/root/.axon_site nohup python \
        benchmarks/stream_stages2.py > /tmp/stream_stages2.log 2>&1 &
"""

import functools
import time

import numpy as np

N_TILES = 1024
TD = 16


def timed(label, fn, *args):
    import jax

    out = jax.block_until_ready(fn(*args))
    t0 = time.monotonic()
    for _ in range(3):
        out = jax.block_until_ready(fn(*args))
    dt = (time.monotonic() - t0) / 3
    print(f"{label}: {dt*1e3:.1f} ms", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    from yuki_tpu import traverse
    from yuki_tpu.camera import Camera
    from yuki_tpu.scene.testscenes import colonnade
    import yuki_tpu.ops.trace_stream as ts

    scene, cam_params, _ = colonnade()
    data = scene.data
    ch = data.chunks
    sp = data.tris.shading_packed
    print(f"backend={jax.default_backend()} chunks={ch.n_treelets}",
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
    p_film = jnp.asarray(np.stack([px + 0.5, py + 0.5], -1), jnp.float32)
    o, d = camera.ray(p_film)
    t_max = jnp.full(n, traverse.F32_MAX)

    C = ts.C_MAIN
    mult = 6
    n_c = ch.n_treelets
    max_rows = ts._max_rows(n, C, n_c, mult)
    print(f"C={C} max_rows={max_rows}", flush=True)

    def upto_cand(o, d, t):
        lists, ov = ts.candidate_lists(ch, o, d, t, C)
        return lists.sum() + ov.sum()

    def upto_sort(o, d, t):
        lists, _ = ts.candidate_lists(ch, o, d, t, C)
        keys = jnp.where(lists >= 0, lists, n_c).reshape(-1)
        pos = jnp.arange(n * C, dtype=jnp.int32)
        ks, ps = jax.lax.sort((keys, pos), num_keys=1)
        return ks[-1] + ps[-1]

    def upto_slots(o, d, t):
        lists, _ = ts.candidate_lists(ch, o, d, t, C)
        slot_pos, row_chunk, valid, ok = ts.build_slots(
            n, n_c, lists, C, max_rows)
        return slot_pos.sum() + row_chunk.sum()

    def upto_pack(o, d, t):
        lists, _ = ts.candidate_lists(ch, o, d, t, C)
        slot_pos, row_chunk, valid, ok = ts.build_slots(
            n, n_c, lists, C, max_rows)
        slot_ray = jnp.where(valid, slot_pos // C, 0)
        packed = ts._pack_stream(o, d, t, slot_ray, valid, max_rows)
        return packed.sum()

    def upto_kernel(o, d, t):
        lists, _ = ts.candidate_lists(ch, o, d, t, C)
        slot_pos, row_chunk, valid, ok = ts.build_slots(
            n, n_c, lists, C, max_rows)
        slot_ray = jnp.where(valid, slot_pos // C, 0)
        packed = ts._pack_stream(o, d, t, slot_ray, valid, max_rows)
        out = ts._run_kernel(ts._closest_kernel, ch, row_chunk, packed,
                             max_rows, jnp.float32, False)
        return out.sum()

    def full(o, d, t):
        return ts.stream_closest(ch, sp, o, d, t)[0].sum()

    ts_ = []
    ts_.append(timed("1 candidates", jax.jit(upto_cand), o, d, t_max))
    ts_.append(timed("2 +sort", jax.jit(upto_sort), o, d, t_max))
    ts_.append(timed("3 +slots", jax.jit(upto_slots), o, d, t_max))
    ts_.append(timed("4 +pack", jax.jit(upto_pack), o, d, t_max))
    ts_.append(timed("5 +kernel", jax.jit(upto_kernel), o, d, t_max))
    ts_.append(timed("6 full (merge+bary)", jax.jit(full), o, d, t_max))
    names = ["candidates", "sort", "slots", "pack", "kernel", "merge+bary"]
    prev = 0.0
    for nm, t_ in zip(names, ts_):
        print(f"  delta {nm}: {(t_-prev)*1e3:.1f} ms", flush=True)
        prev = t_
    print("done", flush=True)


if __name__ == "__main__":
    main()
