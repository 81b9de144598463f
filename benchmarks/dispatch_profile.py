"""Time the per-ray dispatch traversal vs the round-1 pair-list walk on
the colonnade, with axon-proof methodology: reps are data-dependency
chained inside ONE jitted scan and timed around a single host readback
(block_until_ready does not actually block under the remote executor —
measured a "28000 TFLOP/s matmul" without it).

    PYTHONPATH=/root/repo:/root/.axon_site nohup python \
        benchmarks/dispatch_profile.py > /tmp/dispatch_profile.log 2>&1 &
"""

import functools
import time

import numpy as np


def make_waves(scene, cam_params, n=65536):
    import jax.numpy as jnp
    from yuki_tpu.camera import Camera

    camera = Camera.create(cam_params, 1920, 1080)
    tiles, td = 256, 16
    tx = (np.arange(tiles) % 32) * td
    ty = (np.arange(tiles) // 32) * td
    px = tx[:, None, None] + np.arange(td)[None, :, None] + 0.5
    py = ty[:, None, None] + np.arange(td)[None, None, :] + 0.5
    p_film = jnp.asarray(
        np.stack([np.broadcast_to(px, (tiles, td, td)).reshape(-1),
                  np.broadcast_to(py, (tiles, td, td)).reshape(-1)], -1),
        jnp.float32)
    o_p, d_p = camera.ray(p_film)

    rng = np.random.default_rng(7)
    p0 = np.asarray(scene.data.tris.p0)
    p1 = np.asarray(scene.data.tris.p1)
    p2 = np.asarray(scene.data.tris.p2)
    ids = rng.integers(0, p0.shape[0], n)
    u = rng.random((n, 1)).astype(np.float32)
    v = (rng.random((n, 1)) * (1 - u)).astype(np.float32)
    orig = p0[ids] + u * (p1[ids] - p0[ids]) + v * (p2[ids] - p0[ids])
    nrm = np.cross(p1[ids] - p0[ids], p2[ids] - p0[ids])
    nrm /= np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-12)
    dirs = rng.standard_normal((n, 3)).astype(np.float32)
    dirs /= np.maximum(np.linalg.norm(dirs, axis=1, keepdims=True), 1e-12)
    flip = (dirs * nrm).sum(1, keepdims=True) < 0
    dirs = np.where(flip, -dirs, dirs).astype(np.float32)
    orig = (orig + 1e-3 * nrm).astype(np.float32)
    return (o_p, d_p), (jnp.asarray(orig), jnp.asarray(dirs))


def chain_time(fn, o, d, tm, reps=10, label=""):
    """fn(o,d,tm) -> scalar f32. Chains reps through o, one readback."""
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("k",))
    def run(o, d, tm, k):
        def body(carry, _):
            s = fn(carry, d, tm)
            return carry + 0.0 * s, s
        end, ss = jax.lax.scan(body, o, None, length=k)
        return ss.sum()

    float(run(o, d, tm, 1))  # compile both lengths
    float(run(o, d, tm, reps))
    t0 = time.monotonic()
    a = float(run(o, d, tm, 1))
    t1 = time.monotonic()
    b = float(run(o, d, tm, reps))
    t2 = time.monotonic()
    per = ((t2 - t1) - (t1 - t0)) / (reps - 1)
    print(f"{label}: {per*1e3:.2f} ms/rep "
          f"(1-rep wall {1e3*(t1-t0):.0f} ms, {reps}-rep wall "
          f"{1e3*(t2-t1):.0f} ms)", flush=True)
    return per


def main():
    import jax
    import jax.numpy as jnp

    from yuki_tpu.scene.testscenes import colonnade
    from trace_dispatch import (
        dispatch_closest, dispatch_any, ray_candidate_tiles)
    from yuki_tpu.ops.trace_pairs import pairs_closest

    scene, cam_params, _ = colonnade()
    tl = scene.data.treelets
    print(f"backend={jax.default_backend()} tris={scene.data.tris.p0.shape[0]} "
          f"treelets={tl.n_treelets}", flush=True)

    (o_p, d_p), (o_b, d_b) = make_waves(scene, cam_params)
    tm = jnp.full(o_p.shape[0], 3.4e38, jnp.float32)

    for name, o, d in [("primary", o_p, d_p), ("bounce", o_b, d_b)]:
        nt = int(ray_candidate_tiles(tl, o, d, tm, 8192)[2])
        print(f"[{name}] n_tiles={nt}", flush=True)

        chain_time(
            lambda o, d, tm: ray_candidate_tiles(tl, o, d, tm, 8192)[1].sum()
            .astype(jnp.float32),
            o, d, tm, label=f"[{name}] cull+compact only")

        chain_time(
            lambda o, d, tm: dispatch_closest(tl, o, d, tm)[0].sum(),
            o, d, tm, label=f"[{name}] dispatch_closest")

        chain_time(
            lambda o, d, tm: dispatch_any(
                tl, o, d, tm * 0 + 100.0,
                jnp.full(o.shape[0], -2, jnp.int32))[0].sum()
            .astype(jnp.float32),
            o, d, tm, label=f"[{name}] dispatch_any")

        chain_time(
            lambda o, d, tm: pairs_closest(tl, o, d, tm)[0].sum(),
            o, d, tm, reps=4, label=f"[{name}] pairs_closest (round 1)")

    print("done", flush=True)


if __name__ == "__main__":
    main()
