"""How does the (sorted) pair-list traversal scale with wave size?

Round-2 hypothesis: divergent-ray block coherence is a function of ray
DENSITY, not just sorting — at 65k rays over a 32^3 cell grid each
1024-ray block spans ~500 cells (union ~ the whole treelet table), while
at 2M rays a block spans ~16 adjacent Morton cells.  If true, full-frame
waves fix the bounce-wave 7.5x cull amplification without any kernel
change, and the renderer should dispatch frame-sized waves.

    PYTHONPATH=/root/repo:/root/.axon_site nohup python \
        benchmarks/pairs_scaling.py > /tmp/pairs_scaling.log 2>&1 &
"""

import functools
import time

import numpy as np


def make_bounce(scene, n, seed=7):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
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
    return jnp.asarray(orig), jnp.asarray(dirs)


def chain_time(fn, o, d, tm, reps=4, label=""):
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("k",))
    def run(o, d, tm, k):
        def body(carry, _):
            s = fn(carry, d, tm)
            return carry + 0.0 * s, s

        end, ss = jax.lax.scan(body, o, None, length=k)
        return ss.sum()

    float(run(o, d, tm, 1))
    float(run(o, d, tm, reps))
    t0 = time.monotonic()
    float(run(o, d, tm, 1))
    t1 = time.monotonic()
    float(run(o, d, tm, reps))
    t2 = time.monotonic()
    per = ((t2 - t1) - (t1 - t0)) / (reps - 1)
    print(f"{label}: {per*1e3:.2f} ms/rep", flush=True)
    return per


def main():
    import jax
    import jax.numpy as jnp

    from yuki_tpu.scene.testscenes import colonnade
    from yuki_tpu import traverse
    from yuki_tpu.ops.trace_pairs import (
        block_candidate_pairs, pairs_closest, pairs_any, CHUNK, MAX_CHUNKS,
    )

    scene, cam_params, _ = colonnade()
    tl = scene.data.treelets
    sd = scene.data
    print(
        f"backend={jax.default_backend()} tris={sd.tris.p0.shape[0]} "
        f"treelets={tl.n_treelets} capacity={CHUNK * MAX_CHUNKS}",
        flush=True,
    )

    @jax.jit
    def sort_rays(o, d, tm):
        order = jnp.argsort(traverse.ray_sort_key(sd, o, d))
        return o[order], d[order], tm[order]

    for n in (65536, 262144, 1048576, 2097152):
        o, d = make_bounce(scene, n)
        tm = jnp.full(n, 3.4e38, jnp.float32)
        o_s, d_s, t_s = jax.block_until_ready(sort_rays(o, d, tm))

        n_pairs = int(
            jax.jit(lambda o, d, t: block_candidate_pairs(
                tl, o, d, t, CHUNK * MAX_CHUNKS)[2])(o_s, d_s, t_s)
        )
        n_blocks = (n + 1023) // 1024
        print(
            f"[n={n}] sorted bounce pairs={n_pairs} "
            f"({n_pairs / n_blocks:.1f}/block, cap "
            f"{'OVERFLOW' if n_pairs > CHUNK * MAX_CHUNKS else 'ok'})",
            flush=True,
        )

        chain_time(
            lambda o, d, t: sort_rays(o, d, t)[0].sum(),
            o, d, tm, label=f"[n={n}] sort only")
        chain_time(
            lambda o, d, t: pairs_closest(tl, o, d, t)[0].sum(),
            o_s, d_s, t_s, label=f"[n={n}] pairs_closest sorted")
        chain_time(
            lambda o, d, t: pairs_any(
                tl, o, d, t * 0 + 100.0,
                jnp.full(o.shape[0], -2, jnp.int32))[0].sum()
            .astype(jnp.float32),
            o_s, d_s, t_s, label=f"[n={n}] pairs_any sorted")

    print("done", flush=True)


if __name__ == "__main__":
    main()
