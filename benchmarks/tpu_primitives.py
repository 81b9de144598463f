"""Microbenchmark TPU rates for the primitives a per-ray dispatch
traversal needs: gather, scatter-set/min/add, lax.sort, big cumsum.

Run on the real chip (background):
    nohup python benchmarks/tpu_primitives.py > /tmp/prim_bench.log 2>&1 &

These rates decide the round-2 traversal architecture (ARCHITECTURE.md
"Measured colonnade cost model"): the candidate designs compact per-ray
(ray, treelet) pair lists with cumsum+scatter, gather ray planes per pair,
and scatter-min results back by ray id.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=5):
    """Each rep runs on a genuinely different first argument (materialized
    on device up front) so a result-caching executor can't dedupe reps."""
    variants = jax.jit(
        lambda x: [x + jnp.asarray(k, x.dtype) for k in range(reps)]
    )(args[0])
    jax.block_until_ready(variants)
    jax.block_until_ready(fn(*args))  # compile
    t0 = time.monotonic()
    outs = [fn(v, *args[1:]) for v in variants]
    jax.block_until_ready(outs)
    return (time.monotonic() - t0) / reps


def main():
    key = jax.random.PRNGKey(0)
    print(f"backend: {jax.default_backend()}", flush=True)

    # Gather: [P] rows of 8 f32 from an [N, 8] table.
    for n, p in [(65536, 655360), (65536, 2097152), (262144, 2097152)]:
        table = jax.random.normal(key, (n, 8), jnp.float32)
        idx = jax.random.randint(key, (p,), 0, n, jnp.int32)
        f = jax.jit(lambda t, i: t[i])
        dt = timeit(f, table, idx)
        print(f"gather rows [{p}x8 from {n}x8]: {dt*1e3:.2f} ms "
              f"({p*8/dt/1e9:.2f} G elem/s)", flush=True)

    # Gather 1D: [P] elems from [N] plane (7 planes would run 7x).
    for n, p in [(65536, 2097152)]:
        plane = jax.random.normal(key, (n,), jnp.float32)
        idx = jax.random.randint(key, (p,), 0, n, jnp.int32)
        f = jax.jit(lambda t, i: t[i])
        dt = timeit(f, plane, idx)
        print(f"gather 1d [{p} from {n}]: {dt*1e3:.2f} ms "
              f"({p/dt/1e9:.2f} G elem/s)", flush=True)

    # Scatter-set: compaction pattern (unique targets, mode=drop).
    for m, p in [(4194304, 4194304), (134217728, 134217728)]:
        src = jnp.arange(p, dtype=jnp.int32)
        tgt = jax.random.permutation(key, p)[:p].astype(jnp.int32)
        out0 = jnp.zeros(m, jnp.int32)
        f = jax.jit(lambda o, t, s: o.at[t].set(s, mode="drop"))
        dt = timeit(f, out0, tgt, src)
        print(f"scatter-set [{p} into {m}]: {dt*1e3:.2f} ms "
              f"({p/dt/1e9:.2f} G upd/s)", flush=True)

    # Scatter-min: combine pattern ([P] into [N] by ray id, duplicates).
    for n, p in [(65536, 2097152)]:
        vals = jax.random.normal(key, (p,), jnp.float32)
        idx = jax.random.randint(key, (p,), 0, n, jnp.int32)
        out0 = jnp.full(n, 1e30, jnp.float32)
        f = jax.jit(lambda o, i, v: o.at[i].min(v))
        dt = timeit(f, out0, idx, vals)
        print(f"scatter-min [{p} into {n}]: {dt*1e3:.2f} ms "
              f"({p/dt/1e9:.2f} G upd/s)", flush=True)

    # Scatter-add histogram: per-treelet counts.
    for t, p in [(2048, 1048576)]:
        idx = jax.random.randint(key, (p,), 0, t, jnp.int32)
        out0 = jnp.zeros(t, jnp.int32)
        f = jax.jit(lambda o, i: o.at[i].add(1))
        dt = timeit(f, out0, idx)
        print(f"scatter-add [{p} into {t}]: {dt*1e3:.2f} ms "
              f"({p/dt/1e9:.2f} G upd/s)", flush=True)

    # Sort by key with 1 payload.
    for p in [1048576, 4194304]:
        keys = jax.random.randint(key, (p,), 0, 2048, jnp.int32)
        vals = jnp.arange(p, dtype=jnp.int32)
        f = jax.jit(lambda k, v: jax.lax.sort((k, v), num_keys=1))
        dt = timeit(f, keys, vals)
        print(f"sort i32 key+1 payload [{p}]: {dt*1e3:.2f} ms", flush=True)

    # Sort with 8 f32 payloads (carry ray planes through the sort).
    for p in [1048576]:
        keys = jax.random.randint(key, (p,), 0, 2048, jnp.int32)
        pays = [jax.random.normal(key, (p,), jnp.float32) for _ in range(8)]
        f = jax.jit(lambda k, *v: jax.lax.sort((k, *v), num_keys=1))
        dt = timeit(f, keys, *pays)
        print(f"sort i32 key+8 payloads [{p}]: {dt*1e3:.2f} ms", flush=True)

    # argsort (what _sorted_call uses today on 65k rays).
    for p in [65536]:
        keys = jax.random.randint(key, (p,), 0, 1 << 18, jnp.int32)
        f = jax.jit(lambda k: jnp.argsort(k))
        dt = timeit(f, keys)
        print(f"argsort [{p}]: {dt*1e3:.2f} ms", flush=True)

    # Big cumsum (flat compaction over [T*N]).
    for p in [4194304, 134217728]:
        x = jnp.ones(p, jnp.int32)
        f = jax.jit(jnp.cumsum)
        dt = timeit(f, x)
        print(f"cumsum i32 [{p}]: {dt*1e3:.2f} ms", flush=True)

    # 2D cumsum along lanes ([T, N] rank-within-row).
    t, n = 2048, 65536
    x = (jax.random.normal(key, (t, n)) > 0).astype(jnp.int32)
    f = jax.jit(lambda a: jnp.cumsum(a, axis=1))
    dt = timeit(f, x)
    print(f"cumsum i32 [{t},{n}] axis=1: {dt*1e3:.2f} ms", flush=True)

    # Dense slab-test matrix [T, N] (the exact per-ray cull).
    t, n = 2048, 65536
    tb = jax.random.normal(key, (t, 8), jnp.float32)
    o = jax.random.normal(key, (n, 3), jnp.float32)
    d = jax.random.normal(key, (n, 3), jnp.float32)
    tm = jnp.full((n,), 1e30, jnp.float32)

    def cull(tb, o, d, tm):
        inv = 1.0 / d
        lo = tb[:, 0:3]
        hi = tb[:, 3:6]
        t0 = (lo[:, None, :] - o[None, :, :]) * inv[None, :, :]
        t1 = (hi[:, None, :] - o[None, :, :]) * inv[None, :, :]
        tmin = jnp.minimum(t0, t1).max(axis=-1)
        tmax = jnp.maximum(t0, t1).min(axis=-1)
        return jnp.maximum(tmin, 0.0) <= jnp.minimum(tmax, tm[None, :])

    f = jax.jit(cull)
    dt = timeit(f, tb, o, d, tm)
    print(f"slab cull [{t}x{n}]: {dt*1e3:.2f} ms "
          f"({t*n/dt/1e9:.2f} G tests/s)", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
