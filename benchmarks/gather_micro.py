"""Micro-bench the exact gather/scatter/cumsum/sort shapes the stream
build uses, including in-bounds promises and row-vs-scalar gathers, to
find which lowerings are fast on this chip.  Uses forced materialization
(donate + block) per rep to dodge async-dispatch mismeasurement.

    PYTHONPATH=/root/repo:/root/.axon_site nohup python \
        benchmarks/gather_micro.py > /tmp/gather_micro.log 2>&1 &
"""

import time

import numpy as np


def timed(label, fn, *args, reps=5):
    import jax

    out = jax.block_until_ready(fn(*args))
    t0 = time.monotonic()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    dt = (time.monotonic() - t0) / reps
    print(f"{label}: {dt*1e3:.2f} ms", flush=True)
    return out


def main():
    import jax
    import jax.numpy as jnp

    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)

    # --- gathers -----------------------------------------------------
    n_small = 262144
    tab8 = jnp.asarray(rng.random((n_small, 8), np.float32))
    tab128 = jnp.asarray(rng.random((n_small // 16, 128), np.float32))
    tab1d = jnp.asarray(rng.random(n_small, np.float32))
    tiny = jnp.asarray(rng.random((2944, 8), np.float32))
    tiny768 = jnp.asarray(rng.random((51, 768), np.float32))

    for m in (3_500_000,):
        idx = jnp.asarray(rng.integers(0, n_small, m), jnp.int32)
        idx_t = jnp.asarray(rng.integers(0, 2944, m), jnp.int32)
        idx_s = jnp.asarray(rng.integers(0, 51, m // 3), jnp.int32)
        timed(f"rowgather [{m}x8 from {n_small}x8]",
              jax.jit(lambda i: tab8[i].sum()), idx)
        timed(f"rowgather clip [{m}x8]",
              jax.jit(lambda i: jnp.take(tab8, i, axis=0, mode="clip").sum()),
              idx)
        timed(f"rowgather promise [{m}x8]",
              jax.jit(lambda i: tab8.at[i].get(
                  mode="promise_in_bounds").sum()), idx)
        timed(f"rowgather sorted-promise [{m}x8]",
              jax.jit(lambda i: tab8.at[jnp.sort(i)].get(
                  mode="promise_in_bounds",
                  indices_are_sorted=True).sum()), idx)
        timed(f"1dgather [{m} from {n_small}]",
              jax.jit(lambda i: tab1d[i].sum()), idx)
        timed(f"1dgather promise [{m}]",
              jax.jit(lambda i: tab1d.at[i].get(
                  mode="promise_in_bounds").sum()), idx)
        flat8 = tab8.reshape(-1)
        timed(f"flat 1d gather x8 cols [{m}]",
              jax.jit(lambda i: sum(
                  flat8.at[i * 8 + c].get(mode="promise_in_bounds").sum()
                  for c in range(8))), idx)
        timed(f"rowgather tiny [{m}x8 from 2944x8]",
              jax.jit(lambda i: tiny[i].sum()), idx_t)
        timed(f"rowgather128 [{m//16}x128 from 16k x128]",
              jax.jit(lambda i: tab128[i].sum()),
              jnp.asarray(rng.integers(0, n_small // 16, m // 16), jnp.int32))
        timed(f"rowgather superbounds [{m//3}x768 from 51x768]",
              jax.jit(lambda i: tiny768[i].sum()), idx_s)

    # --- scatters ----------------------------------------------------
    m = 3_500_000
    vals = jnp.asarray(rng.random(m, np.float32))
    sidx = jnp.asarray(rng.integers(0, n_small, m), jnp.int32)
    timed("scatter-min [3.5M into 262k]",
          jax.jit(lambda v, i: jnp.full(n_small, 1e30).at[i].min(v).sum()),
          vals, sidx)
    timed("scatter-set drop [3.5M into 3.5M]",
          jax.jit(lambda v, i: jnp.zeros(m, jnp.float32).at[i * 13 % m].set(
              v, mode="drop").sum()),
          vals, sidx)
    uidx = jnp.asarray(rng.permutation(m).astype(np.int32))
    timed("scatter-set unique [3.5M into 3.5M]",
          jax.jit(lambda v, i: jnp.zeros(m, jnp.float32).at[i].set(
              v, mode="drop", unique_indices=True).sum()),
          vals, uidx)

    # --- cumsum / sort / searchsorted --------------------------------
    big = jnp.asarray(rng.integers(0, 2, 13_000_000).astype(np.int32))
    timed("cumsum i32 [13M]", jax.jit(lambda x: jnp.cumsum(x)[-1]), big)
    big2 = jnp.asarray(rng.integers(0, 2, 100_000_000).astype(np.int32))
    timed("cumsum i32 [100M]", jax.jit(lambda x: jnp.cumsum(x)[-1]), big2)
    keys = jnp.asarray(rng.integers(0, 2944, 3_150_000), jnp.int32)
    pay = jnp.asarray(rng.integers(0, n_small, 3_150_000), jnp.int32)
    timed("sort 3.15M key+payload",
          jax.jit(lambda k, p: jax.lax.sort((k, p), num_keys=1,
                                            is_stable=True)[0][-1]),
          keys, pay)
    timed("sort 3.15M key only",
          jax.jit(lambda k: jax.lax.sort((k,), num_keys=1)[0][-1]), keys)
    skeys = jnp.sort(keys)
    timed("searchsorted 2945 queries in 3.15M",
          jax.jit(lambda s: jnp.searchsorted(
              s, jnp.arange(2945, dtype=jnp.int32)).sum()), skeys)
    timed("searchsorted 27k queries in 2945",
          jax.jit(lambda s: jnp.searchsorted(
              jnp.arange(2945, dtype=jnp.int32) * 7,
              jnp.arange(27520, dtype=jnp.int32)).sum()), skeys)
    tk = jnp.asarray(rng.integers(0, 2944, 3_150_000), jnp.int32)
    seg = jnp.asarray(np.sort(rng.integers(0, 3_150_000, 2945)), jnp.int32)
    timed("1dgather small-table [3.15M from 2945]",
          jax.jit(lambda t: seg[t].sum()), tk)
    timed("1dgather small promise [3.15M from 2945]",
          jax.jit(lambda t: jnp.take(seg, t,
                                     mode="promise_in_bounds").sum()), tk)
    # one-hot matmul alternative for small-table gathers: rows of seg8
    seg8 = jnp.asarray(rng.random((2945, 8), np.float32))
    def onehot_gather(t):
        oh = jax.nn.one_hot(t, 2945, dtype=jnp.bfloat16)  # [3.15M, 2945]
        return (oh @ seg8.astype(jnp.bfloat16)).sum()
    timed("onehot-matmul rowgather [3.15M x 2945 x 8]",
          jax.jit(onehot_gather), tk)
    print("done", flush=True)


if __name__ == "__main__":
    main()
