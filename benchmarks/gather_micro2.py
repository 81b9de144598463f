"""Round 2 of irregular-op micro-benches: which formulations dodge the
~15 ns/elem scalar path?

    PYTHONPATH=/root/repo:/root/.axon_site nohup python \
        benchmarks/gather_micro2.py > /tmp/gather_micro2.log 2>&1 &
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

    # --- cumsum formulations ----------------------------------------
    n = 13_000_000
    x = jnp.asarray(rng.integers(0, 2, n).astype(np.int32))

    def cumsum_hier(x):
        r = x.reshape(-1, 128)  # [101562+, 128]
        s1 = jnp.cumsum(r, axis=1)
        tots = s1[:, -1]
        r2 = tots.reshape(-1, 128)
        s2 = jnp.cumsum(r2, axis=1)
        tots2 = s2[:, -1]
        base2 = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                 jnp.cumsum(tots2)[:-1]])
        base1 = (base2[:, None] + jnp.concatenate(
            [jnp.zeros((r2.shape[0], 1), jnp.int32), s2[:, :-1]], axis=1)
        ).reshape(-1)
        return (s1 + base1[:, None]).reshape(-1)

    pad = (-n) % (128 * 128)
    xp = jnp.concatenate([x, jnp.zeros(pad, jnp.int32)])
    timed("cumsum flat jnp [13M]", jax.jit(lambda x: jnp.cumsum(x)[-1]), x)
    timed("cumsum hier 128x128 [13M]",
          jax.jit(lambda x: cumsum_hier(x)[-1]), xp)
    timed("cumsum axis1 [101k,128]",
          jax.jit(lambda x: jnp.cumsum(x.reshape(-1, 128), axis=1)[-1, -1]),
          xp)
    timed("cumsum axis0 [128,101k]",
          jax.jit(lambda x: jnp.cumsum(x.reshape(128, -1), axis=0)[-1, -1]),
          xp)

    # --- scatter flags (compaction pattern: monotone unique targets) --
    m = 3_500_000
    vals = jnp.asarray(rng.random(m, np.float32))
    mono = jnp.asarray(np.sort(rng.choice(4 * m, m, replace=False))
                       .astype(np.int32))
    timed("scatter-set plain [3.5M mono into 14M]",
          jax.jit(lambda v, i: jnp.zeros(4 * m, jnp.float32).at[i].set(
              v, mode="drop").sum()), vals, mono)
    timed("scatter-set sorted+unique [3.5M mono into 14M]",
          jax.jit(lambda v, i: jnp.zeros(4 * m, jnp.float32).at[i].set(
              v, mode="drop", indices_are_sorted=True,
              unique_indices=True).sum()), vals, mono)

    # --- gather flags / shapes ---------------------------------------
    n_small = 262144
    tab1d = jnp.asarray(rng.random(n_small, np.float32))
    idx = jnp.asarray(rng.integers(0, n_small, m), jnp.int32)
    idx2d = idx[: (m // 128) * 128].reshape(-1, 128)
    timed("1dgather 2d-idx [27k x 128]",
          jax.jit(lambda i: tab1d[i].sum()), idx2d)
    sidx = jnp.sort(idx)
    timed("1dgather sorted+promise [3.5M]",
          jax.jit(lambda i: tab1d.at[i].get(
              mode="promise_in_bounds", indices_are_sorted=True).sum()),
          sidx)
    # dynamic-slice chain alternative: gather 128-element aligned chunks
    tab2d = jnp.asarray(rng.random((n_small // 128, 128), np.float32))
    cidx = jnp.asarray(rng.integers(0, n_small // 128, 27000), jnp.int32)
    timed("rowgather [27k x128 rows from 2k x128] promise",
          jax.jit(lambda i: tab2d.at[i].get(
              mode="promise_in_bounds").sum()), cidx)

    # --- one_hot matmul gather for small tables ----------------------
    seg8 = jnp.asarray(rng.random((2945, 8), np.float32))
    tk = jnp.asarray(rng.integers(0, 2944, 3_150_000), jnp.int32)

    def onehot_chunk(t):
        # [3.15M] -> chunks of 512k to bound the one-hot working set;
        # bf16 one-hot @ f32 table (precise enough for i32-valued data?
        # here just timing).
        def body(c, acc):
            tc = jax.lax.dynamic_slice(t, (c * 524288,), (524288,))
            oh = jax.nn.one_hot(tc, 2945, dtype=jnp.bfloat16)
            g = oh @ seg8.astype(jnp.bfloat16)
            return acc + g.sum().astype(jnp.float32)

        return jax.lax.fori_loop(0, 6, body, 0.0)

    timed("onehot-matmul rowgather [3.15M x 2945 x 8]",
          jax.jit(onehot_chunk), tk)

    # iota-compare broadcast gather (small table, dense compare):
    # out[i] = sum_t (t == tk[i]) * seg[t]  via [chunk, T] compare + matvec
    seg = jnp.asarray(rng.integers(0, 3_150_000, 2945), jnp.int32)

    def cmp_gather(t):
        def body(c, acc):
            tc = jax.lax.dynamic_slice(t, (c * 524288,), (524288,))
            eq = tc[:, None] == jnp.arange(2945, dtype=jnp.int32)[None, :]
            g = jnp.where(eq, seg[None, :], 0).sum(axis=1)
            return acc + g.sum()

        return jax.lax.fori_loop(0, 6, body, jnp.int32(0))

    timed("iota-compare gather [3.15M from 2945]",
          jax.jit(cmp_gather), tk)
    print("done", flush=True)


if __name__ == "__main__":
    main()
