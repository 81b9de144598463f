"""Isolate the order-dependence: does running one gather make subsequent
unrelated ops slow in the same process?

    PYTHONPATH=/root/repo:/root/.axon_site nohup python \
        benchmarks/gather_micro3.py > /tmp/gather_micro3.log 2>&1 &
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

    big = jnp.asarray(rng.integers(0, 2, 13_000_000).astype(np.int32))
    cumsum = jax.jit(lambda x: jnp.cumsum(x)[-1])
    timed("cumsum 13M (1: fresh process)", cumsum, big)

    n_small = 262144
    tab1d = jnp.asarray(rng.random(n_small, np.float32))
    idx = jnp.asarray(rng.integers(0, n_small, 3_500_000), jnp.int32)
    g = jax.jit(lambda i: tab1d[i].sum())
    timed("1dgather 3.5M", g, idx)
    timed("cumsum 13M (2: after gather)", cumsum, big)

    idx_small = jnp.asarray(rng.integers(0, n_small, 500_000), jnp.int32)
    g2 = jax.jit(lambda i: tab1d[i].sum())
    timed("1dgather 500k", g2, idx_small)
    idx_tiny = jnp.asarray(rng.integers(0, n_small, 65536), jnp.int32)
    g3 = jax.jit(lambda i: tab1d[i].sum())
    timed("1dgather 65k", g3, idx_tiny)
    timed("cumsum 13M (3)", cumsum, big)

    sc = jax.jit(
        lambda v, i: jnp.full(n_small, 1e30).at[i].min(v).sum())
    vals = jnp.asarray(rng.random(3_500_000, np.float32))
    timed("scatter-min 3.5M", sc, vals, idx)
    timed("cumsum 13M (4: after scatter)", cumsum, big)
    srt = jax.jit(lambda k: jax.lax.sort((k,), num_keys=1)[0][-1])
    timed("sort 3.15M", srt, idx[:3_150_000])
    timed("cumsum 13M (5: after sort)", cumsum, big)
    print("done", flush=True)


if __name__ == "__main__":
    main()
