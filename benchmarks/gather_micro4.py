"""Irregular-op micro-bench with ON-DEVICE rep chains: the axon tunnel
imposes a ~30 ms round-trip floor per blocked dispatch (and async timing
under-reports before the first gather), so each op is timed as
(T(k=17) - T(k=1)) / 16 with a lax.scan chain that rolls the index array
between reps to defeat CSE.

    PYTHONPATH=/root/repo:/root/.axon_site nohup python \
        benchmarks/gather_micro4.py > /tmp/gather_micro4.log 2>&1 &
"""

import functools
import time

import numpy as np


def chain_time(label, op, x, aux=None):
    """op(x, aux) -> array; carry = roll(x, 1) chains reps."""
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("k",))
    def run(x, aux, k):
        def body(c, _):
            y = op(c, aux)
            # Force dependence of next input on this output.
            bump = (y.reshape(-1)[0] * 0).astype(c.dtype)
            return jnp.roll(c, 1) + bump, y.reshape(-1)[0]

        c, ys = jax.lax.scan(body, x, None, length=k)
        return ys.sum()

    float(run(x, aux, 1))
    float(run(x, aux, 17))
    t0 = time.monotonic()
    float(run(x, aux, 1))
    t1 = time.monotonic()
    float(run(x, aux, 17))
    t2 = time.monotonic()
    per = ((t2 - t1) - (t1 - t0)) / 16
    print(f"{label}: {per*1e3:.3f} ms", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    n_small = 262144

    tab1d = jnp.asarray(rng.random(n_small, np.float32))
    tab8 = jnp.asarray(rng.random((n_small, 8), np.float32))
    tab128 = jnp.asarray(rng.random((n_small // 16, 128), np.float32))
    tiny = jnp.asarray(rng.random((2944, 8), np.float32))
    tiny768 = jnp.asarray(rng.random((51, 768), np.float32))
    seg = jnp.asarray(np.sort(rng.integers(0, 3_150_000, 2945)), jnp.int32)

    idx35 = jnp.asarray(rng.integers(0, n_small, 3_500_000), jnp.int32)
    idx10 = jnp.asarray(rng.integers(0, n_small, 1_000_000), jnp.int32)
    idxt = jnp.asarray(rng.integers(0, 2944, 3_500_000), jnp.int32)
    idxs = jnp.asarray(rng.integers(0, 51, 1_300_000), jnp.int32)
    idxr = jnp.asarray(rng.integers(0, n_small // 16, 220_000), jnp.int32)

    chain_time("1dgather 3.5M from 262k",
               lambda i, t: t[i].sum()[None], idx35, tab1d)
    chain_time("1dgather 1M from 262k",
               lambda i, t: t[i].sum()[None], idx10, tab1d)
    chain_time("1dgather-promise 3.5M",
               lambda i, t: t.at[i].get(mode="promise_in_bounds").sum()[None],
               idx35, tab1d)
    chain_time("rowgather 3.5Mx8 from 262kx8",
               lambda i, t: t[i].sum()[None], idx35, tab8)
    chain_time("rowgather 220kx128",
               lambda i, t: t[i].sum()[None], idxr, tab128)
    chain_time("rowgather tiny 3.5Mx8 from 2944x8",
               lambda i, t: t[i].sum()[None], idxt, tiny)
    chain_time("rowgather super 1.3Mx768 from 51x768",
               lambda i, t: t[i].sum()[None], idxs, tiny768)
    chain_time("1dgather small 3.5M from 2945",
               lambda i, t: t[i].sum()[None], idxt, seg)

    vals = jnp.asarray(rng.random(3_500_000, np.float32))
    chain_time("scatter-min 3.5M into 262k",
               lambda i, v: jnp.full(n_small, 1e30).at[i].min(v).sum()[None],
               idx35, vals)
    mono = jnp.asarray(np.sort(rng.choice(14_000_000, 3_500_000,
                                          replace=False)).astype(np.int32))
    chain_time("scatter-set mono sorted+unique 3.5M into 14M",
               lambda i, v: jnp.zeros(14_000_000, jnp.float32).at[i].set(
                   v, mode="drop", indices_are_sorted=True,
                   unique_indices=True).sum()[None], mono, vals)
    chain_time("scatter-set mono plain 3.5M into 14M",
               lambda i, v: jnp.zeros(14_000_000, jnp.float32).at[i].set(
                   v, mode="drop").sum()[None], mono, vals)

    big = jnp.asarray(rng.integers(0, 2, 13_000_000).astype(np.int32))
    chain_time("cumsum 13M", lambda x, _: jnp.cumsum(x)[-1:][None], big)
    big2 = jnp.asarray(rng.integers(0, 2, 100_000_000).astype(np.int32))
    chain_time("cumsum 100M", lambda x, _: jnp.cumsum(x)[-1:][None], big2)

    keys = jnp.asarray(rng.integers(0, 2944, 3_150_000), jnp.int32)
    pay = jnp.asarray(rng.integers(0, n_small, 3_150_000), jnp.int32)
    chain_time("sort 3.15M k+p",
               lambda k, p: jax.lax.sort((k, p), num_keys=1,
                                         is_stable=True)[0][-1:][None],
               keys, pay)
    chain_time("sort 1M k+p",
               lambda k, p: jax.lax.sort((k, p[:1_000_000]), num_keys=1,
                                         is_stable=True)[0][-1:][None],
               keys[:1_000_000], pay)
    skeys = jnp.sort(keys)
    chain_time("searchsorted 2945q in 3.15M",
               lambda s, _: jnp.searchsorted(
                   s, jnp.arange(2945, dtype=jnp.int32)).sum()[None], skeys)
    chain_time("searchsorted 27kq in 2945",
               lambda q, s: jnp.searchsorted(s, q).sum()[None],
               jnp.arange(27520, dtype=jnp.int32),
               jnp.arange(2945, dtype=jnp.int32) * 7)

    # iota-compare gather for small tables (dense, chunked)
    def cmp_gather(t, s):
        def body(c, acc):
            tc = jax.lax.dynamic_slice(t, (c * 500_000,), (500_000,))
            eq = tc[:, None] == jnp.arange(2945, dtype=jnp.int32)[None, :]
            return acc + jnp.where(eq, s[None, :], 0).sum(axis=1).sum()

        return jax.lax.fori_loop(0, 7, body, jnp.int32(0))[None]

    chain_time("iota-compare gather 3.5M from 2945", cmp_gather, idxt, seg)
    print("done", flush=True)


if __name__ == "__main__":
    main()
