"""On-chip: is the bench e2e gap per-dispatch OUTPUT TRANSFER?

Cornell knockout wave = 55.7 ms (fused) but bench e2e implies ~350 ms
per spl=4 dispatch — ~125 ms unattributed.  Hypothesis: the axon
remote backend eagerly fetches jit outputs through the tunnel, so the
[4096,16,16,3] px array (12.6 MB) costs ~100+ ms per dispatch.

Times the same compute returning (a) the full px block, (b) a scalar
reduction, (c) px left as a DONATED device accumulator (scatter-add
into a film-shaped buffer, return the buffer) — the device-film
design candidate.

    PYTHONPATH=/root/repo:/root/repo/benchmarks:/root/.axon_site \
        nohup python benchmarks/r3_outxfer.py > /tmp/r3_outxfer.log 2>&1 &
"""

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from _timing import drained

    print(f"backend={jax.default_backend()}", flush=True)
    n_tiles, td = 4096, 16
    x = jnp.asarray(
        np.random.default_rng(0).random((n_tiles, td, td, 3), np.float32)
    )

    def compute(x):
        # stand-in wave compute: a few passes
        y = x
        for _ in range(4):
            y = jnp.sin(y) * 1.1 + x
        return y

    f_px = jax.jit(lambda x: compute(x))
    f_scalar = jax.jit(lambda x: compute(x).sum())

    @jax.jit
    def f_accum(film, x):
        return film + compute(x)

    film = jnp.zeros_like(x)

    drained("return px 12.6MB", f_px, x, reps=5)
    drained("return scalar", f_scalar, x, reps=5)

    import time

    # Accumulator chain: 5 dependent dispatches, fetch once.
    f_accum(film, x).block_until_ready()  # compile
    t0 = time.monotonic()
    f2 = film
    for _ in range(5):
        f2 = f_accum(f2, x)
    _ = float(f2.sum())
    print(f"accum chain 5 dispatches + 1 fetch: "
          f"{(time.monotonic() - t0) * 1000 / 5:.1f} ms/dispatch",
          flush=True)

    # px chain: 5 independent dispatches whose outputs are all fetched
    # implicitly (if the backend is eager) or lazily.
    t0 = time.monotonic()
    outs = [f_px(x) for _ in range(5)]
    _ = float(outs[-1].sum())
    print(f"px chain 5 dispatches: "
          f"{(time.monotonic() - t0) * 1000 / 5:.1f} ms/dispatch",
          flush=True)
    t0 = time.monotonic()
    host = [np.asarray(o) for o in outs]
    print(f"explicit np.asarray of 5 px outputs: "
          f"{(time.monotonic() - t0) * 1000 / 5:.1f} ms each "
          f"(mean {host[-1].mean():.3f})", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
