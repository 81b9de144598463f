"""Full-pack sweep (round 3): time the PRODUCTION _pack_stream
(gather + masked lane-rolls + plane transpose + t-mask) across rays-per-
table-row (rpr) at both the single-query (262k rays / ~1M slots) and the
combined closest+shadow wave scale (786k rays / ~2.9M slots).

r3_stage2 measures pack at ~25 ms per 1M-slot call — ~25 ns/slot against
a 1.5-6.7 ns/row gather floor (r3_packshapes) — so the roll/transpose
epilogue, not the gather, is the suspect.  rpr trades table size
(rows = n/rpr, the gather-latency cliff) against log2(rpr) masked rolls:

  rpr=1 : no rolls, table [n,128] (128 MB at 262k -> slow gathers)
  rpr=2 : 1 roll,  table [n/2,128]
  rpr=4 : 2 rolls, table [n/4,128]  (production)
  rpr=8 : 3 rolls, table [n/8,128]

    PYTHONPATH=/root/repo:/root/repo/benchmarks:/root/.axon_site \
        nohup python benchmarks/r3_packsweep.py > /tmp/r3_packsweep.log 2>&1 &
"""

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from _timing import drained
    from yuki_tpu.ops import trace_stream as ts

    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)

    for n, slots_real in ((262144, 1_000_000), (786432, 2_900_000)):
        max_rows = -(-slots_real // 128 // 8) * 8
        o = jnp.asarray(rng.random((n, 3), np.float32))
        d = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
        t = jnp.full(n, 100.0, jnp.float32)
        sr = jnp.asarray(
            rng.integers(0, n, (max_rows, 128)).astype(np.int32))
        valid = jnp.asarray(
            rng.random((max_rows, 128)) < 0.9)

        for rpr in (1, 2, 4, 8):
            @jax.jit
            def pack(o, d, t, sr, valid, rpr=rpr):
                pl = ts._pack_stream(o, d, t, sr, valid,
                                     max_rows, rpr=rpr)
                return pl.sum()

            drained(
                f"pack n={n} slots={max_rows*128} rpr={rpr}",
                pack, o, d, t, sr, valid, reps=3,
            )
    print("done", flush=True)


if __name__ == "__main__":
    main()
