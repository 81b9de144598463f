"""Gather-shape sweep for the slot pack: which (table rows, row width)
shapes ride the DMA path?  gather_micro4 established [*,128] rows from
a small table at ~1.5 ns/row vs ~13 ns/row above VMEM and ~7-10 ns for
narrow rows; this sweeps the boundary to pick the cheapest pack layout
(ray table is logically [N, 8]).

Also times the roll-trick pack: 16 rays per 128-lane row (table
[N/16, 128], always 16x smaller than [N, 128]) + 4 masked lane-rolls
to align the 8-float sub-block, vs the production [N, 128] row gather.

    PYTHONPATH=/root/repo:/root/repo/benchmarks:/root/.axon_site \
        nohup python benchmarks/r3_packshapes.py > /tmp/r3_pack.log 2>&1 &
"""

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from _timing import drained

    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    n = 262144
    slots = 1_500_000

    idx = jnp.asarray(rng.integers(0, n, slots).astype(np.int32))

    for width in (8, 16, 32, 64, 128):
        tab = jnp.asarray(rng.random((n, width), np.float32))

        @jax.jit
        def g(tab, idx):
            return tab[idx].sum()

        drained(f"gather [{n},{width}] x {slots}", g, tab, idx)

    # Sub-VMEM table rows at width 128.
    for rows in (16384, 65536, 131072):
        tab = jnp.asarray(rng.random((rows, 128), np.float32))
        idx2 = jnp.asarray(rng.integers(0, rows, slots).astype(np.int32))

        @jax.jit
        def g2(tab, idx2):
            return tab[idx2].sum()

        drained(f"gather [{rows},128] x {slots}", g2, tab, idx2)

    # Roll-trick pack: table [n/16, 128], 16 rays x 8 floats per row.
    tab16 = jnp.asarray(rng.random((n // 16, 128), np.float32))

    @jax.jit
    def roll_pack(tab16, idx):
        rows = tab16[idx // 16]  # [slots, 128]
        sh = (idx % 16) * 8
        for k in range(3, 7):  # rolls of 8,16,32,64
            amt = 1 << k
            on = ((sh >> k) & 1)[:, None] == 1
            rows = jnp.where(on, jnp.roll(rows, -amt, axis=1), rows)
        return rows[:, :8].sum()

    drained("roll-trick pack (16x small table)", roll_pack, tab16, idx)

    # Production shape for reference: [n,128] gather then [:, :8].
    tab128 = jnp.asarray(rng.random((n, 128), np.float32))

    @jax.jit
    def prod(tab128, idx):
        return tab128[idx][:, :8].sum()

    drained("production [n,128] gather [:, :8]", prod, tab128, idx)
    print("done", flush=True)


if __name__ == "__main__":
    main()
