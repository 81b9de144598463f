"""De-risk round-4 item (1): is a plane-major one-hot gather
(table.T @ onehot.T -> [C, N], reshape [C,rows,128] free) actually
cheaper than today's row-major rowgather + plane packing
([N,C] -> 32 strided column extracts -> stack)?  1M rays, Cornell
tri table (36 rows x 32 cols)."""

import numpy as np


def timed(label, fn, *args, reps=8):
    from _timing import drained

    return drained(label, fn, *args, reps=reps)


def main():
    import jax
    import jax.numpy as jnp

    from yuki_tpu.gathers import rowgather

    print(f"backend={jax.default_backend()}", flush=True)
    n = 1 << 20
    t_rows, t_cols = 40, 32
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(t_rows, t_cols)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, t_rows, n), jnp.int32)
    rows = n // 128

    @jax.jit
    def rowmajor_pack(table, idx):
        trow = rowgather(table, idx)  # [N, 32]
        planes = jnp.stack(
            [trow[:, i].reshape(rows, 128) for i in range(t_cols)],
            axis=0)
        return planes[:, :1, :1].sum()

    @jax.jit
    def planemajor(table, idx):
        # one-hot [T, N] built transposed; [C,T] @ [T,N] -> [C,N]
        oh = (idx[None, :] == jnp.arange(t_rows, dtype=jnp.int32)[:, None]
              ).astype(jnp.float32)
        planes = (table.T @ oh).reshape(t_cols, rows, 128)
        return planes[:, :1, :1].sum()

    timed("rowgather + pack [N,32]->planes", rowmajor_pack, table, idx)
    timed("plane-major one-hot [32,N]", planemajor, table, idx)
    print("done", flush=True)


if __name__ == "__main__":
    main()
