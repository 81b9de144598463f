"""Gather strategy helpers for this TPU's measured lowering costs.

benchmarks/gather_micro4.py: XLA row gathers cost ~10 ns PER ROW on this
chip regardless of width (latency-bound scalar path), which makes the
per-bounce shading-table fetches (surface rows, material rows, light
rows) a dominant cost on small scenes — ~10 ms per million lanes per
gather.  For SMALL tables the same fetch is exact as a one-hot f32
matmul on the MXU (each output element is a single exact product;
Precision.HIGHEST keeps the f32 significand bits), which runs in
~0.1 ms/million lanes — two orders of magnitude faster.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# One-hot matmul beats the scalar gather path comfortably below this and
# costs O(K) FLOPs per lane above it; 256 keeps the crossover safe.
SMALL_TABLE_ROWS = 256


def rowgather(table, idx):
    """table [K, C] f32, idx [N] i32 (pre-clamped to [0, K)) -> [N, C].

    Small K: one-hot MXU matmul (exact).  Large K: plain XLA gather."""
    k = table.shape[0]
    if k > SMALL_TABLE_ROWS or table.dtype != jnp.float32:
        return table[idx]
    oh = (idx[..., None] == jnp.arange(k, dtype=idx.dtype)).astype(
        table.dtype
    )
    return jax.lax.dot_general(
        oh,
        table,
        (((oh.ndim - 1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )


def gather1d(vec, idx):
    """vec [K], idx [N] -> [N] via the same small-table strategy.

    Floats ride the MXU directly.  int32 vectors are EXACT through the
    MXU via a hi/lo split: v == (v >> 12) * 4096 + (v & 0xFFF) holds
    for every two's-complement int32 (arithmetic shift), and each half
    fits a f32 significand (|hi| <= 2^19, lo < 2^12), so the one-hot
    HIGHEST-precision products round-trip exactly — this restores the
    ~100x-over-scalar-gather MXU path for texture-atlas texel offsets
    above 2^24 (the advisor round-2 finding only ruled out the naive
    single-f32 round trip)."""
    if vec.shape[0] <= SMALL_TABLE_ROWS:
        if jnp.issubdtype(vec.dtype, jnp.floating):
            return rowgather(
                vec.astype(jnp.float32)[:, None], idx
            )[..., 0].astype(vec.dtype)
        if vec.dtype == jnp.int32:
            halves = jnp.stack(
                [(vec >> 12).astype(jnp.float32),
                 (vec & 0xFFF).astype(jnp.float32)], axis=1,
            )
            row = rowgather(halves, idx)
            return (
                row[..., 0].astype(jnp.int32) * 4096
                + row[..., 1].astype(jnp.int32)
            )
    return vec[idx]
