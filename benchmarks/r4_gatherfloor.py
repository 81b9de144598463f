"""Round-4: find the cheapest EXACT per-lane texel fetch on this chip.

The megakernel plan (ops/path_fused.py) moves everything per-bounce into
Pallas except the one thing Mosaic cannot do — the per-lane texture
gather.  r4_prologue measured the current [65536,3] f32 gather at
5.8-6.8 ms per 1M lanes, which x5 bounces would dominate the whole
fused wave.  Sweep exact alternatives:

  a) tex3[idx]            [T,3] f32 gather (today's eval_texture tail)
  b) texp[idx] + unpack   [T] u32-packed RGB8 (exact for u8 sources:
                          (v>>s & 255)/255 bitwise-matches the loader)
  c) 3x tex1[idx]         planar channels, three [T] gathers
  d) texp[idx2d]          (b) with [rows,128] plane-shaped idx/out
  e) sorted idx           (b) on sorted indices (coherence sensitivity)
  f) take(axis=0)         jnp.take spelling of (a)
"""

import numpy as np

import jax
import jax.numpy as jnp

import _timing


def main():
    _timing.enable_compile_cache()
    print("backend=", jax.default_backend(), flush=True)
    T = 65536
    N = 1 << 20
    rng = np.random.default_rng(0)
    tex3 = jnp.asarray(rng.random((T, 3), np.float32))
    u8 = rng.integers(0, 256, (T, 3), np.uint32)
    texp = jnp.asarray(u8[:, 0] << 16 | u8[:, 1] << 8 | u8[:, 2])
    tex1 = jnp.asarray(rng.random(T, np.float32))
    idx_np = rng.integers(0, T, N).astype(np.int32)
    idx = jnp.asarray(idx_np)
    idx2d = idx.reshape(N // 128, 128)
    idx_sorted = jnp.asarray(np.sort(idx_np))

    @jax.jit
    def g_a(idx):
        return tex3[idx]

    @jax.jit
    def g_b(idx):
        v = texp[idx]
        s = jnp.float32(1.0 / 255.0)
        return ((v >> 16 & 255).astype(jnp.float32) * s,
                (v >> 8 & 255).astype(jnp.float32) * s,
                (v & 255).astype(jnp.float32) * s)

    @jax.jit
    def g_c(idx):
        return tex1[idx], tex1[idx + 1], tex1[idx + 2]

    @jax.jit
    def g_f(idx):
        return jnp.take(tex3, idx, axis=0)

    _timing.drained("a) [T,3] f32 gather", g_a, idx)
    _timing.drained("b) [T] u32 packed + unpack", g_b, idx)
    _timing.drained("c) 3x [T] f32 gathers", g_c, idx)
    _timing.drained("d) u32 packed, [R,128] idx", g_b, idx2d)
    _timing.drained("e) u32 packed, sorted idx", g_b, idx_sorted)
    _timing.drained("f) jnp.take [T,3]", g_f, idx)
    print("done", flush=True)


if __name__ == "__main__":
    main()
