"""Round-4: decompose the fused-shade XLA prologue (~35 ms/wave =
~7 ms/bounce measured by r3_floor5) into gather vs pack vs texture
terms at the Cornell bench scale (1M rays), to size the megakernel's
residual XLA glue before building it."""

import numpy as np


def timed(label, fn, *args, reps=8):
    from _timing import drained

    return drained(label, fn, *args, reps=reps)


def main():
    import jax
    import jax.numpy as jnp

    from yuki_tpu.gathers import rowgather
    from yuki_tpu.scene.cornell import cornell
    from yuki_tpu.textures import eval_texture

    scene, _, _ = cornell()
    data = scene.data
    print(f"backend={jax.default_backend()}", flush=True)
    n = 1 << 20
    rows = n // 128
    rng = np.random.default_rng(0)
    pr = jnp.asarray(rng.integers(0, 36, n), jnp.int32)
    texel_idx = jnp.asarray(rng.integers(0, 65536, n), jnp.int32)
    b0 = jnp.asarray(rng.random(n), jnp.float32)
    b1 = jnp.asarray(rng.random(n), jnp.float32)
    o = jnp.asarray(rng.random((n, 3)), jnp.float32)
    d = jnp.asarray(rng.random((n, 3)), jnp.float32)

    @jax.jit
    def g_trow(sp, pr):
        # production MXU one-hot rowgather, NO pack
        return rowgather(sp, pr).sum()

    @jax.jit
    def g_trow_pack(sp, pr):
        trow = rowgather(sp, pr)
        planes = jnp.stack(
            [trow[:, i].reshape(rows, 128) for i in range(32)], axis=0)
        return planes[:, :1, :1].sum()

    @jax.jit
    def g_texel(tex, idx):
        return tex[idx].sum()

    @jax.jit
    def g_texel_rows(tex_rows, idx):
        # DMA-path variant: gather 128-texel interleaved rows then
        # one-hot lane select.  tex_rows [512, 384] (rgb interleaved
        # by channel blocks of 128).
        r = rowgather(tex_rows, idx // 128)  # falls to XLA gather (512 rows)
        lane = idx % 128
        oh = (jax.lax.broadcasted_iota(jnp.int32, (n, 128), 1)
              == lane[:, None]).astype(jnp.float32)
        out = [(r[:, c * 128:(c + 1) * 128] * oh).sum(axis=1)
               for c in range(3)]
        return out[0].sum() + out[1].sum() + out[2].sum()

    @jax.jit
    def g_uv_texture(sp, atlas, pr, b0, b1):
        # the full per-bounce texture chain the megakernel would leave
        # in XLA if uv stayed XLA-side
        trow8 = rowgather(sp[:, 16:24], pr)  # uv cols only
        b2 = 1.0 - b0 - b1
        uv = (trow8[:, 2:4] * b0[:, None] + trow8[:, 4:6] * b1[:, None]
              + trow8[:, 6:8] * b2[:, None])
        val = eval_texture(atlas, jnp.zeros(n, jnp.int32), uv)
        return val.sum()

    @jax.jit
    def g_odpack(o, d):
        planes = jnp.stack(
            [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2]],
            axis=0).reshape(6, rows, 128)
        return planes[:, :1, :1].sum()

    @jax.jit
    def g_texel_planes(tex, idx):
        # texel gather with plane-shaped index in, planes out (the form
        # the megakernel post-pass uses)
        v = tex[idx]  # [N,3]
        return (v[:, 0].reshape(rows, 128)[:1, :1].sum()
                + v[:, 1].reshape(rows, 128)[:1, :1].sum()
                + v[:, 2].reshape(rows, 128)[:1, :1].sum())

    sp = data.tris.shading_packed
    tex = data.textures.texels  # [65536, 3]
    texr = tex.reshape(512, 128, 3).transpose(0, 2, 1).reshape(512, 384)

    timed("trow rowgather only [N,32]", g_trow, sp, pr)
    timed("trow rowgather + pack", g_trow_pack, sp, pr)
    timed("texel gather [65536,3][idx]", g_texel, tex, texel_idx)
    timed("texel rows+onehot", g_texel_rows, texr, texel_idx)
    timed("uv chain + eval_texture", g_uv_texture, sp, data.textures, pr, b0, b1)
    timed("o/d 6-plane pack", g_odpack, o, d)
    timed("texel gather -> planes", g_texel_planes, tex, texel_idx)
    print("done", flush=True)


if __name__ == "__main__":
    main()
