"""Round-5 on-chip exactness probe for the fused wave's MXU selects
(ADVICE r4, medium): the packed palette select's bitwise exactness
argument depends on Mosaic honoring precision=HIGHEST for the f32
one-hot dot (packed ids need 21 mantissa bits; a silently-lowered
single bf16 pass would corrupt palette indices).  The parity tests run
interpret-mode on CPU where dots are true f32, so the argument was
never exercised on hardware.  This probe compiles the three select
primitives through real Mosaic and compares BITWISE against the XLA
gathers they replace:

  - _texel_select_pal  (packed base-128 palette ids, [88,Q] f32 LHS)
  - _texel_select      (u8 channel rows, [768,Q] bf16 LHS)
  - _select_row_mxu    (byte-major f32-bit reassembly, bf16 LHS)

over the REAL Cornell atlas/triangle/material tables at production
shapes, plus adversarial q/rem coverage (every pool texel visited).

    PYTHONPATH=/root/repo:/root/.axon_site nohup python \
        benchmarks/r5_palprobe.py > /tmp/r5_palprobe.log 2>&1 &
"""

import numpy as np

import _timing


def main():
    import sys

    interpret = "--interpret" in sys.argv  # CPU smoke-test of the script
    _timing.enable_compile_cache()
    import jax

    if interpret:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    print("backend=", jax.default_backend(), flush=True)

    from yuki_tpu.ops import path_fused as pf
    from yuki_tpu.scene.cornell import cornell

    scene, _, _ = cornell()
    data, meta = scene.data, scene.meta
    atlas = data.textures
    assert meta.texpool_palette, "Cornell pool must be palette-eligible"

    texp, pal, pool_pad = pf._tex_tables_pal(atlas, meta.texpool_texels)
    td, tex, _ = pf._tex_tables(atlas, meta.texpool_texels)
    n_q = pool_pad // 256
    print(f"pool_pad={pool_pad} Q={n_q} palette={meta.texpool_palette}",
          flush=True)

    n_tris = int(meta.n_tris)
    trs = data.tris.shading_packed
    trb = pf._byte_table(trs[:, :32], max(8, -(-n_tris // 8) * 8))

    # Index planes: sweep EVERY pool texel in (8,128)-plane batches,
    # plus a random-material/triangle id plane per batch.
    rng = np.random.default_rng(7)
    n_total = pool_pad
    n_batches = -(-n_total // 1024)

    def kernel(q_ref, rem_ref, idx_ref, texp_ref, pal_ref, tex_ref,
               trb_ref, pr_ref, pg_ref, pb_ref, ur_ref, ug_ref, ub_ref,
               row_ref):
        q = q_ref[:]
        rem = rem_ref[:]
        r, g, b = pf._texel_select_pal(texp_ref, pal_ref, q, rem)
        pr_ref[:] = r
        pg_ref[:] = g
        pb_ref[:] = b
        r2, g2, b2 = pf._texel_select(tex_ref, q, rem)
        ur_ref[:] = r2
        ug_ref[:] = g2
        ub_ref[:] = b2
        cols = pf._select_row_mxu(trb_ref, idx_ref[:], 32)
        for c in range(32):
            row_ref[c * 8 : (c + 1) * 8, :] = cols[c]

    plane = jax.ShapeDtypeStruct((8, 128), jnp.float32)

    @jax.jit
    def run(q, rem, idx):
        return pl.pallas_call(
            kernel,
            out_shape=[plane] * 6
            + [jax.ShapeDtypeStruct((32 * 8, 128), jnp.float32)],
            interpret=interpret,
        )(q, rem, idx, texp, pal, tex, trb)

    pool_u8 = np.asarray(atlas.texels_u8)  # [N,3]
    pal_np = np.asarray(atlas.palette)  # [P,3] integer u8 values
    pidx_np = np.zeros(pool_pad, np.int64)
    pidx_np[: np.asarray(atlas.pal_idx).shape[0]] = np.asarray(
        atlas.pal_idx
    )
    pool_full = np.zeros((pool_pad, 3), np.int64)
    pool_full[: pool_u8.shape[0]] = pool_u8
    trs_np = np.asarray(trs[:, :32])

    bad_pal = bad_u8 = bad_row = 0
    for bi in range(n_batches):
        flat = (np.arange(1024) + bi * 1024) % n_total
        q = jnp.asarray((flat // 256).reshape(8, 128), jnp.int32)
        rem = jnp.asarray((flat % 256).reshape(8, 128), jnp.int32)
        idx = jnp.asarray(
            rng.integers(0, n_tris, (8, 128)).astype(np.float32)
        )
        outs = jax.device_get(run(q, rem, idx))
        prgb = np.stack(outs[0:3], -1).reshape(-1, 3)
        urgb = np.stack(outs[3:6], -1).reshape(-1, 3)
        rows = outs[6]
        ref_pal = pal_np[pidx_np[flat]]
        ref_u8 = pool_full[flat]
        bad_pal += int((prgb != ref_pal).sum())
        bad_u8 += int((urgb != ref_u8).sum())
        idx_np = np.asarray(idx).astype(np.int64).reshape(-1)
        ref_rows = trs_np[np.maximum(idx_np, 0)]  # [1024, 32]
        got_rows = rows.reshape(32, 8, 128).transpose(1, 2, 0).reshape(
            -1, 32
        )
        bad_row += int(
            (got_rows.view(np.uint32) != ref_rows.view(np.uint32)).sum()
        )
    n_checked = n_batches * 1024
    print(f"pal  mismatches: {bad_pal}/{n_checked * 3}", flush=True)
    print(f"u8   mismatches: {bad_u8}/{n_checked * 3}", flush=True)
    print(f"rows mismatches: {bad_row}/{n_checked * 32} (bitwise f32)",
          flush=True)
    ok = bad_pal == bad_u8 == bad_row == 0
    print("PASS" if ok else "FAIL", flush=True)


if __name__ == "__main__":
    main()
