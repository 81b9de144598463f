"""Fully-fused dense-scene path tracing: the whole per-sample wave as
Pallas kernels with plane-major state and ZERO per-bounce XLA work.

Round-3 attribution (ARCHITECTURE.md "Cornell end-of-round-3"): with the
shade megakernel landed, Cornell's remaining per-wave cost was ~35 ms of
XLA input plane packing around the kernels, ~23 ms of path_li loop glue,
and ~14 ms of XLA texture chain — versus a 15.5 ms trace+occlusion
floor.  This module removes ALL of it for small dense scenes:

  raygen kernel   sampler pixel hash + camera jitter + camera ray +
                  closest-hit trace (unrolled watertight triangles +
                  object-space spheres), all in one kernel
  bounce kernel   per bounce: miss/background -> one-hot triangle and
                  material row selects from VMEM tables -> MXU texel
                  select -> the full _shade_body chain (shade_fused.py,
                  parity-tested) -> in-kernel NEE occlusion sweeps ->
                  resolve -> next-ray closest-hit trace

State crosses bounces as one [24, rows, 128] f32 plane stack carried by
a lax.scan whose body is a single pallas_call — the only XLA per sample
is the scalar bookkeeping.

The texture fetch is the one per-lane gather Mosaic cannot express
directly; it becomes an EXACT MXU one-hot select: the texel pool rides
in VMEM as [768, Q] bf16 integers (u8 texel values 0..255 are exact in
bf16), each sublane-group's row one-hot [Q,128] selects the pool column
per lane on the MXU, and a column mask + sublane reduction picks the
final texel — f32-accumulated products of one-hot rows are exact, so
the result equals the XLA gather bit-for-bit (including the final /255,
an IEEE f32 divide like the loader's).  Gated on
meta.texpool_u8_exact (scene/data.py stores the integer pool).

Reference parity: the per-bounce semantics are path.rs:48-178 exactly as
path_li's XLA chain implements them (integrators/__init__.py); the
trace is the watertight test of shapes/triangle.rs:49-130 and the
stable-q sphere quadratic of shapes/sphere.rs:37-89.

Support gate (wave_supported): Uniform or Stratified sampler (the
stratified strata are path-independent, so the driver hoists the whole
sampler to an XLA prologue of [2+depth*(2L+3), rows, 128] sample planes
the kernels read positionally — stratified.rs:104-146 semantics, same
hoist as shade_fused's round-4 stratified support), dense traversal
with n_tris <= 64 (static unroll bound), untextured sphere materials,
no sigma textures, u8-exact texel pool <= 65536 texels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene.data import LIGHT_RECT
from .shade_fused import (
    _pcg,
    _dim_f32,
    _shade_body,
    _where3,
)
from .trace import F32_MAX, _watertight, pack_triangles

LANES = 128
BLOCK = 8 * LANES  # rays per grid step
MAX_TRIS = 64  # static-unroll threshold (matches trace.UNROLL_TRIS)
# Fused-wave scene-size gate: above MAX_TRIS the triangle sweeps run as
# in-kernel fori_loops (dynamic scalar tri reads, like the generic dense
# kernels past trace.UNROLL_TRIS) instead of static unrolls, so the gate
# is a cost ceiling, not a compile constraint.  1024 covers every dense
# scene the builder classifies (scene/data.py DENSE_TRI_THRESHOLD=4096
# picks treelet traversal well before the brute-force sweep's O(T)
# per-ray cost could dominate a production render).
MAX_TRIS_WAVE = 1024
TEXPOOL_MAX = 65536  # one-hot select cost is linear in pool size

# Carry plane indices (f32 [24, rows, 128]).
_ST = dict(
    ox=0, oy=1, oz=2, dx=3, dy=4, dz=5,
    bx=6, by=7, bz=8, rx=9, ry=10, rz=11,
    alive=12, spec=13, rc=14,
    t=15, b0=16, b1=17, prim=18, sph=19, hitf=20,
    pad0=21, pad1=22, pad2=23,
)
_N_ST = 24

# Misc scalar-table slots ([1,128] f32): raster_to_camera rows 0-15,
# camera_to_world rows 16-31, scene center 32-34, diag 35, background
# 36-38, indirect clamp 39.
_MS_R2C = 0
_MS_C2W = 16
_MS_CENTER = 32
_MS_DIAG = 35
_MS_BG = 36
_MS_CLAMP = 39


# --------------------------------------------------------------------
# In-kernel scene intersection (parity: traverse.intersect dense path)
# --------------------------------------------------------------------


def _tri_cols(tri_ref, i):
    return [tri_ref[i, k] for k in range(9)]


def _tri_closest(tri_ref, n_tris, o, d, t_max):
    """Watertight sweep; same loop/update order as
    ops/trace._dense_kernel (first-lowest index wins scaled ties).
    Statically unrolled to MAX_TRIS; above that, an in-kernel fori_loop
    with dynamic scalar tri reads (ops/trace.py:203-214 precedent — the
    dynamic loads cost ~6x the static schedule per tri, acceptable for
    the 64<T<=1024 dense band the gate admits)."""
    shape = o[0].shape
    init = (
        t_max,
        jnp.full(shape, -1, dtype=jnp.int32),
        jnp.zeros(shape, dtype=jnp.float32),
        jnp.zeros(shape, dtype=jnp.float32),
    )

    def body(i, state):
        t, prim, b0, b1 = state
        hit, ti, bi0, bi1 = _watertight(
            o[0], o[1], o[2], d[0], d[1], d[2], t, _tri_cols(tri_ref, i)
        )
        closer = hit & (ti < t)
        return (
            jnp.where(closer, ti, t),
            jnp.where(closer, i, prim),
            jnp.where(closer, bi0, b0),
            jnp.where(closer, bi1, b1),
        )

    if n_tris <= MAX_TRIS:
        state = init
        for i in range(n_tris):
            state = body(i, state)
        return state
    return jax.lax.fori_loop(0, n_tris, body, init)


def _spheres_closest(sp_ref, n_spheres, o, d, t_max):
    """intersect.ray_spheres port on planes (stable-q quadratic,
    sphere.rs:37-89); scalar table reads per sphere."""
    shape = o[0].shape
    best_t = jnp.full(shape, F32_MAX, dtype=jnp.float32)
    best_i = jnp.full(shape, -1, dtype=jnp.int32)
    for s in range(n_spheres):
        def m(i, _s=s):
            return sp_ref[_s, i]

        ro = (
            m(0) * o[0] + m(1) * o[1] + m(2) * o[2] + m(3),
            m(4) * o[0] + m(5) * o[1] + m(6) * o[2] + m(7),
            m(8) * o[0] + m(9) * o[1] + m(10) * o[2] + m(11),
        )
        rd = (
            m(0) * d[0] + m(1) * d[1] + m(2) * d[2],
            m(4) * d[0] + m(5) * d[1] + m(6) * d[2],
            m(8) * d[0] + m(9) * d[1] + m(10) * d[2],
        )
        radius = m(32)
        a = rd[0] * rd[0] + rd[1] * rd[1] + rd[2] * rd[2]
        b = 2.0 * (rd[0] * ro[0] + rd[1] * ro[1] + rd[2] * ro[2])
        c = ro[0] * ro[0] + ro[1] * ro[1] + ro[2] * ro[2] - radius * radius
        discrim = b * b - 4.0 * a * c
        has_root = discrim >= 0.0
        rt = jnp.sqrt(jnp.maximum(discrim, 0.0))
        q = jnp.where(b < 0.0, -0.5 * (b - rt), -0.5 * (b + rt))
        t0 = q / a
        t1 = c / jnp.where(q == 0.0, 1e-30, q)
        lo_t = jnp.minimum(t0, t1)
        hi_t = jnp.maximum(t0, t1)
        miss = (lo_t > t_max) | (hi_t <= 0.0)
        t = jnp.where(lo_t <= 0.0, hi_t, lo_t)
        miss = miss | (t > t_max) | ~has_root
        closer = ~miss & (t < best_t)
        best_t = jnp.where(closer, t, best_t)
        best_i = jnp.where(closer, s, best_i)
    return best_t, best_i


def _trace_scene(tri_ref, sp_ref, n_tris, n_spheres, o, d, t_max):
    """Scene closest hit (traverse.intersect dense semantics: triangles
    then brute-force spheres, sphere wins strict t ties lose).  Returns
    f32 planes (t, prim, b0, b1, sph, hitf)."""
    t, prim, b0, b1 = _tri_closest(tri_ref, n_tris, o, d, t_max)
    if n_spheres:
        st_, si_ = _spheres_closest(sp_ref, n_spheres, o, d, t_max)
        sphere_wins = (si_ >= 0) & (st_ < t)
        hit = (prim >= 0) | sphere_wins
        t = jnp.where(sphere_wins, st_, t)
        prim = jnp.where(sphere_wins, -1, prim)
        sph = jnp.where(sphere_wins, si_, -1)
    else:
        hit = prim >= 0
        sph = jnp.full_like(prim, -1)
    return (
        t,
        prim.astype(jnp.float32),
        b0,
        b1,
        sph.astype(jnp.float32),
        hit.astype(jnp.float32),
    )


def _occluded(tri_ref, trs_ref, sp_ref, n_tris, n_spheres, skip_id,
              o, d, t_max):
    """any_intersect parity: watertight any over triangles (skipping the
    sampled area light's own triangles, bvh.rs:287-293; area-light id =
    shading row col 27) OR any sphere hit."""
    def body(i, occ):
        hit, _, _, _ = _watertight(
            o[0], o[1], o[2], d[0], d[1], d[2], t_max,
            _tri_cols(tri_ref, i),
        )
        if skip_id >= 0:
            hit = hit & (trs_ref[i, 27] != float(skip_id))
        # i32 carry: Mosaic can't legalize scf.for over i1 vectors.
        return occ | hit.astype(jnp.int32)

    occ = jnp.zeros(o[0].shape, dtype=jnp.int32)
    if n_tris <= MAX_TRIS:
        for i in range(n_tris):
            occ = body(i, occ)
    else:
        occ = jax.lax.fori_loop(0, n_tris, body, occ)
    blocked = occ > 0
    if n_spheres:
        st_, si_ = _spheres_closest(sp_ref, n_spheres, o, d, t_max)
        blocked = blocked | (si_ >= 0)
    return blocked


# --------------------------------------------------------------------
# In-kernel one-hot table rows + MXU texel select
# --------------------------------------------------------------------


def _byte_table(tab, n_rows_pad: int):
    """Host/XLA-side prep for _select_row_mxu: [R, C] f32 table ->
    [4*C, n_rows_pad] bf16 of the f32 values' raw bytes, BYTE-MAJOR
    (row b*C+c holds byte b of column c), so the kernel's integer
    reassembly runs as four [C, 128] vector ops instead of a per-column
    [1, 128] chain.  u8 bytes are exact in bf16, so the MXU one-hot
    dot + integer reassembly reproduces the f32 BITS exactly."""
    import jax.numpy as _jnp

    r, c = tab.shape
    bits = jax.lax.bitcast_convert_type(
        tab.astype(_jnp.float32), _jnp.uint32
    )
    bytes_ = jnp.stack(
        [(bits >> (8 * b)) & 0xFF for b in range(4)], axis=-1
    )  # [R, C, 4]
    out = bytes_.transpose(2, 1, 0).reshape(4 * c, r)
    pad = n_rows_pad - r
    if pad:
        out = jnp.pad(out, ((0, 0), (0, pad)))
    return out.astype(jnp.bfloat16)


def _select_row_mxu(btab_ref, idx_f, n_cols):
    """Exact per-lane row select on the MXU (replaces the unrolled
    one-hot _select_row whose R*C jnp.where chain was the largest
    single term of the fused Cornell wave: 11.7 of 42.9 ms,
    benchmarks/r4_waveknock.py).

    btab_ref: [4*n_cols, R] bf16 BYTE-MAJOR byte table (_byte_table:
    row b*n_cols+c = byte b of column c).  idx_f: (8,128) f32 plane of
    integral row ids (negatives select row 0, parity with the XLA
    drivers' clamped gathers).  One-hot rows and u8 byte values are
    both exact in bf16 and each f32-accumulated dot lane receives
    exactly one nonzero product, so reassembling the four byte planes
    with integer shifts reproduces the table's f32 bits EXACTLY.  The
    reassembly is four [n_cols, 128] casts + three shift-or pairs per
    group (the previous column-major layout needed a [1, 128] op chain
    per column: ~7*n_cols ops/group, the largest VPU term of the fused
    wave after the one-hot dots).  Returns n_cols (8,128) f32 planes."""
    n_rows = btab_ref.shape[1]
    a = btab_ref[:]
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (n_rows, LANES), 0)
    idx_i = jnp.maximum(idx_f, 0.0).astype(jnp.int32)
    cols = [[] for _ in range(n_cols)]
    for g in range(8):
        onehot = (
            (iota_r == idx_i[g : g + 1, :])
            .astype(jnp.float32)
            .astype(jnp.bfloat16)
        )  # [R, 128]
        b = jax.lax.dot_general(
            a, onehot, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [4*n_cols, 128], byte-major blocks of n_cols rows
        v = b[3 * n_cols : 4 * n_cols].astype(jnp.int32)
        for byte in (2, 1, 0):
            v = jax.lax.shift_left(v, jnp.int32(8)) | b[
                byte * n_cols : (byte + 1) * n_cols
            ].astype(jnp.int32)
        vf = jax.lax.bitcast_convert_type(v, jnp.float32)  # [n_cols,128]
        for c in range(n_cols):
            cols[c].append(vf[c : c + 1])
    return [jnp.concatenate(c, axis=0) for c in cols]


def _select_row(tab_ref, idx_f, cols):
    """Per-lane row select from a small VMEM table by unrolled one-hot:
    row 0 is the default (parity with the XLA drivers' max(idx, 0)
    clamped gathers).  idx_f: f32 plane of integral ids."""
    n_rows = tab_ref.shape[0]
    zero = jnp.zeros_like(idx_f)
    out = [tab_ref[0, j] + zero for j in cols]
    for i in range(1, n_rows):
        sel = idx_f == float(i)
        for jj, j in enumerate(cols):
            out[jj] = jnp.where(sel, tab_ref[i, j], out[jj])
    return out


def _texel_select(tex_ref, q, rem, knock=frozenset()):
    """Exact texel fetch on the MXU.

    tex_ref: [768, Q] bf16 with tex_ref[ch*256 + c, qq] = u8 texel value
    of pool index qq*256 + c, channel ch.  q/rem: (8,128) i32 planes of
    pool-index quotient/remainder.  Returns three (8,128) f32 planes of
    INTEGER texel values (divide by 255 at the caller).

    One-hot rows are exact {0,1} in bf16 and u8 values are integers
    <= 255 (exact in bf16), so each f32-accumulated dot picks out the
    exact value — bitwise equal to the XLA gather."""
    n_q = tex_ref.shape[1]
    a = tex_ref[:]
    iota_q = jax.lax.broadcasted_iota(jnp.int32, (n_q, LANES), 0)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (256, LANES), 0)
    outs = ([], [], [])
    for g in range(8):
        onehot = (
            (iota_q == q[g : g + 1, :])
            .astype(jnp.float32)
            .astype(jnp.bfloat16)
        )  # [Q, 128]
        if "texdot" in knock:  # pragma: no cover - perf attribution
            b = (a[:, :LANES] + onehot[:1, :]).astype(jnp.float32)
        else:
            b = jax.lax.dot_general(
                a, onehot, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [768, 128]
        colmask = (iota_c == rem[g : g + 1, :]).astype(jnp.float32)
        for ch in range(3):
            if "texred" in knock:  # pragma: no cover - perf attr
                v = b[ch * 256 : ch * 256 + 1, :] + colmask[:1, :]
            else:
                v = jnp.sum(
                    b[ch * 256 : (ch + 1) * 256, :] * colmask, axis=0,
                    keepdims=True,
                )
            outs[ch].append(v)
    return tuple(jnp.concatenate(outs[ch], axis=0) for ch in range(3))


def _texel_select_pal(texp_ref, pal_ref, q, rem, knock=frozenset()):
    """Palette texel fetch on the MXU (gated by meta.texpool_palette;
    scene/data.py builds pal_idx/palette when the u8 pool has <= 128
    distinct RGB triples — Cornell's tiling: 97/65536).

    texp_ref: [88, Q] f32 with texp_ref[r, qq] = the palette indices of
    pool texels qq*256 + 3r .. 3r+2 packed base-128
    (id0*16384 + id1*128 + id2; ids <= 127 so packed < 2^21, exact in
    f32 — and exact through a one-hot MXU dot at ANY bf16 pass count,
    because the one-hot operand is exactly {0,1} so each split-product
    sums back to the unrounded packed value; precision=HIGHEST pins
    the multi-pass lowering).  VERIFIED ON-CHIP through real Mosaic:
    benchmarks/r5_palprobe.py sweeps every pool texel of the production
    Cornell atlas — 0/196608 mismatches vs the XLA gather (likewise
    _texel_select and _select_row_mxu, the latter bitwise on f32).  pal_ref: [8, 128] f32, rows 0..2 =
    r/g/b INTEGER u8 values of palette entry p (cols >= P zero).
    Packing 3 rems per row cuts the per-group column-mask
    construct+mul+reduce from 256 rows to 88 — the dominant VPU term
    of the tex stage (benchmarks/r4_texknock2.py) — at the price of a
    three-op per-lane field extract."""
    n_q = texp_ref.shape[1]
    n_r3 = texp_ref.shape[0]
    a = texp_ref[:]
    p = pal_ref[:]
    iota_q = jax.lax.broadcasted_iota(jnp.int32, (n_q, LANES), 0)
    iota_r3 = jax.lax.broadcasted_iota(jnp.int32, (n_r3, LANES), 0)
    iota_p = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    outs = ([], [], [])
    for g in range(8):
        onehot = (iota_q == q[g : g + 1, :]).astype(jnp.float32)
        if "texdot" in knock:  # pragma: no cover - perf attribution
            b = a[:, :LANES] + onehot[:1, :]
        else:
            b = jax.lax.dot_general(
                a, onehot, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # [88, 128]
        rg = rem[g : g + 1, :]
        r_row = jax.lax.div(rg, jnp.int32(3))
        sub = rg - r_row * 3
        colmask = (iota_r3 == r_row).astype(jnp.float32)
        if "texred" in knock:  # pragma: no cover - perf attribution
            packed = b[:1, :] + colmask[:1, :]
        else:
            packed = jnp.sum(b * colmask, axis=0, keepdims=True)
        pv = packed.astype(jnp.int32)
        shift = jnp.int32(14) - jnp.int32(7) * sub
        pi = jax.lax.shift_right_logical(pv, shift) & jnp.int32(127)
        ponehot = (iota_p == pi).astype(jnp.float32)
        rgb = jax.lax.dot_general(
            p, ponehot, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [8, 128]
        for ch in range(3):
            outs[ch].append(rgb[ch : ch + 1, :])
    return tuple(jnp.concatenate(outs[ch], axis=0) for ch in range(3))


def _tex_index(td_ref, tex0_f, uv_s, uv_t, n_textures, pool_pad):
    """eval_texture's index math in-kernel (textures.py:43-51: repeat
    wrap, y-flip, -0.5 texel center, truncate-toward-zero, clamp).
    td_ref: [K, 4] f32 descriptor table (w, h, off_hi*4096, off_lo).
    Returns a clamped i32 pool index plane."""
    w_f, h_f, off_hi, off_lo = _select_row(td_ref, tex0_f, range(4))
    s = uv_s - jnp.floor(uv_s)
    t = uv_t - jnp.floor(uv_t)
    t = 1.0 - t
    x = s * w_f - 0.5
    y = t * h_f - 0.5
    w_i = w_f.astype(jnp.int32)
    h_i = h_f.astype(jnp.int32)
    xi = jnp.clip(x.astype(jnp.int32), 0, w_i - 1)
    yi = jnp.clip(y.astype(jnp.int32), 0, h_i - 1)
    off = off_hi.astype(jnp.int32) * 4096 + off_lo.astype(jnp.int32)
    idx = off + yi * w_i + xi
    # Dead/garbage lanes (NaN uv) convert unpredictably: clamp into the
    # pool; their texel is masked by tex0 < 0 / liveness anyway.
    return jnp.clip(idx, 0, pool_pad - 1)


# --------------------------------------------------------------------
# Kernels
# --------------------------------------------------------------------


def _raygen_values(px, py, sample_index, seed, ms_ref, tri_ref, sp_ref,
                   *, n_tris, n_spheres, jitter=None):
    """Camera raygen + bounce-0 closest hit, on values (shared by the
    two-kernel scanned driver and the one-kernel wave).

    Sampler parity: ph = pcg(hash_key(seed, px<<16|py) ^ sample_index)
    exactly as sampling.SampleCtx.pixel_hash/_dim_u32 (i32 wrapping ops
    are bit-identical to the u32 forms); camera ray = camera.Camera.ray
    (projective raster_to_camera, two normalizes).  Returns (ph, state
    dict keyed by _ST names).

    ``jitter``: optional (jx, jy) planes of precomputed pixel-jitter
    sample values (the stratified driver hoists the sampler to an XLA
    prologue — strata are path-independent, stratified.rs:104-146) in
    place of the in-kernel UniformSampler hash."""
    gold = jnp.int32(-1640531527)  # 0x9E3779B9
    h = _pcg(gold ^ seed)
    key = jax.lax.shift_left(px, jnp.int32(16)) | py
    ph = _pcg(_pcg(h ^ key) ^ sample_index)

    if jitter is None:
        jx = _dim_f32(ph, jnp.int32(0))
        jy = _dim_f32(ph, jnp.int32(1))
    else:
        jx, jy = jitter
    x = px.astype(jnp.float32) + jx
    y = py.astype(jnp.float32) + jy

    def r2c(i, j):
        return ms_ref[0, _MS_R2C + 4 * i + j]

    def c2w(i, j):
        return ms_ref[0, _MS_C2W + 4 * i + j]

    # apply_p_jax(r2c, (x, y, 0)) with projective divide.
    pcx = r2c(0, 0) * x + r2c(0, 1) * y + r2c(0, 3)
    pcy = r2c(1, 0) * x + r2c(1, 1) * y + r2c(1, 3)
    pcz = r2c(2, 0) * x + r2c(2, 1) * y + r2c(2, 3)
    w = r2c(3, 0) * x + r2c(3, 1) * y + r2c(3, 3)
    pcx, pcy, pcz = pcx / w, pcy / w, pcz / w
    # normalize (vecmath.normalize: v / |v|, true divide)
    l1 = jnp.sqrt(pcx * pcx + pcy * pcy + pcz * pcz)
    pcx, pcy, pcz = pcx / l1, pcy / l1, pcz / l1
    dx = c2w(0, 0) * pcx + c2w(0, 1) * pcy + c2w(0, 2) * pcz
    dy = c2w(1, 0) * pcx + c2w(1, 1) * pcy + c2w(1, 2) * pcz
    dz = c2w(2, 0) * pcx + c2w(2, 1) * pcy + c2w(2, 2) * pcz
    l2 = jnp.sqrt(dx * dx + dy * dy + dz * dz)
    d = (dx / l2, dy / l2, dz / l2)
    zero = jnp.zeros_like(x)
    o = (c2w(0, 3) + zero, c2w(1, 3) + zero, c2w(2, 3) + zero)

    t_max = jnp.full_like(x, F32_MAX)
    t, prim, b0, b1, sph, hitf = _trace_scene(
        tri_ref, sp_ref, n_tris, n_spheres, o, d, t_max
    )

    one = jnp.ones_like(x)
    stv = dict(
        ox=o[0], oy=o[1], oz=o[2], dx=d[0], dy=d[1], dz=d[2],
        bx=one, by=one, bz=one, rx=zero, ry=zero, rz=zero,
        alive=one, spec=zero, rc=one,
        t=t, b0=b0, b1=b1, prim=prim, sph=sph, hitf=hitf,
    )
    return ph, stv


def _raygen_trace_kernel(sc_ref, pxpy_ref, *refs, n_tris, n_spheres,
                         strat=False):
    """Ref wrapper over _raygen_values (the scanned two-kernel driver).
    sc: i32 [8] (slots 2/3 = sample_index/seed bitcast).  pxpy:
    [2,8,128] i32 pixel coords.  When ``strat``, an extra spl_ref
    [2,8,128] f32 of precomputed jitter planes precedes ms_ref."""
    if strat:
        spl_ref, ms_ref, tri_ref, sp_ref, st_out, ph_out = refs
        jitter = (spl_ref[0], spl_ref[1])
    else:
        ms_ref, tri_ref, sp_ref, st_out, ph_out = refs
        jitter = None
    ph, stv = _raygen_values(
        pxpy_ref[0], pxpy_ref[1], sc_ref[2], sc_ref[3], ms_ref,
        tri_ref, sp_ref, n_tris=n_tris, n_spheres=n_spheres,
        jitter=jitter,
    )
    ph_out[0] = ph
    zero = jnp.zeros_like(stv["rc"])
    for name, v in stv.items():
        st_out[_ST[name]] = v
    st_out[_ST["pad0"]] = zero
    st_out[_ST["pad1"]] = zero
    st_out[_ST["pad2"]] = zero


def _bounce_values(dim0, bounce, st, ph_base, ms_ref, tri_ref, trs_ref,
                   trb_ref, matb_ref, lt_ref, sp_ref, td_ref, tex_ref,
                   pal_ref, *,
                   n_tris, n_spheres, n_lights, light_types, present,
                   has_sigma, has_clamp, has_tex, pool_pad, pal_colors,
                   max_depth, knock=frozenset(), urand=None):
    """One path bounce on values (shared by the scanned two-kernel
    driver and the one-kernel wave).  Order matches path_li's fused
    branch exactly: miss/alive update -> shade (_shade_body) -> NEE
    occlusion -> resolve (shade_fused._resolve_kernel order).  ``st``
    is a by-name state getter; ``bounce`` a traced/const i32 scalar.
    Returns (o2, d2, beta2, rad, alive2, spec2, rc2) — the caller owns
    the next-ray trace (skipped past max_depth, path.rs never traces
    there)."""
    o = (st("ox"), st("oy"), st("oz"))
    d = (st("dx"), st("dy"), st("dz"))
    beta = (st("bx"), st("by"), st("bz"))
    rad = (st("rx"), st("ry"), st("rz"))
    alive_in = st("alive") > 0.0
    spec = st("spec")
    rc = st("rc")
    t_hit = st("t")
    b0 = st("b0")
    b1 = st("b1")
    prim = st("prim")
    sph = st("sph")
    hitf = st("hitf") > 0.0
    zero = jnp.zeros_like(rc)

    missed = alive_in & ~hitf
    alive_h = alive_in & hitf

    # Triangle shading row + material row via one-hot VMEM selects
    # (replaces the XLA rowgathers + 48-plane packing of shade_fused's
    # driver — the measured ~35 ms/wave input-marshalling term).
    if "rowsel" in knock:  # pragma: no cover - perf attribution only
        trp = [trs_ref[0, k] + zero for k in range(32)]
        mrow = [zero for _ in range(11)]
    else:
        trp = _select_row_mxu(trb_ref, prim, 32)
        mid = trp[26]
        for s in range(n_spheres):
            mid = jnp.where(sph == float(s), sp_ref[s, 34] + zero, mid)
        mrow = _select_row_mxu(matb_ref, mid, 11)
    kd = (mrow[1], mrow[2], mrow[3])
    s0 = mrow[7]
    if has_tex and "tex" not in knock:
        b2 = 1.0 - b0 - b1
        uv_s = trp[18] * b0 + trp[20] * b1 + trp[22] * b2
        uv_t = trp[19] * b0 + trp[21] * b1 + trp[23] * b2
        tex0 = mrow[9]
        if "texidx" in knock:  # pragma: no cover - perf attribution
            idx = jnp.clip((uv_s + uv_t).astype(jnp.int32), 0,
                           pool_pad - 1)
        else:
            idx = _tex_index(td_ref, tex0, uv_s, uv_t, td_ref.shape[0],
                             pool_pad)
        q = jax.lax.shift_right_logical(idx, jnp.int32(8))
        rem = idx & jnp.int32(255)
        if pal_colors:
            kr, kg, kb = _texel_select_pal(tex_ref, pal_ref, q, rem,
                                           knock=knock)
        else:
            kr, kg, kb = _texel_select(tex_ref, q, rem, knock=knock)
        inv255 = jnp.float32(255.0)
        texel = (kr / inv255, kg / inv255, kb / inv255)
        kd = _where3(tex0 >= 0.0, texel, kd)

    rhd = dict(
        ox=o[0], oy=o[1], oz=o[2], dx=d[0], dy=d[1], dz=d[2],
        t=t_hit, b0=b0, b1=b1, sph=sph,
        alive=alive_h.astype(jnp.float32),
        bx=beta[0], by=beta[1], bz=beta[2], spec=spec,
    )
    mpd = dict(
        mtype=mrow[0], kdx=kd[0], kdy=kd[1], kdz=kd[2],
        c1x=mrow[4], c1y=mrow[5], c1z=mrow[6], s0=s0, remap=mrow[8],
    )
    center = (
        ms_ref[0, _MS_CENTER],
        ms_ref[0, _MS_CENTER + 1],
        ms_ref[0, _MS_CENTER + 2],
    )
    if "shade" in knock:  # pragma: no cover - perf attribution only
        o2, d2v, beta2 = o, d, beta
        alive2, spec2 = alive_h, spec > 0.0
        ne = (zero, zero, zero)
        nee = []
    else:
        o2, d2v, beta2, alive2, spec2, ne, nee = _shade_body(
            dim0, bounce,
            rh=lambda name: rhd[name],
            tr=lambda i: trp[i],
            mp=lambda name: mpd[name],
            ltab=lambda li, i: lt_ref[li, i],
            spm=lambda s, i: sp_ref[s, i],
            center=center,
            diag=ms_ref[0, _MS_DIAG],
            ph_base=None if urand is not None else ph_base,
            urand=urand,
            n_lights=n_lights, light_types=light_types,
            n_spheres=n_spheres, present=present, has_sigma=has_sigma,
        )

    # In-kernel NEE occlusion (replaces the per-bounce any_intersect
    # dispatch): per light, the watertight any sweep + spheres.
    occs = []
    for li_idx, (o_s, d_s, t_s, worth, contrib) in enumerate(nee):
        if "occl" in knock:  # pragma: no cover - perf attribution only
            occs.append(jnp.zeros(o_s[0].shape, jnp.int32) > 0)
            continue
        skip = li_idx if light_types[li_idx] == LIGHT_RECT else -2
        occs.append(
            _occluded(tri_ref, trs_ref, sp_ref, n_tris, n_spheres,
                      skip, o_s, d_s, t_s)
        )

    # Resolve (shade_fused._resolve_kernel order: background first, the
    # per-light fold seeded with the kernel's beta*emitted term — the
    # outer beta below reproduces the reference's double-beta emit
    # quirk, path.rs:126-137 — then clamp past bounce 0, then the
    # radiance update masked to live lanes).
    bg = (
        ms_ref[0, _MS_BG],
        ms_ref[0, _MS_BG + 1],
        ms_ref[0, _MS_BG + 2],
    )
    rad = _where3(
        missed,
        (rad[0] + beta[0] * bg[0], rad[1] + beta[1] * bg[1],
         rad[2] + beta[2] * bg[2]),
        rad,
    )
    br = ne
    for li_idx, (o_s, d_s, t_s, worth, contrib) in enumerate(nee):
        lit = worth & ~occs[li_idx]
        br = (
            br[0] + jnp.where(lit, contrib[0], zero),
            br[1] + jnp.where(lit, contrib[1], zero),
            br[2] + jnp.where(lit, contrib[2], zero),
        )
    if has_clamp:
        clamp_v = ms_ref[0, _MS_CLAMP]
        clamped = (
            jnp.minimum(br[0], clamp_v),
            jnp.minimum(br[1], clamp_v),
            jnp.minimum(br[2], clamp_v),
        )
        past0 = (zero + (bounce > 0).astype(jnp.float32)) > 0.5
        br = _where3(past0, clamped, br)
    rad = _where3(
        alive_h,
        (rad[0] + beta[0] * br[0], rad[1] + beta[1] * br[1],
         rad[2] + beta[2] * br[2]),
        rad,
    )

    # ray_count parity: path_li counts liveness at the TOP of each of
    # its max_depth scan steps; bounce b's K_B owns the count for
    # bounce b+1, so the final bounce adds nothing.
    not_last = bounce < jnp.int32(max_depth - 1)
    nl_f = zero + not_last.astype(jnp.float32)
    rc2 = rc + alive2.astype(jnp.float32) * nl_f
    return o2, d2v, beta2, rad, alive2, spec2, rc2


def _bounce_kernel(sc_ref, st_ref, ph_ref, *refs,
                   n_tris, n_spheres, n_lights, light_types, present,
                   has_sigma, has_clamp, has_tex, pool_pad, pal_colors,
                   max_depth, knock=frozenset(), strat=False):
    """Ref wrapper over _bounce_values: one bounce per pallas_call,
    state round-tripped through the [_N_ST, rows, 128] HBM planes (the
    scanned two-kernel driver).  When ``strat``, an extra spl_ref
    [dims_per_bounce,8,128] f32 of precomputed stratified sample planes
    precedes ms_ref; _shade_body reads them positionally in place of
    the in-kernel UniformSampler hash."""
    if strat:
        (spl_ref, ms_ref, tri_ref, trs_ref, trb_ref, matb_ref, lt_ref,
         sp_ref, td_ref, tex_ref, pal_ref, st_out) = refs
        urand = lambda k: spl_ref[k]
    else:
        (ms_ref, tri_ref, trs_ref, trb_ref, matb_ref, lt_ref,
         sp_ref, td_ref, tex_ref, pal_ref, st_out) = refs
        urand = None
    dim0 = sc_ref[0]
    bounce = sc_ref[1]

    def st(name):
        return st_ref[_ST[name]]

    o2, d2v, beta2, rad, alive2, spec2, rc2 = _bounce_values(
        dim0, bounce, st, ph_ref[0], ms_ref, tri_ref, trs_ref, trb_ref,
        matb_ref, lt_ref, sp_ref, td_ref, tex_ref, pal_ref,
        n_tris=n_tris, n_spheres=n_spheres, n_lights=n_lights,
        light_types=light_types, present=present, has_sigma=has_sigma,
        has_clamp=has_clamp, has_tex=has_tex, pool_pad=pool_pad,
        pal_colors=pal_colors, max_depth=max_depth, knock=knock,
        urand=urand,
    )
    zero = jnp.zeros_like(rc2)

    st_out[_ST["ox"]] = o2[0]
    st_out[_ST["oy"]] = o2[1]
    st_out[_ST["oz"]] = o2[2]
    st_out[_ST["dx"]] = d2v[0]
    st_out[_ST["dy"]] = d2v[1]
    st_out[_ST["dz"]] = d2v[2]
    st_out[_ST["bx"]] = beta2[0]
    st_out[_ST["by"]] = beta2[1]
    st_out[_ST["bz"]] = beta2[2]
    st_out[_ST["rx"]] = rad[0]
    st_out[_ST["ry"]] = rad[1]
    st_out[_ST["rz"]] = rad[2]
    st_out[_ST["alive"]] = alive2.astype(jnp.float32)
    st_out[_ST["spec"]] = spec2.astype(jnp.float32)
    st_out[_ST["rc"]] = rc2
    st_out[_ST["t"]] = zero
    st_out[_ST["b0"]] = zero
    st_out[_ST["b1"]] = zero
    st_out[_ST["prim"]] = zero - 1.0
    st_out[_ST["sph"]] = zero - 1.0
    st_out[_ST["hitf"]] = zero
    st_out[_ST["pad0"]] = zero
    st_out[_ST["pad1"]] = zero
    st_out[_ST["pad2"]] = zero

    if "trace" in knock:  # pragma: no cover - perf attribution only
        return

    not_last = bounce < jnp.int32(max_depth - 1)

    @pl.when(not_last)
    def _trace_next():
        t_max2 = jnp.where(alive2, F32_MAX, 0.0)
        t, prim2, nb0, nb1, sph2, hitf2 = _trace_scene(
            tri_ref, sp_ref, n_tris, n_spheres, o2, d2v, t_max2
        )
        st_out[_ST["t"]] = t
        st_out[_ST["b0"]] = nb0
        st_out[_ST["b1"]] = nb1
        st_out[_ST["prim"]] = prim2
        st_out[_ST["sph"]] = sph2
        st_out[_ST["hitf"]] = hitf2


def _wave_kernel(sc_ref, pxpy_ref, *refs,
                 n_tris, n_spheres, n_lights, light_types, present,
                 has_sigma, has_clamp, has_tex, pool_pad, pal_colors,
                 max_depth, dims_per_bounce, knock=frozenset(),
                 strat=False):
    """The WHOLE per-sample path in ONE kernel: in-kernel raygen +
    max_depth statically-unrolled bounces, wave state resident in
    VMEM/registers for the full path (the scanned two-kernel driver
    round-trips the 24-plane state through HBM every bounce and pays a
    pallas dispatch per bounce — part of the measured ~10.7 ms 'base'
    term, benchmarks/r4_waveknock.py).  Output is only what the
    renderer consumes: [4, 8, 128] = radiance rgb + ray_count.
    Bitwise-identical maths to the scanned form: same _raygen_values /
    _bounce_values bodies, same order; the bounce index becomes a
    folded constant.  When ``strat``, an extra spl_ref
    [2+max_depth*dims_per_bounce,8,128] f32 of precomputed sample
    planes precedes ms_ref (see _bounce_kernel)."""
    if strat:
        (spl_ref, ms_ref, tri_ref, trs_ref, trb_ref, matb_ref, lt_ref,
         sp_ref, td_ref, tex_ref, pal_ref, out_ref) = refs
        jitter = (spl_ref[0], spl_ref[1])
    else:
        (ms_ref, tri_ref, trs_ref, trb_ref, matb_ref, lt_ref,
         sp_ref, td_ref, tex_ref, pal_ref, out_ref) = refs
        jitter = None
    ph, stv = _raygen_values(
        pxpy_ref[0], pxpy_ref[1], sc_ref[2], sc_ref[3], ms_ref,
        tri_ref, sp_ref, n_tris=n_tris, n_spheres=n_spheres,
        jitter=jitter,
    )
    for b in range(max_depth):
        def st(name, _s=stv):
            return _s[name]

        o2, d2v, beta2, rad, alive2, spec2, rc2 = _bounce_values(
            jnp.int32(2 + b * dims_per_bounce), jnp.int32(b), st, ph,
            ms_ref, tri_ref, trs_ref, trb_ref, matb_ref, lt_ref,
            sp_ref, td_ref, tex_ref, pal_ref,
            n_tris=n_tris, n_spheres=n_spheres, n_lights=n_lights,
            light_types=light_types, present=present,
            has_sigma=has_sigma, has_clamp=has_clamp, has_tex=has_tex,
            pool_pad=pool_pad, pal_colors=pal_colors,
            max_depth=max_depth, knock=knock,
            urand=(
                (lambda k, _b=b: spl_ref[2 + _b * dims_per_bounce + k])
                if strat else None
            ),
        )
        zero = jnp.zeros_like(rc2)
        stv = dict(
            ox=o2[0], oy=o2[1], oz=o2[2],
            dx=d2v[0], dy=d2v[1], dz=d2v[2],
            bx=beta2[0], by=beta2[1], bz=beta2[2],
            rx=rad[0], ry=rad[1], rz=rad[2],
            alive=alive2.astype(jnp.float32),
            spec=spec2.astype(jnp.float32), rc=rc2,
            t=zero, b0=zero, b1=zero,
            prim=zero - 1.0, sph=zero - 1.0, hitf=zero,
        )
        if b < max_depth - 1 and "trace" not in knock:
            t_max2 = jnp.where(alive2, F32_MAX, 0.0)
            t, prim2, nb0, nb1, sph2, hitf2 = _trace_scene(
                tri_ref, sp_ref, n_tris, n_spheres, o2, d2v, t_max2
            )
            stv.update(t=t, b0=nb0, b1=nb1, prim=prim2, sph=sph2,
                       hitf=hitf2)
    out_ref[0] = stv["rx"]
    out_ref[1] = stv["ry"]
    out_ref[2] = stv["rz"]
    out_ref[3] = stv["rc"]


# --------------------------------------------------------------------
# Driver
# --------------------------------------------------------------------

# "auto": on-TPU production; "off": never; "interpret": force interpret
# mode on any backend (CPU equivalence tests).
PATH_FUSED_MODE = "auto"

# One-kernel wave: raygen + all bounces in a single pallas_call with
# the state resident in VMEM (see _wave_kernel).  Bitwise-identical to
# the scanned two-kernel form (same value bodies, same order); kept
# flag-gated until its Mosaic compile is validated on the chip.
PATH_FUSED_ONEKERNEL = False

# Perf-attribution knockouts (benchmarks/r4_waveknock.py): subset of
# {"rowsel", "tex", "shade", "occl", "trace"} disabling that stage of
# the bounce kernel.  NEVER set in production — results are wrong.
PATH_FUSED_KNOCK = frozenset()


def wave_supported(meta, sampler) -> bool:
    """Static gate, decided from SceneMeta/sampler only (never probe
    device arrays — see shade_fused.fused_shade_supported's round-3
    tracing bug)."""
    from ..sampling import StratifiedSampler, UniformSampler

    if not isinstance(sampler, (UniformSampler, StratifiedSampler)):
        return False
    if meta.traversal != "dense" or meta.n_tris > MAX_TRIS_WAVE:
        return False
    if meta.n_tris == 0:
        return False
    if meta.n_spheres and not meta.sphere_mats_untextured:
        return False
    if len(meta.light_types) == 0:
        return False
    if meta.has_sigma_tex:
        return False
    if meta.has_textures and not (
        meta.texpool_u8_exact
        and meta.texpool_texels <= TEXPOOL_MAX
        and meta.n_textures <= 8
    ):
        return False
    return True


def use_wave_fused(meta, sampler) -> bool:
    from .. import traverse

    if PATH_FUSED_MODE == "off":
        return False
    if not wave_supported(meta, sampler):
        return False
    if PATH_FUSED_MODE == "interpret":
        return True
    return traverse._use_pallas()


def _light_table(lights):
    n = lights.ltype.shape[0]
    return jnp.concatenate(
        [
            lights.ltype.astype(jnp.float32)[:, None],
            lights.p, lights.i, lights.m.reshape(-1, 16),
            lights.area[:, None], lights.cos_w[:, None],
            lights.cos_f[:, None],
            jnp.zeros((n, 6)),
        ],
        axis=1,
    )


def _sphere_table(spheres, n_spheres):
    if not n_spheres:
        return jnp.zeros((1, 40))
    return jnp.concatenate(
        [
            spheres.world_to_obj.reshape(-1, 16),
            spheres.obj_to_world.reshape(-1, 16),
            spheres.radius[:, None],
            spheres.swaps_hand.astype(jnp.float32)[:, None],
            spheres.material.astype(jnp.float32)[:, None],
            jnp.zeros((n_spheres, 5)),
        ],
        axis=1,
    )


def _tex_tables(atlas, pool_texels: int):
    """Descriptor table [K,4] + the bf16 one-hot LHS [768, Q] built from
    the integer pool (texels_u8)."""
    pool_pad = max(-(-pool_texels // 256), 1) * 256
    u8 = atlas.texels_u8
    pad = pool_pad - u8.shape[0]
    u8p = jnp.pad(u8, ((0, pad), (0, 0)))
    # LHS[ch*256 + c, q] = pool[q*256 + c, ch]
    lhs = (
        u8p.reshape(pool_pad // 256, 256, 3)
        .transpose(2, 1, 0)
        .reshape(768, pool_pad // 256)
        .astype(jnp.bfloat16)
    )
    td = jnp.stack(
        [
            atlas.width.astype(jnp.float32),
            atlas.height.astype(jnp.float32),
            (atlas.offset >> 12).astype(jnp.float32),
            (atlas.offset & 0xFFF).astype(jnp.float32),
        ],
        axis=1,
    )
    return td, lhs, pool_pad


def _tex_tables_pal(atlas, pool_texels: int):
    """Palette variant of _tex_tables: packed pal-index LHS [88, Q]
    f32 (3 rems per row, base-128: see _texel_select_pal) + palette
    table [8, 128] f32 (rows 0..2 = r/g/b integer values)."""
    pool_pad = max(-(-pool_texels // 256), 1) * 256
    pidx = atlas.pal_idx
    pad = pool_pad - pidx.shape[0]
    pidxp = jnp.pad(pidx, (0, pad))
    byq = pidxp.reshape(pool_pad // 256, 256)  # [Q, 256] (q, rem)
    byq = jnp.pad(byq, ((0, 0), (0, 2))).reshape(-1, 86, 3)
    packed = (
        byq[..., 0] * 16384 + byq[..., 1] * 128 + byq[..., 2]
    )  # [Q, 86]
    lhs = jnp.pad(packed.transpose(1, 0), ((0, 2), (0, 0))).astype(
        jnp.float32
    )  # [88, Q]
    n_pal = atlas.palette.shape[0]
    pal = jnp.zeros((8, LANES), jnp.float32)
    pal = pal.at[:3, :n_pal].set(atlas.palette.T)
    return lhs, pal, pool_pad


def path_li_wave(data, meta, camera, sampler, params, px, py,
                 sample_index, seed, interpret: bool = False,
                 knock=None):
    """The full per-sample path-traced wave (drop-in for the renderer's
    raygen + path_li): px/py [N] i32 pixel coords -> (li [N,3],
    ray_count [N] i32).  Consumes sampler dims exactly like raygen
    (0-1) + path_li (2 + bounce strides)."""
    from ..profiling import pass_scope

    if knock is None:
        knock = PATH_FUSED_KNOCK
    n_lights = len(meta.light_types)
    dims_per_bounce = 2 * n_lights + 2 + 1
    max_depth = params.max_depth
    n0 = px.shape[0]
    n = -(-n0 // BLOCK) * BLOCK
    if n != n0:
        px = jnp.concatenate([px, jnp.zeros(n - n0, px.dtype)])
        py = jnp.concatenate([py, jnp.zeros(n - n0, py.dtype)])
    rows = n // LANES
    grid = rows // 8

    pxpy = jnp.stack(
        [px.reshape(rows, LANES), py.reshape(rows, LANES)], axis=0
    )

    from ..sampling import SampleCtx, StratifiedSampler

    strat = isinstance(sampler, StratifiedSampler)
    if strat:
        # Stratified prologue: ALL the wave's sample values computed by
        # the sampler's own XLA code (raygen dims 0-1 + per-bounce
        # 2L+3), stacked plane-major; kernel parity with the XLA chain
        # is value-identical by construction.  Strata depend only on
        # (seed, pixel, sample, dim) — never on the path — so the hoist
        # is semantics-preserving (the pbrt-v4 seeking contract,
        # sampling/mod.rs:46-57).
        ctx = SampleCtx(px=px, py=py, sample_index=sample_index,
                        seed=seed)
        vals = []
        u2 = sampler.get_2d(ctx, 0)
        vals += [u2[..., 0], u2[..., 1]]
        for b in range(max_depth):
            d0 = 2 + b * dims_per_bounce
            for li_i in range(n_lights):
                u2 = sampler.get_2d(ctx, d0 + 2 * li_i)
                vals += [u2[..., 0], u2[..., 1]]
            u2 = sampler.get_2d(ctx, d0 + 2 * n_lights)
            vals += [u2[..., 0], u2[..., 1]]
            vals.append(sampler.get_1d(ctx, d0 + 2 * n_lights + 2))
        spl = jnp.stack(
            [v.reshape(rows, LANES) for v in vals], axis=0
        )
    else:
        spl = None

    # misc table
    r2c = jnp.asarray(camera.raster_to_camera, jnp.float32).reshape(16)
    c2w = jnp.asarray(camera.camera_to_world, jnp.float32).reshape(16)
    center = 0.5 * (data.world_lo + data.world_hi)
    diag = jnp.linalg.norm(data.world_hi - data.world_lo) * 1.002 + 1e-3
    bg = jnp.asarray(data.background, jnp.float32)
    clamp_v = (
        jnp.float32(0.0) if params.indirect_clamp is None
        else jnp.asarray(params.indirect_clamp, jnp.float32)
    )
    ms = jnp.zeros(LANES)
    ms = ms.at[_MS_R2C : _MS_R2C + 16].set(r2c)
    ms = ms.at[_MS_C2W : _MS_C2W + 16].set(c2w)
    ms = ms.at[_MS_CENTER : _MS_CENTER + 3].set(center)
    ms = ms.at[_MS_DIAG].set(diag)
    ms = ms.at[_MS_BG : _MS_BG + 3].set(bg)
    ms = ms.at[_MS_CLAMP].set(clamp_v)
    ms = ms.reshape(1, LANES)

    n_tris = meta.n_tris
    n_spheres = meta.n_spheres
    tri = pack_triangles(data.tris.p0, data.tris.p1, data.tris.p2)
    trs = data.tris.shading_packed
    mat = data.materials.packed
    # Byte tables for the MXU row selects (benchmarks/r4_waveknock.py:
    # the VPU one-hot chain was 11.7 ms of the 42.9 ms wave).
    trb = _byte_table(trs[:, :32], max(8, -(-n_tris // 8) * 8))
    n_mats = mat.shape[0]
    matb = _byte_table(mat[:, :11], max(8, -(-n_mats // 8) * 8))
    lt = _light_table(data.lights)
    sp = _sphere_table(data.spheres, n_spheres)
    has_tex = bool(meta.has_textures)
    pal_colors = int(meta.texpool_palette) if has_tex else 0
    pal = jnp.zeros((8, LANES), jnp.float32)
    if has_tex and pal_colors:
        td, _, pool_pad = _tex_tables(data.textures, meta.texpool_texels)
        tex, pal, pool_pad = _tex_tables_pal(
            data.textures, meta.texpool_texels
        )
    elif has_tex:
        td, tex, pool_pad = _tex_tables(data.textures, meta.texpool_texels)
    else:
        td = jnp.zeros((1, 4))
        tex = jnp.zeros((768, 8), jnp.bfloat16)
        pool_pad = 8 * 256

    def i32(x):
        return jax.lax.bitcast_convert_type(
            jnp.asarray(x, jnp.uint32).reshape(()), jnp.int32
        )

    sc_a = jnp.stack(
        [jnp.int32(0), jnp.int32(0), i32(sample_index), i32(seed)]
    )

    block = lambda p_: pl.BlockSpec((p_, 8, LANES), lambda i, s: (0, i, 0))
    full = lambda shp: pl.BlockSpec(shp, lambda i, s: tuple(0 for _ in shp))

    if PATH_FUSED_ONEKERNEL:
        spl_specs = [block(spl.shape[0])] if strat else []
        spl_args = (spl,) if strat else ()
        grid_w = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[block(2)] + spl_specs + [
                      full(ms.shape), full(tri.shape),
                      full(trs.shape), full(trb.shape),
                      full(matb.shape), full(lt.shape), full(sp.shape),
                      full(td.shape), full(tex.shape), full(pal.shape)],
            out_specs=[block(4)],
        )
        with pass_scope("path_fused.wave1k"):
            (out,) = pl.pallas_call(
                functools.partial(
                    _wave_kernel,
                    n_tris=n_tris, n_spheres=n_spheres,
                    n_lights=n_lights,
                    light_types=tuple(meta.light_types),
                    present=frozenset(meta.material_types),
                    has_sigma=bool(meta.has_sigma or meta.has_sigma_tex),
                    has_clamp=params.indirect_clamp is not None,
                    has_tex=has_tex, pool_pad=pool_pad,
                    pal_colors=pal_colors, max_depth=max_depth,
                    dims_per_bounce=dims_per_bounce,
                    knock=frozenset(knock), strat=strat,
                ),
                grid_spec=grid_w,
                out_shape=[
                    jax.ShapeDtypeStruct((4, rows, LANES), jnp.float32)
                ],
                interpret=interpret,
            )(sc_a, pxpy, *spl_args, ms, tri, trs, trb, matb, lt, sp,
              td, tex, pal)
        li = jnp.stack(
            [out[0].reshape(n)[:n0], out[1].reshape(n)[:n0],
             out[2].reshape(n)[:n0]],
            axis=-1,
        )
        ray_count = out[3].reshape(n)[:n0].astype(jnp.int32)
        return li, ray_count

    rg_spl_specs = [block(2)] if strat else []
    rg_spl_args = (spl[:2],) if strat else ()
    grid_a = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid,),
        in_specs=[block(2)] + rg_spl_specs + [
                  full(ms.shape), full(tri.shape),
                  full(sp.shape)],
        out_specs=[block(_N_ST), block(1)],
    )
    with pass_scope("path_fused.raygen_trace"):
        st, ph = pl.pallas_call(
            functools.partial(
                _raygen_trace_kernel, n_tris=n_tris,
                n_spheres=n_spheres, strat=strat,
            ),
            grid_spec=grid_a,
            out_shape=[
                jax.ShapeDtypeStruct((_N_ST, rows, LANES), jnp.float32),
                jax.ShapeDtypeStruct((1, rows, LANES), jnp.int32),
            ],
            interpret=interpret,
        )(sc_a, pxpy, *rg_spl_args, ms, tri, sp)

    b_spl_specs = [block(dims_per_bounce)] if strat else []
    grid_b = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid,),
        in_specs=[block(_N_ST), block(1)] + b_spl_specs + [
                  full(ms.shape),
                  full(tri.shape), full(trs.shape), full(trb.shape),
                  full(matb.shape),
                  full(lt.shape), full(sp.shape), full(td.shape),
                  full(tex.shape), full(pal.shape)],
        out_specs=[block(_N_ST)],
    )
    bounce_call = pl.pallas_call(
        functools.partial(
            _bounce_kernel,
            n_tris=n_tris, n_spheres=n_spheres, n_lights=n_lights,
            light_types=tuple(meta.light_types),
            present=frozenset(meta.material_types),
            has_sigma=bool(meta.has_sigma or meta.has_sigma_tex),
            has_clamp=params.indirect_clamp is not None,
            has_tex=has_tex, pool_pad=pool_pad, pal_colors=pal_colors,
            max_depth=max_depth,
            knock=frozenset(knock), strat=strat,
        ),
        grid_spec=grid_b,
        out_shape=[
            jax.ShapeDtypeStruct((_N_ST, rows, LANES), jnp.float32)
        ],
        interpret=interpret,
    )

    def body(st, b):
        dim0 = jnp.int32(2) + b * jnp.int32(dims_per_bounce)
        sc = jnp.stack([dim0, b, jnp.int32(0), jnp.int32(0)])
        spl_b = (
            (jax.lax.dynamic_slice_in_dim(
                spl, 2 + b * dims_per_bounce, dims_per_bounce, axis=0
            ),)
            if strat else ()
        )
        (st2,) = bounce_call(sc, st, ph, *spl_b, ms, tri, trs, trb,
                             matb, lt, sp, td, tex, pal)
        return st2, None

    with pass_scope("path_fused.bounces"):
        st, _ = jax.lax.scan(
            body, st, jnp.arange(max_depth, dtype=jnp.int32)
        )

    li = jnp.stack(
        [
            st[_ST["rx"]].reshape(n)[:n0],
            st[_ST["ry"]].reshape(n)[:n0],
            st[_ST["rz"]].reshape(n)[:n0],
        ],
        axis=-1,
    )
    ray_count = st[_ST["rc"]].reshape(n)[:n0].astype(jnp.int32)
    return li, ray_count
