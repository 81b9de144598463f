"""Fused per-bounce shading megakernel (the "shade megakernel" —
round-1/2/3 verdict queue item).

Why: Cornell's production d5 wave spent ~62 ms of 85 in XLA shading
glue even though every pass's pure compute is sub-millisecond — the
masked-select wavefront shading (make_surface -> gather_materials ->
_nee_setup -> bsdf_sample -> RR) materializes ~40 [N,3] temporaries
per pass, each padded to the (8,128) tile layout, so per-bounce cost
is dominated by HBM relayout traffic XLA does not fuse away
(benchmarks/r3_shade_soa.py, r3_shadeknock.py).  This kernel runs the
ENTIRE per-bounce shading chain for 1024-ray blocks out of VMEM:
inputs are the gathered rows + hit/ray planes, outputs are the next
bounce's rays, NEE shadow rays + contributions, updated beta and
liveness — nothing between touches HBM.

The math is a straight SoA port, formula-for-formula, of:
  surface.make_surface          (interaction.rs / triangle.rs:186-224,
                                 sphere.rs:91-150)
  bsdf.gather_materials tail    (matte.rs:22-41, trowbridge_reitz.rs:22-30)
  integrators._nee_setup        (path.rs:102-124)
  lights.sample_li (4 types)    (point/spot/rectangular/distant_light.rs)
  lights.area_light_radiance    (rectangular_light.rs:74-82)
  bsdf.bsdf_f / bsdf.bsdf_sample (bsdfs/mod.rs:125-222 + lobe files)
  integrators.path_li shade tail (path.rs:126-178: beta, RR)

GATHERS STAY IN XLA (shade_precompute): the [N,32] triangle shading
row, the [N,16] material row, and texture resolution for kd/sigma —
per-lane table gathers are the one thing Mosaic cannot do on the lane
dimension.  Everything downstream of the gathers fuses here.

Static gates (fused_shade_supported): UniformSampler only (the
stratified permutation's rejection loop is a per-lane while_loop),
and every sphere's material must be untextured (sphere UV needs
arctan2/arccos, which the kernel skips; sphere lanes' uv is only ever
consumed by texture lookups).

Layout: every [N] plane rides a [P, R, 128] stacked ref, one (P, 8,
128) block (= 1024 rays) per grid step, so each elementwise op fills
the full (8,128) VPU tile.  Booleans cross the kernel boundary as
f32 0/1 planes; u32 hashing runs in i32 with wrapping multiplies and
logical shifts (bit-identical).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene.data import (
    LIGHT_DISTANT,
    LIGHT_POINT,
    LIGHT_RECT,
    LIGHT_SPOT,
    MAT_GLASS,
    MAT_GLOSSY,
    MAT_MATTE,
    MAT_METAL,
)

LANES = 128
BLOCK_RAYS = 8 * LANES  # rays per grid step

INV_PI = 1.0 / math.pi

# Input plane indices (the f32 "ray/hit/carry" stack).
_RH = dict(
    ox=0, oy=1, oz=2, dx=3, dy=4, dz=5, t=6, b0=7, b1=8, sph=9,
    alive=10, bx=11, by=12, bz=13, spec=14, pad=15,
)
_N_RH = 16

# Material-row plane indices (kd/s0 pre-resolved against textures).
_MP = dict(mtype=0, kdx=1, kdy=2, kdz=3, c1x=4, c1y=5, c1z=6, s0=7,
           remap=8)
_N_MP = 16  # padded to a sublane multiple of 8 twice over

# Output plane indices.
_OUT = dict(
    o2x=0, o2y=1, o2z=2, d2x=3, d2y=4, d2z=5,
    b2x=6, b2y=7, b2z=8, alive2=9, spec2=10,
    nex=11, ney=12, nez=13, pad0=14, pad1=15,
)
_N_FIXED_OUT = 16
_N_PER_LIGHT = 12  # no(3) nd(3) nt worth cx cy cz pad


def _fused_n_out(n_lights: int) -> int:
    return _N_FIXED_OUT + _N_PER_LIGHT * n_lights


# --------------------------------------------------------------------
# SoA vector helpers: vectors are (x, y, z) tuples of (8,128) arrays.
# --------------------------------------------------------------------


def _dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _cross(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def _scale(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def _add(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def _sub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def _neg(a):
    return (-a[0], -a[1], -a[2])


def _where3(c, a, b):
    return (
        jnp.where(c, a[0], b[0]),
        jnp.where(c, a[1], b[1]),
        jnp.where(c, a[2], b[2]),
    )


def _normalize_safe(a):
    """Matches vecmath.normalize_safe: v / max(|v|, 1e-20)."""
    l = jnp.sqrt(_dot(a, a))
    inv = 1.0 / jnp.maximum(l, 1e-20)
    return _scale(a, inv)


def _length_sqr(a):
    return _dot(a, a)


def _coordinate_system(v1):
    """vecmath.coordinate_system port (math/mod.rs:30 with the typo fix):
    branch on |x| > |y|."""
    ax, ay = jnp.abs(v1[0]), jnp.abs(v1[1])
    use_x = ax > ay
    inv_a = 1.0 / jnp.sqrt(jnp.maximum(v1[0] * v1[0] + v1[2] * v1[2], 1e-40))
    inv_b = 1.0 / jnp.sqrt(jnp.maximum(v1[1] * v1[1] + v1[2] * v1[2], 1e-40))
    v2 = (
        jnp.where(use_x, -v1[2] * inv_a, jnp.zeros_like(v1[0])),
        jnp.where(use_x, jnp.zeros_like(v1[0]), v1[2] * inv_b),
        jnp.where(use_x, v1[0] * inv_a, -v1[1] * inv_b),
    )
    return v2, _cross(v1, v2)


def _face_forward(n, v):
    flip = _dot(n, v) < 0.0
    return _where3(flip, _neg(n), n)


def _is_black(c):
    return (c[0] == 0.0) & (c[1] == 0.0) & (c[2] == 0.0)


# --------------------------------------------------------------------
# In-kernel stateless sampler (sampling.py port, i32 wrapping math).
# --------------------------------------------------------------------


def _pcg(x):
    """pcg_hash on i32 planes (bit-identical to the u32 form: i32
    multiplies wrap two's-complement; shifts are explicit logical)."""
    state = x * jnp.int32(747796405) + jnp.int32(-1403630843)  # 2891336453
    shift = jax.lax.shift_right_logical(state, jnp.int32(28)) + jnp.int32(4)
    word = (
        jax.lax.shift_right_logical(state, shift) ^ state
    ) * jnp.int32(277803737)
    return jax.lax.shift_right_logical(word, jnp.int32(22)) ^ word


def _dim_f32(ph_base, dim):
    """sampling._dim_u32 + u32_to_unit_float given ph_base =
    pcg(pixel_hash ^ sample_index) (precomputed per lane in XLA)."""
    u = _pcg(ph_base ^ dim)
    return jax.lax.shift_right_logical(u, jnp.int32(8)).astype(
        jnp.float32
    ) * jnp.float32(1.0 / (1 << 24))


# --------------------------------------------------------------------
# BSDF lobes on SoA local-frame planes (bsdf.py port).
# --------------------------------------------------------------------


def _fresnel_dielectric(ct, eta_i, eta_t):
    ci = jnp.clip(ct, -1.0, 1.0)
    entering = ci > 0.0
    ei = jnp.where(entering, eta_i, eta_t)
    et = jnp.where(entering, eta_t, eta_i)
    ci = jnp.abs(ci)
    si_ = jnp.sqrt(jnp.maximum(0.0, 1.0 - ci * ci))
    st = ei / et * si_
    tir = st >= 1.0
    ctt = jnp.sqrt(jnp.maximum(0.0, 1.0 - st * st))
    r_par = (et * ci - ei * ctt) / jnp.maximum(et * ci + ei * ctt, 1e-30)
    r_per = (ei * ci - et * ctt) / jnp.maximum(ei * ci + et * ctt, 1e-30)
    fr = 0.5 * (r_par * r_par + r_per * r_per)
    return jnp.where(tir, 1.0, fr)


def _fresnel_conductor3(ct, eta, k):
    """Per-channel conductor Fresnel; eta/k are 3-tuples of planes."""
    ci = jnp.minimum(jnp.abs(ct), 1.0)
    ci2 = ci * ci
    si2 = 1.0 - ci2
    out = []
    for c in range(3):
        eta2 = eta[c] * eta[c]
        etak2 = k[c] * k[c]
        t0 = eta2 - etak2 - si2
        a2b2 = jnp.sqrt(jnp.maximum(t0 * t0 + 4.0 * eta2 * etak2, 0.0))
        t1 = a2b2 + ci2
        a = jnp.sqrt(jnp.maximum(0.5 * (a2b2 + t0), 0.0))
        t2 = 2.0 * a * ci
        rs = (t1 - t2) / jnp.maximum(t1 + t2, 1e-30)
        t3 = ci2 * a2b2 + si2 * si2
        t4 = t2 * si2
        rp = rs * (t3 - t4) / jnp.maximum(t3 + t4, 1e-30)
        out.append(0.5 * (rp + rs))
    return tuple(out)


def _fresnel_schlick3(ct, rs):
    ci = jnp.clip(ct, -1.0, 1.0)
    p5 = (1.0 - ci) ** 2
    p5 = p5 * p5 * (1.0 - ci)
    return tuple(rs[c] + (1.0 - rs[c]) * p5 for c in range(3))


def _cos2(w):
    return w[2] * w[2]


def _sin2(w):
    return jnp.maximum(0.0, 1.0 - _cos2(w))


def _tan2(w):
    c2 = _cos2(w)
    return _sin2(w) / jnp.where(c2 == 0.0, 1e-30, c2)


def _ggx_d(wh, alpha):
    t2 = _tan2(wh)
    a2 = alpha * alpha
    c4 = _cos2(wh) * _cos2(wh)
    e = t2 / a2
    val = 1.0 / (math.pi * a2 * c4 * (1.0 + e) * (1.0 + e))
    return jnp.where(jnp.isfinite(t2) & (c4 > 0.0), val, 0.0)


def _ggx_lambda(w, alpha):
    abs_tan = jnp.sqrt(jnp.maximum(_tan2(w), 0.0))
    a2t2 = (alpha * abs_tan) ** 2
    lam = (-1.0 + jnp.sqrt(1.0 + a2t2)) / 2.0
    return jnp.where(jnp.isfinite(abs_tan), lam, 0.0)


def _ggx_g(wo, wi, alpha):
    return 1.0 / (1.0 + _ggx_lambda(wo, alpha) + _ggx_lambda(wi, alpha))


def _microfacet_fresnel(has_metal, has_glossy, mtype, c0, c1, wo_l, wi_l):
    wh = _normalize_safe(_add(wi_l, wo_l))
    wh = _where3(wh[2] < 0.0, _neg(wh), wh)
    ci = _dot(wi_l, wh)
    if has_metal and has_glossy:
        fr_m = _fresnel_conductor3(ci, c0, c1)
        fr_g = _fresnel_schlick3(ci, c0)
        is_m = mtype == MAT_METAL
        return _where3(is_m, fr_m, fr_g)
    if has_metal:
        return _fresnel_conductor3(ci, c0, c1)
    return _fresnel_schlick3(ci, c0)


def _microfacet_f(wo_l, wi_l, alpha, fr):
    cto = jnp.abs(wo_l[2])
    cti = jnp.abs(wi_l[2])
    wh_raw = _add(wi_l, wo_l)
    wh_ok = (
        ((wh_raw[0] != 0.0) | (wh_raw[1] != 0.0) | (wh_raw[2] != 0.0))
        & (cto > 0.0)
        & (cti > 0.0)
    )
    wh = _normalize_safe(wh_raw)
    d = _ggx_d(wh, alpha)
    g = _ggx_g(wo_l, wi_l, alpha)
    denom = jnp.maximum(4.0 * cti * cto, 1e-30)
    s = d * g / denom
    return tuple(jnp.where(wh_ok, fr[c] * s, 0.0) for c in range(3))


def _matte_f(has_sigma, kd, s0, wo_l, wi_l):
    lam = _scale(kd, jnp.full_like(kd[0], INV_PI))
    if not has_sigma:
        f = lam
    else:
        sigma2 = s0 * s0
        a = 1.0 - sigma2 / (2.0 * (sigma2 + 0.33))
        b = 0.45 * sigma2 / (sigma2 + 0.09)
        sti = jnp.sqrt(_sin2(wo_l))
        sto = jnp.sqrt(_sin2(wi_l))

        def cos_phi(w, st):
            return jnp.where(
                st == 0.0, 1.0,
                jnp.clip(w[0] / jnp.where(st == 0, 1.0, st), -1.0, 1.0),
            )

        def sin_phi(w, st):
            return jnp.where(
                st == 0.0, 1.0,
                jnp.clip(w[1] / jnp.where(st == 0, 1.0, st), -1.0, 1.0),
            )

        both = (sti > 1e-4) & (sto > 1e-4)
        d_cos = cos_phi(wo_l, sti) * cos_phi(wi_l, sto) + sin_phi(
            wo_l, sti
        ) * sin_phi(wi_l, sto)
        max_cos = jnp.where(both, jnp.maximum(d_cos, 0.0), 0.0)
        cti = jnp.abs(wo_l[2])
        cto = jnp.abs(wi_l[2])
        first = cti > cto
        sin_alpha = jnp.where(first, sto, sti)
        tan_beta = jnp.where(
            first, sti / jnp.maximum(cti, 1e-30),
            sto / jnp.maximum(cto, 1e-30),
        )
        on_s = INV_PI * (a + b * max_cos * sin_alpha * tan_beta)
        on = _scale(kd, on_s)
        is_lam = s0 == 0.0
        f = _where3(is_lam, lam, on)
    black = _is_black(kd)
    return _where3(black, (jnp.zeros_like(kd[0]),) * 3, f)


# --------------------------------------------------------------------
# The kernel
# --------------------------------------------------------------------


def _shade_body(dim0, bounce, rh, tr, mp, ltab, spm, center, diag, ph_base,
                *, n_lights, light_types, n_spheres, present, has_sigma,
                urand=None):
    """The whole per-bounce shading chain on (8,128) SoA planes, reader-
    callback form so multiple kernels share ONE source of truth for the
    math (parity-tested against the XLA chain):
      rh(name) -> ray/hit/carry plane (indices _RH)
      tr(i)    -> triangle shading-row plane i (scene.tris.shading_packed
                  column i, gathered per lane by the caller — either from
                  pre-gathered input planes or an in-kernel one-hot select)
      mp(name) -> material plane (_MP; kd/s0 already texture-resolved)
      ltab(li,i) -> light-table scalar, spm(s,i) -> sphere-table scalar
      center (3 scalars) / diag: scene bounds info for ray parking
    Returns (o2, d2, beta2[3], alive2, spec2, ne[3], nee) where nee is a
    per-light list of (o_s[3], d_s[3], t_s, worth, contrib[3]).

    ``urand(k)`` (k a STATIC in-bounce dim offset, 0..dims_per_bounce-3)
    supplies the bounce's random numbers.  Default: the UniformSampler
    in-kernel hash _dim_f32(ph_base, dim0 + k).  The stratified drivers
    pass a reader over precomputed sample planes instead (strata are
    path-independent, so they are hoisted to the XLA prologue —
    stratified.rs:104-146 semantics, VERDICT r3 item 4)."""
    if urand is None:
        def urand(k):
            return _dim_f32(ph_base, dim0 + jnp.int32(k))
    o = (rh("ox"), rh("oy"), rh("oz"))
    d = (rh("dx"), rh("dy"), rh("dz"))
    wo = _neg(d)
    t_hit = rh("t")
    b0 = rh("b0")
    b1 = rh("b1")
    sph = rh("sph")
    alive = rh("alive") > 0.0
    beta = (rh("bx"), rh("by"), rh("bz"))

    # ---- triangle surface (surface.make_surface port) ----------------
    p0 = (tr(0), tr(1), tr(2))
    p1 = (tr(3), tr(4), tr(5))
    p2 = (tr(6), tr(7), tr(8))
    n0 = (tr(9), tr(10), tr(11))
    n1 = (tr(12), tr(13), tr(14))
    n2 = (tr(15), tr(16), tr(17))
    uv0 = (tr(18), tr(19))
    uv1 = (tr(20), tr(21))
    uv2 = (tr(22), tr(23))
    has_ns = tr(24) > 0.5
    swaps = tr(25) > 0.5
    area_light = tr(27)  # f32 id, -1 none
    b2 = 1.0 - b0 - b1

    p_tri = _add(_add(_scale(p0, b0), _scale(p1, b1)), _scale(p2, b2))

    dp02 = _sub(p0, p2)
    dp12 = _sub(p1, p2)
    duv02 = (uv0[0] - uv2[0], uv0[1] - uv2[1])
    duv12 = (uv1[0] - uv2[0], uv1[1] - uv2[1])
    uv_det = duv02[0] * duv12[1] - duv02[1] * duv12[0]
    degen_uv = uv_det == 0.0
    inv_uv_det = 1.0 / jnp.where(degen_uv, 1.0, uv_det)
    dpdu = _scale(
        _sub(_scale(dp02, duv12[1]), _scale(dp12, duv02[1])), inv_uv_det
    )
    n_fallback = _normalize_safe(_cross(_sub(p2, p0), _sub(p1, p0)))
    cs_u, _ = _coordinate_system(n_fallback)
    dpdu = _where3(degen_uv, cs_u, dpdu)

    n_wind = _normalize_safe(_cross(dp02, dp12))
    n_wind = _where3(swaps, _neg(n_wind), n_wind)

    ns_raw = _add(_add(_scale(n0, b0), _scale(n1, b1)), _scale(n2, b2))
    ns_ok = _length_sqr(ns_raw) > 0.0
    ns_auth = _where3(ns_ok, _normalize_safe(ns_raw), n_wind)
    ss0 = _normalize_safe(dpdu)
    ts_raw = _cross(ss0, ns_auth)
    ts_ok = _length_sqr(ts_raw) > 0.0
    ts_n = _normalize_safe(ts_raw)
    ss_auth = _cross(ts_n, ns_auth)
    cs_s, cs_t = _coordinate_system(ns_auth)
    ss_auth = _where3(ts_ok, ss_auth, cs_s)
    ns_tri = _where3(has_ns, ns_auth, n_wind)
    ss_tri = _where3(has_ns, ss_auth, ss0)
    n_tri = _where3(has_ns, _face_forward(n_wind, ns_auth), n_wind)

    # ---- sphere surface (no uv; gated on untextured sphere materials)
    s_p, s_n_, s_ss = p_tri, n_tri, ss_tri
    for s in range(n_spheres):
        sel = sph == float(s)

        def m(i, _s=s):  # sphere table scalars
            return spm(_s, i)

        # w2o rows 0..15, o2w rows 16..31, radius 32, swaps 33
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
        p_obj = _add(ro, _scale(rd, t_hit))
        scale_fix = radius / jnp.maximum(jnp.sqrt(_length_sqr(p_obj)), 1e-20)
        p_obj = _scale(p_obj, scale_fix)
        fix = (p_obj[0] == 0.0) & (p_obj[1] == 0.0)
        px_ = jnp.where(fix, 1e-5 * radius, p_obj[0])
        py_ = p_obj[1]
        pz_ = p_obj[2]
        # dpdu (phi_max absorbed by normalize): (-py, px, 0)
        dpdu_o = (-py_ * (2.0 * math.pi), px_ * (2.0 * math.pi),
                  jnp.zeros_like(px_))
        # n_obj: radial (cross(dpdu,dpdv) normalized == +-radial); the
        # XLA path computes it from dpdu x dpdv — for a sphere both give
        # the (possibly swapped) radial direction.  We keep the XLA
        # formula's sign by noting cross(dpdu_o, dpdv_o) ~ -radial *
        # sign(theta_span): theta_max-theta_min < 0 here, yielding
        # +radial overall; swaps flips it.
        n_obj = _normalize_safe((px_, py_, pz_))
        if True:  # swaps flag is a per-sphere scalar
            swp = m(33) > 0.5
            n_obj = _where3(swp, _neg(n_obj), n_obj)
        p_w = (
            m(16) * px_ + m(17) * py_ + m(18) * pz_ + m(19),
            m(20) * px_ + m(21) * py_ + m(22) * pz_ + m(23),
            m(24) * px_ + m(25) * py_ + m(26) * pz_ + m(27),
        )
        # normals by w2o^T
        n_w = _normalize_safe((
            m(0) * n_obj[0] + m(4) * n_obj[1] + m(8) * n_obj[2],
            m(1) * n_obj[0] + m(5) * n_obj[1] + m(9) * n_obj[2],
            m(2) * n_obj[0] + m(6) * n_obj[1] + m(10) * n_obj[2],
        ))
        dpdu_w = (
            m(16) * dpdu_o[0] + m(17) * dpdu_o[1] + m(18) * dpdu_o[2],
            m(20) * dpdu_o[0] + m(21) * dpdu_o[1] + m(22) * dpdu_o[2],
            m(24) * dpdu_o[0] + m(25) * dpdu_o[1] + m(26) * dpdu_o[2],
        )
        s_p = _where3(sel, p_w, s_p)
        s_n_ = _where3(sel, n_w, s_n_)
        s_ss = _where3(sel, _normalize_safe(dpdu_w), s_ss)

    is_sph = sph >= 0.0
    p = _where3(is_sph, s_p, p_tri)
    n = _where3(is_sph, s_n_, n_tri)
    ns = _where3(is_sph, s_n_, ns_tri)
    ss = _where3(is_sph, s_ss, ss_tri)
    area_light = jnp.where(is_sph, -1.0, area_light)
    ts_frame = _cross(ns, ss)  # Surface.frame_t

    # ---- materials (gather tail: alpha resolve) -----------------------
    mtype = mp("mtype").astype(jnp.int32)
    kd = (mp("kdx"), mp("kdy"), mp("kdz"))
    c1 = (mp("c1x"), mp("c1y"), mp("c1z"))
    s0 = mp("s0")
    remap = mp("remap") > 0.5
    x = jnp.log(jnp.maximum(s0, 1e-3))
    r2a = (
        1.62142 + 0.819955 * x + 0.1734 * x * x + 0.0171201 * x * x * x
        + 0.000640711 * x * x * x * x
    )
    rough = jnp.where(remap, r2a, s0)
    rough = jnp.where(mtype == MAT_GLOSSY, rough * rough, rough)
    alpha = jnp.maximum(rough, 1e-3)

    def matte_f(wo_l, wi_l):
        return _matte_f(has_sigma, kd, s0, wo_l, wi_l)

    def bsdf_f(wi_w):
        wo_l = (_dot(wo, ss), _dot(wo, ts_frame), _dot(wo, ns))
        wi_l = (_dot(wi_w, ss), _dot(wi_w, ts_frame), _dot(wi_w, ns))
        reflect = (_dot(wi_w, n) * _dot(wo, n)) > 0.0
        zero = jnp.zeros_like(b0)
        f = (zero, zero, zero)
        if MAT_MATTE in present:
            f = _where3(mtype == MAT_MATTE, matte_f(wo_l, wi_l), f)
        if (MAT_METAL in present) or (MAT_GLOSSY in present):
            fr = _microfacet_fresnel(
                MAT_METAL in present, MAT_GLOSSY in present, mtype, kd,
                c1, wo_l, wi_l,
            )
            fmf = _microfacet_f(wo_l, wi_l, alpha, fr)
            f = _where3(
                (mtype == MAT_METAL) | (mtype == MAT_GLOSSY), fmf, f
            )
        return _where3(reflect, f, (zero, zero, zero))

    zero = jnp.zeros_like(b0)

    # ---- NEE setup per light (static unroll) --------------------------
    nee = []
    for li_idx in range(n_lights):
        ltype = light_types[li_idx]
        u0 = urand(2 * li_idx)
        u1 = urand(2 * li_idx + 1)

        def lt(i, _li=li_idx):
            return ltab(_li, i)

        # light row: ltype 0 unused here; p 1..3; i 4..6; m 7..22
        # (row-major 4x4); area 23; cos_w 24; cos_f 25
        l_i = (lt(4), lt(5), lt(6))
        if ltype == LIGHT_POINT:
            lp = (lt(1), lt(2), lt(3))
            to_l = _sub(lp, p)
            d2 = jnp.maximum(_dot(to_l, to_l), 1e-30)
            li_v = _scale(l_i, 1.0 / d2)
            l_dir = _scale(to_l, 1.0 / jnp.sqrt(d2))
            pdf = jnp.ones_like(b0)
            target = (lp[0] + zero, lp[1] + zero, lp[2] + zero)
        elif ltype == LIGHT_SPOT:
            lp = (lt(1), lt(2), lt(3))
            to_l = _sub(lp, p)
            d2 = jnp.maximum(_dot(to_l, to_l), 1e-30)
            l_dir = _scale(to_l, 1.0 / jnp.sqrt(d2))
            nl = _neg(l_dir)
            dl = _normalize_safe((
                lt(7) * nl[0] + lt(8) * nl[1] + lt(9) * nl[2],
                lt(11) * nl[0] + lt(12) * nl[1] + lt(13) * nl[2],
                lt(15) * nl[0] + lt(16) * nl[1] + lt(17) * nl[2],
            ))
            ct = dl[2]
            cos_w, cos_f = lt(24), lt(25)
            delta = (ct - cos_w) / jnp.maximum(cos_f - cos_w, 1e-30)
            fall = jnp.where(
                ct < cos_w, 0.0,
                jnp.where(ct > cos_f, 1.0, (delta * delta) * (delta * delta)),
            )
            li_v = _scale(l_i, fall / d2)
            pdf = jnp.ones_like(b0)
            target = (lp[0] + zero, lp[1] + zero, lp[2] + zero)
        elif ltype == LIGHT_RECT:
            # p_s = s2w @ (u0, 0, u1)
            ps = (
                lt(7) * u0 + lt(9) * u1 + lt(10),
                lt(11) * u0 + lt(13) * u1 + lt(14),
                lt(15) * u0 + lt(17) * u1 + lt(18),
            )
            # normal = normalize(s2w_linear @ (0,-1,0)) — per-light const
            nln = jnp.sqrt(
                jnp.maximum(lt(8) ** 2 + lt(12) ** 2 + lt(16) ** 2, 1e-40)
            )
            ln = (-lt(8) / nln + zero, -lt(12) / nln + zero,
                  -lt(16) / nln + zero)
            wi_ = _normalize_safe(_sub(ps, p))
            ndw = _dot(ln, _neg(wi_))
            front = ndw > 0.0
            li_v = _where3(front, l_i, (zero, zero, zero))
            d2 = _dot(_sub(ps, p), _sub(ps, p))
            pdf = d2 / jnp.maximum(jnp.abs(ndw) * lt(23), 1e-30)
            l_dir = wi_
            target = ps
        elif ltype == LIGHT_DISTANT:
            w_dir = (lt(1), lt(2), lt(3))
            li_v = (l_i[0] + zero, l_i[1] + zero, l_i[2] + zero)
            l_dir = (w_dir[0] + zero, w_dir[1] + zero, w_dir[2] + zero)
            pdf = jnp.ones_like(b0)
            target = _add(p, _scale(l_dir, diag))
        else:
            raise ValueError(f"unknown light type {ltype}")

        f_nee = bsdf_f(l_dir)
        cos_ = jnp.clip(_dot(ns, l_dir), 0.0, 1.0)
        worth = (
            alive
            & ~_is_black(li_v)
            & ~_is_black(f_nee)
            & (cos_ > 0.0)
        )
        # spawn_ray_to: offset along +-geometric n toward target
        off = _scale(n, jnp.full_like(b0, 1e-3))
        side = _dot(_sub(target, p), n) > 0.0
        o_s = _where3(side, _add(p, off), _sub(p, off))
        d_s = _sub(target, o_s)
        o_s = _where3(worth, o_s, center)
        d_s = _where3(worth, d_s, (zero, zero, 1.0 + zero))
        t_s = jnp.where(worth, 0.9999, 0.0)
        contrib = tuple(
            f_nee[c] * li_v[c] * (cos_ / jnp.maximum(pdf, 1e-30))
            for c in range(3)
        )
        nee.append((o_s, d_s, t_s, worth, contrib))

    # ---- emitted (area_light_radiance, one-hot over L lights) --------
    # Scalar conditions broadcast by arithmetic (Mosaic-safe).
    emit0 = zero + (bounce == 0).astype(jnp.float32)
    emit_mask = (rh("spec") > 0.0) | (emit0 > 0.5)
    le = (zero, zero, zero)
    for li_idx in range(n_lights):
        sel = area_light == float(li_idx)
        le = _where3(
            sel,
            (ltab(li_idx, 4) + zero, ltab(li_idx, 5) + zero,
             ltab(li_idx, 6) + zero),
            le,
        )
    front_e = _dot(n, wo) > 0.0
    has_al = area_light >= 0.0
    emitted = _where3(has_al & front_e, le, (zero, zero, zero))
    ne = _where3(
        emit_mask,
        (beta[0] * emitted[0], beta[1] * emitted[1], beta[2] * emitted[2]),
        (zero, zero, zero),
    )

    # ---- bsdf_sample --------------------------------------------------
    u0 = urand(2 * n_lights)
    u1 = urand(2 * n_lights + 1)
    wo_l = (_dot(wo, ss), _dot(wo, ts_frame), _dot(wo, ns))

    has_matte = MAT_MATTE in present
    has_glass = MAT_GLASS in present
    has_micro = (MAT_METAL in present) or (MAT_GLOSSY in present)

    if has_matte:
        # cosine_sample_hemisphere(u) via concentric disk
        ox_ = u0 * 2.0 - 1.0
        oy_ = u1 * 2.0 - 1.0
        degen = (ox_ == 0.0) & (oy_ == 0.0)
        ox_s = jnp.where(ox_ == 0.0, 1.0, ox_)
        oy_s = jnp.where(oy_ == 0.0, 1.0, oy_)
        use_x = jnp.abs(ox_) > jnp.abs(oy_)
        theta = jnp.where(
            use_x,
            (math.pi / 4.0) * (oy_ / ox_s),
            (math.pi / 2.0) - (math.pi / 4.0) * (ox_ / oy_s),
        )
        r_ = jnp.where(use_x, ox_, oy_)
        dx_ = jnp.where(degen, 0.0, jnp.cos(theta) * r_)
        dy_ = jnp.where(degen, 0.0, jnp.sin(theta) * r_)
        z_ = jnp.sqrt(jnp.maximum(0.0, 1.0 - dx_ * dx_ - dy_ * dy_))
        wi_mat = (dx_, dy_, z_)
        wi_mat = _where3(wo_l[2] < 0.0, (dx_, dy_, -z_), wi_mat)
        pdf_mat = jnp.abs(wi_mat[2]) * INV_PI
        f_mat = _matte_f(has_sigma, kd, s0, wo_l, wi_mat)
    else:
        wi_mat, pdf_mat, f_mat = (zero, zero, zero), zero, (zero, zero, zero)

    pick_refl = u0 < 0.5
    if has_glass:
        wi_re = (-wo_l[0], -wo_l[1], wo_l[2])
        ct_re = wi_re[2]
        fr_re = _fresnel_dielectric(ct_re, 1.0, s0)
        sc_re = fr_re / jnp.maximum(jnp.abs(ct_re), 1e-30)
        f_re = _scale(kd, sc_re)
        entering = wo_l[2] > 0.0
        eta_i = jnp.where(entering, 1.0, s0)
        eta_t = jnp.where(entering, s0, 1.0)
        eta = eta_i / eta_t
        n_ff = jnp.where(entering, 1.0, -1.0)
        cti = n_ff * wo_l[2]
        s2ti = jnp.maximum(0.0, 1.0 - cti * cti)
        s2tt = eta * eta * s2ti
        tir = s2tt >= 1.0
        ctt = jnp.sqrt(jnp.maximum(0.0, 1.0 - s2tt))
        k_ = eta * cti - ctt
        wi_tr = (-wo_l[0] * eta, -wo_l[1] * eta, -wo_l[2] * eta + n_ff * k_)
        ct_tr = wi_tr[2]
        fr_tr = _fresnel_dielectric(ct_tr, 1.0, s0)
        sc_tr = (1.0 - fr_tr) / jnp.maximum(jnp.abs(ct_tr), 1e-30)
        f_tr = _scale(c1, sc_tr)
        f_tr = _where3(tir, (zero, zero, zero), f_tr)
        wi_gl = _where3(pick_refl, wi_re, wi_tr)
        f_gl = _where3(pick_refl, f_re, f_tr)
        gl_valid = pick_refl | ~tir
        pdf_gl = jnp.where(gl_valid, 0.5, 0.0)
    else:
        tir = jnp.zeros_like(pick_refl)
        wi_gl, f_gl, pdf_gl = (zero, zero, zero), (zero, zero, zero), zero

    if has_micro:
        # ggx_sample_wh (non-visible-area)
        tan2t = alpha * alpha * u0 / jnp.maximum(1.0 - u0, 1e-7)
        ct_h = 1.0 / jnp.sqrt(1.0 + tan2t)
        phi_h = 2.0 * math.pi * u1
        st_h = jnp.sqrt(jnp.maximum(0.0, 1.0 - ct_h * ct_h))
        wh = (st_h * jnp.cos(phi_h), st_h * jnp.sin(phi_h), ct_h)
        same_h = wo_l[2] * wh[2] > 0.0
        wh = _where3(same_h, wh, _neg(wh))
        dwh = _dot(wo_l, wh)
        wi_mf = _add(_neg(wo_l), _scale(wh, 2.0 * dwh))
        mf_valid = (
            (wo_l[2] != 0.0) & (dwh >= 0.0) & (wo_l[2] * wi_mf[2] > 0.0)
        )
        pdf_mf = (_ggx_d(wh, alpha) * wh[2]) / jnp.maximum(4.0 * dwh, 1e-30)
        fr_mf = _microfacet_fresnel(
            MAT_METAL in present, MAT_GLOSSY in present, mtype, kd, c1,
            wo_l, wi_mf,
        )
        f_mf = _microfacet_f(wo_l, wi_mf, alpha, fr_mf)
        pdf_mf = jnp.where(mf_valid, pdf_mf, 0.0)
        f_mf = _where3(mf_valid, f_mf, (zero, zero, zero))
    else:
        wi_mf, f_mf, pdf_mf = (zero, zero, zero), (zero, zero, zero), zero

    is_matte = mtype == MAT_MATTE
    is_glass = mtype == MAT_GLASS
    wi_l = _where3(is_matte, wi_mat, _where3(is_glass, wi_gl, wi_mf))
    f_s = _where3(is_matte, f_mat, _where3(is_glass, f_gl, f_mf))
    pdf = jnp.where(is_matte, pdf_mat, jnp.where(is_glass, pdf_gl, pdf_mf))
    spec2 = is_glass

    wi_w = (
        ss[0] * wi_l[0] + ts_frame[0] * wi_l[1] + ns[0] * wi_l[2],
        ss[1] * wi_l[0] + ts_frame[1] * wi_l[1] + ns[1] * wi_l[2],
        ss[2] * wi_l[0] + ts_frame[2] * wi_l[1] + ns[2] * wi_l[2],
    )

    terminated = _is_black(f_s) | (pdf == 0.0)
    alive2 = alive & ~terminated
    bscale = jnp.abs(_dot(wi_w, ns)) / jnp.maximum(pdf, 1e-30)
    beta2 = tuple(beta[c] * f_s[c] * bscale for c in range(3))
    finite = (
        jnp.isfinite(beta2[0]) & jnp.isfinite(beta2[1])
        & jnp.isfinite(beta2[2])
    )
    alive2 = alive2 & finite
    beta2 = _where3(finite, beta2, (zero, zero, zero))

    # spawn_ray + park
    off = _scale(n, jnp.full_like(b0, 1e-3))
    side = _dot(wi_w, n) > 0.0
    o2 = _where3(side, _add(p, off), _sub(p, off))
    o2 = _where3(alive2, o2, center)
    d2v = _where3(alive2, wi_w, (zero, zero, 1.0 + zero))

    # Russian roulette (after bounce 3); scalar rr_on broadcast by add.
    q = jnp.maximum(0.05, 1.0 - beta2[1])
    r_rr = urand(2 * n_lights + 2)
    rr_on = (zero + (bounce > 3).astype(jnp.float32)) > 0.5
    alive2 = alive2 & ~(rr_on & (r_rr < q))
    inv_keep = 1.0 / jnp.maximum(1.0 - q, 1e-30)
    beta2 = _where3(rr_on, _scale(beta2, inv_keep), beta2)

    return o2, d2v, beta2, alive2, spec2, ne, nee


def _shade_kernel(sc_ref, rh_ref, tr_ref, mp_ref, ph_ref, lt_ref, sp_ref,
                  ms_ref, out_ref, *, n_lights, light_types, n_spheres,
                  present, has_sigma, has_clamp, strat=False):
    """One grid step shades BLOCK_RAYS rays (thin wrapper over
    _shade_body reading pre-gathered input planes).

    refs: sc (scalar prefetch i32 [4]: dim0, bounce, sample_index unused
    in-kernel, flags), rh [16,8,128] rays/hit/carry, tr [32,8,128] tri
    shading row planes, mp [16,8,128] material row planes (kd/s0
    texture-resolved), ph [1,8,128] i32 pcg(pixel_hash^sample_index) —
    OR, when ``strat``, [2L+3,8,128] f32 precomputed stratified sample
    planes consumed positionally (the StratifiedSampler's strata are
    path-independent, hoisted to the XLA prologue) — lt [L,32] light
    table, sp [S,40] sphere table, ms [1,128] misc (center xyz, diag),
    out [OP,8,128]."""
    o2, d2v, beta2, alive2, spec2, ne, nee = _shade_body(
        sc_ref[0], sc_ref[1],
        rh=lambda name: rh_ref[_RH[name]],
        tr=lambda i: tr_ref[i],
        mp=lambda name: mp_ref[_MP[name]],
        ltab=lambda li, i: lt_ref[li, i],
        spm=lambda s, i: sp_ref[s, i],
        center=(ms_ref[0, 0], ms_ref[0, 1], ms_ref[0, 2]),
        diag=ms_ref[0, 3],
        ph_base=None if strat else ph_ref[0],
        n_lights=n_lights, light_types=light_types,
        n_spheres=n_spheres, present=present, has_sigma=has_sigma,
        urand=(lambda k: ph_ref[k]) if strat else None,
    )
    zero = jnp.zeros_like(o2[0])
    for li_idx, (o_s, d_s, t_s, worth, contrib) in enumerate(nee):
        ob = _N_FIXED_OUT + _N_PER_LIGHT * li_idx
        out_ref[ob + 0] = o_s[0]
        out_ref[ob + 1] = o_s[1]
        out_ref[ob + 2] = o_s[2]
        out_ref[ob + 3] = d_s[0]
        out_ref[ob + 4] = d_s[1]
        out_ref[ob + 5] = d_s[2]
        out_ref[ob + 6] = t_s
        out_ref[ob + 7] = worth.astype(jnp.float32)
        out_ref[ob + 8] = contrib[0]
        out_ref[ob + 9] = contrib[1]
        out_ref[ob + 10] = contrib[2]
        out_ref[ob + 11] = zero
    out_ref[_OUT["nex"]] = ne[0]
    out_ref[_OUT["ney"]] = ne[1]
    out_ref[_OUT["nez"]] = ne[2]
    out_ref[_OUT["o2x"]] = o2[0]
    out_ref[_OUT["o2y"]] = o2[1]
    out_ref[_OUT["o2z"]] = o2[2]
    out_ref[_OUT["d2x"]] = d2v[0]
    out_ref[_OUT["d2y"]] = d2v[1]
    out_ref[_OUT["d2z"]] = d2v[2]
    out_ref[_OUT["b2x"]] = beta2[0]
    out_ref[_OUT["b2y"]] = beta2[1]
    out_ref[_OUT["b2z"]] = beta2[2]
    out_ref[_OUT["alive2"]] = alive2.astype(jnp.float32)
    out_ref[_OUT["spec2"]] = spec2.astype(jnp.float32)
    out_ref[_OUT["pad0"]] = zero
    out_ref[_OUT["pad1"]] = zero


# --------------------------------------------------------------------
# Resolve kernel: everything between the occlusion verdict and the next
# trace — NEE resolve (path.rs:102-124 fold tail), the emit term, the
# indirect clamp, the background miss term, and the radiance update —
# fused so the per-bounce XLA remainder materializes nothing.
# --------------------------------------------------------------------


def _resolve_kernel(sc_ref, rh_ref, nee_ref, out_ref, *, n_lights,
                    has_clamp):
    """rh [16,8,128]: radiance xyz 0-2, beta xyz 3-5, alive 6, missed 7,
    ne xyz 8-10, bgx 11, bgy 12, bgz 13, clamp 14, pad 15 (bg/clamp ride
    as broadcast planes: they are per-render constants but traced).
    nee [4*L,8,128]: per light occ, worth, then contrib xyz interleaved
    (occ_0, worth_0, cx_0, cy_0 ... wait — layout is [L, 5] rows:
    occ, cx, cy, cz, worth).  out [4,8,128]: radiance2 xyz + pad."""
    bounce = sc_ref[1]
    rad = (rh_ref[0], rh_ref[1], rh_ref[2])
    beta = (rh_ref[3], rh_ref[4], rh_ref[5])
    alive = rh_ref[6] > 0.0
    missed = rh_ref[7] > 0.0
    ne = (rh_ref[8], rh_ref[9], rh_ref[10])
    bg = (rh_ref[11], rh_ref[12], rh_ref[13])
    clamp_v = rh_ref[14]
    zero = jnp.zeros_like(rh_ref[0])

    # background on miss (path.rs:155-160)
    rad = _where3(
        missed,
        (rad[0] + beta[0] * bg[0], rad[1] + beta[1] * bg[1],
         rad[2] + beta[2] * bg[2]),
        rad,
    )

    br = ne
    for li in range(n_lights):
        b = 5 * li
        occ = nee_ref[b] > 0.0
        cx, cy, cz = nee_ref[b + 1], nee_ref[b + 2], nee_ref[b + 3]
        worth = nee_ref[b + 4] > 0.0
        lit = worth & ~occ
        br = (
            br[0] + jnp.where(lit, cx, zero),
            br[1] + jnp.where(lit, cy, zero),
            br[2] + jnp.where(lit, cz, zero),
        )
    if has_clamp:
        clamped = (
            jnp.minimum(br[0], clamp_v),
            jnp.minimum(br[1], clamp_v),
            jnp.minimum(br[2], clamp_v),
        )
        past0 = (zero + (bounce > 0).astype(jnp.float32)) > 0.5
        br = _where3(past0, clamped, br)
    rad = _where3(
        alive,
        (rad[0] + beta[0] * br[0], rad[1] + beta[1] * br[1],
         rad[2] + beta[2] * br[2]),
        rad,
    )
    out_ref[0] = rad[0]
    out_ref[1] = rad[1]
    out_ref[2] = rad[2]
    out_ref[3] = zero


def resolve_fused(scene, radiance, beta, alive, missed, ne, occ, worth,
                  contrib, bounce, n_lights: int, indirect_clamp,
                  interpret: bool = False):
    """Fused NEE-resolve + emit + clamp + miss-background + radiance
    update.  occ/worth [L*N] light-major, contrib [L*N,3]; returns the
    updated radiance [N,3].  Bitwise policy matches path_li's XLA form
    (same select/add order)."""
    n0 = radiance.shape[0]
    n = -(-n0 // BLOCK_RAYS) * BLOCK_RAYS
    pad = n - n0

    def padv(a, fill=0.0):
        if pad == 0:
            return a
        if a.ndim == 1:
            return jnp.concatenate([a, jnp.full(pad, fill, a.dtype)])
        return jnp.concatenate(
            [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)]
        )

    def padl(a):
        """light-major [L*n0] -> [L*n] (pad each light block)."""
        if pad == 0:
            return a.reshape(n_lights, n0)
        return jnp.concatenate(
            [a.reshape(n_lights, n0),
             jnp.zeros((n_lights, pad), a.dtype)], axis=1,
        )

    radiance = padv(radiance)
    beta = padv(beta)
    alive = padv(alive, False)
    missed = padv(missed, False)
    ne = padv(ne)
    occ2 = padl(occ.astype(jnp.float32))
    worth2 = padl(worth.astype(jnp.float32))
    c2 = (
        contrib.reshape(n_lights, n0, 3)
        if pad == 0
        else jnp.concatenate(
            [contrib.reshape(n_lights, n0, 3),
             jnp.zeros((n_lights, pad, 3))], axis=1,
        )
    )
    rows = n // LANES

    def pl_(a):
        return a.reshape(rows, LANES)

    bgc = scene.background
    clamp_v = (
        jnp.float32(0.0) if indirect_clamp is None
        else jnp.asarray(indirect_clamp, jnp.float32)
    )
    rh = jnp.stack(
        [pl_(radiance[:, 0]), pl_(radiance[:, 1]), pl_(radiance[:, 2]),
         pl_(beta[:, 0]), pl_(beta[:, 1]), pl_(beta[:, 2]),
         pl_(alive.astype(jnp.float32)),
         pl_(missed.astype(jnp.float32)),
         pl_(ne[:, 0]), pl_(ne[:, 1]), pl_(ne[:, 2]),
         pl_(jnp.broadcast_to(bgc[0], (n,))),
         pl_(jnp.broadcast_to(bgc[1], (n,))),
         pl_(jnp.broadcast_to(bgc[2], (n,))),
         pl_(jnp.broadcast_to(clamp_v, (n,))),
         pl_(jnp.zeros(n))], axis=0,
    )
    nee_planes = []
    for li in range(n_lights):
        nee_planes += [
            pl_(occ2[li]), pl_(c2[li, :, 0]), pl_(c2[li, :, 1]),
            pl_(c2[li, :, 2]), pl_(worth2[li]),
        ]
    npad = (-len(nee_planes)) % 8
    nee_planes += [pl_(jnp.zeros(n))] * npad
    nee = jnp.stack(nee_planes, axis=0)

    sc = jnp.stack([
        jnp.int32(0), jnp.asarray(bounce, jnp.int32).reshape(()),
        jnp.int32(0), jnp.int32(0),
    ])
    grid = rows // 8
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((16, 8, LANES), lambda p, s: (0, p, 0)),
            pl.BlockSpec(
                (nee.shape[0], 8, LANES), lambda p, s: (0, p, 0)
            ),
        ],
        out_specs=[pl.BlockSpec((4, 8, LANES), lambda p, s: (0, p, 0))],
    )
    (out,) = pl.pallas_call(
        functools.partial(
            _resolve_kernel, n_lights=n_lights,
            has_clamp=indirect_clamp is not None,
        ),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((4, rows, LANES), jnp.float32)],
        interpret=interpret,
    )(sc, rh, nee)
    return jnp.stack(
        [out[0].reshape(n)[:n0], out[1].reshape(n)[:n0],
         out[2].reshape(n)[:n0]], axis=-1,
    )


# --------------------------------------------------------------------
# Host-side driver
# --------------------------------------------------------------------


def fused_shade_supported(scene, meta, sampler) -> bool:
    """Static gate: everything path_li's shade() needs must be
    expressible in the kernel.

    Decided from SceneMeta STATICS only.  The round-3 version probed
    np.asarray(scene.spheres.material) — under jit tracing (production:
    scene arrays are jit ARGUMENTS) that raises TracerArrayConversionError,
    which the try/except swallowed into False, silently running the slow
    XLA shading chain for every sphere scene (Cornell included) in every
    production render while all fused-path benchmarks (concrete arrays)
    showed the kernel winning.  Round-4 fix + regression test
    (tests/test_round4.py::test_fused_gate_under_tracing).

    Round-4: StratifiedSampler supported too — its strata are
    path-independent, so the driver hoists the bounce's 2L+3 sample
    values to an XLA prologue (the exact XLA-chain expressions,
    stratified.rs:104-146 semantics) and the kernel reads them as
    planes; the rejection loop never enters the kernel."""
    from ..sampling import StratifiedSampler, UniformSampler

    if not isinstance(sampler, (UniformSampler, StratifiedSampler)):
        return False
    # Sphere lanes skip uv: every sphere material must be untextured.
    return meta.n_spheres == 0 or meta.sphere_mats_untextured


def shade_fused(scene, meta, sampler, ctx, hit, o, d, beta, alive,
                specular_bounce, dim0, bounce, interpret: bool = False):
    """Drop-in replacement for path_li's shade() body.

    Returns the same tuple (o2, d2, beta2, alive2, spec2, no, nd, nt,
    ns_skip, nw, nc, ne) with the per-light NEE outputs flattened
    light-major exactly like _nee_setup.  XLA does only the gathers and
    the plane packing; the whole math chain runs in _shade_kernel."""
    from ..gathers import rowgather
    from ..textures import eval_texture

    n0 = o.shape[0]
    n_lights = len(meta.light_types)
    # Pad to a whole block (dead lanes: alive=0, benign hit row 0).
    n = -(-n0 // BLOCK_RAYS) * BLOCK_RAYS
    if n != n0:
        pad = n - n0

        def padv(a, fill=0.0):
            if a.ndim == 1:
                return jnp.concatenate(
                    [a, jnp.full(pad, fill, a.dtype)]
                )
            return jnp.concatenate(
                [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)]
            )

        o = padv(o)
        d = padv(d)
        beta = padv(beta)
        alive = padv(alive, False)
        specular_bounce = padv(specular_bounce, False)
        hit = type(hit)(
            hit=padv(hit.hit, False), t=padv(hit.t),
            prim=padv(hit.prim, -1), sphere=padv(hit.sphere, -1),
            b0=padv(hit.b0), b1=padv(hit.b1),
        )
        ctx = type(ctx)(
            px=padv(ctx.px), py=padv(ctx.py),
            sample_index=ctx.sample_index, seed=ctx.seed,
        )
    rows = n // LANES

    # ---- XLA pre-stage: the gathers ----------------------------------
    pr = jnp.maximum(hit.prim, 0)
    trow = rowgather(scene.tris.shading_packed, pr)  # [N,32]

    # material id (tri col 26, sphere override)
    mat_tri = trow[:, 26].astype(jnp.int32)
    n_spheres = int(scene.spheres.radius.shape[0])
    mid = mat_tri
    if n_spheres:
        for s in range(n_spheres):
            mid = jnp.where(hit.sphere == s, scene.spheres.material[s], mid)
    mrow = rowgather(scene.materials.packed, jnp.maximum(mid, 0))  # [N,16]

    # texture resolve for kd (and sigma): uv from the tri row (sphere
    # lanes pass garbage uv into masked-out lookups — their materials
    # are untextured by the support gate).
    kd = mrow[:, 1:4]
    s0 = mrow[:, 7]
    if meta.has_textures:
        b0c = hit.b0[:, None]
        b1c = hit.b1[:, None]
        b2c = 1.0 - b0c - b1c
        uv = trow[:, 18:20] * b0c + trow[:, 20:22] * b1c + trow[:, 22:24] * b2c
        tex0 = mrow[:, 9].astype(jnp.int32)
        tex_val = eval_texture(scene.textures, jnp.maximum(tex0, 0), uv)
        kd = jnp.where((tex0 >= 0)[:, None], tex_val, kd)
        if meta.has_sigma_tex:
            tex1 = mrow[:, 10].astype(jnp.int32)
            s0_tex = eval_texture(
                scene.textures, jnp.maximum(tex1, 0), uv
            )[..., 0]
            s0 = jnp.where(tex1 >= 0, s0_tex, s0)

    def planes(arrs):
        """[P] list of [N] -> [P, rows, 128]."""
        return jnp.stack([a.reshape(rows, LANES) for a in arrs], axis=0)

    rh = planes([
        o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
        hit.t, hit.b0, hit.b1, hit.sphere.astype(jnp.float32),
        alive.astype(jnp.float32), beta[:, 0], beta[:, 1], beta[:, 2],
        specular_bounce.astype(jnp.float32), jnp.zeros(n),
    ])
    tr = planes([trow[:, i] for i in range(32)])
    mp_arrs = [
        mrow[:, 0], kd[:, 0], kd[:, 1], kd[:, 2],
        mrow[:, 4], mrow[:, 5], mrow[:, 6], s0, mrow[:, 8],
    ] + [jnp.zeros(n)] * (_N_MP - 9)
    mp = planes(mp_arrs)

    from ..sampling import StratifiedSampler, pcg_hash, _u32

    strat = isinstance(sampler, StratifiedSampler)
    if strat:
        # Stratified prologue: the bounce's 2L+3 sample values computed
        # by the sampler itself (the exact XLA-chain calls from path_li,
        # so kernel parity is value-identical by construction).
        ur = []
        for li_idx in range(n_lights):
            u2 = sampler.get_2d(ctx, dim0 + 2 * li_idx)
            ur += [u2[..., 0], u2[..., 1]]
        u2 = sampler.get_2d(ctx, dim0 + 2 * n_lights)
        ur += [u2[..., 0], u2[..., 1],
               sampler.get_1d(ctx, dim0 + 2 * n_lights + 2)]
        ph = jnp.stack(
            [u.reshape(rows, LANES) for u in ur], axis=0
        )
    else:
        # pcg(pixel_hash ^ sample_index) precomputed
        # (sampling._dim_u32 inner)
        ph_base = pcg_hash(ctx.pixel_hash() ^ _u32(ctx.sample_index))
        ph = jax.lax.bitcast_convert_type(
            jnp.broadcast_to(ph_base, (n,)), jnp.int32
        ).reshape(1, rows, LANES)

    # light table [L, 32]
    L = scene.lights
    lt = jnp.concatenate(
        [
            L.ltype.astype(jnp.float32)[:, None],
            L.p, L.i, L.m.reshape(-1, 16),
            L.area[:, None], L.cos_w[:, None], L.cos_f[:, None],
            jnp.zeros((L.ltype.shape[0], 6)),
        ],
        axis=1,
    )

    # sphere table [S, 40]
    if n_spheres:
        sp = jnp.concatenate(
            [
                scene.spheres.world_to_obj.reshape(-1, 16),
                scene.spheres.obj_to_world.reshape(-1, 16),
                scene.spheres.radius[:, None],
                scene.spheres.swaps_hand.astype(jnp.float32)[:, None],
                jnp.zeros((n_spheres, 6)),
            ],
            axis=1,
        )
    else:
        sp = jnp.zeros((1, 40))

    center = 0.5 * (scene.world_lo + scene.world_hi)
    diag = jnp.linalg.norm(scene.world_hi - scene.world_lo) * 1.002 + 1e-3
    ms = jnp.zeros((1, LANES)).at[0, 0].set(center[0]).at[0, 1].set(
        center[1]
    ).at[0, 2].set(center[2]).at[0, 3].set(diag)

    sc = jnp.stack([
        jnp.asarray(dim0, jnp.int32).reshape(()),
        jnp.asarray(bounce, jnp.int32).reshape(()),
        jnp.int32(0), jnp.int32(0),
    ])

    n_out = _fused_n_out(n_lights)
    grid = rows // 8
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((_N_RH, 8, LANES), lambda p, s: (0, p, 0)),
            pl.BlockSpec((32, 8, LANES), lambda p, s: (0, p, 0)),
            pl.BlockSpec((_N_MP, 8, LANES), lambda p, s: (0, p, 0)),
            pl.BlockSpec((ph.shape[0], 8, LANES), lambda p, s: (0, p, 0)),
            pl.BlockSpec(lt.shape, lambda p, s: (0, 0)),
            pl.BlockSpec(sp.shape, lambda p, s: (0, 0)),
            pl.BlockSpec((1, LANES), lambda p, s: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((n_out, 8, LANES), lambda p, s: (0, p, 0))
        ],
    )
    (out,) = pl.pallas_call(
        functools.partial(
            _shade_kernel,
            n_lights=n_lights,
            light_types=tuple(meta.light_types),
            n_spheres=n_spheres,
            present=frozenset(meta.material_types),
            has_sigma=bool(meta.has_sigma or meta.has_sigma_tex),
            has_clamp=False,
            strat=strat,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_out, rows, LANES), jnp.float32)
        ],
        interpret=interpret,
    )(sc, rh, tr, mp, ph, lt, sp, ms)

    def plane(i):
        return out[i].reshape(n)

    def vec(i):
        return jnp.stack([plane(i), plane(i + 1), plane(i + 2)], axis=-1)

    o2 = vec(_OUT["o2x"])[:n0]
    d2 = vec(_OUT["d2x"])[:n0]
    beta2 = vec(_OUT["b2x"])[:n0]
    alive2 = plane(_OUT["alive2"])[:n0] > 0.0
    spec2 = plane(_OUT["spec2"])[:n0] > 0.0
    ne = vec(_OUT["nex"])[:n0]

    nos, nds, nts, nws, ncs, nss = [], [], [], [], [], []
    for li_idx in range(n_lights):
        ob = _N_FIXED_OUT + _N_PER_LIGHT * li_idx
        nos.append(vec(ob)[:n0])
        nds.append(vec(ob + 3)[:n0])
        nts.append(plane(ob + 6)[:n0])
        nws.append(plane(ob + 7)[:n0] > 0.0)
        ncs.append(vec(ob + 8)[:n0])
        # skip id is static per light (rect lights skip themselves)
        sk = (
            li_idx
            if meta.light_types[li_idx] == LIGHT_RECT
            else -2
        )
        nss.append(jnp.full(n0, sk, jnp.int32))
    no = jnp.concatenate(nos) if n_lights > 1 else nos[0]
    nd = jnp.concatenate(nds) if n_lights > 1 else nds[0]
    nt = jnp.concatenate(nts) if n_lights > 1 else nts[0]
    nw = jnp.concatenate(nws) if n_lights > 1 else nws[0]
    nc = jnp.concatenate(ncs) if n_lights > 1 else ncs[0]
    ns_skip = jnp.concatenate(nss) if n_lights > 1 else nss[0]

    return o2, d2, beta2, alive2, spec2, no, nd, nt, ns_skip, nw, nc, ne
