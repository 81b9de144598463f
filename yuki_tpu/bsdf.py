"""Branchless masked BSDF evaluation/sampling keyed by material type id.

TPU redesign of the reference's scratch-allocated trait-object stack
(yuki/src/materials/*, materials/bsdfs/*): there is no per-hit BSDF object;
instead every lane gathers its material row (scene/data.py MaterialArrays)
and all four material models are evaluated masked, then selected by type id.
Lobe math is a line-for-line *semantic* port of:

  Lambertian            bsdfs/lambertian.rs
  OrenNayar             bsdfs/oren_nayar.rs (A/B from sigma in radians)
  specular::Reflection / Transmission   bsdfs/specular.rs
  fresnel::{Dielectric, Conductor, Schlick}  bsdfs/fresnel.rs
  MicrofacetReflection (Torrance-Sparrow)    bsdfs/microfacet.rs
  TrowbridgeReitzDistribution (GGX, non-visible-area sampling)
                        bsdfs/trowbridge_reitz.rs
  Bsdf::f / Bsdf::sample_f lobe-merging rules  bsdfs/mod.rs:125-222

Conventions: *_l vectors are in the local shading frame (z = shading
normal); all arrays are [N,...] wavefront lanes.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp

from .sampling import cosine_sample_hemisphere
from .scene.data import MAT_GLASS, MAT_GLOSSY, MAT_MATTE, MAT_METAL
from .surface import Surface
from .textures import eval_texture
from .gathers import rowgather
from .vecmath import cross, dot, is_black, normalize_safe

INV_PI = 1.0 / math.pi


class MatParams(NamedTuple):
    """Per-lane gathered material parameters (kd already texture-resolved)."""

    mtype: jnp.ndarray  # [N] i32
    c0: jnp.ndarray  # [N,3] kd / R / eta / Rs
    c1: jnp.ndarray  # [N,3] T / k
    s0: jnp.ndarray  # [N] sigma / eta / roughness
    alpha: jnp.ndarray  # [N] resolved GGX alpha (metal/glossy)


def roughness_to_alpha(roughness: jnp.ndarray) -> jnp.ndarray:
    """trowbridge_reitz.rs:22-30 log-poly fit."""
    x = jnp.log(jnp.maximum(roughness, 1e-3))
    return (
        1.62142
        + 0.819955 * x
        + 0.1734 * x * x
        + 0.0171201 * x * x * x
        + 0.000640711 * x * x * x * x
    )


def gather_materials(scene, si: Surface, meta=None) -> MatParams:
    mats = scene.materials
    mid = jnp.maximum(si.material, 0)
    # One wide gather (MaterialArrays.packed) instead of six narrow ones.
    row = rowgather(mats.packed, mid)
    mtype = row[..., 0].astype(jnp.int32)
    c0 = row[..., 1:4]
    c1 = row[..., 4:7]
    s0 = row[..., 7]
    remap = row[..., 8] > 0.5
    tex0 = row[..., 9].astype(jnp.int32)
    if meta is not None and not meta.has_textures:
        tex0 = jnp.full_like(tex0, -1)
    # Texture-resolve c0 (kd) where a texture is bound.
    tex_val = eval_texture(scene.textures, jnp.maximum(tex0, 0), si.uv)
    c0 = jnp.where((tex0 >= 0)[..., None], tex_val, c0)
    # Texture-resolve s0 (Texture<f32> sigma, matte.rs:22-41): float
    # textures store their value replicated across the atlas RGB row;
    # skipped at trace time unless the scene binds one.
    if meta is None or meta.has_sigma_tex:
        tex1 = row[..., 10].astype(jnp.int32)
        s0_tex = eval_texture(
            scene.textures, jnp.maximum(tex1, 0), si.uv
        )[..., 0]
        s0 = jnp.where(tex1 >= 0, s0_tex, s0)
    rough = jnp.where(remap, roughness_to_alpha(s0), s0)
    # Glossy squares its (possibly remapped) roughness (glossy.rs:49-52).
    rough = jnp.where(mtype == MAT_GLOSSY, rough * rough, rough)
    alpha = jnp.maximum(rough, 1e-3)  # TrowbridgeReitz::new clamp
    return MatParams(mtype=mtype, c0=c0, c1=c1, s0=s0, alpha=alpha)


# --- local-frame trig helpers (bsdfs/mod.rs:225-281) ---------------------


def _cos_theta(w):
    return w[..., 2]


def _cos2(w):
    return w[..., 2] * w[..., 2]


def _sin2(w):
    return jnp.maximum(0.0, 1.0 - _cos2(w))


def _sin_theta(w):
    return jnp.sqrt(_sin2(w))


def _tan2(w):
    return _sin2(w) / jnp.where(_cos2(w) == 0.0, 1e-30, _cos2(w))


def _cos_phi(w):
    st = _sin_theta(w)
    return jnp.where(st == 0.0, 1.0, jnp.clip(w[..., 0] / jnp.where(st == 0, 1.0, st), -1.0, 1.0))


def _sin_phi(w):
    st = _sin_theta(w)
    return jnp.where(st == 0.0, 1.0, jnp.clip(w[..., 1] / jnp.where(st == 0, 1.0, st), -1.0, 1.0))


def _same_hemisphere(w, wp):
    return w[..., 2] * wp[..., 2] > 0.0


def to_local(si: Surface, v: jnp.ndarray) -> jnp.ndarray:
    t = si.frame_t()
    return jnp.stack([dot(v, si.ss), dot(v, t), dot(v, si.ns)], axis=-1)


def to_world(si: Surface, v: jnp.ndarray) -> jnp.ndarray:
    t = si.frame_t()
    return (
        si.ss * v[..., 0:1] + t * v[..., 1:2] + si.ns * v[..., 2:3]
    )


# --- Fresnel (bsdfs/fresnel.rs) ------------------------------------------


def fresnel_dielectric(cos_theta_i, eta_i, eta_t):
    """Scalar dielectric Fresnel -> [N] (fresnel.rs:22-52)."""
    ci = jnp.clip(cos_theta_i, -1.0, 1.0)
    entering = ci > 0.0
    ei = jnp.where(entering, eta_i, eta_t)
    et = jnp.where(entering, eta_t, eta_i)
    ci = jnp.abs(ci)
    si_ = jnp.sqrt(jnp.maximum(0.0, 1.0 - ci * ci))
    st = ei / et * si_
    tir = st >= 1.0
    ct = jnp.sqrt(jnp.maximum(0.0, 1.0 - st * st))
    r_par = (et * ci - ei * ct) / jnp.maximum(et * ci + ei * ct, 1e-30)
    r_per = (ei * ci - et * ct) / jnp.maximum(ei * ci + et * ct, 1e-30)
    fr = 0.5 * (r_par * r_par + r_per * r_per)
    return jnp.where(tir, 1.0, fr)


def fresnel_conductor(cos_theta_i, eta, k):
    """[N,3] conductor Fresnel with eta_i=1 absorbed by caller
    (fresnel.rs:68-98)."""
    ci = jnp.minimum(jnp.abs(cos_theta_i), 1.0)[..., None]
    ci2 = ci * ci
    si2 = 1.0 - ci2
    eta2 = eta * eta
    etak2 = k * k
    t0 = eta2 - etak2 - si2
    a2b2 = jnp.sqrt(jnp.maximum(t0 * t0 + 4.0 * eta2 * etak2, 0.0))
    t1 = a2b2 + ci2
    a = jnp.sqrt(jnp.maximum(0.5 * (a2b2 + t0), 0.0))
    t2 = 2.0 * a * ci
    rs = (t1 - t2) / jnp.maximum(t1 + t2, 1e-30)
    t3 = ci2 * a2b2 + si2 * si2
    t4 = t2 * si2
    rp = rs * (t3 - t4) / jnp.maximum(t3 + t4, 1e-30)
    return 0.5 * (rp + rs)


def fresnel_schlick(cos_theta_i, rs):
    ci = jnp.clip(cos_theta_i, -1.0, 1.0)[..., None]
    p5 = (1.0 - ci) ** 2
    p5 = p5 * p5 * (1.0 - ci)
    return rs + (1.0 - rs) * p5


# --- GGX (bsdfs/trowbridge_reitz.rs) -------------------------------------


def ggx_d(wh, alpha):
    t2 = _tan2(wh)
    a2 = alpha * alpha
    c4 = _cos2(wh) * _cos2(wh)
    e = t2 / a2  # isotropic: cos2phi/a2 + sin2phi/a2 = 1/a2
    val = 1.0 / (math.pi * a2 * c4 * (1.0 + e) * (1.0 + e))
    return jnp.where(jnp.isfinite(t2) & (c4 > 0.0), val, 0.0)


def ggx_lambda(w, alpha):
    abs_tan = jnp.sqrt(jnp.maximum(_tan2(w), 0.0))
    a2t2 = (alpha * abs_tan) ** 2
    lam = (-1.0 + jnp.sqrt(1.0 + a2t2)) / 2.0
    return jnp.where(jnp.isfinite(abs_tan), lam, 0.0)


def ggx_g(wo, wi, alpha):
    return 1.0 / (1.0 + ggx_lambda(wo, alpha) + ggx_lambda(wi, alpha))


def ggx_sample_wh(wo, u, alpha):
    """Non-visible-area sampling (trowbridge_reitz.rs:60-74)."""
    u0 = u[..., 0]
    tan2t = alpha * alpha * u0 / jnp.maximum(1.0 - u0, 1e-7)
    ct = 1.0 / jnp.sqrt(1.0 + tan2t)
    phi = 2.0 * math.pi * u[..., 1]
    st = jnp.sqrt(jnp.maximum(0.0, 1.0 - ct * ct))
    wh = jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), ct], axis=-1)
    return jnp.where(_same_hemisphere(wo, wh)[..., None], wh, -wh)


def ggx_pdf(wh, alpha):
    return ggx_d(wh, alpha) * _cos_theta(wh)


def _microfacet_f(wo_l, wi_l, alpha, fr):
    """Torrance-Sparrow with R=1 premultiplied by caller's fresnel value fr
    [N,3] (microfacet.rs:52-71)."""
    cto = jnp.abs(_cos_theta(wo_l))
    cti = jnp.abs(_cos_theta(wi_l))
    wh = wi_l + wo_l
    wh_ok = jnp.any(wh != 0.0, axis=-1) & (cto > 0.0) & (cti > 0.0)
    wh = normalize_safe(wh)
    d = ggx_d(wh, alpha)
    g = ggx_g(wo_l, wi_l, alpha)
    denom = jnp.maximum(4.0 * cti * cto, 1e-30)
    f = fr * (d * g / denom)[..., None]
    return jnp.where(wh_ok[..., None], f, 0.0)


def _microfacet_fresnel(mp: MatParams, wo_l, wi_l):
    """Fresnel term at the half-vector for metal (conductor) or glossy
    (Schlick). wh face-forwarded to +z (microfacet.rs:64-67)."""
    wh = normalize_safe(wi_l + wo_l)
    wh = jnp.where((wh[..., 2] < 0.0)[..., None], -wh, wh)
    ci = dot(wi_l, wh)
    fr_metal = fresnel_conductor(ci, mp.c0, mp.c1)
    fr_glossy = fresnel_schlick(ci, mp.c0)
    return jnp.where((mp.mtype == MAT_METAL)[..., None], fr_metal, fr_glossy)


# --- matte diffuse term --------------------------------------------------


def _matte_f(mp: MatParams, wo_l, wi_l, meta=None):
    """Lambertian when sigma==0, Oren-Nayar otherwise (matte.rs:22-41);
    both share kd*INV_PI scaling.  When the scene's static metadata says no
    matte material has sigma>0, the Oren-Nayar branch is skipped at trace
    time entirely."""
    lam = mp.c0 * INV_PI
    if meta is not None and not meta.has_sigma:
        return jnp.where(is_black(mp.c0)[..., None], 0.0, lam)
    sigma2 = mp.s0 * mp.s0
    a = 1.0 - sigma2 / (2.0 * (sigma2 + 0.33))
    b = 0.45 * sigma2 / (sigma2 + 0.09)
    # NOTE: OrenNayar::f receives (wo, wi) into params named (wi, wo)
    # (oren_nayar.rs:28) — the formula is symmetric, so evaluate as written.
    sti = _sin_theta(wo_l)
    sto = _sin_theta(wi_l)
    both = (sti > 1e-4) & (sto > 1e-4)
    d_cos = _cos_phi(wo_l) * _cos_phi(wi_l) + _sin_phi(wo_l) * _sin_phi(wi_l)
    max_cos = jnp.where(both, jnp.maximum(d_cos, 0.0), 0.0)
    cti = jnp.abs(_cos_theta(wo_l))
    cto = jnp.abs(_cos_theta(wi_l))
    first = cti > cto
    sin_alpha = jnp.where(first, sto, sti)
    tan_beta = jnp.where(
        first, sti / jnp.maximum(cti, 1e-30), sto / jnp.maximum(cto, 1e-30)
    )
    on = mp.c0 * (INV_PI * (a + b * max_cos * sin_alpha * tan_beta))[..., None]
    f = jnp.where((mp.s0 == 0.0)[..., None], lam, on)
    # Matte adds no lobe at all for black kd (matte.rs:31-38).
    return jnp.where(is_black(mp.c0)[..., None], 0.0, f)


# --- public API ----------------------------------------------------------


def bsdf_f(mp: MatParams, si: Surface, wo_w, wi_w, meta=None) -> jnp.ndarray:
    """Bsdf::f with BxdfType::all() (bsdfs/mod.rs:125-147): sums lobes that
    match the geometric-normal reflect/transmit side.  Material families
    absent from the scene (static metadata) are skipped at trace time."""
    wo_l = to_local(si, wo_w)
    wi_l = to_local(si, wi_w)
    reflect = (dot(wi_w, si.n) * dot(wo_w, si.n)) > 0.0

    present = (
        set(meta.material_types) if meta is not None
        else {MAT_MATTE, MAT_GLASS, MAT_METAL, MAT_GLOSSY}
    )
    has_matte = MAT_MATTE in present
    has_micro = (MAT_METAL in present) or (MAT_GLOSSY in present)

    f = jnp.zeros_like(mp.c0)
    if has_matte:
        f_matte = _matte_f(mp, wo_l, wi_l, meta)
        f = jnp.where((mp.mtype == MAT_MATTE)[..., None], f_matte, f)
    if has_micro:
        fr = _microfacet_fresnel(mp, wo_l, wi_l)
        f_micro = _microfacet_f(wo_l, wi_l, mp.alpha, fr)
        f = jnp.where(
            ((mp.mtype == MAT_METAL) | (mp.mtype == MAT_GLOSSY))[..., None],
            f_micro,
            f,
        )
    # Glass: both lobes specular -> f() sees nothing.
    # All non-glass lobes are REFLECTION lobes: zero on the transmit side.
    return jnp.where(reflect[..., None], f, 0.0)


class BsdfSample(NamedTuple):
    wi: jnp.ndarray  # [N,3] world
    f: jnp.ndarray  # [N,3]
    pdf: jnp.ndarray  # [N]
    is_specular: jnp.ndarray  # [N] bool
    is_transmission: jnp.ndarray  # [N] bool
    valid: jnp.ndarray  # [N] bool (pdf>0 and matched a lobe)


def bsdf_sample(mp: MatParams, si: Surface, wo_w, u, meta=None) -> BsdfSample:
    """Bsdf::sample_f with BxdfType::all() (bsdfs/mod.rs:150-222).

    When `meta` (SceneMeta) is given, whole material-family branches the
    scene never instantiates are dropped at trace time — the per-lane
    masked-select design means an absent family otherwise still costs its
    full lobe math on every lane of every bounce.
    """
    wo_l = to_local(si, wo_w)

    present = (
        set(meta.material_types) if meta is not None
        else {MAT_MATTE, MAT_GLASS, MAT_METAL, MAT_GLOSSY}
    )
    has_matte = MAT_MATTE in present
    has_glass = MAT_GLASS in present
    has_micro = (MAT_METAL in present) or (MAT_GLOSSY in present)

    zero3 = jnp.zeros_like(wo_l)
    zero1 = jnp.zeros_like(wo_l[..., 0])

    # -- matte branch (single diffuse lobe) --
    if has_matte:
        wi_mat = cosine_sample_hemisphere(u)
        wi_mat = jnp.where(
            (wo_l[..., 2] < 0.0)[..., None],
            wi_mat * jnp.array([1.0, 1.0, -1.0]),
            wi_mat,
        )
        pdf_mat = jnp.abs(_cos_theta(wi_mat)) * INV_PI
        f_mat = _matte_f(mp, wo_l, wi_mat, meta)
    else:
        wi_mat, pdf_mat, f_mat = zero3, zero1, zero3

    # -- glass branch (two specular lobes, pick by u0) --
    pick_refl = u[..., 0] < 0.5  # floor(u0*2) == 0
    if not has_glass:
        tir = jnp.zeros_like(pick_refl)
        wi_gl, f_gl, pdf_gl = zero3, zero3, zero1
    else:
        # reflection lobe (specular.rs:25-36)
        wi_re = jnp.stack([-wo_l[..., 0], -wo_l[..., 1], wo_l[..., 2]], axis=-1)
        ct_re = _cos_theta(wi_re)
        fr_re = fresnel_dielectric(ct_re, 1.0, mp.s0)
        f_re = mp.c0 * (fr_re / jnp.maximum(jnp.abs(ct_re), 1e-30))[..., None]
        # transmission lobe (specular.rs:69-95): n=(0,0,1) faceforwarded
        entering = _cos_theta(wo_l) > 0.0
        eta_i = jnp.where(entering, 1.0, mp.s0)
        eta_t = jnp.where(entering, mp.s0, 1.0)
        eta = eta_i / eta_t
        n_ff = jnp.where(entering, 1.0, -1.0)  # z of faceforwarded normal
        cti = n_ff * _cos_theta(wo_l)  # = |cos|
        s2ti = jnp.maximum(0.0, 1.0 - cti * cti)
        s2tt = eta * eta * s2ti
        tir = s2tt >= 1.0
        ctt = jnp.sqrt(jnp.maximum(0.0, 1.0 - s2tt))
        wi_tr = -wo_l * eta[..., None] + jnp.stack(
            [jnp.zeros_like(eta), jnp.zeros_like(eta), n_ff], axis=-1
        ) * (eta * cti - ctt)[..., None]
        ct_tr = _cos_theta(wi_tr)
        fr_tr = fresnel_dielectric(ct_tr, 1.0, mp.s0)
        f_tr = mp.c1 * (
            (1.0 - fr_tr) / jnp.maximum(jnp.abs(ct_tr), 1e-30)
        )[..., None]
        f_tr = jnp.where(tir[..., None], 0.0, f_tr)

        wi_gl = jnp.where(pick_refl[..., None], wi_re, wi_tr)
        f_gl = jnp.where(pick_refl[..., None], f_re, f_tr)
        gl_valid = pick_refl | ~tir
        pdf_gl = jnp.where(gl_valid, 0.5, 0.0)  # pdf 1 / matching_comps 2

    # -- microfacet branch (metal/glossy) --
    if has_micro:
        alpha = mp.alpha
        wh = ggx_sample_wh(wo_l, u, alpha)
        wi_mf = -wo_l + wh * (2.0 * dot(wo_l, wh))[..., None]
        mf_valid = (
            (wo_l[..., 2] != 0.0)
            & (dot(wo_l, wh) >= 0.0)
            & _same_hemisphere(wo_l, wi_mf)
        )
        pdf_mf = ggx_pdf(wh, alpha) / jnp.maximum(4.0 * dot(wo_l, wh), 1e-30)
        fr_mf = _microfacet_fresnel(mp, wo_l, wi_mf)
        f_mf = _microfacet_f(wo_l, wi_mf, alpha, fr_mf)
        pdf_mf = jnp.where(mf_valid, pdf_mf, 0.0)
        f_mf = jnp.where(mf_valid[..., None], f_mf, 0.0)
    else:
        wi_mf, f_mf, pdf_mf = zero3, zero3, zero1

    is_matte = mp.mtype == MAT_MATTE
    is_glass = mp.mtype == MAT_GLASS

    wi_l = jnp.where(
        is_matte[..., None],
        wi_mat,
        jnp.where(is_glass[..., None], wi_gl, wi_mf),
    )
    f = jnp.where(
        is_matte[..., None],
        f_mat,
        jnp.where(is_glass[..., None], f_gl, f_mf),
    )
    pdf = jnp.where(is_matte, pdf_mat, jnp.where(is_glass, pdf_gl, pdf_mf))
    valid = pdf > 0.0
    is_specular = is_glass
    is_transmission = is_glass & ~pick_refl & ~tir

    return BsdfSample(
        wi=to_world(si, wi_l),
        f=f,
        pdf=pdf,
        is_specular=is_specular,
        is_transmission=is_transmission,
        valid=valid,
    )


def bsdf_sample_specular(mp: MatParams, si: Surface, wo_w, transmission: bool) -> BsdfSample:
    """Bsdf::sample_f with SPECULAR|REFLECTION or SPECULAR|TRANSMISSION
    (whitted.rs:38-70): only glass lobes match; u is unused (fixed (0,0))."""
    wo_l = to_local(si, wo_w)
    is_glass = mp.mtype == MAT_GLASS
    if not transmission:
        wi_l = jnp.stack([-wo_l[..., 0], -wo_l[..., 1], wo_l[..., 2]], axis=-1)
        ct = _cos_theta(wi_l)
        fr = fresnel_dielectric(ct, 1.0, mp.s0)
        f = mp.c0 * (fr / jnp.maximum(jnp.abs(ct), 1e-30))[..., None]
        valid = is_glass
        is_trans = jnp.zeros_like(is_glass)
    else:
        entering = _cos_theta(wo_l) > 0.0
        eta_i = jnp.where(entering, 1.0, mp.s0)
        eta_t = jnp.where(entering, mp.s0, 1.0)
        eta = eta_i / eta_t
        n_ff = jnp.where(entering, 1.0, -1.0)
        cti = n_ff * _cos_theta(wo_l)
        s2tt = eta * eta * jnp.maximum(0.0, 1.0 - cti * cti)
        tir = s2tt >= 1.0
        ctt = jnp.sqrt(jnp.maximum(0.0, 1.0 - s2tt))
        wi_l = -wo_l * eta[..., None] + jnp.stack(
            [jnp.zeros_like(eta), jnp.zeros_like(eta), n_ff], axis=-1
        ) * (eta * cti - ctt)[..., None]
        ct = _cos_theta(wi_l)
        fr = fresnel_dielectric(ct, 1.0, mp.s0)
        f = mp.c1 * ((1.0 - fr) / jnp.maximum(jnp.abs(ct), 1e-30))[..., None]
        valid = is_glass & ~tir
        is_trans = valid
    f = jnp.where(valid[..., None], f, 0.0)
    return BsdfSample(
        wi=to_world(si, wi_l),
        f=f,
        pdf=jnp.where(valid, 1.0, 0.0),
        is_specular=valid,
        is_transmission=is_trans,
        valid=valid,
    )
