"""Batched ray/primitive intersection kernels.

All functions operate on whole wavefronts: rays are SoA ``[N,3]`` origin /
direction arrays plus ``[N]`` t_max, matching the framework-wide layout
(SURVEY.md §7 design stance).  These are the innermost compute of the
renderer and are written to stay fully on the VPU — no data-dependent
control flow, everything masked.

Reference parity:
  triangle test -> pbrt watertight test, yuki/src/shapes/triangle.rs:49-130.
    Divergence: the reference falls back to f64 when an edge function is
    exactly 0 (triangle.rs:96-103); TPU f64 is emulated and slow, so we stay
    in f32 and accept the (measure-zero) edge-on case resolving as a miss.
  sphere test   -> stable-q quadratic in object space, shapes/sphere.rs:37-125.
  AABB slab     -> Majercik et al. variant, math/bounds.rs:176-216.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .vecmath import cross, dot
from .transforms import apply_p_jax, apply_v_jax

F32_MAX = jnp.float32(3.4028235e38)


class TriHit(NamedTuple):
    """Closest-hit record for triangle tests. All [N]."""

    hit: jnp.ndarray  # bool
    t: jnp.ndarray
    b0: jnp.ndarray
    b1: jnp.ndarray


def _permute_axis(v, kx, ky, kz):
    """Per-lane component gather via selects (cheaper than gather on VPU)."""
    comp = lambda k: jnp.where(
        k == 0, v[..., 0], jnp.where(k == 1, v[..., 1], v[..., 2])
    )
    return comp(kx), comp(ky), comp(kz)


def ray_triangle(
    o: jnp.ndarray,
    d: jnp.ndarray,
    t_max: jnp.ndarray,
    p0: jnp.ndarray,
    p1: jnp.ndarray,
    p2: jnp.ndarray,
) -> TriHit:
    """Watertight ray/triangle test; one triangle per lane.

    o,d,p* are [N,3]; t_max is [N].  Returns hit mask, t and barycentrics
    (b2 = 1-b0-b1).
    """
    ad = jnp.abs(d)
    # kz = argmax |d|, then cyclic kx, ky (triangle.rs:66-70).
    kz = jnp.where(
        (ad[..., 0] > ad[..., 1]) & (ad[..., 0] > ad[..., 2]),
        0,
        jnp.where(ad[..., 1] > ad[..., 2], 1, 2),
    )
    kx = jnp.where(kz < 2, kz + 1, 0)
    ky = jnp.where(kx < 2, kx + 1, 0)

    p0t = p0 - o
    p1t = p1 - o
    p2t = p2 - o

    dx, dy, dz = _permute_axis(d, kx, ky, kz)
    p0x, p0y, p0z = _permute_axis(p0t, kx, ky, kz)
    p1x, p1y, p1z = _permute_axis(p1t, kx, ky, kz)
    p2x, p2y, p2z = _permute_axis(p2t, kx, ky, kz)

    # Shear so d lies on +z (triangle.rs:78-92).
    inv_dz = 1.0 / dz
    sx = -dx * inv_dz
    sy = -dy * inv_dz
    sz = inv_dz
    p0x = p0x + sx * p0z
    p0y = p0y + sy * p0z
    p1x = p1x + sx * p1z
    p1y = p1y + sy * p1z
    p2x = p2x + sx * p2z
    p2y = p2y + sy * p2z

    e0 = p1x * p2y - p1y * p2x
    e1 = p2x * p0y - p2y * p0x
    e2 = p0x * p1y - p0y * p1x

    any_neg = (e0 < 0.0) | (e1 < 0.0) | (e2 < 0.0)
    any_pos = (e0 > 0.0) | (e1 > 0.0) | (e2 > 0.0)
    miss_sign = any_neg & any_pos

    det = e0 + e1 + e2
    miss_det = det == 0.0
    det_safe = jnp.where(miss_det, 1.0, det)

    t_scaled = e0 * (p0z * sz) + e1 * (p1z * sz) + e2 * (p2z * sz)
    # Range test in scaled space (triangle.rs:119-124).
    miss_range = jnp.where(
        det < 0.0,
        (t_scaled >= 0.0) | (t_scaled < t_max * det),
        (t_scaled <= 0.0) | (t_scaled > t_max * det),
    )

    inv_det = 1.0 / det_safe
    t = t_scaled * inv_det
    b0 = e0 * inv_det
    b1 = e1 * inv_det

    hit = ~(miss_sign | miss_det | miss_range)
    return TriHit(hit=hit, t=jnp.where(hit, t, F32_MAX), b0=b0, b1=b1)


def slab_test(
    o: jnp.ndarray,
    inv_d: jnp.ndarray,
    t_max: jnp.ndarray,
    lo: jnp.ndarray,
    hi: jnp.ndarray,
) -> jnp.ndarray:
    """AABB hit predicate (bounds.rs:176-216): tmin<=tmax with
    tmin clamped at 0 and tmax at ray t_max. Returns bool [N].

    Uses NaN-suppressing fmin/fmax so a ray origin exactly on a slab plane
    (0 * inf = NaN) behaves like the reference's Rust f32 min/max, which
    ignore NaN operands."""
    t0 = (lo - o) * inv_d
    t1 = (hi - o) * inv_d
    tmin = jnp.max(jnp.fmin(t0, t1), axis=-1)
    tmax = jnp.min(jnp.fmax(t0, t1), axis=-1)
    return jnp.maximum(tmin, 0.0) <= jnp.minimum(tmax, t_max)


def slab_interval(o, inv_d, t_max, lo, hi):
    """Bounds3::intersections parity: returns (tmin, tmax, valid)."""
    t0 = (lo - o) * inv_d
    t1 = (hi - o) * inv_d
    tmin = jnp.maximum(jnp.max(jnp.fmin(t0, t1), axis=-1), 0.0)
    tmax = jnp.minimum(jnp.min(jnp.fmax(t0, t1), axis=-1), t_max)
    return tmin, tmax, tmin <= tmax


class SphereHit(NamedTuple):
    hit: jnp.ndarray
    t: jnp.ndarray
    sphere: jnp.ndarray  # winning sphere index, -1 if none


def transform_ray_components(m, o, d):
    """Apply a [4,4] world->object matrix to rays with pure component math
    (elementwise, fuses on the VPU — einsum/dot_general pads tiny dims to
    MXU tiles and is ~50x slower here)."""
    ox, oy, oz = o[..., 0], o[..., 1], o[..., 2]
    dx, dy, dz = d[..., 0], d[..., 1], d[..., 2]
    ro = jnp.stack(
        [
            m[0, 0] * ox + m[0, 1] * oy + m[0, 2] * oz + m[0, 3],
            m[1, 0] * ox + m[1, 1] * oy + m[1, 2] * oz + m[1, 3],
            m[2, 0] * ox + m[2, 1] * oy + m[2, 2] * oz + m[2, 3],
        ],
        axis=-1,
    )
    rd = jnp.stack(
        [
            m[0, 0] * dx + m[0, 1] * dy + m[0, 2] * dz,
            m[1, 0] * dx + m[1, 1] * dy + m[1, 2] * dz,
            m[2, 0] * dx + m[2, 1] * dy + m[2, 2] * dz,
        ],
        axis=-1,
    )
    return ro, rd


def ray_spheres(o, d, t_max, spheres) -> SphereHit:
    """Brute-force closest hit over all spheres (object-space stable-q
    quadratic, sphere.rs:37-89).  S is small; unrolled at trace time."""
    n_spheres = spheres.radius.shape[0]
    best_t = jnp.full(o.shape[:-1], F32_MAX)
    best_i = jnp.full(o.shape[:-1], -1, dtype=jnp.int32)
    for s in range(n_spheres):
        w2o = spheres.world_to_obj[s]
        ro, rd = transform_ray_components(w2o, o, d)
        radius = spheres.radius[s]
        a = dot(rd, rd)
        b = 2.0 * dot(rd, ro)
        c = dot(ro, ro) - radius * radius
        discrim = b * b - 4.0 * a * c
        has_root = discrim >= 0.0
        rt = jnp.sqrt(jnp.maximum(discrim, 0.0))
        q = jnp.where(b < 0.0, -0.5 * (b - rt), -0.5 * (b + rt))
        t0 = q / a
        # c/q with q==0 guarded (graze at origin).
        t1 = c / jnp.where(q == 0.0, 1e-30, q)
        lo_t = jnp.minimum(t0, t1)
        hi_t = jnp.maximum(t0, t1)
        miss = (lo_t > t_max) | (hi_t <= 0.0)
        t = jnp.where(lo_t <= 0.0, hi_t, lo_t)
        miss = miss | (t > t_max) | ~has_root
        closer = ~miss & (t < best_t)
        best_t = jnp.where(closer, t, best_t)
        best_i = jnp.where(closer, s, best_i)
    return SphereHit(hit=best_i >= 0, t=best_t, sphere=best_i)


class PrimHit(NamedTuple):
    """Scene-level closest hit: prim >= 0 is a triangle index, sphere >= 0 a
    sphere index (exclusive)."""

    hit: jnp.ndarray
    t: jnp.ndarray
    prim: jnp.ndarray
    sphere: jnp.ndarray
    b0: jnp.ndarray
    b1: jnp.ndarray


def brute_force_triangles(o, d, t_max, tris) -> TriHit | tuple:
    """Reference-free O(T) closest hit for small scenes & traversal tests."""
    n = tris.p0.shape[0]
    best = TriHit(
        hit=jnp.zeros(o.shape[:-1], bool),
        t=jnp.full(o.shape[:-1], F32_MAX),
        b0=jnp.zeros(o.shape[:-1]),
        b1=jnp.zeros(o.shape[:-1]),
    )
    best_prim = jnp.full(o.shape[:-1], -1, dtype=jnp.int32)
    t_cur = t_max
    for i in range(n):
        h = ray_triangle(o, d, t_cur, tris.p0[i], tris.p1[i], tris.p2[i])
        closer = h.hit & (h.t < best.t)
        best = TriHit(
            hit=best.hit | closer,
            t=jnp.where(closer, h.t, best.t),
            b0=jnp.where(closer, h.b0, best.b0),
            b1=jnp.where(closer, h.b1, best.b1),
        )
        best_prim = jnp.where(closer, i, best_prim)
        t_cur = jnp.where(closer, h.t, t_cur)
    return best, best_prim
