"""SoA surface-interaction construction from wavefront hits.

Replaces the reference's per-hit ``SurfaceInteraction`` object graph
(yuki/src/interaction.rs) with a NamedTuple of [N,...] arrays built in one
masked pass for triangles and spheres together.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .gathers import rowgather
from .vecmath import (
    coordinate_system,
    cross,
    dot,
    face_forward,
    length_sqr,
    normalize,
    normalize_safe,
)
from .transforms import apply_n_jax, apply_p_jax, apply_v_jax
from .traverse import SceneHit


class Surface(NamedTuple):
    """All [N,...]; lanes with valid=False hold safe garbage."""

    valid: jnp.ndarray
    p: jnp.ndarray  # [N,3] world hit point
    n: jnp.ndarray  # geometric normal (handedness- and shading-forwarded)
    ns: jnp.ndarray  # shading normal
    ss: jnp.ndarray  # shading frame tangent (normalized dpdu')
    uv: jnp.ndarray  # [N,2]
    wo: jnp.ndarray  # [N,3]
    material: jnp.ndarray  # [N] i32
    area_light: jnp.ndarray  # [N] i32 (-1 none)

    def frame_t(self) -> jnp.ndarray:
        """Bsdf bitangent t = n x s (materials/bsdfs/mod.rs:86-96)."""
        return cross(self.ns, self.ss)


def make_surface(scene, hit: SceneHit, o, d) -> Surface:
    """Build the shading record for each lane's winning primitive."""
    shape = hit.t.shape
    wo = -d

    # ---- triangle lanes -------------------------------------------------
    # One wide gather of the packed shading row per lane (see
    # TriangleArrays.shading_packed) — TPU gathers cost per *call*, so one
    # [N,32] fetch beats 17 narrow ones by a wide margin.
    pr = jnp.maximum(hit.prim, 0)
    row = rowgather(scene.tris.shading_packed, pr)  # [N,32]
    p0, p1, p2 = row[..., 0:3], row[..., 3:6], row[..., 6:9]
    n0, n1, n2 = row[..., 9:12], row[..., 12:15], row[..., 15:18]
    uv0, uv1, uv2 = row[..., 18:20], row[..., 20:22], row[..., 22:24]
    has = row[..., 24] > 0.5  # has_ns
    swaps = row[..., 25] > 0.5
    mat_tri = row[..., 26].astype(jnp.int32)
    al_tri = row[..., 27].astype(jnp.int32)
    b0 = hit.b0[..., None]
    b1 = hit.b1[..., None]
    b2 = 1.0 - b0 - b1

    p_tri = p0 * b0 + p1 * b1 + p2 * b2
    uv_tri = uv0 * b0 + uv1 * b1 + uv2 * b2

    dp02 = p0 - p2
    dp12 = p1 - p2
    duv02 = uv0 - uv2
    duv12 = uv1 - uv2
    uv_det = duv02[..., 0] * duv12[..., 1] - duv02[..., 1] * duv12[..., 0]
    degen_uv = uv_det == 0.0
    inv_uv_det = 1.0 / jnp.where(degen_uv, 1.0, uv_det)
    dpdu = (dp02 * duv12[..., 1:2] - dp12 * duv02[..., 1:2]) * inv_uv_det[..., None]
    n_fallback = normalize_safe(cross(p2 - p0, p1 - p0))
    cs_u, _cs_v = coordinate_system(n_fallback)
    dpdu = jnp.where(degen_uv[..., None], cs_u, dpdu)

    # Winding geometric normal with handedness flip (triangle.rs:186-196).
    n_wind = normalize_safe(cross(dp02, dp12))
    n_wind = jnp.where(swaps[..., None], -n_wind, n_wind)

    # Shading normal from authored vertex normals (triangle.rs:199-224).
    ns_raw = n0 * b0 + n1 * b1 + n2 * b2
    ns_ok = length_sqr(ns_raw) > 0.0
    ns_auth = jnp.where(ns_ok[..., None], normalize_safe(ns_raw), n_wind)
    ss0 = normalize_safe(dpdu)
    ts_raw = cross(ss0, ns_auth)
    ts_ok = length_sqr(ts_raw) > 0.0
    ts = normalize_safe(ts_raw)
    ss_auth = cross(ts, ns_auth)
    cs_s, cs_t = coordinate_system(ns_auth)
    ss_auth = jnp.where(ts_ok[..., None], ss_auth, cs_s)
    ts = jnp.where(ts_ok[..., None], ts, cs_t)
    # set_shading_geometry: shading.n = normalize(ss x ts) == ns_auth; the
    # geometric n is face-forwarded to it (interaction.rs:126-132).
    ns_tri = jnp.where(has[..., None], ns_auth, n_wind)
    ss_tri = jnp.where(has[..., None], ss_auth, ss0)
    n_tri = jnp.where(has[..., None], face_forward(n_wind, ns_auth), n_wind)

    # ---- sphere lanes ---------------------------------------------------
    # Sphere counts are small (brute-force scene set), so loop per sphere
    # with masks and pure component math — per-lane [N,4,4] matrix gathers
    # + einsums were ~0.5 ms/bounce of pure overhead.
    n_spheres = scene.spheres.radius.shape[0]
    if n_spheres:
        p_sph = jnp.zeros_like(p_tri)
        n_sph = jnp.zeros_like(p_tri)
        ss_sph = jnp.zeros_like(p_tri)
        uv_sph = jnp.zeros_like(uv_tri)
        mat_sph = jnp.zeros_like(mat_tri)
        phi_max = 2.0 * jnp.pi
        theta_min = jnp.pi
        theta_max = 0.0
        from .intersect import transform_ray_components

        for s in range(n_spheres):
            sel = hit.sphere == s
            w2o = scene.spheres.world_to_obj[s]
            o2w = scene.spheres.obj_to_world[s]
            radius = scene.spheres.radius[s]
            # Object-space hit point, refined (sphere.rs:91-103).
            ro, rd = transform_ray_components(w2o, o, d)
            p_obj = ro + rd * hit.t[..., None]
            p_obj = p_obj * (radius / jnp.maximum(
                jnp.sqrt(length_sqr(p_obj)), 1e-20))[..., None]
            fix = (p_obj[..., 0] == 0.0) & (p_obj[..., 1] == 0.0)
            px_ = jnp.where(fix, 1e-5 * radius, p_obj[..., 0])
            py_ = p_obj[..., 1]
            pz_ = p_obj[..., 2]
            phi = jnp.arctan2(py_, px_)
            phi = jnp.where(phi < 0.0, phi + 2.0 * jnp.pi, phi)
            u_s = phi / phi_max
            theta = jnp.arccos(jnp.clip(pz_ / radius, -1.0, 1.0))
            v_s = (theta - theta_min) / (theta_max - theta_min)
            dpdu_o = jnp.stack(
                [-phi_max * py_, phi_max * px_, jnp.zeros_like(phi)], axis=-1
            )
            z_r = jnp.sqrt(px_ * px_ + py_ * py_)
            inv_zr = 1.0 / jnp.maximum(z_r, 1e-20)
            dpdv_o = jnp.stack(
                [pz_ * px_ * inv_zr, pz_ * py_ * inv_zr,
                 -radius * jnp.sin(theta)], axis=-1
            ) * (theta_max - theta_min)
            n_obj = normalize_safe(cross(dpdu_o, dpdv_o))
            n_obj = jnp.where(scene.spheres.swaps_hand[s], -n_obj, n_obj)
            # To world (interaction.rs Mul<SurfaceInteraction>): points and
            # vectors by o2w, normals by w2o^T — component math.
            lin = o2w[:3, :3]
            p_w = jnp.stack(
                [
                    lin[0, 0] * px_ + lin[0, 1] * py_ + lin[0, 2] * pz_ + o2w[0, 3],
                    lin[1, 0] * px_ + lin[1, 1] * py_ + lin[1, 2] * pz_ + o2w[1, 3],
                    lin[2, 0] * px_ + lin[2, 1] * py_ + lin[2, 2] * pz_ + o2w[2, 3],
                ],
                axis=-1,
            )
            w2o_l = w2o[:3, :3]
            nx, ny, nz = n_obj[..., 0], n_obj[..., 1], n_obj[..., 2]
            n_w = normalize_safe(
                jnp.stack(
                    [
                        w2o_l[0, 0] * nx + w2o_l[1, 0] * ny + w2o_l[2, 0] * nz,
                        w2o_l[0, 1] * nx + w2o_l[1, 1] * ny + w2o_l[2, 1] * nz,
                        w2o_l[0, 2] * nx + w2o_l[1, 2] * ny + w2o_l[2, 2] * nz,
                    ],
                    axis=-1,
                )
            )
            ux, uy, uz = dpdu_o[..., 0], dpdu_o[..., 1], dpdu_o[..., 2]
            dpdu_w = jnp.stack(
                [
                    lin[0, 0] * ux + lin[0, 1] * uy + lin[0, 2] * uz,
                    lin[1, 0] * ux + lin[1, 1] * uy + lin[1, 2] * uz,
                    lin[2, 0] * ux + lin[2, 1] * uy + lin[2, 2] * uz,
                ],
                axis=-1,
            )
            sel3 = sel[..., None]
            p_sph = jnp.where(sel3, p_w, p_sph)
            n_sph = jnp.where(sel3, n_w, n_sph)
            ss_sph = jnp.where(sel3, normalize_safe(dpdu_w), ss_sph)
            uv_sph = jnp.where(
                sel[..., None], jnp.stack([u_s, v_s], axis=-1), uv_sph
            )
            mat_sph = jnp.where(sel, scene.spheres.material[s], mat_sph)
    else:
        p_sph = p_tri
        n_sph = n_tri
        ss_sph = ss_tri
        uv_sph = uv_tri
        mat_sph = mat_tri

    is_sph = (hit.sphere >= 0)[..., None]
    p = jnp.where(is_sph, p_sph, p_tri)
    n = jnp.where(is_sph, n_sph, n_tri)
    ns = jnp.where(is_sph, n_sph, ns_tri)
    ss = jnp.where(is_sph, ss_sph, ss_tri)
    uv = jnp.where(is_sph, uv_sph, uv_tri)
    material = jnp.where(hit.sphere >= 0, mat_sph, mat_tri)
    area_light = jnp.where(hit.sphere >= 0, -1, al_tri)

    return Surface(
        valid=hit.hit,
        p=p,
        n=n,
        ns=ns,
        ss=ss,
        uv=uv,
        wo=wo,
        material=material,
        area_light=area_light,
    )


def spawn_ray(si: Surface, d_new: jnp.ndarray) -> jnp.ndarray:
    """Offset origin 1e-3 along +-geometric n (interaction.rs:26-40)."""
    offset = si.n * 1e-3
    side = dot(d_new, si.n) > 0.0
    return jnp.where(side[..., None], si.p + offset, si.p - offset)


def spawn_ray_to(si: Surface, target: jnp.ndarray):
    """Shadow ray toward a point: offset origin, unnormalized d = target-o,
    t_max = 0.9999 (interaction.rs:42-59). Returns (o, d)."""
    offset = si.n * 1e-3
    side = dot(target - si.p, si.n) > 0.0
    o = jnp.where(side[..., None], si.p + offset, si.p - offset)
    return o, target - o
