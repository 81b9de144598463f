"""Wavefront light sampling.

Each scene light's *type* is static host-side metadata (SceneMeta.
light_types), so integrators unroll the light loop at trace time and call
the matching sampler directly — no per-lane type masking needed.  Parameter
rows still come from the device LightArrays table so the same compiled
integrator reuses across parameter tweaks.

Reference parity:
  PointLight::sample_li        lights/point_light.rs:26-50
  SpotLight::sample_li/falloff lights/spot_light.rs:39-95
  RectangularLight::sample_li  lights/rectangular_light.rs:44-71
  RectangularLight::radiance   lights/rectangular_light.rs:74-82
  DistantLight::sample_li      lights/distant_light.rs:24-44
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .scene.data import LIGHT_DISTANT, LIGHT_POINT, LIGHT_RECT, LIGHT_SPOT
from .surface import Surface
from .transforms import apply_n_jax, apply_p_jax, apply_v_jax
from .gathers import rowgather
from .vecmath import dot, normalize_safe


class LightSample(NamedTuple):
    l: jnp.ndarray  # [N,3] direction to light (normalized)
    li: jnp.ndarray  # [N,3] incident radiance
    pdf: jnp.ndarray  # [N]
    target: jnp.ndarray  # [N,3] visibility test endpoint
    skip_light: jnp.ndarray  # [N] i32 area-light id to skip in shadow query


def sample_li(scene, light_index: int, light_type: int, si: Surface, u) -> LightSample:
    """Sample light `light_index` (static) for every lane."""
    L = scene.lights
    shape = si.p.shape[:-1]
    # Shadow-skip sentinel for non-area lights: must never equal a
    # triangle's area_light id (-1 marks "no area light" on ordinary
    # geometry, so -1 would accidentally skip EVERYTHING; the reference
    # passes Option::None here, bvh.rs:287-293).
    neg1 = jnp.full(shape, -2, dtype=jnp.int32)

    if light_type == LIGHT_POINT:
        p = L.p[light_index]
        to_l = p - si.p
        d2 = jnp.maximum(dot(to_l, to_l), 1e-30)
        li = L.i[light_index] / d2[..., None]
        l = to_l / jnp.sqrt(d2)[..., None]
        return LightSample(l=l, li=li, pdf=jnp.ones(shape), target=jnp.broadcast_to(p, si.p.shape), skip_light=neg1)

    if light_type == LIGHT_SPOT:
        p = L.p[light_index]
        w2l = L.m[light_index]
        to_l = p - si.p
        d2 = jnp.maximum(dot(to_l, to_l), 1e-30)
        l = to_l / jnp.sqrt(d2)[..., None]
        # falloff (spot_light.rs:39-53)
        dir_local = normalize_safe(apply_v_jax(w2l, -l))
        ct = dir_local[..., 2]
        cos_w = L.cos_w[light_index]
        cos_f = L.cos_f[light_index]
        delta = (ct - cos_w) / jnp.maximum(cos_f - cos_w, 1e-30)
        fall = jnp.where(
            ct < cos_w,
            0.0,
            jnp.where(ct > cos_f, 1.0, (delta * delta) * (delta * delta)),
        )
        li = L.i[light_index] * (fall / d2)[..., None]
        return LightSample(l=l, li=li, pdf=jnp.ones(shape), target=jnp.broadcast_to(p, si.p.shape), skip_light=neg1)

    if light_type == LIGHT_RECT:
        s2w = L.m[light_index]
        p = apply_p_jax(s2w, jnp.stack([u[..., 0], jnp.zeros(shape), u[..., 1]], axis=-1))
        # Light normal: -y through sample_to_world (normals via inv-transpose;
        # the transform is rigid so the linear part works directly like the
        # reference's Transform * Normal).
        n = normalize_safe(apply_v_jax(s2w, jnp.asarray([0.0, -1.0, 0.0])))
        n = jnp.broadcast_to(n, si.p.shape)
        wi = normalize_safe(p - si.p)
        front = dot(n, -wi) > 0.0
        li = jnp.where(front[..., None], L.i[light_index], 0.0)
        d2 = jnp.sum((p - si.p) ** 2, axis=-1)
        pdf = d2 / jnp.maximum(
            jnp.abs(dot(n, -wi)) * L.area[light_index], 1e-30
        )
        return LightSample(
            l=wi, li=li, pdf=pdf, target=p,
            skip_light=jnp.full(shape, light_index, dtype=jnp.int32),
        )

    if light_type == LIGHT_DISTANT:
        w = L.p[light_index]
        li = jnp.broadcast_to(L.i[light_index], si.p.shape)
        # Shadow segment bounded by the scene AABB diagonal: no occluder
        # exists beyond the scene bounds, and a fixed huge length (the
        # reference uses an unbounded ray, distant_light.rs) makes the
        # wavefront occlusion cull's t-intervals cover the whole treelet
        # table — measured minutes-per-wave on the colonnade at 10000x
        # scene scale.  Image-identical.
        # 1.002 safety factor: _nee traces shadow segments with
        # t_max = 0.9999 of the chord, so an unscaled diagonal would leave
        # the final ~1e-4*diag untested — an occluder flush against the
        # scene-AABB boundary along a near-diagonal light direction could
        # slip through (advisor round-2 finding).
        diag = (
            jnp.linalg.norm(scene.world_hi - scene.world_lo) * 1.002 + 1e-3
        )
        target = si.p + w * diag
        return LightSample(
            l=jnp.broadcast_to(w, si.p.shape), li=li,
            pdf=jnp.ones(shape), target=target, skip_light=neg1,
        )

    raise ValueError(f"unknown light type {light_type}")


def area_light_radiance(scene, si: Surface, w: jnp.ndarray) -> jnp.ndarray:
    """Emitted radiance for lanes whose hit primitive carries an area light
    (si.emitted_radiance, interaction.rs:134-138; one-sided rect emission,
    rectangular_light.rs:74-82)."""
    has = si.area_light >= 0
    lid = jnp.maximum(si.area_light, 0)
    le = rowgather(scene.lights.i, lid)
    front = dot(si.n, w) > 0.0
    return jnp.where((has & front)[..., None], le, 0.0)
