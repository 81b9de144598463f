"""Debug-ray collection: the reference's `li_debug` path
(integrators/mod.rs:104-117, path.rs:58-96, window.rs:811-905).

Re-traces the path for a handful of film pixels and records every ray
segment with its type so a front end can overlay them on the image — the
reference draws them as GL lines colored Direct/Reflection/Refraction/
Normal/Shadow -> white/red/green/blue/yellow
(renderpasses/ray_visualization.rs:33-66).

Segment lengths follow the reference: hit rays end at t; miss/normal rays
use min_debug_ray_length = scene-bounds max extent / 10 (path.rs:58-64);
shadow rays run to the sampled light point.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List

import numpy as np
import jax.numpy as jnp

from .. import bsdf as bsdf_mod
from .. import lights as lights_mod
from .. import traverse
from ..sampling import SampleCtx, Sampler
from ..surface import make_surface, spawn_ray, spawn_ray_to
from ..vecmath import dot, is_black
from . import PathParams

RAY_COLORS = {
    "direct": (1.0, 1.0, 1.0),
    "reflection": (1.0, 0.0, 0.0),
    "refraction": (0.0, 1.0, 0.0),
    "normal": (0.0, 0.0, 1.0),
    "shadow": (1.0, 1.0, 0.0),
}


@dataclass
class DebugRay:
    o: np.ndarray  # [3]
    end: np.ndarray  # [3]
    ray_type: str


def collect_debug_rays(
    scene, meta, params: PathParams, sampler: Sampler,
    ctx: SampleCtx, o, d,
) -> List[List[DebugRay]]:
    """Trace the path integrator for a small batch of rays, collecting the
    segments per lane. Host-side loop (debug tool, tiny batches)."""
    n = o.shape[0]
    out: List[List[DebugRay]] = [[] for _ in range(n)]
    world_lo = np.asarray(scene.world_lo)
    world_hi = np.asarray(scene.world_hi)
    min_len = float((world_hi - world_lo).max()) / 10.0

    alive = np.ones(n, dtype=bool)
    ray_type = ["direct"] * n
    dim = 2
    for bounce in range(params.max_depth):
        t_max = jnp.full(n, traverse.F32_MAX)
        hit = traverse.intersect(scene, meta, o, d, t_max)
        si = make_surface(scene, hit, o, d)
        mp = bsdf_mod.gather_materials(scene, si)

        o_np = np.asarray(o)
        d_np = np.asarray(d)
        t_np = np.asarray(hit.t)
        hit_np = np.asarray(hit.hit)
        p_np = np.asarray(si.p)
        n_np = np.asarray(si.n)
        for i in range(n):
            if not alive[i]:
                continue
            seg_len = t_np[i] if hit_np[i] else min_len
            out[i].append(
                DebugRay(o_np[i], o_np[i] + d_np[i] * seg_len, ray_type[i])
            )
            if hit_np[i]:
                out[i].append(
                    DebugRay(p_np[i], p_np[i] + n_np[i] * min_len, "normal")
                )

        # NEE shadow rays (one per light, like the fold in path.rs:102-124).
        for li_idx, ltype in enumerate(meta.light_types):
            u = sampler.get_2d(ctx, dim)
            dim += 2
            ls = lights_mod.sample_li(scene, li_idx, ltype, si, u)
            worth = np.asarray(~is_black(ls.li))
            o_s, d_s = spawn_ray_to(si, ls.target)
            o_s_np = np.asarray(o_s)
            d_s_np = np.asarray(d_s)
            for i in range(n):
                if alive[i] and hit_np[i] and worth[i]:
                    out[i].append(
                        DebugRay(
                            o_s_np[i],
                            o_s_np[i] + d_s_np[i] * 0.9999,
                            "shadow",
                        )
                    )

        u2 = sampler.get_2d(ctx, dim)
        dim += 3  # bsdf 2 + RR slot (path_li dimension layout)
        bs = bsdf_mod.bsdf_sample(mp, si, si.wo, u2)
        valid = np.asarray(bs.valid)
        trans = np.asarray(bs.is_transmission)
        alive = alive & hit_np & valid
        for i in range(n):
            if alive[i]:
                ray_type[i] = "refraction" if trans[i] else "reflection"
        o = spawn_ray(si, bs.wi)
        d = bs.wi
        if not alive.any():
            break
    return out


def project_segments(camera, res_x: int, res_y: int, rays: List[DebugRay]):
    """Project world-space segments into raster space for 2D overlays
    (replaces the GL line pass, renderpasses/ray_visualization.rs).

    Returns a list of dicts {x0,y0,x1,y1,color,type}; segments behind the
    camera are dropped (no clipping finesse — debug tool)."""
    w2c = np.linalg.inv(np.asarray(camera.camera_to_world, dtype=np.float64))
    c2r_full = np.linalg.inv(
        np.asarray(camera.raster_to_camera, dtype=np.float64)
    )

    def raster_of(p_world):
        pc = w2c[:3, :3] @ p_world + w2c[:3, 3]
        if pc[2] <= 1e-6:
            return None
        h = c2r_full @ np.append(pc, 1.0)
        if abs(h[3]) < 1e-12:
            return None
        return (h[0] / h[3], h[1] / h[3])

    out = []
    for r in rays:
        a = raster_of(np.asarray(r.o, dtype=np.float64))
        b = raster_of(np.asarray(r.end, dtype=np.float64))
        if a is None or b is None:
            continue
        out.append(
            {
                "x0": a[0], "y0": a[1], "x1": b[0], "y1": b[1],
                "type": r.ray_type,
                "color": RAY_COLORS[r.ray_type],
            }
        )
    return out
