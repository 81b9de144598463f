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


def collect_debug_rays_whitted(
    scene, meta, params, sampler: Sampler, ctx: SampleCtx, o, d,
) -> List[List[DebugRay]]:
    """Whitted li_debug walk (whitted.rs:73-181): unlike the path walk,
    the Whitted tree is DETERMINISTIC and BRANCHING — every glass hit
    spawns BOTH a reflection (red) and a refraction (green) child, and
    both subtrees are collected.  Level-by-level batched host loop: all
    nodes of one tree depth trace in a single intersect call."""
    from ..scene.data import MAT_GLASS

    n = o.shape[0]
    out: List[List[DebugRay]] = [[] for _ in range(n)]
    world_lo = np.asarray(scene.world_lo)
    world_hi = np.asarray(scene.world_hi)
    min_len = float((world_hi - world_lo).max()) / 10.0

    # Work items at the current tree depth: (lane, o[3], d[3], type).
    level = [
        (i, np.asarray(o)[i], np.asarray(d)[i], "direct") for i in range(n)
    ]
    dim = 2
    for depth in range(params.max_depth):
        if not level:
            break
        o_b = jnp.asarray(np.stack([w[1] for w in level]))
        d_b = jnp.asarray(np.stack([w[2] for w in level]))
        m = len(level)
        hit = traverse.intersect(
            scene, meta, o_b, d_b, jnp.full(m, traverse.F32_MAX)
        )
        si = make_surface(scene, hit, o_b, d_b)
        mp = bsdf_mod.gather_materials(scene, si, meta)

        t_np = np.asarray(hit.t)
        hit_np = np.asarray(hit.hit)
        p_np = np.asarray(si.p)
        n_np = np.asarray(si.n)
        for k, (lane, wo, wd, rtype) in enumerate(level):
            seg = t_np[k] if hit_np[k] else min_len
            out[lane].append(DebugRay(wo, wo + wd * seg, rtype))
            if hit_np[k]:
                out[lane].append(
                    DebugRay(p_np[k], p_np[k] + n_np[k] * min_len, "normal")
                )

        # NEE shadow rays per light (whitted.rs:119-141); the sample ctx is
        # re-indexed by originating lane so deeper tree levels keep the
        # per-pixel stateless streams.
        lanes = jnp.asarray([w[0] for w in level], dtype=jnp.int32)
        ctx_l = SampleCtx(
            px=ctx.px[lanes], py=ctx.py[lanes],
            sample_index=ctx.sample_index, seed=ctx.seed,
        )
        for li_idx, ltype in enumerate(meta.light_types):
            u = sampler.get_2d(ctx_l, dim)
            dim += 2
            ls = lights_mod.sample_li(scene, li_idx, ltype, si, u)
            worth = np.asarray(~is_black(ls.li))
            o_s, d_s = spawn_ray_to(si, ls.target)
            o_s_np, d_s_np = np.asarray(o_s), np.asarray(d_s)
            for k, (lane, *_rest) in enumerate(level):
                if hit_np[k] and worth[k]:
                    out[lane].append(
                        DebugRay(
                            o_s_np[k], o_s_np[k] + d_s_np[k] * 0.9999,
                            "shadow",
                        )
                    )

        if depth + 1 >= params.max_depth:
            break
        # Both specular children (glass only), no sampling involved.
        nxt = []
        bs_r = bsdf_mod.bsdf_sample_specular(mp, si, si.wo, transmission=False)
        bs_t = bsdf_mod.bsdf_sample_specular(mp, si, si.wo, transmission=True)
        for bs, rtype in ((bs_r, "reflection"), (bs_t, "refraction")):
            valid = np.asarray(bs.valid)
            o_c = np.asarray(spawn_ray(si, bs.wi))
            d_c = np.asarray(bs.wi)
            for k, (lane, *_rest) in enumerate(level):
                if hit_np[k] and valid[k]:
                    nxt.append((lane, o_c[k], d_c[k], rtype))
        level = nxt
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
