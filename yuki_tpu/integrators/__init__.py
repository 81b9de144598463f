"""Wavefront integrators.

The reference's recursive, per-ray integrators (yuki/src/integrators/) become
fixed-depth masked wavefront passes: the whole pixel batch marches through
trace -> shade -> next-ray together, with dead lanes masked out.  Bounce
loops are unrolled at trace time (max_depth is static config), which also
reproduces the reference's sampler-dimension consumption order exactly:
camera jitter (dims 0-1), then per bounce 2 dims per light (NEE, in scene
light order), 2 dims for the BSDF sample, and 1 RR dim after bounce 3
(path.rs:102-178).

Integrator registry mirrors IntegratorType (integrators/mod.rs:32-53):
  Whitted / Path / BVHIntersections / GeometryNormals / ShadingNormals /
  ShadingUVs
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .. import bsdf as bsdf_mod
from .. import lights as lights_mod
from .. import traverse
from ..profiling import pass_scope
from ..sampling import SampleCtx, Sampler
from ..surface import Surface, make_surface, spawn_ray, spawn_ray_to
from ..vecmath import dot, is_black


@dataclass(frozen=True)
class WhittedParams:
    max_depth: int = 3


@dataclass(frozen=True)
class PathParams:
    max_depth: int = 3
    indirect_clamp: Optional[float] = None


# Benign unit direction for parked (dead/masked) lanes — avoids d=0
# rays whose 1/d = inf turns the traversal slab tests into NaNs.
_BENIGN_D = jnp.asarray([0.0, 0.0, 1.0])

# Fused-shade dispatch mode: "auto" uses the Pallas shading megakernel
# (ops/shade_fused.py) on the TPU backend whenever the scene/sampler
# support it; "off" forces the reference XLA chain; "interpret" runs
# the kernel in Pallas interpret mode on any backend (CPU equivalence
# tests).
FUSED_SHADE_MODE = "auto"

# Perf-attribution knockouts for path_li's fused-branch bounce loop
# (benchmarks/r4_colwave.py): subset of {"closest", "shade", "occl",
# "resolve"} replacing that stage with a cheap stand-in of identical
# shapes.  NEVER set in production — results are wrong.
PATHLI_KNOCK = frozenset()


def _use_fused_shade(scene, meta, sampler) -> bool:
    from ..ops import shade_fused

    if FUSED_SHADE_MODE == "off":
        return False
    if not shade_fused.fused_shade_supported(scene, meta, sampler):
        return False
    if FUSED_SHADE_MODE == "interpret":
        return True
    return traverse._use_pallas()

# Hard ceiling on Whitted specular-tree steps.  A full binary glass tree
# at the viewer's max depth of 12 would otherwise be a 4095-step
# sequential scan reachable from the UI (round-2 verdict item 6); 255
# steps covers every full tree to depth 8 and every practical
# reflect/transmit chain above that (truncation drops only stack entries
# of paths that were ALL glass for 8+ consecutive bounces).
_MAX_SPECULAR_STEPS = 255


def whitted_step_budget(depth_cap: int, has_glass: bool) -> int:
    """Static loop bound for whitted_li's DFS scan: glass-free scenes are
    statically one trace/shade pass (no specular child can ever spawn —
    glass is the sole dual-lobe material, whitted.rs:38-70); glass scenes
    get the full-tree bound capped at _MAX_SPECULAR_STEPS."""
    if not has_glass:
        return 1
    return max(1, min(2 ** depth_cap - 1, _MAX_SPECULAR_STEPS))


class LiResult(NamedTuple):
    li: jnp.ndarray  # [N,3]
    ray_count: jnp.ndarray  # [N] i32 — closest-hit traversals, matching the
    # reference's ray_scene_intersections counter (shadow rays not counted,
    # path.rs:97 / whitted.rs:117)


def _nee_setup(scene, meta, sampler: Sampler, ctx: SampleCtx, si: Surface,
               mp, dim, active):
    """Build every light's NEE shadow ray + raw contribution (the
    sampling/BSDF half of the fold in path.rs:102-124 / whitted.rs:119-141
    — everything except the occlusion trace).  ``dim`` may be a Python int
    or a traced i32 scalar.

    Returns (o_b, d_b, t_b, skip_b, worth_b, contribs, next_dim) with the
    per-light rays flattened light-major into ONE [L*N] batch: per-call
    fixed costs (adaptive dispatch, the static-size overflow mini-wave)
    are paid once instead of per light (round-3), and path_li appends the
    batch to its next-bounce wave for a single combined traversal.
    contribs is the [L*N, 3] raw f*li*cos/pdf term (NO beta — the
    indirect clamp applies before beta, path.rs:126-137)."""
    n_lights = len(meta.light_types)
    center = 0.5 * (scene.world_lo + scene.world_hi)
    contribs, worths, rays = [], [], []
    for li_idx, ltype in enumerate(meta.light_types):
        u = sampler.get_2d(ctx, dim)
        dim = dim + 2
        ls = lights_mod.sample_li(scene, li_idx, ltype, si, u)
        f = bsdf_mod.bsdf_f(mp, si, si.wo, ls.l, meta)
        cos = jnp.clip(dot(si.ns, ls.l), 0.0, 1.0)
        # Zero-contribution lanes (black f/li, light behind the shading
        # normal) never affect the image — give them t_max=0 so the
        # occlusion traversal's cull drops their corridors entirely
        # instead of walking a full shadow segment for a masked result.
        worth = active & ~is_black(ls.li) & ~is_black(f) & (cos > 0.0)
        o_s, d_s = spawn_ray_to(si, ls.target)
        # Park zero-contribution lanes on a benign in-scene ray: miss
        # lanes carry |p| ~ 3e38 origins which would poison their whole
        # sorted BLOCK's origin bounds in the traversal cull (one bad
        # lane makes the block match every treelet).
        o_s = jnp.where(worth[..., None], o_s, center)
        d_s = jnp.where(worth[..., None], d_s, _BENIGN_D)
        t_s = jnp.where(worth, 0.9999, 0.0)
        skip = jnp.broadcast_to(ls.skip_light, worth.shape)
        contribs.append(
            f * ls.li * (cos / jnp.maximum(ls.pdf, 1e-30))[..., None]
        )
        worths.append(worth)
        rays.append((o_s, d_s, t_s, skip))

    if n_lights == 1:
        o_b, d_b, t_b, s_b = rays[0]
        w_b, c_b = worths[0], contribs[0]
        o_b, d_b, c_b = (o_b.reshape(-1, 3), d_b.reshape(-1, 3),
                         c_b.reshape(-1, 3))
        t_b, s_b, w_b = t_b.reshape(-1), s_b.reshape(-1), w_b.reshape(-1)
    else:
        o_b = jnp.concatenate([r[0].reshape(-1, 3) for r in rays])
        d_b = jnp.concatenate([r[1].reshape(-1, 3) for r in rays])
        t_b = jnp.concatenate([r[2].reshape(-1) for r in rays])
        s_b = jnp.concatenate([r[3].reshape(-1) for r in rays])
        w_b = jnp.concatenate([w.reshape(-1) for w in worths])
        c_b = jnp.concatenate([c.reshape(-1, 3) for c in contribs])
    return o_b, d_b, t_b, s_b, w_b, c_b, dim


def _nee_resolve(occ_b, worth_b, contrib_b, shape, n_lights):
    """Occlusion verdicts -> summed direct lighting [*shape, 3] (the
    accumulation half of the reference's per-light fold)."""
    lit = (worth_b & ~occ_b)[..., None]
    total = jnp.where(lit, contrib_b, 0.0).reshape(
        (n_lights,) + shape + (3,)
    ).sum(axis=0)
    return total


def _nee(scene, meta, sampler: Sampler, ctx: SampleCtx, si: Surface,
         mp, dim, active, skip_sort: bool = False):
    """Direct lighting summed over every scene light (the fold in
    path.rs:102-124 / whitted.rs:119-141): _nee_setup + ONE batched
    any_intersect + _nee_resolve.  Used by whitted_li and the debug-ray
    walks; path_li instead defers the occlusion trace into its combined
    next-bounce wave (see path_li)."""
    n_lights = len(meta.light_types)
    if n_lights == 0:
        return jnp.zeros_like(si.p), dim
    o_b, d_b, t_b, s_b, w_b, c_b, dim = _nee_setup(
        scene, meta, sampler, ctx, si, mp, dim, active
    )
    with pass_scope("trace.occlusion"):
        occ_b = traverse.any_intersect(
            scene, meta, o_b, d_b, t_b, s_b, skip_sort=skip_sort
        )
    shape = si.p.shape[:-1]
    return _nee_resolve(occ_b, w_b, c_b, shape, n_lights), dim


def path_li(scene, meta, params: PathParams, sampler: Sampler,
            ctx: SampleCtx, o, d, dim: int = 2) -> LiResult:
    """Path tracing with NEE every bounce, optional indirect clamp and
    Russian roulette after bounce 3 (path.rs:48-178).

    The bounce loop is a ``lax.scan`` so the (large) trace/shade body is
    compiled once regardless of max_depth.  Sampler dimensions advance by a
    fixed stride per bounce (2 per light + 2 BSDF + 1 RR slot); unlike the
    reference, the RR dimension slot is reserved on every bounce — dimension
    *indices* differ from the reference past bounce 3 but every dimension is
    still an independent stateless-hash stream, so distributions match.

    Each bounce is one closest-hit call plus one light-major batched
    occlusion call (all lights' shadow rays in a single [L*N]
    any_intersect).  A round-3 COMBINED-trace variant (shadow rays
    deferred into the next bounce's closest call via per-lane skip-light
    planes) was built and REVERTED: traversal stage costs are
    lane-count-proportional, so shadow lanes at closest-walk rates plus
    the extra drain iteration measured 1099 ms vs 919 on the colonnade
    d5 wave (r3_knockout, /tmp/r3_chain.log).  The skip_light plumbing
    remains in every engine for other callers.

    On the TPU backend the surface -> materials -> NEE-setup ->
    bsdf_sample -> RR chain runs as ONE Pallas megakernel
    (ops/shade_fused.py) when the scene/sampler support it; the XLA
    chain below is the reference semantics and the fallback."""
    shape = o.shape[:-1]
    n = o.shape[0]
    n_lights = len(meta.light_types)
    dims_per_bounce = 2 * n_lights + 2 + 1
    center = 0.5 * (scene.world_lo + scene.world_hi)
    use_fused = n_lights > 0 and _use_fused_shade(scene, meta, sampler)

    # Every bounce skips the coherence sort (traverse._sorted_call
    # skip_sort): the engines are per-ray exact in any order, primary
    # waves are film-ordered (16x16 tiles -> 16x8-pixel 128-ray rows,
    # coherent enough that the dispatch probe still picks the rows
    # branch), and divergent bounce waves always take the slot pipeline,
    # which with the fused per-ray cull (ops/trace_cull.py) is
    # order-independent — so the argsort + 3 gathers + unsort scatter
    # per traversal call are pure overhead.  NOTE a bounce-0 peel was
    # tried and REVERTED: calling the body once outside lax.scan changes
    # XLA fusion/rounding in the shading math and shifted the Cornell
    # golden by RMSE 5.6e-3 (round 3).
    def body(carry, bounce):
        o, d, beta, radiance, alive, specular_bounce, ray_count = carry
        dim0 = dim + bounce * dims_per_bounce

        ray_count = ray_count + alive.astype(jnp.int32)
        # Dead lanes trace a zero-length benign ray (see _nee_setup:
        # their garbage origins would otherwise poison block culls and
        # overflow the pair budget into the slow fallback walk every
        # bounce — measured 939 ms vs ~30 ms for the 262k-ray wave).
        t_max = jnp.where(alive, traverse.F32_MAX, 0.0)
        if "closest" in PATHLI_KNOCK:  # pragma: no cover - perf only
            hit = traverse.SceneHit(
                hit=alive, t=jnp.full(n, 1.0),
                prim=jnp.zeros(n, jnp.int32),
                sphere=jnp.full(n, -1, jnp.int32),
                b0=jnp.full(n, 0.25), b1=jnp.full(n, 0.25),
            )
        else:
            with pass_scope("trace.closest"):
                hit = traverse.intersect(
                    scene, meta, o, d, t_max, skip_sort=True
                )

        # Miss: background, terminate (path.rs:155-160).
        missed = alive & ~hit.hit
        if not use_fused:
            radiance = radiance + jnp.where(
                missed[..., None], beta * scene.background, 0.0
            )
        alive = alive & hit.hit

        if use_fused:
            # Pallas shading megakernel: surface -> materials -> NEE
            # setup -> emit -> bsdf_sample -> RR in one VMEM-resident
            # kernel; radiance math identical to the XLA chain below
            # (tests/test_shade_fused.py proves render parity).
            from ..ops import shade_fused

            interp = (FUSED_SHADE_MODE == "interpret"
                      or traverse.FORCE_PALLAS_INTERPRET)
            if "shade" in PATHLI_KNOCK:  # pragma: no cover - perf only
                L = max(n_lights, 1)
                o2, d2, beta2 = o, d, beta * 0.9
                alive2, spec2 = alive, specular_bounce
                no = jnp.tile(o, (L, 1))
                nd = jnp.tile(d, (L, 1))
                nt = jnp.where(jnp.tile(alive, L), 1.0, 0.0)
                ns_k = jnp.full(L * n, -2, jnp.int32)
                nw = jnp.tile(alive, L)
                nc = jnp.zeros((L * n, 3))
                ne = jnp.zeros((n, 3))
            else:
                with pass_scope("shade.fused"):
                    (o2, d2, beta2, alive2, spec2, no, nd, nt, ns_k, nw,
                     nc, ne) = shade_fused.shade_fused(
                        scene, meta, sampler, ctx, hit, o, d, beta,
                        alive, specular_bounce, dim0, bounce,
                        interpret=interp,
                    )
            if "occl" in PATHLI_KNOCK:  # pragma: no cover - perf only
                occ = jnp.zeros(no.shape[0], bool)
            else:
                with pass_scope("trace.occlusion"):
                    occ = traverse.any_intersect(
                        scene, meta, no, nd, nt, ns_k, skip_sort=True
                    )
            # Second fused pass: NEE resolve + the kernel's beta*emitted
            # term (the outer beta below reproduces the reference's
            # double-beta emit quirk, path.rs:126-137) + indirect clamp
            # + miss background + radiance update, all in-kernel.
            if "resolve" in PATHLI_KNOCK:  # pragma: no cover - perf
                radiance = radiance + 1e-12 * beta
            else:
                with pass_scope("shade.resolve"):
                    radiance = shade_fused.resolve_fused(
                        scene, radiance, beta, alive, missed, ne, occ,
                        nw, nc, bounce, n_lights,
                        params.indirect_clamp, interpret=interp,
                    )
            return (o2, d2, beta2, radiance, alive2, spec2,
                    ray_count), None

        with pass_scope("shade.surface"):
            si = make_surface(scene, hit, o, d)
            mp = bsdf_mod.gather_materials(scene, si, meta)

        with pass_scope("shade.nee"):
            bounce_radiance, dimn = _nee(
                scene, meta, sampler, ctx, si, mp, dim0, alive,
                skip_sort=True,
            )

        # Emitted on first/specular hit.  NOTE: the reference multiplies
        # the emitted term by beta here AND the whole per-bounce radiance
        # by beta below (path.rs:126-137); we reproduce that exactly for
        # image parity.
        emit_mask = specular_bounce | (bounce == 0)
        emitted = lights_mod.area_light_radiance(scene, si, -d)
        bounce_radiance = bounce_radiance + jnp.where(
            emit_mask[..., None], beta * emitted, 0.0
        )

        if params.indirect_clamp is not None:
            clamped = jnp.minimum(bounce_radiance, params.indirect_clamp)
            bounce_radiance = jnp.where(bounce > 0, clamped, bounce_radiance)

        radiance = radiance + jnp.where(
            alive[..., None], beta * bounce_radiance, 0.0
        )

        u = sampler.get_2d(ctx, dimn)
        dimn = dimn + 2
        with pass_scope("shade.bsdf_sample"):
            bs = bsdf_mod.bsdf_sample(mp, si, si.wo, u, meta)
        terminated = is_black(bs.f) | (bs.pdf == 0.0)
        alive = alive & ~terminated
        specular_bounce = bs.is_specular

        beta = beta * bs.f * (
            jnp.abs(dot(bs.wi, si.ns)) / jnp.maximum(bs.pdf, 1e-30)
        )[..., None]
        # Guard against overflowing throughput (grazing microfacet pdfs
        # can underflow in f32): a non-finite beta would turn inf*0 into
        # NaN in later masked accumulations, so retire the lane instead.
        finite = jnp.all(jnp.isfinite(beta), axis=-1)
        alive = alive & finite
        beta = jnp.where(finite[..., None], beta, 0.0)
        # Park dead lanes at the scene center with a unit direction (and
        # t_max=0 next bounce): see the traversal-cull poisoning note at
        # the top of the loop body.
        o = jnp.where(alive[..., None], spawn_ray(si, bs.wi), center)
        d = jnp.where(alive[..., None], bs.wi, _BENIGN_D)

        # Russian roulette (path.rs:162-169), applied after bounce 3.
        q = jnp.maximum(0.05, 1.0 - beta[..., 1])
        r = sampler.get_1d(ctx, dimn)
        rr_on = bounce > 3
        alive = alive & ~(rr_on & (r < q))
        beta = jnp.where(
            rr_on, beta / jnp.maximum(1.0 - q, 1e-30)[..., None], beta
        )

        return (o, d, beta, radiance, alive, specular_bounce,
                ray_count), None

    init = (
        o,
        d,
        jnp.ones(o.shape),
        jnp.zeros(o.shape),
        jnp.ones(shape, dtype=bool),
        jnp.zeros(shape, dtype=bool),
        jnp.zeros(shape, dtype=jnp.int32),
    )
    carry, _ = jax.lax.scan(
        body, init, jnp.arange(params.max_depth, dtype=jnp.int32)
    )
    radiance, ray_count = carry[3], carry[6]
    return LiResult(li=radiance, ray_count=ray_count)


def whitted_li(scene, meta, params: WhittedParams, sampler: Sampler,
               ctx: SampleCtx, o, d, dim: int = 2) -> LiResult:
    """Whitted: direct lighting + recursive perfect-specular reflection and
    transmission (whitted.rs:73-181).

    The reference recurses per ray; naive trace-time unrolling duplicates
    the whole trace/shade body 2^depth-1 times, which the TPU compiler
    chokes on.  Instead the recursion tree is walked *iteratively*: a
    ``lax.scan`` of 2^depth-1 steps runs ONE compiled trace/shade body, and
    each lane carries a small explicit DFS stack of pending specular
    branches (o, d, throughput scale, depth, parent contribution weight).
    Reflection children continue immediately; transmission children are
    pushed.  Lanes whose surfaces spawn no specular children idle (masked)
    until every lane's stack drains — same images, compiler-sized graph.

    Sampler dimensions: each tree step consumes 2 dims per light for NEE
    (the reference consumes them in depth-first visit order; our visit
    order is the same DFS, so dimension assignment matches lane-wise for
    pure-reflection chains and differs only in *index* for mixed trees —
    distribution-equivalent, see sampling.py).

    The 2^depth-1 bound is reached only when every lane's every surface is
    glass (the sole dual-lobe material, whitted.rs:38-70): the loop is a
    ``while_loop`` that exits as soon as every lane's DFS stack drains, so
    pure reflect/transmit chains cost depth-linear steps and glass-free
    scenes (statically known from SceneMeta.material_types) cost exactly
    one step — the worst case stays bounded but is no longer *paid* by
    ordinary scenes at high max_depth.
    """
    from ..scene.data import MAT_GLASS

    shape = o.shape[:-1]
    depth_cap = params.max_depth
    n_steps = whitted_step_budget(depth_cap, MAT_GLASS in meta.material_types)
    stack_size = max(depth_cap, 1)
    n_lights = len(meta.light_types)
    dims_per_step = 2 * n_lights

    def push(stack, sp, item, mask):
        """Push item (dict of arrays) at per-lane sp where mask."""
        out = {}
        for k, v in item.items():
            buf = stack[k]
            onehot = (
                jax.lax.broadcasted_iota(jnp.int32, (stack_size,) + sp.shape, 0)
                == sp[None]
            ) & mask[None]
            if v.ndim > sp.ndim:  # vector entries [N,3]
                onehot = onehot[..., None]
                v = v[None]
            else:
                v = v[None]
            out[k] = jnp.where(onehot, v, buf)
        return out, sp + mask.astype(jnp.int32)

    def pop(stack, sp, mask):
        """Pop at sp-1 where mask; returns (item, new_sp)."""
        idx = jnp.maximum(sp - 1, 0)
        item = {}
        for k, v in stack.items():
            ix = idx[None, ...]
            while ix.ndim < v.ndim:
                ix = ix[..., None]
            ix = jnp.broadcast_to(ix, (1,) + v.shape[1:])
            item[k] = jnp.take_along_axis(v, ix, axis=0)[0]
        return item, sp - mask.astype(jnp.int32)

    zero3 = jnp.zeros(o.shape)
    stack0 = {
        "o": jnp.zeros((stack_size,) + o.shape),
        "d": jnp.zeros((stack_size,) + o.shape),
        "scale": jnp.zeros((stack_size,) + o.shape),
        "depth": jnp.zeros((stack_size,) + shape, dtype=jnp.int32),
        "spec": jnp.zeros((stack_size,) + shape, dtype=bool),
    }

    def body(loop_carry):
        step, carry = loop_carry
        (radiance, ray_count, stack, sp,
         cur_o, cur_d, cur_scale, cur_depth, cur_spec, cur_active) = carry
        dim0 = dim + step * dims_per_step

        ray_count = ray_count + cur_active.astype(jnp.int32)
        t_max = jnp.where(cur_active, traverse.F32_MAX, 0.0)
        with pass_scope("trace.closest"):
            hit = traverse.intersect(scene, meta, cur_o, cur_d, t_max)
        missed = cur_active & ~hit.hit
        radiance = radiance + jnp.where(
            missed[..., None], cur_scale * scene.background, 0.0
        )
        live = cur_active & hit.hit

        si = make_surface(scene, hit, cur_o, cur_d)
        mp = bsdf_mod.gather_materials(scene, si, meta)

        direct, _ = _nee(scene, meta, sampler, ctx, si, mp, dim0, live)
        emit_mask = cur_spec | (cur_depth == 0)
        direct = direct + jnp.where(
            emit_mask[..., None],
            lights_mod.area_light_radiance(scene, si, -cur_d),
            0.0,
        )
        radiance = radiance + jnp.where(
            live[..., None], cur_scale * direct, 0.0
        )

        can_recurse = live & (cur_depth + 1 < depth_cap)
        # Specular children (whitted.rs:38-70): f * |wi . ns| weights.
        bs_r = bsdf_mod.bsdf_sample_specular(mp, si, si.wo, transmission=False)
        bs_t = bsdf_mod.bsdf_sample_specular(mp, si, si.wo, transmission=True)

        def child(bs):
            scale = bs.f * jnp.abs(dot(bs.wi, si.ns))[..., None]
            scale = jnp.where(jnp.isfinite(scale), scale, 0.0) * cur_scale
            return {
                "o": spawn_ray(si, bs.wi),
                "d": bs.wi,
                "scale": scale,
                "depth": cur_depth + 1,
                "spec": bs.is_specular,
            }

        t_valid = can_recurse & bs_t.valid
        r_valid = can_recurse & bs_r.valid
        stack, sp = push(stack, sp, child(bs_t), t_valid)

        # Next current: reflection child where valid, else pop, else idle.
        popped_mask = ~r_valid & (sp > 0)
        item, sp = pop(stack, sp, popped_mask)
        refl = child(bs_r)
        nxt_active = r_valid | popped_mask
        sel = r_valid[..., None]
        cur_o = jnp.where(sel, refl["o"], item["o"])
        cur_d = jnp.where(sel, refl["d"], item["d"])
        # Idle lanes pop stack zeros (d=0 -> inf inverse direction) and
        # would poison the traversal cull; park them on a benign ray.
        center = 0.5 * (scene.world_lo + scene.world_hi)
        cur_o = jnp.where(nxt_active[..., None], cur_o, center)
        cur_d = jnp.where(nxt_active[..., None], cur_d, _BENIGN_D)
        cur_scale = jnp.where(sel, refl["scale"], item["scale"])
        cur_depth = jnp.where(r_valid, refl["depth"], item["depth"])
        cur_spec = jnp.where(r_valid, refl["spec"], item["spec"])
        cur_active = nxt_active

        return (step + 1,
                (radiance, ray_count, stack, sp,
                 cur_o, cur_d, cur_scale, cur_depth, cur_spec, cur_active))

    init = (
        jnp.zeros(o.shape),
        jnp.zeros(shape, dtype=jnp.int32),
        stack0,
        jnp.zeros(shape, dtype=jnp.int32),
        o,
        d,
        jnp.ones(o.shape),
        jnp.zeros(shape, dtype=jnp.int32),
        jnp.zeros(shape, dtype=bool),
        jnp.ones(shape, dtype=bool),
    )

    def cond(loop_carry):
        step, carry = loop_carry
        sp, cur_active = carry[3], carry[9]
        # Live work remains while any lane is tracing or has pushed
        # transmission branches; step bound = worst-case full glass tree.
        return (step < n_steps) & (
            jnp.any(cur_active) | jnp.any(sp > 0)
        )

    _, carry = jax.lax.while_loop(
        cond, body, (jnp.int32(0), init)
    )
    return LiResult(li=carry[0], ray_count=carry[1])


def geometry_normals_li(scene, meta, o, d) -> LiResult:
    hit = traverse.intersect(
        scene, meta, o, d, jnp.full(o.shape[:-1], traverse.F32_MAX)
    )
    si = make_surface(scene, hit, o, d)
    col = jnp.where(hit.hit[..., None], si.n / 2.0 + 0.5, 0.0)
    return LiResult(li=col, ray_count=jnp.ones(o.shape[:-1], jnp.int32))


def shading_normals_li(scene, meta, o, d) -> LiResult:
    hit = traverse.intersect(
        scene, meta, o, d, jnp.full(o.shape[:-1], traverse.F32_MAX)
    )
    si = make_surface(scene, hit, o, d)
    col = jnp.where(hit.hit[..., None], si.ns / 2.0 + 0.5, 0.0)
    return LiResult(li=col, ray_count=jnp.ones(o.shape[:-1], jnp.int32))


def shading_uvs_li(scene, meta, o, d) -> LiResult:
    hit = traverse.intersect(
        scene, meta, o, d, jnp.full(o.shape[:-1], traverse.F32_MAX)
    )
    si = make_surface(scene, hit, o, d)
    col = jnp.stack(
        [si.uv[..., 0], si.uv[..., 1], jnp.zeros(o.shape[:-1])], axis=-1
    )
    col = jnp.where(hit.hit[..., None], col, 0.0)
    return LiResult(li=col, ray_count=jnp.ones(o.shape[:-1], jnp.int32))


def bvh_intersections_li(scene, meta, o, d) -> LiResult:
    """Traversal heatmap (bvh_heatmap.rs): r = nodes visited, g = node steps
    on hit paths.  Our stackless traversal visits nodes rather than counting
    slab tests separately, so r==g==steps; b = steps if the ray hit."""
    hit, steps = traverse.intersect(
        scene, meta, o, d, jnp.full(o.shape[:-1], traverse.F32_MAX),
        with_stats=True,
    )
    s = steps.astype(jnp.float32)
    col = jnp.stack([s, s, jnp.where(hit.hit, s, 0.0)], axis=-1)
    return LiResult(li=col, ray_count=jnp.ones(o.shape[:-1], jnp.int32))
