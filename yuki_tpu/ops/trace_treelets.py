"""Two-level treelet traversal kernels (large scenes).

Traversal strategy (see treelets.py for the structure): the whole ray
block walks super-treelets in BVH DFS order in lockstep.  All per-treelet
data is read as *broadcast scalars* (every lane reads the same value — no
per-lane gathers, the thing TPU can't do fast), and a block skips a
super/treelet entirely via a scalar `@pl.when` branch when no lane's slab
test hits it.  Triangle blocks live padded in HBM, one row per treelet,
and are DMA'd into a VMEM scratch when visited.

Each triangle row packs [p0 p1 p2 | area_light | prim_id | pad] so the
kernels emit original primitive ids and shadow tests can skip the sampled
area light without any extra lookup.

Block-level coherence is what makes this fast: primary-ray blocks from a
film tile touch a handful of treelets; incoherent bounce rays degrade
gracefully toward a dense sweep of the subtrees their block spans.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .trace import _watertight, F32_MAX, LANES

BLOCK_ROWS = 8  # 1024 rays per block: smaller blocks = more cull coherence


def _slab_any(lo0, lo1, lo2, hi0, hi1, hi2, ox, oy, oz, ix, iy, iz, t_cur):
    """Does ANY lane's ray hit the AABB? Returns (scalar bool, lane mask).
    NaN-free: bounds are finite and inv_d handled like the XLA path."""
    t0x = (lo0 - ox) * ix
    t1x = (hi0 - ox) * ix
    t0y = (lo1 - oy) * iy
    t1y = (hi1 - oy) * iy
    t0z = (lo2 - oz) * iz
    t1z = (hi2 - oz) * iz
    tmin = jnp.maximum(
        jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
        jnp.minimum(t0z, t1z),
    )
    tmax = jnp.minimum(
        jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
        jnp.maximum(t0z, t1z),
    )
    mask = jnp.maximum(tmin, 0.0) <= jnp.minimum(tmax, t_cur)
    return jnp.any(mask)


def _closest_kernel(
    sb_ref, sr_ref, tb_ref, tris_hbm,
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
    t_out, prim_out, b0_out, b1_out,
    tri_scratch, sem,
    *, n_supers: int, leaf_size: int, row_cols: int,
):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    ix, iy, iz = 1.0 / dx, 1.0 / dy, 1.0 / dz

    t_out[:] = tmax_ref[:]
    prim_out[:] = jnp.full(ox.shape, -1, jnp.int32)
    b0_out[:] = jnp.zeros(ox.shape, jnp.float32)
    b1_out[:] = jnp.zeros(ox.shape, jnp.float32)

    def visit_treelet(tt, _):
        hit_any = _slab_any(
            tb_ref[tt, 0], tb_ref[tt, 1], tb_ref[tt, 2],
            tb_ref[tt, 3], tb_ref[tt, 4], tb_ref[tt, 5],
            ox, oy, oz, ix, iy, iz, t_out[:],
        )

        @pl.when(hit_any)
        def _():
            # Rows land in a (K, 128) scratch so the per-triangle loop's
            # dynamic index is on the SUBLANE dim (dynamic lane indices are
            # not provably aligned for Mosaic).
            dma = pltpu.make_async_copy(
                tris_hbm.at[pl.ds(tt * leaf_size, leaf_size), :], tri_scratch,
                sem,
            )
            dma.start()
            dma.wait()

            def tri_body(k, _):
                cols = [tri_scratch[k, c] for c in range(9)]
                t_cur = t_out[:]
                hit, ti, bi0, bi1 = _watertight(
                    ox, oy, oz, dx, dy, dz, t_cur, cols
                )
                pid = tri_scratch[k, 10].astype(jnp.int32)
                # pid < 0 marks padding rows; FMA contraction can give
                # degenerate zero-area padding a tiny nonzero edge function
                # (a*b - c*d as fma), so they MUST be masked explicitly.
                closer = hit & (ti < t_cur) & (pid >= 0)
                t_out[:] = jnp.where(closer, ti, t_cur)
                prim_out[:] = jnp.where(closer, pid, prim_out[:])
                b0_out[:] = jnp.where(closer, bi0, b0_out[:])
                b1_out[:] = jnp.where(closer, bi1, b1_out[:])
                return 0

            jax.lax.fori_loop(0, leaf_size, tri_body, 0)

        return 0

    def visit_super(s, _):
        hit_any = _slab_any(
            sb_ref[s, 0], sb_ref[s, 1], sb_ref[s, 2],
            sb_ref[s, 3], sb_ref[s, 4], sb_ref[s, 5],
            ox, oy, oz, ix, iy, iz, t_out[:],
        )

        @pl.when(hit_any)
        def _():
            t0 = sr_ref[s, 0]
            tc = sr_ref[s, 1]
            jax.lax.fori_loop(t0, t0 + tc, visit_treelet, 0)

        return 0

    jax.lax.fori_loop(0, n_supers, visit_super, 0)


def _any_kernel(
    sb_ref, sr_ref, tb_ref, tris_hbm,
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref, skip_ref,
    occ_out,
    tri_scratch, sem,
    *, n_supers: int, leaf_size: int, row_cols: int,
):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    ix, iy, iz = 1.0 / dx, 1.0 / dy, 1.0 / dz
    t_max = tmax_ref[:]
    skip = skip_ref[:].astype(jnp.float32)

    occ_out[:] = jnp.zeros(ox.shape, jnp.int32)

    def visit_treelet(tt, _):
        not_done = jnp.any(occ_out[:] == 0)
        hit_any = _slab_any(
            tb_ref[tt, 0], tb_ref[tt, 1], tb_ref[tt, 2],
            tb_ref[tt, 3], tb_ref[tt, 4], tb_ref[tt, 5],
            ox, oy, oz, ix, iy, iz, t_max,
        )

        @pl.when(hit_any & not_done)
        def _():
            dma = pltpu.make_async_copy(
                tris_hbm.at[pl.ds(tt * leaf_size, leaf_size), :], tri_scratch,
                sem,
            )
            dma.start()
            dma.wait()

            def tri_body(k, _):
                cols = [tri_scratch[k, c] for c in range(9)]
                hit, _, _, _ = _watertight(
                    ox, oy, oz, dx, dy, dz, t_max, cols
                )
                light = tri_scratch[k, 9]
                pid = tri_scratch[k, 10]
                # pid < 0 = padding; see closest kernel note on FMA phantoms.
                blocked = hit & (light != skip) & (pid >= 0.0)
                occ_out[:] = occ_out[:] | blocked.astype(jnp.int32)
                return 0

            jax.lax.fori_loop(0, leaf_size, tri_body, 0)

        return 0

    def visit_super(s, _):
        not_done = jnp.any(occ_out[:] == 0)
        hit_any = _slab_any(
            sb_ref[s, 0], sb_ref[s, 1], sb_ref[s, 2],
            sb_ref[s, 3], sb_ref[s, 4], sb_ref[s, 5],
            ox, oy, oz, ix, iy, iz, t_max,
        )

        @pl.when(hit_any & not_done)
        def _():
            jax.lax.fori_loop(
                sr_ref[s, 0], sr_ref[s, 0] + sr_ref[s, 1], visit_treelet, 0
            )

        return 0

    jax.lax.fori_loop(0, n_supers, visit_super, 0)


def _pack(o, d, t_max, extra=None):
    n = o.shape[0]
    rows = max((n + LANES - 1) // LANES, 1)
    rows = ((rows + BLOCK_ROWS - 1) // BLOCK_ROWS) * BLOCK_ROWS
    pad = rows * LANES - n

    def plane(x, cv=0.0):
        return jnp.pad(x, (0, pad), constant_values=cv).reshape(rows, LANES)

    planes = [plane(o[:, k]) for k in range(3)]
    planes += [plane(d[:, k], cv=1.0) for k in range(3)]
    planes.append(plane(t_max))
    if extra is not None:
        planes.append(plane(extra, cv=-2))
    return planes, n, rows


@functools.partial(jax.jit, static_argnames=("interpret",))
def treelet_closest(tl, o, d, t_max, interpret: bool = False):
    """Closest hit via two-level treelet walk.
    tl: treelets.TreeletArrays. Returns (t, prim, b0, b1) over [N]."""
    planes, n, rows = _pack(o, d, t_max)
    grid = rows // BLOCK_ROWS
    row_cols = tl.tris_padded.shape[1]

    block = pl.BlockSpec(
        (BLOCK_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    table = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    out_f = jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
    t, prim, b0, b1 = pl.pallas_call(
        functools.partial(
            _closest_kernel,
            n_supers=tl.n_supers,
            leaf_size=tl.leaf_size,
            row_cols=row_cols,
        ),
        grid=(grid,),
        in_specs=[
            table(tl.super_bounds.shape),
            table(tl.super_range.shape),
            table(tl.treelet_bounds.shape),
            pl.BlockSpec(memory_space=pl.ANY),  # tris stay in HBM
        ] + [block] * 7,
        out_specs=[block] * 4,
        out_shape=[
            out_f,
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
            out_f,
            out_f,
        ],
        scratch_shapes=[
            pltpu.VMEM((tl.leaf_size, tl.tris_padded.shape[1]), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(tl.super_bounds, tl.super_range, tl.treelet_bounds, tl.tris_padded,
      *planes)
    return (
        t.reshape(-1)[:n],
        prim.reshape(-1)[:n],
        b0.reshape(-1)[:n],
        b1.reshape(-1)[:n],
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def treelet_any(tl, o, d, t_max, skip_light, interpret: bool = False):
    """Occlusion via two-level treelet walk. Returns occluded [N] bool."""
    planes, n, rows = _pack(o, d, t_max, extra=skip_light)
    grid = rows // BLOCK_ROWS
    row_cols = tl.tris_padded.shape[1]

    block = pl.BlockSpec(
        (BLOCK_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    table = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    occ = pl.pallas_call(
        functools.partial(
            _any_kernel,
            n_supers=tl.n_supers,
            leaf_size=tl.leaf_size,
            row_cols=row_cols,
        ),
        grid=(grid,),
        in_specs=[
            table(tl.super_bounds.shape),
            table(tl.super_range.shape),
            table(tl.treelet_bounds.shape),
            pl.BlockSpec(memory_space=pl.ANY),
        ] + [block] * 8,
        out_specs=pl.BlockSpec(
            (BLOCK_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((tl.leaf_size, tl.tris_padded.shape[1]), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(tl.super_bounds, tl.super_range, tl.treelet_bounds, tl.tris_padded,
      *planes)
    return occ.reshape(-1)[:n] > 0
