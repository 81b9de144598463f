"""Pallas ray-tracing kernels.

The XLA dense sweep (traverse.intersect_dense) leaves ~10-20x on the table:
every fori step round-trips the [N]-sized lane state through HBM and the
[N,3] vector layout wastes VPU lanes.  These kernels keep the whole ray
block's state in VMEM for the full triangle loop and use pure SoA
[rows, 128] layout, so the inner loop is back-to-back VPU FMAs over fully
packed lanes with one broadcast triangle per step.

Reference parity: the in-kernel test is the same watertight pbrt test as
intersect.ray_triangle (shapes/triangle.rs:49-130, f32-only — see
intersect.py for the documented f64-fallback divergence).

Layouts:
  rays:       six [R, 128] f32 planes (ox,oy,oz,dx,dy,dz) + t_max [R,128]
  triangles:  [T, 12] f32 — columns 0-8 = p0,p1,p2; 9-11 padding
  outputs:    t [R,128] f32, prim [R,128] i32, b0/b1 [R,128] f32
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32_MAX = 3.4028235e38  # python float: kernels must not capture traced consts

LANES = 128
BLOCK_ROWS = 32  # 32x128 = 4096 rays per program
UNROLL_TRIS = 64  # statically unroll the triangle loop below this count


def _tri_cols(tri_ref, i):
    """Read triangle i's nine coordinates as broadcast scalars."""
    return [tri_ref[i, k] for k in range(9)]


def _ray_shear(dx, dy, dz):
    """Per-ray watertight setup, hoisted out of triangle loops: the axis
    permutation masks, the shear constants, and the 1/dz divide depend
    only on the RAY, but _watertight recomputed them for every 8-triangle
    step (16x per chunk walk) — including a per-step divide.  Returns
    (x_max, y_max, sx, sy, inv_dz); z_max = ~(x_max | y_max)."""
    adx, ady, adz = jnp.abs(dx), jnp.abs(dy), jnp.abs(dz)
    x_max = (adx > ady) & (adx > adz)
    y_max = (~x_max) & (ady > adz)
    ddx = jnp.where(x_max, dy, jnp.where(y_max, dz, dx))
    ddy = jnp.where(x_max, dz, jnp.where(y_max, dx, dy))
    ddz = jnp.where(x_max, dx, jnp.where(y_max, dy, dz))
    inv_dz = 1.0 / ddz
    return x_max, y_max, -ddx * inv_dz, -ddy * inv_dz, inv_dz


def _watertight_scaled(pre, ox, oy, oz, cols):
    """Divide-free watertight test against precomputed ray shear `pre`
    (_ray_shear).  Returns (ok, ts, det) in SCALED space: det > 0, the
    real distance is t = ts / det, and `ok` covers sign consistency,
    det != 0 and ts > 0 — the caller enforces the upper t bound by
    cross-multiplication (ts <= t_cur * det), which is how the per-step
    1/det divide (and the wasted barycentric divides in occlusion walks)
    disappear from the hot loops."""
    x_max, y_max, sx, sy, inv_dz = pre
    p0x, p0y, p0z, p1x, p1y, p1z, p2x, p2y, p2z = cols

    def permute(vx, vy, vz):
        px = jnp.where(x_max, vy, jnp.where(y_max, vz, vx))
        py = jnp.where(x_max, vz, jnp.where(y_max, vx, vy))
        pz = jnp.where(x_max, vx, jnp.where(y_max, vy, vz))
        return px, py, pz

    p0tx, p0ty, p0tz = permute(p0x - ox, p0y - oy, p0z - oz)
    p1tx, p1ty, p1tz = permute(p1x - ox, p1y - oy, p1z - oz)
    p2tx, p2ty, p2tz = permute(p2x - ox, p2y - oy, p2z - oz)

    p0tx += sx * p0tz
    p0ty += sy * p0tz
    p1tx += sx * p1tz
    p1ty += sy * p1tz
    p2tx += sx * p2tz
    p2ty += sy * p2tz

    e0 = p1tx * p2ty - p1ty * p2tx
    e1 = p2tx * p0ty - p2ty * p0tx
    e2 = p0tx * p1ty - p0ty * p1tx

    miss_sign = ((e0 < 0) | (e1 < 0) | (e2 < 0)) & (
        (e0 > 0) | (e1 > 0) | (e2 > 0)
    )
    det = e0 + e1 + e2
    ts = (e0 * p0tz + e1 * p1tz + e2 * p2tz) * inv_dz
    neg = det < 0.0
    ts = jnp.where(neg, -ts, ts)
    det = jnp.where(neg, -det, det)
    ok = ~miss_sign & (det != 0.0) & (ts > 0.0)
    return ok, ts, det


def _scaled_min8(ts, det, prim):
    """Reduce per-sublane (8,128) scaled-hit carries to the (1,128)
    closest: tournament of cross-multiplied compares (det > 0), lowest
    prim id on exact scaled ties — one divide total happens later, at
    the caller."""
    while ts.shape[0] > 1:
        h = ts.shape[0] // 2
        ts_a, ts_b = ts[:h], ts[h:]
        det_a, det_b = det[:h], det[h:]
        pr_a, pr_b = prim[:h], prim[h:]
        lhs = ts_b * det_a
        rhs = ts_a * det_b
        take_b = (lhs < rhs) | ((lhs == rhs) & (pr_b < pr_a))
        ts = jnp.where(take_b, ts_b, ts_a)
        det = jnp.where(take_b, det_b, det_a)
        prim = jnp.where(take_b, pr_b, pr_a)
    return ts, det, prim


def _watertight(ox, oy, oz, dx, dy, dz, t_cur, cols):
    """Watertight test for one broadcast triangle against a ray block.

    Returns (hit, t, b0, b1) with t = F32_MAX on miss."""
    p0x, p0y, p0z, p1x, p1y, p1z, p2x, p2y, p2z = cols

    adx, ady, adz = jnp.abs(dx), jnp.abs(dy), jnp.abs(dz)
    # kz = argmax |d| per lane, via selects.
    x_max = (adx > ady) & (adx > adz)
    y_max = (~x_max) & (ady > adz)
    z_max = ~(x_max | y_max)

    def permute(vx, vy, vz):
        # (kx, ky, kz) = cyclic starting after kz.
        px = jnp.where(x_max, vy, jnp.where(y_max, vz, vx))
        py = jnp.where(x_max, vz, jnp.where(y_max, vx, vy))
        pz = jnp.where(x_max, vx, jnp.where(y_max, vy, vz))
        return px, py, pz

    ddx, ddy, ddz = permute(dx, dy, dz)
    p0tx, p0ty, p0tz = permute(p0x - ox, p0y - oy, p0z - oz)
    p1tx, p1ty, p1tz = permute(p1x - ox, p1y - oy, p1z - oz)
    p2tx, p2ty, p2tz = permute(p2x - ox, p2y - oy, p2z - oz)

    inv_dz = 1.0 / ddz
    sx = -ddx * inv_dz
    sy = -ddy * inv_dz
    p0tx += sx * p0tz
    p0ty += sy * p0tz
    p1tx += sx * p1tz
    p1ty += sy * p1tz
    p2tx += sx * p2tz
    p2ty += sy * p2tz

    e0 = p1tx * p2ty - p1ty * p2tx
    e1 = p2tx * p0ty - p2ty * p0tx
    e2 = p0tx * p1ty - p0ty * p1tx

    miss_sign = ((e0 < 0) | (e1 < 0) | (e2 < 0)) & ((e0 > 0) | (e1 > 0) | (e2 > 0))
    det = e0 + e1 + e2
    miss_det = det == 0.0
    det_safe = jnp.where(miss_det, 1.0, det)

    t_scaled = (e0 * p0tz + e1 * p1tz + e2 * p2tz) * inv_dz
    # NOTE: select over i1 vectors is unsupported by this Mosaic version
    # ("Unsupported target bitwidth for truncation"); use logical form.
    neg = det < 0.0
    miss_range = (neg & ((t_scaled >= 0.0) | (t_scaled < t_cur * det))) | (
        ~neg & ((t_scaled <= 0.0) | (t_scaled > t_cur * det))
    )
    inv_det = 1.0 / det_safe
    hit = ~(miss_sign | miss_det | miss_range)
    t = jnp.where(hit, t_scaled * inv_det, F32_MAX)
    return hit, t, e0 * inv_det, e1 * inv_det


def _dense_kernel(
    tri_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
    t_out, prim_out, b0_out, b1_out, *, n_tris: int,
):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]

    def body(i, state):
        t, prim, b0, b1 = state
        hit, ti, bi0, bi1 = _watertight(
            ox, oy, oz, dx, dy, dz, t, _tri_cols(tri_ref, i)
        )
        closer = hit & (ti < t)
        return (
            jnp.where(closer, ti, t),
            jnp.where(closer, i, prim),
            jnp.where(closer, bi0, b0),
            jnp.where(closer, bi1, b1),
        )

    shape = ox.shape
    init = (
        tmax_ref[:],
        jnp.full(shape, -1, dtype=jnp.int32),
        jnp.zeros(shape, dtype=jnp.float32),
        jnp.zeros(shape, dtype=jnp.float32),
    )
    if n_tris <= UNROLL_TRIS:
        # Static unroll: tri_ref[i, k] with a TRACED i is a dynamic
        # scalar load Mosaic cannot hoist or pipeline (9 loads + loop
        # overhead per triangle dominated the small-scene kernel —
        # measured 12.6 ms for 36 tris x 1M rays, a 6x gap to the VPU
        # op floor).  With static i the loads fold into the schedule.
        state = init
        for i in range(n_tris):
            state = body(i, state)
        t, prim, b0, b1 = state
    else:
        t, prim, b0, b1 = jax.lax.fori_loop(0, n_tris, body, init)
    t_out[:] = t
    prim_out[:] = prim
    b0_out[:] = b0
    b1_out[:] = b1


def _any_kernel(
    tri_ref, light_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
    tmax_ref, skip_ref, occ_out, *, n_tris: int,
):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    t_max = tmax_ref[:]
    skip = skip_ref[:]

    def body(i, occ):
        hit, _, _, _ = _watertight(
            ox, oy, oz, dx, dy, dz, t_max, _tri_cols(tri_ref, i)
        )
        # i32 carry: Mosaic can't legalize scf.for over i1 vectors.
        blocked = hit & (light_ref[i, 0] != skip)
        return occ | blocked.astype(jnp.int32)

    if n_tris <= UNROLL_TRIS:
        occ = jnp.zeros(ox.shape, dtype=jnp.int32)
        for i in range(n_tris):  # static unroll (see _dense_kernel)
            occ = body(i, occ)
    else:
        occ = jax.lax.fori_loop(
            0, n_tris, body, jnp.zeros(ox.shape, dtype=jnp.int32)
        )
    occ_out[:] = occ > 0


def _dense_skip_kernel(
    tri_ref, light_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
    tmax_ref, skip_ref, t_out, prim_out, b0_out, b1_out, *, n_tris: int,
):
    """Closest hit ignoring each lane's skip-light triangles — ONE dense
    sweep serves combined closest + shadow-occlusion waves (shadow lanes
    skip their sampled light, bvh.rs:287-293; closest lanes skip -2)."""
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    skip = skip_ref[:]

    def body(i, state):
        t, prim, b0, b1 = state
        hit, ti, bi0, bi1 = _watertight(
            ox, oy, oz, dx, dy, dz, t, _tri_cols(tri_ref, i)
        )
        closer = hit & (ti < t) & (light_ref[i, 0] != skip)
        return (
            jnp.where(closer, ti, t),
            jnp.where(closer, i, prim),
            jnp.where(closer, bi0, b0),
            jnp.where(closer, bi1, b1),
        )

    shape = ox.shape
    init = (
        tmax_ref[:],
        jnp.full(shape, -1, dtype=jnp.int32),
        jnp.zeros(shape, dtype=jnp.float32),
        jnp.zeros(shape, dtype=jnp.float32),
    )
    if n_tris <= UNROLL_TRIS:
        state = init
        for i in range(n_tris):  # static unroll (see _dense_kernel)
            state = body(i, state)
        t, prim, b0, b1 = state
    else:
        t, prim, b0, b1 = jax.lax.fori_loop(0, n_tris, body, init)
    t_out[:] = t
    prim_out[:] = prim
    b0_out[:] = b0
    b1_out[:] = b1


def _pack_rays(o, d, t_max):
    """[N,3] rays -> padded SoA [R,128] planes + original count."""
    n = o.shape[0]
    rows = max((n + LANES - 1) // LANES, 1)
    rows = ((rows + BLOCK_ROWS - 1) // BLOCK_ROWS) * BLOCK_ROWS
    pad = rows * LANES - n

    def plane(x):
        return jnp.pad(x, (0, pad)).reshape(rows, LANES)

    planes = [plane(o[:, k]) for k in range(3)]
    # Padded lanes get d=(1,1,1), t_max=0 so they do no work.
    planes += [
        jnp.pad(d[:, k], (0, pad), constant_values=1.0).reshape(rows, LANES)
        for k in range(3)
    ]
    planes.append(plane(t_max))
    return planes, n, rows


@functools.partial(jax.jit, static_argnames=("interpret",))
def dense_trace(tris_packed, o, d, t_max, interpret: bool = False):
    """Closest hit of every ray against every triangle.

    tris_packed: [T, 12] f32 (cols 0-8 = corners).
    o, d: [N,3]; t_max: [N].  Returns (t [N], prim [N] i32, b0, b1)."""
    n_tris = tris_packed.shape[0]
    planes, n, rows = _pack_rays(o, d, t_max)
    grid = rows // BLOCK_ROWS

    block = pl.BlockSpec(
        (BLOCK_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    tri_spec = pl.BlockSpec(
        tris_packed.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
    t, prim, b0, b1 = pl.pallas_call(
        functools.partial(_dense_kernel, n_tris=n_tris),
        grid=(grid,),
        in_specs=[tri_spec] + [block] * 7,
        out_specs=[block] * 4,
        out_shape=[
            out_shape,
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
            out_shape,
            out_shape,
        ],
        interpret=interpret,
    )(tris_packed, *planes)
    return (
        t.reshape(-1)[:n],
        prim.reshape(-1)[:n],
        b0.reshape(-1)[:n],
        b1.reshape(-1)[:n],
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def dense_trace_skip(tris_packed, tri_light, o, d, t_max, skip_light,
                     interpret: bool = False):
    """Closest hit with per-lane light exclusion (see _dense_skip_kernel).

    tri_light [T,1] i32 area-light ids; skip_light [N] i32.
    Returns (t [N], prim [N] i32, b0, b1)."""
    n_tris = tris_packed.shape[0]
    planes, n, rows = _pack_rays(o, d, t_max)
    skip = jnp.pad(skip_light, (0, rows * LANES - n), constant_values=-2)
    skip = skip.reshape(rows, LANES)
    grid = rows // BLOCK_ROWS

    block = pl.BlockSpec(
        (BLOCK_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    tri_spec = pl.BlockSpec(
        tris_packed.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    light_spec = pl.BlockSpec(
        tri_light.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
    t, prim, b0, b1 = pl.pallas_call(
        functools.partial(_dense_skip_kernel, n_tris=n_tris),
        grid=(grid,),
        in_specs=[tri_spec, light_spec] + [block] * 7 + [block],
        out_specs=[block] * 4,
        out_shape=[
            out_shape,
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
            out_shape,
            out_shape,
        ],
        interpret=interpret,
    )(tris_packed, tri_light, *planes, skip)
    return (
        t.reshape(-1)[:n],
        prim.reshape(-1)[:n],
        b0.reshape(-1)[:n],
        b1.reshape(-1)[:n],
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def any_trace(tris_packed, tri_light, o, d, t_max, skip_light,
              interpret: bool = False):
    """Occlusion test; tri_light [T,1] i32 area-light ids, skip per lane."""
    n_tris = tris_packed.shape[0]
    planes, n, rows = _pack_rays(o, d, t_max)
    skip = jnp.pad(skip_light, (0, rows * LANES - n), constant_values=-2)
    skip = skip.reshape(rows, LANES)
    grid = rows // BLOCK_ROWS

    block = pl.BlockSpec(
        (BLOCK_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    iblock = pl.BlockSpec(
        (BLOCK_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    tri_spec = pl.BlockSpec(
        tris_packed.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    light_spec = pl.BlockSpec(
        tri_light.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    occ = pl.pallas_call(
        functools.partial(_any_kernel, n_tris=n_tris),
        grid=(grid,),
        in_specs=[tri_spec, light_spec] + [block] * 7 + [iblock],
        out_specs=pl.BlockSpec(
            (BLOCK_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.bool_),
        interpret=interpret,
    )(tris_packed, tri_light, *planes, skip)
    return occ.reshape(-1)[:n]


def pack_triangles(p0, p1, p2) -> jnp.ndarray:
    """Build the [T,12] packed layout from [T,3] corner arrays."""
    t = p0.shape[0]
    out = jnp.concatenate(
        [p0, p1, p2, jnp.zeros((t, 3), p0.dtype)], axis=1
    )
    return out
