"""Per-ray treelet dispatch traversal: the MoE formulation.

Round-1's pair-list walk (trace_pairs.py) culls treelets per 1024-ray
*block bundle*; on divergent bounce waves a block's union of candidate
treelets approaches ALL treelets (measured 163k block pairs on a 65k-ray
colonnade bounce wave = every block visiting every treelet), so the cull
amplifies work ~7.5x per ray and the wave pays a dense sweep.

This module dispatches rays to treelets the way an MoE layer dispatches
tokens to experts — per item, not per block:

  1. `ray_candidate_tiles`: an EXACT per-ray slab test of every ray
     against every treelet AABB ([T, N] on the VPU, fully dense), then a
     cumsum+scatter compaction into a treelet-major (ray, treelet) pair
     list whose per-treelet segments are padded to TILE=1024 slots.
  2. Ray planes are gathered once into dense per-tile buffers (rows of 8
     sublanes x 128 lanes), so the Pallas kernel is a plain streaming
     grid: tile g = 1024 gathered rays x treelet tile_treelet[g]'s K
     padded triangles, with zero cross-tile state.
  3. Results scatter-min back by ray id (associative, so deterministic
     under duplicates); t-ties break toward the smaller prim id, a pure
     function of the candidate set, so images stay independent of wave
     partitioning (the determinism contract in ARCHITECTURE.md).

Against the reference's per-ray front-to-back descent (yuki/src/bvh.rs:
160-232) this trades the early-out ordering for exact-candidate batching:
every (ray, treelet-AABB-overlap) pair is tested, but nothing else is.

Gather/scatter rates measured on the v5e (benchmarks/tpu_primitives.py)
are bandwidth-class, not the feared 50x penalty, which is what makes this
formulation viable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from yuki_tpu.ops.trace import _watertight, F32_MAX, LANES

TILE_ROWS = 8  # sublanes per tile
TILE = TILE_ROWS * LANES  # pair slots per tile (1024)
TILE_CHUNK = 512  # tiles per pallas launch (dead chunks cond-skipped)
MAX_TILE_CHUNKS = 16  # capacity: 8192 tiles = 8.4M pair slots
MAX_PAIRS = 1 << 20  # compact (ray, treelet) pair capacity per traversal
I32_MAX = 2147483647


def _slab_hits(bounds, o, d, t_max):
    """Exact slab test of every ray against every AABB -> [T, N] bool.

    bounds: [T, 8] (lo3, hi3, pad2); o, d: [N, 3]; t_max: [N].
    d components of exactly 0 are nudged to keep inv finite (avoids the
    0 * inf = NaN slab hazard; the nudge only widens hits)."""
    safe = jnp.where(jnp.abs(d) < 1e-20, jnp.where(d < 0, -1e-20, 1e-20), d)
    inv = 1.0 / safe  # [N, 3]
    lo = bounds[:, 0:3]
    hi = bounds[:, 3:6]
    t0 = (lo[:, None, :] - o[None, :, :]) * inv[None, :, :]
    t1 = (hi[:, None, :] - o[None, :, :]) * inv[None, :, :]
    tmin = jnp.minimum(t0, t1).max(axis=-1)
    tmax = jnp.maximum(t0, t1).min(axis=-1)
    return jnp.maximum(tmin, 0.0) <= jnp.minimum(tmax, t_max[None, :])


def ray_candidate_tiles(tl, o, d, t_max, max_tiles: int,
                        max_pairs: int = MAX_PAIRS):
    """Exact per-ray cull -> treelet-major tiles.

    The compaction is gather-shaped on purpose: a scatter over the [T, N]
    hit matrix costs ~8 ms per M updates on the v5e (193M updates = 1.6 s,
    measured), while cumsum + per-output binary search costs O(pairs) —
    the pair count is ~500x smaller than the matrix.

    Returns (tile_treelet [max_tiles] i32, pair_ray [max_tiles*TILE] i32
    with N = dummy, n_tiles i32).  n_tiles is forced above max_tiles when
    the compact pair list overflows max_pairs, so callers' overflow
    fallback covers both capacities."""
    n = o.shape[0]
    n_t = tl.n_treelets
    hits = _slab_hits(tl.treelet_bounds, o, d, t_max)  # [T, N]

    cs = jnp.cumsum(hits.reshape(-1), dtype=jnp.int32)  # flat, treelet-major
    n_pairs = cs[-1]
    ends = cs[jnp.arange(1, n_t + 1) * n - 1]  # per-treelet inclusive ends
    starts = jnp.concatenate([jnp.zeros(1, jnp.int32), ends[:-1]])
    counts = ends - starts  # [T]
    m = (counts + (TILE - 1)) // TILE  # tiles per treelet
    tile_off = jnp.cumsum(m) - m  # exclusive prefix
    n_tiles = tile_off[-1] + m[-1]
    n_tiles = jnp.where(n_pairs > max_pairs, jnp.int32(I32_MAX), n_tiles)

    # tile_treelet: scatter each treelet's id+1 at its first tile then
    # forward-fill with cummax (ids ascend; empty treelets lose the
    # scatter-max collision to the real owner of the slot).
    t_ids = jnp.arange(n_t, dtype=jnp.int32)
    first = jnp.zeros(max_tiles, jnp.int32).at[
        jnp.where(m > 0, tile_off, max_tiles)
    ].max(t_ids + 1, mode="drop")
    tile_treelet = jnp.maximum(jax.lax.cummax(first) - 1, 0)

    # Compact pair s -> flat (treelet, ray) position by binary search over
    # the monotone cumsum; then its padded slot within the treelet's tiles.
    s = jnp.arange(max_pairs, dtype=jnp.int32)
    flat_pos = jnp.searchsorted(cs, s + 1).astype(jnp.int32)
    live = s < n_pairs
    t_of = jnp.minimum(flat_pos // n, n_t - 1)
    r_of = flat_pos - t_of * n
    slot = tile_off[t_of] * TILE + (s - starts[t_of])
    pair_ray = jnp.full(max_tiles * TILE, n, jnp.int32).at[
        jnp.where(live, slot, max_tiles * TILE)
    ].set(r_of, mode="drop")
    return tile_treelet, pair_ray, n_tiles


def _gather_tiles(pair_ray, table, n_planes: int):
    """Gather ray planes per pair slot into the kernel layout
    [n_tiles*TILE_ROWS, n_planes*LANES]: row g*8+s, col p*128+l holds
    plane p of pair slot (g, s*128+l)."""
    g = table[pair_ray]  # [P, n_planes]
    g = g.reshape(-1, TILE_ROWS, LANES, n_planes)
    g = g.transpose(0, 1, 3, 2)  # [G, rows, planes, lanes]
    return g.reshape(-1, n_planes * LANES)


def _cols(rp_ref, n):
    return [rp_ref[:, k * LANES : (k + 1) * LANES] for k in range(n)]


def _dispatch_closest_kernel(tt_ref, tri_ref, rp_ref, out_ref, *, leaf_size):
    """One tile: 1024 gathered rays vs one treelet's K padded triangles.
    out: [TILE_ROWS, 512] = t | prim(f32) | b0 | b1, t=F32_MAX on miss."""
    ox, oy, oz, dx, dy, dz, tmax = _cols(rp_ref, 7)

    def body(k, state):
        t, prim, b0, b1 = state
        cols = [tri_ref[k, c] for c in range(9)]
        hit, ti, bi0, bi1 = _watertight(ox, oy, oz, dx, dy, dz, t, cols)
        pid = tri_ref[k, 10]
        # pid < 0 marks padding rows (FMA contraction can give degenerate
        # padding a nonzero edge function — mask by id, ARCHITECTURE.md).
        closer = hit & (ti < t) & (pid >= 0.0)
        return (
            jnp.where(closer, ti, t),
            jnp.where(closer, pid, prim),
            jnp.where(closer, bi0, b0),
            jnp.where(closer, bi1, b1),
        )

    shape = ox.shape
    init = (
        tmax,
        jnp.full(shape, -1.0, jnp.float32),
        jnp.zeros(shape, jnp.float32),
        jnp.zeros(shape, jnp.float32),
    )
    t, prim, b0, b1 = jax.lax.fori_loop(0, leaf_size, body, init)
    found = prim >= 0.0
    out_ref[:, 0:128] = jnp.where(found, t, F32_MAX)
    out_ref[:, 128:256] = prim
    out_ref[:, 256:384] = b0
    out_ref[:, 384:512] = b1


def _dispatch_any_kernel(tt_ref, tri_ref, rp_ref, occ_ref, *, leaf_size):
    """One tile, occlusion: any hit whose area-light id != the ray's skip.
    rp planes: o(3) d(3) t_max skip -> exactly 8."""
    ox, oy, oz, dx, dy, dz, tmax, skip = _cols(rp_ref, 8)

    def body(k, occ):
        cols = [tri_ref[k, c] for c in range(9)]
        hit, _, _, _ = _watertight(ox, oy, oz, dx, dy, dz, tmax, cols)
        light = tri_ref[k, 9]
        pid = tri_ref[k, 10]
        blocked = hit & (light != skip) & (pid >= 0.0)
        return occ | blocked.astype(jnp.int32)

    occ_ref[:] = jax.lax.fori_loop(
        0, leaf_size, body, jnp.zeros(ox.shape, jnp.int32)
    )


def _run_chunks(kernel, tl, tile_treelet, rp, n_tiles, max_tiles, out_width,
                out_dtype, interpret):
    """Launch cond-skipped TILE_CHUNK-sized pallas calls over the tiles."""
    k = tl.leaf_size
    chunk = min(TILE_CHUNK, max_tiles)
    n_chunks = (max_tiles + chunk - 1) // chunk
    n_planes = rp.shape[1] // LANES
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(chunk,),
        in_specs=[
            pl.BlockSpec((k, 128), lambda g, tt: (tt[g], 0)),
            pl.BlockSpec((TILE_ROWS, n_planes * LANES), lambda g, tt: (g, 0)),
        ],
        out_specs=[pl.BlockSpec((TILE_ROWS, out_width), lambda g, tt: (g, 0))],
    )
    outs = []
    miss_fill = F32_MAX if out_dtype == jnp.float32 else 0
    for c in range(n_chunks):
        tt_c = jax.lax.dynamic_slice(tile_treelet, (c * chunk,), (chunk,))
        rp_c = jax.lax.dynamic_slice(
            rp, (c * chunk * TILE_ROWS, 0), (chunk * TILE_ROWS, rp.shape[1])
        )

        def run(args):
            tt_c, rp_c = args
            (out,) = pl.pallas_call(
                functools.partial(kernel, leaf_size=k),
                grid_spec=grid_spec,
                out_shape=[
                    jax.ShapeDtypeStruct((chunk * TILE_ROWS, out_width),
                                         out_dtype)
                ],
                interpret=interpret,
            )(tt_c, tl.tris_padded, rp_c)
            return out

        def skip(args):
            return jnp.full((chunk * TILE_ROWS, out_width), miss_fill,
                            out_dtype)

        outs.append(
            jax.lax.cond(c * chunk < n_tiles, run, skip, (tt_c, rp_c))
        )
    return jnp.concatenate(outs, axis=0)


def _flat(pair_out, col):
    """Column block col of the packed per-tile output -> flat [P] pair
    order (tile, sublane, lane)."""
    return pair_out[:, col * LANES : (col + 1) * LANES].reshape(-1)


@functools.partial(
    jax.jit, static_argnames=("max_tiles", "max_pairs", "interpret")
)
def dispatch_closest(tl, o, d, t_max,
                     max_tiles: int = TILE_CHUNK * MAX_TILE_CHUNKS,
                     max_pairs: int = MAX_PAIRS,
                     interpret: bool = False):
    """Closest hit via per-ray treelet dispatch.

    Returns (t [N] (= t_max on miss), prim [N] i32 (-1 miss), b0, b1,
    n_tiles) — caller falls back when n_tiles exceeds max_tiles."""
    n = o.shape[0]
    tile_treelet, pair_ray, n_tiles = ray_candidate_tiles(
        tl, o, d, t_max, max_tiles, max_pairs
    )
    # Ray table with a dummy row N (t_max=-1 -> every test misses).
    table = jnp.concatenate(
        [o, d, t_max[:, None]], axis=1
    )
    table = jnp.concatenate(
        [table,
         jnp.asarray([[0.0, 0.0, 0.0, 1.0, 1.0, 1.0, -1.0]], jnp.float32)],
        axis=0,
    )
    rp = _gather_tiles(pair_ray, table, 7)
    out = _run_chunks(
        _dispatch_closest_kernel, tl, tile_treelet, rp, n_tiles, max_tiles,
        512, jnp.float32, interpret,
    )

    # Compact the hit slots first (cumsum + binary search, like the cull):
    # scatter-min over every padded slot would cost ~8 ms/M on the v5e.
    prim_all = _flat(out, 1)
    hitf = (prim_all >= 0) & (pair_ray < n)  # dummies carry pair_ray == n
    hcs = jnp.cumsum(hitf.astype(jnp.int32))
    n_hits = hcs[-1]
    q = jnp.arange(max_pairs, dtype=jnp.int32)
    hpos = jnp.minimum(
        jnp.searchsorted(hcs, q + 1).astype(jnp.int32), hitf.shape[0] - 1
    )
    livex = q < n_hits
    ray_h = jnp.where(livex, pair_ray[hpos], n)
    t_h = jnp.where(livex, _flat(out, 0)[hpos], F32_MAX)
    prim_h = jnp.where(livex, prim_all[hpos].astype(jnp.int32), I32_MAX)
    b0_h = _flat(out, 2)[hpos]
    b1_h = _flat(out, 3)[hpos]

    # Min-t per ray; ties break to the smaller prim id (deterministic and
    # independent of tile/wave partitioning).
    t_sc = jnp.full(n + 1, F32_MAX, jnp.float32).at[ray_h].min(t_h)
    is_min = livex & (t_h == t_sc[ray_h])
    prim_sc = jnp.full(n + 1, I32_MAX, jnp.int32).at[
        jnp.where(is_min, ray_h, n)
    ].min(prim_h)
    win = is_min & (prim_h == prim_sc[ray_h])
    widx = jnp.where(win, ray_h, n)
    b0_sc = jnp.zeros(n + 1, jnp.float32).at[widx].set(b0_h, mode="drop")
    b1_sc = jnp.zeros(n + 1, jnp.float32).at[widx].set(b1_h, mode="drop")

    hit = t_sc[:n] < F32_MAX
    return (
        jnp.where(hit, t_sc[:n], t_max),
        jnp.where(hit, prim_sc[:n], -1),
        b0_sc[:n],
        b1_sc[:n],
        n_tiles,
    )


@functools.partial(
    jax.jit, static_argnames=("max_tiles", "max_pairs", "interpret")
)
def dispatch_any(tl, o, d, t_max, skip_light,
                 max_tiles: int = TILE_CHUNK * MAX_TILE_CHUNKS,
                 max_pairs: int = MAX_PAIRS,
                 interpret: bool = False):
    """Occlusion via per-ray treelet dispatch. Returns (occluded [N] bool,
    n_tiles)."""
    n = o.shape[0]
    tile_treelet, pair_ray, n_tiles = ray_candidate_tiles(
        tl, o, d, t_max, max_tiles, max_pairs
    )
    table = jnp.concatenate(
        [o, d, t_max[:, None], skip_light.astype(jnp.float32)[:, None]],
        axis=1,
    )
    table = jnp.concatenate(
        [table,
         jnp.asarray([[0.0, 0.0, 0.0, 1.0, 1.0, 1.0, -1.0, -2.0]],
                     jnp.float32)],
        axis=0,
    )
    rp = _gather_tiles(pair_ray, table, 8)
    out = _run_chunks(
        _dispatch_any_kernel, tl, tile_treelet, rp, n_tiles, max_tiles,
        LANES, jnp.int32, interpret,
    )
    # Compact the occluded slots, then one small scatter.
    occ_pair = out.reshape(-1)
    occf = (occ_pair > 0) & (pair_ray < n)
    ocs = jnp.cumsum(occf.astype(jnp.int32))
    n_occ = ocs[-1]
    q = jnp.arange(max_pairs, dtype=jnp.int32)
    opos = jnp.minimum(
        jnp.searchsorted(ocs, q + 1).astype(jnp.int32), occf.shape[0] - 1
    )
    ray_o = jnp.where(q < n_occ, pair_ray[opos], n)
    occ = jnp.zeros(n + 1, jnp.int32).at[ray_o].max(1, mode="drop")
    return occ[:n] > 0, n_tiles
