"""Multi-chip rendering: tile + sample sharding over a jax.sharding Mesh.

The reference's parallelism is a CPU worker pool popping tiles from a
mutex'd deque (SURVEY.md §2.6, renderer/render_manager.rs:197-244).  The
TPU-native equivalent shards the *wave* — the batch of film tiles rendered
per dispatch — across a device mesh:

  axis "tiles"   : data parallelism over pixel tiles. Each chip renders its
                   slice of the wave's tile origins; no cross-chip traffic
                   (the scene is replicated, like the reference's Arc<Scene>
                   broadcast).
  axis "samples" : sample-generation parallelism (the reference's
                   accumulate mode replicating the tile list per sample,
                   render_manager.rs:130-143). Each chip renders the same
                   tiles at a different sample_index; film planes merge
                   with a psum over ICI.

Both axes run inside one shard_map so every chip executes its own
while-loops with local termination (no lock-step global reductions per
traversal step).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import integrators as intg
from ..camera import Camera
from ..sampling import SampleCtx, Sampler


def _render_tiles(scene_data, meta, camera: Camera, sampler: Sampler,
                  integrator, tile_dim: int, origins, sample_index, seed):
    """Render [B] tiles at one sample index -> ([B,td,td,3], rays f32).
    Same per-lane math as renderer.make_wave_renderer."""
    td = tile_dim
    b = origins.shape[0]
    iy, ix = jnp.meshgrid(
        jnp.arange(td, dtype=jnp.int32),
        jnp.arange(td, dtype=jnp.int32),
        indexing="ij",
    )
    px = (origins[:, 0, None, None] + ix[None]).reshape(-1)
    py = (origins[:, 1, None, None] + iy[None]).reshape(-1)
    ctx = SampleCtx(px=px, py=py, sample_index=sample_index, seed=seed)
    u = sampler.get_2d(ctx, 0)
    p_film = jnp.stack(
        [px.astype(jnp.float32), py.astype(jnp.float32)], axis=-1
    ) + u
    o, d = camera.ray(p_film)
    if isinstance(integrator, intg.PathParams):
        res = intg.path_li(scene_data, meta, integrator, sampler, ctx, o, d)
    elif isinstance(integrator, intg.WhittedParams):
        res = intg.whitted_li(scene_data, meta, integrator, sampler, ctx, o, d)
    else:
        raise ValueError(f"unsupported sharded integrator {integrator!r}")
    return (
        res.li.reshape(b, td, td, 3),
        jnp.sum(res.ray_count.astype(jnp.float32)),
    )


def make_sharded_wave_renderer(
    scene,
    camera: Camera,
    sampler: Sampler,
    integrator,
    tile_dim: int,
    mesh: Mesh,
    samples_per_launch: int = 1,
):
    """Build the multi-chip render step over ``mesh`` with axes
    ("tiles", "samples").

    Returns fn(origins [B,2] i32, sample_base i32, seed u32) ->
      (tile_pixels [B,td,td,3] — the *sum* over this launch's
       samples_per_launch sample generations, merged over the "samples"
       axis with a psum — and total rays traced, f32 scalar).

    B must divide by the tiles-axis size; samples_per_launch must divide
    by the samples-axis size.
    """
    data = scene.data
    meta = scene.meta
    n_sample_shards = mesh.shape["samples"]
    assert samples_per_launch % n_sample_shards == 0
    samples_per_shard = samples_per_launch // n_sample_shards

    def shard_fn(data, origins, sample_base, seed):
        # Which sample generations this shard owns.
        shard_idx = jax.lax.axis_index("samples")
        acc = None
        rays = jnp.float32(0.0)
        for k in range(samples_per_shard):
            s = sample_base + shard_idx * samples_per_shard + k
            px, r = _render_tiles(
                data, meta, camera, sampler, integrator, tile_dim,
                origins, s.astype(jnp.uint32), seed,
            )
            acc = px if acc is None else acc + px
            rays = rays + r
        # Merge sample-parallel film planes + ray totals over ICI.
        acc = jax.lax.psum(acc, axis_name="samples")
        rays = jax.lax.psum(rays, axis_name=("tiles", "samples"))
        return acc, rays

    # Scene arrays are a replicated ARGUMENT, not a closure constant (the
    # remote compiler inlines constants into the compile payload — see
    # renderer.make_wave_renderer).
    data_spec = jax.tree_util.tree_map(lambda _: P(), data)
    mapped = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(data_spec, P("tiles", None), P(), P()),
        out_specs=(P("tiles", None, None, None), P()),
        # Loop carries start replicated and become device-varying; skip the
        # varying-manual-axes type check rather than pvary every init.
        check_vma=False,
    )
    jitted = jax.jit(mapped)

    def call(origins, sample_base, seed):
        return jitted(data, origins, sample_base, seed)

    return call


def default_mesh(
    n_tiles_axis: Optional[int] = None, n_samples_axis: int = 1,
    devices=None,
) -> Mesh:
    """Mesh over available devices: tiles-major (spatial sharding scales
    bandwidth-free; sample axis only pays one psum per launch)."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if n_tiles_axis is None:
        n_tiles_axis = n // n_samples_axis
    assert n_tiles_axis * n_samples_axis == n
    return Mesh(
        devices.reshape(n_tiles_axis, n_samples_axis), ("tiles", "samples")
    )
