"""Stateless counter-based samplers.

The reference's pbrt-v4 "seeking" sampler contract (yuki/src/sampling/mod.rs:
46-57) is: a sample value depends only on ``(seed, pixel, sample_index,
dimension)`` — which is why accumulation order doesn't matter there.  On TPU
we keep exactly that contract but drop all mutable state: every dimension is
produced by hashing the key tuple directly, so any lane of any wavefront can
compute any dimension with no sequencing.  This is the idiomatic JAX/TPU
replacement for the reference's reseeded-PCG32-per-pixel design
(uniform.rs:72-84, stratified.rs:90-102); it matches in distribution, not
bitwise (the reference hashes pixels with Rust's SipHash DefaultHasher —
documented in SURVEY.md §7 "hard parts").

Samplers:
  UniformSampler    <- yuki/src/sampling/uniform.rs
  StratifiedSampler <- yuki/src/sampling/stratified.rs (on-the-fly stratified
                       via Kensler permutation_element, the pbrt-v4 design)

Dimensions are Python ints at trace time (wavefront passes consume dimensions
uniformly across lanes), so each get_1d/get_2d compiles to a handful of u32
VPU ops with zero memory traffic.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import NamedTuple, Union

import jax
import jax.numpy as jnp

U32 = jnp.uint32


def _u32(x) -> jnp.ndarray:
    if isinstance(x, int):
        import numpy as _np

        return jnp.asarray(_np.uint32(x & 0xFFFFFFFF))
    return jnp.asarray(x).astype(U32)


def pcg_hash(x: jnp.ndarray) -> jnp.ndarray:
    """PCG output permutation used as a mixer (u32 -> u32).

    Standard pcg_hash from "Hash Functions for GPU Rendering" (Jarzynski &
    Olano 2020) — the same family pbrt-v4 uses for sampler hashing.
    """
    x = _u32(x)
    state = x * U32(747796405) + U32(2891336453)
    word = ((state >> ((state >> U32(28)) + U32(4))) ^ state) * U32(277803737)
    return (word >> U32(22)) ^ word


def hash_key(*vals) -> jnp.ndarray:
    """Chain-mix an arbitrary key tuple into a u32.

    Plays the role of the reference's ``hash_values!`` macro
    (yuki/src/sampling/mod.rs:89-103) which fed Rust's DefaultHasher; here a
    chained PCG mix, which is cheaper (the reference measured ~3% of total
    render time in hashing) and vectorizes on the VPU.
    """
    h = _u32(0x9E3779B9)
    for v in vals:
        h = pcg_hash(h ^ _u32(v))
    return h


def u32_to_unit_float(u: jnp.ndarray) -> jnp.ndarray:
    """Map u32 -> [0,1) float32 (matches rand's Standard f32 distribution:
    24 high bits / 2^24)."""
    return (u >> U32(8)).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


def permutation_element(i: jnp.ndarray, l: int, p: jnp.ndarray) -> jnp.ndarray:
    """Kensler-style hash permutation of ``i`` in [0, l) keyed by ``p``.

    Port of stratified.rs:147-178 (itself from the Pixar multi-jitter paper).
    The rejection loop runs in lockstep with a done-mask; for power-of-two
    ``l`` it accepts on the first round, otherwise expected <2 rounds.
    """
    w = l - 1
    w |= w >> 1
    w |= w >> 2
    w |= w >> 4
    w |= w >> 8
    w |= w >> 16
    wj = U32(w)
    lj = U32(l)
    p = _u32(p)
    i = _u32(i)

    def round_fn(i):
        i ^= p
        i *= U32(0xE170893D)
        i ^= p >> U32(16)
        i ^= (i & wj) >> U32(4)
        i ^= p >> U32(8)
        i *= U32(0x0929EB3F)
        i ^= p >> U32(23)
        i ^= (i & wj) >> U32(1)
        i *= U32(1) | (p >> U32(27))
        i *= U32(0x6935FA69)
        i ^= (i & wj) >> U32(11)
        i *= U32(0x74DCB303)
        i ^= (i & wj) >> U32(2)
        i *= U32(0x9E501CC3)
        i ^= (i & wj) >> U32(2)
        i *= U32(0xC860A3DF)
        i &= wj
        i ^= i >> U32(5)
        return i

    def cond(state):
        i, _accepted = state
        return jnp.any(i >= lj)

    def body(state):
        i, accepted = state
        new_i = round_fn(i)
        i = jnp.where(accepted, i, new_i)
        return i, accepted | (i < lj)

    i0 = round_fn(i)
    i_final, _ = jax.lax.while_loop(
        cond, body, (i0, i0 < lj)
    )
    return (i_final + p) % lj


class SampleCtx(NamedTuple):
    """Per-lane sampler key state: which (pixel, sample) each lane is on.

    Replaces Sampler::start_pixel_sample — constructing a SampleCtx *is*
    the seek.
    """

    px: jnp.ndarray  # int/uint [N...] pixel x
    py: jnp.ndarray  # pixel y
    sample_index: jnp.ndarray  # u32, broadcastable to px
    seed: Union[int, jnp.ndarray]  # u32 scalar render seed

    def pixel_hash(self) -> jnp.ndarray:
        return hash_key(self.seed, _u32(self.px) << U32(16) | _u32(self.py))


def _dim_u32(ctx: SampleCtx, dim: int) -> jnp.ndarray:
    """Raw u32 for (seed, pixel, sample_index, dimension)."""
    return pcg_hash(
        pcg_hash(ctx.pixel_hash() ^ _u32(ctx.sample_index)) ^ _u32(dim)
    )


@dataclass(frozen=True)
class UniformSampler:
    """Uncorrelated uniform dimensions; spp = pixel_samples
    (yuki/src/sampling/uniform.rs)."""

    pixel_samples: int = 1

    @property
    def samples_per_pixel(self) -> int:
        return self.pixel_samples

    def get_1d(self, ctx: SampleCtx, dim: int) -> jnp.ndarray:
        return u32_to_unit_float(_dim_u32(ctx, dim))

    def get_2d(self, ctx: SampleCtx, dim: int) -> jnp.ndarray:
        return jnp.stack(
            [
                u32_to_unit_float(_dim_u32(ctx, dim)),
                u32_to_unit_float(_dim_u32(ctx, dim + 1)),
            ],
            axis=-1,
        )


@dataclass(frozen=True)
class StratifiedSampler:
    """On-the-fly stratified sampling (yuki/src/sampling/stratified.rs).

    2D dimensions are stratified on an (x,y) grid, 1D on x*y strata; the
    stratum for (pixel, dim) is chosen by permutation_element keyed on
    hash(pixel, dim, seed) — exactly the reference's scheme, with the jitter
    drawn from the stateless hash instead of a carried PCG stream.
    """

    pixel_samples_x: int = 1
    pixel_samples_y: int = 1
    symmetric_dimensions: bool = True  # UI behaviour: edit x edits y too
    jitter: bool = True

    @property
    def samples_per_pixel(self) -> int:
        return self.pixel_samples_x * self.pixel_samples_y

    def _stratum(self, ctx: SampleCtx, dim: int) -> jnp.ndarray:
        hashed = hash_key(ctx.pixel_hash(), dim)
        return permutation_element(
            _u32(ctx.sample_index), self.samples_per_pixel, hashed
        )

    def get_1d(self, ctx: SampleCtx, dim: int) -> jnp.ndarray:
        stratum = self._stratum(ctx, dim)
        if self.jitter:
            delta = u32_to_unit_float(_dim_u32(ctx, dim))
        else:
            delta = jnp.float32(0.5)
        return (stratum.astype(jnp.float32) + delta) / jnp.float32(
            self.samples_per_pixel
        )

    def get_2d(self, ctx: SampleCtx, dim: int) -> jnp.ndarray:
        stratum = self._stratum(ctx, dim)
        # NOTE: mirrors the reference exactly, including its use of
        # pixel_samples.y as the divisor for the y stratum index
        # (stratified.rs:131-133) — intentional parity, not a bug here.
        x = (stratum % U32(self.pixel_samples_x)).astype(jnp.float32)
        y = (stratum // U32(self.pixel_samples_y)).astype(jnp.float32)
        if self.jitter:
            dx = u32_to_unit_float(_dim_u32(ctx, dim))
            dy = u32_to_unit_float(_dim_u32(ctx, dim + 1))
        else:
            dx = dy = jnp.float32(0.5)
        return jnp.stack(
            [
                (x + dx) / jnp.float32(self.pixel_samples_x),
                (y + dy) / jnp.float32(self.pixel_samples_y),
            ],
            axis=-1,
        )


Sampler = Union[UniformSampler, StratifiedSampler]


def force_single_sample(sampler: Sampler) -> Sampler:
    """Interactive-preview override (SamplerType::instantiate(force_single_
    sample), sampling/mod.rs:21-32)."""
    if isinstance(sampler, UniformSampler):
        return UniformSampler(pixel_samples=1)
    return StratifiedSampler(
        pixel_samples_x=1,
        pixel_samples_y=1,
        symmetric_dimensions=sampler.symmetric_dimensions,
        jitter=sampler.jitter,
    )


# --- shared sampling transforms (sampling/mod.rs:62-87) -------------------


def concentric_sample_disk(u: jnp.ndarray) -> jnp.ndarray:
    """Map [0,1)^2 to the unit disk; u is [...,2]."""
    offset = u * 2.0 - 1.0
    ox, oy = offset[..., 0], offset[..., 1]
    degenerate = (ox == 0.0) & (oy == 0.0)
    # Avoid div-by-zero in masked lanes.
    ox_s = jnp.where(ox == 0.0, 1.0, ox)
    oy_s = jnp.where(oy == 0.0, 1.0, oy)
    use_x = jnp.abs(ox) > jnp.abs(oy)
    theta = jnp.where(
        use_x,
        (math.pi / 4.0) * (oy / ox_s),
        (math.pi / 2.0) - (math.pi / 4.0) * (ox / oy_s),
    )
    r = jnp.where(use_x, ox, oy)
    d = jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=-1) * r[..., None]
    return jnp.where(degenerate[..., None], 0.0, d)


def cosine_sample_hemisphere(u: jnp.ndarray) -> jnp.ndarray:
    """Cosine-weighted hemisphere about +z; u is [...,2] -> [...,3]."""
    d = concentric_sample_disk(u)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - d[..., 0] ** 2 - d[..., 1] ** 2))
    return jnp.stack([d[..., 0], d[..., 1], z], axis=-1)
