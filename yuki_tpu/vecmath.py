"""Batched 3D math over JAX arrays.

TPU-first design note (SURVEY.md §2.1): the reference's scalar structs
(``Vec3``/``Point3``/``Normal``/``Spectrum`` in ``yuki/src/math/{vector,point,
normal,spectrum}.rs``) do not exist here.  Everything is a ``float32`` array
with a trailing component axis — positions, directions, normals and RGB
spectra are all ``[..., 3]`` — so every helper below is elementwise-batched
and fuses into surrounding XLA computations.  The proc-macro operator codegen
crate (``yuki_derive``) has no equivalent: jnp broadcasting *is* the operator
set.

All functions take/return jnp arrays and are safe to call under ``jit``,
``vmap`` and inside Pallas kernels.
"""

from __future__ import annotations

import jax.numpy as jnp

# Reference: yuki/src/math/vector.rs:222-249 does the cross product in f64 to
# dodge catastrophic cancellation.  TPU f64 is emulated and slow; we accept
# f32 here (documented divergence) — the watertight triangle test below never
# relies on cross-product precision for hit/miss decisions.


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Dot product over the trailing component axis. Returns [...]."""
    return jnp.sum(a * b, axis=-1)


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Cross product over the trailing axis of size 3."""
    ax, ay, az = a[..., 0], a[..., 1], a[..., 2]
    bx, by, bz = b[..., 0], b[..., 1], b[..., 2]
    return jnp.stack(
        [ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx], axis=-1
    )


def length_sqr(a: jnp.ndarray) -> jnp.ndarray:
    return dot(a, a)


def length(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(length_sqr(a))


def normalize(a: jnp.ndarray) -> jnp.ndarray:
    """a / |a|.  Mirrors Vec3::normalized (no epsilon guard, like reference)."""
    return a / length(a)[..., None]


def normalize_safe(a: jnp.ndarray, eps: float = 1e-20) -> jnp.ndarray:
    """a / max(|a|, eps): for lanes that may hold garbage under masking."""
    return a / jnp.maximum(length(a), eps)[..., None]


def dist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return length(a - b)


def dist_sqr(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return length_sqr(a - b)


def face_forward(n: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Flip n to lie in the hemisphere of v (Normal::faceforward_v,
    yuki/src/math/normal.rs:53-87)."""
    return jnp.where((dot(n, v) < 0.0)[..., None], -n, n)


def reflect(wo: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Mirror wo about n (materials/bsdfs/mod.rs:298-300)."""
    return -wo + n * (2.0 * dot(wo, n))[..., None]


def coordinate_system(v: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Build an orthonormal basis around normalized v.

    Mirrors pbrt-v3 / yuki math/mod.rs:23-34 — but fixes the reference's
    upstream typo (``v.y*v.y + v.z + v.z`` in the else branch) to the correct
    ``sqrt(v.y^2 + v.z^2)`` normalization.
    """
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    use_x = jnp.abs(x) > jnp.abs(y)
    inv_a = 1.0 / jnp.sqrt(jnp.where(use_x, x * x + z * z, y * y + z * z))
    zeros = jnp.zeros_like(x)
    v1 = jnp.where(
        use_x[..., None],
        jnp.stack([-z, zeros, x], axis=-1),
        jnp.stack([zeros, z, -y], axis=-1),
    ) * inv_a[..., None]
    v2 = cross(v, v1)
    return v1, v2


def lerp(a: jnp.ndarray, b: jnp.ndarray, t) -> jnp.ndarray:
    return a + (b - a) * t


def is_black(s: jnp.ndarray) -> jnp.ndarray:
    """Spectrum::is_black (yuki/src/math/spectrum.rs): all components == 0."""
    return jnp.all(s == 0.0, axis=-1)


def max_dimension(v: jnp.ndarray) -> jnp.ndarray:
    """Index of the largest component (Vec3::max_dimension). Returns [...] i32."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    return jnp.where(
        (x > y) & (x > z), 0, jnp.where(y > z, 1, 2)
    ).astype(jnp.int32)


def permute(v: jnp.ndarray, kx, ky, kz) -> jnp.ndarray:
    """Gather components (Vec3::permuted) with per-lane index arrays."""
    comps = jnp.stack([v[..., 0], v[..., 1], v[..., 2]], axis=-1)
    take = lambda k: jnp.take_along_axis(comps, k[..., None], axis=-1)[..., 0]
    return jnp.stack([take(kx), take(ky), take(kz)], axis=-1)
