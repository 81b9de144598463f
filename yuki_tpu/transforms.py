"""Host-side 4x4 transforms (numpy) + device-side application helpers.

TPU-first split: transforms live on the *host* as numpy ``float32`` M/M^-1
pairs (mirroring ``yuki/src/math/{matrix,transform,transforms}.rs``) and are
baked into scene arrays at load time — world-space pre-transformed vertices,
light matrices as ``[4,4]`` constants.  The device hot path never does
per-hit matrix inversions; the few per-ray matrix applications (sphere
object-space tests, rect-light sampling) use the batched appliers at the
bottom of this file.

Reference map:
  translation/scale/rotation_{x,y,z}/rotation/rotation_euler/look_at
    -> yuki/src/math/transforms.rs:4-153 (same analytic m/m_inv construction)
  Transform mul / swaps_handedness -> yuki/src/math/transform.rs:60-120
  Matrix4x4::inverted (Gauss-Jordan) / decompose -> yuki/src/math/matrix.rs
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp


def _mat(rows) -> np.ndarray:
    return np.asarray(rows, dtype=np.float32)


IDENTITY = np.eye(4, dtype=np.float32)


def invert_full_pivot(m: np.ndarray) -> np.ndarray:
    """Gauss-Jordan inversion with full pivoting in f32, mirroring
    Matrix4x4::inverted (yuki/src/math/matrix.rs:108-212) to keep the same
    numerical behaviour as the reference for degenerate-ish inputs."""
    a = m.astype(np.float32).copy()
    inv = np.eye(4, dtype=np.float32)
    row_perm = list(range(4))
    for col in range(4):
        # Full pivot search in remaining submatrix (by absolute value).
        sub = np.abs(a[col:, col:])
        r, c = np.unravel_index(np.argmax(sub), sub.shape)
        r += col
        c += col
        if a[r, c] == 0.0:
            raise np.linalg.LinAlgError("singular matrix")
        if r != col:
            a[[col, r]] = a[[r, col]]
            inv[[col, r]] = inv[[r, col]]
        if c != col:
            a[:, [col, c]] = a[:, [c, col]]
            row_perm[col], row_perm[c] = row_perm[c], row_perm[col]
        pivot = a[col, col]
        a[col] /= pivot
        inv[col] /= pivot
        for rr in range(4):
            if rr != col:
                f = a[rr, col]
                a[rr] -= f * a[col]
                inv[rr] -= f * inv[col]
    # Undo column swaps (they permute the rows of the inverse).
    out = np.empty_like(inv)
    for i, p in enumerate(row_perm):
        out[p] = inv[i]
    return out


@dataclass(frozen=True)
class Transform:
    """An M / M^-1 pair (yuki/src/math/transform.rs)."""

    m: np.ndarray
    m_inv: np.ndarray

    @staticmethod
    def identity() -> "Transform":
        return Transform(IDENTITY, IDENTITY)

    @staticmethod
    def from_matrix(m) -> "Transform":
        m = _mat(m)
        return Transform(m, invert_full_pivot(m))

    def inverted(self) -> "Transform":
        return Transform(self.m_inv, self.m)

    def __matmul__(self, other: "Transform") -> "Transform":
        return Transform(
            (self.m @ other.m).astype(np.float32),
            (other.m_inv @ self.m_inv).astype(np.float32),
        )

    # --- host-side single application (scene building) ------------------
    def apply_p(self, p) -> np.ndarray:
        """Transform a point (projective divide like transform.rs Mul<Point3>)."""
        p = np.asarray(p, dtype=np.float32)
        out = self.m[:3, :3] @ p + self.m[:3, 3]
        w = self.m[3, :3] @ p + self.m[3, 3]
        return (out / w).astype(np.float32) if w != 1.0 else out.astype(np.float32)

    def apply_v(self, v) -> np.ndarray:
        v = np.asarray(v, dtype=np.float32)
        return (self.m[:3, :3] @ v).astype(np.float32)

    def apply_n(self, n) -> np.ndarray:
        """Normals transform by the inverse transpose (transform.rs:148-166)."""
        n = np.asarray(n, dtype=np.float32)
        return (self.m_inv[:3, :3].T @ n).astype(np.float32)

    def swaps_handedness(self) -> bool:
        """det of the upper 3x3 < 0 (transform.rs:88-95)."""
        return bool(np.linalg.det(self.m[:3, :3].astype(np.float64)) < 0.0)

    def decompose(self):
        """TRS + Euler decomposition (matrix.rs:215-262). Returns
        (translation[3], rotation_euler_xyz[3], scale[3])."""
        m = self.m
        t = m[:3, 3].copy()
        s = np.array(
            [
                np.linalg.norm(m[:3, 0]),
                np.linalg.norm(m[:3, 1]),
                np.linalg.norm(m[:3, 2]),
            ],
            dtype=np.float32,
        )
        if np.any(s == 0.0):
            raise ValueError("cannot decompose matrix with zero scale")
        mr = m[:3, :3] / s[None, :]
        theta_x = np.arctan2(mr[1, 2], mr[2, 2])
        c2 = np.sqrt(mr[0, 0] ** 2 + mr[0, 1] ** 2)
        theta_y = np.arctan2(-mr[0, 2], c2)
        s1, c1 = np.sin(theta_x), np.cos(theta_x)
        theta_z = np.arctan2(
            s1 * mr[2, 0] - c1 * mr[1, 0], c1 * mr[1, 1] - s1 * mr[2, 1]
        )
        return t, np.array([theta_x, theta_y, theta_z], dtype=np.float32), s


def translation(delta) -> Transform:
    dx, dy, dz = np.asarray(delta, dtype=np.float32)
    m = _mat([[1, 0, 0, dx], [0, 1, 0, dy], [0, 0, 1, dz], [0, 0, 0, 1]])
    mi = _mat([[1, 0, 0, -dx], [0, 1, 0, -dy], [0, 0, 1, -dz], [0, 0, 0, 1]])
    return Transform(m, mi)


def scale(x, y, z) -> Transform:
    m = _mat([[x, 0, 0, 0], [0, y, 0, 0], [0, 0, z, 0], [0, 0, 0, 1]])
    mi = _mat(
        [[1.0 / x, 0, 0, 0], [0, 1.0 / y, 0, 0], [0, 0, 1.0 / z, 0], [0, 0, 0, 1]]
    )
    return Transform(m, mi)


def rotation_x(theta: float) -> Transform:
    c, s = np.cos(theta), np.sin(theta)
    m = _mat([[1, 0, 0, 0], [0, c, -s, 0], [0, s, c, 0], [0, 0, 0, 1]])
    return Transform(m, m.T.copy())


def rotation_y(theta: float) -> Transform:
    c, s = np.cos(theta), np.sin(theta)
    m = _mat([[c, 0, s, 0], [0, 1, 0, 0], [-s, 0, c, 0], [0, 0, 0, 1]])
    return Transform(m, m.T.copy())


def rotation_z(theta: float) -> Transform:
    c, s = np.cos(theta), np.sin(theta)
    m = _mat([[c, -s, 0, 0], [s, c, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]])
    return Transform(m, m.T.copy())


def rotation(theta: float, axis) -> Transform:
    a = np.asarray(axis, dtype=np.float32)
    a = a / np.linalg.norm(a)
    c, s = np.cos(theta), np.sin(theta)
    x, y, z = a
    m = _mat(
        [
            [x * x + (1 - x * x) * c, x * y * (1 - c) - z * s, x * z * (1 - c) + y * s, 0],
            [x * y * (1 - c) + z * s, y * y + (1 - y * y) * c, y * z * (1 - c) - x * s, 0],
            [x * z * (1 - c) - y * s, y * z * (1 - c) + x * s, z * z + (1 - z * z) * c, 0],
            [0, 0, 0, 1],
        ]
    )
    return Transform(m, m.T.copy())


def rotation_euler(theta) -> Transform:
    tx, ty, tz = np.asarray(theta, dtype=np.float32)
    return rotation_x(tx) @ (rotation_y(ty) @ rotation_z(tz))


def look_at(pos, target, up) -> Transform:
    """World-to-camera transform (transforms.rs:131-153): returns the
    *world_to_camera* pair; ``.inverted()`` gives camera_to_world."""
    pos = np.asarray(pos, dtype=np.float32)
    target = np.asarray(target, dtype=np.float32)
    up = np.asarray(up, dtype=np.float32)
    d = target - pos
    d = d / np.linalg.norm(d)
    upn = up / np.linalg.norm(up)
    right = np.cross(upn, d)
    right = right / np.linalg.norm(right)
    new_up = np.cross(d, right)
    camera_to_world = _mat(
        [
            [right[0], new_up[0], d[0], pos[0]],
            [right[1], new_up[1], d[1], pos[1]],
            [right[2], new_up[2], d[2], pos[2]],
            [0, 0, 0, 1],
        ]
    )
    return Transform(invert_full_pivot(camera_to_world), camera_to_world)


# --- device-side batched application ------------------------------------


def apply_p_jax(m: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Apply a [4,4] matrix to batched points [...,3] with projective divide."""
    out = jnp.einsum("ij,...j->...i", m[:3, :3], p) + m[:3, 3]
    w = jnp.einsum("j,...j->...", m[3, :3], p) + m[3, 3]
    return out / w[..., None]


def apply_v_jax(m: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    return jnp.einsum("ij,...j->...i", m[:3, :3], v)


def apply_n_jax(m_inv: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Normals by inverse-transpose: pass the *inverse* matrix."""
    return jnp.einsum("ji,...j->...i", m_inv[:3, :3], n)
