"""Pinhole camera (yuki/src/camera.rs).

Matrices are built on the host exactly like the reference — perspective
camera_to_screen with the mitsuba-style directional FoV screen window
(camera.rs:50-102) — then baked as [4,4] constants into the jitted ray
generator; Camera::ray (camera.rs:105-115) becomes a batched transform over
the whole wavefront's film points.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Tuple

import numpy as np
import jax.numpy as jnp

from . import transforms as tf
from .transforms import apply_p_jax, apply_v_jax
from .vecmath import normalize


@dataclass(frozen=True)
class FoV:
    axis: str  # "x" or "y"
    degrees: float

    @staticmethod
    def x(deg: float) -> "FoV":
        return FoV("x", deg)

    @staticmethod
    def y(deg: float) -> "FoV":
        return FoV("y", deg)


@dataclass
class CameraParameters:
    """CameraParameters (camera.rs:24-41)."""

    position: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    target: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    up: Tuple[float, float, float] = (0.0, 1.0, 0.0)
    fov: FoV = field(default_factory=lambda: FoV.x(0.0))


@dataclass(frozen=True)
class Camera:
    camera_to_world: np.ndarray  # [4,4]
    raster_to_camera: np.ndarray  # [4,4]

    @staticmethod
    def create(params: CameraParameters, res_x: int, res_y: int) -> "Camera":
        camera_to_world = tf.look_at(
            params.position, params.target, params.up
        ).inverted()
        near, far = 1e-2, 1000.0
        inv_tan = 1.0 / np.tan(np.radians(params.fov.degrees) / 2.0)
        persp = tf.Transform.from_matrix(
            [
                [1, 0, 0, 0],
                [0, 1, 0, 0],
                [0, 0, far / (far - near), -(far * near) / (far - near)],
                [0, 0, 1, 0],
            ]
        )
        camera_to_screen = tf.scale(inv_tan, inv_tan, 1.0) @ persp
        fx, fy = float(res_x), float(res_y)
        if params.fov.axis == "x":
            ar = fx / fy
            screen_min = np.array([-1.0, -1.0 / ar], np.float32)
            screen_max = np.array([1.0, 1.0 / ar], np.float32)
        else:
            ar = fy / fx
            screen_min = np.array([-1.0 / ar, -1.0], np.float32)
            screen_max = np.array([1.0 / ar, 1.0], np.float32)
        screen_to_raster = tf.scale(fx, fy, 1.0) @ (
            tf.scale(
                1.0 / (screen_max[0] - screen_min[0]),
                1.0 / (screen_min[1] - screen_max[1]),
                1.0,
            )
            @ tf.translation((-screen_min[0], -screen_max[1], 0.0))
        )
        raster_to_screen = screen_to_raster.inverted()
        raster_to_camera = camera_to_screen.inverted() @ raster_to_screen
        return Camera(
            camera_to_world=camera_to_world.m,
            raster_to_camera=raster_to_camera.m,
        )

    def ray(self, p_film: jnp.ndarray):
        """p_film [N,2] raster-space points -> (o [N,3], d [N,3]) world rays."""
        c2w = jnp.asarray(self.camera_to_world)
        r2c = jnp.asarray(self.raster_to_camera)
        p3 = jnp.concatenate(
            [p_film, jnp.zeros(p_film.shape[:-1] + (1,), p_film.dtype)], axis=-1
        )
        p_cam = apply_p_jax(r2c, p3)
        d_world = normalize(apply_v_jax(c2w, normalize(p_cam)))
        o_world = jnp.broadcast_to(c2w[:3, 3], d_world.shape)
        return o_world, d_world
