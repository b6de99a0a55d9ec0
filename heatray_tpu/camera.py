"""Cameras: orbit parameterization and the thin-lens camera pytree.

Mirrors the reference's ``OrbitCamera.h:32-45`` (quaternion orbit -> view
matrix) and ``PassGenerator.cpp:341-343`` (fovY from a 35mm-film focal
length).  The view matrix here is camera-to-world: primary rays are generated
in camera space and transformed by it (``perspective.rlsl:84-86``).
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp
import numpy as np
from flax import struct

# 35mm film dimensions, ``PassGenerator.cpp:341``.
SENSOR_WIDTH_MM = 36.0
SENSOR_HEIGHT_MM = 24.0


def fov_y_from_focal_length(focal_length_mm: float) -> float:
    """``fovY = 2 atan2(24, 2 f)`` (``PassGenerator.cpp:342-343``)."""
    return 2.0 * math.atan2(SENSOR_HEIGHT_MM, 2.0 * focal_length_mm)


def _quat_mul(a, b):
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return np.array(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ]
    )


def _quat_angle_axis(angle, axis):
    s = math.sin(angle * 0.5)
    return np.array(
        [math.cos(angle * 0.5), axis[0] * s, axis[1] * s, axis[2] * s]
    )


def _quat_to_mat3(q):
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


@dataclasses.dataclass
class OrbitCamera:
    """Orbital camera controller (host-side), ``OrbitCamera.h``."""

    distance: float = 19.0
    phi: float = 0.0  # [0, 2pi], about +Y
    theta: float = 0.0  # [-pi/2, pi/2], about +X
    target: tuple = (0.0, 0.0, 0.0)
    max_distance: float = 100.0

    def view_matrix(self) -> np.ndarray:
        """Camera-to-world matrix, bit-matching ``OrbitCamera.h:32-45``:
        ``mat4(inverse(rotTheta * rotPhi)) * translate(target + (0,0,d))``."""
        rot_theta = _quat_angle_axis(self.theta, (1.0, 0.0, 0.0))
        rot_phi = _quat_angle_axis(self.phi, (0.0, 1.0, 0.0))
        orientation = _quat_mul(rot_theta, rot_phi)
        inv = orientation * np.array([1.0, -1.0, -1.0, -1.0])  # unit quat inverse
        rot = _quat_to_mat3(inv)
        trans = np.eye(4, dtype=np.float64)
        trans[:3, 3] = np.asarray(self.target) + np.array([0.0, 0.0, self.distance])
        m = np.eye(4, dtype=np.float64)
        m[:3, :3] = rot
        out = m @ trans
        return out.astype(np.float32)


@struct.dataclass
class CameraParams:
    """Traced camera parameters consumed by the ray generator (a pytree);
    differentiable for camera optimization."""

    view_matrix: jnp.ndarray  # (4, 4) camera-to-world
    fov_tan: jnp.ndarray  # () tan(fovY / 2)
    aspect: jnp.ndarray  # () width / height
    focus_distance: jnp.ndarray  # ()
    aperture_radius: jnp.ndarray  # ()


def make_camera(
    view_matrix: np.ndarray,
    width: int,
    height: int,
    focal_length_mm: float = 50.0,
    focus_distance: float = 1.0,
    aperture_radius: float = 0.0,
) -> CameraParams:
    fov_y = fov_y_from_focal_length(focal_length_mm)
    return CameraParams(
        view_matrix=jnp.asarray(view_matrix, jnp.float32),
        fov_tan=jnp.float32(math.tan(fov_y * 0.5)),
        aspect=jnp.float32(width / height),
        focus_distance=jnp.float32(focus_distance),
        aperture_radius=jnp.float32(aperture_radius),
    )


def orbit_view_matrix_jnp(distance, phi, theta, target=(0.0, 0.0, 0.0)):
    """Differentiable (jnp) twin of ``OrbitCamera.view_matrix`` for camera
    optimization: traced orbit scalars -> (4, 4) camera-to-world matrix.

    Same composition as ``OrbitCamera.h:32-45``; gradients flow to
    distance/phi/theta (and target)."""
    distance = jnp.asarray(distance, jnp.float32)
    phi = jnp.asarray(phi, jnp.float32)
    theta = jnp.asarray(theta, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    ct, st = jnp.cos(theta * 0.5), jnp.sin(theta * 0.5)
    cp, sp = jnp.cos(phi * 0.5), jnp.sin(phi * 0.5)
    # q = rotTheta(x) * rotPhi(y); inverse = conjugate (unit quats).
    w = ct * cp
    x = st * cp
    y = ct * sp
    z = st * sp
    x, y, z = -x, -y, -z  # conjugate
    rot = jnp.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )
    trans = target + jnp.array([0.0, 0.0, 1.0]) * distance
    m = jnp.eye(4, dtype=jnp.float32)
    m = m.at[:3, :3].set(rot)
    # rot @ translate: translation column = rot @ trans.
    return m.at[:3, 3].set(rot @ trans)


def orbit_camera(
    width: int,
    height: int,
    distance: float = 5.0,
    phi: float = 0.0,
    theta: float = 0.0,
    target=(0.0, 0.0, 0.0),
    focal_length_mm: float = 50.0,
    focus_distance: float | None = None,
    aperture_radius: float = 0.0,
) -> CameraParams:
    """Convenience: orbit parameters -> CameraParams (auto-focus at the orbit
    target like ``HeatrayRenderer.cpp:126``)."""
    orbit = OrbitCamera(distance=distance, phi=phi, theta=theta, target=tuple(target))
    return make_camera(
        orbit.view_matrix(),
        width,
        height,
        focal_length_mm=focal_length_mm,
        focus_distance=distance if focus_distance is None else focus_distance,
        aperture_radius=aperture_radius,
    )
