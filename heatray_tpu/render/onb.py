"""Vector math utilities: orthonormal frames, color helpers.

Ports the semantics of ``Resources/shaders/utility.rlsl`` to batched jnp.
All functions operate on arrays whose last axis is the vector axis and
broadcast over leading (ray) dimensions.
"""

from __future__ import annotations

import jax.numpy as jnp

PI = 3.14159265359
TWO_PI = 2.0 * PI
ONE_OVER_PI = 1.0 / PI
ONE_OVER_TWO_PI = 1.0 / TWO_PI


def dot(a, b, keepdims=True):
    return jnp.sum(a * b, axis=-1, keepdims=keepdims)


def normalize(v, eps=1e-20):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)


def saturate(x):
    return jnp.clip(x, 0.0, 1.0)


def square(x):
    return x * x


def pow5(x):
    x2 = x * x
    return x * x2 * x2


def greater_than_zero(x):
    """``max(1e-5, x)`` (``utility.rlsl:153-156``)."""
    return jnp.maximum(1e-5, x)


def get_sign(x):
    """Sign that never returns 0 (``utility.rlsl:37-40``)."""
    return jnp.where(x < 0.0, -1.0, 1.0)


def positive_characteristic(x):
    return jnp.where(x > 0.0, 1.0, 0.0)


def luminosity(color):
    """``dot(c, (0.33, 0.59, 0.11))`` — the reference's luminance weights
    (``utility.rlsl:163-166``)."""
    w = jnp.array([0.33, 0.59, 0.11], dtype=color.dtype)
    return jnp.sum(color * w, axis=-1)


def orthonormal_frame(n):
    """Pixar-revised Frisvad orthonormal basis, Y-up right-handed
    (``utility.rlsl:42-60``).

    Returns (X, Z) tangent/bitangent; the frame maps local (x, y, z) to
    world ``x*X + y*N + z*Z`` (local Y is the normal).
    """
    # The reference permutes to left-handed Z-up, runs Frisvad, permutes back.
    nx, ny, nz = n[..., 0], n[..., 2], n[..., 1]  # leftHandedN = (x, z, y)
    s = get_sign(nz)
    a = -1.0 / (s + nz)
    b = nx * ny * a
    x_lh = jnp.stack([1.0 + s * nx * nx * a, s * b, -s * nx], axis=-1)
    z_lh = jnp.stack([b, s + ny * ny * a, -ny], axis=-1)
    # Convert back to right-handed Y-up (swap y/z components).
    x = jnp.stack([x_lh[..., 0], x_lh[..., 2], x_lh[..., 1]], axis=-1)
    z = jnp.stack([z_lh[..., 0], z_lh[..., 2], z_lh[..., 1]], axis=-1)
    return x, z


def frame_to_world(local, x, n, z):
    """Local (Y-up) direction -> world, given the frame columns (X, N, Z)."""
    return (
        local[..., 0:1] * x + local[..., 1:2] * n + local[..., 2:3] * z
    )


def world_to_frame(world, x, n, z):
    """World direction -> local frame coordinates (transpose of the frame)."""
    return jnp.stack(
        [
            jnp.sum(world * x, axis=-1),
            jnp.sum(world * n, axis=-1),
            jnp.sum(world * z, axis=-1),
        ],
        axis=-1,
    )


def linear_to_srgb(linear):
    """``utility.rlsl:168-180`` / ``displayGL.frag:48-59``."""
    a = 0.055
    return jnp.where(
        linear <= 0.0031308,
        12.92 * linear,
        1.055 * jnp.power(jnp.maximum(linear, 1e-10), 1.0 / 2.4) - a,
    )


def srgb_to_linear(srgb):
    """``utility.rlsl:182-194`` / ``displayGL.frag:61-72``."""
    a = 0.055
    return jnp.where(
        srgb <= 0.04045,
        srgb / 12.92,
        jnp.power(jnp.maximum((srgb + a) / (1.0 + a), 1e-10), 2.4),
    )


def normalize_safe(v, fallback=None, eps=1e-20):
    """Normalize with a fallback direction for near-zero vectors."""
    norm = jnp.linalg.norm(v, axis=-1, keepdims=True)
    unit = v / jnp.maximum(norm, eps)
    if fallback is None:
        return unit
    return jnp.where(norm > eps, unit, fallback)
