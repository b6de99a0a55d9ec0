"""Vector math utilities: orthonormal frames, color helpers.

Ports the semantics of ``Resources/shaders/utility.rlsl`` to planar batched
jnp: directions/colors are ``Vec3`` (three (R,) component arrays — see
``heatray_tpu.vec`` for why), scalars are plain (R,) arrays.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..vec import Vec3

PI = 3.14159265359
TWO_PI = 2.0 * PI
ONE_OVER_PI = 1.0 / PI
ONE_OVER_TWO_PI = 1.0 / TWO_PI


def normalize(v: Vec3, eps=1e-20) -> Vec3:
    return v.normalized(eps)


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


def luminosity(color: Vec3):
    """``dot(c, (0.33, 0.59, 0.11))`` — the reference's luminance weights
    (``utility.rlsl:163-166``)."""
    return color.x * 0.33 + color.y * 0.59 + color.z * 0.11


def orthonormal_frame(n: Vec3):
    """Pixar-revised Frisvad orthonormal basis, Y-up right-handed
    (``utility.rlsl:42-60``).

    Returns (X, Z) tangent/bitangent; the frame maps local (x, y, z) to
    world ``x*X + y*N + z*Z`` (local Y is the normal).
    """
    # The reference permutes to left-handed Z-up, runs Frisvad, permutes back.
    nx, ny, nz = n.x, n.z, n.y  # leftHandedN = (x, z, y)
    s = get_sign(nz)
    a = -1.0 / (s + nz)
    b = nx * ny * a
    # Left-handed results, then swap y/z back to right-handed Y-up.
    x = Vec3(1.0 + s * nx * nx * a, -s * nx, s * b)
    z = Vec3(b, -ny, s + ny * ny * a)
    return x, z


def frame_to_world(lx, ly, lz, x: Vec3, n: Vec3, z: Vec3) -> Vec3:
    """Local (Y-up) direction components -> world direction."""
    return x * lx + n * ly + z * lz


def world_to_frame(w: Vec3, x: Vec3, n: Vec3, z: Vec3):
    """World direction -> local frame components (transpose of the frame)."""
    return w.dot(x), w.dot(n), w.dot(z)


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
