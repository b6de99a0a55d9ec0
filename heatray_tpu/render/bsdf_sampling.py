"""BSDF importance sampling: cosine-weighted hemisphere, GGX NDF, and Heitz
visible-NDF GGX sampling.

Ports ``Resources/shaders/utility.rlsl:62-139`` to planar batched jnp.  All
sampling is in the local shading frame (Y up = normal), matching the
reference's convention; local directions are returned as component tuples
(lx, ly, lz) of (R,) arrays, world directions as Vec3.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..vec import Vec3
from .onb import TWO_PI, square


def cosine_weighted_sample(u1, u2):
    """Cosine-weighted hemisphere direction (Y-up local), PDF cos(theta)/pi
    (``utility.rlsl:62-75``).  Returns (lx, ly, lz)."""
    r = jnp.sqrt(u1)
    phi = TWO_PI * u2
    x = r * jnp.cos(phi)
    y = jnp.sqrt(jnp.maximum(1.0 - u1, 1e-12))
    z = r * jnp.sin(phi)
    inv = 1.0 / jnp.sqrt(x * x + y * y + z * z + 1e-12)
    return x * inv, y * inv, z * inv


def sample_ggx(u1, u2, alpha):
    """GGX NDF half-vector sample (Y-up local), PDF (D*NdotH)/(4*VdotH)
    (``utility.rlsl:77-92``).  Returns (lx, ly, lz)."""
    a2 = square(alpha)
    cos_theta = jnp.sqrt(jnp.maximum((1.0 - u1) / ((a2 - 1.0) * u1 + 1.0), 1e-12))
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - square(cos_theta), 1e-12))
    phi = TWO_PI * u2
    x = sin_theta * jnp.cos(phi)
    y = cos_theta
    z = sin_theta * jnp.sin(phi)
    inv = 1.0 / jnp.sqrt(x * x + y * y + z * z + 1e-12)
    return x * inv, y * inv, z * inv


def sample_visible_ggx(local_v, u1, u2, alpha):
    """Heitz 2018 visible-NDF GGX half-vector sample (Y-up local),
    PDF (G1*D*NdotV)/NdotH (``utility.rlsl:104-139``).

    ``local_v`` is the view direction as an (lx, ly, lz) tuple in the Y-up
    local frame; returns the half vector as (hx, hy, hz).
    """
    # Y-up -> Z-up (the reference works in Z-up here).
    vx, vy, vz = local_v[0], local_v[2], local_v[1]

    # Stretch so we sample as though alpha == 1.
    sx, sy, sz = vx * alpha, vy * alpha, vz
    inv = 1.0 / jnp.sqrt(sx * sx + sy * sy + sz * sz + 1e-12)
    vhx, vhy, vhz = sx * inv, sy * inv, sz * inv

    # Orthonormal basis about Vh.
    len_sq = square(vhx) + square(vhy)
    inv_len = 1.0 / jnp.sqrt(len_sq + 1e-12)
    has = len_sq > 0.0
    t1x = jnp.where(has, -vhy * inv_len, 1.0)
    t1y = jnp.where(has, vhx * inv_len, 0.0)
    t1z = jnp.zeros_like(t1x)
    # t2 = cross(vh, t1)
    t2x = vhy * t1z - vhz * t1y
    t2y = vhz * t1x - vhx * t1z
    t2z = vhx * t1y - vhy * t1x

    # Parameterize the projected area.
    r = jnp.sqrt(u1)
    phi = TWO_PI * u2
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + vhz)
    p1_sq = square(p1)
    p2 = (1.0 - s) * jnp.sqrt(jnp.maximum(1.0 - p1_sq, 1e-12)) + s * p2
    pz = jnp.sqrt(jnp.maximum(1.0 - p1_sq - square(p2), 1e-12))

    nhx = p1 * t1x + p2 * t2x + pz * vhx
    nhy = p1 * t1y + p2 * t2y + pz * vhy
    nhz = p1 * t1z + p2 * t2z + pz * vhz

    # Unstretch.
    hx, hy, hz = alpha * nhx, alpha * nhy, jnp.maximum(0.0, nhz)
    inv = 1.0 / jnp.sqrt(hx * hx + hy * hy + hz * hz + 1e-12)
    # Z-up -> Y-up.
    return hx * inv, hz * inv, hy * inv


def reflect(incident: Vec3, n: Vec3) -> Vec3:
    """GLSL-style reflect: ``i - 2*dot(n,i)*n`` (incident points *toward* the
    surface)."""
    return incident - n * (2.0 * n.dot(incident))


def refract(incident: Vec3, n: Vec3, eta):
    """GLSL-style refract (incident toward surface, n away from it).

    Returns a zero vector on total internal reflection, like GLSL.  The
    sqrt argument is floored at a tiny positive value so the masked TIR
    lanes keep a finite gradient (0-cotangent x inf = NaN otherwise).
    """
    cos_i = n.dot(incident)
    k = 1.0 - square(eta) * (1.0 - square(cos_i))
    out = incident * eta - n * (eta * cos_i + jnp.sqrt(jnp.maximum(k, 1e-12)))
    return Vec3.where(k >= 0.0, out, Vec3.zeros(cos_i.shape))
