"""BSDF importance sampling: cosine-weighted hemisphere, GGX NDF, and Heitz
visible-NDF GGX sampling.

Ports ``Resources/shaders/utility.rlsl:62-139`` to batched jnp.  All sampling
is in the local shading frame (Y up = normal), matching the reference's
convention.
"""

from __future__ import annotations

import jax.numpy as jnp

from .onb import TWO_PI, normalize, square


def cosine_weighted_sample(u1, u2):
    """Cosine-weighted hemisphere direction (Y-up local), PDF cos(theta)/pi
    (``utility.rlsl:62-75``)."""
    r = jnp.sqrt(u1)
    phi = TWO_PI * u2
    x = r * jnp.cos(phi)
    y = jnp.sqrt(jnp.maximum(0.0, 1.0 - u1))
    z = r * jnp.sin(phi)
    return normalize(jnp.stack([x, y, z], axis=-1))


def sample_ggx(u1, u2, alpha):
    """GGX NDF half-vector sample (Y-up local), PDF (D*NdotH)/(4*VdotH)
    (``utility.rlsl:77-92``)."""
    a2 = square(alpha)
    cos_theta = jnp.sqrt(
        jnp.maximum(0.0, (1.0 - u1) / ((a2 - 1.0) * u1 + 1.0))
    )
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - square(cos_theta)))
    phi = TWO_PI * u2
    x = sin_theta * jnp.cos(phi)
    y = cos_theta
    z = sin_theta * jnp.sin(phi)
    return normalize(jnp.stack([x, y, z], axis=-1))


def sample_visible_ggx(local_v, u1, u2, alpha):
    """Heitz 2018 visible-NDF GGX half-vector sample (Y-up local),
    PDF (G1*D*NdotV)/NdotH (``utility.rlsl:104-139``).

    ``local_v`` is the view direction in the Y-up local frame; ``alpha``
    broadcasts over the ray batch.
    """
    # Y-up -> Z-up (the reference works in Z-up here).
    v = jnp.stack([local_v[..., 0], local_v[..., 2], local_v[..., 1]], axis=-1)
    alpha = jnp.broadcast_to(jnp.asarray(alpha), v.shape[:-1])

    # Stretch so we sample as though alpha == 1.
    vh = normalize(
        jnp.stack(
            [v[..., 0] * alpha, v[..., 1] * alpha, v[..., 2]], axis=-1
        )
    )

    # Orthonormal basis about Vh.
    len_sq = square(vh[..., 0]) + square(vh[..., 1])
    inv_len = 1.0 / jnp.sqrt(jnp.maximum(len_sq, 1e-20))
    t1 = jnp.where(
        (len_sq > 0.0)[..., None],
        jnp.stack([-vh[..., 1] * inv_len, vh[..., 0] * inv_len, jnp.zeros_like(inv_len)], axis=-1),
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), vh.shape),
    )
    t2 = jnp.cross(vh, t1)

    # Parameterize the projected area.
    r = jnp.sqrt(u1)
    phi = TWO_PI * u2
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + vh[..., 2])
    p1_sq = square(p1)
    p2 = (1.0 - s) * jnp.sqrt(jnp.maximum(1.0 - p1_sq, 0.0)) + s * p2

    nh = (
        p1[..., None] * t1
        + p2[..., None] * t2
        + jnp.sqrt(jnp.maximum(0.0, 1.0 - p1_sq - square(p2)))[..., None] * vh
    )

    # Unstretch.
    h = normalize(
        jnp.stack(
            [alpha * nh[..., 0], alpha * nh[..., 1], jnp.maximum(0.0, nh[..., 2])],
            axis=-1,
        )
    )
    # Z-up -> Y-up.
    return jnp.stack([h[..., 0], h[..., 2], h[..., 1]], axis=-1)


def reflect(incident, n):
    """GLSL-style reflect: ``i - 2*dot(n,i)*n`` (incident points *toward* the
    surface)."""
    return incident - 2.0 * jnp.sum(n * incident, axis=-1, keepdims=True) * n


def refract(incident, n, eta):
    """GLSL-style refract (incident toward surface, n away from it).

    Returns a zero vector on total internal reflection, like GLSL.
    """
    eta = jnp.asarray(eta)
    if eta.ndim < incident.ndim:
        eta = eta[..., None]
    cos_i = jnp.sum(n * incident, axis=-1, keepdims=True)
    k = 1.0 - square(eta) * (1.0 - square(cos_i))
    out = eta * incident - (eta * cos_i + jnp.sqrt(jnp.maximum(k, 0.0))) * n
    return jnp.where(k >= 0.0, out, jnp.zeros_like(out))
