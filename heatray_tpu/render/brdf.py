"""BRDF terms: GGX microfacet distribution, Fresnel, Smith masking, diffuse
models.

Ports the formulas of ``Resources/shaders/brdfs.rlsl`` to batched jnp (all
functions broadcast over leading ray dimensions; color args have a trailing
3-axis).
"""

from __future__ import annotations

import jax.numpy as jnp

from .onb import (
    ONE_OVER_PI,
    greater_than_zero,
    positive_characteristic,
    pow5,
    saturate,
    square,
)


def f_schlick(c_spec, cos_theta):
    """Schlick Fresnel with F90 = 1 (``brdfs.rlsl:46-57``).  Works for both
    scalar F0 and RGB F0 (broadcasts)."""
    return c_spec + (1.0 - c_spec) * pow5(1.0 - cos_theta)


def f_fresnel(eta, cos_theta_i):
    """Exact dielectric Fresnel (unpolarized average), ``brdfs.rlsl:59-71``.

    ``eta = n_incident / n_transmitted``; returns 1 beyond the critical angle
    (total internal reflection).
    """
    sin_theta_t2 = square(eta) * (1.0 - square(cos_theta_i))
    cos_theta_t = jnp.sqrt(jnp.maximum(1.0 - sin_theta_t2, 1e-12))
    perp = square(
        (eta * cos_theta_i - cos_theta_t)
        / greater_than_zero(eta * cos_theta_i + cos_theta_t)
    )
    para = square(
        (cos_theta_i - eta * cos_theta_t)
        / greater_than_zero(cos_theta_i + eta * cos_theta_t)
    )
    f = 0.5 * (perp + para)
    return jnp.where(sin_theta_t2 < 1.0, f, 1.0)


def d_ggx(n_dot_h, alpha):
    """GGX/Trowbridge-Reitz NDF (``brdfs.rlsl:73-78``)."""
    a2 = square(alpha)
    denom = square(square(n_dot_h) * (a2 - 1.0) + 1.0)
    return ONE_OVER_PI * a2 / greater_than_zero(denom)


def g1_smith_ggx(n_dot_i, alpha):
    """Smith G1 (height-correlated form's G1), ``brdfs.rlsl:88-93``."""
    a2 = square(alpha)
    denom = jnp.sqrt(a2 + (1.0 - a2) * greater_than_zero(square(n_dot_i))) + n_dot_i
    return (2.0 * n_dot_i) / greater_than_zero(denom)


def g2_smith_ggx(n_dot_o, n_dot_i, alpha):
    """Separable Smith G2 (``brdfs.rlsl:95-98``)."""
    return g1_smith_ggx(n_dot_o, alpha) * g1_smith_ggx(n_dot_i, alpha)


def g2_smith_ggx_full_sphere(n_dot_o, h_dot_o, n_dot_i, h_dot_i, alpha):
    """Full-sphere Smith G2 used by rough transmission
    (``brdfs.rlsl:100-106``)."""
    g1l = positive_characteristic(
        h_dot_o / greater_than_zero(n_dot_o)
    ) * g1_smith_ggx(jnp.abs(n_dot_o), alpha)
    g1v = positive_characteristic(
        h_dot_i / greater_than_zero(n_dot_i)
    ) * g1_smith_ggx(jnp.abs(n_dot_i), alpha)
    return g1l * g1v


def lambertian(c_diff):
    """``brdfs.rlsl:26-29``."""
    return c_diff * ONE_OVER_PI


def hammon_diffuse(l_dot_v, n_dot_h, n_dot_v, n_dot_l, c_diff, c_spec, alpha):
    """Hammon's GGX-consistent diffuse (``brdfs.rlsl:11-24``), including the
    reference's energy-conservation fix (the ``1 - Cspec`` factor).
    ``c_diff``/``c_spec`` are Vec3, the rest are (R,) scalars."""
    facing = 0.5 + 0.5 * l_dot_v
    rough = facing * (0.9 - 0.4 * facing) * ((0.5 + n_dot_h) / greater_than_zero(n_dot_h))
    smooth = 1.05 * (1.0 - pow5(1.0 - n_dot_l)) * (1.0 - pow5(1.0 - n_dot_v))
    single = ONE_OVER_PI * (smooth + (rough - smooth) * alpha)
    multi = 0.1159 * alpha
    return c_diff * ((1.0 - c_spec) * single + c_diff * multi)


def oren_nayar_diffuse(c_diff, roughness_sq, n, i, o):
    """Oren-Nayar without the 1/pi (cancelled against the cosine PDF),
    ``brdfs.rlsl:31-44``.  ``n``/``i``/``o`` are Vec3."""
    n_dot_i = saturate(n.dot(i))
    n_dot_o = saturate(n.dot(o))
    a = 1.0 - 0.5 * (roughness_sq / (roughness_sq + 0.33))
    b = (0.45 * roughness_sq) / (roughness_sq + 0.09)

    def _proj(v, ndv):
        p = v - n * ndv
        return p * (1.0 / greater_than_zero(p.norm()))

    cos_phi = _proj(i, n_dot_i).dot(_proj(o, n_dot_o))
    sin_ni = jnp.sqrt(jnp.maximum(1.0 - square(n_dot_i), 1e-12))
    sin_no = jnp.sqrt(jnp.maximum(1.0 - square(n_dot_o), 1e-12))
    s = jnp.where(n_dot_i < n_dot_o, sin_ni, sin_no)
    t = jnp.where(
        n_dot_i > n_dot_o,
        sin_ni / greater_than_zero(n_dot_i),
        sin_no / greater_than_zero(n_dot_o),
    )
    return c_diff * (a + b * cos_phi * s * t)
