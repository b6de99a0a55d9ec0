"""Environment light evaluation: lat/long lookup with rotation + exposure.

Ports ``Resources/shaders/environmentLight.rlsl:19-33`` exactly, including
its u/v conventions and theta wrap.  A 1x1 map reproduces the solid-color
environment (``EnvironmentLight.cpp:48-72``).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..scene.lights import LightBank
from .onb import ONE_OVER_PI, TWO_PI
from .texture import sample_bilinear


def env_radiance(lights: LightBank, directions: jnp.ndarray) -> jnp.ndarray:
    """Radiance of the environment in the given (unit) world directions.

    Returns (..., 3); zero if the environment light is disabled.
    """
    d = directions
    theta = jnp.arctan2(d[..., 0], -d[..., 2]) + lights.env_rotation
    theta = jnp.where(theta > TWO_PI, theta - TWO_PI, theta)
    phi = jnp.arctan2(
        d[..., 1], jnp.sqrt(d[..., 0] * d[..., 0] + d[..., 2] * d[..., 2])
    )
    u = theta / TWO_PI + 0.5
    v = -phi * ONE_OVER_PI + 0.5
    # The shader samples texture2D(tex, vec2(u, 1-v)); OpenRL's texture row 0
    # is the bottom of the image, so with standard top-row-first image arrays
    # the flip cancels: sample row v directly.
    color = sample_bilinear(lights.env_map, u, v, wrap_u=True, wrap_v=False)
    color = color * lights.env_exposure_compensation
    return jnp.where(lights.env_enabled > 0, color, jnp.zeros_like(color))
