"""Environment light evaluation: lat/long lookup with rotation + exposure.

Ports ``Resources/shaders/environmentLight.rlsl:19-33`` exactly, including
its u/v conventions and theta wrap.  A 1x1 map reproduces the solid-color
environment (``EnvironmentLight.cpp:48-72``).  The map is stored planar
(3, H, W) — see ``heatray_tpu.vec``.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..scene.lights import LightBank
from ..vec import Vec3
from .onb import ONE_OVER_PI, TWO_PI
from .texture import sample_bilinear_planar


def env_radiance(lights: LightBank, directions: Vec3) -> Vec3:
    """Radiance of the environment in the given (unit) world directions.

    Returns a Vec3; zero if the environment light is disabled.
    """
    d = directions
    on = lights.env_enabled > 0
    comp = lights.env_exposure_compensation
    if lights.env_map.shape[1] == 1 and lights.env_map.shape[2] == 1:
        # Solid-color / disabled environment: no gathers (static shape path).
        zeros = jnp.zeros_like(d.x)
        return Vec3(
            zeros + jnp.where(on, lights.env_map[0, 0, 0] * comp, 0.0),
            zeros + jnp.where(on, lights.env_map[1, 0, 0] * comp, 0.0),
            zeros + jnp.where(on, lights.env_map[2, 0, 0] * comp, 0.0),
        )

    theta = jnp.arctan2(d.x, -d.z) + lights.env_rotation
    theta = jnp.where(theta > TWO_PI, theta - TWO_PI, theta)
    phi = jnp.arctan2(d.y, jnp.sqrt(d.x * d.x + d.z * d.z))
    u = theta / TWO_PI + 0.5
    v = -phi * ONE_OVER_PI + 0.5
    # The shader samples texture2D(tex, vec2(u, 1-v)); OpenRL's texture row 0
    # is the bottom of the image, so with standard top-row-first image arrays
    # the flip cancels: sample row v directly.
    r, g, b = sample_bilinear_planar(
        lights.env_map, u, v, wrap_u=True, wrap_v=False
    )
    comp = lights.env_exposure_compensation
    on = lights.env_enabled > 0
    color = Vec3(r, g, b) * comp
    return Vec3.where(on, color, Vec3.zeros(jnp.shape(u)))
