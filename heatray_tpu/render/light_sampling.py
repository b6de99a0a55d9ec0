"""Next-event-estimation light selection.

Branchless port of ``Resources/shaders/lightSampling.rlsl:11-161``: per
shading point, every light gets an importance

    saturate(N . L) * luminosity(color)      (punctual; spot adds cone terms)
    50 * exposureCompensation                 (environment — the reference's
                                               deliberate IBL weighting hack,
                                               ``lightSampling.rlsl:74-79``)

importances normalize into a CDF and the ray's light-select random walks it.
Instead of the RLSL early-return loops we build the (R, 16) importance matrix
and take the first eligible CDF entry; the environment is the fall-through
(``lightSampling.rlsl:158-160``).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from ..scene.lights import (
    LIGHT_TYPE_DIRECTIONAL,
    LIGHT_TYPE_ENVIRONMENT,
    LIGHT_TYPE_POINT,
    LIGHT_TYPE_SPOT,
    MAX_DIRECTIONAL_LIGHTS,
    MAX_POINT_LIGHTS,
    MAX_SPOT_LIGHTS,
    LightBank,
)
from .onb import greater_than_zero, luminosity, normalize, saturate

_ND = MAX_DIRECTIONAL_LIGHTS
_NP = MAX_POINT_LIGHTS
_NS = MAX_SPOT_LIGHTS
NUM_SLOTS = _ND + _NP + _NS  # punctual slots; env is the fall-through


def glsl_smoothstep(edge0, edge1, x):
    """GLSL smoothstep formula (used with edge0 > edge1 by the spot falloff,
    which GLSL leaves undefined but every driver computes this way)."""
    t = jnp.clip((x - edge0) / jnp.where(jnp.abs(edge1 - edge0) > 1e-12, edge1 - edge0, 1e-12), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


@struct.dataclass
class LightSample:
    """Per-ray light selection result (all (R,) / (R,3) arrays)."""

    light_type: jnp.ndarray  # i32: NONE/DIRECTIONAL/POINT/SPOT/ENVIRONMENT
    direction: jnp.ndarray  # (R,3) toward the light (punctual/directional)
    probability: jnp.ndarray  # normalized selection probability of the chosen light
    max_distance: jnp.ndarray  # (R,) maxT for the shadow ray (inf for dir/env)
    radiance: jnp.ndarray  # (R,3) light radiance along the shadow ray


def _spot_cone_weight(lights: LightBank, to_light):
    """Cone visibility/falloff terms of the spot importance
    (``lightSampling.rlsl:60-65``).  ``to_light``: (R, S, 3) unit surface->light."""
    ray_angle = jnp.sum(
        lights.spot_direction[None] * (-to_light), axis=-1
    )  # (R, S): cos between emission dir and light->surface
    inner = lights.spot_cos_angles[None, :, 0]
    outer = lights.spot_cos_angles[None, :, 1]
    vis = jnp.where(ray_angle > 0.0, 1.0, 0.0) * jnp.where(
        ray_angle < outer, 0.0, 1.0
    )
    falloff = 1.0 - glsl_smoothstep(inner, outer, ray_angle)
    return vis * falloff, ray_angle


def compute_light_sample(
    lights: LightBank, n: jnp.ndarray, p: jnp.ndarray, u: jnp.ndarray
) -> LightSample:
    """Select one light per ray.

    n: (R,3) shading normal; p: (R,3) shading point; u: (R,) selection random
    (``lightProbability``).  Returns a LightSample; ``radiance`` already
    includes distance attenuation and spot falloff so the caller only
    multiplies by the shadow-ray weight when unoccluded.
    """
    r = n.shape[0]
    inf = jnp.float32(3.0e38)

    # --- Importances -----------------------------------------------------
    active_d = (
        jnp.arange(_ND)[None, :] < lights.num_directional
    )  # (1, D) broadcastable
    w_dir = (
        saturate(jnp.einsum("rk,dk->rd", n, lights.dir_direction))
        * luminosity(lights.dir_color)[None, :]
    )
    w_dir = jnp.where(active_d, w_dir, 0.0)

    active_p = jnp.arange(_NP)[None, :] < lights.num_point
    to_point = lights.point_position[None, :, :] - p[:, None, :]  # (R, P, 3)
    point_dist = jnp.linalg.norm(to_point, axis=-1)
    point_dir = to_point / greater_than_zero(point_dist)[..., None]
    w_point = (
        saturate(jnp.sum(n[:, None, :] * point_dir, axis=-1))
        * luminosity(lights.point_color)[None, :]
    )
    w_point = jnp.where(active_p, w_point, 0.0)

    active_s = jnp.arange(_NS)[None, :] < lights.num_spot
    to_spot = lights.spot_position[None, :, :] - p[:, None, :]
    spot_dist = jnp.linalg.norm(to_spot, axis=-1)
    spot_dir = to_spot / greater_than_zero(spot_dist)[..., None]
    cone, ray_angle = _spot_cone_weight(lights, spot_dir)
    w_spot = (
        saturate(jnp.sum(n[:, None, :] * spot_dir, axis=-1))
        * luminosity(lights.spot_color)[None, :]
        * cone
    )
    w_spot = jnp.where(active_s, w_spot, 0.0)

    # Environment importance hack: ``50 * exposureCompensation``.
    w_env = jnp.where(
        lights.env_enabled > 0, 50.0 * lights.env_exposure_compensation, 0.0
    )
    w_env = jnp.broadcast_to(w_env, (r,))

    w_all = jnp.concatenate([w_dir, w_point, w_spot], axis=1)  # (R, S)
    total = jnp.sum(w_all, axis=1) + w_env
    norm = 1.0 / greater_than_zero(total)
    probs = w_all * norm[:, None]
    env_prob = w_env * norm

    # --- Selection: first slot with prob > 0 and u <= cdf ----------------
    cdf = jnp.cumsum(probs, axis=1)
    eligible = (u[:, None] <= cdf) & (probs > 0.0)
    any_punctual = jnp.any(eligible, axis=1)
    slot = jnp.argmax(eligible, axis=1)  # first True (0 if none)

    # --- Gather the chosen light's data ----------------------------------
    # Build per-slot candidate arrays (R, S, ...) then take_along_axis.
    dir_dirs = jnp.broadcast_to(lights.dir_direction[None], (r, _ND, 3))
    cand_dir = jnp.concatenate([dir_dirs, point_dir, spot_dir], axis=1)
    cand_dist = jnp.concatenate(
        [jnp.full((r, _ND), inf), point_dist, spot_dist], axis=1
    )
    cand_type = jnp.concatenate(
        [
            jnp.full((_ND,), LIGHT_TYPE_DIRECTIONAL, jnp.int32),
            jnp.full((_NP,), LIGHT_TYPE_POINT, jnp.int32),
            jnp.full((_NS,), LIGHT_TYPE_SPOT, jnp.int32),
        ]
    )[None, :]

    # Radiance along the shadow ray (the light-primitive shaders):
    #   directional: color                     (directionalLight.rlsl:24)
    #   point:       color / d^2               (pointLight.rlsl:22-26)
    #   spot:        color / d^2 * falloff     (spotLight.rlsl:22-33)
    rad_dir = jnp.broadcast_to(lights.dir_color[None], (r, _ND, 3))
    rad_point = lights.point_color[None] / greater_than_zero(
        point_dist**2
    )[..., None]
    spot_fall = 1.0 - glsl_smoothstep(
        lights.spot_cos_angles[None, :, 0],
        lights.spot_cos_angles[None, :, 1],
        ray_angle,
    )
    rad_spot = (
        lights.spot_color[None]
        / greater_than_zero(spot_dist**2)[..., None]
        * (jnp.where(ray_angle >= 0.0, 1.0, 0.0) * spot_fall)[..., None]
    )
    cand_rad = jnp.concatenate([rad_dir, rad_point, rad_spot], axis=1)

    idx = slot[:, None]
    sel_dir = jnp.take_along_axis(cand_dir, idx[..., None], axis=1)[:, 0]
    sel_dist = jnp.take_along_axis(cand_dist, idx, axis=1)[:, 0]
    sel_prob = jnp.take_along_axis(probs, idx, axis=1)[:, 0]
    sel_rad = jnp.take_along_axis(cand_rad, idx[..., None], axis=1)[:, 0]
    sel_type = jnp.take_along_axis(
        jnp.broadcast_to(cand_type, (r, NUM_SLOTS)), idx, axis=1
    )[:, 0]

    # Environment fall-through.
    light_type = jnp.where(any_punctual, sel_type, LIGHT_TYPE_ENVIRONMENT)
    probability = jnp.where(any_punctual, sel_prob, env_prob)
    direction = jnp.where(any_punctual[:, None], sel_dir, 0.0)
    max_distance = jnp.where(any_punctual, sel_dist, inf)
    radiance = jnp.where(any_punctual[:, None], sel_rad, 0.0)

    return LightSample(
        light_type=light_type,
        direction=direction,
        probability=probability,
        max_distance=max_distance,
        radiance=radiance,
    )
