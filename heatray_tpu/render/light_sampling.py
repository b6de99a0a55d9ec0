"""Next-event-estimation light selection.

Branchless port of ``Resources/shaders/lightSampling.rlsl:11-161``: per
shading point, every light gets an importance

    saturate(N . L) * luminosity(color)      (punctual; spot adds cone terms)
    50 * exposureCompensation                 (environment — the reference's
                                               deliberate IBL weighting hack,
                                               ``lightSampling.rlsl:74-79``)

importances normalize into a CDF and the ray's light-select random walks it.
Instead of the RLSL early-return loops we build a **slot-major** (S, R)
importance matrix (slots on sublanes, rays on lanes — the TPU-friendly
layout; an (R, S) matrix would pad S to 128 lanes) and take the first
eligible CDF entry; the environment is the fall-through
(``lightSampling.rlsl:158-160``).
"""

from __future__ import annotations

import jax
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
from ..vec import Vec3
from .onb import greater_than_zero, saturate

_ND = MAX_DIRECTIONAL_LIGHTS
_NP = MAX_POINT_LIGHTS
_NS = MAX_SPOT_LIGHTS
NUM_SLOTS = _ND + _NP + _NS  # punctual slots; env is the fall-through


def glsl_smoothstep(edge0, edge1, x):
    """GLSL smoothstep formula (used with edge0 > edge1 by the spot falloff,
    which GLSL leaves undefined but every driver computes this way)."""
    t = jnp.clip(
        (x - edge0)
        / jnp.where(jnp.abs(edge1 - edge0) > 1e-12, edge1 - edge0, 1e-12),
        0.0,
        1.0,
    )
    return t * t * (3.0 - 2.0 * t)


@struct.dataclass
class LightSample:
    """Per-ray light selection result ((R,) arrays / Vec3s)."""

    light_type: jnp.ndarray  # i32: NONE/DIRECTIONAL/POINT/SPOT/ENVIRONMENT
    direction: Vec3  # toward the light (punctual/directional)
    probability: jnp.ndarray  # normalized selection probability of the chosen light
    max_distance: jnp.ndarray  # (R,) maxT for the shadow ray (inf for dir/env)
    radiance: Vec3  # light radiance along the shadow ray


def _lum_rows(colors):
    """(S, 3) light colors -> (S,) luminosity column."""
    return colors[:, 0] * 0.33 + colors[:, 1] * 0.59 + colors[:, 2] * 0.11


def compute_light_sample(
    lights: LightBank, n: Vec3, p: Vec3, u: jnp.ndarray
) -> LightSample:
    """Select one light per ray.

    n: shading normal (Vec3 of (R,)); p: shading point; u: (R,) selection
    random (``lightProbability``).  Returns a LightSample; ``radiance``
    already includes distance attenuation and spot falloff so the caller only
    multiplies by the shadow-ray weight when unoccluded.

    All slot matrices are (S, *ray_shape): slots on the leading axis, the
    ray dimensions trailing (shape-agnostic so 2D wavefronts work).
    """
    shape = n.x.shape
    nd = len(shape)
    inf = jnp.float32(3.0e38)

    def _bc(col):
        """(S,) light column -> (S, 1, ..., 1) broadcast shape."""
        return col.reshape(col.shape[0], *([1] * nd))

    nx, ny, nz = n.x[None], n.y[None], n.z[None]  # (1, *shape)
    px, py, pz = p.x[None], p.y[None], p.z[None]

    # --- Directional slots (D, *shape) ------------------------------------
    dd = lights.dir_direction  # (D, 3) toward light
    active_d = _bc(jnp.arange(_ND) < lights.num_directional)
    ndl_d = _bc(dd[:, 0]) * nx + _bc(dd[:, 1]) * ny + _bc(dd[:, 2]) * nz
    w_dir = saturate(ndl_d) * _bc(_lum_rows(lights.dir_color))
    w_dir = jnp.where(active_d, w_dir, 0.0)

    # --- Point slots (P, *shape) -------------------------------------------
    pp = lights.point_position  # (P, 3)
    active_p = _bc(jnp.arange(_NP) < lights.num_point)
    tpx = _bc(pp[:, 0]) - px
    tpy = _bc(pp[:, 1]) - py
    tpz = _bc(pp[:, 2]) - pz
    point_dist = jnp.sqrt(tpx * tpx + tpy * tpy + tpz * tpz)
    inv_pd = 1.0 / greater_than_zero(point_dist)
    pdx, pdy, pdz = tpx * inv_pd, tpy * inv_pd, tpz * inv_pd
    ndl_p = pdx * nx + pdy * ny + pdz * nz
    w_point = saturate(ndl_p) * _bc(_lum_rows(lights.point_color))
    w_point = jnp.where(active_p, w_point, 0.0)

    # --- Spot slots (S, *shape) ----------------------------------------------
    sp = lights.spot_position
    sd = lights.spot_direction  # emission direction
    active_s = _bc(jnp.arange(_NS) < lights.num_spot)
    tsx = _bc(sp[:, 0]) - px
    tsy = _bc(sp[:, 1]) - py
    tsz = _bc(sp[:, 2]) - pz
    spot_dist = jnp.sqrt(tsx * tsx + tsy * tsy + tsz * tsz)
    inv_sd = 1.0 / greater_than_zero(spot_dist)
    sdx, sdy, sdz = tsx * inv_sd, tsy * inv_sd, tsz * inv_sd
    # Cone terms (``lightSampling.rlsl:60-65``): angle between the emission
    # direction and light->surface (= -to_light).
    ray_angle = -(_bc(sd[:, 0]) * sdx + _bc(sd[:, 1]) * sdy + _bc(sd[:, 2]) * sdz)
    inner = _bc(lights.spot_cos_angles[:, 0])
    outer = _bc(lights.spot_cos_angles[:, 1])
    vis = jnp.where(ray_angle > 0.0, 1.0, 0.0) * jnp.where(
        ray_angle < outer, 0.0, 1.0
    )
    spot_fall = 1.0 - glsl_smoothstep(inner, outer, ray_angle)
    cone = vis * spot_fall
    ndl_s = sdx * nx + sdy * ny + sdz * nz
    w_spot = saturate(ndl_s) * _bc(_lum_rows(lights.spot_color)) * cone
    w_spot = jnp.where(active_s, w_spot, 0.0)

    # Environment importance hack: ``50 * exposureCompensation``.
    w_env = jnp.where(
        lights.env_enabled > 0, 50.0 * lights.env_exposure_compensation, 0.0
    )
    w_env = jnp.broadcast_to(w_env, shape)

    w_all = jnp.concatenate([w_dir, w_point, w_spot], axis=0)  # (S, *shape)
    total = jnp.sum(w_all, axis=0) + w_env
    norm = 1.0 / greater_than_zero(total)
    probs = w_all * norm[None]
    env_prob = w_env * norm

    # --- Selection: first slot with prob > 0 and u <= cdf ----------------
    cdf = jnp.cumsum(probs, axis=0)
    eligible = (u[None] <= cdf) & (probs > 0.0)
    any_punctual = jnp.any(eligible, axis=0)
    slot = jnp.argmax(eligible, axis=0)  # first True (0 if none)

    # --- Gather the chosen light's data (take_along_axis over slots) -------
    ones_r = jnp.ones((1, *shape), jnp.float32)

    def cat_rows(d_col, p_rows, s_rows):
        return jnp.concatenate(
            [jnp.broadcast_to(_bc(d_col), (_ND, *shape)), p_rows, s_rows],
            axis=0,
        )

    cand_dx = cat_rows(dd[:, 0], pdx, sdx)  # (S, *shape)
    cand_dy = cat_rows(dd[:, 1], pdy, sdy)
    cand_dz = cat_rows(dd[:, 2], pdz, sdz)
    cand_dist = jnp.concatenate(
        [jnp.full((_ND, *shape), inf), point_dist, spot_dist], axis=0
    )
    # Radiance along the shadow ray (the light-primitive shaders):
    #   directional: color                     (directionalLight.rlsl:24)
    #   point:       color / d^2               (pointLight.rlsl:22-26)
    #   spot:        color / d^2 * falloff     (spotLight.rlsl:22-33)
    inv_pd2 = 1.0 / greater_than_zero(point_dist * point_dist)
    spot_att = (
        jnp.where(ray_angle >= 0.0, 1.0, 0.0)
        * spot_fall
        / greater_than_zero(spot_dist * spot_dist)
    )

    def cand_rad(ch):
        return jnp.concatenate(
            [
                _bc(lights.dir_color[:, ch]) * ones_r,
                _bc(lights.point_color[:, ch]) * inv_pd2,
                _bc(lights.spot_color[:, ch]) * spot_att,
            ],
            axis=0,
        )

    # Arithmetic one-hot selection over the 15 slots.  NOT take_along_axis:
    # a cross-slot dynamic gather lowers to per-element DMA fetches on TPU
    # (measured ~275 ms per call at 2M rays); the masked reduction below is
    # ~30 VPU ops per candidate (~1 ms).
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (NUM_SLOTS, *shape), 0)
        == slot[None]
    )

    def pick(rows):
        # where (not multiply): cand_dist carries +inf rows and inf * 0.0
        # would poison the sum with NaN.
        return jnp.sum(jnp.where(onehot, rows, 0.0), axis=0)

    sel_dx, sel_dy, sel_dz = pick(cand_dx), pick(cand_dy), pick(cand_dz)
    sel_dist = pick(cand_dist)
    sel_prob = pick(probs)
    sel_rx, sel_ry, sel_rz = (
        pick(cand_rad(0)),
        pick(cand_rad(1)),
        pick(cand_rad(2)),
    )
    # Slot ranges are static: [0, D) directional, [D, D+P) point, rest spot.
    sel_type = jnp.where(
        slot < _ND,
        LIGHT_TYPE_DIRECTIONAL,
        jnp.where(slot < _ND + _NP, LIGHT_TYPE_POINT, LIGHT_TYPE_SPOT),
    ).astype(jnp.int32)

    # Environment fall-through.
    zero = jnp.zeros(shape, jnp.float32)
    light_type = jnp.where(any_punctual, sel_type, LIGHT_TYPE_ENVIRONMENT)
    probability = jnp.where(any_punctual, sel_prob, env_prob)
    direction = Vec3.where(
        any_punctual, Vec3(sel_dx, sel_dy, sel_dz), Vec3(zero, zero, zero)
    )
    max_distance = jnp.where(any_punctual, sel_dist, inf)
    radiance = Vec3.where(
        any_punctual, Vec3(sel_rx, sel_ry, sel_rz), Vec3(zero, zero, zero)
    )

    return LightSample(
        light_type=light_type,
        direction=direction,
        probability=probability,
        max_distance=max_distance,
        radiance=radiance,
    )
