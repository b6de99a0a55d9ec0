"""Fixed-capacity light bank with photometric->radiometric conversion.

Replaces the reference's ``Lighting`` registry + per-light uniform buffers
(``Source/HeatrayRenderer/Scene/Lighting.{h,cpp}``,
``Lights/ShaderLightingDefines.h``): 5 each of directional/point/spot lights
plus one environment light, stored as dense arrays the shader scans
branchlessly.

Unit conversions match the reference exactly:
- directional: watts = illuminance(lux) / 683        (``DirectionalLight.cpp:49-50``)
- point:       watts = lm / 683 * 4 * pi              (``PointLight.cpp:46-47``)
- spot:        watts = lm / 683 * pi                  (``SpotLight.cpp:53-54``)
- environment: exposure compensation = 2^exposure     (``EnvironmentLight.cpp:95``)
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import struct

# ``Lights/ShaderLightingDefines.h:18-20``
MAX_DIRECTIONAL_LIGHTS = 5
MAX_POINT_LIGHTS = 5
MAX_SPOT_LIGHTS = 5

WATTS_TO_LUMENS = 683.0
LUMENS_TO_WATTS = 1.0 / 683.0

LIGHT_TYPE_NONE = 0
LIGHT_TYPE_DIRECTIONAL = 1
LIGHT_TYPE_POINT = 2
LIGHT_TYPE_SPOT = 3
LIGHT_TYPE_ENVIRONMENT = 4


def orientation_to_direction(phi: float, theta: float) -> np.ndarray:
    """Spherical orientation -> unit direction *toward the light*
    (``DirectionalLight.cpp:64-78`` semantics: Y-up, phi about Y)."""
    # Matches glm-based: dir = normalize(rotPhi * rotTheta * -Z)? The
    # reference builds the direction from phi/theta as below.
    x = math.cos(theta) * math.sin(phi)
    y = math.sin(theta)
    z = math.cos(theta) * math.cos(phi)
    return np.array([x, y, z], dtype=np.float32)


@dataclasses.dataclass
class DirectionalLight:
    """``DirectionalLight.h:32-47``; color * illuminance converts to watts."""

    direction: Tuple[float, float, float] = (0.0, 1.0, 0.0)  # toward light
    color: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    illuminance: float = WATTS_TO_LUMENS * math.pi  # default 1 W * pi
    name: str = "directional"

    def radiometric_color(self) -> np.ndarray:
        return np.asarray(self.color, np.float32) * np.float32(
            self.illuminance * LUMENS_TO_WATTS
        )


@dataclasses.dataclass
class PointLight:
    """``PointLight.h``; lm -> W with the reference's 4pi factor."""

    position: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    color: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    luminous_intensity: float = WATTS_TO_LUMENS * 4.0 * math.pi  # 1 W * 4pi
    name: str = "point"

    def radiometric_color(self) -> np.ndarray:
        watts = (self.luminous_intensity * LUMENS_TO_WATTS) * (4.0 * math.pi)
        return np.asarray(self.color, np.float32) * np.float32(watts)


@dataclasses.dataclass
class SpotLight:
    """``SpotLight.h``; angles stored as cosines (``SpotLight.cpp:50``)."""

    position: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    direction: Tuple[float, float, float] = (0.0, -1.0, 0.0)  # emission dir
    color: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    inner_angle: float = math.radians(20.0)
    outer_angle: float = math.radians(40.0)
    luminous_intensity: float = WATTS_TO_LUMENS * math.pi * math.pi  # 1 W * pi^2
    name: str = "spot"

    def __post_init__(self):
        # Angle validation, ``SpotLight.cpp:58-69``.
        if self.inner_angle > self.outer_angle:
            self.inner_angle = max(0.0, self.outer_angle - math.radians(1.0))
        if self.inner_angle > 0.0 and self.inner_angle == self.outer_angle:
            self.inner_angle -= math.radians(1.0)

    def radiometric_color(self) -> np.ndarray:
        watts = (self.luminous_intensity * LUMENS_TO_WATTS) * math.pi
        return np.asarray(self.color, np.float32) * np.float32(watts)


@dataclasses.dataclass
class EnvironmentLightDesc:
    """``EnvironmentLight.h``: lat/long HDR map or solid color.

    The solid-color default is 0.5 "so that it's obvious if there is more
    energy being emitted than should be" (``EnvironmentLight.cpp:52-53``).
    """

    # (H, W, 3) float linear lat/long, TOP row first (row 0 = sky/+Y pole).
    image: Optional[np.ndarray] = None
    solid_color: Tuple[float, float, float] = (0.5, 0.5, 0.5)
    exposure: float = 0.0  # EV; compensation = 2^exposure
    rotation: float = 0.0  # theta rotation (radians)
    name: str = "environment"


@struct.dataclass
class LightBank:
    """Dense light arrays (a pytree) consumed by the shader."""

    num_directional: jnp.ndarray  # () i32
    dir_direction: jnp.ndarray  # (5, 3) toward light
    dir_color: jnp.ndarray  # (5, 3) radiometric

    num_point: jnp.ndarray  # () i32
    point_position: jnp.ndarray  # (5, 3)
    point_color: jnp.ndarray  # (5, 3) radiometric

    num_spot: jnp.ndarray  # () i32
    spot_position: jnp.ndarray  # (5, 3)
    spot_direction: jnp.ndarray  # (5, 3) emission direction
    spot_color: jnp.ndarray  # (5, 3) radiometric
    spot_cos_angles: jnp.ndarray  # (5, 2) [cos(inner), cos(outer)]

    env_enabled: jnp.ndarray  # () i32
    env_map: jnp.ndarray  # (3, He, We) planar linear; 1x1 for solid color
    env_exposure_compensation: jnp.ndarray  # () f32 = 2^exposure
    env_rotation: jnp.ndarray  # () f32 radians


def build_light_bank(
    directional: Optional[List[DirectionalLight]] = None,
    point: Optional[List[PointLight]] = None,
    spot: Optional[List[SpotLight]] = None,
    environment: Optional[EnvironmentLightDesc] = None,
) -> LightBank:
    directional = directional or []
    point = point or []
    spot = spot or []
    assert len(directional) <= MAX_DIRECTIONAL_LIGHTS
    assert len(point) <= MAX_POINT_LIGHTS
    assert len(spot) <= MAX_SPOT_LIGHTS

    dd = np.zeros((MAX_DIRECTIONAL_LIGHTS, 3), np.float32)
    dc = np.zeros((MAX_DIRECTIONAL_LIGHTS, 3), np.float32)
    for i, l in enumerate(directional):
        d = np.asarray(l.direction, np.float32)
        dd[i] = d / max(np.linalg.norm(d), 1e-20)
        dc[i] = l.radiometric_color()

    pp = np.zeros((MAX_POINT_LIGHTS, 3), np.float32)
    pc = np.zeros((MAX_POINT_LIGHTS, 3), np.float32)
    for i, l in enumerate(point):
        pp[i] = l.position
        pc[i] = l.radiometric_color()

    sp = np.zeros((MAX_SPOT_LIGHTS, 3), np.float32)
    sd = np.zeros((MAX_SPOT_LIGHTS, 3), np.float32)
    sc = np.zeros((MAX_SPOT_LIGHTS, 3), np.float32)
    sa = np.ones((MAX_SPOT_LIGHTS, 2), np.float32)
    for i, l in enumerate(spot):
        sp[i] = l.position
        d = np.asarray(l.direction, np.float32)
        sd[i] = d / max(np.linalg.norm(d), 1e-20)
        sc[i] = l.radiometric_color()
        sa[i] = (math.cos(l.inner_angle), math.cos(l.outer_angle))

    if environment is not None:
        if environment.image is not None:
            # (H, W, 3) -> planar (3, H, W).
            env_map = np.ascontiguousarray(
                np.asarray(environment.image, np.float32).transpose(2, 0, 1)
            )
        else:
            env_map = np.asarray(environment.solid_color, np.float32).reshape(
                3, 1, 1
            )
        env_enabled = 1
        env_comp = 2.0 ** environment.exposure
        env_rot = environment.rotation
    else:
        env_map = np.zeros((3, 1, 1), np.float32)
        env_enabled = 0
        env_comp = 1.0
        env_rot = 0.0

    return LightBank(
        num_directional=jnp.int32(len(directional)),
        dir_direction=jnp.asarray(dd),
        dir_color=jnp.asarray(dc),
        num_point=jnp.int32(len(point)),
        point_position=jnp.asarray(pp),
        point_color=jnp.asarray(pc),
        num_spot=jnp.int32(len(spot)),
        spot_position=jnp.asarray(sp),
        spot_direction=jnp.asarray(sd),
        spot_color=jnp.asarray(sc),
        spot_cos_angles=jnp.asarray(sa),
        env_enabled=jnp.int32(env_enabled),
        env_map=jnp.asarray(env_map),
        env_exposure_compensation=jnp.float32(env_comp),
        env_rotation=jnp.float32(env_rot),
    )
