"""Light-direction convention tests (VERDICT r2 item 8).

Conventions, per class (documented in ``scene/lights.py``):

- ``DirectionalLight.direction`` points **toward the light** (the reference
  builds it from phi/theta orientation, ``DirectionalLight.cpp:64-78``, and
  shades with ``saturate(N.L)`` where L is that vector).
- ``SpotLight.direction`` is the **emission direction** (the cone axis the
  light shines along, ``SpotLight.h`` orientation).
- The glTF loader converts KHR_lights_punctual (which stores emission -Z in
  node space) accordingly: negated for directional, as-is for spot.

These tests render tiny scenes and assert the lit/unlit outcome, so a sign
regression in any loader or sampler fails loudly instead of rendering black.
"""

import math

import numpy as np

from heatray_tpu.camera import orbit_camera
from heatray_tpu.options import RenderOptions
from heatray_tpu.render import render, resolve
from heatray_tpu.scene import PBRParams, SceneBuilder, plane_mesh
from heatray_tpu.scene.lights import (
    DirectionalLight,
    SpotLight,
    build_light_bank,
    orientation_to_direction,
)

SIZE = 24


def _plane_scene(lights_fn):
    """An upward-facing ground plane at y=0, camera above looking down."""
    b = SceneBuilder()
    b.add_mesh(plane_mesh(8, 8), PBRParams(base_color=(0.8, 0.8, 0.8)))
    lights_fn(b)
    scene = b.build()
    cam = orbit_camera(SIZE, SIZE, distance=4.0, theta=1.2)
    opts = RenderOptions(
        width=SIZE, height=SIZE, max_render_passes=2, max_ray_depth=1
    )
    accum, _ = render(scene, cam, opts, num_passes=2)
    return np.asarray(resolve(accum))


def test_directional_toward_light_convention():
    """direction=+Y (sun overhead) lights the plane; -Y leaves it black."""
    lit = _plane_scene(
        lambda b: b.add_directional_light(
            DirectionalLight(direction=(0.0, 1.0, 0.0), illuminance=20000.0)
        )
    )
    unlit = _plane_scene(
        lambda b: b.add_directional_light(
            DirectionalLight(direction=(0.0, -1.0, 0.0), illuminance=20000.0)
        )
    )
    assert lit.max() > 0.1, "sun overhead must light an upward plane"
    assert unlit.max() == 0.0, (
        "direction is TOWARD the light: -Y means the sun is underground"
    )


def test_spot_emission_direction_convention():
    """A spot above the plane shining DOWN (-Y emission) lights it; shining
    up leaves it black."""
    def spot(direction):
        return SpotLight(
            position=(0.0, 2.0, 0.0),
            direction=direction,
            luminous_intensity=5.0e4,
            inner_angle=math.radians(30.0),
            outer_angle=math.radians(50.0),
        )

    lit = _plane_scene(lambda b: b.add_spot_light(spot((0.0, -1.0, 0.0))))
    unlit = _plane_scene(lambda b: b.add_spot_light(spot((0.0, 1.0, 0.0))))
    assert lit.max() > 0.1, "down-shining spot must light the plane below"
    assert unlit.max() == 0.0, (
        "direction is the EMISSION axis: +Y shines away from the plane"
    )


def test_bank_normalizes_directions():
    bank = build_light_bank(
        directional=[DirectionalLight(direction=(0.0, 10.0, 0.0))],
        spot=[SpotLight(direction=(0.0, -5.0, 0.0))],
    )
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(bank.dir_direction[0])), 1.0, rtol=1e-6
    )
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(bank.spot_direction[0])), 1.0, rtol=1e-6
    )


def test_orientation_to_direction_matches_reference():
    """phi=0, theta=pi/2 -> straight up (+Y), per DirectionalLight.cpp:64-78."""
    d = orientation_to_direction(0.0, math.pi / 2.0)
    np.testing.assert_allclose(d, [0.0, 1.0, 0.0], atol=1e-6)
    d = orientation_to_direction(math.pi / 2.0, 0.0)
    np.testing.assert_allclose(d, [1.0, 0.0, 0.0], atol=1e-6)
