"""Long-render convergence audit (VERDICT r4 item 9).

The golden gate (48x48, 4 passes, rtol 5e-3) catches estimator rewrites
but not subtle energy drift.  These checks run the estimator long enough
that Monte Carlo noise is well below the tolerance, then compare against
ANALYTIC transport values:

- white furnace at depth 8 over 256 passes: mean radiance == env radiance
  to 3e-3 (energy conservation through NEE + BSDF chains + RR);
- Lambertian plane under a unit directional light, 512 passes: center
  pixel == albedo/pi to 5e-3.

They are slow on the CPU census (~minutes), so they are gated behind
``HEATRAY_SLOW_TESTS=1`` — the same opt-in used for full-image goldens.
"""

import os

import numpy as np
import pytest

from heatray_tpu.camera import orbit_camera
from heatray_tpu.options import RenderOptions
from heatray_tpu.render.integrator import render, resolve
from heatray_tpu.scene import SceneBuilder
from heatray_tpu.scene.lights import DirectionalLight, EnvironmentLightDesc
from heatray_tpu.scene.materials import PBRParams
from heatray_tpu.scene.providers import plane_mesh, sphere_mesh

slow = pytest.mark.skipif(
    os.environ.get("HEATRAY_SLOW_TESTS", "0") != "1",
    reason="long-render convergence audit; set HEATRAY_SLOW_TESTS=1",
)


@slow
def test_furnace_long_render_energy():
    """256 passes x depth 8 white furnace: the estimator must neither gain
    nor lose energy as the pass count and path length grow (catches drift
    the 4-pass goldens cannot see)."""
    b = SceneBuilder()
    b.add_mesh(
        sphere_mesh(48, 64),
        PBRParams(base_color=(1.0, 1.0, 1.0), roughness=1.0,
                  specular_f0=0.0),
    )
    b.set_environment(EnvironmentLightDesc(solid_color=(1.0, 1.0, 1.0)))
    scene = b.build()
    cam = orbit_camera(96, 96, distance=3.0)
    opts = RenderOptions(width=96, height=96, max_render_passes=256,
                         max_ray_depth=8)
    accum, _ = render(scene, cam, opts, num_passes=256)
    img = np.asarray(resolve(accum))
    assert np.isfinite(img).all()
    assert abs(img.mean() - 1.0) < 3e-3, img.mean()
    # No energy creation anywhere, and >99.5% of pixels within 1%.
    assert img.max() <= 1.0 + 1e-4
    assert (np.abs(img - 1.0) < 0.01).mean() > 0.995


@slow
def test_directional_long_render_analytic():
    """512 passes: center-pixel radiance of a white Lambertian plane under
    a 1 W directional light from above == 1/pi to 0.5%."""
    b = SceneBuilder()
    b.add_mesh(
        plane_mesh(50, 50),
        PBRParams(base_color=(1.0, 1.0, 1.0), roughness=1.0,
                  specular_f0=0.0),
    )
    b.add_directional_light(
        DirectionalLight(direction=(0.0, 1.0, 0.0), illuminance=683.0)
    )
    scene = b.build()
    cam = orbit_camera(64, 64, distance=5.0, theta=1.2)
    opts = RenderOptions(width=64, height=64, max_render_passes=512,
                         max_ray_depth=2)
    accum, _ = render(scene, cam, opts, num_passes=512)
    img = np.asarray(resolve(accum))
    expected = 1.0 / np.pi
    center = img[28:36, 28:36].mean(axis=(0, 1))
    np.testing.assert_allclose(center, expected, rtol=5e-3)
