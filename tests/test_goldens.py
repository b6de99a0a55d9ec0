"""Golden-image regression harness (SURVEY section 4 "Integration").

Renders the five driver benchmark configs (BASELINE.md) small and
deterministic (CPU, fixed QMC streams) and compares against stored goldens,
so a silent estimator change fails CI.  Regenerate after an INTENTIONAL
estimator change with:

    GOLDEN_UPDATE=1 python -m pytest tests/test_goldens.py

and review the image diffs before committing.  NaN/Inf AOV cleanliness is
asserted on every config as well (``accumulator.rlsl:16-21`` semantics).
"""

import dataclasses
import math
import os
from pathlib import Path

import numpy as np
import pytest

from heatray_tpu.camera import orbit_camera
from heatray_tpu.options import AOV, RenderOptions
from heatray_tpu.post import PostProcessingParams, apply_post_pipeline
from heatray_tpu.render import render, resolve
from heatray_tpu.scene import (
    GlassParams,
    PBRParams,
    SceneBuilder,
    plane_mesh,
    sphere_mesh,
    translate,
)
from heatray_tpu.scene.builtin import cornell_box, multi_material
from heatray_tpu.scene.lights import (
    DirectionalLight,
    EnvironmentLightDesc,
)

GOLDEN_DIR = Path(__file__).parent / "goldens"
SIZE = 48
PASSES = 4


def _config1():
    """Diffuse sphere + ground plane, directional light (driver config 1)."""
    b = SceneBuilder()
    b.add_mesh(sphere_mesh(24, 24, 1.0), PBRParams(base_color=(0.7, 0.7, 0.7)))
    b.add_mesh(
        plane_mesh(12, 12),
        PBRParams(base_color=(0.8, 0.8, 0.8)),
        transform=translate([0, -1.0, 0]),
    )
    # DirectionalLight.direction points *toward* the light
    # (``DirectionalLight.h:32-47`` orientation semantics, lights.py:56):
    # the sun sits up and to the +x/+z side of the scene.
    b.add_directional_light(
        DirectionalLight(direction=(0.4, 0.8, 0.45), illuminance=20000.0)
    )
    scene = b.build()
    cam = orbit_camera(SIZE, SIZE, distance=5.0, theta=0.35)
    opts = RenderOptions(
        width=SIZE, height=SIZE, max_render_passes=PASSES, max_ray_depth=2
    )
    return scene, cam, opts


def _config2():
    """Cornell box, NEE point+spot, 4 bounces (driver config 2)."""
    scene = cornell_box(light="both", with_spheres=True)
    cam = orbit_camera(SIZE, SIZE, distance=6.2, focal_length_mm=35.0)
    opts = RenderOptions(
        width=SIZE, height=SIZE, max_render_passes=PASSES, max_ray_depth=4
    )
    return scene, cam, opts


def _config3():
    """PBR clearcoat + multiscatter under an HDR gradient environment."""
    b = SceneBuilder()
    b.add_mesh(
        sphere_mesh(24, 24, 1.0),
        PBRParams(
            base_color=(0.6, 0.1, 0.1), metallic=0.8, roughness=0.25,
            clearcoat=1.0, clearcoat_roughness=0.1, specular_f0=0.5,
        ),
    )
    # Small procedural sky: bright top, dim bottom (float HDR values).
    h, w = 16, 32
    v = np.linspace(3.0, 0.05, h, dtype=np.float32)[:, None, None]
    img = np.broadcast_to(v, (h, w, 3)).copy()
    b.set_environment(EnvironmentLightDesc(image=img, exposure=0.0))
    scene = b.build()
    cam = orbit_camera(SIZE, SIZE, distance=4.0, theta=0.3)
    opts = RenderOptions(
        width=SIZE, height=SIZE, max_render_passes=PASSES, max_ray_depth=3
    )
    return scene, cam, opts


def _config4():
    """Glass (IOR/absorption/rough transmission) + DoF with hexagonal bokeh."""
    b = SceneBuilder()
    b.add_mesh(
        sphere_mesh(24, 24, 1.0),
        GlassParams(base_color=(0.8, 0.9, 0.8), roughness=0.1, ior=1.5,
                    density=0.4),
    )
    b.add_mesh(
        plane_mesh(12, 12),
        PBRParams(base_color=(0.7, 0.7, 0.9)),
        transform=translate([0, -1.0, 0]),
    )
    b.set_environment(EnvironmentLightDesc(solid_color=(0.5, 0.5, 0.5)))
    scene = b.build()
    cam = orbit_camera(
        SIZE, SIZE, distance=5.0, theta=0.3,
        focus_distance=5.0, aperture_radius=0.15,
    )
    opts = RenderOptions(
        width=SIZE, height=SIZE, max_render_passes=PASSES, max_ray_depth=4,
        bokeh_shape="hexagon",
    )
    return scene, cam, opts


def _config5():
    """Full multi-material scene through the ACES post pipeline."""
    scene = multi_material()
    cam = orbit_camera(SIZE, SIZE, distance=6.0, theta=0.3)
    opts = RenderOptions(
        width=SIZE, height=SIZE, max_render_passes=PASSES, max_ray_depth=5
    )
    return scene, cam, opts


CONFIGS = {
    "config1_sphere_plane": _config1,
    "config2_cornell": _config2,
    "config3_pbr_env": _config3,
    "config4_glass_dof": _config4,
    "config5_full_aces": _config5,
}


def _render_config(name):
    scene, cam, opts = CONFIGS[name]()
    accum, _ = render(scene, cam, opts, num_passes=PASSES)
    img = np.asarray(resolve(accum))
    if name == "config5_full_aces":
        img = np.asarray(
            apply_post_pipeline(
                accum, PostProcessingParams(tonemapping_enabled=True)
            )
        )
    return scene, cam, opts, img


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_golden(name):
    scene, cam, opts, img = _render_config(name)
    assert np.isfinite(img).all(), f"{name}: non-finite pixels"
    assert img.max() > 0.0, f"{name}: black render"

    path = GOLDEN_DIR / f"{name}.npy"
    if os.environ.get("GOLDEN_UPDATE") == "1":
        GOLDEN_DIR.mkdir(exist_ok=True)
        np.save(path, img.astype(np.float16))
        pytest.skip(f"golden (re)written: {path}")
    # A missing golden is a FAILURE, not a skip: otherwise a fresh checkout
    # silently regenerates and the regression gate regresses nothing.
    assert path.exists(), (
        f"golden missing: {path} — generate with GOLDEN_UPDATE=1 and commit"
    )
    golden = np.load(path).astype(np.float32)
    # f16 storage quantization ~1e-3 relative; estimator changes move pixels
    # by orders of magnitude more.
    np.testing.assert_allclose(img, golden, rtol=5e-3, atol=5e-3)


@pytest.mark.parametrize("name", ["config2_cornell", "config4_glass_dof"])
def test_nan_inf_cleanliness(name):
    """NaN/Inf AOVs as CI gates (``accumulator.rlsl:16-21``): an offending
    sample accumulates 100; clean samples dim to ``min(c,1)*0.1`` *per
    accumulated contribution* (env + emission + NEE, each bounce — exactly
    like the reference, whose visualizer wraps every ``accumulate()``).  A
    clean depth-D render therefore peaks around ``0.1 * (2D + 1)``; a single
    fired detector lands at >= 100.  Gate well between the two."""
    scene, cam, opts = CONFIGS[name]()
    for mode in (AOV.NANS, AOV.INFS):
        accum, _ = render(
            scene, cam, dataclasses.replace(opts, aov=mode), num_passes=1
        )
        img = np.asarray(resolve(accum))
        clean_ceiling = 0.1 * (2 * opts.max_ray_depth + 1)
        assert img.max() <= clean_ceiling + 1e-5, (
            f"{name}: {mode} detector fired (max={img.max()})"
        )
