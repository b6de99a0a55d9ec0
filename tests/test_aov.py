"""AOV (debug visualization) tests, SURVEY section 4: the reference's 17
visualizer modes act as proxy assertions — here they are real CI checks."""

import numpy as np
import pytest

from heatray_tpu.camera import orbit_camera
from heatray_tpu.options import AOV, RenderOptions
from heatray_tpu.render import make_context, render, resolve
from heatray_tpu.scene import (
    GlassParams,
    PBRParams,
    SceneBuilder,
    plane_mesh,
    sphere_mesh,
    translate,
)
from heatray_tpu.scene.lights import EnvironmentLightDesc


def _scene():
    b = SceneBuilder()
    b.add_mesh(
        sphere_mesh(16, 16, 1.0),
        PBRParams(base_color=(0.8, 0.3, 0.3), roughness=0.4, metallic=0.7),
    )
    b.add_mesh(
        plane_mesh(10, 10),
        GlassParams(base_color=(0.9, 0.9, 0.9)),
        transform=translate([0, -1.2, 0]),
    )
    b.set_environment(EnvironmentLightDesc())
    return b.build()


def _render_aov(aov, scene):
    options = RenderOptions(
        width=24, height=24, max_render_passes=2, max_ray_depth=2, aov=aov
    )
    cam = orbit_camera(24, 24, distance=4.0, theta=0.4)
    accum, _ = render(scene, cam, options, num_passes=1)
    return np.asarray(resolve(accum))


@pytest.fixture(scope="module")
def scene():
    return _scene()


class TestSurfaceAOVs:
    def test_normals_encode_unit_vectors(self, scene):
        img = _render_aov(AOV.GEOMETRIC_NORMALS, scene)
        assert np.isfinite(img).all()
        hit = img.sum(axis=-1) > 0
        assert hit.any()
        n = img[hit] * 2.0 - 1.0
        assert np.allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-2)

    def test_roughness_metallic(self, scene):
        rough = _render_aov(AOV.ROUGHNESS, scene)
        hit = rough.sum(axis=-1) > 0
        vals = np.unique(np.round(rough[hit][:, 0], 3))
        # sphere roughness 0.4, glass plane conditioned 0.01
        assert any(np.isclose(vals, 0.4, atol=1e-3))
        met = _render_aov(AOV.METALLIC, scene)
        mh = met.sum(axis=-1) > 0
        assert any(np.isclose(np.unique(np.round(met[mh][:, 0], 3)), 0.7, atol=1e-3))

    def test_shader_id_colors(self, scene):
        img = _render_aov(AOV.SHADER, scene)
        hit = img.sum(axis=-1) > 0
        reds = (img[..., 0] > 0.5) & hit
        greens = (img[..., 1] > 0.5) & hit
        assert reds.any() and greens.any()  # PBR sphere + glass plane

    def test_base_color(self, scene):
        img = _render_aov(AOV.BASE_COLOR, scene)
        hit = img.sum(axis=-1) > 0
        assert hit.any()
        # Sphere pixels show the raw base color.
        sphere = hit & np.isclose(img[..., 0], 0.8, atol=1e-3)
        assert sphere.any()

    def test_uvs_finite_blue_zero(self, scene):
        # Plane UVs are [-1, 1] (``PlaneMeshProvider.h`` semantics), sphere
        # UVs [0, 1]; the blue channel is always zero.
        img = _render_aov(AOV.UVS, scene)
        assert img[..., 2].max() == 0.0
        assert np.isfinite(img).all()
        assert img.min() >= -1.0 - 1e-5 and img.max() <= 1.0 + 1e-5


class TestAccumAOVs:
    def test_nan_vis_clean_scene(self, scene):
        img = _render_aov(AOV.NANS, scene)
        # No NaNs anywhere: everything dims to <= 0.1.
        assert img.max() <= 0.1 + 1e-5

    def test_inf_vis_clean_scene(self, scene):
        img = _render_aov(AOV.INFS, scene)
        assert img.max() <= 0.1 + 1e-5
