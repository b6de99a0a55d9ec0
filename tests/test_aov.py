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


class TestNormalmapAOVs:
    @pytest.fixture(scope="class")
    def nm_scene(self):
        b = SceneBuilder()
        # Constant tangent-space normal map pointing along +Z (flat), with a
        # recognizable red channel = 0.25.
        nm = np.zeros((4, 4, 3), np.float32)
        nm[..., 0] = 0.25
        nm[..., 1] = 0.5
        nm[..., 2] = 1.0
        tex = b.add_texture(nm)
        b.add_mesh(
            sphere_mesh(16, 16, 1.0),
            PBRParams(normal_tex=tex, clearcoat_normal_tex=tex, clearcoat=1.0),
        )
        b.set_environment(EnvironmentLightDesc())
        return b.build()

    def test_normalmap_shows_raw_texel(self, nm_scene):
        img = _render_aov(AOV.NORMALMAP, nm_scene)
        hit = img.sum(axis=-1) > 0
        assert hit.any()
        assert np.allclose(img[hit], [0.25, 0.5, 1.0], atol=1e-3)

    def test_clearcoat_normalmap_shows_raw_texel(self, nm_scene):
        img = _render_aov(AOV.CLEARCOAT_NORMALMAP, nm_scene)
        hit = img.sum(axis=-1) > 0
        assert hit.any()
        assert np.allclose(img[hit], [0.25, 0.5, 1.0], atol=1e-3)

    def test_normalmap_black_without_texture(self, scene):
        # Materials without a normal map accumulate nothing (the reference
        # compiles the branch out): pure black.
        img = _render_aov(AOV.NORMALMAP, scene)
        assert img.max() == 0.0


class TestDebugPassFreeze:
    def test_renders_only_the_chosen_pass(self, scene):
        """debug_pass_rendering freezes accumulation to one pass
        (``PassGenerator.h:145-149``)."""
        import dataclasses

        from heatray_tpu.options import RenderOptions

        cam = orbit_camera(16, 16, distance=4.0, theta=0.4)
        base = RenderOptions(
            width=16, height=16, max_render_passes=4, max_ray_depth=2
        )
        # Reference image: pass 2 rendered alone via the normal path.
        accum_direct, ctx = render(scene, cam, base, num_passes=1, start_pass=2)
        frozen = dataclasses.replace(
            base, debug_pass_rendering=True, debug_pass_index=2
        )
        # num_passes is ignored under the freeze: still exactly one pass.
        accum_frozen, _ = render(scene, cam, frozen, num_passes=4, ctx=ctx)
        np.testing.assert_allclose(
            np.asarray(accum_frozen), np.asarray(accum_direct), rtol=1e-6
        )
        assert np.asarray(accum_frozen)[3].max() == 1.0  # one pass counted
