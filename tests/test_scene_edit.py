"""Scene-edit tests: apply_transform, mesh add/remove, light add/update/
remove with swap compaction, and the session transform round-trip
(``Scene/Scene.cpp:38-49``, ``Lighting.cpp:239-271``,
``HeatrayRenderer.cpp:674-683``)."""

import json
import math

import numpy as np
import pytest

from heatray_tpu.camera import orbit_camera
from heatray_tpu.options import RenderOptions
from heatray_tpu.render import render, resolve
from heatray_tpu.scene import (
    PBRParams,
    SceneBuilder,
    plane_mesh,
    sphere_mesh,
    translate,
)
from heatray_tpu.scene.edit import (
    add_directional_light,
    add_mesh,
    add_point_light,
    add_spot_light,
    apply_transform,
    remove_directional_light,
    remove_mesh,
    remove_point_light,
    trs_matrix,
    update_point_light,
)
from heatray_tpu.scene.geometry import rotate, scene_aabb
from heatray_tpu.scene.lights import (
    DirectionalLight,
    EnvironmentLightDesc,
    PointLight,
    SpotLight,
)

SIZE = 24


def _base_scene():
    b = SceneBuilder()
    b.add_mesh(sphere_mesh(12, 12, 1.0), PBRParams(base_color=(0.7, 0.7, 0.7)))
    b.add_mesh(
        plane_mesh(8, 8),
        PBRParams(base_color=(0.8, 0.8, 0.8)),
        transform=translate([0, -1.0, 0]),
    )
    b.set_environment(EnvironmentLightDesc(solid_color=(0.5, 0.5, 0.5)))
    return b.build()


def _render(scene, distance=5.0):
    cam = orbit_camera(SIZE, SIZE, distance=distance, theta=0.4)
    opts = RenderOptions(
        width=SIZE, height=SIZE, max_render_passes=2, max_ray_depth=2
    )
    accum, _ = render(scene, cam, opts, num_passes=2)
    return np.asarray(resolve(accum))


class TestApplyTransform:
    def test_matches_build_time_transform(self):
        """Transforming a built scene == building with the transform."""
        m = rotate(0.7, [0, 1, 0]) @ translate([0.3, 0.0, -0.2])

        b1 = SceneBuilder()
        b1.add_mesh(sphere_mesh(12, 12, 1.0), PBRParams())
        b1.set_environment(EnvironmentLightDesc())
        s_after = apply_transform(b1.build(), m)

        b2 = SceneBuilder()
        b2.add_mesh(sphere_mesh(12, 12, 1.0), PBRParams(), transform=m)
        b2.set_environment(EnvironmentLightDesc())
        s_direct = b2.build()

        img_a = _render(s_after)
        img_d = _render(s_direct)
        np.testing.assert_allclose(img_a, img_d, rtol=1e-4, atol=1e-4)

    def test_changes_render(self):
        scene = _base_scene()
        moved = apply_transform(scene, translate([0.0, 2.5, 0.0]))
        assert np.abs(_render(scene) - _render(moved)).max() > 1e-3

    def test_reflection_flips_winding(self):
        scene = _base_scene()
        m = np.diag([-1.0, 1.0, 1.0, 1.0]).astype(np.float32)
        mirrored = apply_transform(scene, m)
        # Winding flip: index rows 1/2 swapped.
        gi = np.asarray(scene.geometry.indices)
        mi = np.asarray(mirrored.geometry.indices)
        np.testing.assert_array_equal(gi[1], mi[2])
        np.testing.assert_array_equal(gi[2], mi[1])
        # And the mirrored scene still renders (normals outward).
        img = _render(mirrored)
        assert np.isfinite(img).all() and img.max() > 0.0


class TestMeshEdits:
    def test_add_mesh_renders_it(self):
        scene = _base_scene()
        bigger = add_mesh(
            scene,
            sphere_mesh(10, 10, 0.8),
            PBRParams(base_color=(0.9, 0.2, 0.2)),
            # In front of the base sphere, inside the ~27 degree FOV.
            transform=translate([0.8, 0.0, 1.2]),
        )
        assert bigger.geometry.num_triangles > scene.geometry.num_triangles
        assert np.abs(_render(scene) - _render(bigger)).max() > 1e-3

    def test_remove_mesh(self):
        scene = _base_scene()
        no_plane = remove_mesh(scene, 1)
        assert no_plane.geometry.num_triangles < scene.geometry.num_triangles
        assert (np.asarray(no_plane.geometry.mesh_ids) != 1).all()
        assert np.abs(_render(scene) - _render(no_plane)).max() > 1e-3

    def test_add_then_remove_restores(self):
        scene = _base_scene()
        added = add_mesh(
            scene, sphere_mesh(8, 8, 0.5), PBRParams(),
            transform=translate([2.0, 0.0, 0.0]),
        )
        new_id = int(np.asarray(added.geometry.mesh_ids).max())
        back = remove_mesh(added, new_id)
        np.testing.assert_allclose(_render(scene), _render(back), rtol=1e-5)


class TestLightEdits:
    def test_add_update_remove_point(self):
        scene = _base_scene()
        s1 = add_point_light(
            scene, PointLight(position=(0, 3, 0), luminous_intensity=3e4)
        )
        assert int(s1.lights.num_point) == 1
        img1 = _render(s1)
        assert np.abs(img1 - _render(scene)).max() > 1e-3

        s2 = update_point_light(
            s1, 0, PointLight(position=(0, 3, 0), luminous_intensity=6e4)
        )
        assert np.abs(_render(s2) - img1).max() > 1e-4

        s3 = remove_point_light(s2, 0)
        assert int(s3.lights.num_point) == 0
        np.testing.assert_allclose(_render(s3), _render(scene), rtol=1e-5)

    def test_swap_compaction(self):
        scene = _base_scene()
        s = add_point_light(
            scene, PointLight(position=(1, 3, 0), luminous_intensity=1e4)
        )
        s = add_point_light(
            s, PointLight(position=(-1, 3, 0), luminous_intensity=2e4)
        )
        s = add_point_light(
            s, PointLight(position=(0, 3, 1), luminous_intensity=3e4)
        )
        removed = remove_point_light(s, 0)  # last (idx 2) swaps into slot 0
        assert int(removed.lights.num_point) == 2
        np.testing.assert_allclose(
            np.asarray(removed.lights.point_position[0]), [0, 3, 1]
        )

    def test_capacity_assert(self):
        scene = _base_scene()
        s = scene
        for i in range(5):
            s = add_directional_light(
                s, DirectionalLight(direction=(0, 1, 0))
            )
        with pytest.raises(AssertionError):
            add_directional_light(s, DirectionalLight())
        s = remove_directional_light(s, 4)
        assert int(s.lights.num_directional) == 4

    def test_spot_add(self):
        scene = _base_scene()
        s = add_spot_light(
            scene,
            SpotLight(
                position=(0, 3, 0), direction=(0, -1, 0),
                luminous_intensity=5e4,
            ),
        )
        assert int(s.lights.num_spot) == 1
        assert np.abs(_render(s) - _render(scene)).max() > 1e-3


class TestSessionTransform:
    def test_session_scene_transform_applied(self, tmp_path):
        """A session with RotationYaw + Scale renders differently from the
        identity session, and matches a directly-transformed scene."""
        from heatray_tpu.io_utils.session import Session, load_session

        session = Session()
        session.set("RenderOptions", "Scene", "cornell-box")
        session.set("RenderOptions", "MaxRenderPasses", 2)
        session.set("RenderOptions", "MaxRayDepth", 2)
        session.set("Camera", "OrbitDistance", 6.0)
        path_id = tmp_path / "identity.json"
        session.write(str(path_id))

        session.set("Scene", "RotationYaw", 0.6)
        session.set("Scene", "Scale", 0.8)
        path_tr = tmp_path / "transformed.json"
        session.write(str(path_tr))

        scene_i, cam, opts = load_session(
            str(path_id), override_size=(SIZE, SIZE)
        )
        scene_t, _, _ = load_session(
            str(path_tr), override_size=(SIZE, SIZE)
        )

        from heatray_tpu.scene.edit import apply_transform, trs_matrix

        direct = apply_transform(scene_i, trs_matrix(yaw=0.6, scale=0.8))
        np.testing.assert_allclose(
            np.asarray(scene_t.geometry.positions),
            np.asarray(direct.geometry.positions),
            rtol=1e-5, atol=1e-6,
        )
        aabb_i = scene_aabb(scene_i.geometry)
        aabb_t = scene_aabb(scene_t.geometry)
        assert np.abs(aabb_i - aabb_t).max() > 1e-3
