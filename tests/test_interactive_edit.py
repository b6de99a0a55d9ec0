"""Interactive edit-loop tests: the headless analog of the reference's
material/light editors (``HeatrayRenderer.cpp:690-946``) — edits apply to
the pure pytrees, transport edits reset accumulation, display edits don't."""

import json
import urllib.request

import numpy as np
import pytest

from heatray_tpu.camera import orbit_camera
from heatray_tpu.interactive import InteractiveRenderer
from heatray_tpu.options import RenderOptions
from heatray_tpu.scene.builtin import cornell_box


@pytest.fixture(scope="module")
def session():
    options = RenderOptions(width=32, height=32, max_render_passes=4,
                            max_ray_depth=2)
    scene = cornell_box(light="point", with_spheres=False)
    camera = orbit_camera(32, 32, distance=6.2, focal_length_mm=35.0)
    return scene, camera, options


def make_renderer(session):
    scene, camera, options = session
    return InteractiveRenderer(scene, camera, options,
                               orbit=dict(distance=6.2, focal_length=35.0))


def test_material_edit_changes_image_and_resets(session):
    r = make_renderer(session)
    r.step()
    base = np.asarray(r.accum)
    assert r.pass_index == 1

    reset = r.apply_edit(
        {"type": "material", "index": 0, "base_color": [1.0, 0.05, 0.05]}
    )
    assert reset
    r.reset()
    assert r.pass_index == 0
    r.step()
    edited = np.asarray(r.accum)
    assert not np.allclose(base[:3], edited[:3]), "edit left image unchanged"


def test_material_conditioning(session):
    r = make_renderer(session)
    r.apply_edit({"type": "material", "index": 0, "roughness": 0.5,
                  "specular_f0": 0.5, "clearcoat": 1.0})
    m = r.scene.materials
    assert np.isclose(float(m.roughness[0]), 0.5)
    assert np.isclose(float(m.roughness_alpha[0]), 0.25)  # alpha = r^2
    assert np.isclose(float(m.specular_f0[0]), 0.04)  # x0.08
    assert np.isclose(float(m.clearcoat[0]), 0.2)  # x0.2


def test_light_edit(session):
    r = make_renderer(session)
    n0 = int(r.scene.lights.num_point)
    assert n0 >= 1
    reset = r.apply_edit(
        {"type": "point_light", "index": 0,
         "position": [0.0, 1.0, 0.0], "luminous_intensity": 100.0}
    )
    assert reset
    np.testing.assert_allclose(
        np.asarray(r.scene.lights.point_position[0]), [0.0, 1.0, 0.0]
    )
    # index past the end appends (add path)
    r.apply_edit({"type": "point_light", "index": 99,
                  "position": [1.0, 1.0, 1.0]})
    assert int(r.scene.lights.num_point) == n0 + 1
    # remove swaps-compacts back
    r.apply_edit({"type": "point_light", "index": 0, "remove": True})
    assert int(r.scene.lights.num_point) == n0


def test_partial_light_edit_preserves_other_fields(session):
    """Editing only ``color`` must not reset position/intensity to defaults
    (in-place mutation semantics, ``HeatrayRenderer.cpp:875-946``)."""
    r = make_renderer(session)
    r.apply_edit(
        {"type": "point_light", "index": 0,
         "position": [0.25, 1.5, -0.5], "luminous_intensity": 500.0,
         "color": [1.0, 1.0, 1.0]}
    )
    rad_before = np.asarray(r.scene.lights.point_color[0]).copy()

    r.apply_edit({"type": "point_light", "index": 0, "color": [1.0, 0.0, 0.0]})
    np.testing.assert_allclose(
        np.asarray(r.scene.lights.point_position[0]), [0.25, 1.5, -0.5]
    )
    rad_after = np.asarray(r.scene.lights.point_color[0])
    # Intensity (the radiometric scale) survives; only the hue changed.
    np.testing.assert_allclose(rad_after[0], rad_before[0], rtol=1e-5)
    np.testing.assert_allclose(rad_after[1:], 0.0, atol=1e-7)

    # Position-only edit keeps the radiometric color bit-exact.
    r.apply_edit({"type": "point_light", "index": 0, "position": [0, 0, 0]})
    np.testing.assert_allclose(
        np.asarray(r.scene.lights.point_color[0]), rad_after, rtol=1e-6
    )

    # Spot: editing intensity alone preserves direction and cone angles.
    from heatray_tpu.scene import edit as scene_edit
    from heatray_tpu.scene.lights import SpotLight

    r.scene = scene_edit.add_spot_light(
        r.scene,
        SpotLight(position=(0.0, 1.9, 0.0), direction=(0.0, -1.0, 0.0),
                  inner_angle=0.2, outer_angle=0.6),
    )
    idx = int(r.scene.lights.num_spot) - 1
    cos_before = np.asarray(r.scene.lights.spot_cos_angles[idx]).copy()
    r.apply_edit({"type": "spot_light", "index": idx,
                  "luminous_intensity": 2000.0})
    np.testing.assert_allclose(
        np.asarray(r.scene.lights.spot_direction[idx]), [0.0, -1.0, 0.0],
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(r.scene.lights.spot_cos_angles[idx]), cos_before,
        rtol=1e-5,
    )


def test_env_and_post_edits(session):
    r = make_renderer(session)
    assert r.apply_edit({"type": "env", "exposure": 2.0})
    assert np.isclose(
        float(r.scene.lights.env_exposure_compensation), 4.0
    )
    # post edits are display-side: no reset
    assert not r.apply_edit({"type": "post", "exposure": 1.0})
    assert r.post.exposure == 1.0


def test_camera_edit(session):
    r = make_renderer(session)
    old = np.asarray(r.camera.view_matrix)
    assert r.apply_edit({"type": "camera", "distance": 3.0, "phi": 0.5})
    assert not np.allclose(old, np.asarray(r.camera.view_matrix))


def test_options_edit(session):
    r = make_renderer(session)
    assert r.apply_edit({"type": "options", "max_ray_depth": 3})
    assert r.options.max_ray_depth == 3


def test_options_panel_fields(session):
    """The renderUI options surface (``HeatrayRenderer.cpp:948-1599``):
    AOV picker (string -> enum), firefly clamp, sample mode, bokeh,
    interactive block — all editable through one options message."""
    from heatray_tpu.options import AOV

    r = make_renderer(session)
    assert r.apply_edit({
        "type": "options", "aov": "roughness", "max_channel_value": 5.0,
        "sample_mode": "halton", "bokeh_shape": "hexagon",
        "interactive_block": True,
    })
    assert r.options.aov == AOV.ROUGHNESS
    assert r.options.sample_mode == "halton"
    assert r.options.bokeh_shape == "hexagon"
    assert r.options.interactive_block
    assert r.max_channel_value == 5.0
    r.step()  # renders with the new static config
    assert np.isfinite(np.asarray(r.accum)).all()


def test_load_edit_swaps_scene_and_frames_camera(session, tmp_path):
    """Drag-drop loading (``main.cpp:58``): a ``load`` edit replaces the
    scene and auto-frames the orbit camera from the new AABB."""
    r = make_renderer(session)
    p = tmp_path / "tri.obj"
    # A triangle far from the origin: framing must move the orbit target.
    p.write_text("v 10 0 0\nv 11 0 0\nv 10 1 0\nf 1 2 3\n")
    env_before = int(r.scene.lights.env_enabled)

    assert r.apply_edit({"type": "load", "path": str(p)})
    assert int(r.scene.geometry.num_triangles) == 1
    assert np.asarray(r.orbit["target"])[0] > 9.0  # reframed at the mesh
    assert r.orbit["distance"] > 0.0
    # Environment survives a scene load (changeScene keeps the env light).
    assert int(r.scene.lights.env_enabled) == env_before


def test_viewer_upload_queues_load_edit(session):
    from heatray_tpu.viewer import ProgressiveViewer

    viewer = ProgressiveViewer(port=0).start()
    try:
        base = f"http://127.0.0.1:{viewer.port}"
        req = urllib.request.Request(
            f"{base}/upload",
            data=b"v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n",
            headers={"X-Filename": "drop me.obj"},
            method="POST",
        )
        resp = json.loads(urllib.request.urlopen(req, timeout=5).read())
        assert resp["queued"]
        edits = viewer.poll_edits()
        assert len(edits) == 1 and edits[0]["type"] == "load"
        assert edits[0]["path"].endswith("drop_me.obj")  # sanitized name
        with open(edits[0]["path"], "rb") as f:
            assert f.read().startswith(b"v 0 0 0")
    finally:
        viewer.stop()


def test_viewer_edit_queue_http(session):
    from heatray_tpu.viewer import ProgressiveViewer

    viewer = ProgressiveViewer(port=0).start()
    try:
        base = f"http://127.0.0.1:{viewer.port}"
        req = urllib.request.Request(
            f"{base}/edit",
            data=json.dumps({"type": "post", "exposure": 0.5}).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        resp = json.loads(urllib.request.urlopen(req, timeout=5).read())
        assert resp["queued"]
        viewer.set_scene_info({"materials": []})
        info = json.loads(
            urllib.request.urlopen(f"{base}/scene.json", timeout=5).read()
        )
        assert info == {"materials": []}

        edits = viewer.poll_edits()
        assert edits == [{"type": "post", "exposure": 0.5}]
        assert viewer.poll_edits() == []  # drained
    finally:
        viewer.stop()


def test_poll_and_apply_via_viewer(session):
    from heatray_tpu.viewer import ProgressiveViewer

    scene, camera, options = session
    viewer = ProgressiveViewer(port=0).start()
    try:
        r = InteractiveRenderer(scene, camera, options, viewer=viewer,
                                orbit=dict(distance=6.2, focal_length=35.0))
        r.step()
        assert r.pass_index == 1
        base = f"http://127.0.0.1:{viewer.port}"
        req = urllib.request.Request(
            f"{base}/edit",
            data=json.dumps(
                {"type": "material", "index": 0, "metallic": 1.0}
            ).encode(),
            method="POST",
        )
        urllib.request.urlopen(req, timeout=5).read()
        applied = r.poll_and_apply()
        assert applied == 1
        assert r.pass_index == 0  # transport edit reset accumulation
        assert np.isclose(float(r.scene.materials.metallic[0]), 1.0)
    finally:
        viewer.stop()
