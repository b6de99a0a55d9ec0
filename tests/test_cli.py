"""CLI smoke tests (the headless surface replacing the reference GUI,
``main.cpp:79``).  Small sizes / few passes keep these fast on CPU."""

import json
import os

import numpy as np
import pytest

from heatray_tpu.cli import main


def test_render_builtin(tmp_path):
    out = str(tmp_path / "cornell.png")
    rc = main([
        "render", "--scene", "cornell-box", "--size", "32", "32",
        "--passes", "1", "--depth", "2", "--cpu", "--out", out,
    ])
    assert rc == 0
    assert os.path.exists(out)
    from heatray_tpu.io_utils.image import load_image

    img = load_image(out)
    assert img.shape[:2] == (32, 32)
    assert np.isfinite(img).all()


def test_render_session_file(tmp_path):
    """``render --scene foo.json`` must restore scene+camera+options
    (the ``load_session`` path, ``HeatrayRenderer.cpp:584-688``)."""
    from heatray_tpu.io_utils.session import Session

    session = Session()
    session.set("RenderOptions", "Scene", "cornell-box")
    session.set("RenderOptions", "MaxRenderPasses", 1)
    session.set("RenderOptions", "MaxRayDepth", 2)
    session.set("RenderOptions", "EnvironmentBuiltIn", False)
    session.set("Camera", "OrbitDistance", 5.0)
    spath = str(tmp_path / "s.json")
    session.write(spath)

    out = str(tmp_path / "fromsession.png")
    rc = main([
        "render", "--scene", spath, "--size", "16", "16",
        "--passes", "1", "--cpu", "--out", out,
    ])
    assert rc == 0
    assert os.path.exists(out)


def test_load_session_values(tmp_path):
    from heatray_tpu.io_utils.session import Session, load_session

    session = Session()
    session.set("RenderOptions", "Scene", "editable-pbr")
    session.set("RenderOptions", "MaxRayDepth", 3)
    session.set("RenderOptions", "SampleMode", 1)  # halton
    session.set("RenderOptions", "CameraFocalLength", 85.0)
    spath = str(tmp_path / "s.json")
    session.write(spath)

    scene, camera, options = load_session(spath, override_size=(24, 16))
    assert options.width == 24 and options.height == 16
    assert options.max_ray_depth == 3
    assert options.sample_mode == "halton"
    assert scene.geometry.num_triangles > 0
    assert float(camera.aspect) == pytest.approx(24 / 16)


def test_optimize_smoke(tmp_path):
    """End-to-end inverse-rendering CLI: render a target, then recover."""
    target = str(tmp_path / "target.npy")
    rc = main([
        "render", "--scene", "editable-pbr", "--size", "16", "16",
        "--passes", "1", "--depth", "2", "--cpu", "--out", target,
    ])
    assert rc == 0

    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main([
            "optimize", "--scene", "editable-pbr", "--size", "16", "16",
            "--depth", "2", "--cpu", "--target", target,
            "--steps", "2", "--passes-per-step", "1",
        ])
    assert rc == 0
    params = json.loads(buf.getvalue())
    assert "base_color" in params and "roughness" in params
