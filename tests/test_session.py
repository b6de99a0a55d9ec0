"""Session (settings checkpoint) tests — JSON port of ``Session.{h,cpp}``'s
~45-variable table, plus the accumulation-state checkpoint the reference
lacks (SURVEY section 5 checkpoint/resume)."""

import numpy as np
import pytest

from heatray_tpu.io_utils.session import (
    SESSION_VARIABLES,
    Session,
    load_render_state,
    save_render_state,
)


class TestSessionVariables:
    def test_table_covers_reference_groups(self):
        groups = {g for g, *_ in SESSION_VARIABLES}
        assert groups == {"RenderOptions", "Camera", "Scene", "PostProcessing"}
        assert len(SESSION_VARIABLES) >= 45  # reference has ~45 variables

    def test_defaults_and_set(self):
        s = Session()
        assert s.get("RenderOptions", "MaxRenderPasses") == 32
        s.set("RenderOptions", "MaxRenderPasses", "64")  # coerced to int
        assert s.get("RenderOptions", "MaxRenderPasses") == 64
        with pytest.raises(KeyError):
            s.set("RenderOptions", "NotAVariable", 1)

    def test_roundtrip(self, tmp_path):
        s = Session()
        s.set("Camera", "OrbitDistance", 7.5)
        s.set("PostProcessing", "TonemapEnable", True)
        s.set("RenderOptions", "SampleMode", 1)  # halton
        p = tmp_path / "session.json"
        s.write(str(p))
        s2 = Session.parse(str(p))
        assert s2.get("Camera", "OrbitDistance") == 7.5
        assert s2.get("PostProcessing", "TonemapEnable") is True
        assert s2.values == s.values

    def test_conversions(self):
        s = Session()
        s.set("RenderOptions", "MaxRayDepth", 5)
        s.set("RenderOptions", "CameraFStop", 2.0)
        s.set("RenderOptions", "CameraFocalLength", 50.0)
        opts = s.to_render_options(64, 32)
        assert opts.width == 64 and opts.max_ray_depth == 5
        cam = s.to_camera(64, 32)
        # fstop 2.0, focal 50mm -> aperture radius 25mm = 0.025m
        assert np.isclose(float(cam.aperture_radius), 0.025)
        post = s.to_post_params()
        assert post.contrast == 1.0


class TestRenderStateCheckpoint:
    def test_accum_roundtrip(self, tmp_path):
        accum = np.random.default_rng(0).random((4, 8, 8)).astype(np.float32)
        s = Session()
        s.set("RenderOptions", "MaxRenderPasses", 100)
        p = str(tmp_path / "state.npz")
        save_render_state(p, accum, next_pass=17, session=s)
        accum2, next_pass, s2 = load_render_state(p)
        assert np.array_equal(accum2, accum)
        assert next_pass == 17
        assert s2.get("RenderOptions", "MaxRenderPasses") == 100
