"""Utility layer tests: logging ring buffer, timers, camera framing."""

import numpy as np

from heatray_tpu.utils import (
    RenderTimers,
    Timer,
    frame_scene,
    get_logger,
    install_ring_buffer_handler,
)


class TestLog:
    def test_ring_buffer(self, tmp_path):
        handler = install_ring_buffer_handler(capacity=4)
        log = get_logger("test")
        log.warning("w1")
        log.error("e1")
        for i in range(10):
            log.warning("spam %d", i)
        warns = handler.lines("WARNING")
        assert len(warns) == 4  # capacity bound
        assert "spam 9" in warns[-1]
        assert any("e1" in l for l in handler.lines("ERROR"))
        p = tmp_path / "log.txt"
        handler.dump(str(p))
        assert "e1" in p.read_text()
        get_logger().removeHandler(handler)


class TestTimer:
    def test_start_stop(self):
        t = Timer(start_now=True)
        assert t.stop() >= 0.0

    def test_render_timers(self):
        rt = RenderTimers()
        rt.record_pass(0.5)
        rt.record_pass(1.5)
        s = rt.summary()
        assert s["passes"] == 2
        assert np.isclose(s["mean_pass_s"], 1.0)


class TestFraming:
    def test_frame_scene(self):
        aabb = np.array([[-1.0, -2.0, -3.0], [1.0, 2.0, 3.0]])
        cam = frame_scene(aabb, 64, 64)
        # Distance = 3 * bounding radius; camera at target + z*distance.
        radius = np.linalg.norm(aabb[1] - aabb[0]) * 0.5
        pos = np.asarray(cam.view_matrix)[:3, 3]
        assert np.allclose(pos, [0.0, 0.0, 3.0 * radius], atol=1e-5)
        assert np.isclose(float(cam.focus_distance), 3.0 * radius)
