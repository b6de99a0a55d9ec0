"""Progressive viewer tests: PNG encoder round-trip, HTTP endpoints, and
the render --preview CLI path."""

import json
import urllib.request

import numpy as np

from heatray_tpu.viewer import ProgressiveViewer, encode_png


def test_png_roundtrip():
    from PIL import Image
    import io

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (13, 7, 3), dtype=np.uint8)
    png = encode_png(img)
    decoded = np.asarray(Image.open(io.BytesIO(png)).convert("RGB"))
    np.testing.assert_array_equal(decoded, img)


def test_http_endpoints():
    viewer = ProgressiveViewer(port=0).start()
    try:
        img = np.full((4, 6, 3), 128, np.uint8)
        viewer.update(img, passes_done=3, total_passes=8)
        base = f"http://127.0.0.1:{viewer.port}"
        status = json.loads(
            urllib.request.urlopen(f"{base}/status.json", timeout=5).read()
        )
        assert status["passes_done"] == 3
        assert status["total_passes"] == 8
        assert status["width"] == 6 and status["height"] == 4
        png = urllib.request.urlopen(f"{base}/frame.png", timeout=5).read()
        assert png.startswith(b"\x89PNG")
        page = urllib.request.urlopen(base, timeout=5).read()
        assert b"heatray_tpu" in page
    finally:
        viewer.stop()


def test_cli_render_preview(tmp_path):
    from heatray_tpu.cli import main

    out = tmp_path / "out.png"
    rc = main([
        "render", "--scene", "cornell-box", "--size", "24", "24",
        "--passes", "2", "--depth", "2", "--cpu",
        "--preview", "0", "--out", str(out),
    ])
    assert rc == 0
    assert out.exists()
