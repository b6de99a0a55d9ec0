"""Sequence visualization tests (``HeatrayRenderer.cpp:455-498``)."""

import numpy as np
import pytest

from heatray_tpu.sampling import qmc
from heatray_tpu.sampling.bokeh import BOKEH_SHAPES
from heatray_tpu.sampling.visualize import scatter_image, sequence_points


class TestSequencePoints:
    @pytest.mark.parametrize(
        "mode", ["sobol", "halton", "hammersley", "bluenoise", "random"]
    )
    def test_main_sequences_match_generators(self, mode):
        pts = sequence_points(sample_mode=mode, sequence_index=3, count=32)
        ref = np.asarray(qmc.GENERATORS[mode](32, 3), np.float32)
        np.testing.assert_array_equal(pts, ref)
        assert pts.shape == (32, 2)
        assert (pts >= 0.0).all() and (pts < 1.0).all()

    @pytest.mark.parametrize(
        "shape", ["circular", "pentagon", "hexagon", "octagon"]
    )
    def test_aperture_sequences(self, shape):
        pts = sequence_points(
            bokeh_shape=shape, sequence_index=1, count=64, aperture=True
        )
        ref = np.asarray(BOKEH_SHAPES[shape](64, 1), np.float32)
        np.testing.assert_array_equal(pts, ref)
        # Aperture distributions live in the unit disk/polygon: [-1, 1].
        assert np.abs(pts).max() <= 1.0 + 1e-6


class TestScatterImage:
    def test_marks_every_point(self):
        pts = np.array([[0.25, 0.25], [0.75, 0.75]], np.float32)
        img = scatter_image(pts, size=64, dot=0)
        assert img.shape == (64, 64, 3)
        ys, xs = np.nonzero(img[..., 0])
        assert len(ys) == 2
        # v grows upward: (0.25, 0.25) lands in the lower-left quadrant.
        # nonzero returns row-major (top row first) = the (0.75, 0.75) point.
        assert (xs == [48, 16]).all()
        assert (ys == [15, 47]).all()

    def test_aperture_rescale(self):
        pts = np.array([[0.0, 0.0]], np.float32)  # disk center
        img = scatter_image(pts, size=32, aperture=True, dot=0)
        ys, xs = np.nonzero(img[..., 0])
        assert xs[0] == 16 and ys[0] == 15


class TestCLISequenceVis:
    def test_writes_png(self, tmp_path):
        from heatray_tpu.cli import main

        out = tmp_path / "seq.png"
        rc = main(
            [
                "sequence-vis", "--sample-mode", "sobol", "--sequence", "2",
                "--count", "16", "--out", str(out),
            ]
        )
        assert rc == 0 and out.exists()
        from heatray_tpu.io_utils.image import load_image

        img = load_image(str(out))
        assert img.shape[0] == 256 and img.max() > 0.5
