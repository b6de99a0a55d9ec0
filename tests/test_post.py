"""Display post-pipeline tests (``displayGL.frag`` port)."""

import numpy as np
import jax.numpy as jnp

from heatray_tpu.post import PostProcessingParams, apply_post_pipeline
from heatray_tpu.post.pipeline import aces_tonemap, hsv_to_rgb, rgb_to_hsv
from heatray_tpu.render.onb import linear_to_srgb, srgb_to_linear


def _accum(img_hwc, passes=2.0):
    """(H, W, 3) linear image -> planar (4, H, W) accumulation buffer."""
    img = np.asarray(img_hwc, np.float32) * passes
    h, w, _ = img.shape
    return jnp.asarray(
        np.concatenate(
            [img.transpose(2, 0, 1), np.full((1, h, w), passes, np.float32)]
        )
    )


class TestSrgb:
    def test_roundtrip(self):
        x = np.linspace(0.0, 1.0, 64, dtype=np.float32)
        y = np.asarray(srgb_to_linear(linear_to_srgb(jnp.asarray(x))))
        assert np.allclose(y, x, atol=1e-5)


class TestHSV:
    def test_roundtrip(self):
        rng = np.random.default_rng(0)
        c = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
        back = np.asarray(hsv_to_rgb(rgb_to_hsv(jnp.asarray(c))))
        assert np.allclose(back, c, atol=1e-4)


class TestACES:
    def test_monotone_and_bounded(self):
        x = jnp.linspace(0.0, 8.0, 128)[:, None] * jnp.ones((1, 3))
        y = np.asarray(aces_tonemap(x))
        assert y.min() >= -1e-6 and y.max() <= 1.0 + 1e-6
        lum = y.mean(axis=-1)
        assert np.all(np.diff(lum) >= -1e-4)  # monotone non-decreasing


class TestPipeline:
    def test_defaults_are_srgb_resolve(self):
        """With default params the pipeline is resolve + linear->sRGB."""
        rng = np.random.default_rng(1)
        img = rng.uniform(0, 1, (8, 8, 3)).astype(np.float32)
        out = np.asarray(apply_post_pipeline(_accum(img, passes=3.0)))
        expected = np.asarray(linear_to_srgb(jnp.asarray(img)))
        assert out.shape == (8, 8, 3)
        assert np.allclose(out, expected, atol=1e-4)

    def test_exposure_doubles(self):
        img = np.full((4, 4, 3), 0.1, np.float32)
        p0 = apply_post_pipeline(_accum(img))
        p1 = apply_post_pipeline(_accum(img), PostProcessingParams(exposure=1.0))
        lin0 = np.asarray(srgb_to_linear(p0))
        lin1 = np.asarray(srgb_to_linear(p1))
        assert np.allclose(lin1, 2.0 * lin0, rtol=1e-3)

    def test_tonemap_runs(self):
        img = np.full((4, 4, 3), 1.5, np.float32)
        out = np.asarray(
            apply_post_pipeline(
                _accum(img), PostProcessingParams(tonemapping_enabled=True)
            )
        )
        assert np.isfinite(out).all() and out.max() <= 1.0
