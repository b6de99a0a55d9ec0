"""Float image IO: the built-in EXR + Radiance HDR codecs, their wiring
through io_utils.image, and the procedural built-in environments."""

import numpy as np
import pytest

from heatray_tpu.io_utils.exr import read_exr, read_exr_rgb, write_exr
from heatray_tpu.io_utils.hdr import (
    _float_to_rgbe,
    _rgbe_to_float,
    read_hdr,
    write_hdr,
)
from heatray_tpu.io_utils.image import load_image, save_hdr


@pytest.fixture
def hdr_image():
    rng = np.random.default_rng(0)
    img = rng.uniform(0.0, 1.0, (24, 33, 3)).astype(np.float32)
    img[::3] *= 40.0  # HDR highlights
    img[5, 7] = 0.0  # exact black
    return img


class TestEXR:
    def test_roundtrip_float(self, tmp_path, hdr_image):
        p = str(tmp_path / "t.exr")
        write_exr(p, hdr_image, half=False)
        back, names = read_exr(p)
        assert names == ["B", "G", "R"]
        np.testing.assert_allclose(read_exr_rgb(p), hdr_image, rtol=1e-6)

    def test_roundtrip_half(self, tmp_path, hdr_image):
        p = str(tmp_path / "t.exr")
        write_exr(p, hdr_image, half=True)
        back = read_exr_rgb(p)
        np.testing.assert_allclose(back, hdr_image, rtol=1e-2, atol=1e-4)

    def test_tall_image_multiple_zip_blocks(self, tmp_path):
        rng = np.random.default_rng(1)
        img = rng.uniform(0, 8, (40, 8, 3)).astype(np.float32)  # 3 blocks
        p = str(tmp_path / "t.exr")
        write_exr(p, img, half=False)
        np.testing.assert_allclose(read_exr_rgb(p), img, rtol=1e-6)

    def test_rejects_non_exr(self, tmp_path):
        p = str(tmp_path / "bad.exr")
        with open(p, "wb") as f:
            f.write(b"not an exr file at all")
        with pytest.raises(ValueError):
            read_exr(p)


class TestHDR:
    def test_rgbe_codec_identities(self):
        rng = np.random.default_rng(2)
        rgb = rng.uniform(0, 100, (64, 3)).astype(np.float32)
        back = _rgbe_to_float(_float_to_rgbe(rgb))
        # RGBE quantizes relative to the MAX component (shared exponent):
        # error bound is maxc/256 per channel.
        bound = rgb.max(axis=1, keepdims=True) / 256.0 + 1e-5
        assert (np.abs(back - rgb) <= bound).all()
        # Known value: (1, 0.5, 0.25) -> exponent for max=1.0 is 129.
        one = _float_to_rgbe(np.array([[1.0, 0.5, 0.25]], np.float32))
        assert one[0, 3] == 129

    def test_roundtrip(self, tmp_path, hdr_image):
        p = str(tmp_path / "t.hdr")
        write_hdr(p, hdr_image)
        back = read_hdr(p)
        bound = hdr_image.max(axis=-1, keepdims=True) / 256.0 + 1e-5
        assert (np.abs(back - hdr_image) <= bound).all()

    def test_reads_rle_scanlines(self, tmp_path):
        """Hand-encode an adaptive-RLE file and check the decoder."""
        w, h = 16, 2
        rgbe = np.zeros((h, w, 4), np.uint8)
        rgbe[..., 0] = 10
        rgbe[0, :, 1] = np.arange(w)
        rgbe[..., 3] = 129
        payload = b""
        for y in range(h):
            payload += bytes([2, 2, w >> 8, w & 0xFF])
            for c in range(4):
                col = rgbe[y, :, c]
                if (col == col[0]).all():
                    payload += bytes([128 + w, int(col[0])])  # one run
                else:
                    payload += bytes([w]) + col.tobytes()  # literal
        p = str(tmp_path / "rle.hdr")
        with open(p, "wb") as f:
            f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
            f.write(f"-Y {h} +X {w}\n".encode())
            f.write(payload)
        img = read_hdr(p)
        expect = _rgbe_to_float(rgbe)
        np.testing.assert_allclose(img, expect, rtol=1e-6)


class TestImageWiring:
    def test_save_load_exr_bottom_first(self, tmp_path, hdr_image):
        p = str(tmp_path / "img.exr")
        save_hdr(p, hdr_image)  # save_hdr takes bottom-first
        back = load_image(p)  # load_image returns bottom-first
        np.testing.assert_allclose(back, hdr_image, rtol=1e-2, atol=1e-4)

    def test_save_load_hdr(self, tmp_path, hdr_image):
        p = str(tmp_path / "img.hdr")
        save_hdr(p, hdr_image)
        back = load_image(p)
        bound = hdr_image.max(axis=-1, keepdims=True) / 256.0 + 1e-5
        assert (np.abs(back - hdr_image) <= bound).all()


class TestBuiltinEnvironments:
    def test_studio_renders_sane(self):
        import jax.numpy as jnp

        from heatray_tpu.render.envmap import env_radiance
        from heatray_tpu.render.onb import luminosity
        from heatray_tpu.scene.environments import get_environment
        from heatray_tpu.scene.lights import (
            EnvironmentLightDesc,
            build_light_bank,
        )
        from heatray_tpu.vec import Vec3

        img = get_environment("studio")
        assert img.shape == (256, 512, 3) and np.isfinite(img).all()
        assert img.min() >= 0.0
        bank = build_light_bank([], [], [], EnvironmentLightDesc(image=img))
        up = Vec3(jnp.zeros(1), jnp.ones(1), jnp.zeros(1))
        down = Vec3(jnp.zeros(1), -jnp.ones(1), jnp.zeros(1))
        # Sky up is brighter than the floor.
        assert float(luminosity(env_radiance(bank, up))[0]) > float(
            luminosity(env_radiance(bank, down))[0]
        )

    def test_cached(self):
        from heatray_tpu.scene.environments import get_environment

        assert get_environment("sunset") is get_environment("sunset")

    def test_all_builtins_valid(self):
        import numpy as np

        from heatray_tpu.scene.environments import (
            BUILTIN_ENVIRONMENTS,
            get_environment,
        )

        assert set(BUILTIN_ENVIRONMENTS) == {
            "studio", "sunset", "daylight", "night",
        }
        for name in BUILTIN_ENVIRONMENTS:
            img = get_environment(name)
            assert img.shape == (256, 512, 3), name
            assert np.isfinite(img).all() and img.min() >= 0.0, name
            assert img.max() > 0.0, name
