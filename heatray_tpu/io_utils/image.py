"""Image IO: save/load LDR (PNG via PIL) and HDR (float TIFF/EXR-style via
numpy ``.npy`` fallback), replacing the reference's FreeImage/stb stack
(``Utility/TextureLoader.cpp``, ``HeatrayRenderer::saveScreenshot``).

The renderer's row 0 is the image BOTTOM (OpenRL convention); files are
written top-row-first.
"""

from __future__ import annotations

import numpy as np


def _try_imageio():
    try:
        import imageio.v3 as iio

        return iio
    except Exception:
        return None


def save_ldr(path: str, image) -> None:
    """Save an sRGB [0,1] (H, W, 3) image (row 0 = bottom) as PNG/JPG."""
    img = np.asarray(image)
    img = np.clip(img, 0.0, 1.0)
    img8 = (img * 255.0 + 0.5).astype(np.uint8)[::-1]  # flip to top-first
    iio = _try_imageio()
    if iio is not None:
        iio.imwrite(path, img8)
        return
    from PIL import Image

    Image.fromarray(img8).save(path)


def save_hdr(path: str, image) -> None:
    """Save a linear float (H, W, 3/4) image (row 0 = bottom).

    ``.exr`` and ``.hdr`` use the built-in codecs (``io_utils.exr``/``hdr``);
    TIFF goes through imageio (the reference saves float TIFFs,
    ``HeatrayRenderer.cpp:1619-1660``); anything else falls back to ``.npy``.
    """
    img = np.asarray(image, dtype=np.float32)[::-1]
    low = path.lower()
    if low.endswith(".exr"):
        from .exr import write_exr

        write_exr(path, img[..., :3])
        return
    if low.endswith(".hdr"):
        from .hdr import write_hdr

        write_hdr(path, img[..., :3])
        return
    iio = _try_imageio()
    if iio is not None and (low.endswith(".tiff") or low.endswith(".tif")):
        iio.imwrite(path, img)
        return
    np.save(path if path.endswith(".npy") else path + ".npy", img)


def load_image(path: str, to_linear: bool = True) -> np.ndarray:
    """Load an image as linear float (H, W, C), row 0 = bottom.

    LDR files get sRGB->linear conversion like the reference's texture loader
    (``TextureLoader.cpp:106-133``); float formats (.exr/.hdr/float TIFF)
    load as-is (``TextureLoader.cpp:44-81``).
    """
    low = path.lower()
    if low.endswith(".npy"):
        return np.load(path)[::-1]
    if low.endswith(".exr"):
        from .exr import read_exr_rgb

        return read_exr_rgb(path)[::-1].copy()
    if low.endswith(".hdr"):
        from .hdr import read_hdr

        return read_hdr(path)[::-1].copy()
    iio = _try_imageio()
    if iio is not None:
        img = np.asarray(iio.imread(path))
    else:
        from PIL import Image

        img = np.asarray(Image.open(path))
    img = img[::-1]  # bottom-first
    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0
        if to_linear:
            a = 0.055
            img = np.where(
                img <= 0.04045, img / 12.92, ((img + a) / (1 + a)) ** 2.4
            ).astype(np.float32)
    elif img.dtype == np.uint16:
        img = (img.astype(np.float32) / 65535.0).astype(np.float32)
    else:
        img = img.astype(np.float32)
    return img
