"""Texture atlas: all scene textures in one flat planar buffer.

TPUs have no texture units and no pointer indirection; the TPU-native
equivalent of the reference's per-material OpenRL texture objects
(``RLWrapper/Texture.h``, bound per shader program) is a single packed
atlas — one flat (4, A) RGBA planar array plus per-texture descriptor rows —
sampled with gathers.  Every material slot stores a texture id (-1 = slot
unused), mirroring ``PhysicallyBasedMaterial::Parameters``'s seven texture
slots (``PhysicallyBasedMaterial.h:22-41``).

LDR color textures are converted sRGB->linear at build time like the
reference's texture loader (``Utility/TextureLoader.cpp:106-133``); data
textures (normals, metallic/roughness) stay linear.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import struct


def srgb_to_linear_np(srgb: np.ndarray) -> np.ndarray:
    a = 0.055
    return np.where(
        srgb <= 0.04045,
        srgb / 12.92,
        np.power(np.maximum((srgb + a) / (1.0 + a), 1e-10), 2.4),
    ).astype(np.float32)


@struct.dataclass
class TextureAtlas:
    """Packed texture data (a pytree).

    ``data`` is (4, A): RGBA planar, all textures flattened row-major and
    concatenated.  Descriptor arrays are indexed by texture id.  A texture's
    texel (x, y) lives at ``offset + y * width + x``.
    """

    data: jnp.ndarray  # (4, A) f32
    offset: jnp.ndarray  # (N,) i32
    width: jnp.ndarray  # (N,) i32
    height: jnp.ndarray  # (N,) i32

    @property
    def num_textures(self) -> int:
        return self.offset.shape[0]


class AtlasBuilder:
    """Host-side accumulation of texture images into one atlas."""

    def __init__(self):
        self._images: List[np.ndarray] = []
        self._keys = {}

    def add(self, image: np.ndarray, srgb: bool = False, key=None) -> int:
        """Add an (H, W), (H, W, 3) or (H, W, 4) float/uint8 image; returns
        its texture id.  ``srgb`` converts RGB channels to linear (LDR color
        textures).  ``key`` dedupes repeated adds of the same source."""
        if key is not None and key in self._keys:
            return self._keys[key]
        img = np.asarray(image)
        if img.dtype == np.uint8:
            img = img.astype(np.float32) / 255.0
        img = img.astype(np.float32)
        if img.ndim == 2:
            img = img[:, :, None]
        if img.shape[2] == 1:
            img = np.repeat(img, 3, axis=2)
        if img.shape[2] == 3:
            img = np.concatenate(
                [img, np.ones_like(img[:, :, :1])], axis=2
            )
        if srgb:
            img = np.concatenate(
                [srgb_to_linear_np(img[:, :, :3]), img[:, :, 3:]], axis=2
            )
        tex_id = len(self._images)
        self._images.append(img)
        if key is not None:
            self._keys[key] = tex_id
        return tex_id

    @property
    def num_textures(self) -> int:
        return len(self._images)

    def build(self) -> TextureAtlas:
        images = self._images or [np.ones((1, 1, 4), np.float32)]  # stable dummy
        offsets, widths, heights, chunks = [], [], [], []
        off = 0
        for img in images:
            h, w, _ = img.shape
            offsets.append(off)
            widths.append(w)
            heights.append(h)
            chunks.append(img.reshape(h * w, 4))
            off += h * w
        data = np.concatenate(chunks, axis=0).T  # (4, A)
        return TextureAtlas(
            data=jnp.asarray(np.ascontiguousarray(data)),
            offset=jnp.asarray(np.asarray(offsets, np.int32)),
            width=jnp.asarray(np.asarray(widths, np.int32)),
            height=jnp.asarray(np.asarray(heights, np.int32)),
        )


def sample_atlas(
    atlas: TextureAtlas,
    tex_id: jnp.ndarray,
    u: jnp.ndarray,
    v: jnp.ndarray,
    num_channels: int = 4,
):
    """Bilinear wrap-sample per-ray textures from the atlas.

    ``tex_id`` (R,) i32 (callers mask out id < 0 afterwards); ``u``/``v``
    (R,) f32 texture coordinates with GL-style wrap.  Returns
    ``num_channels`` flat (R,) arrays.

    The reference samples textures with OpenRL's texture units; here the
    four bilinear corners are explicit gathers into the flat atlas buffer.
    """
    tid = jnp.maximum(tex_id, 0)
    w = jnp.take(atlas.width, tid)
    h = jnp.take(atlas.height, tid)
    base = jnp.take(atlas.offset, tid)
    wf = w.astype(jnp.float32)
    hf = h.astype(jnp.float32)

    # GL REPEAT wrap: fractional part (matches the reference's default
    # sampler, ``Texture.h`` wrap mode RL_REPEAT).
    uu = u - jnp.floor(u)
    vv = v - jnp.floor(v)

    x = uu * wf - 0.5
    y = vv * hf - 0.5
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    fx = x - x0f
    fy = y - y0f
    x0 = jnp.remainder(x0f.astype(jnp.int32), w)
    y0 = jnp.remainder(y0f.astype(jnp.int32), h)
    x1 = jnp.remainder(x0 + 1, w)
    y1 = jnp.remainder(y0 + 1, h)

    i00 = base + y0 * w + x0
    i10 = base + y0 * w + x1
    i01 = base + y1 * w + x0
    i11 = base + y1 * w + x1

    out = []
    for ch in range(num_channels):
        plane = atlas.data[ch]
        # mode="clip": garbage uv on masked-dead lanes must not let the
        # default fill mode inject NaNs (they poison gradients via the
        # 0-cotangent x NaN trap even when the lane is masked out).
        c00 = jnp.take(plane, i00, mode="clip")
        c10 = jnp.take(plane, i10, mode="clip")
        c01 = jnp.take(plane, i01, mode="clip")
        c11 = jnp.take(plane, i11, mode="clip")
        top = c00 + (c10 - c00) * fx
        bot = c01 + (c11 - c01) * fx
        out.append(top + (bot - top) * fy)
    return out
