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

import jax
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

    ``data`` is (4, A): RGBA planar, all textures (and their mip chains)
    flattened row-major and concatenated.  Descriptor arrays are indexed by
    texture id; a texture's level-l texel (x, y) lives at
    ``mip_offset[id, l] + y * mip_width[id, l] + x``.  ``offset/width/height``
    are level 0.  Textures whose chain is shorter than ``num_levels`` repeat
    their 1x1 tail level, so clamping an LOD to ``num_levels - 1`` is always
    safe.  The mip chains replace the reference's RL mipmapped samplers
    (``RLWrapper/Texture.h:51,86``, default RL_LINEAR_MIPMAP_LINEAR).
    """

    data: jnp.ndarray  # (4, A) f32
    offset: jnp.ndarray  # (N,) i32
    width: jnp.ndarray  # (N,) i32
    height: jnp.ndarray  # (N,) i32
    mip_offset: jnp.ndarray  # (N, L) i32
    mip_width: jnp.ndarray  # (N, L) i32
    mip_height: jnp.ndarray  # (N, L) i32

    @property
    def num_textures(self) -> int:
        return self.offset.shape[0]

    @property
    def num_levels(self) -> int:
        return self.mip_offset.shape[1]


def _downsample2x(img: np.ndarray) -> np.ndarray:
    """One mip level down: 2x2 box filter ((H, W, 4) -> (ceil(H/2),
    ceil(W/2), 4)); odd dimensions replicate their last row/column."""
    h, w, _ = img.shape
    if h & 1:
        img = np.concatenate([img, img[-1:]], axis=0)
    if w & 1:
        img = np.concatenate([img, img[:, -1:]], axis=1)
    h2, w2 = img.shape[0] // 2, img.shape[1] // 2
    return (
        img.reshape(h2, 2, w2, 2, 4).mean(axis=(1, 3)).astype(np.float32)
    )


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

    def build(self, mips: bool = True) -> TextureAtlas:
        images = self._images or [np.ones((1, 1, 4), np.float32)]  # stable dummy
        # Full mip chains down to 1x1 (``Texture.h:86`` generates mipmaps by
        # default); ~1/3 extra memory.
        chains = []
        for img in images:
            chain = [img]
            while mips and (chain[-1].shape[0] > 1 or chain[-1].shape[1] > 1):
                chain.append(_downsample2x(chain[-1]))
            chains.append(chain)
        num_levels = max(len(c) for c in chains)

        chunks = []
        mip_off = np.zeros((len(images), num_levels), np.int32)
        mip_w = np.zeros((len(images), num_levels), np.int32)
        mip_h = np.zeros((len(images), num_levels), np.int32)
        off = 0
        for i, chain in enumerate(chains):
            for lvl in range(num_levels):
                img = chain[min(lvl, len(chain) - 1)]
                h, w, _ = img.shape
                if lvl < len(chain):
                    chunks.append(img.reshape(h * w, 4))
                    mip_off[i, lvl] = off
                    off += h * w
                else:
                    # Short chain: alias the 1x1 tail level.
                    mip_off[i, lvl] = mip_off[i, len(chain) - 1]
                mip_w[i, lvl] = w
                mip_h[i, lvl] = h
        data = np.concatenate(chunks, axis=0).T  # (4, A)
        return TextureAtlas(
            data=jnp.asarray(np.ascontiguousarray(data)),
            offset=jnp.asarray(mip_off[:, 0]),
            width=jnp.asarray(mip_w[:, 0]),
            height=jnp.asarray(mip_h[:, 0]),
            mip_offset=jnp.asarray(mip_off),
            mip_width=jnp.asarray(mip_w),
            mip_height=jnp.asarray(mip_h),
        )


def _bilinear(atlas, base, w, h, u, v, num_channels):
    """Bilinear GL-REPEAT sample at one mip level (per-ray base/w/h)."""
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


def _mip_descr(atlas: TextureAtlas, tid, lvl):
    """Per-ray (base, w, h) of mip level ``lvl`` (both (R,) i32)."""
    flat = tid * atlas.num_levels + lvl
    return (
        jnp.take(atlas.mip_offset.reshape(-1), flat),
        jnp.take(atlas.mip_width.reshape(-1), flat),
        jnp.take(atlas.mip_height.reshape(-1), flat),
    )


def sample_atlas(
    atlas: TextureAtlas,
    tex_id: jnp.ndarray,
    u: jnp.ndarray,
    v: jnp.ndarray,
    num_channels: int = 4,
    footprint: jnp.ndarray | None = None,
):
    """Bilinear (or, with ``footprint``, trilinear) wrap-sample per-ray
    textures from the atlas.

    ``tex_id`` (R,) i32 (callers mask out id < 0 afterwards); ``u``/``v``
    (R,) f32 texture coordinates with GL-style wrap.  ``footprint`` (R,) is
    the ray-cone footprint in UV units: the sampled LOD is
    ``log2(footprint * texture_resolution)``, interpolated between the two
    straddling mip levels — the gather-based equivalent of the reference's
    trilinear samplers (``Texture.h:51`` RL_LINEAR_MIPMAP_LINEAR).  Returns
    ``num_channels`` flat (R,) arrays.

    The reference samples textures with OpenRL's texture units; here the
    four (eight trilinear) corners are explicit gathers into the flat atlas
    buffer.
    """
    tid = jnp.maximum(tex_id, 0)
    if footprint is None or atlas.num_levels <= 1:
        w = jnp.take(atlas.width, tid)
        h = jnp.take(atlas.height, tid)
        base = jnp.take(atlas.offset, tid)
        return _bilinear(atlas, base, w, h, u, v, num_channels)

    w0 = jnp.take(atlas.width, tid).astype(jnp.float32)
    h0 = jnp.take(atlas.height, tid).astype(jnp.float32)
    # Texels covered by the footprint at level 0 (isotropic approximation).
    texels = jnp.maximum(footprint, 1e-8) * jnp.sqrt(w0 * h0)
    lod = jnp.clip(
        jnp.log2(texels), 0.0, jnp.float32(atlas.num_levels - 1)
    )
    # Detach: the LOD choice is piecewise-constant scene structure, not a
    # differentiable quantity (matches detached hit/lobe decisions).
    lod = jax.lax.stop_gradient(lod)
    l0 = lod.astype(jnp.int32)
    l1 = jnp.minimum(l0 + 1, atlas.num_levels - 1)
    fl = lod - l0.astype(jnp.float32)

    b0, w0i, h0i = _mip_descr(atlas, tid, l0)
    b1, w1i, h1i = _mip_descr(atlas, tid, l1)
    lo = _bilinear(atlas, b0, w0i, h0i, u, v, num_channels)
    hi = _bilinear(atlas, b1, w1i, h1i, u, v, num_channels)
    return [a + (b - a) * fl for a, b in zip(lo, hi)]
