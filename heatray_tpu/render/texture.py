"""Texture sampling as gathers (TPUs have no texture units).

Planar layout: an image is stored channel-major ``(C, H, W)`` so the four
bilinear corner gathers are per-channel gathers of flat (R,) index arrays —
no (R, C) intermediates (which would pad their last dim to 128 lanes).
"""

from __future__ import annotations

import jax.numpy as jnp


def _corner_indices(h, w, u, v, wrap_u, wrap_v):
    x = u * w - 0.5
    y = v * h - 0.5
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    fx = x - x0f
    fy = y - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    x1 = x0 + 1
    y1 = y0 + 1
    if wrap_u:
        x0 = jnp.remainder(x0, w)
        x1 = jnp.remainder(x1, w)
    else:
        x0 = jnp.clip(x0, 0, w - 1)
        x1 = jnp.clip(x1, 0, w - 1)
    if wrap_v:
        y0 = jnp.remainder(y0, h)
        y1 = jnp.remainder(y1, h)
    else:
        y0 = jnp.clip(y0, 0, h - 1)
        y1 = jnp.clip(y1, 0, h - 1)
    return x0, x1, y0, y1, fx, fy


def sample_bilinear_planar(image: jnp.ndarray, u, v, wrap_u=False, wrap_v=False):
    """Bilinear sample of a planar ``(C, H, W)`` image at (u, v) in [0, 1]
    (v = 0 is row 0).  u/v are arrays of any matching shape; returns a list
    of C arrays of that shape."""
    c, h, w = image.shape
    x0, x1, y0, y1, fx, fy = _corner_indices(h, w, u, v, wrap_u, wrap_v)
    flat = image.reshape(c, h * w)
    i00 = y0 * w + x0
    i10 = y0 * w + x1
    i01 = y1 * w + x0
    i11 = y1 * w + x1
    out = []
    for ch in range(c):
        f = flat[ch]
        c00 = jnp.take(f, i00, mode="clip")
        c10 = jnp.take(f, i10, mode="clip")
        c01 = jnp.take(f, i01, mode="clip")
        c11 = jnp.take(f, i11, mode="clip")
        top = c00 + (c10 - c00) * fx
        bot = c01 + (c11 - c01) * fx
        out.append(top + (bot - top) * fy)
    return out


def sample_bilinear_scalar(image: jnp.ndarray, u, v, wrap_u=False, wrap_v=False):
    """Bilinear sample of a single-channel ``(H, W)`` image."""
    return sample_bilinear_planar(image[None], u, v, wrap_u, wrap_v)[0]


def sample_nearest_planar(image: jnp.ndarray, u, v):
    c, h, w = image.shape
    x = jnp.clip((u * w).astype(jnp.int32), 0, w - 1)
    y = jnp.clip((v * h).astype(jnp.int32), 0, h - 1)
    flat = image.reshape(c, h * w)
    idx = y * w + x
    return [jnp.take(flat[ch], idx) for ch in range(c)]
