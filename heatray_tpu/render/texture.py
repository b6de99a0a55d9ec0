"""Texture sampling as gathers (TPUs have no texture units).

Bilinear 2D sampling with wrap/clamp addressing, used for the environment
map, the multiscatter LUT, and (later) material textures.
"""

from __future__ import annotations

import jax.numpy as jnp


def sample_bilinear(image: jnp.ndarray, u, v, wrap_u: bool = False, wrap_v: bool = False):
    """Bilinear sample of ``image`` (H, W, C) at texture coords (u, v) in
    [0, 1] (v = 0 is row 0).  u/v broadcast over any leading shape; returns
    (..., C)."""
    h, w = image.shape[0], image.shape[1]
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
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

    flat = image.reshape(h * w, -1)

    def tex(yy, xx):
        return jnp.take(flat, yy * w + xx, axis=0)

    c00 = tex(y0, x0)
    c10 = tex(y0, x1)
    c01 = tex(y1, x0)
    c11 = tex(y1, x1)
    top = c00 + (c10 - c00) * fx
    bot = c01 + (c11 - c01) * fx
    return top + (bot - top) * fy


def sample_nearest(image: jnp.ndarray, u, v):
    h, w = image.shape[0], image.shape[1]
    x = jnp.clip((u * w).astype(jnp.int32), 0, w - 1)
    y = jnp.clip((v * h).astype(jnp.int32), 0, h - 1)
    return jnp.take(image.reshape(h * w, -1), y * w + x, axis=0)
