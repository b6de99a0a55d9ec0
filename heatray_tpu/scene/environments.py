"""Built-in environment maps.

The reference ships binary lat-long maps under ``Resources/Environments/``
(``EnvironmentLight.cpp:36`` hardcodes that directory; the UI lists e.g.
``studio.hdr``).  Shipping binaries is pointless for a from-scratch build,
so the built-ins are procedural generators producing the same kind of
asset: linear (H, W, 3) lat-long float arrays, top row = +Y pole.

``get_environment("studio")`` is the drop-in for the reference's default
IBL workflow; generated maps are cached per (name, size).
"""

from __future__ import annotations

import math

import numpy as np

_CACHE: dict = {}


def _latlong_dirs(height: int, width: int):
    """Unit direction per texel of a lat-long map (top row = +Y)."""
    v = (np.arange(height, dtype=np.float32) + 0.5) / height  # 0 top
    u = (np.arange(width, dtype=np.float32) + 0.5) / width
    theta = v * math.pi  # polar from +Y
    phi = u * 2.0 * math.pi - math.pi
    st = np.sin(theta)[:, None]
    y = np.cos(theta)[:, None] * np.ones((1, width), np.float32)
    x = st * np.sin(phi)[None, :]
    z = st * -np.cos(phi)[None, :]
    return x, y, z


def _soft_box(x, y, z, center, half_angle, edge):
    """Smooth rectangular-ish highlight around a direction (a softbox)."""
    c = np.asarray(center, np.float32)
    c /= np.linalg.norm(c)
    d = x * c[0] + y * c[1] + z * c[2]
    t = (d - math.cos(half_angle)) / max(edge, 1e-4)
    return np.clip(t, 0.0, 1.0) ** 2


def studio(height: int = 256, width: int = 512) -> np.ndarray:
    """A neutral photo-studio lat-long map: graded grey dome, bright soft
    key/fill/rim boxes, and a dark floor.  Average radiance ~0.5 to match
    the reference's deliberate solid-color default
    (``EnvironmentLight.cpp:52-53``)."""
    x, y, z = _latlong_dirs(height, width)
    # Base dome: horizon 0.35 -> zenith 0.65; floor falls to 0.08.
    up = np.clip(y, 0.0, 1.0)
    down = np.clip(-y, 0.0, 1.0)
    base = 0.35 + 0.3 * up - 0.27 * down
    img = np.repeat(base[..., None], 3, axis=-1).astype(np.float32)
    # Key (warm, high left), fill (cool, right), rim (behind).
    key = _soft_box(x, y, z, (-0.5, 0.7, -0.4), 0.35, 0.1)
    fill = _soft_box(x, y, z, (0.7, 0.4, -0.3), 0.45, 0.15)
    rim = _soft_box(x, y, z, (0.1, 0.5, 0.85), 0.25, 0.08)
    img += key[..., None] * np.array([6.0, 5.6, 5.0], np.float32)
    img += fill[..., None] * np.array([1.6, 1.8, 2.2], np.float32)
    img += rim[..., None] * np.array([3.0, 3.0, 3.2], np.float32)
    return img.astype(np.float32)


def sunset(height: int = 256, width: int = 512) -> np.ndarray:
    """A warm gradient sky with a low sun disc (for DoF/glass demos)."""
    x, y, z = _latlong_dirs(height, width)
    up = np.clip(y, 0.0, 1.0)
    down = np.clip(-y, 0.0, 1.0)
    sky = (
        np.array([0.9, 0.5, 0.3], np.float32)[None, None] * (1.0 - up[..., None])
        + np.array([0.2, 0.35, 0.6], np.float32)[None, None] * up[..., None]
    )
    sky *= (1.0 - 0.9 * down[..., None]).astype(np.float32)
    sun = _soft_box(x, y, z, (0.3, 0.08, -0.95), 0.03, 0.01)
    sky += sun[..., None] * np.array([400.0, 280.0, 160.0], np.float32)
    return sky.astype(np.float32)


BUILTIN_ENVIRONMENTS = {"studio": studio, "sunset": sunset}


def get_environment(name: str, height: int = 256, width: int = 512) -> np.ndarray:
    """Built-in lat-long map by name (cached)."""
    key = (name, height, width)
    if key not in _CACHE:
        _CACHE[key] = BUILTIN_ENVIRONMENTS[name](height, width)
    return _CACHE[key]
