"""Display post-processing pipeline.

Exact jnp port of the reference's GLSL display shader
(``Resources/shaders/displayGL.frag:74-151``): pass-count resolve, ACES
filmic tonemap (Stephen Hill's fitted RRT+ODT), brightness/contrast,
hue/saturation/vibrance in HSV, RGB gains, vignette, exposure, and the final
linear->sRGB encode.  Fully differentiable (usable inside inverse-rendering
losses).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..render.onb import linear_to_srgb

# ACES matrices (``displayGL.frag:29-39``; note the GLSL mat3 constructor is
# column-major, so these are the transposes of the listed rows).
ACES_INPUT = jnp.array(
    [
        [0.59719, 0.35458, 0.04823],
        [0.07600, 0.90834, 0.01566],
        [0.02840, 0.13383, 0.83777],
    ]
)
ACES_OUTPUT = jnp.array(
    [
        [1.60475, -0.53108, -0.07367],
        [-0.10208, 1.10813, -0.00605],
        [-0.00327, -0.07276, 1.07602],
    ]
)


@dataclasses.dataclass(frozen=True)
class PostProcessingParams:
    """``HeatrayRenderer.h:104-117`` defaults."""

    tonemapping_enabled: bool = False
    exposure: float = 0.0  # EV; scale = 2^exposure
    brightness: float = 0.0
    contrast: float = 1.0
    hue: float = 1.0
    saturation: float = 1.0
    vibrance: float = 0.0
    red: float = 1.0
    green: float = 1.0
    blue: float = 1.0
    vignette_intensity: float = 0.0
    vignette_falloff: float = 1.0


def rrt_and_odt_fit(v):
    """``displayGL.frag:41-46``."""
    a = v * (v + 0.0245786) - 0.000090537
    b = v * (0.983729 * v + 0.4329510) + 0.238081
    return a / b


def aces_tonemap(color):
    """Full fitted ACES chain incl. the reference's (idiosyncratic)
    sRGB-encode-before / sRGB-decode-after wrapping (``displayGL.frag:82-90``)."""
    c = linear_to_srgb(color)
    c = c @ ACES_INPUT.T
    c = rrt_and_odt_fit(c)
    c = c @ ACES_OUTPUT.T
    c = jnp.clip(c, 0.0, 1.0)
    from ..render.onb import srgb_to_linear

    return srgb_to_linear(c)


def rgb_to_hsv(c):
    """GLSL branchless RGB->HSV (``displayGL.frag:101-111``)."""
    r, g, b = c[..., 0], c[..., 1], c[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    d = maxc - minc
    e = 1.0e-10
    # Hue via the piecewise formula the GLSL mix/step trick computes.
    hr = jnp.mod((g - b) / (6.0 * d + e), 1.0)
    hg = ((b - r) / (6.0 * d + e)) + 1.0 / 3.0
    hb = ((r - g) / (6.0 * d + e)) + 2.0 / 3.0
    h = jnp.where(maxc == r, hr, jnp.where(maxc == g, hg, hb))
    h = jnp.abs(h)
    s = d / (maxc + e)
    return jnp.stack([h, s, maxc], axis=-1)


def hsv_to_rgb(hsv):
    """GLSL HSV->RGB (``displayGL.frag:122-127``)."""
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    k = jnp.array([1.0, 2.0 / 3.0, 1.0 / 3.0])
    p = jnp.abs(jnp.mod(h[..., None] + k, 1.0) * 6.0 - 3.0)
    rgb = v[..., None] * (
        1.0 + s[..., None] * (jnp.clip(p - 1.0, 0.0, 1.0) - 1.0)
    )
    return rgb


def glsl_smoothstep(e0, e1, x):
    t = jnp.clip((x - e0) / jnp.where(jnp.abs(e1 - e0) > 1e-12, e1 - e0, 1e-12), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def apply_post_pipeline(
    accum: jnp.ndarray, params: PostProcessingParams | None = None
) -> jnp.ndarray:
    """Planar (4, H, W) accumulation buffer -> (H, W, 3) sRGB display image
    in [0, 1], row 0 = image bottom (flip on save)."""
    if params is None:
        params = PostProcessingParams()
    h, w = accum.shape[1], accum.shape[2]
    color = jnp.transpose(
        accum[:3] / jnp.maximum(accum[3:], 1e-10), (1, 2, 0)
    )

    if params.tonemapping_enabled:
        color = aces_tonemap(color)

    # Brightness / contrast (``displayGL.frag:96``).
    color = (color - 0.5) * params.contrast + 0.5 + params.brightness

    # Hue / saturation / vibrance (``displayGL.frag:100-128``).
    hsv = rgb_to_hsv(color)
    hue = hsv[..., 0] * params.hue
    sat = hsv[..., 1] * params.saturation
    mapped = jnp.sqrt(jnp.maximum(sat, 0.0)) * params.vibrance
    sat = sat * (1.0 + mapped)
    color = hsv_to_rgb(jnp.stack([hue, sat, hsv[..., 2]], axis=-1))

    # RGB gains (``displayGL.frag:131-135``).
    color = color * jnp.array([params.red, params.green, params.blue])

    # Vignette — including the reference's quirky ``+ blue`` term
    # (``displayGL.frag:138-142``), reproduced for parity.
    ys, xs = jnp.meshgrid(
        (jnp.arange(h) + 0.5) / h, (jnp.arange(w) + 0.5) / w, indexing="ij"
    )
    dist = jnp.sqrt((0.5 - xs) ** 2 + (0.5 - ys) ** 2)
    vig = glsl_smoothstep(
        0.8,
        params.vignette_falloff * 0.799,
        dist * (params.vignette_intensity + params.blue),
    )
    color = color * vig[..., None]

    # Exposure compensation then sRGB encode (``displayGL.frag:145-148``).
    color = color * (2.0 ** params.exposure)
    return jnp.clip(linear_to_srgb(jnp.maximum(color, 0.0)), 0.0, 1.0)
