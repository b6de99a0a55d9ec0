"""GGX multiscattering energy-compensation LUT.

Port of the reference's offline Monte Carlo tool
(``Source/HeatrayRenderer/Materials/MultiScatterUtil.cpp:91-139``): a 128x128
table over (NdotV, roughness) of GGX directional albedo sampled with 4096
Owen-scrambled Sobol points, stored as (1 - E) / E so the shader computes
``f_ms = 1 + Cspec * LUT`` (``microfacet.rlsl:17-23``).

Generated vectorized in numpy at import-cost time (no FreeImage TIFF cache;
regeneration takes well under a second) and cached in-process.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from ..sampling import qmc
from .texture import sample_bilinear_scalar

LUT_SIZE = 128
SAMPLE_COUNT = 4096


def _g1_smith_ggx(n_dot_i, alpha):
    a2 = alpha * alpha
    denom = np.sqrt(a2 + (1.0 - a2) * n_dot_i * n_dot_i) + n_dot_i
    return (2.0 * n_dot_i) / np.maximum(denom, 1e-5)


def _importance_sample_ggx(rand, alpha):
    """NDF-proportional half vectors (Z-up), ``MultiScatterUtil.cpp:34-47``."""
    a2 = alpha * alpha
    cos_theta = np.sqrt(
        np.maximum(0.0, (1.0 - rand[:, 0]) / ((a2 - 1.0) * rand[:, 0] + 1.0))
    )
    sin_theta = np.sqrt(np.maximum(0.0, 1.0 - cos_theta * cos_theta))
    phi = 2.0 * np.pi * rand[:, 1]
    h = np.stack(
        [sin_theta * np.cos(phi), sin_theta * np.sin(phi), cos_theta], axis=-1
    )
    return h / np.maximum(np.linalg.norm(h, axis=-1, keepdims=True), 1e-20)


@functools.lru_cache(maxsize=1)
def generate_multiscatter_lut() -> np.ndarray:
    """(LUT_SIZE, LUT_SIZE) float32: rows = roughness, cols = NdotV, value =
    (1 - E) / E (``MultiScatterUtil.cpp:91-139``)."""
    rand = qmc.sobol(SAMPLE_COUNT, 0).astype(np.float64)

    grid = (np.arange(LUT_SIZE, dtype=np.float64) + 0.5) / LUT_SIZE
    n_dot_v = grid  # (C,)
    v = np.stack(
        [np.sqrt(np.maximum(0.0, 1.0 - n_dot_v**2)), np.zeros_like(n_dot_v), n_dot_v],
        axis=-1,
    )  # (C, 3)
    lut = np.empty((LUT_SIZE, LUT_SIZE), np.float64)
    for row, roughness in enumerate(grid):
        alpha = roughness * roughness
        h = _importance_sample_ggx(rand, alpha)  # (S, 3)
        v_dot_h = h @ v.T  # (S, C)
        # Reflect V about H: L = 2 (V.H) H - V, per column.
        l_z = 2.0 * v_dot_h * h[:, 2:3] - v[:, 2][None, :]
        n_dot_l = np.clip(l_z, 0.0, 1.0)
        vdh = np.clip(v_dot_h, 0.0, 1.0)
        ndh = np.clip(h[:, 2], 0.0, 1.0)[:, None]
        g2 = _g1_smith_ggx(n_dot_l, alpha) * _g1_smith_ggx(n_dot_v[None, :], alpha)
        contrib = np.where(
            l_z > 0.0,
            (g2 * vdh) / np.maximum(n_dot_v[None, :] * ndh, 1e-12),
            0.0,
        )
        e = contrib.mean(axis=0)  # (C,)
        lut[row] = (1.0 - e) / np.maximum(e, 1e-6)
    return lut.astype(np.float32)


def multiscatter_lut_jnp() -> jnp.ndarray:
    """(LUT_SIZE, LUT_SIZE) device array (rows=roughness, cols=NdotV)."""
    return jnp.asarray(generate_multiscatter_lut())


@functools.lru_cache(maxsize=1)
def _packed_lut_np() -> np.ndarray:
    """Bilinear-corner-packed LUT: row (y0+1)*(L+1) + (x0+1) holds the four
    clamped corner texels [c00, c10, c01, c11] of cell (x0, y0), so one ROW
    gather replaces four scattered texel gathers (TPU gathers pay per fetch,
    not per byte).  Exactly reproduces ``texture.sample_bilinear_scalar``'s
    clamped corner indexing."""
    lut = generate_multiscatter_lut()
    pad = np.pad(lut, 1, mode="edge")  # pad[a, b] = lut[clip(a-1), clip(b-1)]
    lp1 = LUT_SIZE + 1
    rows = np.empty((lp1 * lp1, 4), np.float32)
    rows[:, 0] = pad[:lp1, :lp1].reshape(-1)      # c00 = [y0,   x0  ]
    rows[:, 1] = pad[:lp1, 1:].reshape(-1)        # c10 = [y0,   x0+1]
    rows[:, 2] = pad[1:, :lp1].reshape(-1)        # c01 = [y0+1, x0  ]
    rows[:, 3] = pad[1:, 1:].reshape(-1)          # c11 = [y0+1, x0+1]
    return rows


def multiscatter_lut_packed() -> jnp.ndarray:
    """((L+1)^2, 4) corner-packed LUT for ``compute_multiscattering``."""
    return jnp.asarray(_packed_lut_np())


FIT_DEGREE = 16


@functools.lru_cache(maxsize=1)
def _fit_coeffs_np() -> np.ndarray:
    """(D+1, D+1) Chebyshev-product coefficients of the directional albedo
    E(roughness, NdotV) = 1 / (1 + LUT), least-squares fit over the LUT
    grid weighted by dval/dE = 1/E^2 so the fit equalizes error in VAL
    space.  E is smooth (range ~[0.31, 1]) where the raw (1-E)/E surface
    has a flat-zero region meeting a steep ridge, so fitting E and mapping
    back converges ~4x faster in max error.  Row index = roughness degree,
    column = NdotV degree."""
    from numpy.polynomial import chebyshev as cheb

    lut = generate_multiscatter_lut().astype(np.float64)
    e = 1.0 / (1.0 + np.maximum(lut, 0.0))
    grid = (np.arange(LUT_SIZE, dtype=np.float64) + 0.5) / LUT_SIZE
    xs = 2.0 * grid - 1.0
    tv = cheb.chebvander(xs, FIT_DEGREE)  # (L, D+1)
    a = np.einsum("ri,cj->rcij", tv, tv).reshape(LUT_SIZE * LUT_SIZE, -1)
    w = (1.0 / e**2).reshape(-1)
    coef, *_ = np.linalg.lstsq(a * w[:, None], e.reshape(-1) * w, rcond=None)
    return coef.reshape(FIT_DEGREE + 1, FIT_DEGREE + 1).astype(np.float32)


def multiscatter_fit_coeffs() -> jnp.ndarray:
    """((D+1), (D+1)) device coefficients for ``compute_multiscattering``'s
    gather-free path (see RenderOptions.ms_impl)."""
    return jnp.asarray(_fit_coeffs_np())


def _cheb_planes(x, degree):
    """T_0..T_degree of ``x`` (any shape) by the three-term recurrence."""
    t = [jnp.ones_like(x), x]
    for _ in range(degree - 1):
        t.append(2.0 * x * t[-1] - t[-2])
    return t


def compute_multiscattering_fit(c_spec, n_dot_i, roughness):
    """Gather-free multiscatter factor: evaluate the Chebyshev surface of E
    and map back through (1 - E) / E.  Pure VPU math — the packed-LUT row
    gather costs ~7.5 ms per call at 2M lanes on v5e (two calls per
    bounce), while the ~300 fused FMAs here are effectively free.  The
    coefficients embed as compile-time constants (host-cached numpy).  Fit
    error vs the LUT is within the LUT's own 4096-sample MC noise
    (tests/test_multiscatter.py)."""
    cs = _fit_coeffs_np()
    d = cs.shape[0] - 1
    x = jnp.clip(2.0 * n_dot_i - 1.0, -1.0, 1.0)
    y = jnp.clip(2.0 * roughness - 1.0, -1.0, 1.0)
    tx = _cheb_planes(x, d)
    ty = _cheb_planes(y, d)
    e = jnp.zeros_like(x)
    for i in range(d + 1):
        inner = jnp.zeros_like(x)
        for j in range(d + 1):
            inner = inner + float(cs[i, j]) * tx[j]
        e = e + ty[i] * inner
    e = jnp.clip(e, 1e-3, 1.0)
    val = (1.0 - e) / e
    return 1.0 + c_spec * val


def compute_multiscattering(packed_lut: jnp.ndarray, c_spec, n_dot_i, roughness):
    """``f_ms = 1 + Cspec * LUT(NdotI, roughness)``
    (``microfacet.rlsl:17-23``); ``packed_lut`` from
    ``multiscatter_lut_packed``, c_spec a Vec3."""
    lp1_sq = packed_lut.shape[0]
    lp1 = int(round(lp1_sq ** 0.5))
    size = lp1 - 1
    x = n_dot_i * size - 0.5
    y = roughness * size - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    key = (y0.astype(jnp.int32) + 1) * lp1 + (x0.astype(jnp.int32) + 1)
    rows = jnp.take(packed_lut, key, axis=0, mode="clip")  # (*shape, 4)
    c00, c10, c01, c11 = rows[..., 0], rows[..., 1], rows[..., 2], rows[..., 3]
    top = c00 + (c10 - c00) * fx
    bot = c01 + (c11 - c01) * fx
    val = top + (bot - top) * fy
    return 1.0 + c_spec * val
