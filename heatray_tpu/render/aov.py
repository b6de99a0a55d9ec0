"""Debug visualization AOVs.

Ports the reference's visualizer modes (``PassGenerator.h:123-141``, shader
branches in ``physicallyBased.rlsl:159-203`` / ``glass.rlsl:179-211`` and the
accumulator's NaN/Inf detectors ``accumulator.rlsl:16-21``).  Surface AOVs
evaluate at the primary hit from the gathered shading rows
(``shade_table.HitRows``); NaN/Inf modes transform the main render's
accumulated values instead (see integrator).  All values are planar ``Vec3``.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..options import AOV
from ..scene.scene import Scene
from ..vec import Vec3
from . import shade_table as st

SURFACE_AOVS = {
    AOV.GEOMETRIC_NORMALS,
    AOV.UVS,
    AOV.TANGENTS,
    AOV.BITANGENTS,
    AOV.NORMALMAP,
    AOV.FINAL_NORMALS,
    AOV.BASE_COLOR,
    AOV.EMISSIVE,
    AOV.ROUGHNESS,
    AOV.METALLIC,
    AOV.CLEARCOAT,
    AOV.CLEARCOAT_ROUGHNESS,
    AOV.CLEARCOAT_NORMALMAP,
    AOV.SHADER,
}

ACCUM_AOVS = {AOV.NANS, AOV.INFS}


def compute_surface_aov(
    scene: Scene, mode: AOV, rows: st.HitRows, b1, b2, front, hit
) -> Vec3:
    """Vec3 AOV color at the primary hit (zero on miss)."""
    w0 = 1.0 - b1 - b2
    is_glass = rows.col(st.KIND) > 0.5

    if mode == AOV.GEOMETRIC_NORMALS:
        n = rows.interp_vec(st.N0, w0, b1, b2).normalized()
        value = (n + 1.0) * 0.5
    elif mode == AOV.FINAL_NORMALS:
        n = rows.interp_vec(st.N0, w0, b1, b2).normalized()
        double_sided = (rows.col(st.DOUBLE_SIDED) > 0.5) | is_glass
        flip = (~front) & double_sided
        n = Vec3.where(flip, -n, n)
        value = (n + 1.0) * 0.5
    elif mode == AOV.UVS:
        u, v = rows.interp_uv(w0, b1, b2)
        value = Vec3(u, v, jnp.zeros_like(u))
    elif mode == AOV.TANGENTS:
        t = rows.interp_vec(st.TAN0, w0, b1, b2).normalized()
        value = (t + 1.0) * 0.5
    elif mode == AOV.BITANGENTS:
        t = rows.interp_vec(st.BTN0, w0, b1, b2).normalized()
        value = (t + 1.0) * 0.5
    elif mode == AOV.BASE_COLOR:
        vc = rows.interp_vec(st.COL0, w0, b1, b2)
        value = rows.vec(st.BASE_COLOR) * vc
    elif mode == AOV.EMISSIVE:
        value = rows.vec(st.EMISSIVE)
    elif mode == AOV.ROUGHNESS:
        value = Vec3.splat(rows.col(st.ROUGHNESS))
    elif mode == AOV.METALLIC:
        value = Vec3.splat(rows.col(st.METALLIC))
    elif mode == AOV.CLEARCOAT:
        # The reference shows the raw (conditioned) clearcoat scalar.
        value = Vec3.splat(rows.col(st.CLEARCOAT))
    elif mode == AOV.CLEARCOAT_ROUGHNESS:
        value = Vec3.splat(rows.col(st.CC_ROUGH))
    elif mode in (AOV.NORMALMAP, AOV.CLEARCOAT_NORMALMAP):
        # Raw normal-map texel (``physicallyBased.rlsl:175-176,198-199``);
        # the reference accumulates nothing when the material lacks the map
        # (the shader branch is compiled out), leaving those pixels black.
        col = st.NM_TEX if mode == AOV.NORMALMAP else st.CCN_TEX
        if scene.has_textures:
            from ..scene.textures import sample_atlas

            u, v = rows.interp_uv(w0, b1, b2)
            tex = rows.icol(col)
            r, g, b, _ = sample_atlas(scene.atlas, tex, u, v)
            value = Vec3.where(tex >= 0, Vec3(r, g, b), 0.0)
        else:
            value = Vec3.zeros(b1.shape)
    elif mode == AOV.SHADER:
        # PBR = red, glass = green (``physicallyBased.rlsl:195``,
        # ``glass.rlsl:191``).
        g = jnp.where(is_glass, 1.0, 0.0)
        value = Vec3(1.0 - g, g, jnp.zeros_like(g))
    else:
        raise ValueError(f"not a surface AOV: {mode}")
    return Vec3.where(hit, value, 0.0)


def accum_visualize(mode: AOV, color: Vec3) -> Vec3:
    """NaN/Inf accumulator visualizers (``accumulator.rlsl:16-21``):
    offending samples show as 100, everything else dims to min(c,1)*0.1."""
    if mode == AOV.NANS:
        bad = color.isnan()
    elif mode == AOV.INFS:
        bad = color.isinf()
    else:
        raise ValueError(f"not an accumulator AOV: {mode}")
    return Vec3.where(bad, 100.0, color.minimum(1.0) * 0.1)
