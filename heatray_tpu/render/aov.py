"""Debug visualization AOVs.

Ports the reference's visualizer modes (``PassGenerator.h:123-141``, shader
branches in ``physicallyBased.rlsl:159-203`` / ``glass.rlsl:179-211`` and the
accumulator's NaN/Inf detectors ``accumulator.rlsl:16-21``).  Surface AOVs
evaluate at the primary hit; NaN/Inf modes transform the main render's
accumulated values instead (see integrator).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..options import AOV
from ..scene.materials import KIND_GLASS
from ..scene.scene import Scene
from .onb import normalize
from .shade import _gather, _interp

SURFACE_AOVS = {
    AOV.GEOMETRIC_NORMALS,
    AOV.UVS,
    AOV.TANGENTS,
    AOV.BITANGENTS,
    AOV.FINAL_NORMALS,
    AOV.BASE_COLOR,
    AOV.EMISSIVE,
    AOV.ROUGHNESS,
    AOV.METALLIC,
    AOV.CLEARCOAT,
    AOV.CLEARCOAT_ROUGHNESS,
    AOV.SHADER,
}

ACCUM_AOVS = {AOV.NANS, AOV.INFS}


def compute_surface_aov(
    scene: Scene, mode: AOV, ray_dir, b1, b2, tid, front, hit
):
    """(R, 3) AOV color at the primary hit (zero on miss)."""
    geom = scene.geometry
    mats = scene.materials
    safe_tid = jnp.maximum(tid, 0)
    w0 = 1.0 - b1 - b2
    mid = _gather(geom.material_ids, safe_tid)
    kind = _gather(mats.kind, mid)
    is_glass = kind == KIND_GLASS

    if mode == AOV.GEOMETRIC_NORMALS:
        n = normalize(_interp(geom.normals, geom.indices, safe_tid, w0, b1, b2))
        value = (n + 1.0) * 0.5
    elif mode == AOV.FINAL_NORMALS:
        n = normalize(_interp(geom.normals, geom.indices, safe_tid, w0, b1, b2))
        double_sided = (_gather(mats.double_sided, mid) > 0) | is_glass
        flip = (~front) & double_sided
        n = jnp.where(flip[:, None], -n, n)
        value = (n + 1.0) * 0.5
    elif mode == AOV.UVS:
        uv = _interp(geom.uvs, geom.indices, safe_tid, w0, b1, b2)
        value = jnp.concatenate([uv, jnp.zeros_like(uv[:, :1])], axis=-1)
    elif mode == AOV.TANGENTS:
        t = normalize(_interp(geom.tangents, geom.indices, safe_tid, w0, b1, b2))
        value = (t + 1.0) * 0.5
    elif mode == AOV.BITANGENTS:
        t = normalize(_interp(geom.bitangents, geom.indices, safe_tid, w0, b1, b2))
        value = (t + 1.0) * 0.5
    elif mode == AOV.BASE_COLOR:
        vc = _interp(geom.colors, geom.indices, safe_tid, w0, b1, b2)
        value = _gather(mats.base_color, mid) * vc
    elif mode == AOV.EMISSIVE:
        value = _gather(mats.emissive, mid)
    elif mode == AOV.ROUGHNESS:
        value = jnp.repeat(_gather(mats.roughness, mid)[:, None], 3, axis=-1)
    elif mode == AOV.METALLIC:
        value = jnp.repeat(_gather(mats.metallic, mid)[:, None], 3, axis=-1)
    elif mode == AOV.CLEARCOAT:
        # The reference shows the raw (conditioned) clearcoat scalar.
        value = jnp.repeat(_gather(mats.clearcoat, mid)[:, None], 3, axis=-1)
    elif mode == AOV.CLEARCOAT_ROUGHNESS:
        value = jnp.repeat(
            _gather(mats.clearcoat_roughness, mid)[:, None], 3, axis=-1
        )
    elif mode == AOV.SHADER:
        # PBR = red, glass = green (``physicallyBased.rlsl:195``,
        # ``glass.rlsl:191``).
        red = jnp.array([1.0, 0.0, 0.0])
        green = jnp.array([0.0, 1.0, 0.0])
        value = jnp.where(is_glass[:, None], green, red)
    else:
        raise ValueError(f"not a surface AOV: {mode}")
    return jnp.where(hit[:, None], value, 0.0)


def accum_visualize(mode: AOV, color):
    """NaN/Inf accumulator visualizers (``accumulator.rlsl:16-21``):
    offending samples show as 100, everything else dims to min(c,1)*0.1."""
    if mode == AOV.NANS:
        bad = jnp.any(jnp.isnan(color), axis=-1, keepdims=True)
    elif mode == AOV.INFS:
        bad = jnp.any(jnp.isinf(color), axis=-1, keepdims=True)
    else:
        raise ValueError(f"not an accumulator AOV: {mode}")
    return jnp.where(bad, 100.0, jnp.minimum(color, 1.0) * 0.1)
