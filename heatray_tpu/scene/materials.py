"""Unified material table (SoA) for PBR + glass materials.

Replaces the reference's per-material shader programs + uniform blocks
(``Source/HeatrayRenderer/Materials/``) with one flat parameter table the
branchless shader indexes by per-triangle material id.  Parameter
conditioning matches ``PhysicallyBasedMaterial::modify``
(``PhysicallyBasedMaterial.cpp:122-145``) and ``GlassMaterial::modify``
(``GlassMaterial.cpp:90-104``).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax.numpy as jnp
import numpy as np
from flax import struct

KIND_PBR = 0
KIND_GLASS = 1

# ``PhysicallyBasedMaterial.cpp:133-136``
MIN_ROUGHNESS = 0.01
MAX_SPECULAR_F0 = 0.08  # Burley: specularF0 slider scales to [0, 0.08]
MAX_CLEARCOAT = 0.2  # Burley: clearcoat slider scales to [0, 0.2]


@dataclasses.dataclass
class PBRParams:
    """User-facing PBR parameters, mirroring
    ``PhysicallyBasedMaterial.h:22-41``.

    Texture fields are atlas texture ids (see ``scene.textures``), -1 = slot
    unused — the seven slots of the reference's ``Material`` uniform block
    (``physicallyBased.rlsl:29-38``).  ``alpha_masked`` mirrors the
    ALPHA_MASK shader variant (glTF alphaMode MASK,
    ``AssimpMeshProvider.cpp:375-389``): texels with baseColor alpha < 1 are
    passed through and the geometry does not occlude shadow rays
    (``Mesh.cpp:95-100``).
    """

    base_color: tuple = (1.0, 1.0, 1.0)
    emissive: tuple = (0.0, 0.0, 0.0)
    metallic: float = 0.0
    roughness: float = 1.0
    specular_f0: float = 0.5  # raw slider value; conditioned by * 0.08
    clearcoat: float = 0.0  # raw slider value; conditioned by * 0.2
    clearcoat_roughness: float = 0.0
    double_sided: bool = False
    base_color_tex: int = -1
    metallic_roughness_tex: int = -1
    emissive_tex: int = -1
    normal_tex: int = -1
    clearcoat_tex: int = -1
    clearcoat_roughness_tex: int = -1
    clearcoat_normal_tex: int = -1
    alpha_masked: bool = False
    name: str = "pbr"


@dataclasses.dataclass
class GlassParams:
    """User-facing glass parameters, mirroring ``GlassMaterial.h``.

    Glass supports baseColor / metallicRoughness (g = roughness) / normal
    textures (``glass.rlsl:145-175``)."""

    base_color: tuple = (1.0, 1.0, 1.0)
    roughness: float = 0.0
    ior: float = 1.5
    density: float = 0.0  # Beer's-law absorption density
    base_color_tex: int = -1
    metallic_roughness_tex: int = -1
    normal_tex: int = -1
    name: str = "glass"


@struct.dataclass
class MaterialTable:
    """Conditioned, shader-ready material parameters (a pytree).

    All fields are (M,) or planar (3, M) float32/int32 arrays; PBR-only
    fields are zero for glass rows and vice versa.
    """

    kind: jnp.ndarray  # (M,) i32: 0 = PBR, 1 = glass
    base_color: jnp.ndarray  # (3, M) planar
    emissive: jnp.ndarray  # (3, M) planar
    metallic: jnp.ndarray  # (M,)
    roughness: jnp.ndarray  # (M,) conditioned (>= MIN_ROUGHNESS)
    roughness_alpha: jnp.ndarray  # (M,) roughness^2
    specular_f0: jnp.ndarray  # (M,) conditioned (PBR: *0.08; glass: from IOR)
    clearcoat: jnp.ndarray  # (M,) conditioned (*0.2)
    clearcoat_roughness: jnp.ndarray  # (M,)
    clearcoat_roughness_alpha: jnp.ndarray  # (M,)
    ior: jnp.ndarray  # (M,) glass only
    density: jnp.ndarray  # (M,) glass only
    double_sided: jnp.ndarray  # (M,) i32 (glass is implicitly double-sided)
    # Atlas texture ids, -1 = slot unused:
    base_color_tex: jnp.ndarray  # (M,) i32
    metallic_roughness_tex: jnp.ndarray  # (M,) i32
    emissive_tex: jnp.ndarray  # (M,) i32
    normal_tex: jnp.ndarray  # (M,) i32
    clearcoat_tex: jnp.ndarray  # (M,) i32
    clearcoat_roughness_tex: jnp.ndarray  # (M,) i32
    clearcoat_normal_tex: jnp.ndarray  # (M,) i32
    alpha_mask: jnp.ndarray  # (M,) i32 flag

    @property
    def num_materials(self) -> int:
        return self.kind.shape[0]


def build_material_table(materials: List) -> MaterialTable:
    """Condition and pack a list of PBRParams / GlassParams."""
    m = len(materials)
    out = {
        "kind": np.zeros(m, np.int32),
        "base_color": np.zeros((m, 3), np.float32),
        "emissive": np.zeros((m, 3), np.float32),
        "metallic": np.zeros(m, np.float32),
        "roughness": np.zeros(m, np.float32),
        "roughness_alpha": np.zeros(m, np.float32),
        "specular_f0": np.zeros(m, np.float32),
        "clearcoat": np.zeros(m, np.float32),
        "clearcoat_roughness": np.zeros(m, np.float32),
        "clearcoat_roughness_alpha": np.zeros(m, np.float32),
        "ior": np.ones(m, np.float32),
        "density": np.zeros(m, np.float32),
        "double_sided": np.zeros(m, np.int32),
        "base_color_tex": np.full(m, -1, np.int32),
        "metallic_roughness_tex": np.full(m, -1, np.int32),
        "emissive_tex": np.full(m, -1, np.int32),
        "normal_tex": np.full(m, -1, np.int32),
        "clearcoat_tex": np.full(m, -1, np.int32),
        "clearcoat_roughness_tex": np.full(m, -1, np.int32),
        "clearcoat_normal_tex": np.full(m, -1, np.int32),
        "alpha_mask": np.zeros(m, np.int32),
    }
    for i, mat in enumerate(materials):
        if isinstance(mat, PBRParams):
            # ``PhysicallyBasedMaterial.cpp:133-145``
            rough = max(min(float(mat.roughness), 1.0), 0.0)
            rough = max(rough, MIN_ROUGHNESS)
            cc_rough = max(min(float(mat.clearcoat_roughness), 1.0), 0.0)
            cc_rough = max(cc_rough, MIN_ROUGHNESS)
            out["kind"][i] = KIND_PBR
            out["base_color"][i] = np.clip(mat.base_color, 0.0, 1.0)
            out["emissive"][i] = np.clip(mat.emissive, 0.0, 1.0)
            out["metallic"][i] = max(min(float(mat.metallic), 1.0), 0.0)
            out["roughness"][i] = rough
            out["roughness_alpha"][i] = rough * rough
            out["specular_f0"][i] = float(mat.specular_f0) * MAX_SPECULAR_F0
            out["clearcoat"][i] = float(mat.clearcoat) * MAX_CLEARCOAT
            out["clearcoat_roughness"][i] = cc_rough
            out["clearcoat_roughness_alpha"][i] = cc_rough * cc_rough
            out["double_sided"][i] = int(bool(mat.double_sided))
            out["base_color_tex"][i] = int(mat.base_color_tex)
            out["metallic_roughness_tex"][i] = int(mat.metallic_roughness_tex)
            out["emissive_tex"][i] = int(mat.emissive_tex)
            out["normal_tex"][i] = int(mat.normal_tex)
            out["clearcoat_tex"][i] = int(mat.clearcoat_tex)
            out["clearcoat_roughness_tex"][i] = int(mat.clearcoat_roughness_tex)
            out["clearcoat_normal_tex"][i] = int(mat.clearcoat_normal_tex)
            out["alpha_mask"][i] = int(bool(mat.alpha_masked))
        elif isinstance(mat, GlassParams):
            # ``GlassMaterial.cpp:90-104``
            rough = max(min(float(mat.roughness), 1.0), 0.0)
            rough = max(rough, MIN_ROUGHNESS)
            ior = max(0.0, float(mat.ior))
            f0 = abs((1.0 - ior) / (1.0 + ior))
            out["kind"][i] = KIND_GLASS
            out["base_color"][i] = np.clip(mat.base_color, 0.0, 1.0)
            out["roughness"][i] = rough
            out["roughness_alpha"][i] = rough * rough
            out["specular_f0"][i] = f0 * f0
            out["ior"][i] = ior
            out["density"][i] = float(mat.density)
            out["double_sided"][i] = 1  # glass shades both faces
            out["base_color_tex"][i] = int(mat.base_color_tex)
            out["metallic_roughness_tex"][i] = int(mat.metallic_roughness_tex)
            out["normal_tex"][i] = int(mat.normal_tex)
        else:
            raise TypeError(f"unknown material type: {type(mat)}")
    out["base_color"] = np.ascontiguousarray(out["base_color"].T)
    out["emissive"] = np.ascontiguousarray(out["emissive"].T)
    return MaterialTable(**{k: jnp.asarray(v) for k, v in out.items()})
