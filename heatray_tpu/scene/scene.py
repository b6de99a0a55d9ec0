"""Scene assembly: the top-level Scene pytree + host-side builder.

Replaces the reference's retained-mode ``Scene`` (``Scene/Scene.{h,cpp}``):
instead of OpenRL primitives and per-material programs, a Scene is a frozen
pytree of SoA arrays the jitted renderer consumes directly.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
from flax import struct

from .geometry import Geometry, MeshData, merge_meshes, scene_aabb
from .textures import AtlasBuilder, TextureAtlas
from .lights import (
    DirectionalLight,
    EnvironmentLightDesc,
    LightBank,
    PointLight,
    SpotLight,
    build_light_bank,
)
from .materials import GlassParams, MaterialTable, PBRParams, build_material_table


@struct.dataclass
class Scene:
    """A complete renderable scene (a pytree of device arrays).

    ``has_alpha_mask`` is static: when True the integrator builds a second,
    occluder-only acceleration set (alpha-masked geometry does not block
    shadow rays, ``Mesh.cpp:95-100``).
    """

    geometry: Geometry
    materials: MaterialTable
    lights: LightBank
    atlas: TextureAtlas
    has_alpha_mask: bool = struct.field(pytree_node=False, default=False)
    # Static: texture sampling / normal mapping compile out entirely for
    # texture-free scenes (gathers are expensive on TPU).
    has_textures: bool = struct.field(pytree_node=False, default=False)


class SceneBuilder:
    """Host-side accumulation of meshes/materials/lights, the analog of the
    reference's ``Scene::addMesh`` + ``Lighting`` registry."""

    def __init__(self):
        self._meshes: List[MeshData] = []
        self._mesh_material: List[int] = []
        self._materials: List = []
        self._directional: List[DirectionalLight] = []
        self._point: List[PointLight] = []
        self._spot: List[SpotLight] = []
        self._environment: Optional[EnvironmentLightDesc] = None
        self.textures = AtlasBuilder()

    def add_texture(self, image, srgb: bool = False, key=None) -> int:
        """Register a texture image; returns its atlas texture id (use in
        ``PBRParams``/``GlassParams`` texture slots)."""
        return self.textures.add(image, srgb=srgb, key=key)

    def add_material(self, material) -> int:
        assert isinstance(material, (PBRParams, GlassParams))
        self._materials.append(material)
        return len(self._materials) - 1

    def add_mesh(
        self, mesh: MeshData, material, transform: Optional[np.ndarray] = None
    ) -> "SceneBuilder":
        """Add a mesh with a material (instance or existing id) and optional
        4x4 transform (the analog of ``Scene::addMesh``'s worldFromEntity)."""
        if isinstance(material, int):
            mid = material
        else:
            mid = self.add_material(material)
        if transform is not None:
            mesh = mesh.transformed(transform)
        self._meshes.append(mesh)
        self._mesh_material.append(mid)
        return self

    def add_directional_light(self, light: DirectionalLight) -> "SceneBuilder":
        self._directional.append(light)
        return self

    def add_point_light(self, light: PointLight) -> "SceneBuilder":
        self._point.append(light)
        return self

    def add_spot_light(self, light: SpotLight) -> "SceneBuilder":
        self._spot.append(light)
        return self

    def set_environment(self, env: Optional[EnvironmentLightDesc]) -> "SceneBuilder":
        self._environment = env
        return self

    def build(self) -> Scene:
        assert self._meshes, "scene has no geometry"
        geometry = merge_meshes(self._meshes, self._mesh_material)
        materials = build_material_table(
            self._materials if self._materials else [PBRParams()]
        )
        lights = build_light_bank(
            directional=self._directional,
            point=self._point,
            spot=self._spot,
            environment=self._environment,
        )
        has_alpha_mask = any(
            getattr(m, "alpha_masked", False) for m in self._materials
        )
        return Scene(
            geometry=geometry,
            materials=materials,
            lights=lights,
            atlas=self.textures.build(),
            has_alpha_mask=has_alpha_mask,
            has_textures=self.textures.num_textures > 0,
        )

    def aabb(self) -> np.ndarray:
        geometry = merge_meshes(self._meshes, self._mesh_material)
        return scene_aabb(geometry)
