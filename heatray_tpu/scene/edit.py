"""Functional scene-edit operations.

The reference edits retained-mode state in place: ``Scene::applyTransform``
re-uploads per-submesh ``worldFromEntity`` matrices (``Scene/Scene.cpp:38-49``),
``Scene::addMesh``/``removeMesh`` mutate the primitive list, and the
``Lighting`` registry adds/updates/removes lights with swap-compaction
(``Scene/Lighting.cpp:239-271``).  Here a ``Scene`` is an immutable pytree,
so every edit returns a NEW scene; the renderer's acceleration pack must be
rebuilt afterwards (``make_context(options, new_scene)``) — the analog of
the reference's renderer reset after any scene edit
(``HeatrayRenderer.cpp:1601-1608``: accumulation restarts from pass 0).

Transform edits are pure jnp (usable inside jit / differentiable);
mesh add/remove are host-side (they change array shapes).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from .geometry import Geometry, MeshData, merge_meshes
from .lights import (
    MAX_DIRECTIONAL_LIGHTS,
    MAX_POINT_LIGHTS,
    MAX_SPOT_LIGHTS,
    DirectionalLight,
    PointLight,
    SpotLight,
)
from .materials import GlassParams, PBRParams, build_material_table
from .scene import Scene


# --------------------------------------------------------------------------
# Transforms (``Scene::applyTransform``, ``Scene/Scene.cpp:38-49``)
# --------------------------------------------------------------------------


def apply_transform(scene: Scene, matrix) -> Scene:
    """Apply a 4x4 world transform to ALL scene geometry.

    Positions map by ``M``, normals by ``inv(M_3x3)^T`` (renormalized),
    tangent frames by the linear part.  A negative-determinant transform
    flips triangle winding so geometric normals stay outward (the analog of
    ``Mesh.cpp:86-91``).  Pure jnp: differentiable w.r.t. the matrix.
    """
    m = jnp.asarray(matrix, jnp.float32)
    rot = m[:3, :3]
    g = scene.geometry

    pos = rot @ g.positions + m[:3, 3:4]
    nrm_mat = jnp.linalg.inv(rot).T
    nrm = nrm_mat @ g.normals
    nrm = nrm / jnp.maximum(jnp.linalg.norm(nrm, axis=0, keepdims=True), 1e-20)
    tan = rot @ g.tangents
    bit = rot @ g.bitangents

    det = jnp.linalg.det(rot)
    # Winding flip on reflection: swap index rows 1 and 2.
    flipped = jnp.stack([g.indices[0], g.indices[2], g.indices[1]])
    indices = jnp.where(det < 0.0, flipped, g.indices)

    return scene.replace(
        geometry=g.replace(
            positions=pos, normals=nrm, tangents=tan, bitangents=bit,
            indices=indices,
        )
    )


def trs_matrix(
    yaw: float = 0.0,
    pitch: float = 0.0,
    roll: float = 0.0,
    scale: float = 1.0,
) -> np.ndarray:
    """Session-style transform: uniform scale, then roll (Z), pitch (X),
    yaw (Y) — the ``Scene.RotationYaw/Pitch/Roll/Scale`` session variables
    (``Session.h:20-75``), applied about the world origin."""

    def rot(angle, i, j):
        r = np.eye(4, dtype=np.float32)
        c, s = np.cos(angle), np.sin(angle)
        r[i, i], r[i, j], r[j, i], r[j, j] = c, -s, s, c
        return r

    s = np.eye(4, dtype=np.float32)
    s[0, 0] = s[1, 1] = s[2, 2] = scale
    yaw_m = rot(yaw, 0, 2)  # about Y
    pitch_m = rot(pitch, 1, 2)  # about X
    roll_m = rot(roll, 0, 1)  # about Z
    return (yaw_m @ pitch_m @ roll_m @ s).astype(np.float32)


# --------------------------------------------------------------------------
# Mesh add / remove (``Scene::addMesh``/``removeMesh``)
# --------------------------------------------------------------------------


def add_mesh(
    scene: Scene,
    mesh: MeshData,
    material: PBRParams | GlassParams,
    transform: np.ndarray | None = None,
) -> Scene:
    """Append a mesh (+ its material) to the scene.  Host-side (shapes
    change).  Returns the new scene; rebuild the accel pack to render."""
    if transform is not None:
        mesh = mesh.transformed(transform)
    g = scene.geometry
    new_mid = scene.materials.base_color.shape[-1]  # planar (3, M)
    new_mesh_id = int(jnp.max(g.mesh_ids)) + 1 if g.num_triangles else 0

    sub = merge_meshes([mesh], [0])  # flatten one mesh (Morton within)
    v_off = g.num_vertices

    def cat(a, b):
        return jnp.concatenate([a, b], axis=-1)

    geometry = Geometry(
        positions=cat(g.positions, sub.positions),
        normals=cat(g.normals, sub.normals),
        uvs=cat(g.uvs, sub.uvs),
        tangents=cat(g.tangents, sub.tangents),
        bitangents=cat(g.bitangents, sub.bitangents),
        colors=cat(g.colors, sub.colors),
        indices=cat(g.indices, sub.indices + v_off),
        material_ids=cat(
            g.material_ids, jnp.full_like(sub.material_ids, new_mid)
        ),
        mesh_ids=cat(g.mesh_ids, jnp.full_like(sub.mesh_ids, new_mesh_id)),
    )

    # Extend the material table by one row (host-side concat per field).
    new_table = build_material_table([material])
    materials = scene.materials
    # Material arrays are (M,) or planar (3, M): the material dim is LAST.
    fields = {
        f.name: jnp.concatenate(
            [getattr(materials, f.name), getattr(new_table, f.name)], axis=-1
        )
        for f in dataclasses.fields(materials)
    }
    materials = type(materials)(**fields)

    return scene.replace(
        geometry=geometry,
        materials=materials,
        has_alpha_mask=scene.has_alpha_mask
        or bool(getattr(material, "alpha_masked", False)),
    )


def remove_mesh(scene: Scene, mesh_id: int) -> Scene:
    """Drop every triangle of ``mesh_id`` (host-side).  Vertices are left in
    place (unreferenced vertices are harmless to the intersector)."""
    g = scene.geometry
    keep = np.asarray(g.mesh_ids) != mesh_id
    assert keep.any(), "removing the last mesh leaves an empty scene"
    return scene.replace(
        geometry=g.replace(
            indices=jnp.asarray(np.asarray(g.indices)[:, keep]),
            material_ids=jnp.asarray(np.asarray(g.material_ids)[keep]),
            mesh_ids=jnp.asarray(np.asarray(g.mesh_ids)[keep]),
        )
    )


# --------------------------------------------------------------------------
# Light add / update / remove (``Lighting.cpp:239-271`` swap-compaction)
# --------------------------------------------------------------------------


def _set_row(arr, i, row):
    return arr.at[i].set(jnp.asarray(row, arr.dtype))


def add_directional_light(scene: Scene, light: DirectionalLight) -> Scene:
    b = scene.lights
    n = int(b.num_directional)
    assert n < MAX_DIRECTIONAL_LIGHTS, "directional light capacity reached"
    d = np.asarray(light.direction, np.float32)
    return scene.replace(
        lights=b.replace(
            num_directional=jnp.int32(n + 1),
            dir_direction=_set_row(
                b.dir_direction, n, d / max(np.linalg.norm(d), 1e-20)
            ),
            dir_color=_set_row(b.dir_color, n, light.radiometric_color()),
        )
    )


def update_directional_light(
    scene: Scene, index: int, light: DirectionalLight
) -> Scene:
    b = scene.lights
    assert 0 <= index < int(b.num_directional)
    d = np.asarray(light.direction, np.float32)
    return scene.replace(
        lights=b.replace(
            dir_direction=_set_row(
                b.dir_direction, index, d / max(np.linalg.norm(d), 1e-20)
            ),
            dir_color=_set_row(b.dir_color, index, light.radiometric_color()),
        )
    )


def remove_directional_light(scene: Scene, index: int) -> Scene:
    """Swap-compact removal (``Lighting.cpp:239-271``): the last light moves
    into the removed slot."""
    b = scene.lights
    n = int(b.num_directional)
    assert 0 <= index < n
    last = n - 1
    return scene.replace(
        lights=b.replace(
            num_directional=jnp.int32(last),
            dir_direction=_set_row(
                b.dir_direction, index, b.dir_direction[last]
            ),
            dir_color=_set_row(b.dir_color, index, b.dir_color[last]),
        )
    )


def add_point_light(scene: Scene, light: PointLight) -> Scene:
    b = scene.lights
    n = int(b.num_point)
    assert n < MAX_POINT_LIGHTS, "point light capacity reached"
    return scene.replace(
        lights=b.replace(
            num_point=jnp.int32(n + 1),
            point_position=_set_row(b.point_position, n, light.position),
            point_color=_set_row(b.point_color, n, light.radiometric_color()),
        )
    )


def update_point_light(scene: Scene, index: int, light: PointLight) -> Scene:
    b = scene.lights
    assert 0 <= index < int(b.num_point)
    return scene.replace(
        lights=b.replace(
            point_position=_set_row(b.point_position, index, light.position),
            point_color=_set_row(
                b.point_color, index, light.radiometric_color()
            ),
        )
    )


def remove_point_light(scene: Scene, index: int) -> Scene:
    b = scene.lights
    n = int(b.num_point)
    assert 0 <= index < n
    last = n - 1
    return scene.replace(
        lights=b.replace(
            num_point=jnp.int32(last),
            point_position=_set_row(
                b.point_position, index, b.point_position[last]
            ),
            point_color=_set_row(b.point_color, index, b.point_color[last]),
        )
    )


def add_spot_light(scene: Scene, light: SpotLight) -> Scene:
    import math

    b = scene.lights
    n = int(b.num_spot)
    assert n < MAX_SPOT_LIGHTS, "spot light capacity reached"
    d = np.asarray(light.direction, np.float32)
    return scene.replace(
        lights=b.replace(
            num_spot=jnp.int32(n + 1),
            spot_position=_set_row(b.spot_position, n, light.position),
            spot_direction=_set_row(
                b.spot_direction, n, d / max(np.linalg.norm(d), 1e-20)
            ),
            spot_color=_set_row(b.spot_color, n, light.radiometric_color()),
            spot_cos_angles=_set_row(
                b.spot_cos_angles,
                n,
                (math.cos(light.inner_angle), math.cos(light.outer_angle)),
            ),
        )
    )


def update_spot_light(scene: Scene, index: int, light: SpotLight) -> Scene:
    import math

    b = scene.lights
    assert 0 <= index < int(b.num_spot)
    d = np.asarray(light.direction, np.float32)
    return scene.replace(
        lights=b.replace(
            spot_position=_set_row(b.spot_position, index, light.position),
            spot_direction=_set_row(
                b.spot_direction, index, d / max(np.linalg.norm(d), 1e-20)
            ),
            spot_color=_set_row(
                b.spot_color, index, light.radiometric_color()
            ),
            spot_cos_angles=_set_row(
                b.spot_cos_angles,
                index,
                (math.cos(light.inner_angle), math.cos(light.outer_angle)),
            ),
        )
    )


def remove_spot_light(scene: Scene, index: int) -> Scene:
    b = scene.lights
    n = int(b.num_spot)
    assert 0 <= index < n
    last = n - 1
    return scene.replace(
        lights=b.replace(
            num_spot=jnp.int32(last),
            spot_position=_set_row(
                b.spot_position, index, b.spot_position[last]
            ),
            spot_direction=_set_row(
                b.spot_direction, index, b.spot_direction[last]
            ),
            spot_color=_set_row(b.spot_color, index, b.spot_color[last]),
            spot_cos_angles=_set_row(
                b.spot_cos_angles, index, b.spot_cos_angles[last]
            ),
        )
    )
