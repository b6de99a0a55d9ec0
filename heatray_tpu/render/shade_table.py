"""Per-triangle shading row table: one fat row-gather per bounce.

TPU random gathers pay per *fetch*, not per byte: 60 separate (R,) takes
(attributes, material params, Woop rows) cost ~5x more than ONE row gather
of the same data packed contiguously (measured on v5e: 12 planar takes
196 ms vs one (T, 12) row gather 36 ms for 2M rays).  So everything shading
needs per hit triangle — Woop transform, geometric normal, per-corner vertex
attributes, and the triangle's material parameters expanded from the
material table — is packed into one (T, K) row-major table at pass setup
(cheap: T-sized, differentiable), and each bounce does a single
``jnp.take(rows, tri_id, axis=0)``.

This replaces the reference's scattered per-primitive GPU state (vertex
buffers + material uniform blocks bound per OpenRL primitive) with a layout
chosen for the TPU memory system.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.intersect import WoopAccel
from ..scene.scene import Scene
from ..vec import Vec3

# Column layout (f32).  Texture-only columns live in a CONTIGUOUS TAIL so
# untextured scenes build and gather only the first NUM_BASE_COLS (~39%
# less row-gather traffic on the hot path).
WOOP = 0           # 12: Woop affine rows
GEO_N = 12         # 3
N0 = 15            # 9: shading normal per corner
COL0 = 24          # 9: vertex color per corner
KIND = 33
BASE_COLOR = 34    # 3
EMISSIVE = 37      # 3
METALLIC = 40
ROUGHNESS = 41
ROUGHNESS_ALPHA = 42
SPECULAR_F0 = 43
CLEARCOAT = 44
CC_ROUGH = 45
CC_ALPHA = 46
IOR = 47
DENSITY = 48
DOUBLE_SIDED = 49
ALPHA_MASK = 50
NUM_BASE_COLS = 51
# --- texture tail (present only when the table is built textured) ---
UV0 = 51           # 6: uv per corner
TAN0 = 57          # 9: tangent per corner
BTN0 = 66          # 9: bitangent per corner
BC_TEX = 75
MR_TEX = 76
EM_TEX = 77
NM_TEX = 78
CC_TEX = 79
CCR_TEX = 80
CCN_TEX = 81
# sqrt(uv_area / world_area): UV length per world unit, the per-triangle
# texel-density term of the ray-cone mip LOD (zero when the triangle has
# degenerate UVs, which disables mip selection for it).
UV_DENSITY = 82
NUM_COLS = 83


def build_shade_table(
    scene: Scene, accel: WoopAccel, textured: bool | None = None
) -> jnp.ndarray:
    """(T, K) f32 row table, K = NUM_COLS when ``textured`` (default:
    ``scene.has_textures``) else NUM_BASE_COLS.  Differentiable w.r.t.
    vertex positions (through the Woop rows / normals) and material
    parameters."""
    if textured is None:
        textured = scene.has_textures
    geom = scene.geometry
    mats = scene.materials
    i0, i1, i2 = geom.indices[0], geom.indices[1], geom.indices[2]
    mid = geom.material_ids

    cols = []
    cols.extend(accel.w[k] for k in range(12))
    cols.extend(accel.geo_normal[k] for k in range(3))
    for corner in (i0, i1, i2):
        cols.extend(jnp.take(geom.normals[k], corner) for k in range(3))
    for corner in (i0, i1, i2):
        cols.extend(jnp.take(geom.colors[k], corner) for k in range(3))

    def mat(param):
        return jnp.take(param, mid).astype(jnp.float32)

    cols.append(mat(mats.kind))
    cols.extend(mat(mats.base_color[k]) for k in range(3))
    cols.extend(mat(mats.emissive[k]) for k in range(3))
    cols.append(mat(mats.metallic))
    cols.append(mat(mats.roughness))
    cols.append(mat(mats.roughness_alpha))
    cols.append(mat(mats.specular_f0))
    cols.append(mat(mats.clearcoat))
    cols.append(mat(mats.clearcoat_roughness))
    cols.append(mat(mats.clearcoat_roughness_alpha))
    cols.append(mat(mats.ior))
    cols.append(mat(mats.density))
    cols.append(mat(mats.double_sided))
    cols.append(mat(mats.alpha_mask))
    assert len(cols) == NUM_BASE_COLS

    if textured:
        for corner in (i0, i1, i2):
            cols.extend(jnp.take(geom.uvs[k], corner) for k in range(2))
        for corner in (i0, i1, i2):
            cols.extend(jnp.take(geom.tangents[k], corner) for k in range(3))
        for corner in (i0, i1, i2):
            cols.extend(jnp.take(geom.bitangents[k], corner) for k in range(3))
        cols.append(mat(mats.base_color_tex))
        cols.append(mat(mats.metallic_roughness_tex))
        cols.append(mat(mats.emissive_tex))
        cols.append(mat(mats.normal_tex))
        cols.append(mat(mats.clearcoat_tex))
        cols.append(mat(mats.clearcoat_roughness_tex))
        cols.append(mat(mats.clearcoat_normal_tex))

        # Per-triangle UV density for ray-cone mip LOD (``Texture.h:51``'s
        # trilinear sampling needs a footprint; OpenRL derives it
        # internally).
        def corner(arr, idx):
            return tuple(jnp.take(arr[k], idx) for k in range(3))

        p0, p1, p2 = (corner(geom.positions, i) for i in (i0, i1, i2))
        e1 = tuple(p1[k] - p0[k] for k in range(3))
        e2 = tuple(p2[k] - p0[k] for k in range(3))
        cx = e1[1] * e2[2] - e1[2] * e2[1]
        cy = e1[2] * e2[0] - e1[0] * e2[2]
        cz = e1[0] * e2[1] - e1[1] * e2[0]
        world_2area = jnp.sqrt(cx * cx + cy * cy + cz * cz)
        u0, v0 = jnp.take(geom.uvs[0], i0), jnp.take(geom.uvs[1], i0)
        u1, v1 = jnp.take(geom.uvs[0], i1), jnp.take(geom.uvs[1], i1)
        u2, v2 = jnp.take(geom.uvs[0], i2), jnp.take(geom.uvs[1], i2)
        uv_2area = jnp.abs((u1 - u0) * (v2 - v0) - (u2 - u0) * (v1 - v0))
        cols.append(jnp.sqrt(uv_2area / jnp.maximum(world_2area, 1e-12)))
        assert len(cols) == NUM_COLS
    return jnp.stack(cols, axis=1)  # (T, K)


class HitRows:
    """Column-accessor view over gathered (R, K) shading rows.

    Columns are extracted once into planar (R,) arrays (one relayout) and
    memoized; all shading math stays planar.
    """

    def __init__(self, rows: jnp.ndarray):
        self.rows = rows

    def col(self, k) -> jnp.ndarray:
        return self.rows[..., k]

    def icol(self, k) -> jnp.ndarray:
        return self.rows[..., k].astype(jnp.int32)

    def vec(self, k) -> Vec3:
        return Vec3(
            self.rows[..., k], self.rows[..., k + 1], self.rows[..., k + 2]
        )

    def interp_vec(self, base: int, w0, b1, b2) -> Vec3:
        """Barycentric interpolation of a 3x Vec3 corner block."""
        return (
            self.vec(base) * w0 + self.vec(base + 3) * b1 + self.vec(base + 6) * b2
        )

    def interp_uv(self, w0, b1, b2):
        u = (
            self.col(UV0) * w0
            + self.col(UV0 + 2) * b1
            + self.col(UV0 + 4) * b2
        )
        v = (
            self.col(UV0 + 1) * w0
            + self.col(UV0 + 3) * b1
            + self.col(UV0 + 5) * b2
        )
        return u, v


def gather_rows(table: jnp.ndarray, tri_id) -> HitRows:
    """One row gather for a wavefront of hits (tri_id clamped by caller)."""
    return HitRows(jnp.take(table, tri_id, axis=0, mode="clip"))


def hit_attributes_rows(rows: HitRows, origins: Vec3, directions: Vec3, hit_mask):
    """Differentiable (t, b1, b2) from the gathered Woop rows — the
    row-table version of ``ops.intersect.hit_attributes``."""
    _DZ_EPS = 1e-15
    MISS_T = jnp.float32(3.0e38)

    def affine(k, v, with_b):
        r = (
            rows.col(WOOP + 4 * k) * v.x
            + rows.col(WOOP + 4 * k + 1) * v.y
            + rows.col(WOOP + 4 * k + 2) * v.z
        )
        if with_b:
            r = r + rows.col(WOOP + 4 * k + 3)
        return r

    dz = affine(2, directions, False)
    safe_dz = jnp.where(jnp.abs(dz) > _DZ_EPS, dz, 1.0)
    t = -affine(2, origins, True) / safe_dz
    b1 = affine(0, origins, True) + t * affine(0, directions, False)
    b2 = affine(1, origins, True) + t * affine(1, directions, False)
    t = jnp.where(hit_mask, t, MISS_T)
    b1 = jnp.clip(jnp.where(hit_mask, b1, 0.0), 0.0, 1.0)
    b2 = jnp.clip(jnp.where(hit_mask, b2, 0.0), 0.0, 1.0)
    return t, b1, b2
