"""Wavefront OBJ/MTL loader.

The TPU-native replacement for the reference's Assimp import path
(``Scene/AssimpMeshProvider.cpp``): parses OBJ geometry into SoA numpy
buffers and maps MTL materials with the same classification rules
(transmission -> glass, ``AssimpMeshProvider.cpp:377-389``; PBR factors
otherwise, ``:394-435``).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..geometry import MeshData
from ..materials import GlassParams, PBRParams


def parse_mtl(path: str) -> Dict[str, dict]:
    """Parse an MTL file into raw material dicts."""
    materials: Dict[str, dict] = {}
    current: Optional[dict] = None
    if not os.path.exists(path):
        return materials
    with open(path, "r", errors="replace") as f:
        for line in f:
            parts = line.split()
            if not parts or parts[0].startswith("#"):
                continue
            key = parts[0]
            if key == "newmtl":
                current = {"name": parts[1] if len(parts) > 1 else "mtl"}
                materials[current["name"]] = current
            elif current is None:
                continue
            elif key in ("Kd", "Ks", "Ke"):
                current[key] = [float(v) for v in parts[1:4]]
            elif key in ("Ns", "Ni", "d", "Tr", "Pr", "Pm", "Pc", "Pcr"):
                current[key] = float(parts[1])
            elif key == "Tf":
                current[key] = [float(v) for v in parts[1:4]]
            elif key == "illum":
                current[key] = int(parts[1])
            elif key.startswith("map_"):
                current[key] = parts[-1]
    return materials


def mtl_to_material(raw: dict):
    """MTL -> framework material, following the reference's classification:
    transmissive materials become glass, everything else PBR."""
    name = raw.get("name", "mtl")
    dissolve = raw.get("d", 1.0 if "Tr" not in raw else 1.0 - raw["Tr"])
    illum = raw.get("illum", 2)
    transmissive = dissolve < 1.0 or illum in (4, 6, 7, 9)
    if transmissive:
        return GlassParams(
            base_color=tuple(raw.get("Tf", raw.get("Kd", (1.0, 1.0, 1.0)))),
            roughness=raw.get("Pr", 0.0),
            ior=raw.get("Ni", 1.5),
            density=max(0.0, 1.0 - dissolve),
            name=name,
        )
    # PBR: prefer PBR extension keys (Pr/Pm), fall back to classic Phong
    # mappings (shininess -> roughness).
    if "Pr" in raw:
        roughness = raw["Pr"]
    elif "Ns" in raw:
        roughness = float(np.clip(1.0 - np.sqrt(raw["Ns"]) / 31.62, 0.0, 1.0))
    else:
        roughness = 1.0
    return PBRParams(
        base_color=tuple(raw.get("Kd", (1.0, 1.0, 1.0))),
        emissive=tuple(raw.get("Ke", (0.0, 0.0, 0.0))),
        metallic=raw.get("Pm", 0.0),
        roughness=roughness,
        specular_f0=0.5,
        clearcoat=raw.get("Pc", 0.0),
        clearcoat_roughness=raw.get("Pcr", 0.0),
        name=name,
    )


def load_obj(
    path: str, scale: float = 1.0
) -> Tuple[List[MeshData], List[object]]:
    """Load an OBJ file -> (meshes, materials), one mesh per used material.

    Faces are fan-triangulated like the reference
    (``AssimpMeshProvider.cpp:270-278``); cm->m unit scaling is the caller's
    ``scale`` (``:692``).
    """
    # Fast path: single-material files (no usemtl) go through the native
    # C++ tokenizer (``native/heatray_native.cpp``) — the heavy case for
    # large scanned meshes.  Grouped files use the Python path below.
    with open(path, "rb") as fb:
        raw = fb.read()
    if b"usemtl" not in raw:
        from ... import native

        parsed = native.parse_obj(raw)
        if parsed is not None:
            return _from_native(parsed, path, raw, scale)

    positions: List[List[float]] = []
    normals: List[List[float]] = []
    uvs: List[List[float]] = []
    # Per-material corner lists of (pos_idx, uv_idx, nrm_idx).
    groups: Dict[str, List[Tuple[int, int, int]]] = {}
    current_mtl = ""
    mtl_files: List[str] = []

    with open(path, "r", errors="replace") as f:
        for line in f:
            parts = line.split()
            if not parts or parts[0].startswith("#"):
                continue
            key = parts[0]
            if key == "v":
                positions.append([float(v) for v in parts[1:4]])
            elif key == "vn":
                normals.append([float(v) for v in parts[1:4]])
            elif key == "vt":
                uvs.append([float(v) for v in parts[1:3]])
            elif key == "mtllib":
                mtl_files.append(" ".join(parts[1:]))
            elif key == "usemtl":
                current_mtl = parts[1] if len(parts) > 1 else ""
            elif key == "f":
                corners = []
                for corner in parts[1:]:
                    ids = corner.split("/")
                    vi = int(ids[0])
                    ti = int(ids[1]) if len(ids) > 1 and ids[1] else 0
                    ni = int(ids[2]) if len(ids) > 2 and ids[2] else 0
                    # OBJ indices are 1-based; negatives count from the end.
                    vi = vi - 1 if vi > 0 else len(positions) + vi
                    ti = ti - 1 if ti > 0 else (len(uvs) + ti if ti else -1)
                    ni = ni - 1 if ni > 0 else (len(normals) + ni if ni else -1)
                    corners.append((vi, ti, ni))
                tris = groups.setdefault(current_mtl, [])
                for k in range(1, len(corners) - 1):  # fan triangulation
                    tris.extend([corners[0], corners[k], corners[k + 1]])

    raw_mtls: Dict[str, dict] = {}
    base = os.path.dirname(path)
    for mtl in mtl_files:
        raw_mtls.update(parse_mtl(os.path.join(base, mtl)))

    pos_arr = np.asarray(positions, np.float32) * np.float32(scale)
    nrm_arr = np.asarray(normals, np.float32) if normals else None
    uv_arr = np.asarray(uvs, np.float32) if uvs else None

    meshes: List[MeshData] = []
    materials: List[object] = []
    for mtl_name, corners in groups.items():
        if not corners:
            continue
        c = np.asarray(corners, np.int64).reshape(-1, 3, 3)  # (T, corner, ids)
        # Build a compact per-group vertex buffer keyed by the corner tuple.
        flat = c.reshape(-1, 3)
        uniq, inverse = np.unique(flat, axis=0, return_inverse=True)
        v = pos_arr[uniq[:, 0]]
        uv = (
            np.where(uniq[:, 1:2] >= 0, 1, 0) * 0.0 + (
                uv_arr[np.maximum(uniq[:, 1], 0)]
                if uv_arr is not None
                else np.zeros((len(uniq), 2), np.float32)
            )
            if uv_arr is not None
            else np.zeros((len(uniq), 2), np.float32)
        )
        nrm = (
            nrm_arr[np.maximum(uniq[:, 2], 0)]
            if nrm_arr is not None and (uniq[:, 2] >= 0).all()
            else None
        )
        indices = inverse.reshape(-1, 3).astype(np.int32)
        meshes.append(
            MeshData(
                positions=v, indices=indices, normals=nrm,
                uvs=uv.astype(np.float32), name=mtl_name or "default",
            )
        )
        if mtl_name in raw_mtls:
            materials.append(mtl_to_material(raw_mtls[mtl_name]))
        else:
            materials.append(PBRParams(name=mtl_name or "default"))
    return meshes, materials


def _from_native(parsed, path: str, raw: bytes, scale: float):
    """Assemble MeshData from the native parser's flat corner streams
    (single-material fast path)."""
    v, vt, vn, fv, ft, fn = parsed
    if fv.shape[0] == 0:
        return [], []
    corners = np.stack([fv, ft, fn], axis=-1).reshape(-1, 3)  # (3T, ids)
    uniq, inverse = np.unique(corners, axis=0, return_inverse=True)
    pos = v[uniq[:, 0]] * np.float32(scale)
    uv = (
        vt[np.maximum(uniq[:, 1], 0)]
        if vt.shape[0]
        else np.zeros((len(uniq), 2), np.float32)
    )
    nrm = (
        vn[np.maximum(uniq[:, 2], 0)]
        if vn.shape[0] and (uniq[:, 2] >= 0).all()
        else None
    )
    indices = inverse.reshape(-1, 3).astype(np.int32)
    name = os.path.splitext(os.path.basename(path))[0]
    mesh = MeshData(
        positions=pos, indices=indices, normals=nrm, uvs=uv.astype(np.float32),
        name=name,
    )
    return [mesh], [PBRParams(name=name)]
