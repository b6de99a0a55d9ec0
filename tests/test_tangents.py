"""Tangent-frame generation (the aiProcess_CalcTangentSpace analog,
``AssimpMeshProvider.cpp:683``): formats with UVs but no authored
tangents get a generated orthonormal TBN so normal mapping works."""

import numpy as np

from heatray_tpu.scene.geometry import MeshData, compute_tangents, merge_meshes


def _quad(flip_v=False):
    positions = np.asarray(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32
    )
    uvs = np.asarray([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    if flip_v:
        uvs[:, 1] = 1.0 - uvs[:, 1]
    indices = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
    normals = np.tile([0.0, 0.0, 1.0], (4, 1)).astype(np.float32)
    return positions, normals, uvs, indices


def test_axis_aligned_quad():
    positions, normals, uvs, indices = _quad()
    t, b = compute_tangents(positions, normals, uvs, indices)
    # U runs along +X, V along +Y, normal +Z: t == +X, b == +Y.
    np.testing.assert_allclose(t, np.tile([1, 0, 0], (4, 1)), atol=1e-6)
    np.testing.assert_allclose(b, np.tile([0, 1, 0], (4, 1)), atol=1e-6)


def test_orthonormal_and_handedness():
    positions, normals, uvs, indices = _quad(flip_v=True)
    t, b = compute_tangents(positions, normals, uvs, indices)
    # Still unit and orthogonal to n; bitangent flips with V.
    np.testing.assert_allclose(np.linalg.norm(t, axis=1), 1.0, atol=1e-6)
    np.testing.assert_allclose((t * normals).sum(1), 0.0, atol=1e-6)
    np.testing.assert_allclose(b, np.tile([0, -1, 0], (4, 1)), atol=1e-6)


def test_degenerate_uvs_fall_back():
    positions, normals, uvs, indices = _quad()
    t, b = compute_tangents(positions, normals, uvs * 0.0, indices)
    np.testing.assert_allclose(np.linalg.norm(t, axis=1), 1.0, atol=1e-5)
    np.testing.assert_allclose((t * normals).sum(1), 0.0, atol=1e-5)


def test_merge_generates_tangents_from_uvs():
    positions, normals, uvs, indices = _quad()
    mesh = MeshData(positions=positions, indices=indices, normals=normals,
                    uvs=uvs)
    geo = merge_meshes([mesh], [0])
    tan = np.asarray(geo.tangents).T  # planar (3, V) -> (V, 3)
    assert np.abs(tan).max() > 0.5, "tangents were not generated"
    np.testing.assert_allclose(np.linalg.norm(tan, axis=1), 1.0, atol=1e-5)
