"""PLY / STL loader tests: ascii + binary round trips, scale, scene assembly."""

import struct

import numpy as np

from heatray_tpu.scene.loaders import load_model_scene, load_ply, load_stl

QUAD_V = np.array(
    [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32
)


def _write_ascii_ply(path, with_extras=False):
    props = "property float x\nproperty float y\nproperty float z\n"
    if with_extras:
        props += (
            "property float nx\nproperty float ny\nproperty float nz\n"
            "property float u\nproperty float v\n"
            "property uchar red\nproperty uchar green\nproperty uchar blue\n"
        )
    lines = [
        "ply", "format ascii 1.0",
        "element vertex 4",
        props.strip(),
        "element face 1",
        "property list uchar int vertex_indices",
        "end_header",
    ]
    for i, v in enumerate(QUAD_V):
        row = f"{v[0]} {v[1]} {v[2]}"
        if with_extras:
            row += f" 0 0 1 {0.1 * i} {0.2 * i} 255 128 0"
        lines.append(row)
    lines.append("4 0 1 2 3")  # quad -> fan-triangulates to 2 tris
    path.write_text("\n".join(lines) + "\n")


def _write_binary_ply(path):
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        "element vertex 4\n"
        "property float x\nproperty float y\nproperty float z\n"
        "element face 2\n"
        "property list uchar int vertex_indices\n"
        "end_header\n"
    ).encode()
    body = QUAD_V.astype("<f4").tobytes()
    for tri in ((0, 1, 2), (0, 2, 3)):
        body += struct.pack("<B3i", 3, *tri)
    path.write_bytes(header + body)


def _write_binary_stl(path, n=2):
    data = b"\x00" * 80 + struct.pack("<I", n)
    tris = [
        (QUAD_V[0], QUAD_V[1], QUAD_V[2]),
        (QUAD_V[0], QUAD_V[2], QUAD_V[3]),
    ][:n]
    for a, b, c in tris:
        data += struct.pack("<3f", 0, 0, 1)
        for v in (a, b, c):
            data += struct.pack("<3f", *v)
        data += struct.pack("<H", 0)
    path.write_bytes(data)


class TestPLY:
    def test_ascii_quad(self, tmp_path):
        p = tmp_path / "quad.ply"
        _write_ascii_ply(p)
        meshes, mats = load_ply(str(p))
        (m,) = meshes
        assert m.positions.shape == (4, 3)
        assert m.indices.shape == (2, 3)  # fan-triangulated quad
        np.testing.assert_array_equal(m.indices, [[0, 1, 2], [0, 2, 3]])

    def test_ascii_extras(self, tmp_path):
        p = tmp_path / "full.ply"
        _write_ascii_ply(p, with_extras=True)
        (m,), _ = load_ply(str(p))
        np.testing.assert_allclose(m.normals, [[0, 0, 1]] * 4)
        np.testing.assert_allclose(m.uvs[:, 0], [0, 0.1, 0.2, 0.3], atol=1e-6)
        # uchar colors normalize to [0, 1]
        np.testing.assert_allclose(m.colors[0], [1.0, 128 / 255.0, 0.0])

    def test_binary_matches_ascii(self, tmp_path):
        pa, pb = tmp_path / "a.ply", tmp_path / "b.ply"
        _write_ascii_ply(pa)
        _write_binary_ply(pb)
        (ma,), _ = load_ply(str(pa))
        (mb,), _ = load_ply(str(pb))
        np.testing.assert_allclose(ma.positions, mb.positions)
        np.testing.assert_array_equal(ma.indices, mb.indices)

    def test_scale(self, tmp_path):
        p = tmp_path / "s.ply"
        _write_ascii_ply(p)
        (m,), _ = load_ply(str(p), scale=0.01)  # cm -> m
        assert np.isclose(m.positions.max(), 0.01)


class TestSTL:
    def test_binary(self, tmp_path):
        p = tmp_path / "quad.stl"
        _write_binary_stl(p)
        (m,), mats = load_stl(str(p))
        assert m.indices.shape == (2, 3)
        assert m.positions.shape == (4, 3)  # soup deduplicated

    def test_ascii(self, tmp_path):
        p = tmp_path / "tri.stl"
        p.write_text(
            "solid tri\n facet normal 0 0 1\n  outer loop\n"
            "   vertex 0 0 0\n   vertex 1 0 0\n   vertex 0 1 0\n"
            "  endloop\n endfacet\nendsolid tri\n"
        )
        (m,), _ = load_stl(str(p))
        assert m.indices.shape == (1, 3)
        assert m.positions.shape == (3, 3)


def test_scene_assembly(tmp_path):
    from heatray_tpu.scene.lights import EnvironmentLightDesc

    env = EnvironmentLightDesc()
    p = tmp_path / "quad.ply"
    _write_ascii_ply(p)
    scene = load_model_scene(str(p), env=env)
    assert int(scene.geometry.num_triangles) == 2

    s = tmp_path / "quad.stl"
    _write_binary_stl(s)
    scene = load_model_scene(str(s), env=env)
    assert int(scene.geometry.num_triangles) == 2
