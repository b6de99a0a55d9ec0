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


# --- OFF ------------------------------------------------------------------


def test_off_ascii(tmp_path):
    from heatray_tpu.scene.loaders import load_off

    p = tmp_path / "quad.off"
    p.write_text(
        "OFF\n# a quad\n4 1 0\n"
        "0 0 0\n1 0 0\n1 1 0\n0 1 0\n"
        "4 0 1 2 3\n"
    )
    meshes, mats = load_off(str(p), scale=2.0)
    assert len(meshes) == 1
    m = meshes[0]
    assert m.indices.shape == (2, 3)  # quad fan-triangulated
    np.testing.assert_allclose(m.positions[:4], QUAD_V * 2.0)


def test_coff_vertex_colors(tmp_path):
    from heatray_tpu.scene.loaders import load_off

    p = tmp_path / "tri.off"
    p.write_text(
        "COFF\n3 1 0\n"
        "0 0 0 255 0 0 255\n1 0 0 0 255 0 255\n0 1 0 0 0 255 255\n"
        "3 0 1 2\n"
    )
    meshes, _ = load_off(str(p))
    c = meshes[0].colors
    assert c is not None
    np.testing.assert_allclose(c[0], [1.0, 0.0, 0.0])
    np.testing.assert_allclose(c[2], [0.0, 0.0, 1.0])


# --- COLLADA --------------------------------------------------------------

_DAE_DOC = """<?xml version="1.0" encoding="utf-8"?>
<COLLADA xmlns="http://www.collada.org/2005/11/COLLADASchema" version="1.4.1">
  <asset><unit name="centimeter" meter="0.01"/><up_axis>Z_UP</up_axis></asset>
  <library_effects>
    <effect id="red-fx"><profile_COMMON><technique sid="common">
      <phong>
        <diffuse><color>0.8 0.1 0.1 1</color></diffuse>
        <emission><color>0 0 0 1</color></emission>
        <shininess><float>50</float></shininess>
      </phong>
    </technique></profile_COMMON></effect>
    <effect id="glass-fx"><profile_COMMON><technique sid="common">
      <phong>
        <diffuse><color>0.9 0.9 1.0 1</color></diffuse>
        <transparency><float>0.2</float></transparency>
        <index_of_refraction><float>1.45</float></index_of_refraction>
      </phong>
    </technique></profile_COMMON></effect>
  </library_effects>
  <library_materials>
    <material id="red-mat" name="Red"><instance_effect url="#red-fx"/></material>
    <material id="glass-mat" name="Glass"><instance_effect url="#glass-fx"/></material>
  </library_materials>
  <library_geometries>
    <geometry id="quad-geo" name="quad">
      <mesh>
        <source id="pos">
          <float_array id="pos-arr" count="12">0 0 0  1 0 0  1 1 0  0 1 0</float_array>
          <technique_common><accessor source="#pos-arr" count="4" stride="3">
            <param name="X" type="float"/><param name="Y" type="float"/><param name="Z" type="float"/>
          </accessor></technique_common>
        </source>
        <source id="nrm">
          <float_array id="nrm-arr" count="3">0 0 1</float_array>
          <technique_common><accessor source="#nrm-arr" count="1" stride="3"/></technique_common>
        </source>
        <vertices id="verts"><input semantic="POSITION" source="#pos"/></vertices>
        <polylist material="MAT" count="1">
          <input semantic="VERTEX" source="#verts" offset="0"/>
          <input semantic="NORMAL" source="#nrm" offset="1"/>
          <vcount>4</vcount>
          <p>0 0 1 0 2 0 3 0</p>
        </polylist>
      </mesh>
    </geometry>
    <geometry id="tri-geo" name="tri">
      <mesh>
        <source id="tpos">
          <float_array id="tpos-arr" count="9">0 0 0  1 0 0  0 1 0</float_array>
          <technique_common><accessor source="#tpos-arr" count="3" stride="3"/></technique_common>
        </source>
        <vertices id="tverts"><input semantic="POSITION" source="#tpos"/></vertices>
        <triangles material="GMAT" count="1">
          <input semantic="VERTEX" source="#tverts" offset="0"/>
          <p>0 1 2</p>
        </triangles>
      </mesh>
    </geometry>
  </library_geometries>
  <library_visual_scenes>
    <visual_scene id="scene">
      <node id="n1">
        <translate>0 0 5</translate>
        <instance_geometry url="#quad-geo">
          <bind_material><technique_common>
            <instance_material symbol="MAT" target="#red-mat"/>
          </technique_common></bind_material>
        </instance_geometry>
        <node id="n2">
          <scale>2 2 2</scale>
          <instance_geometry url="#tri-geo">
            <bind_material><technique_common>
              <instance_material symbol="GMAT" target="#glass-mat"/>
            </technique_common></bind_material>
          </instance_geometry>
        </node>
      </node>
    </visual_scene>
  </library_visual_scenes>
  <scene><instance_visual_scene url="#scene"/></scene>
</COLLADA>
"""


def test_dae_geometry_transforms_materials(tmp_path):
    from heatray_tpu.scene.loaders import load_dae
    from heatray_tpu.scene.materials import GlassParams, PBRParams

    p = tmp_path / "scene.dae"
    p.write_text(_DAE_DOC)
    meshes, mats = load_dae(str(p))
    assert len(meshes) == 2
    quad = next(m for m in meshes if m.name == "quad")
    tri = next(m for m in meshes if m.name == "tri")

    # Quad: translated (0,0,5), Z_UP -> Y_UP ((x,y,z) -> (x,z,-y)), unit
    # 0.01: vertex (1,1,0) -> +5z -> (1,1,5) -> (1,5,-1) -> cm scale.
    assert quad.indices.shape == (2, 3)
    got = quad.positions
    expect = np.array([
        [0, 5, 0], [1, 5, 0], [1, 5, -1], [0, 5, -1]
    ], np.float32) * 0.01
    np.testing.assert_allclose(got, expect, atol=1e-6)
    # Normal rotated by the up-axis conversion: +z -> +y.
    np.testing.assert_allclose(quad.normals[0], [0, 1, 0], atol=1e-6)

    # Tri: nested scale 2 under the translate.
    np.testing.assert_allclose(
        tri.positions[1], np.array([2, 5, 0], np.float32) * 0.01, atol=1e-6
    )

    mat_by_name = {getattr(m, "name", ""): m for m in mats}
    assert isinstance(mat_by_name["Red"], PBRParams)
    np.testing.assert_allclose(mat_by_name["Red"].base_color, (0.8, 0.1, 0.1))
    assert 0.04 < mat_by_name["Red"].roughness < 0.5  # shininess-mapped
    assert isinstance(mat_by_name["Glass"], GlassParams)
    assert abs(mat_by_name["Glass"].ior - 1.45) < 1e-6


def test_dae_scene_assembly(tmp_path):
    p = tmp_path / "scene.dae"
    p.write_text(_DAE_DOC)
    scene = load_model_scene(str(p))
    assert int(scene.geometry.num_triangles) == 3
