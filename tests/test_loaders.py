"""Model loader tests: OBJ (incl. the native fast path), glTF with
embedded buffers/textures/lights (the reference's Assimp role)."""

import base64
import io
import json
import struct

import numpy as np
import pytest

from heatray_tpu.scene.loaders import load_model_scene
from heatray_tpu.scene.loaders.obj import load_obj


class TestObj:
    def test_groups_and_mtl(self, tmp_path):
        (tmp_path / "m.mtl").write_text(
            "newmtl red\nKd 0.8 0.1 0.1\nNs 10\n"
        )
        obj = (
            "mtllib m.mtl\n"
            "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\n"
            "usemtl red\nf 1 2 3\n"
            "usemtl other\nf 2 4 3\n"
        )
        p = tmp_path / "two.obj"
        p.write_text(obj)
        meshes, mats = load_obj(str(p))
        assert len(meshes) == 2
        red = mats[[m.name for m in meshes].index("red")]
        assert np.allclose(red.base_color, (0.8, 0.1, 0.1), atol=1e-6)

    def test_scene_assembly(self, tmp_path):
        p = tmp_path / "tri.obj"
        p.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
        scene = load_model_scene(str(p))
        assert scene.geometry.num_triangles == 1


def _png_bytes(color):
    from PIL import Image

    img = Image.fromarray(
        np.full((2, 2, 3), color, np.uint8), mode="RGB"
    )
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


def _minimal_gltf(tmp_path, with_texture=True):
    # One triangle with positions + uvs, one material with a baseColor
    # texture (data-uri PNG), one point light.
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    uv = np.array([[0, 0], [1, 0], [0, 1]], np.float32)
    idx = np.array([0, 1, 2], np.uint16)
    blob = pos.tobytes() + uv.tobytes() + idx.tobytes()
    gltf = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0, 1]}],
        "nodes": [
            {"mesh": 0},
            {
                "extensions": {"KHR_lights_punctual": {"light": 0}},
                "translation": [0.0, 2.0, 0.0],
            },
        ],
        "extensions": {
            "KHR_lights_punctual": {
                "lights": [{"type": "point", "intensity": 683.0}]
            }
        },
        "meshes": [{
            "primitives": [{
                "attributes": {"POSITION": 0, "TEXCOORD_0": 1},
                "indices": 2,
                "material": 0,
            }]
        }],
        "materials": [{
            "name": "tex",
            "pbrMetallicRoughness": {
                "baseColorFactor": [1, 1, 1, 1],
                "roughnessFactor": 1.0,
                "metallicFactor": 0.0,
            },
        }],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 3, "type": "VEC2"},
            {"bufferView": 2, "componentType": 5123, "count": 3, "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 36},
            {"buffer": 0, "byteOffset": 36, "byteLength": 24},
            {"buffer": 0, "byteOffset": 60, "byteLength": 6},
        ],
        "buffers": [{
            "byteLength": len(blob),
            "uri": "data:application/octet-stream;base64,"
            + base64.b64encode(blob).decode(),
        }],
    }
    if with_texture:
        png = _png_bytes((255, 0, 0))
        gltf["images"] = [{
            "uri": "data:image/png;base64," + base64.b64encode(png).decode()
        }]
        gltf["textures"] = [{"source": 0}]
        gltf["materials"][0]["pbrMetallicRoughness"]["baseColorTexture"] = {
            "index": 0
        }
    p = tmp_path / "scene.gltf"
    p.write_text(json.dumps(gltf))
    return str(p)


class TestGltf:
    def test_textured_scene(self, tmp_path):
        pytest.importorskip("PIL")
        path = _minimal_gltf(tmp_path, with_texture=True)
        scene = load_model_scene(path)
        assert scene.geometry.num_triangles == 1
        assert scene.has_textures
        assert int(scene.materials.base_color_tex[0]) >= 0
        # Red PNG (sRGB 255,0,0 -> linear 1,0,0) in the atlas.
        atlas = np.asarray(scene.atlas.data)
        assert np.isclose(atlas[0].max(), 1.0, atol=1e-3)
        # Point light imported.
        assert int(scene.lights.num_point) == 1

    def test_untextured_scene(self, tmp_path):
        path = _minimal_gltf(tmp_path, with_texture=False)
        scene = load_model_scene(path)
        assert not scene.has_textures
        assert int(scene.materials.base_color_tex[0]) == -1
