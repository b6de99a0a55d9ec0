"""Native host-accelerator tests: the C++ library must agree bit-for-bit
with the numpy fallbacks (Morton order, normals) and parse OBJ correctly."""

import numpy as np
import pytest

from heatray_tpu import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


class TestMorton:
    def test_matches_numpy(self):
        from heatray_tpu.scene.geometry import _morton_order

        rng = np.random.default_rng(3)
        pos = rng.standard_normal((500, 3)).astype(np.float32)
        idx = rng.integers(0, 500, (300, 3)).astype(np.int32)
        assert np.array_equal(
            native.morton_order(pos, idx), _morton_order(pos, idx)
        )


class TestNormals:
    def test_matches_numpy(self):
        rng = np.random.default_rng(4)
        pos = rng.standard_normal((200, 3)).astype(np.float32)
        idx = rng.integers(0, 200, (150, 3)).astype(np.int32)
        fast = native.vertex_normals(pos, idx)
        # numpy reference (inline to avoid the native fast path)
        v0, v1, v2 = pos[idx[:, 0]], pos[idx[:, 1]], pos[idx[:, 2]]
        fn = np.cross(v1 - v0, v2 - v0)
        ref = np.zeros_like(pos)
        for k in range(3):
            np.add.at(ref, idx[:, k], fn)
        ref /= np.maximum(np.linalg.norm(ref, axis=-1, keepdims=True), 1e-20)
        assert np.allclose(fast, ref, atol=1e-5)


class TestObjParse:
    def test_triangulation_and_indices(self):
        obj = b"""# comment
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
vt 0 0
vt 1 0
vn 0 0 1
f 1/1/1 2/2/1 3/1/1 4/2/1
f -4 -3 -2
"""
        v, vt, vn, fv, ft, fn = native.parse_obj(obj)
        assert v.shape == (4, 3) and vt.shape == (2, 2) and vn.shape == (1, 3)
        assert fv.tolist() == [[0, 1, 2], [0, 2, 3], [0, 1, 2]]
        assert ft.tolist()[0] == [0, 1, 0]
        assert ft.tolist()[2] == [-1, -1, -1]  # bare v face: no vt
        assert fn.tolist()[0] == [0, 0, 0]

    def test_loader_fast_path(self, tmp_path):
        from heatray_tpu.scene.loaders.obj import load_obj

        p = tmp_path / "tri.obj"
        p.write_text("v 0 0 0\nv 2 0 0\nv 0 2 0\nf 1 2 3\n")
        meshes, mats = load_obj(str(p), scale=0.5)
        assert len(meshes) == 1
        np.testing.assert_allclose(
            meshes[0].positions, [[0, 0, 0], [1, 0, 0], [0, 1, 0]]
        )
        assert meshes[0].indices.tolist() == [[0, 1, 2]]
