"""BVH tests: builder invariants, numpy traversal oracle vs brute force,
and the Pallas traversal kernels (interpret mode) vs the XLA intersector."""

import jax.numpy as jnp
import numpy as np
import pytest

from heatray_tpu.ops import build_woop, intersect_any, intersect_closest
from heatray_tpu.ops.bvh import (
    build_bvh,
    build_topology,
    pack_bvh,
    traverse_closest_numpy,
)
from heatray_tpu.ops.traverse_pallas import (
    intersect_any_bvh,
    intersect_closest_bvh,
)
from heatray_tpu.vec import Vec3


def v3(a):
    return Vec3.from_array(jnp.asarray(a, jnp.float32))


def planar(a):
    return jnp.asarray(np.asarray(a).T)


def make_soup(t, seed=0, spread=4.0):
    rng = np.random.default_rng(seed)
    v0 = rng.uniform(-spread, spread, (t, 3)).astype(np.float32)
    v1 = v0 + rng.uniform(-0.5, 0.5, (t, 3)).astype(np.float32)
    v2 = v0 + rng.uniform(-0.5, 0.5, (t, 3)).astype(np.float32)
    positions = np.concatenate([v0, v1, v2])
    indices = np.arange(3 * t, dtype=np.int32).reshape(t, 3)
    return positions, indices


def make_rays(r, seed=1, spread=4.0):
    rng = np.random.default_rng(seed)
    orig = rng.uniform(-2 * spread, 2 * spread, (r, 3)).astype(np.float32)
    target = rng.uniform(-spread / 2, spread / 2, (r, 3)).astype(np.float32)
    dirs = target - orig
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    return orig, dirs


class TestTopology:
    def test_invariants(self):
        positions, indices = make_soup(500, seed=3)
        accel = build_woop(planar(positions), planar(indices))
        topo = build_topology(
            np.asarray(accel.tri_min), np.asarray(accel.tri_max), leaf_size=16
        )
        # Every triangle lands in exactly one slot.
        tri = topo.slot_tri[topo.slot_tri >= 0]
        assert sorted(tri.tolist()) == list(range(500))
        # Skip pointers are a valid preorder: walking "always skip" from the
        # root's children partitions [1, N).
        n = topo.num_nodes
        assert topo.skip[0] == n
        i = 1
        while i < n:
            assert 0 < topo.skip[i] <= n
            nxt = topo.skip[i] if topo.leaf_chunk[i] < 0 else i + 1
            assert topo.leaf_chunk[i] >= 0 or nxt > i
            i += 1
        # Leaf boxes contain their triangles.
        tmin = np.asarray(accel.tri_min)
        tmax = np.asarray(accel.tri_max)
        tc = topo.leaf_size
        for ni in range(n):
            c = topo.leaf_chunk[ni]
            if c < 0:
                continue
            slots = topo.slot_tri[c * tc : (c + 1) * tc]
            slots = slots[slots >= 0]
            assert (tmin[:, slots].T >= topo.nbox[ni, :3] - 1e-5).all()
            assert (tmax[:, slots].T <= topo.nbox[ni, 3:] + 1e-5).all()

    def test_single_leaf_tiny_scene(self):
        positions, indices = make_soup(5)
        accel = build_woop(planar(positions), planar(indices))
        topo = build_topology(
            np.asarray(accel.tri_min), np.asarray(accel.tri_max), leaf_size=16
        )
        assert topo.num_nodes == 1 and topo.leaf_chunk[0] == 0

    def test_include_mask(self):
        positions, indices = make_soup(64)
        accel = build_woop(planar(positions), planar(indices))
        include = np.zeros(64, bool)
        include[::2] = True
        topo = build_topology(
            np.asarray(accel.tri_min),
            np.asarray(accel.tri_max),
            leaf_size=8,
            include=include,
        )
        tri = topo.slot_tri[topo.slot_tri >= 0]
        assert sorted(tri.tolist()) == list(range(0, 64, 2))


class TestNativeBuilder:
    def test_native_and_numpy_traverse_identically(self, monkeypatch):
        """The C++ builder and its numpy twin may tie-break differently but
        must produce trees that return the same closest hits."""
        from heatray_tpu import native

        if not native.available():
            pytest.skip("native library unavailable")
        positions, indices = make_soup(400, seed=13)
        accel = build_woop(planar(positions), planar(indices))
        tmin, tmax = np.asarray(accel.tri_min), np.asarray(accel.tri_max)
        topo_native = build_topology(tmin, tmax, leaf_size=16)
        monkeypatch.setattr(native, "bvh_build", lambda *a: None)
        topo_numpy = build_topology(tmin, tmax, leaf_size=16)
        assert sorted(topo_native.slot_tri[topo_native.slot_tri >= 0]) == sorted(
            topo_numpy.slot_tri[topo_numpy.slot_tri >= 0]
        )
        orig, dirs = make_rays(64, seed=14)
        w = np.asarray(accel.w)
        for k in range(orig.shape[0]):
            t_a, id_a = traverse_closest_numpy(topo_native, w, orig[k], dirs[k])
            t_b, id_b = traverse_closest_numpy(topo_numpy, w, orig[k], dirs[k])
            assert id_a == id_b and np.isclose(t_a, t_b, rtol=1e-5)


class TestNumpyTraversal:
    def test_matches_brute_force(self):
        positions, indices = make_soup(300, seed=5)
        accel = build_woop(planar(positions), planar(indices))
        topo = build_topology(
            np.asarray(accel.tri_min), np.asarray(accel.tri_max), leaf_size=8
        )
        orig, dirs = make_rays(64, seed=6)
        t_ref, id_ref, _, hit_ref = intersect_closest(
            accel, v3(orig), v3(dirs), tri_chunk=32
        )
        w = np.asarray(accel.w)
        hits = 0
        for k in range(orig.shape[0]):
            t, tid = traverse_closest_numpy(topo, w, orig[k], dirs[k])
            assert tid == int(id_ref[k]), f"ray {k}: {tid} vs {int(id_ref[k])}"
            if tid >= 0:
                hits += 1
                assert np.isclose(t, float(t_ref[k]), rtol=1e-4)
        assert hits > 20


class TestPallasTraversal:
    @pytest.fixture(scope="class")
    def scene(self):
        positions, indices = make_soup(200, seed=7)
        accel = build_woop(planar(positions), planar(indices))
        bvh = build_bvh(accel, leaf_size=16)
        return accel, bvh

    def test_closest_matches_xla(self, scene):
        accel, bvh = scene
        orig, dirs = make_rays(300, seed=8)
        t_ref, id_ref, _, hit_ref = intersect_closest(
            accel, v3(orig), v3(dirs), tri_chunk=32
        )
        t, tid, hit = intersect_closest_bvh(
            bvh, v3(orig), v3(dirs), ray_tile=128, interpret=True
        )
        assert int(np.sum(np.asarray(hit_ref))) > 100
        np.testing.assert_array_equal(np.asarray(hit), np.asarray(hit_ref))
        np.testing.assert_array_equal(np.asarray(tid), np.asarray(id_ref))
        m = np.asarray(hit)
        assert np.allclose(
            np.asarray(t)[m], np.asarray(t_ref)[m], rtol=1e-5, atol=1e-6
        )

    def test_any_matches_xla(self, scene):
        accel, bvh = scene
        orig, dirs = make_rays(300, seed=9)
        rng = np.random.default_rng(10)
        t_max = jnp.asarray(rng.uniform(1.0, 20.0, (300,)).astype(np.float32))
        b_ref = intersect_any(accel, v3(orig), v3(dirs), t_max=t_max)
        b = intersect_any_bvh(
            bvh, v3(orig), v3(dirs), t_max=t_max, ray_tile=128, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(b), np.asarray(b_ref))

    def test_occluder_subset(self):
        positions, indices = make_soup(64, seed=11)
        accel = build_woop(planar(positions), planar(indices))
        include = np.zeros(64, bool)
        include[32:] = True
        bvh = build_bvh(accel, leaf_size=8, include=include)
        orig, dirs = make_rays(128, seed=12)
        # Reference: zero out the excluded half's Woop rows (never hit).
        mask = jnp.asarray(include.astype(np.float32))
        big = jnp.float32(3.0e38)
        accel_sub = accel.replace(
            w=accel.w * mask[None, :],
            tri_min=jnp.where(mask[None, :] > 0, accel.tri_min, big),
            tri_max=jnp.where(mask[None, :] > 0, accel.tri_max, -big),
        )
        b_ref = intersect_any(accel_sub, v3(orig), v3(dirs), t_max=50.0)
        b = intersect_any_bvh(
            bvh, v3(orig), v3(dirs), t_max=50.0, ray_tile=128, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(b), np.asarray(b_ref))
