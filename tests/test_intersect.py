"""Intersection kernel tests: Woop-transform intersector vs a brute-force
Moller-Trumbore reference implemented independently here."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from heatray_tpu.ops import (
    MISS_T,
    build_woop,
    hit_attributes,
    intersect_any,
    intersect_closest,
)
from heatray_tpu.vec import Vec3


def v3(a):
    """(N, 3) array -> planar Vec3."""
    return Vec3.from_array(jnp.asarray(a, jnp.float32))


def planar(a):
    """(N, 3) array -> (3, N) planar device array."""
    return jnp.asarray(np.asarray(a).T)


def moller_trumbore_ref(orig, dirs, v0, v1, v2, t_min=1e-4, t_max=3e37):
    """Scalar-ish numpy MT reference: returns (t, id) closest hit."""
    r = orig.shape[0]
    best_t = np.full(r, np.inf)
    best_id = np.full(r, -1, np.int64)
    for ti in range(v0.shape[0]):
        e1 = v1[ti] - v0[ti]
        e2 = v2[ti] - v0[ti]
        p = np.cross(dirs, e2)
        det = p @ e1
        ok = np.abs(det) > 1e-12
        inv = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
        tv = orig - v0[ti]
        u = np.sum(tv * p, axis=1) * inv
        q = np.cross(tv, np.broadcast_to(e1, tv.shape))
        v = np.sum(dirs * q, axis=1) * inv
        t = (q @ e2) * inv
        hit = ok & (u >= -1e-6) & (v >= -1e-6) & (u + v <= 1 + 1e-6)
        hit &= (t > t_min) & (t < t_max) & (t < best_t)
        best_t = np.where(hit, t, best_t)
        best_id = np.where(hit, ti, best_id)
    return best_t, best_id


@pytest.fixture(scope="module")
def random_tris():
    rng = np.random.default_rng(0)
    t = 64
    v0 = rng.uniform(-2, 2, (t, 3)).astype(np.float32)
    v1 = v0 + rng.uniform(-1, 1, (t, 3)).astype(np.float32)
    v2 = v0 + rng.uniform(-1, 1, (t, 3)).astype(np.float32)
    positions = np.concatenate([v0, v1, v2])
    indices = np.arange(3 * t, dtype=np.int32).reshape(3, t).T
    return positions, indices, v0, v1, v2


@pytest.fixture(scope="module")
def random_rays():
    rng = np.random.default_rng(1)
    r = 256
    orig = rng.uniform(-4, 4, (r, 3)).astype(np.float32)
    # Aim at random points inside the triangle cloud so most rays hit.
    target = rng.uniform(-1.5, 1.5, (r, 3)).astype(np.float32)
    dirs = target - orig
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    return orig, dirs


class TestClosestHit:
    def test_matches_reference(self, random_tris, random_rays):
        positions, indices, v0, v1, v2 = random_tris
        orig, dirs = random_rays
        accel = build_woop(planar(positions), planar(indices))
        t, tid, front, hit = intersect_closest(
            accel, v3(orig), v3(dirs), tri_chunk=16
        )
        rt, rid = moller_trumbore_ref(
            orig.astype(np.float64), dirs.astype(np.float64),
            v0.astype(np.float64), v1.astype(np.float64), v2.astype(np.float64),
        )
        t, tid, hit = np.asarray(t), np.asarray(tid), np.asarray(hit)
        assert (rid >= 0).sum() > 20, "test scene should produce hits"
        agree = (tid == rid) | (~hit & (rid < 0))
        # Allow rare disagreements from f32 vs f64 tie-breaks on overlapping
        # random triangles.
        assert agree.mean() > 0.97, f"only {agree.mean():.2%} ids agree"
        both = hit & (rid >= 0) & (tid == rid)
        assert np.allclose(t[both], rt[both], rtol=2e-3, atol=2e-4)

    def test_miss_is_minus_one(self, random_tris):
        positions, indices, *_ = random_tris
        accel = build_woop(planar(positions), planar(indices))
        t, tid, front, hit = intersect_closest(
            accel, v3([[100.0, 100.0, 100.0]]), v3([[1.0, 0.0, 0.0]])
        )
        assert int(tid[0]) == -1 and not bool(hit[0])
        assert float(t[0]) == float(MISS_T)

    def test_front_facing(self):
        # CCW triangle in the XY plane, normal +Z.
        positions = [[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]
        accel = build_woop(planar(positions), planar(np.array([[0, 1, 2]])))
        # Ray from +Z looking down: hits the front face.
        o = v3([[0.2, 0.2, 1.0], [0.2, 0.2, -1.0]])
        d = v3([[0.0, 0.0, -1.0], [0.0, 0.0, 1.0]])
        t, tid, front, hit = intersect_closest(accel, o, d)
        assert bool(hit[0]) and bool(hit[1])
        assert bool(front[0]) and not bool(front[1])

    def test_t_min_skips_origin_surface(self):
        positions = [[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0],
                     [0.0, 0.0, -1.0], [1.0, 0.0, -1.0], [0.0, 1.0, -1.0]]
        accel = build_woop(
            planar(positions), planar(np.array([[0, 1, 2], [3, 4, 5]]))
        )
        o = v3([[0.2, 0.2, 0.0]])  # on triangle 0
        d = v3([[0.0, 0.0, -1.0]])
        t, tid, front, hit = intersect_closest(accel, o, d, t_min=1e-4)
        assert int(tid[0]) == 1  # should skip the coplanar start surface
        assert np.isclose(float(t[0]), 1.0, atol=1e-5)


class TestOcclusion:
    def test_blocked_and_free(self, random_tris):
        positions, indices, v0, v1, v2 = random_tris
        accel = build_woop(planar(positions), planar(indices))
        centroid = (v0[7] + v1[7] + v2[7]) / 3.0
        o = np.array([[0.0, 0.0, -10.0], [100.0, 100.0, 100.0]], np.float32)
        d = np.stack(
            [centroid - o[0], np.array([0.0, 0.0, 1.0], np.float32)]
        )
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        blocked = intersect_any(accel, v3(o), v3(d), tri_chunk=16)
        assert bool(blocked[0])  # aimed through a triangle centroid
        assert not bool(blocked[1])

    def test_max_t_limits(self):
        positions = [[-1.0, -1.0, 5.0], [1.0, -1.0, 5.0], [0.0, 2.0, 5.0]]
        accel = build_woop(planar(positions), planar(np.array([[0, 1, 2]])))
        o = v3(np.zeros((2, 3)))
        d = v3([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
        t_max = jnp.array([10.0, 2.0])  # second ray stops before the tri
        blocked = intersect_any(accel, o, d, t_max=t_max)
        assert bool(blocked[0]) and not bool(blocked[1])


class TestHitAttributes:
    def test_barycentric_and_grad(self):
        positions = [[0.0, 0.0, 0.0], [2.0, 0.0, 0.0], [0.0, 2.0, 0.0]]
        accel = build_woop(planar(positions), planar(np.array([[0, 1, 2]])))
        o = v3([[0.5, 0.5, 3.0]])
        d = v3([[0.0, 0.0, -1.0]])
        t, tid, front, hit = intersect_closest(accel, o, d)
        t2, b1, b2 = hit_attributes(accel, o, d, tid, hit)
        assert np.isclose(float(t2[0]), 3.0, atol=1e-5)
        assert np.isclose(float(b1[0]), 0.25, atol=1e-5)
        assert np.isclose(float(b2[0]), 0.25, atol=1e-5)

        # Gradients flow to the ray origin through hit_attributes.
        def f(oa):
            t2, _, _ = hit_attributes(accel, Vec3.from_array(oa), d, tid, hit)
            return t2[0]

        g = jax.grad(f)(jnp.array([[0.5, 0.5, 3.0]]))
        assert np.allclose(np.asarray(g[0]), [0.0, 0.0, 1.0], atol=1e-5)
