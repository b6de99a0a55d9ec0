"""Wide (arity-8) BVH tests: collapse invariants and the Pallas traversal
kernels (interpret mode) vs the XLA brute-force intersector."""

import jax.numpy as jnp
import numpy as np
import pytest

from heatray_tpu.ops import build_woop, intersect_any, intersect_closest
from heatray_tpu.ops.bvh import build_topology
from heatray_tpu.ops.wide_bvh import (
    ARITY,
    build_wide_bvh,
    collapse_topology,
    intersect_any_wide,
    intersect_closest_wide,
)
from heatray_tpu.vec import Vec3

from test_bvh import make_rays, make_soup, planar, v3


class TestCollapse:
    def test_invariants(self):
        positions, indices = make_soup(500, seed=3)
        accel = build_woop(planar(positions), planar(indices))
        topo = build_topology(
            np.asarray(accel.tri_min), np.asarray(accel.tri_max), leaf_size=16
        )
        wbox, wchild, waxis = collapse_topology(topo)
        nw = wbox.shape[0]
        assert wchild.shape == (nw * ARITY,)
        assert waxis.shape == (nw,)

        # Every leaf chunk of the binary tree appears exactly once.
        leaves = sorted(-2 - c for c in wchild if c <= -2)
        assert leaves == list(range(topo.num_chunks))

        # Internal references form a tree over [1, Nw): each non-root node
        # referenced exactly once, no self/backward edges from the walk.
        refs = sorted(c for c in wchild if c >= 0)
        assert refs == list(range(1, nw))

        # Child boxes are contained in (a copy of) the parent's box: child
        # k's box equals some binary node's box, and non-empty child boxes
        # never exceed the root extent.
        root_min = topo.nbox[0, :3]
        root_max = topo.nbox[0, 3:]
        for n in range(nw):
            for k in range(ARITY):
                b = wbox[n, k]
                if b[0] > b[3]:  # empty slot
                    assert wchild[n * ARITY + k] == -1
                    continue
                assert (b[0:3] >= root_min - 1e-5).all()
                assert (b[3:6] <= root_max + 1e-5).all()

    def test_children_sorted_along_axis(self):
        positions, indices = make_soup(300, seed=5)
        accel = build_woop(planar(positions), planar(indices))
        topo = build_topology(
            np.asarray(accel.tri_min), np.asarray(accel.tri_max), leaf_size=16
        )
        wbox, wchild, waxis = collapse_topology(topo)
        for n in range(wbox.shape[0]):
            ax = waxis[n]
            cents = [
                0.5 * (wbox[n, k, ax] + wbox[n, k, 3 + ax])
                for k in range(ARITY)
                if wchild[n * ARITY + k] != -1
            ]
            assert cents == sorted(cents)


@pytest.mark.parametrize("leaf_size", [16, 64])
def test_closest_matches_xla(leaf_size):
    positions, indices = make_soup(700, seed=11)
    accel = build_woop(planar(positions), planar(indices))
    bvh = build_wide_bvh(accel, leaf_size=leaf_size, schedule="f32")
    orig, dirs = make_rays(512, seed=7)
    org, d = v3(planar(orig).T), v3(planar(dirs).T)

    t_ref, id_ref, _, hit_ref = intersect_closest(accel, org, d)
    t_w, id_w, hit_w = intersect_closest_wide(
        bvh, org, d, ray_tile=256, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(hit_ref), np.asarray(hit_w))
    m = np.asarray(hit_ref)
    np.testing.assert_allclose(
        np.asarray(t_ref)[m], np.asarray(t_w)[m], rtol=1e-5, atol=1e-5
    )
    # Ids may differ only at exactly-tied t; allow where t matches.
    same = np.asarray(id_ref)[m] == np.asarray(id_w)[m]
    assert same.mean() > 0.999


def test_any_matches_xla():
    positions, indices = make_soup(700, seed=13)
    accel = build_woop(planar(positions), planar(indices))
    bvh = build_wide_bvh(accel, leaf_size=32, schedule="f32")
    orig, dirs = make_rays(512, seed=17)
    org, d = v3(planar(orig).T), v3(planar(dirs).T)

    blocked_ref = intersect_any(accel, org, d, t_max=5.0)
    blocked_w = intersect_any_wide(
        bvh, org, d, t_max=5.0, ray_tile=256, interpret=True
    )
    np.testing.assert_array_equal(
        np.asarray(blocked_ref), np.asarray(blocked_w)
    )


def test_bf16x3_precision_close():
    """The bf16x3 schedule vs HIGHEST on a worst-case sliver soup.

    With chunk RE-CENTERING (anchors folded into the translation columns in
    float64 at pack time), the 3-pass schedule's error is the 2-way bf16
    split's ~2^-16 per product, amplified only by LOCAL cancellation:
    worst-case ~7e-3 relative t at grazing sliver hits on this adversarial
    soup (vs 2e-2 un-anchored), with the bulk of hits below 1e-4.  This
    test pins that envelope: a regression (losing a split term, or losing
    the anchoring) blows it up."""
    positions, indices = make_soup(400, seed=19)
    accel = build_woop(planar(positions), planar(indices))
    bvh = build_wide_bvh(accel, leaf_size=32, schedule="f32")
    bvh_fused = build_wide_bvh(accel, leaf_size=32)  # default: fused bf16x3
    orig, dirs = make_rays(512, seed=23)
    org, d = v3(planar(orig).T), v3(planar(dirs).T)

    t_hi, id_hi, hit_hi = intersect_closest_wide(
        bvh, org, d, ray_tile=256, interpret=True
    )
    t_b3, id_b3, hit_b3 = intersect_closest_wide(
        bvh_fused, org, d, ray_tile=256, interpret=True
    )
    agree = (np.asarray(hit_hi) == np.asarray(hit_b3)).mean()
    assert agree > 0.998, f"bf16x3 hit agreement {agree}"
    m = np.asarray(hit_hi) & np.asarray(hit_b3)
    rel = np.abs(np.asarray(t_b3)[m] - np.asarray(t_hi)[m]) / np.maximum(
        np.asarray(t_hi)[m], 1e-3
    )
    assert rel.max() < 1e-2, f"bf16x3 max rel t error {rel.max()}"
    assert np.median(rel) < 1e-5, f"bf16x3 median rel t error {np.median(rel)}"


def test_include_filter():
    """The occluder build (include mask) must ignore excluded triangles."""
    positions, indices = make_soup(200, seed=29)
    accel = build_woop(planar(positions), planar(indices))
    include = np.zeros((200,), bool)
    include[:100] = True
    bvh = build_wide_bvh(accel, leaf_size=16, include=include)
    tri = np.asarray(bvh.slot_tri)
    assert (tri[tri >= 0] < 100).all()


@pytest.mark.parametrize("ray_tile", [256, 512])
def test_vpu_closest_matches_xla(ray_tile):
    """The transposed VPU-leaf kernel vs the XLA brute force (exact f32)."""
    from heatray_tpu.ops.wide_bvh import intersect_closest_vpu

    positions, indices = make_soup(700, seed=11)
    accel = build_woop(planar(positions), planar(indices))
    bvh = build_wide_bvh(accel, leaf_size=128, schedule="f32")
    orig, dirs = make_rays(512, seed=7)
    org, d = v3(planar(orig).T), v3(planar(dirs).T)

    t_ref, id_ref, _, hit_ref = intersect_closest(accel, org, d)
    t_v, id_v, hit_v = intersect_closest_vpu(
        bvh, org, d, ray_tile=ray_tile, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(hit_ref), np.asarray(hit_v))
    m = np.asarray(hit_ref)
    np.testing.assert_allclose(
        np.asarray(t_ref)[m], np.asarray(t_v)[m], rtol=1e-5, atol=1e-5
    )
    same = np.asarray(id_ref)[m] == np.asarray(id_v)[m]
    assert same.mean() > 0.999


def test_vpu_any_matches_xla():
    from heatray_tpu.ops.wide_bvh import intersect_any_vpu

    positions, indices = make_soup(700, seed=13)
    accel = build_woop(planar(positions), planar(indices))
    bvh = build_wide_bvh(accel, leaf_size=128, schedule="f32")
    orig, dirs = make_rays(512, seed=17)
    org, d = v3(planar(orig).T), v3(planar(dirs).T)

    blocked_ref = intersect_any(accel, org, d, t_max=5.0)
    blocked_v = intersect_any_vpu(
        bvh, org, d, t_max=5.0, ray_tile=256, interpret=True
    )
    np.testing.assert_array_equal(
        np.asarray(blocked_ref), np.asarray(blocked_v)
    )
