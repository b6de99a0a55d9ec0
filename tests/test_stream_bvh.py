"""HBM-streaming wide-BVH traversal tests (interpret mode) vs the XLA
brute-force intersector, plus the large-scene backend auto-selection."""

import numpy as np
import pytest

from heatray_tpu.ops import build_woop, intersect_any, intersect_closest
from heatray_tpu.ops.wide_bvh import (
    build_wide_bvh,
    intersect_any_stream,
    intersect_closest_stream,
)

from test_bvh import make_rays, make_soup, planar, v3


@pytest.mark.parametrize("leaf_size", [32, 128])
def test_closest_stream_matches_xla(leaf_size):
    positions, indices = make_soup(700, seed=11)
    accel = build_woop(planar(positions), planar(indices))
    bvh = build_wide_bvh(accel, leaf_size=leaf_size, schedule="f32")
    orig, dirs = make_rays(512, seed=7)
    org, d = v3(planar(orig).T), v3(planar(dirs).T)

    t_ref, id_ref, _, hit_ref = intersect_closest(accel, org, d)
    t_s, id_s, hit_s = intersect_closest_stream(
        bvh, org, d, ray_tile=256, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(hit_ref), np.asarray(hit_s))
    m = np.asarray(hit_ref)
    np.testing.assert_allclose(
        np.asarray(t_ref)[m], np.asarray(t_s)[m], rtol=1e-5, atol=1e-5
    )
    same = np.asarray(id_ref)[m] == np.asarray(id_s)[m]
    assert same.mean() > 0.999


def test_any_stream_matches_xla():
    positions, indices = make_soup(700, seed=13)
    accel = build_woop(planar(positions), planar(indices))
    bvh = build_wide_bvh(accel, leaf_size=64, schedule="f32")
    orig, dirs = make_rays(512, seed=17)
    org, d = v3(planar(orig).T), v3(planar(dirs).T)

    blocked_ref = intersect_any(accel, org, d, t_max=5.0)
    blocked_s = intersect_any_stream(
        bvh, org, d, t_max=5.0, ray_tile=256, interpret=True
    )
    np.testing.assert_array_equal(
        np.asarray(blocked_ref), np.asarray(blocked_s)
    )


def test_backend_auto_selects_stream_past_vmem_budget():
    from heatray_tpu.options import RenderOptions
    from heatray_tpu.render.integrator import _select_backend

    options = RenderOptions(intersect_backend="auto")
    small = _select_backend(options, 10_000)
    big = _select_backend(options, 1_000_000)
    import jax

    if jax.default_backend() in ("cpu", "gpu"):
        assert small == big == "xla"
    else:
        assert small == "wide"
        assert big == "stream"


def test_closest_stream_vpu_matches_xla():
    positions, indices = make_soup(700, seed=19)
    accel = build_woop(planar(positions), planar(indices))
    bvh = build_wide_bvh(accel, leaf_size=128, schedule="f32")
    orig, dirs = make_rays(512, seed=23)
    org, d = v3(planar(orig).T), v3(planar(dirs).T)

    t_ref, id_ref, _, hit_ref = intersect_closest(accel, org, d)
    t_s, id_s, hit_s = intersect_closest_stream(
        bvh, org, d, ray_tile=256, interpret=True, leaf_math="vpu"
    )
    np.testing.assert_array_equal(np.asarray(hit_ref), np.asarray(hit_s))
    m = np.asarray(hit_ref)
    np.testing.assert_allclose(
        np.asarray(t_ref)[m], np.asarray(t_s)[m], rtol=1e-5, atol=1e-5
    )
    same = np.asarray(id_ref)[m] == np.asarray(id_s)[m]
    assert same.mean() > 0.999


def test_any_stream_vpu_matches_xla():
    positions, indices = make_soup(700, seed=29)
    accel = build_woop(planar(positions), planar(indices))
    bvh = build_wide_bvh(accel, leaf_size=128, schedule="f32")
    orig, dirs = make_rays(512, seed=31)
    org, d = v3(planar(orig).T), v3(planar(dirs).T)

    blocked_ref = intersect_any(accel, org, d, t_max=5.0)
    blocked_s = intersect_any_stream(
        bvh, org, d, t_max=5.0, ray_tile=256, interpret=True,
        leaf_math="vpu",
    )
    np.testing.assert_array_equal(
        np.asarray(blocked_ref), np.asarray(blocked_s)
    )
