"""Host-sharded geometry tests: closest/any over a Morton-split shard forest
matches the monolithic intersector on the virtual 8-device mesh."""

import numpy as np
import pytest

from heatray_tpu.ops import build_woop, intersect_any, intersect_closest
from heatray_tpu.parallel.geometry import (
    make_sharded_intersectors,
    shard_accel,
)
from heatray_tpu.parallel.sharding import make_mesh

from test_bvh import make_rays, make_soup, planar, v3


@pytest.fixture(scope="module")
def setup():
    positions, indices = make_soup(700, seed=31)
    accel = build_woop(planar(positions), planar(indices))
    orig, dirs = make_rays(512, seed=37)
    return accel, v3(planar(orig).T), v3(planar(dirs).T)


@pytest.mark.parametrize("n_shards", [2, 8])
def test_closest_matches_monolithic(setup, n_shards):
    accel, org, d = setup
    mesh = make_mesh(n_shards)
    sharded = shard_accel(accel, mesh, axis="dp")
    closest, _ = make_sharded_intersectors(sharded, ray_block=512)

    t_ref, id_ref, front_ref, hit_ref = intersect_closest(accel, org, d)
    t_s, id_s, front_s, hit_s = closest(org, d, 1e-4)

    np.testing.assert_array_equal(np.asarray(hit_ref), np.asarray(hit_s))
    m = np.asarray(hit_ref)
    np.testing.assert_allclose(
        np.asarray(t_ref)[m], np.asarray(t_s)[m], rtol=1e-5, atol=1e-6
    )
    same = np.asarray(id_ref)[m] == np.asarray(id_s)[m]
    assert same.mean() > 0.999  # ids may differ only at exactly-tied t
    np.testing.assert_array_equal(
        np.asarray(front_ref)[m][same], np.asarray(front_s)[m][same]
    )


def test_any_matches_monolithic(setup):
    accel, org, d = setup
    mesh = make_mesh(4)
    sharded = shard_accel(accel, mesh, axis="dp")
    _, any_hit = make_sharded_intersectors(sharded, ray_block=512)

    blocked_ref = intersect_any(accel, org, d, t_max=5.0)
    blocked_s = any_hit(org, d, 1e-4, 5.0)
    np.testing.assert_array_equal(
        np.asarray(blocked_ref), np.asarray(blocked_s)
    )


def test_global_ids_cover_all_shards(setup):
    """Hits must land in every shard's global id range (offsets applied)."""
    accel, org, d = setup
    mesh = make_mesh(8)
    sharded = shard_accel(accel, mesh, axis="dp")
    closest, _ = make_sharded_intersectors(sharded, ray_block=512)
    _, tid, _, hit = closest(org, d, 1e-4)
    ids = np.asarray(tid)[np.asarray(hit)]
    assert ids.min() >= 0 and ids.max() < accel.num_triangles
