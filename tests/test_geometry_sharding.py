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


class TestShardedWide:
    """The wide-BVH shard forest (one arity-8 BVH per Morton shard,
    shard_map over the mesh axis) matches the monolithic intersectors and
    is reachable end-to-end through ``render()``."""

    @pytest.fixture(scope="class")
    def wide_setup(self):
        from heatray_tpu.parallel.geometry import (
            build_sharded_wide,
            make_sharded_wide_intersectors,
            place_sharded_wide,
        )

        positions, indices = make_soup(700, seed=31)
        accel = build_woop(planar(positions), planar(indices))
        orig, dirs = make_rays(512, seed=37)
        org, d = v3(planar(orig).T), v3(planar(dirs).T)
        mesh = make_mesh(8)
        swide = place_sharded_wide(
            build_sharded_wide(accel, 8, schedule="f32"), mesh
        )
        import jax

        closest, any_hit = make_sharded_wide_intersectors(
            swide, None, mesh, ray_tile=128,
            precision=jax.lax.Precision.HIGHEST, interpret=True,
        )
        return accel, swide, closest, any_hit, org, d

    def test_closest_matches_monolithic(self, wide_setup):
        accel, swide, closest, _, org, d = wide_setup
        t_ref, id_ref, front_ref, hit_ref = intersect_closest(accel, org, d)
        t_s, slot_s, hit_s = closest(org, d, 1e-4)
        np.testing.assert_array_equal(
            np.asarray(hit_ref), np.asarray(hit_s)
        )
        m = np.asarray(hit_ref)
        np.testing.assert_allclose(
            np.asarray(t_ref)[m], np.asarray(t_s)[m], rtol=1e-5, atol=1e-5
        )
        # Global slots map through the concatenated slot table to tri ids.
        slot_tri = np.asarray(swide.slot_tri).reshape(-1)
        ids = slot_tri[np.maximum(np.asarray(slot_s), 0)]
        same = np.asarray(id_ref)[m] == ids[m]
        assert same.mean() > 0.999

    def test_any_matches_monolithic(self, wide_setup):
        accel, _, _, any_hit, org, d = wide_setup
        blocked_ref = intersect_any(accel, org, d, t_max=5.0)
        blocked_s = any_hit(org, d, 1e-4, 5.0)
        np.testing.assert_array_equal(
            np.asarray(blocked_ref), np.asarray(blocked_s)
        )

    def test_render_sharded_matches_replicated(self):
        """VERDICT r4 item 3 'done' gate: a full ``render()`` through
        ``intersect_backend="sharded"`` matches the replicated XLA render
        of the same scene."""
        import dataclasses

        from heatray_tpu.camera import orbit_camera
        from heatray_tpu.options import RenderOptions
        from heatray_tpu.render.integrator import make_context, render
        from heatray_tpu.scene.builtin import cornell_box

        scene = cornell_box(light="both", with_spheres=True)
        camera = orbit_camera(48, 48, distance=6.2, focal_length_mm=35.0)
        base = RenderOptions(
            width=48, height=48, max_render_passes=2, max_ray_depth=3,
        )
        ref_opts = dataclasses.replace(base, intersect_backend="xla")
        a_ref, _ = render(scene, camera, ref_opts, num_passes=2)

        mesh = make_mesh(4)
        opts = dataclasses.replace(
            base,
            intersect_backend="sharded",
            wide_ray_tile=128,
            wide_precision="highest",
            wide_leaf_math="vpu",  # f32 schedule: exact pair math
        )
        ctx = make_context(opts, scene, mesh=mesh)
        assert ctx.accel_pack.backend == "sharded"
        a_s, _ = render(scene, camera, opts, num_passes=2, ctx=ctx)
        np.testing.assert_allclose(
            np.asarray(a_ref), np.asarray(a_s), rtol=2e-4, atol=2e-4
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
