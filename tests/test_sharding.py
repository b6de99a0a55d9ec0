"""Multi-device sharding tests on the virtual 8-device CPU mesh (conftest
forces ``xla_force_host_platform_device_count=8``).

Checks the SURVEY section 2.4 parallel axes: dp (pixel-row) sharded rendering
matches the single-device render, and the sharded inverse-rendering train
step produces finite loss/grads with replicated parameters.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from heatray_tpu.camera import orbit_camera
from heatray_tpu.options import RenderOptions
from heatray_tpu.parallel.sharding import (
    make_mesh,
    make_mesh_2d,
    make_sharded_train_step,
    make_sharded_train_step_2d,
    render_sharded,
    render_sharded_2d,
)
from heatray_tpu.render import make_context, render, resolve
from heatray_tpu.scene.builtin import cornell_box

OPTS = RenderOptions(width=16, height=16, max_render_passes=4, max_ray_depth=2)


@pytest.fixture(scope="module")
def setup():
    scene = cornell_box(light="point", with_spheres=False)
    camera = orbit_camera(16, 16, distance=6.0, focal_length_mm=35.0)
    ctx = make_context(OPTS)
    return scene, camera, ctx


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs >= 2 devices")
class TestShardedRender:
    def test_matches_single_device(self, setup):
        """N-device row-sharded render == 1-device render (determinism across
        shardings, SURVEY section 4)."""
        scene, camera, ctx = setup
        single, _ = render(scene, camera, OPTS, num_passes=2, ctx=ctx)
        mesh = make_mesh(min(4, len(jax.devices())))
        sharded = render_sharded(scene, camera, ctx, OPTS, mesh, num_passes=2)
        assert np.allclose(
            np.asarray(single), np.asarray(sharded), atol=1e-5
        ), np.abs(np.asarray(single) - np.asarray(sharded)).max()

    def test_2d_mesh_sp_dp_matches_serial(self, setup):
        """(sp, dp) interleaved sample-parallel render == the same passes
        traced serially on one device (SURVEY section 2.4 sample axis)."""
        scene, camera, ctx = setup
        single, _ = render(scene, camera, OPTS, num_passes=4, ctx=ctx)
        mesh = make_mesh_2d(2, 2)
        assert mesh.shape == {"sp": 2, "dp": 2}
        merged = render_sharded_2d(scene, camera, ctx, OPTS, mesh, num_passes=4)
        assert merged.shape == single.shape
        # Same 4 pass indices, different accumulation order -> fp tolerance.
        assert np.allclose(np.asarray(single), np.asarray(merged), atol=1e-4), (
            np.abs(np.asarray(single) - np.asarray(merged)).max()
        )
        # Alpha: every pixel saw all 4 passes.
        assert np.allclose(np.asarray(merged[3]), 4.0)

    def test_2d_train_step(self, setup):
        scene, camera, ctx = setup
        mesh = make_mesh_2d(2, 2)
        target = resolve(
            render_sharded_2d(scene, camera, ctx, OPTS, mesh, num_passes=2)
        )
        opt = optax.adam(1e-2)
        step = make_sharded_train_step_2d(
            scene, camera, ctx, OPTS, target, mesh, opt
        )
        params = {"base_color": scene.materials.base_color}
        state = opt.init(params)
        params, state, loss = step(params, state, jnp.int32(0))
        assert np.isfinite(float(loss))
        assert np.isfinite(np.asarray(params["base_color"])).all()

    def test_sharded_train_step(self, setup):
        scene, camera, ctx = setup
        mesh = make_mesh(2)
        target = resolve(
            render_sharded(scene, camera, ctx, OPTS, mesh, num_passes=1)
        )
        opt = optax.adam(1e-2)
        step = make_sharded_train_step(
            scene, camera, ctx, OPTS, target, mesh, opt
        )
        params = {
            "base_color": scene.materials.base_color,
            "roughness": scene.materials.roughness,
        }
        state = opt.init(params)
        params, state, loss = step(params, state, jnp.int32(1))
        assert np.isfinite(float(loss))
        assert all(np.isfinite(np.asarray(v)).all() for v in params.values())
