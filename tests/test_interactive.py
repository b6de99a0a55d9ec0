"""Interactive 3x3 block mode tests (``PassGenerator.h:50-59``,
``perspective.rlsl:42-57``): each pass covers 1/9 of the pixels; 9 passes
cover every pixel exactly once with the same samples as one full pass."""

import dataclasses

import numpy as np

from heatray_tpu.camera import orbit_camera
from heatray_tpu.options import RenderOptions
from heatray_tpu.render import render
from heatray_tpu.scene import (
    DirectionalLight,
    PBRParams,
    SceneBuilder,
    plane_mesh,
)


def _scene():
    b = SceneBuilder()
    b.add_mesh(
        plane_mesh(30, 30),
        PBRParams(base_color=(1.0, 1.0, 1.0), roughness=1.0, specular_f0=0.0),
    )
    b.add_directional_light(
        DirectionalLight(direction=(0.0, 1.0, 0.0), illuminance=683.0)
    )
    return b.build()


OPTS = RenderOptions(width=24, height=24, max_render_passes=8, max_ray_depth=2)


class TestInteractiveBlock:
    def test_one_block_pass_covers_ninth(self):
        opts = dataclasses.replace(OPTS, interactive_block=True)
        scene = _scene()
        cam = orbit_camera(24, 24, distance=5.0, theta=1.2)
        accum, _ = render(scene, cam, opts, num_passes=1)
        alpha = np.asarray(accum[3])
        assert np.isclose(alpha.mean(), 1.0 / 9.0)
        # Selected pixels form the block-0 lattice (x % 3 == 0, y % 3 == 0).
        ys, xs = np.nonzero(alpha > 0)
        assert np.all(xs % 3 == 0) and np.all(ys % 3 == 0)

    def test_nine_block_passes_equal_one_full_pass(self):
        scene = _scene()
        cam = orbit_camera(24, 24, distance=5.0, theta=1.2)
        full, _ = render(scene, cam, OPTS, num_passes=1)
        opts = dataclasses.replace(OPTS, interactive_block=True)
        blocks, _ = render(scene, cam, opts, num_passes=9)
        assert np.all(np.asarray(blocks[3]) == 1.0)  # every pixel once
        assert np.allclose(
            np.asarray(blocks), np.asarray(full), atol=1e-5
        ), np.abs(np.asarray(blocks) - np.asarray(full)).max()
