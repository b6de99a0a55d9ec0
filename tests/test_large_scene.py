"""Large-scene benchmark scene: the ~300k-triangle displaced-sphere
builtin that drives the bench's HBM-streaming row (BENCH large_scene_*)."""

import numpy as np

from heatray_tpu.options import RenderOptions
from heatray_tpu.render.integrator import _select_backend, render, resolve
from heatray_tpu.scene.builtin import high_poly
from heatray_tpu.scene.geometry import scene_aabb
from heatray_tpu.utils.framing import frame_scene


def test_high_poly_builds_into_stream_tier():
    scene = high_poly()
    n = int(scene.geometry.num_triangles)
    assert n >= 250_000, n  # past the VMEM budget -> "stream" on TPU
    assert int(scene.lights.num_directional) == 1
    assert int(scene.lights.env_enabled) == 1
    # Geometry is sane: no NaNs, displaced radius stays positive.
    pos = np.asarray(scene.geometry.positions)
    assert np.isfinite(pos).all()


def test_high_poly_renders():
    scene = high_poly(triangles=20_000)  # small variant: CPU-affordable
    assert int(scene.geometry.num_triangles) >= 15_000
    cam = frame_scene(np.asarray(scene_aabb(scene.geometry)), 32, 32,
                      theta=0.35)
    opts = RenderOptions(width=32, height=32, max_render_passes=1,
                         max_ray_depth=2)
    accum, _ = render(scene, cam, opts, num_passes=1)
    img = np.asarray(resolve(accum))
    assert np.isfinite(img).all()
    assert img.max() > 0.05  # sun + env actually light the scene
