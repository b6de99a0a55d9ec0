"""Segment-gated bounce correctness: gating is an exact optimization.

The gated path (RenderOptions.gate_bounces) slices the sorted wavefront
into row segments and skips segments with no fresh active lane; the result
must match the ungated render lane-for-lane, including the clamped last
segment whose overlap rows are processed twice but merged once.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from heatray_tpu.camera import orbit_camera
from heatray_tpu.options import RenderOptions
from heatray_tpu.render.integrator import render, resolve
from heatray_tpu.scene.builtin import cornell_box


def _render(w, h, segments, gate, passes=2, depth=3):
    options = RenderOptions(
        width=w, height=h, max_render_passes=max(passes, 4),
        max_ray_depth=depth, sort_bounces=True,
        gate_bounces=gate, gate_segments=segments,
    )
    scene = cornell_box(light="both", with_spheres=True)
    camera = orbit_camera(w, h, distance=6.2, focal_length_mm=35.0)
    accum, _ = render(scene, camera, options, num_passes=passes)
    return np.asarray(resolve(accum)), np.asarray(accum[3])


def test_gated_matches_ungated_even_rows():
    # 64x64: 4096 lanes, lane=1024 -> 4 rows; 4 segments of 1 row each.
    img_off, _ = _render(64, 64, 4, gate=False)
    img_on, alpha = _render(64, 64, 4, gate=True)
    np.testing.assert_allclose(img_on, img_off, rtol=1e-6, atol=1e-7)
    assert np.all(alpha == 2.0)


def test_gated_matches_ungated_clamped_last_segment():
    # 80x128: 10240 lanes, lane=1024 -> 10 rows; 4 segments of 3 rows:
    # the last segment starts clamped at row 7 and overlaps rows 7-8,
    # exercising the fresh-mask merge.
    img_off, _ = _render(80, 128, 4, gate=False)
    img_on, _ = _render(80, 128, 4, gate=True)
    np.testing.assert_allclose(img_on, img_off, rtol=1e-6, atol=1e-7)


def test_gated_ray_count_matches():
    from heatray_tpu.options import FrameGlobals
    from heatray_tpu.render.integrator import make_context, render_pass

    w = h = 64
    scene = cornell_box(light="both", with_spheres=True)
    camera = orbit_camera(w, h, distance=6.2, focal_length_mm=35.0)
    counts = []
    for gate in (False, True):
        options = RenderOptions(
            width=w, height=h, max_render_passes=4, max_ray_depth=3,
            sort_bounces=True, gate_bounces=gate, gate_segments=4,
        )
        ctx = make_context(options, scene)
        accum = jnp.zeros((4, h, w), jnp.float32)
        _, stats = render_pass(
            scene, camera, ctx, options, FrameGlobals.create(0), accum,
            with_stats=True,
        )
        counts.append(int(stats["rays"]))
    assert counts[0] == counts[1]


def test_gated_gradients_match():
    # Gradients w.r.t. material parameters flow through the gated scan/cond
    # path identically (dynamic_update_slice transposes to slices).
    import jax

    from heatray_tpu.diff.inverse import apply_material_params
    from heatray_tpu.options import FrameGlobals
    from heatray_tpu.render.integrator import make_context, render_pass

    w = h = 32
    scene = cornell_box(light="both", with_spheres=True)
    camera = orbit_camera(w, h, distance=6.2, focal_length_mm=35.0)
    params = {"base_color": scene.materials.base_color}
    grads = []
    for gate in (False, True):
        options = RenderOptions(
            width=w, height=h, max_render_passes=4, max_ray_depth=3,
            sort_bounces=True, gate_bounces=gate, gate_segments=4,
        )
        ctx = make_context(options, scene, static_shading=False)
        accum = jnp.zeros((4, h, w), jnp.float32)

        def loss_fn(params, options=options, ctx=ctx):
            s = apply_material_params(scene, params)
            a = render_pass(
                s, camera, ctx, options, FrameGlobals.create(0), accum
            )
            img = a[:3] / jnp.maximum(a[3:], 1.0)
            return jnp.mean(img * img)

        grads.append(jax.grad(loss_fn)(params))
    np.testing.assert_allclose(
        np.asarray(grads[1]["base_color"]),
        np.asarray(grads[0]["base_color"]),
        rtol=1e-5, atol=1e-8,
    )
