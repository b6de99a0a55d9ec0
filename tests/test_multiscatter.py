"""Multiscatter energy compensation: the gather-free Chebyshev fit
(RenderOptions.ms_impl="fit") must agree with the reference-pipeline LUT
("lut") to within the LUT's own Monte-Carlo noise, both pointwise and at
render level."""

import jax
import jax.numpy as jnp
import numpy as np

from heatray_tpu.render.multiscatter import (
    LUT_SIZE,
    compute_multiscattering,
    compute_multiscattering_fit,
    generate_multiscatter_lut,
    multiscatter_lut_packed,
)
from heatray_tpu.vec import Vec3


def test_fit_matches_lut_pointwise():
    lut = generate_multiscatter_lut()
    packed = multiscatter_lut_packed()
    g = (np.arange(LUT_SIZE, dtype=np.float32) + 0.5) / LUT_SIZE
    ndv, rough = np.meshgrid(g, g)  # cols = NdotV, rows = roughness
    one = Vec3.ones(ndv.ravel().shape)
    f_lut = jax.jit(compute_multiscattering)(
        packed, one, jnp.asarray(ndv.ravel()), jnp.asarray(rough.ravel())
    ).x
    f_fit = jax.jit(compute_multiscattering_fit)(
        one, jnp.asarray(ndv.ravel()), jnp.asarray(rough.ravel())
    ).x
    err = np.abs(np.asarray(f_fit) - np.asarray(f_lut))
    # 4096-sample MC noise on the LUT itself is ~1-2% of val; the fit sits
    # inside that envelope.
    assert err.max() < 0.035, err.max()
    assert err.mean() < 2e-3, err.mean()


def test_fit_render_matches_lut_render():
    from heatray_tpu.camera import orbit_camera
    from heatray_tpu.options import RenderOptions
    from heatray_tpu.render.integrator import render, resolve
    from heatray_tpu.scene.builtin import multi_material

    scene = multi_material()
    cam = orbit_camera(48, 48, distance=6.0, focal_length_mm=35.0)
    imgs = []
    for impl in ("lut", "fit"):
        opts = RenderOptions(
            width=48, height=48, max_render_passes=4, max_ray_depth=3,
            ms_impl=impl,
        )
        accum, _ = render(scene, cam, opts, num_passes=4)
        imgs.append(np.asarray(resolve(accum)))
    diff = np.abs(imgs[1] - imgs[0])
    scale = np.abs(imgs[0]) + 1e-2
    assert (diff / scale).max() < 0.02, (diff / scale).max()


def test_fit_gradients_finite():
    one = Vec3.ones((8,))
    g = jax.grad(
        lambda r: jnp.sum(
            compute_multiscattering_fit(one, jnp.linspace(0.0, 1.0, 8), r).x
        )
    )(jnp.linspace(0.05, 0.95, 8))
    assert np.isfinite(np.asarray(g)).all()
