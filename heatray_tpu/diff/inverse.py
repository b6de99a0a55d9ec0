"""Inverse rendering: optimize scene parameters against target images.

The reference has no counterpart (it is forward-only); this is the TPU
build's differentiable-rendering surface (BASELINE.json north star): the
renderer is pure jnp, so material/light/camera parameters take gradients
through the full estimator and optimize with optax.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import optax

from ..camera import CameraParams
from ..options import FrameGlobals, RenderOptions
from ..render.integrator import RenderContext, render_pass, resolve
from ..scene.scene import Scene


def apply_material_params(scene: Scene, params: Dict[str, jnp.ndarray]) -> Scene:
    """Overlay a dict of MaterialTable field arrays onto the scene.

    Derived fields stay consistent: roughness is clamped and re-squared into
    roughness_alpha (matching ``PhysicallyBasedMaterial::modify``).
    """
    mats = scene.materials
    updates = {}
    for key, value in params.items():
        if key == "roughness":
            rough = jnp.clip(value, 0.01, 1.0)
            updates["roughness"] = rough
            updates["roughness_alpha"] = rough * rough
        elif key == "clearcoat_roughness":
            rough = jnp.clip(value, 0.01, 1.0)
            updates["clearcoat_roughness"] = rough
            updates["clearcoat_roughness_alpha"] = rough * rough
        elif key in ("base_color", "emissive"):
            updates[key] = jnp.clip(value, 0.0, 1.0)
        elif key in ("metallic",):
            updates[key] = jnp.clip(value, 0.0, 1.0)
        else:
            updates[key] = value
    return scene.replace(materials=mats.replace(**updates))


def apply_light_params(scene: Scene, params: Dict[str, jnp.ndarray]) -> Scene:
    """Overlay ``light.*`` / ``env.*`` keys onto the scene's LightBank.

    Light keys map to LightBank fields (``light.point_color``,
    ``light.point_position``, ``light.dir_direction`` (re-normalized),
    ``light.spot_color``, ...); env keys: ``env.exposure`` (EV ->
    compensation 2^ev), ``env.solid_color`` ((3,) -> 1x1 map),
    ``env.rotation``, ``env.map`` ((3, H, W)).
    """
    lights = scene.lights
    updates = {}
    for key, value in params.items():
        if not (key.startswith("light.") or key.startswith("env.")):
            continue
        if key == "env.exposure":
            updates["env_exposure_compensation"] = 2.0 ** jnp.asarray(value)
        elif key == "env.solid_color":
            updates["env_map"] = jnp.asarray(value).reshape(3, 1, 1)
        elif key == "env.map":
            updates["env_map"] = jnp.asarray(value)
        elif key == "env.rotation":
            updates["env_rotation"] = jnp.asarray(value)
        elif key == "light.dir_direction":
            v = jnp.asarray(value)
            updates["dir_direction"] = v / jnp.maximum(
                jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12
            )
        else:
            updates[key.split(".", 1)[1]] = jnp.asarray(value)
    return scene.replace(lights=lights.replace(**updates)) if updates else scene


def apply_camera_params(
    camera: CameraParams, params: Dict[str, jnp.ndarray]
) -> CameraParams:
    """Overlay ``camera.*`` keys onto CameraParams.

    ``camera.orbit`` = (distance, phi, theta) rebuilds the view matrix
    differentiably (``orbit_view_matrix_jnp``); scalar keys:
    ``camera.focus_distance``, ``camera.aperture_radius``,
    ``camera.fov_tan``; ``camera.view_matrix`` overrides the matrix raw.
    """
    from ..camera import orbit_view_matrix_jnp

    updates = {}
    for key, value in params.items():
        if not key.startswith("camera."):
            continue
        field = key.split(".", 1)[1]
        if field == "orbit":
            target = params.get("camera.orbit_target", jnp.zeros(3))
            updates["view_matrix"] = orbit_view_matrix_jnp(
                value[0], value[1], value[2], target
            )
        elif field == "orbit_target":
            pass  # consumed by camera.orbit
        else:
            updates[field] = jnp.asarray(value)
    return camera.replace(**updates) if updates else camera


def apply_scene_params(scene: Scene, params: Dict[str, jnp.ndarray]) -> Scene:
    """Materials (bare keys, ``apply_material_params``) + lights/env
    (namespaced keys, ``apply_light_params``) in one overlay."""
    mat = {
        k: v
        for k, v in params.items()
        if "." not in k
    }
    scene = apply_material_params(scene, mat) if mat else scene
    return apply_light_params(scene, params)


def make_loss_fn(
    scene: Scene,
    camera: CameraParams,
    ctx: RenderContext,
    options: RenderOptions,
    target: jnp.ndarray,
    num_passes: int = 1,
    apply_params: Callable[[Scene, Dict], Scene] = apply_scene_params,
):
    """L2 image loss of an ``num_passes``-pass render against ``target``
    (H, W, 3) linear.  Parameters may target materials (bare keys),
    lights/env (``light.*``/``env.*``) and the camera (``camera.*``)."""

    target_planar = jnp.transpose(jnp.asarray(target, jnp.float32), (2, 0, 1))

    def _check_params(params):
        # A baked shade table freezes material parameters: optimizing them
        # through it would silently produce zero gradients.
        if (
            any("." not in k for k in params)
            and ctx.accel_pack is not None
            and ctx.accel_pack.shade_table is not None
        ):
            raise ValueError(
                "material parameters need a context built with "
                "make_context(options, scene, static_shading=False)"
            )

    def loss_fn(params: Dict[str, jnp.ndarray], sample_offset=0):
        _check_params(params)
        s = apply_params(scene, params)
        cam = apply_camera_params(camera, params)
        accum = jnp.zeros((4, options.height, options.width), jnp.float32)

        def body(accum, i):
            frame = FrameGlobals.create(sample_offset + i)
            return render_pass(s, cam, ctx, options, frame, accum), None

        accum, _ = jax.lax.scan(
            body, accum, jnp.arange(num_passes, dtype=jnp.int32)
        )
        img = accum[:3] / jnp.maximum(accum[3:], 1.0)
        return jnp.mean((img - target_planar) ** 2)

    return loss_fn


def optimize(
    scene: Scene,
    camera: CameraParams,
    ctx: RenderContext,
    options: RenderOptions,
    target: jnp.ndarray,
    init_params: Dict[str, jnp.ndarray],
    steps: int = 100,
    learning_rate: float = 5e-2,
    num_passes: int = 1,
    optimizer: optax.GradientTransformation | None = None,
    rotate_samples: bool = True,
    callback: Callable[[int, float, Dict], None] | None = None,
):
    """Gradient-descend scene parameters toward a target image.

    Returns (params, losses).  ``rotate_samples`` advances the QMC pass
    window each step so gradients see fresh sample sets (keeping forward and
    backward on identical streams within a step — discrete choices stay
    frozen under ``stop_gradient``).
    """
    if optimizer is None:
        optimizer = optax.adam(learning_rate)
    loss_fn = make_loss_fn(
        scene, camera, ctx, options, target, num_passes=num_passes
    )

    @jax.jit
    def step_fn(params, opt_state, offset):
        loss, grads = jax.value_and_grad(loss_fn)(params, offset)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    params = init_params
    opt_state = optimizer.init(params)
    losses = []
    for i in range(steps):
        offset = (i * num_passes) % options.max_render_passes if rotate_samples else 0
        params, opt_state, loss = step_fn(params, opt_state, jnp.int32(offset))
        losses.append(float(loss))
        if callback is not None:
            callback(i, losses[-1], params)
    return params, losses
