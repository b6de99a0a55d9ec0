"""Multi-device sharding for rendering and inverse rendering.

The reference is single-device (SURVEY.md section 2.4); the TPU build's
parallel axes are:

- ``dp`` (data parallel over pixels): the accumulation buffer and all
  per-pixel tables shard by image rows; the scene/BVH replicate.  XLA's
  GSPMD partitioner then runs each chip on its own pixel rows with no
  communication in the forward pass.
- ``sp`` (sample parallel over passes): independent QMC pass indices render
  concurrently and their accumulation buffers ``psum`` over the mesh — the
  embarrassingly parallel axis the reference expresses serially as "passes".

Parameter gradients (inverse rendering) all-reduce over ICI automatically:
with parameters replicated and pixels sharded, GSPMD inserts the psum in the
backward pass.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..camera import CameraParams
from ..options import FrameGlobals, RenderOptions
from ..render.integrator import RenderContext, render_pass, resolve
from ..scene.scene import Scene


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    """1D device mesh over the first ``n_devices`` devices.

    If the default platform has fewer than ``n_devices`` devices (e.g. a
    single remote-TPU tunnel while the test harness forces N virtual CPU
    devices), fall back to the CPU backend's devices.
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if len(devices) < n_devices:
        devices = jax.devices("cpu")
    assert len(devices) >= n_devices, (
        f"need {n_devices} devices, have {len(devices)}"
    )
    return Mesh(np.asarray(devices[:n_devices]), (axis,))


def shard_context(ctx: RenderContext, mesh: Mesh, axis: str = "dp") -> RenderContext:
    """Place per-pixel tables row-sharded, bulk tables replicated."""
    row = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    tables = ctx.tables.replace(
        seq_u=jax.device_put(ctx.tables.seq_u, rep),
        seq_v=jax.device_put(ctx.tables.seq_v, rep),
        aperture_u=jax.device_put(ctx.tables.aperture_u, rep),
        aperture_v=jax.device_put(ctx.tables.aperture_v, rep),
        pixel_sequence_id=jax.device_put(ctx.tables.pixel_sequence_id, row),
        pixel_sequence_offset=jax.device_put(
            ctx.tables.pixel_sequence_offset, row
        ),
    )
    return ctx.replace(tables=tables, ms_lut=jax.device_put(ctx.ms_lut, rep))


def replicate(tree, mesh: Mesh):
    rep = NamedSharding(mesh, P())
    return jax.device_put(tree, rep)


def sharded_accum(options: RenderOptions, mesh: Mesh, axis: str = "dp"):
    """Zero planar (4, H, W) accumulation buffer sharded by image rows."""
    return jax.device_put(
        jnp.zeros((4, options.height, options.width), jnp.float32),
        NamedSharding(mesh, P(None, axis)),
    )


def render_sharded(
    scene: Scene,
    camera: CameraParams,
    ctx: RenderContext,
    options: RenderOptions,
    mesh: Mesh,
    num_passes: int,
    max_channel_value: float = 3.14159265,
    axis: str = "dp",
):
    """Progressive render with pixel rows sharded over ``mesh``.

    The jitted pass function is the same single-device ``render_pass`` —
    GSPMD partitions it from the input shardings (scene replicated, accum +
    pixel tables row-sharded).
    """
    assert options.height % mesh.devices.size == 0, (
        "image rows must divide evenly over the mesh"
    )
    scene = replicate(scene, mesh)
    camera = replicate(camera, mesh)
    ctx = shard_context(ctx, mesh, axis)
    accum = sharded_accum(options, mesh, axis)
    for i in range(num_passes):
        frame = FrameGlobals.create(i, max_channel_value)
        accum = render_pass(scene, camera, ctx, options, frame, accum)
    return accum


def make_sharded_train_step(
    scene: Scene,
    camera: CameraParams,
    ctx: RenderContext,
    options: RenderOptions,
    target: jnp.ndarray,
    mesh: Mesh,
    optimizer,
    axis: str = "dp",
):
    """Jitted inverse-rendering step over a device mesh.

    Pixels (target image + accumulation) shard over ``axis``; parameters
    replicate; the parameter-gradient all-reduce is inserted by GSPMD in the
    backward pass.  Returns (step_fn, init_inputs) where
    ``step_fn(params, opt_state, sample_index) -> (params, opt_state, loss)``.
    """
    from ..diff.inverse import apply_material_params

    scene = replicate(scene, mesh)
    camera = replicate(camera, mesh)
    ctx = shard_context(ctx, mesh, axis)
    # Target arrives (H, W, 3); store planar (3, H, W) row-sharded to match
    # the accumulation layout.
    target = jnp.transpose(jnp.asarray(target, jnp.float32), (2, 0, 1))
    target = jax.device_put(target, NamedSharding(mesh, P(None, axis)))
    accum0 = sharded_accum(options, mesh, axis)

    def loss_fn(params, sample_index):
        s = apply_material_params(scene, params)
        frame = FrameGlobals.create(sample_index)
        accum = render_pass(s, camera, ctx, options, frame, accum0)
        img = accum[:3] / jnp.maximum(accum[3:], 1.0)
        return jnp.mean((img - target) ** 2)

    @jax.jit
    def step_fn(params, opt_state, sample_index):
        loss, grads = jax.value_and_grad(loss_fn)(params, sample_index)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        import optax

        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step_fn
