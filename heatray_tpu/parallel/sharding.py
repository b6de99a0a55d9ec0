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


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Multi-host bring-up: ``jax.distributed.initialize`` with explicit or
    environment-provided (JAX_COORDINATOR_ADDRESS / Cloud TPU metadata)
    configuration.  No-op when already initialized or single-process.

    On a real pod slice call this before any jax op; then
    ``make_mesh_2d(jax.process_count(), local_chips)`` lays sample
    parallelism across hosts (DCN — the sp axis needs ONE reduction per
    render) and pixel rows within a host (ICI).
    """
    import os

    if jax.process_count() > 1:
        return  # already initialized
    if coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def make_mesh_2d(
    n_sample: int,
    n_pixel: int,
    devices: Sequence | None = None,
) -> Mesh:
    """2D ``('sp', 'dp')`` mesh: sample parallelism on the OUTER axis (across
    hosts — it communicates once per render), pixel-row data parallelism on
    the INNER axis (within a host, over ICI).

    On a multi-host slice pass ``jax.devices()`` (global) with
    ``n_sample = process_count``; on one host this subdivides local chips.
    """
    if devices is None:
        devices = jax.devices()
        if len(devices) < n_sample * n_pixel:
            devices = jax.devices("cpu")
    assert len(devices) >= n_sample * n_pixel
    grid = np.asarray(devices[: n_sample * n_pixel]).reshape(n_sample, n_pixel)
    return Mesh(grid, ("sp", "dp"))


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
    backward pass.  Returns
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


# ---------------------------------------------------------------------------
# 2D (sp, dp): sample parallelism x pixel-row parallelism
# ---------------------------------------------------------------------------


def _sp_accum(options: RenderOptions, mesh: Mesh):
    """Zero (S, 4, H, W) per-slice accumulation, sp x row sharded."""
    s = mesh.shape["sp"]
    return jax.device_put(
        jnp.zeros((s, 4, options.height, options.width), jnp.float32),
        NamedSharding(mesh, P("sp", None, None, "dp")),
    )


def render_sharded_2d(
    scene: Scene,
    camera: CameraParams,
    ctx: RenderContext,
    options: RenderOptions,
    mesh: Mesh,
    num_passes: int,
    max_channel_value: float = 3.14159265,
):
    """Progressive render over a 2D ``('sp', 'dp')`` mesh.

    Pass indices interleave across the sp axis (slice k traces passes
    k, k+S, ...), every slice keeps its own row-sharded accumulation, and
    ONE reduction over sp at the end merges them — the sample-parallel
    axis the reference expresses serially (``PassGenerator.cpp:346-400``).
    Returns the merged (4, H, W) accumulation (row-sharded over dp).
    """
    s = mesh.shape["sp"]
    assert num_passes % s == 0, (
        f"num_passes ({num_passes}) must divide over the sp axis ({s})"
    )
    scene = replicate(scene, mesh)
    camera = replicate(camera, mesh)
    ctx = shard_context(ctx, mesh)
    accum = _sp_accum(options, mesh)

    @jax.jit
    def round_fn(accum, idxs):
        def one(idx, acc):
            frame = FrameGlobals.create(idx, max_channel_value)
            return render_pass(scene, camera, ctx, options, frame, acc)

        return jax.vmap(one)(idxs, accum)

    sp_sharding = NamedSharding(mesh, P("sp"))
    for r in range(num_passes // s):
        idxs = jax.device_put(
            r * s + jnp.arange(s, dtype=jnp.int32), sp_sharding
        )
        accum = round_fn(accum, idxs)

    @jax.jit
    def merge(accum):
        total = jnp.sum(accum, axis=0)  # ONE psum over sp
        return jax.lax.with_sharding_constraint(
            total, NamedSharding(mesh, P(None, None, "dp"))
        )

    return merge(accum)


def make_sharded_train_step_2d(
    scene: Scene,
    camera: CameraParams,
    ctx: RenderContext,
    options: RenderOptions,
    target: jnp.ndarray,
    mesh: Mesh,
    optimizer,
):
    """Inverse-rendering step over the 2D mesh: each sp slice renders an
    independent QMC pass, the merged image drives the loss, and GSPMD
    all-reduces parameter gradients over BOTH axes (the overlap-friendly
    psum of SURVEY section 2.4).  Returns ``step_fn(params, opt_state,
    sample_index) -> (params, opt_state, loss)``."""
    import optax

    from ..diff.inverse import apply_material_params

    s = mesh.shape["sp"]
    scene = replicate(scene, mesh)
    camera = replicate(camera, mesh)
    ctx = shard_context(ctx, mesh)
    target = jnp.transpose(jnp.asarray(target, jnp.float32), (2, 0, 1))
    target = jax.device_put(
        target, NamedSharding(mesh, P(None, None, "dp"))
    )
    accum0 = _sp_accum(options, mesh)
    sp_sharding = NamedSharding(mesh, P("sp"))

    def loss_fn(params, sample_index):
        sc = apply_material_params(scene, params)

        def one(idx, acc):
            frame = FrameGlobals.create(sample_index * s + idx)
            return render_pass(sc, camera, ctx, options, frame, acc)

        idxs = jax.lax.with_sharding_constraint(
            jnp.arange(s, dtype=jnp.int32), sp_sharding
        )
        accum = jax.vmap(one)(idxs, accum0)
        total = jnp.sum(accum, axis=0)
        img = total[:3] / jnp.maximum(total[3:], 1.0)
        return jnp.mean((img - target) ** 2)

    @jax.jit
    def step_fn(params, opt_state, sample_index):
        loss, grads = jax.value_and_grad(loss_fn)(params, sample_index)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step_fn
