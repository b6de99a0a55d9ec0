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


def _local_options(options: RenderOptions, n: int) -> RenderOptions:
    """Per-shard options: local row count, full-image camera mapping."""
    import dataclasses

    assert options.height % n == 0, (
        f"image rows ({options.height}) must divide the mesh ({n})"
    )
    return dataclasses.replace(
        options,
        height=options.height // n,
        image_height=options.image_height or options.height,
    )


def make_sharded_pass(
    scene: Scene,
    camera: CameraParams,
    ctx: RenderContext,
    options: RenderOptions,
    mesh: Mesh,
    axis: str = "dp",
):
    """Jitted one-pass function with pixel rows EXPLICITLY partitioned via
    ``shard_map``: each device runs the full single-device ``render_pass``
    on its own row slice (scene/accel replicated; per-pixel tables and the
    accumulation row-sharded; zero communication in the forward pass).

    Explicit shard_map, not GSPMD propagation: measured on the virtual CPU
    mesh, GSPMD replicated the whole pass per device (CPU-seconds scaled
    with N — the intersector's lax.map-over-ray-blocks defeats the
    partitioner), so sharding was correct but not parallel.

    Returns ``pass_fn(tables_sid, tables_soff, accum, frame) -> accum``.
    """
    n = mesh.shape[axis]
    local_opts = _local_options(options, n)
    local_h = local_opts.height
    # Don't close over the (sharded) full-image pixel tables — they arrive
    # as shard_map operands; the closure keeps only replicated leaves.
    dummy = jnp.zeros((1, 1), ctx.tables.pixel_sequence_id.dtype)
    ctx_base = ctx.replace(
        tables=ctx.tables.replace(
            pixel_sequence_id=dummy, pixel_sequence_offset=dummy
        )
    )

    def body(sid_rows, soff_rows, accum_rows, frame: FrameGlobals):
        row_off = jax.lax.axis_index(axis) * local_h
        tables = ctx_base.tables.replace(
            pixel_sequence_id=sid_rows, pixel_sequence_offset=soff_rows
        )
        ctx_local = ctx_base.replace(tables=tables)
        frame = frame.replace(row_offset=jnp.int32(row_off))
        return render_pass(
            scene, camera, ctx_local, local_opts, frame, accum_rows
        )

    spec_rows = P(axis, None)
    spec_img = P(None, axis, None)
    return jax.jit(
        jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(spec_rows, spec_rows, spec_img, P()),
            out_specs=spec_img,
            check_vma=False,
        )
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
    """Progressive render with pixel rows sharded over ``mesh`` (see
    ``make_sharded_pass``)."""
    scene = replicate(scene, mesh)
    camera = replicate(camera, mesh)
    ctx = shard_context(ctx, mesh, axis)
    accum = sharded_accum(options, mesh, axis)
    pass_fn = make_sharded_pass(scene, camera, ctx, options, mesh, axis)
    sid = ctx.tables.pixel_sequence_id
    soff = ctx.tables.pixel_sequence_offset
    for i in range(num_passes):
        frame = FrameGlobals.create(i, max_channel_value)
        accum = pass_fn(sid, soff, accum, frame)
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
    n = mesh.shape[axis]
    local_opts = _local_options(options, n)
    local_h = local_opts.height
    sid = ctx.tables.pixel_sequence_id
    soff = ctx.tables.pixel_sequence_offset
    dummy = jnp.zeros((1, 1), sid.dtype)
    ctx_base = ctx.replace(
        tables=ctx.tables.replace(
            pixel_sequence_id=dummy, pixel_sequence_offset=dummy
        )
    )
    spec_rows = P(axis, None)
    spec_img = P(None, axis, None)

    def loss_fn(params, sample_index):
        s = apply_material_params(scene, params)
        frame0 = FrameGlobals.create(0).replace(
            sample_index=jnp.int32(sample_index)
        )

        # The traced scene-with-params is closed over: shard_map treats it
        # as replicated, and its parameter cotangents psum over the mesh in
        # the backward pass.
        def body(sid_rows, soff_rows, accum_rows, frame):
            row_off = jax.lax.axis_index(axis) * local_h
            tables = ctx_base.tables.replace(
                pixel_sequence_id=sid_rows, pixel_sequence_offset=soff_rows
            )
            return render_pass(
                s, camera, ctx_base.replace(tables=tables), local_opts,
                frame.replace(row_offset=jnp.int32(row_off)), accum_rows,
            )

        accum = jax.shard_map(
            body, mesh=mesh,
            in_specs=(spec_rows, spec_rows, spec_img, P()),
            out_specs=spec_img, check_vma=False,
        )(sid, soff, accum0, frame0)
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
    """Zero (S, 4, H, W) per-slice accumulation, sp x pixel-row sharded."""
    s = mesh.shape["sp"]
    return jax.device_put(
        jnp.zeros((s, 4, options.height, options.width), jnp.float32),
        NamedSharding(mesh, P("sp", None, "dp", None)),
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
    """Progressive render over a 2D ``('sp', 'dp')`` mesh, shard_map'd.

    Pass indices interleave across the sp axis (slice k traces passes
    k, k+S, ...), every slice keeps its own row-sharded accumulation, and
    ONE reduction over sp at the end merges them — the sample-parallel
    axis the reference expresses serially (``PassGenerator.cpp:346-400``).
    Each (sp, dp) shard runs the single-device ``render_pass`` on its own
    pass index and pixel rows.  Returns the merged (4, H, W) accumulation
    (row-sharded over dp).
    """
    s = mesh.shape["sp"]
    ndp = mesh.shape["dp"]
    assert num_passes % s == 0, (
        f"num_passes ({num_passes}) must divide over the sp axis ({s})"
    )
    scene = replicate(scene, mesh)
    camera = replicate(camera, mesh)
    ctx = shard_context(ctx, mesh)
    accum = _sp_accum(options, mesh)
    local_opts = _local_options(options, ndp)
    local_h = local_opts.height
    sid = ctx.tables.pixel_sequence_id
    soff = ctx.tables.pixel_sequence_offset
    dummy = jnp.zeros((1, 1), sid.dtype)
    ctx_base = ctx.replace(
        tables=ctx.tables.replace(
            pixel_sequence_id=dummy, pixel_sequence_offset=dummy
        )
    )

    def body(sid_rows, soff_rows, accum_slice, base):
        row_off = jax.lax.axis_index("dp") * local_h
        idx = base + jax.lax.axis_index("sp")
        tables = ctx_base.tables.replace(
            pixel_sequence_id=sid_rows, pixel_sequence_offset=soff_rows
        )
        frame = FrameGlobals.create(0, max_channel_value).replace(
            sample_index=jnp.int32(idx), row_offset=jnp.int32(row_off)
        )
        a = render_pass(
            scene, camera, ctx_base.replace(tables=tables), local_opts,
            frame, accum_slice[0],
        )
        return a[None]

    round_fn = jax.jit(
        jax.shard_map(
            body, mesh=mesh,
            in_specs=(P("dp", None), P("dp", None),
                      P("sp", None, "dp", None), P()),
            out_specs=P("sp", None, "dp", None),
            check_vma=False,
        )
    )
    for r in range(num_passes // s):
        accum = round_fn(sid, soff, accum, jnp.int32(r * s))

    @jax.jit
    def merge(accum):
        total = jnp.sum(accum, axis=0)  # ONE psum over sp
        return jax.lax.with_sharding_constraint(
            total, NamedSharding(mesh, P(None, "dp", None))
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
    ndp = mesh.shape["dp"]
    scene = replicate(scene, mesh)
    camera = replicate(camera, mesh)
    ctx = shard_context(ctx, mesh)
    target = jnp.transpose(jnp.asarray(target, jnp.float32), (2, 0, 1))
    target = jax.device_put(
        target, NamedSharding(mesh, P(None, "dp", None))
    )
    accum0 = _sp_accum(options, mesh)
    local_opts = _local_options(options, ndp)
    local_h = local_opts.height
    sid = ctx.tables.pixel_sequence_id
    soff = ctx.tables.pixel_sequence_offset
    dummy = jnp.zeros((1, 1), sid.dtype)
    ctx_base = ctx.replace(
        tables=ctx.tables.replace(
            pixel_sequence_id=dummy, pixel_sequence_offset=dummy
        )
    )

    def loss_fn(params, sample_index):
        sc = apply_material_params(scene, params)

        def body(sid_rows, soff_rows, accum_slice, base):
            row_off = jax.lax.axis_index("dp") * local_h
            idx = base * s + jax.lax.axis_index("sp")
            tables = ctx_base.tables.replace(
                pixel_sequence_id=sid_rows, pixel_sequence_offset=soff_rows
            )
            frame = FrameGlobals.create(0).replace(
                sample_index=jnp.int32(idx), row_offset=jnp.int32(row_off)
            )
            a = render_pass(
                sc, camera, ctx_base.replace(tables=tables), local_opts,
                frame, accum_slice[0],
            )
            return a[None]

        accum = jax.shard_map(
            body, mesh=mesh,
            in_specs=(P("dp", None), P("dp", None),
                      P("sp", None, "dp", None), P()),
            out_specs=P("sp", None, "dp", None),
            check_vma=False,
        )(sid, soff, accum0, jnp.int32(sample_index))
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
