"""The wavefront path-tracing integrator.

TPU-native replacement for OpenRL's per-pass device dispatch
(``PassGenerator::runRenderFrameJob``, ``rlRenderFrame``): one jitted pure
function per progressive pass.  Per pass every pixel traces one camera ray
(``perspective.rlsl``); a ``lax.scan`` over bounce depth intersects, shades
(NEE shadow ray + extension ray, ``shade.py``) and accumulates into an
(H, W, 4) buffer whose alpha channel counts passes per pixel
(``PixelPackBuffer.h:44``, ``displayGL.frag:76-78``).

Image convention: row 0 is the BOTTOM of the image (OpenRL's frame
coordinate convention, ``perspective.rlsl:73``); io_utils flips on save.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import struct

from ..camera import CameraParams
from ..options import AOV, FrameGlobals, RenderOptions
from ..ops.intersect import (
    build_woop,
    hit_attributes,
    intersect_any,
    intersect_closest,
)
from ..ops.intersect_pallas import (
    intersect_any_pallas,
    intersect_closest_pallas,
    pack_for_pallas,
)
from ..sampling.tables import (
    SampleTables,
    build_tables,
    get_aperture_sample,
    get_sequence_value,
)
from ..scene.scene import Scene
from .envmap import env_radiance
from .multiscatter import multiscatter_lut_jnp
from .onb import normalize
from .shade import shade_hits


@struct.dataclass
class RenderContext:
    """Per-configuration constant data (a pytree): QMC tables + LUTs."""

    tables: SampleTables
    ms_lut: jnp.ndarray  # (128, 128, 1) multiscatter LUT


def make_context(options: RenderOptions) -> RenderContext:
    return RenderContext(
        tables=build_tables(
            options.width,
            options.height,
            options.max_render_passes,
            sample_mode=options.sample_mode,
            bokeh_shape=options.bokeh_shape,
        ),
        ms_lut=multiscatter_lut_jnp(),
    )


def generate_primary_rays(
    camera: CameraParams,
    tables: SampleTables,
    options: RenderOptions,
    sample_index,
):
    """Camera ray generation, porting ``perspective.rlsl:59-93`` (pixel
    jitter from the pixel's QMC stream, thin-lens aperture offset)."""
    h, w = options.height, options.width
    seq_id = tables.pixel_sequence_id.reshape(-1)
    seq_off = tables.pixel_sequence_offset.reshape(-1)

    px = jnp.tile(jnp.arange(w, dtype=jnp.float32), h)
    py = jnp.repeat(jnp.arange(h, dtype=jnp.float32), w)

    jitter = get_sequence_value(tables, seq_id, sample_index + seq_off)
    u = (px + jitter[:, 0]) / w
    v = (py + jitter[:, 1]) / h

    # Image-plane direction in camera space (1 unit in front of the camera).
    # ``perspective.rlsl:72-74``: y = (1 - 2v) * fovTan * -1 — row 0 is the
    # image bottom.
    x = (2.0 * u - 1.0) * camera.aspect * camera.fov_tan
    y = (1.0 - 2.0 * v) * camera.fov_tan * -1.0
    dir_cam = normalize(jnp.stack([x, y, -jnp.ones_like(x)], axis=-1))

    focal_point = camera.focus_distance * dir_cam
    ap = get_aperture_sample(tables, seq_id, sample_index)
    ap = (ap * 2.0 - 1.0) * camera.aperture_radius
    origin_cam = jnp.concatenate([ap, jnp.zeros((ap.shape[0], 1))], axis=-1)
    d_cam = focal_point - origin_cam

    rot = camera.view_matrix[:3, :3]
    trans = camera.view_matrix[:3, 3]
    org = origin_cam @ rot.T + trans
    direction = normalize(d_cam @ rot.T)
    return org, direction, seq_id, seq_off


def _offset_origin(p, geo_n, direction, eps):
    """Offset a secondary-ray origin off the surface along the geometric
    normal (signed toward the ray direction's side)."""
    sign = jnp.where(jnp.sum(geo_n * direction, axis=-1) >= 0.0, 1.0, -1.0)
    return p + geo_n * (sign * eps)[:, None]


def _use_pallas(options: RenderOptions, num_triangles: int) -> bool:
    """Backend select: fused Pallas kernels on TPU-like platforms (the
    triangle table must fit VMEM), XLA tiled path elsewhere."""
    if options.intersect_backend == "pallas":
        return True
    if options.intersect_backend == "xla":
        return False
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    return on_tpu and num_triangles <= 250_000


def _make_intersectors(accel, options: RenderOptions):
    """Returns (closest, any) callables with a uniform signature."""
    if _use_pallas(options, accel.w.shape[0]):
        packed = pack_for_pallas(accel)
        geo_n = accel.geo_normal

        def closest(org, direction, t_min):
            t, tid, hit = intersect_closest_pallas(
                packed, org, direction, t_min=t_min
            )
            # Front-facing = approaching against the geometric normal.
            n = jnp.take(geo_n, jnp.maximum(tid, 0), axis=0)
            front = jnp.sum(direction * n, axis=-1) < 0.0
            return t, tid, front, hit

        def any_hit(org, direction, t_min, t_max):
            return intersect_any_pallas(
                packed, org, direction, t_min=t_min, t_max=t_max
            )

    else:

        def closest(org, direction, t_min):
            return intersect_closest(
                accel, org, direction, t_min=t_min,
                tri_chunk=options.tri_chunk, ray_block=options.ray_block,
            )

        def any_hit(org, direction, t_min, t_max):
            return intersect_any(
                accel, org, direction, t_min=t_min, t_max=t_max,
                tri_chunk=options.tri_chunk, ray_block=options.ray_block,
            )

    return closest, any_hit


@functools.partial(jax.jit, static_argnames=("options", "with_stats"))
def render_pass(
    scene: Scene,
    camera: CameraParams,
    ctx: RenderContext,
    options: RenderOptions,
    frame: FrameGlobals,
    accum: jnp.ndarray,
    with_stats: bool = False,
) -> jnp.ndarray:
    """Trace one progressive pass and accumulate into ``accum`` (H, W, 4).

    With ``with_stats=True`` returns ``(accum, stats)`` where stats counts
    the traced rays (primary + per-bounce extension and shadow rays) — the
    basis of the rays/s benchmark metric.
    """
    h, w = options.height, options.width
    eps = options.ray_epsilon
    accel = build_woop(scene.geometry.positions, scene.geometry.indices)
    closest_fn, any_fn = _make_intersectors(accel, options)

    org, direction, seq_id, seq_off = generate_primary_rays(
        camera, ctx.tables, options, frame.sample_index
    )
    r = org.shape[0]
    weight = jnp.ones((r, 3), jnp.float32)
    env_on_miss = jnp.ones((r,), bool)  # camera rays see the env on miss
    active = jnp.ones((r,), bool)
    contrib = jnp.zeros((r, 3), jnp.float32)

    # Surface-attribute AOVs short-circuit after the primary hit
    # (``physicallyBased.rlsl:159-203``).
    from .aov import SURFACE_AOVS, accum_visualize, compute_surface_aov

    if options.aov in SURFACE_AOVS:
        t, tid, front, hit = closest_fn(org, direction, eps)
        _, b1, b2 = hit_attributes(accel, org, direction, tid, hit)
        value = compute_surface_aov(
            scene, options.aov, direction, b1, b2, tid, front, hit
        )
        update = jnp.concatenate(
            [value, jnp.ones((r, 1), jnp.float32)], axis=-1
        ).reshape(h, w, 4)
        if with_stats:
            return accum + update, {"rays": jnp.int32(r)}
        return accum + update

    if options.aov in (AOV.NANS, AOV.INFS):
        # Accumulator visualizer replaces the firefly clamp
        # (``accumulator.rlsl:12-24``).
        clamp = lambda c: accum_visualize(options.aov, c)
    else:
        clamp = lambda c: jnp.minimum(c, frame.max_channel_value)

    def bounce(carry, depth):
        org, direction, weight, env_on_miss, active, contrib, ray_count = carry

        t, tid, front, hit = closest_fn(org, direction, eps)
        hit = hit & active

        # Miss: environment (only for rays whose default primitive is the
        # env light — camera + glass-refraction rays).
        miss_env = active & (~hit) & env_on_miss & (scene.lights.env_enabled > 0)
        env_c = env_radiance(scene.lights, direction) * weight
        contrib = contrib + jnp.where(miss_env[:, None], clamp(env_c), 0.0)

        # Differentiable hit attributes; sanitize t for dead lanes so no
        # NaN/Inf flows through the masked math.
        t_d, b1, b2 = hit_attributes(accel, org, direction, tid, hit)
        t_sane = jnp.where(hit, t_d, 1.0)

        res = shade_hits(
            scene,
            ctx.ms_lut,
            ctx.tables,
            frame.sample_index,
            depth,
            org,
            direction,
            weight,
            env_on_miss,
            seq_id,
            seq_off,
            t_sane,
            b1,
            b2,
            tid,
            front,
            hit,
            max_ray_depth=options.max_ray_depth,
            rr_start_depth=options.rr_start_depth,
        )
        contrib = contrib + clamp(res.emission)

        p = org + t_sane[:, None] * direction
        geo_n = jnp.take(accel.geo_normal, jnp.maximum(tid, 0), axis=0)

        # NEE shadow rays (occlusion query with per-ray maxT).
        s_org = _offset_origin(p, geo_n, res.shadow_dir, eps)
        blocked = any_fn(
            s_org, res.shadow_dir, eps, res.shadow_max_t - 2.0 * eps
        )
        lit = res.shadow_active & (~blocked)
        contrib = contrib + jnp.where(
            lit[:, None], clamp(res.shadow_weight * res.shadow_radiance), 0.0
        )

        # Ray accounting: this bounce's closest-hit lanes + shadow lanes.
        ray_count = (
            ray_count
            + jnp.sum(active.astype(jnp.int32))
            + jnp.sum(res.shadow_active.astype(jnp.int32))
        )

        # Extension rays.
        e_org = _offset_origin(p, geo_n, res.ext_dir, eps)
        new_carry = (
            e_org,
            res.ext_dir,
            res.ext_weight,
            res.ext_env_on_miss,
            res.ext_active,
            contrib,
            ray_count,
        )
        return new_carry, None

    depths = jnp.arange(1, options.max_ray_depth + 1, dtype=jnp.int32)
    init = (org, direction, weight, env_on_miss, active, contrib, jnp.int32(0))
    (_, _, _, _, _, contrib, ray_count), _ = jax.lax.scan(bounce, init, depths)

    update = jnp.concatenate(
        [contrib, jnp.ones((r, 1), jnp.float32)], axis=-1
    ).reshape(h, w, 4)
    if with_stats:
        return accum + update, {"rays": ray_count}
    return accum + update


def render(
    scene: Scene,
    camera: CameraParams,
    options: RenderOptions,
    num_passes: int | None = None,
    ctx: RenderContext | None = None,
    max_channel_value: float = 3.14159265,
    accum: jnp.ndarray | None = None,
    start_pass: int = 0,
):
    """Progressive render: ``num_passes`` passes (host loop over the jitted
    pass function, the analog of ``PassGenerator``'s offline mode).

    Returns (accum, ctx); ``accum[..., :3] / accum[..., 3:]`` is the linear
    image.  Pass ``accum``/``start_pass`` to resume (checkpoint/restart).
    """
    if ctx is None:
        ctx = make_context(options)
    if num_passes is None:
        num_passes = options.max_render_passes
    if accum is None:
        accum = jnp.zeros((options.height, options.width, 4), jnp.float32)
    for i in range(start_pass, start_pass + num_passes):
        frame = FrameGlobals.create(
            sample_index=i, max_channel_value=max_channel_value
        )
        accum = render_pass(scene, camera, ctx, options, frame, accum)
    return accum, ctx


def resolve(accum: jnp.ndarray) -> jnp.ndarray:
    """Accumulation buffer -> linear image (divide by per-pixel pass count,
    ``displayGL.frag:76-78``)."""
    return accum[..., :3] / jnp.maximum(accum[..., 3:], 1.0)
