"""The wavefront path-tracing integrator.

TPU-native replacement for OpenRL's per-pass device dispatch
(``PassGenerator::runRenderFrameJob``, ``rlRenderFrame``): one jitted pure
function per progressive pass.  Per pass every pixel traces one camera ray
(``perspective.rlsl``); a ``lax.scan`` over bounce depth intersects, shades
(NEE shadow ray + extension ray, ``shade.py``) and accumulates into a planar
``(4, H, W)`` buffer whose channel 3 counts passes per pixel
(``PixelPackBuffer.h:44``, ``displayGL.frag:76-78``).  All per-ray state is
planar — flat (R,) scalars and ``Vec3`` of them (see ``heatray_tpu.vec``).

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
    gather_geo_normal,
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
from ..vec import Vec3
from .envmap import env_radiance
from .multiscatter import multiscatter_lut_jnp
from .shade import shade_hits


@struct.dataclass
class RenderContext:
    """Per-configuration constant data (a pytree): QMC tables + LUTs."""

    tables: SampleTables
    ms_lut: jnp.ndarray  # (128, 128) multiscatter LUT


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


def _mat3_apply(m, v: Vec3) -> Vec3:
    """Apply the upper-left 3x3 of a (4, 4) matrix to a planar Vec3."""
    return Vec3(
        m[0, 0] * v.x + m[0, 1] * v.y + m[0, 2] * v.z,
        m[1, 0] * v.x + m[1, 1] * v.y + m[1, 2] * v.z,
        m[2, 0] * v.x + m[2, 1] * v.y + m[2, 2] * v.z,
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

    ju, jv = get_sequence_value(tables, seq_id, sample_index + seq_off)
    u = (px + ju) / w
    v = (py + jv) / h

    # Image-plane direction in camera space (1 unit in front of the camera).
    # ``perspective.rlsl:72-74``: y = (1 - 2v) * fovTan * -1 — row 0 is the
    # image bottom.
    x = (2.0 * u - 1.0) * camera.aspect * camera.fov_tan
    y = (1.0 - 2.0 * v) * camera.fov_tan * -1.0
    dir_cam = Vec3(x, y, -jnp.ones_like(x)).normalized()

    focal_point = dir_cam * camera.focus_distance
    au, av = get_aperture_sample(tables, seq_id, sample_index)
    origin_cam = Vec3(
        (au * 2.0 - 1.0) * camera.aperture_radius,
        (av * 2.0 - 1.0) * camera.aperture_radius,
        jnp.zeros_like(au),
    )
    d_cam = focal_point - origin_cam

    m = camera.view_matrix
    org = _mat3_apply(m, origin_cam) + Vec3(m[0, 3], m[1, 3], m[2, 3])
    direction = _mat3_apply(m, d_cam).normalized()
    return org, direction, seq_id, seq_off


def _offset_origin(p: Vec3, geo_n: Vec3, direction: Vec3, eps) -> Vec3:
    """Offset a secondary-ray origin off the surface along the geometric
    normal (signed toward the ray direction's side)."""
    sign = jnp.where(geo_n.dot(direction) >= 0.0, 1.0, -1.0)
    return p + geo_n * (sign * eps)


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
    if _use_pallas(options, accel.w.shape[1]):
        packed = pack_for_pallas(accel)

        def closest(org, direction, t_min):
            t, tid, hit = intersect_closest_pallas(
                packed, org, direction, t_min=t_min
            )
            # Front-facing = approaching against the geometric normal.
            n = gather_geo_normal(accel, tid)
            front = direction.dot(n) < 0.0
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


def _accum_update(contrib: Vec3, h: int, w: int) -> jnp.ndarray:
    """Flat per-pixel contribution -> planar (4, H, W) update (channel 3 = 1
    pass per pixel)."""
    return jnp.stack(
        [
            contrib.x.reshape(h, w),
            contrib.y.reshape(h, w),
            contrib.z.reshape(h, w),
            jnp.ones((h, w), jnp.float32),
        ],
        axis=0,
    )


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
    """Trace one progressive pass and accumulate into ``accum`` (4, H, W).

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
    r = org.x.shape[0]
    weight = Vec3.ones((r,))
    env_on_miss = jnp.ones((r,), bool)  # camera rays see the env on miss
    active = jnp.ones((r,), bool)
    contrib = Vec3.zeros((r,))

    # Surface-attribute AOVs short-circuit after the primary hit
    # (``physicallyBased.rlsl:159-203``).
    from .aov import SURFACE_AOVS, accum_visualize, compute_surface_aov

    if options.aov in SURFACE_AOVS:
        t, tid, front, hit = closest_fn(org, direction, eps)
        _, b1, b2 = hit_attributes(accel, org, direction, tid, hit)
        value = compute_surface_aov(
            scene, options.aov, direction, b1, b2, tid, front, hit
        )
        update = _accum_update(value, h, w)
        if with_stats:
            return accum + update, {"rays": jnp.int32(r)}
        return accum + update

    if options.aov in (AOV.NANS, AOV.INFS):
        # Accumulator visualizer replaces the firefly clamp
        # (``accumulator.rlsl:12-24``).
        clamp = lambda c: accum_visualize(options.aov, c)
    else:
        clamp = lambda c: c.minimum(frame.max_channel_value)

    def bounce(carry, depth):
        org, direction, weight, env_on_miss, active, contrib, ray_count = carry

        t, tid, front, hit = closest_fn(org, direction, eps)
        hit = hit & active

        # Miss: environment (only for rays whose default primitive is the
        # env light — camera + glass-refraction rays).
        miss_env = active & (~hit) & env_on_miss & (scene.lights.env_enabled > 0)
        env_c = env_radiance(scene.lights, direction) * weight
        contrib = contrib + Vec3.where(miss_env, clamp(env_c), 0.0)

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

        p = org + direction * t_sane
        geo_n = gather_geo_normal(accel, tid)

        # NEE shadow rays (occlusion query with per-ray maxT).
        s_org = _offset_origin(p, geo_n, res.shadow_dir, eps)
        blocked = any_fn(
            s_org, res.shadow_dir, eps, res.shadow_max_t - 2.0 * eps
        )
        lit = res.shadow_active & (~blocked)
        contrib = contrib + Vec3.where(
            lit, clamp(res.shadow_weight * res.shadow_radiance), 0.0
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

    update = _accum_update(contrib, h, w)
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

    Returns (accum, ctx); ``accum`` is planar (4, H, W) — ``resolve(accum)``
    is the linear (H, W, 3) image.  Pass ``accum``/``start_pass`` to resume
    (checkpoint/restart).
    """
    if ctx is None:
        ctx = make_context(options)
    if num_passes is None:
        num_passes = options.max_render_passes
    if accum is None:
        accum = jnp.zeros((4, options.height, options.width), jnp.float32)
    for i in range(start_pass, start_pass + num_passes):
        frame = FrameGlobals.create(
            sample_index=i, max_channel_value=max_channel_value
        )
        accum = render_pass(scene, camera, ctx, options, frame, accum)
    return accum, ctx


def resolve(accum: jnp.ndarray) -> jnp.ndarray:
    """Planar (4, H, W) accumulation buffer -> (H, W, 3) linear image
    (divide by per-pixel pass count, ``displayGL.frag:76-78``)."""
    img = accum[:3] / jnp.maximum(accum[3:], 1.0)
    return jnp.transpose(img, (1, 2, 0))
