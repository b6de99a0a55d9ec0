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
from jax.ad_checkpoint import checkpoint_name

from ..camera import CameraParams
from ..options import AOV, FrameGlobals, RenderOptions
from ..ops.bvh import BVH, build_bvh
from ..ops.intersect import (
    WoopAccel,
    build_woop,
    intersect_any,
    intersect_closest,
)
from ..ops.intersect_pallas import (
    WoopPallas,
    intersect_any_pallas,
    intersect_closest_pallas,
    pack_for_pallas,
)
from ..ops.traverse_pallas import intersect_any_bvh, intersect_closest_bvh
from ..ops.wide_bvh import (
    WideBVH,
    build_wide_bvh,
    intersect_any_stream,
    intersect_any_vpu,
    intersect_any_wide,
    intersect_closest_stream,
    intersect_closest_vpu,
    intersect_closest_wide,
)
from ..sampling.tables import (
    SampleTables,
    build_tables,
    get_aperture_sample,
)
from ..scene.scene import Scene
from ..vec import Vec3
from .envmap import env_radiance
from .multiscatter import multiscatter_lut_packed
from .shade import make_sequence_lookup, shade_hits
from .shade_table import (
    GEO_N,
    build_shade_table,
    gather_rows,
    hit_attributes_rows,
)


@struct.dataclass
class AccelPack:
    """Prebuilt per-scene acceleration state (a pytree), hoisted out of the
    per-pass graph: the Woop accel, the fat shading row table, and the
    backend-specific packs.  Built host-side (``build_accel``) because BVH
    topology needs concrete geometry; when absent, ``render_pass`` rebuilds
    everything in-graph (the differentiable-rebuild mode for inverse
    rendering over vertex positions)."""

    accel: WoopAccel
    occl_accel: WoopAccel  # alpha-mask filtered (== accel when no masking)
    # (T, NUM_COLS) or None: inverse rendering over materials needs the
    # table rebuilt in-graph (it bakes material parameters), while geometry
    # stays accelerated — build with ``static_shading=False`` for that.
    # For the wide/stream backends the table is SLOT-ordered (row i = BVH
    # chunk-slot i, zero rows for padding slots) so the traversal kernels'
    # raw slot ids index it directly — no per-ray id translation (a flat
    # (R,)-sized gather, ~15 ms per bounce at 1080p) anywhere on the hot
    # path.
    shade_table: jnp.ndarray | None
    bvh: BVH | None
    bvh_occl: BVH | None
    packed: WoopPallas | None
    packed_occl: WoopPallas | None
    wide: WideBVH | None = None
    wide_occl: WideBVH | None = None
    backend: str = struct.field(pytree_node=False, default="xla")
    # Host-sharded geometry (backend "sharded"): the Morton shard forest
    # of per-shard wide BVHs, device-sharded over ``mesh[shard_axis]``.
    swide: object | None = None  # ShardedWideBVH
    swide_occl: object | None = None
    mesh: object = struct.field(pytree_node=False, default=None)
    shard_axis: str = struct.field(pytree_node=False, default="dp")


@struct.dataclass
class RenderContext:
    """Per-configuration constant data (a pytree): QMC tables, LUTs, and —
    when built with a scene — the prebuilt acceleration pack."""

    tables: SampleTables
    ms_lut: jnp.ndarray  # ((L+1)^2, 4) corner-packed multiscatter LUT
    accel_pack: AccelPack | None = None


def _select_backend(options: RenderOptions, num_triangles: int) -> str:
    """Resolve the intersection backend for this platform + scene size."""
    if options.intersect_backend != "auto":
        return options.intersect_backend
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    if not on_tpu:
        return "xla"
    # The VMEM-resident kernels keep the whole chunked Woop table in VMEM;
    # past that budget the HBM-streaming traversal takes over (leaf chunks
    # DMA'd on demand; node arrays stay resident).
    if num_triangles <= 250_000:
        return "wide"
    from ..utils.log import get_logger

    get_logger("integrator").info(
        "scene has %d triangles > 250k VMEM budget: using the HBM-streaming "
        "wide-BVH backend", num_triangles,
    )
    return "stream"


def _slot_order_table(table: jnp.ndarray, slot_tri: jnp.ndarray) -> jnp.ndarray:
    """Reorder a (T, K) tri-ordered shade table into wide-BVH chunk-slot
    order ((S, K), S = chunks * leaf_size; padding slots get zero rows) so
    raw kernel slot ids index it directly."""
    safe = jnp.maximum(slot_tri, 0)
    rows = jnp.take(table, safe, axis=0)
    return rows * (slot_tri >= 0).astype(table.dtype)[:, None]


def build_accel(
    scene: Scene,
    options: RenderOptions,
    static_shading: bool = True,
    mesh=None,
    shard_axis: str = "dp",
) -> AccelPack:
    """Build the per-scene acceleration pack (host side, outside jit).

    Device-side pieces run under jit: one eager jnp op costs seconds of
    round-trip latency on a tunneled remote TPU, and build_woop alone is
    ~60 ops.

    ``intersect_backend="sharded"`` (host-sharded geometry, SURVEY
    section 2.4): pass a ``mesh`` — one wide BVH is built per Morton shard
    of the triangle range and device-sharded over ``mesh[shard_axis]``;
    every device traverses the full wavefront against its shard only."""
    accel = jax.jit(build_woop)(
        scene.geometry.positions, scene.geometry.indices
    )
    occl_accel = (
        jax.jit(_occluder_accel)(accel, scene)
        if scene.has_alpha_mask
        else accel
    )
    backend = _select_backend(options, accel.num_triangles)
    bvh = bvh_occl = packed = packed_occl = wide = wide_occl = None
    swide = swide_occl = None

    def _occl_include():
        import numpy as np

        return (
            np.asarray(
                jnp.take(
                    scene.materials.alpha_mask, scene.geometry.material_ids
                )
            )
            == 0
        )

    if backend == "sharded":
        from ..parallel.geometry import build_sharded_wide, place_sharded_wide

        assert mesh is not None, (
            'intersect_backend="sharded" needs build_accel(..., mesh=...)'
        )
        sched = (
            "fused"
            if options.wide_leaf_math == "mxu"
            and options.wide_precision == "bf16x3"
            else "f32"
        )
        d = mesh.shape[shard_axis]
        swide = place_sharded_wide(
            build_sharded_wide(
                accel, d, leaf_size=options.wide_leaf_size, schedule=sched
            ),
            mesh,
            shard_axis,
        )
        swide_occl = (
            place_sharded_wide(
                build_sharded_wide(
                    accel, d, leaf_size=options.wide_leaf_size,
                    include=_occl_include(), schedule=sched,
                ),
                mesh,
                shard_axis,
            )
            if scene.has_alpha_mask
            else swide
        )
    elif backend in ("wide", "stream"):
        if backend == "stream":
            ls = options.stream_leaf_size
        else:
            ls = options.wide_leaf_size
            if options.wide_leaf_math == "vpu":
                ls = -(-ls // 128) * 128  # lane-tile alignment

        # Fused single-pass bf16x3 pack for the VMEM MXU kernels; the
        # streaming / VPU / HIGHEST paths need the classic f32 layout.
        sched = (
            "fused"
            if backend == "wide"
            and options.wide_leaf_math == "mxu"
            and options.wide_precision == "bf16x3"
            else "f32"
        )
        wide = build_wide_bvh(accel, leaf_size=ls, schedule=sched)
        wide_occl = (
            build_wide_bvh(
                accel, leaf_size=ls, include=_occl_include(), schedule=sched
            )
            if scene.has_alpha_mask
            else wide
        )
    elif backend == "bvh":
        bvh = build_bvh(accel, leaf_size=options.bvh_leaf_size)
        if scene.has_alpha_mask:
            bvh_occl = build_bvh(
                accel, leaf_size=options.bvh_leaf_size,
                include=_occl_include(),
            )
        else:
            bvh_occl = bvh
    elif backend == "pallas":
        pack_fn = jax.jit(pack_for_pallas, static_argnames="tri_chunk")
        packed = pack_fn(accel, tri_chunk=options.pallas_tri_chunk)
        packed_occl = (
            packed
            if occl_accel is accel
            else pack_fn(occl_accel, tri_chunk=options.pallas_tri_chunk)
        )
    # Surface AOVs read the texture-tail columns (UVs/tangents/tex ids), so
    # debug renders always build the full table; the hot path gathers only
    # the base columns for untextured scenes.
    textured = scene.has_textures or options.aov != AOV.NONE

    def _build_table(scene, accel, slot_tri):
        table = build_shade_table(scene, accel, textured=textured)
        if slot_tri is not None:
            table = _slot_order_table(table, slot_tri)
        return table

    if wide is not None:
        slot_tri = wide.slot_tri
    elif swide is not None:
        slot_tri = swide.slot_tri.reshape(-1)  # global slot -> global tri
    else:
        slot_tri = None
    return AccelPack(
        accel=accel,
        occl_accel=occl_accel,
        shade_table=(
            jax.jit(_build_table)(scene, accel, slot_tri)
            if static_shading
            else None
        ),
        bvh=bvh,
        bvh_occl=bvh_occl,
        packed=packed,
        packed_occl=packed_occl,
        wide=wide,
        wide_occl=wide_occl,
        backend=backend,
        swide=swide,
        swide_occl=swide_occl,
        mesh=mesh,
        shard_axis=shard_axis,
    )


def make_context(
    options: RenderOptions,
    scene: Scene | None = None,
    static_shading: bool = True,
    mesh=None,
    shard_axis: str = "dp",
) -> RenderContext:
    return RenderContext(
        tables=build_tables(
            options.width,
            options.height,
            options.max_render_passes,
            sample_mode=options.sample_mode,
            bokeh_shape=options.bokeh_shape,
        ),
        ms_lut=multiscatter_lut_packed(),
        accel_pack=(
            build_accel(
                scene, options, static_shading=static_shading,
                mesh=mesh, shard_axis=shard_axis,
            )
            if scene is not None
            else None
        ),
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
    row_offset=0,
):
    """Camera ray generation, porting ``perspective.rlsl:59-93`` (pixel
    jitter from the pixel's QMC stream, thin-lens aperture offset).

    ``row_offset`` (traced scalar) is this shard's global row of the
    row-partitioned image; camera v-mapping always uses the FULL height.
    """
    h, w = options.height, options.width
    full_h = options.image_height or options.height
    seq_id = tables.pixel_sequence_id.reshape(-1)
    seq_off = tables.pixel_sequence_offset.reshape(-1)

    px = jnp.tile(jnp.arange(w, dtype=jnp.float32), h)
    py = (
        jnp.repeat(jnp.arange(h, dtype=jnp.float32), w)
        + jnp.asarray(row_offset, jnp.float32)
    )

    seq_lookup = make_sequence_lookup(tables, options.sample_mode)
    ju, jv = seq_lookup(seq_id, sample_index + seq_off)
    u = (px + ju) / w
    v = (py + jv) / full_h

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


_PARK_ORG = 3.0e37


def _park_dead(org: Vec3, direction: Vec3, active):
    """Park inactive rays far outside every AABB with a +X direction whose
    zero y/z slabs produce -inf intervals: whole tiles of dead rays then
    fail every chunk's slab test and skip all triangle math (the wavefront
    shrinks with depth but stays fixed-shape — this is the masked-lane
    analog of queue compaction)."""
    zero = jnp.zeros_like(org.x)
    parked_o = Vec3.where(active, org, _PARK_ORG)
    parked_d = Vec3.where(
        active, direction, Vec3(zero + 1.0, zero, zero)
    )
    return parked_o, parked_d


def _use_pallas(options: RenderOptions, num_triangles: int) -> bool:
    """Backend select for the in-graph (no prebuilt pack) path: fused Pallas
    chunk kernels on TPU-like platforms, XLA tiled path elsewhere.  The BVH
    backends are only reachable through ``build_accel`` (host-side build)."""
    if options.intersect_backend in ("pallas", "bvh", "wide", "stream"):
        return True
    if options.intersect_backend == "xla":
        return False
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    return on_tpu and num_triangles <= 250_000


def _occluder_accel(accel, scene: Scene):
    """Filter alpha-masked triangles out of the occlusion accel: the
    reference marks alpha-masked primitives non-occluder
    (``Mesh.cpp:95-100``), so they never block shadow rays.  Zeroed Woop
    rows give dp_s == 0 -> never hit; their AABBs become empty."""
    mask = jnp.take(scene.materials.alpha_mask, scene.geometry.material_ids) == 0
    big = jnp.float32(3.0e38)
    return accel.replace(
        w=accel.w * mask[None, :].astype(jnp.float32),
        tri_min=jnp.where(mask[None, :], accel.tri_min, big),
        tri_max=jnp.where(mask[None, :], accel.tri_max, -big),
    )


def _wavefront_lane(r: int) -> int:
    """Lane width for the 2D wavefront: flat (R,) arrays use 1/8 of the VPU
    (one sublane); (R/lane, lane) tiles fully (measured 3.9x on v5e)."""
    lane = 1024
    while lane > 1 and r % lane:
        lane //= 2
    return lane


def _shape_wrap(fn_flat):
    """Lift a flat-wavefront intersector to arbitrary ray shapes."""

    def fn(org, direction, *args):
        shp = org.x.shape
        flat = lambda v: Vec3(
            v.x.reshape(-1), v.y.reshape(-1), v.z.reshape(-1)
        )
        args = tuple(
            a.reshape(-1) if hasattr(a, "reshape") and jnp.ndim(a) > 1 else a
            for a in args
        )
        out = fn_flat(flat(org), flat(direction), *args)
        if isinstance(out, tuple):
            return tuple(o.reshape(shp) for o in out)
        return out.reshape(shp)

    return fn


def _make_wide_intersectors(
    pack: AccelPack, options: RenderOptions, stream: bool = False
):
    """(closest, any) over the prebuilt arity-8 BVH traversal kernels
    (``stream=True``: the HBM-resident-leaf variants for large scenes).

    ``closest`` returns (t, slot_id, hit): SLOT ids, matching the
    slot-ordered shade table (see ``_slot_order_table``) — facingness and
    geometry attributes come from the one fat row-gather downstream."""
    rt = options.stream_ray_tile if stream else options.wide_ray_tile
    prec = (
        "bf16x3"
        if options.wide_precision == "bf16x3"
        else jax.lax.Precision.HIGHEST
    )
    kw = {"precision": prec}
    if stream:
        closest_k, any_k = intersect_closest_stream, intersect_any_stream
        kw["leaf_math"] = options.stream_leaf_math
    elif options.wide_leaf_math == "vpu":
        closest_k, any_k = intersect_closest_vpu, intersect_any_vpu
        kw = {}  # VPU math is exact f32; no schedule knob
    else:
        closest_k, any_k = intersect_closest_wide, intersect_any_wide

    def closest(org, direction, t_min):
        return closest_k(
            pack.wide, org, direction, t_min=t_min, ray_tile=rt,
            return_slots=True, **kw,
        )

    def any_hit(org, direction, t_min, t_max):
        return any_k(
            pack.wide_occl, org, direction, t_min=t_min, t_max=t_max,
            ray_tile=rt, **kw,
        )

    return _shape_wrap(closest), _shape_wrap(any_hit)


def _make_sharded_geo_intersectors(pack: AccelPack, options: RenderOptions):
    """(closest, any) over the host-sharded wide-BVH forest: shard_map
    over ``pack.mesh[pack.shard_axis]``, full wavefront replicated, (t,
    global slot) min-reduced over the axis.  Slot ids index the
    concatenated slot-ordered shade table directly."""
    from ..parallel.geometry import make_sharded_wide_intersectors

    prec = (
        "bf16x3"
        if options.wide_precision == "bf16x3"
        else jax.lax.Precision.HIGHEST
    )
    closest, any_hit = make_sharded_wide_intersectors(
        pack.swide,
        pack.swide_occl,
        pack.mesh,
        axis=pack.shard_axis,
        ray_tile=options.wide_ray_tile,
        precision=prec,
        interpret=jax.default_backend() in ("cpu", "gpu"),
    )
    return _shape_wrap(closest), _shape_wrap(any_hit)


def _make_bvh_intersectors(pack: AccelPack, options: RenderOptions):
    """(closest, any) over the prebuilt BVH traversal kernels."""
    rt = options.pallas_ray_tile

    def closest(org, direction, t_min):
        return intersect_closest_bvh(
            pack.bvh, org, direction, t_min=t_min, ray_tile=rt
        )

    def any_hit(org, direction, t_min, t_max):
        return intersect_any_bvh(
            pack.bvh_occl, org, direction, t_min=t_min, t_max=t_max,
            ray_tile=rt,
        )

    return _shape_wrap(closest), _shape_wrap(any_hit)


def _make_packed_intersectors(pack: AccelPack, options: RenderOptions):
    """(closest, any) over prebuilt flat-chunk Pallas packs."""
    rt = options.pallas_ray_tile

    def closest(org, direction, t_min):
        return intersect_closest_pallas(
            pack.packed, org, direction, t_min=t_min, ray_tile=rt
        )

    def any_hit(org, direction, t_min, t_max):
        return intersect_any_pallas(
            pack.packed_occl, org, direction, t_min=t_min, t_max=t_max,
            ray_tile=rt,
        )

    return _shape_wrap(closest), _shape_wrap(any_hit)


def _make_intersectors(accel, occl_accel, options: RenderOptions):
    """Returns (closest, any) callables with a uniform (t, id, hit)
    contract (facingness is derived downstream from the gathered rows)."""
    if _use_pallas(options, accel.w.shape[1]):
        tc, rt = options.pallas_tri_chunk, options.pallas_ray_tile
        packed = pack_for_pallas(accel, tri_chunk=tc)
        packed_occl = (
            packed
            if occl_accel is accel
            else pack_for_pallas(occl_accel, tri_chunk=tc)
        )

        def closest(org, direction, t_min):
            return intersect_closest_pallas(
                packed, org, direction, t_min=t_min, ray_tile=rt
            )

        def any_hit(org, direction, t_min, t_max):
            return intersect_any_pallas(
                packed_occl, org, direction, t_min=t_min, t_max=t_max,
                ray_tile=rt,
            )

    else:

        def closest(org, direction, t_min):
            t, tid, front, hit = intersect_closest(
                accel, org, direction, t_min=t_min,
                tri_chunk=options.tri_chunk, ray_block=options.ray_block,
            )
            return t, tid, hit

        def any_hit(org, direction, t_min, t_max):
            return intersect_any(
                occl_accel, org, direction, t_min=t_min, t_max=t_max,
                tri_chunk=options.tri_chunk, ray_block=options.ray_block,
            )

    return _shape_wrap(closest), _shape_wrap(any_hit)


@jax.custom_vjp
def _sort_f32_planes(key, *planes):
    """Sort f32 ``planes`` by ``key`` (one multi-operand lax.sort: the
    payload moves with the keys — no gathers).  The custom VJP applies the
    INVERSE permutation by sorting the cotangents with the saved order as
    the key (sorting (order, ct) by order puts ct back in original lane
    order), instead of the default sort-transpose which lowers to one
    scatter per plane (~11 ms x planes x bounces at 2M rays on v5e)."""
    return jax.lax.sort((key,) + planes, num_keys=1)[1:]


def _sort_f32_planes_fwd(key, *planes):
    iota = jax.lax.iota(jnp.int32, key.shape[0])
    out = jax.lax.sort((key, iota) + planes, num_keys=1)
    return out[2:], out[1]  # sorted planes; residual = the order


def _sort_f32_planes_bwd(order, cts):
    import numpy as np

    restored = jax.lax.sort((order,) + tuple(cts), num_keys=1)[1:]
    key_ct = np.zeros(order.shape, jax.dtypes.float0)  # int key: no grad
    return (key_ct,) + restored


_sort_f32_planes.defvjp(_sort_f32_planes_fwd, _sort_f32_planes_bwd)


@jax.custom_vjp
def _permute_f32_planes(order, *planes):
    """Apply a permutation to f32 planes with ONE packed (P, R) gather.

    Slower per bounce than the multi-operand sort (~52 vs ~30 ms at 2M
    rays on v5e) but ~10x cheaper to COMPILE: variadic-sort compile time
    scales with payload bytes on the TPU compiler (tpu_compile_probe2.py:
    13 payloads = 143 s) while gathers compile in seconds.  The VJP
    gathers cotangents by the inverse permutation — no scatters."""
    packed = jnp.stack(planes, axis=0)
    out = jnp.take(packed, order, axis=1)
    return tuple(out[i] for i in range(len(planes)))


def _permute_f32_planes_fwd(order, *planes):
    return _permute_f32_planes(order, *planes), order


def _permute_f32_planes_bwd(order, cts):
    import numpy as np

    inv = jnp.zeros_like(order).at[order].set(
        jax.lax.iota(jnp.int32, order.shape[0])
    )
    packed = jnp.stack(cts, axis=0)
    out = jnp.take(packed, inv, axis=1)
    order_ct = np.zeros(order.shape, jax.dtypes.float0)
    return (order_ct,) + tuple(out[i] for i in range(len(cts)))


_permute_f32_planes.defvjp(_permute_f32_planes_fwd, _permute_f32_planes_bwd)


def _part1by2(x):
    """Spread the low 6 bits of ``x`` so they interleave 3 ways (Morton)."""
    x = x & 0x3F
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def _wavefront_sort_key(org: Vec3, direction: Vec3, active, lo, hi):
    """Coherence key for bounce-wavefront reordering: 3-bit direction
    octant (major) + 6-bit-per-axis Morton code of the origin within the
    scene AABB (minor).  Octant-major keeps each traversal tile's aggregate
    direction signs unanimous (the wide kernel's near-order select); Morton
    clusters tiles onto the same subtrees.  Inactive lanes sort last, so
    dead tiles fail the root test and exit after one node."""

    def q(c, l, h):
        s = (c - l) / jnp.maximum(h - l, 1e-6) * 64.0
        return jnp.clip(s.astype(jnp.int32), 0, 63)

    morton = (
        _part1by2(q(org.x, lo[0], hi[0]))
        | (_part1by2(q(org.y, lo[1], hi[1])) << 1)
        | (_part1by2(q(org.z, lo[2], hi[2])) << 2)
    )
    octant = (
        (direction.x >= 0).astype(jnp.int32)
        | ((direction.y >= 0).astype(jnp.int32) << 1)
        | ((direction.z >= 0).astype(jnp.int32) << 2)
    )
    key = (octant << 18) | morton
    return jnp.where(active, key, jnp.int32(1) << 28)


def _accum_update(contrib: Vec3, h: int, w: int, alpha=None) -> jnp.ndarray:
    """Flat per-pixel contribution -> planar (4, H, W) update (channel 3 =
    passes per pixel; 1 everywhere unless ``alpha`` gives a per-pixel
    count, as in interactive block mode)."""
    if alpha is None:
        alpha_img = jnp.ones((h, w), jnp.float32)
    else:
        alpha_img = alpha.reshape(h, w).astype(jnp.float32)
    return jnp.stack(
        [
            contrib.x.reshape(h, w),
            contrib.y.reshape(h, w),
            contrib.z.reshape(h, w),
            alpha_img,
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
    pack = ctx.accel_pack
    if pack is None:
        # Differentiable-rebuild mode: accel + shade table live inside the
        # pass graph so gradients reach vertex positions (inverse rendering
        # over geometry); pays a per-pass rebuild tax.
        accel = build_woop(scene.geometry.positions, scene.geometry.indices)
        occl_accel = (
            _occluder_accel(accel, scene) if scene.has_alpha_mask else accel
        )
        closest_fn, any_fn = _make_intersectors(accel, occl_accel, options)
        _textured = scene.has_textures or options.aov != AOV.NONE
        shade_table = build_shade_table(scene, accel, textured=_textured)
    else:
        _textured = scene.has_textures or options.aov != AOV.NONE
        if pack.shade_table is not None:
            shade_table = pack.shade_table
        else:
            # In-graph rebuild (differentiable materials): match the
            # backend's id space — slot order for the wide kernels.
            shade_table = build_shade_table(
                scene, pack.accel, textured=_textured
            )
            if pack.backend in ("wide", "stream"):
                shade_table = _slot_order_table(
                    shade_table, pack.wide.slot_tri
                )
            elif pack.backend == "sharded":
                shade_table = _slot_order_table(
                    shade_table, pack.swide.slot_tri.reshape(-1)
                )
        if pack.backend in ("wide", "stream"):
            closest_fn, any_fn = _make_wide_intersectors(
                pack, options, stream=pack.backend == "stream"
            )
        elif pack.backend == "sharded":
            closest_fn, any_fn = _make_sharded_geo_intersectors(
                pack, options
            )
        elif pack.backend == "bvh":
            closest_fn, any_fn = _make_bvh_intersectors(pack, options)
        elif pack.backend == "pallas":
            closest_fn, any_fn = _make_packed_intersectors(pack, options)
        else:
            closest_fn, any_fn = _make_intersectors(
                pack.accel, pack.occl_accel, options
            )

    # Interactive 3x3 block mode: pass k traces block pixel k % 9, and the
    # QMC sample index advances every 9 passes (``PassGenerator.cpp:372-384``).
    if options.interactive_block:
        block = jnp.remainder(frame.sample_index, 9)
        sample_index = frame.sample_index // 9
    else:
        block = None
        sample_index = frame.sample_index

    row_offset = (
        frame.row_offset if frame.row_offset is not None else jnp.int32(0)
    )
    with jax.named_scope("raygen"):
        org, direction, seq_id, seq_off = generate_primary_rays(
            camera, ctx.tables, options, sample_index, row_offset=row_offset
        )
    r = h * w
    # 2D wavefront: (R/lane, lane) tiles the VPU fully (flat (R,) arrays
    # run on one sublane — measured 3.9x slower on v5e).
    lane = _wavefront_lane(r)
    shape2 = (r // lane, lane)
    org = org.map(lambda c: c.reshape(shape2))
    direction = direction.map(lambda c: c.reshape(shape2))
    seq_id = seq_id.reshape(shape2)
    seq_off = seq_off.reshape(shape2)
    weight = Vec3.ones(shape2)
    env_on_miss = jnp.ones(shape2, bool)  # camera rays see the env on miss
    active = jnp.ones(shape2, bool)
    contrib = Vec3.zeros(shape2)
    alpha = None

    if block is not None:
        # Select the pixels at the current 3x3 block coordinate
        # (``perspective.rlsl:42-57``); everyone else is parked (culled).
        # Block coordinates are GLOBAL rows (row_offset for sharded images).
        px = jnp.tile(jnp.arange(w, dtype=jnp.int32), h).reshape(shape2)
        py = (
            jnp.repeat(jnp.arange(h, dtype=jnp.int32), w).reshape(shape2)
            + row_offset
        )
        selected = (jnp.remainder(px, 3) == jnp.remainder(block, 3)) & (
            jnp.remainder(py, 3) == block // 3
        )
        active = selected
        org, direction = _park_dead(org, direction, active)
        alpha = selected

    # Surface-attribute AOVs short-circuit after the primary hit
    # (``physicallyBased.rlsl:159-203``).
    from .aov import SURFACE_AOVS, accum_visualize, compute_surface_aov
    from .shade_table import NUM_COLS

    if options.aov in SURFACE_AOVS:
        if shade_table.shape[1] < NUM_COLS:
            # Pack was built for a non-AOV config (base columns only);
            # surface AOVs read the texture tail — rebuild in-graph.
            src_accel = pack.accel if pack is not None else accel
            shade_table = build_shade_table(scene, src_accel, textured=True)
            if pack is not None and pack.backend in ("wide", "stream"):
                shade_table = _slot_order_table(
                    shade_table, pack.wide.slot_tri
                )
            elif pack is not None and pack.backend == "sharded":
                shade_table = _slot_order_table(
                    shade_table, pack.swide.slot_tri.reshape(-1)
                )
        t, tid, hit = closest_fn(org, direction, eps)
        rows = gather_rows(shade_table, jnp.maximum(tid, 0))
        front = direction.dot(rows.vec(GEO_N)) < 0.0
        _, b1, b2 = hit_attributes_rows(rows, org, direction, hit)
        value = compute_surface_aov(
            scene, options.aov, rows, b1, b2, front, hit
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

    # Ray-cone mip LOD: per-pixel angular width; the cone grows linearly
    # with accumulated path length (distance-based LOD).
    use_cone = options.use_mipmaps and scene.has_textures
    pixel_cone = 2.0 * camera.fov_tan / jnp.float32(
        options.image_height or options.height
    )

    # Scene bounds for the wavefront sort key (piecewise-constant: detached).
    if options.sort_bounces == "auto":
        backend = pack.backend if pack is not None else (
            "wide" if _use_pallas(options, scene.geometry.num_triangles)
            else "xla"
        )
        # The multi-operand lax.sort burst costs ~27 ms/bounce at 2M rays
        # on v5e while sorted traversal saves 100-300 ms/bounce even on
        # the 4k-triangle bench scene (tpu_perm_probe2.py,
        # tpu_sort_probe.py: closest 509 -> 88 ms/pass, any-hit
        # 203 -> 57) — a clear win for every TPU kernel backend.
        sort_mode = backend in ("wide", "stream", "bvh", "pallas", "sharded")
    else:
        sort_mode = bool(options.sort_bounces)
    sort_on = sort_mode and options.max_ray_depth > 1
    sort_impl = (
        options.sort_impl if options.sort_impl != "auto" else "multisort"
    )
    if sort_on:
        src = pack.accel if pack is not None else accel
        lo = jax.lax.stop_gradient(jnp.min(src.tri_min, axis=1))
        hi = jax.lax.stop_gradient(jnp.max(src.tri_max, axis=1))

    # The named-save remat policy (below) only engages for the TPU kernel
    # backends; the checkpoint_name markers themselves measurably slow the
    # CPU/XLA compile (~2x on the grad graph), so they are gated the same.
    _tpu_kernels = pack is not None and (
        pack.backend in ("wide", "stream")
        or (
            pack.backend == "sharded"
            and jax.default_backend() not in ("cpu", "gpu")
        )
    )
    _name = (
        (lambda x: checkpoint_name(x, "traversal"))
        if _tpu_kernels
        else (lambda x: x)
    )

    # Segment gating (see RenderOptions.gate_bounces): only meaningful when
    # the sort has packed active lanes into a prefix.
    if options.gate_bounces == "auto":
        gate_on = sort_on
    else:
        gate_on = bool(options.gate_bounces) and sort_on
    gate_on = gate_on and options.gate_segments > 1 and shape2[0] > 1

    def bounce_core(planes, depth, fresh_mask):
        """One bounce over a (rows, lane) wavefront slab: traversal, row
        gather, shade, NEE occlusion, carry update.  ``fresh_mask`` (same
        shape, or None) marks lanes whose work should COUNT — lanes outside
        it still compute (their outputs are discarded by the gated merge),
        matching the overlap rows of the clamped last segment."""
        (org, direction, weight, env_on_miss, active, contrib, path_len,
         seq_id, seq_off, pix) = planes

        # Stage names surface in xprof traces (--trace / jax.profiler),
        # the per-stage breakdown SURVEY section 5 asks for.
        with jax.named_scope("traverse_closest"):
            t, tid, hit = closest_fn(org, direction, eps)
            # Traversal outputs are detached discrete values (~20 MB/bounce
            # at 1080p); naming them lets the remat policy SAVE them so the
            # backward sweep's recompute skips the traversal kernels —
            # by far the most expensive ops in the pass (~75% of it).
            t, tid, hit = _name(t), _name(tid), _name(hit)
        hit = hit & active

        # Miss: environment (only for rays whose default primitive is the
        # env light — camera + glass-refraction rays).
        miss_env = active & (~hit) & env_on_miss & (scene.lights.env_enabled > 0)
        env_c = env_radiance(scene.lights, direction) * weight
        contrib = contrib + Vec3.where(miss_env, clamp(env_c), 0.0)

        # ONE fat row gather per bounce fetches everything shading needs
        # (see shade_table.py); differentiable hit attributes re-evaluate
        # from the gathered Woop rows; sanitize t for dead lanes so no
        # NaN/Inf flows through the masked math.  Facingness comes from the
        # gathered geometric normal (approaching against it = front) — the
        # kernels return bare (t, id, hit) so no extra per-ray gathers run
        # inside the traversal stage.
        rows = gather_rows(shade_table, jnp.maximum(tid, 0))
        front = direction.dot(rows.vec(GEO_N)) < 0.0
        t_d, b1, b2 = hit_attributes_rows(rows, org, direction, hit)
        t_sane = jnp.where(hit, t_d, 1.0)
        path_len = path_len + jnp.where(hit, t_sane, 0.0)

        with jax.named_scope("shade"):
            res = shade_hits(
                scene,
                ctx.ms_lut,
                ctx.tables,
                sample_index,
                depth,
                org,
                direction,
                weight,
                env_on_miss,
                seq_id,
                seq_off,
                rows,
                t_sane,
                b1,
                b2,
                front,
                hit,
                max_ray_depth=options.max_ray_depth,
                rr_start_depth=options.rr_start_depth,
                sample_mode=options.sample_mode,
                footprint_world=(pixel_cone * path_len) if use_cone else None,
                ms_impl=options.ms_impl,
            )
        contrib = contrib + clamp(res.emission)

        p = org + direction * t_sane
        geo_n = rows.vec(GEO_N)

        # NEE shadow rays (occlusion query with per-ray maxT).
        s_org, s_dir = _park_dead(
            _offset_origin(p, geo_n, res.shadow_dir, eps),
            res.shadow_dir,
            res.shadow_active,
        )
        with jax.named_scope("traverse_occlusion"):
            blocked = _name(
                any_fn(s_org, s_dir, eps, res.shadow_max_t - 2.0 * eps)
            )
        lit = res.shadow_active & (~blocked)
        contrib = contrib + Vec3.where(
            lit, clamp(res.shadow_weight * res.shadow_radiance), 0.0
        )

        # Ray accounting: this bounce's closest-hit lanes + shadow lanes
        # (gated segments exclude the re-processed overlap rows).
        if fresh_mask is None:
            inc = jnp.sum(active.astype(jnp.int32)) + jnp.sum(
                res.shadow_active.astype(jnp.int32)
            )
        else:
            inc = jnp.sum((active & fresh_mask).astype(jnp.int32)) + jnp.sum(
                (res.shadow_active & fresh_mask).astype(jnp.int32)
            )

        # Extension rays (dead lanes parked out of every AABB).
        e_org, e_dir = _park_dead(
            _offset_origin(p, geo_n, res.ext_dir, eps),
            res.ext_dir,
            res.ext_active,
        )
        new_planes = (
            e_org,
            e_dir,
            res.ext_weight,
            res.ext_env_on_miss,
            res.ext_active,
            contrib,
            path_len,
            seq_id,
            seq_off,
            pix,
        )
        return new_planes, inc

    def gated_bounce(planes, ray_count, depth):
        """Run ``bounce_core`` per row segment of the sorted wavefront,
        skipping (lax.cond) segments with no fresh active lane.  Active
        lanes are a contiguous prefix after the sort (inactive keys sort
        last), so segment s holds live work iff its first fresh lane index
        is < the active count.  The last segment's start is clamped to keep
        shapes static; its already-processed overlap rows are masked out of
        the merge, so every lane is processed exactly once."""
        rows_n, ln = shape2
        segs = options.gate_segments
        seg_rows = -(-rows_n // segs)
        n_act = jnp.sum(planes[4].astype(jnp.int32))

        def seg_step(state, s):
            fresh_row = s * seg_rows
            start = jnp.minimum(fresh_row, rows_n - seg_rows)
            run = (fresh_row < rows_n) & (fresh_row * ln < n_act)

            def do(state):
                planes, ray_count = state
                seg = jax.tree.map(
                    lambda p: jax.lax.dynamic_slice_in_dim(
                        p, start, seg_rows, axis=0
                    ),
                    planes,
                )
                g_row = start + jax.lax.broadcasted_iota(
                    jnp.int32, (seg_rows, ln), 0
                )
                fresh = g_row >= fresh_row
                out, inc = bounce_core(seg, depth, fresh)
                merged = jax.tree.map(
                    lambda o, n: jnp.where(fresh, n, o), seg, out
                )
                planes = jax.tree.map(
                    lambda p, m: jax.lax.dynamic_update_slice_in_dim(
                        p, m, start, axis=0
                    ),
                    planes,
                    merged,
                )
                return planes, ray_count + inc

            return jax.lax.cond(run, do, lambda st: st, state), None

        (planes, ray_count), _ = jax.lax.scan(
            seg_step, (planes, ray_count), jnp.arange(segs)
        )
        return planes, ray_count

    def bounce(carry, depth, do_sort=False):
        (org, direction, weight, env_on_miss, active, contrib, path_len,
         seq_id, seq_off, pix, ray_count) = carry

        if do_sort:
            # Reorder the whole wavefront for traversal coherence (the
            # permutation is undone at accumulation time via ``pix``).
            # ONE multi-operand lax.sort moves the key and every carry
            # plane together — 26.5 ms/bounce on v5e at 2M rays, vs
            # ~370 ms for argsort + per-plane gathers (round-4 status
            # quo) and ~51 ms for argsort + a packed (16, R) take
            # (tpu_perm_probe2.py).  This is what flips sorting from a
            # net loss to a ~5x traversal win on the bench scene.
            with jax.named_scope("sort_wavefront"):
                key = _wavefront_sort_key(
                    org, direction, active, lo, hi
                ).reshape(-1)
                # path_len only feeds the ray-cone mip LOD; when cones are
                # off it is never read, so skip moving it (one payload
                # plane less = less HBM traffic and less sort compile).
                f32_planes = tuple(
                    p.reshape(-1)
                    for p in (
                        org.x, org.y, org.z,
                        direction.x, direction.y, direction.z,
                        weight.x, weight.y, weight.z,
                        contrib.x, contrib.y, contrib.z,
                    )
                    + ((path_len,) if use_cone else ())
                )
                # Integer/bool planes pack into two i32 words (pix is
                # 0..R-1 < 2^26; env/active one bit each; seq_id 4 bits;
                # seq_off up to max_passes stays its own word): fewer
                # sort payloads = less compile AND less HBM traffic.
                packable = r < (1 << 26)
                if packable:
                    word = (
                        pix.reshape(-1)
                        | (env_on_miss.reshape(-1).astype(jnp.int32) << 26)
                        | (active.reshape(-1).astype(jnp.int32) << 27)
                        | (seq_id.reshape(-1) << 28)
                    )
                    int_planes = (word, seq_off.reshape(-1))
                else:
                    int_planes = tuple(
                        p.reshape(-1).astype(jnp.int32)
                        for p in (env_on_miss, active, seq_id, seq_off, pix)
                    )
                if sort_impl == "multisort":
                    # Differentiable planes ride the custom-VJP
                    # multi-operand sort (inverse permutation by a second
                    # sort in the backward pass); int planes ride a plain
                    # stable sort on the same key (identical permutation,
                    # no tangents to transpose).
                    f32 = _sort_f32_planes(key, *f32_planes)
                    ints = jax.lax.sort(
                        (key,) + int_planes, num_keys=1
                    )[1:]
                else:  # "take": compile-cheap packed gathers
                    _, order = jax.lax.sort(
                        (key, jax.lax.iota(jnp.int32, r)), num_keys=1
                    )
                    f32 = _permute_f32_planes(order, *f32_planes)
                    ints = tuple(
                        jnp.take(
                            jnp.stack(int_planes, axis=0), order, axis=1
                        )
                    )
                if packable:
                    word, seq_off = ints
                    pix = word & ((1 << 26) - 1)
                    env_on_miss = (word >> 26) & 1 > 0
                    active = (word >> 27) & 1 > 0
                    seq_id = (word >> 28) & 0xF
                else:
                    env_on_miss, active, seq_id, seq_off, pix = ints
                    env_on_miss = env_on_miss > 0
                    active = active > 0
                (org, direction, weight, contrib) = (
                    Vec3(*(o.reshape(shape2) for o in f32[i : i + 3]))
                    for i in (0, 3, 6, 9)
                )
                if use_cone:
                    path_len = f32[12].reshape(shape2)
                (env_on_miss, active, seq_id, seq_off, pix) = (
                    o.reshape(shape2)
                    for o in (env_on_miss, active, seq_id, seq_off, pix)
                )

        planes = (org, direction, weight, env_on_miss, active, contrib,
                  path_len, seq_id, seq_off, pix)
        if do_sort and gate_on:
            planes, ray_count = gated_bounce(planes, ray_count, depth)
        else:
            planes, inc = bounce_core(planes, depth, None)
            ray_count = ray_count + inc
        return planes + (ray_count,), None

    pix0 = jnp.arange(r, dtype=jnp.int32).reshape(shape2)
    init = (
        org, direction, weight, env_on_miss, active, contrib,
        jnp.zeros(shape2, jnp.float32), seq_id, seq_off, pix0, jnp.int32(0),
    )
    # Remat (``jax.checkpoint``): save the inter-bounce carry plus — on the
    # TPU kernel backends — the NAMED traversal outputs (see
    # checkpoint_name above), so the backward sweep recomputes the QMC
    # draws and shade intermediates but NOT the traversal kernels (~75% of
    # a pass; bench fwd+bwd 5.0 -> 8.1 Mrays/s).  The names policy costs
    # ~50% extra compile time, so the XLA/CPU path (where traversal is not
    # dominant and test suites pay every compile) keeps plain remat.
    # Without any remat, per-depth residuals OOM a 16 GB chip at 1080p.
    _policy = (
        jax.checkpoint_policies.save_only_these_names("traversal")
        if _tpu_kernels
        else None
    )
    maybe_ckpt = (
        (lambda f: jax.checkpoint(f, prevent_cse=False, policy=_policy))
        if options.remat_bounces
        else (lambda f: f)
    )
    # First bounce unrolled, unsorted: primary rays arrive pixel-ordered
    # (already coherent); later bounces re-sort each depth.
    carry, _ = maybe_ckpt(functools.partial(bounce, do_sort=False))(
        init, jnp.int32(1)
    )
    if options.max_ray_depth > 1:
        body = maybe_ckpt(functools.partial(bounce, do_sort=sort_on))
        if options.unroll_bounces:
            for d in range(2, options.max_ray_depth + 1):
                carry, _ = body(carry, jnp.int32(d))
        else:
            depths = jnp.arange(2, options.max_ray_depth + 1, dtype=jnp.int32)
            carry, _ = jax.lax.scan(body, carry, depths)
    contrib, pix, ray_count = carry[5], carry[9], carry[10]

    with jax.named_scope("accumulate"):
        if sort_on:
            # Undo the wavefront permutations: sorting (pix, contrib) by
            # pix IS the inverse permutation (pix is a permutation of
            # 0..R-1, so no collisions), and the multi-operand sort moves
            # all three planes at once — 4.6 ms vs 33 ms for three
            # .at[pix].set scatters (tpu_misc_probe.py).
            sorted_c = _sort_f32_planes(
                pix.reshape(-1),
                contrib.x.reshape(-1),
                contrib.y.reshape(-1),
                contrib.z.reshape(-1),
            )
            contrib = Vec3(*sorted_c)
        update = _accum_update(contrib, h, w, alpha=alpha)
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
    pass_callback=None,
):
    """Progressive render: ``num_passes`` passes (host loop over the jitted
    pass function, the analog of ``PassGenerator``'s offline mode).

    Returns (accum, ctx); ``accum`` is planar (4, H, W) — ``resolve(accum)``
    is the linear (H, W, 3) image.  Pass ``accum``/``start_pass`` to resume
    (checkpoint/restart).  ``pass_callback(i, accum)`` fires after every
    pass — the progressive-display hook (the analog of the reference's
    ``m_passCompleteCallback``, ``HeatrayRenderer.cpp:388-403``).
    """
    if ctx is None:
        ctx = make_context(options, scene)
    if num_passes is None:
        num_passes = options.max_render_passes
    if accum is None:
        accum = jnp.zeros((4, options.height, options.width), jnp.float32)
    if options.debug_pass_rendering:
        # Pass debugging (``PassGenerator.h:145-149``): no progressive
        # accumulation — render exactly the chosen pass so its single
        # sample's contribution is inspectable.
        frame = FrameGlobals.create(
            sample_index=options.debug_pass_index,
            max_channel_value=max_channel_value,
        )
        return render_pass(scene, camera, ctx, options, frame, accum), ctx
    for i in range(start_pass, start_pass + num_passes):
        frame = FrameGlobals.create(
            sample_index=i, max_channel_value=max_channel_value
        )
        accum = render_pass(scene, camera, ctx, options, frame, accum)
        if pass_callback is not None:
            pass_callback(i, accum)
    return accum, ctx


def resolve(accum: jnp.ndarray) -> jnp.ndarray:
    """Planar (4, H, W) accumulation buffer -> (H, W, 3) linear image
    (divide by per-pixel pass count, ``displayGL.frag:76-78``)."""
    img = accum[:3] / jnp.maximum(accum[3:], 1.0)
    return jnp.transpose(img, (1, 2, 0))
