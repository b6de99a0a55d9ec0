"""Fused Pallas TPU kernels for ray-triangle intersection.

The XLA path (intersect.py) materializes (ray x triangle) products in HBM;
these kernels keep everything in VMEM.  Layout is chosen for the TPU tile
model (f32 tiles are 8 sublanes x 128 lanes):

- Rays arrive as ONE planar ``(8, R)`` array (rows ox,oy,oz,1, dx,dy,dz,0)
  so the HBM footprint is exactly 8 rows — zero padding — and the kernel
  slices ``o_feat = rays[0:4]`` / ``d_feat = rays[4:8]`` on sublanes.
- Triangles are pre-packed per chunk as ``(C, 4, 3*Tc)``: for chunk c the
  4 x (3*Tc) matrix whose column blocks [0:Tc], [Tc:2Tc], [2Tc:3Tc] produce
  the b1, b2, s coordinates of all Tc triangles.
- The two Woop transforms run as MXU contractions
  ``(4, 3Tc)^T . (4, Rt) -> (3Tc, Rt)`` — triangles on sublanes, rays on
  lanes — and the ~10 VPU select ops per pair operate on full (Tc, Rt)
  tiles.  Per-ray running state lives in (1, Rt) rows: full lane use.

Whole-``w``-in-VMEM supports scenes up to ~250k triangles; larger scenes
fall back to the XLA path (until the HBM-streaming variant lands).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..vec import Vec3
from .intersect import WoopAccel, chunk_boxes

MISS_T = 3.0e38  # plain float: jnp constants would be captured by the kernel

# Tile sizes: smaller chunks cull better for coherent primary rays but pay
# more per-chunk fixed cost for incoherent bounce rays; 512/1024 is the best
# full-pass compromise measured on v5e (override via RenderOptions).
RAY_TILE = 1024  # rays per grid step (8 lane-tiles)
TRI_CHUNK = 512  # triangles per inner iteration (lane dim = 1536)
_DZ_EPS = 1e-15
_BARY_EPS = 1e-6


@struct.dataclass
class WoopPallas:
    """Kernel-layout triangle data (a pytree)."""

    w: jnp.ndarray  # (C, 4, 3*Tc) f32
    boxes: jnp.ndarray  # (C, 6) f32 per-chunk AABBs (SMEM in the kernels)
    num_triangles: int = struct.field(pytree_node=False)

    @property
    def num_chunks(self) -> int:
        return self.w.shape[0]


def pack_for_pallas(accel: WoopAccel, tri_chunk: int = TRI_CHUNK) -> WoopPallas:
    """Repack planar (12, T) Woop rows into the (C, 4, 3*Tc) kernel layout
    plus per-chunk AABBs for cluster culling (triangles arrive Morton-ordered
    from the scene builder, so chunks are spatially compact).

    Padding triangles get all-zero matrices (dp_s == 0 -> never hit).
    """
    t = accel.w.shape[1]
    c = -(-t // tri_chunk)
    w = jnp.pad(accel.w, ((0, 0), (0, c * tri_chunk - t)))  # (12, C*Tc)
    # (12, C, Tc) -> (C, 12, Tc); rows [4k + f] -> (C, 3(k), 4(f), Tc)
    w = w.reshape(12, c, tri_chunk).transpose(1, 0, 2)
    w = w.reshape(c, 3, 4, tri_chunk).transpose(0, 2, 1, 3)  # (C, 4, 3, Tc)
    w = w.reshape(c, 4, 3 * tri_chunk)
    boxes = chunk_boxes(accel, tri_chunk, c)
    return WoopPallas(
        w=jax.lax.stop_gradient(w),
        boxes=jax.lax.stop_gradient(boxes),
        num_triangles=t,
    )


def _tile_inv_dir(rays):
    """Safe reciprocal direction rows (3 x (1, Rt)) from the packed rays."""

    def inv(c):
        return jnp.where(c < 0.0, -1.0, 1.0) / jnp.maximum(jnp.abs(c), 1e-18)

    return inv(rays[4:5, :]), inv(rays[5:6, :]), inv(rays[6:7, :])


def _tile_slab_mask(rays, invx, invy, invz, box_ref, c, t_min, t_far):
    """Slab test of the whole ray tile against chunk ``c``'s AABB.

    ``box_ref`` is the (C, 6) SMEM ref; ``t_far`` is a (1, Rt) row.  Padded
    rays have direction 0 -> inv sign positive, huge magnitudes; their box
    distances produce tn > tf, so they never pass.
    """
    ox, oy, oz = rays[0:1, :], rays[1:2, :], rays[2:3, :]
    tx0 = (box_ref[c, 0] - ox) * invx
    tx1 = (box_ref[c, 3] - ox) * invx
    ty0 = (box_ref[c, 1] - oy) * invy
    ty1 = (box_ref[c, 4] - oy) * invy
    tz0 = (box_ref[c, 2] - oz) * invz
    tz1 = (box_ref[c, 5] - oz) * invz
    tn = jnp.maximum(
        jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
        jnp.maximum(jnp.minimum(tz0, tz1), t_min),
    )
    tf = jnp.minimum(
        jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
        jnp.minimum(jnp.maximum(tz0, tz1), t_far),
    )
    return tn <= tf


def _pair_hits(
    rays, wm, tc, t_min, t_max_row,
    precision=jax.lax.Precision.HIGHEST, anchor=None,
):
    """Shared hit math: one ray tile x one chunk -> masked t (Tc, Rt).

    ``anchor`` (3 traced scalars) re-centers ray origins to the chunk's
    anchor point (whose translation the packer folded into the w3 columns).
    The affine result is mathematically unchanged, but the product
    magnitudes now scale with the ray's DISTANCE TO THE CHUNK instead of
    absolute scene coordinates — which keeps the bf16x3 schedule's ~2^-22
    per-product error proportional to the local geometry and makes the
    3-pass MXU schedule accurate enough to be the default (without it, far
    origins + sliver triangles amplify cancellation to ~1e-2 relative t).
    """
    if anchor is not None:
        ax, ay, az = anchor
        o_feat = jnp.concatenate(
            [
                rays[0:1, :] - ax,
                rays[1:2, :] - ay,
                rays[2:3, :] - az,
                rays[3:4, :],
            ],
            axis=0,
        )
    else:
        o_feat = rays[0:4, :]  # (4, Rt): ox, oy, oz, 1
    d_feat = rays[4:8, :]  # (4, Rt): dx, dy, dz, 0
    dims = (((0,), (0,)), ((), ()))
    if precision == "bf16x3":
        # Manual bf16x3: split both operands hi/lo and drop the lo*lo term —
        # ~f32-accurate (error ~2^-22 relative) at HALF the MXU passes of
        # Precision.HIGHEST's bf16x6 schedule (Mosaic has no HIGH lowering).
        # The split ops are VPU-cheap next to the K=4 matmul passes.
        def split(x):
            hi = x.astype(jnp.bfloat16)
            lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            return hi, lo

        def dot3(a, b):
            ah, al = split(a)
            bh, bl = split(b)
            d = functools.partial(
                jax.lax.dot_general,
                dimension_numbers=dims,
                preferred_element_type=jnp.float32,
            )
            return d(ah, bh) + (d(ah, bl) + d(al, bh))

        po = dot3(wm, o_feat)
        pd = dot3(wm, d_feat)
    else:
        # precision=HIGHEST: the MXU's native bf16 passes lose ~16 mantissa
        # bits, which the Woop affine (inverse matrices of sliver triangles)
        # amplifies into wrong hit ids; HIGHEST forces the full-f32
        # multi-pass schedule.
        po = jax.lax.dot_general(wm, o_feat, dims, preferred_element_type=jnp.float32,
                                 precision=precision)
        pd = jax.lax.dot_general(wm, d_feat, dims, preferred_element_type=jnp.float32,
                                 precision=precision)
    return _pair_tail(po, pd, tc, t_min, t_max_row)


def _recip_fast(ds):
    """Reciprocal via the VPU's approximate-reciprocal op + one Newton
    step: rel error ~1.2e-7 (f32-ulp class) at a fraction of the cost of
    the exact divide — the divide is the hot op of the pair-test tail
    ((Tc, Rt) elements per leaf visit; the MXU affine is ~10x cheaper).
    ``ds == 0`` yields NaN (0 * inf), ds ~ 1e-20 yields +/-inf: both fail
    every downstream comparison, so the old |ds| > eps guard is subsumed
    (NaN/inf compare false -> the candidate is masked to MISS_T)."""
    r = pl.reciprocal(ds, approx=True)
    return r * (2.0 - ds * r)


def _pair_tail(po, pd, tc, t_min, t_max_row):
    """Shared tail of the pair test: (3Tc, Rt) affine products -> masked t."""
    ob1, ob2, os_ = po[:tc], po[tc : 2 * tc], po[2 * tc :]
    db1, db2, ds = pd[:tc], pd[tc : 2 * tc], pd[2 * tc :]
    t = -os_ * _recip_fast(ds)
    b1 = ob1 + t * db1
    b2 = ob2 + t * db2
    valid = (
        (b1 >= -_BARY_EPS)
        & (b2 >= -_BARY_EPS)
        & (b1 + b2 <= 1.0 + _BARY_EPS)
        & (t > t_min)
        & (t < t_max_row)
    )
    return jnp.where(valid, t, MISS_T)


def _split3(x):
    """[hi; lo; hi] bf16 row-concat of a (4, Rt) f32 operand — the B side
    of the FUSED bf16x3 schedule (see ``_pair_hits_fused``)."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.concatenate([hi, lo, hi], axis=0)  # (12, Rt)


def _pair_hits_fused(rays, d12, wm12, tc, t_min, t_max_row, anchor):
    """Fused-schedule pair test: ONE K=12 MXU pass per affine.

    The bf16x3 sum ``ah.bh + ah.bl + al.bh`` is a single contraction over a
    concatenated K axis: A' = [Ah; Ah; Al] (12, 3Tc, pre-packed at build
    time) against B' = [bh; bl; bh] (12, Rt; the direction side ``d12`` is
    split once per tile, the origin side per visit — re-centering makes it
    anchor-dependent).  The MXU's cost here is stream-bound (K=4 or 12 both
    fit one systolic pass, and each pass streams Rt columns), so folding
    the three passes into one cuts leaf-visit MXU time ~3x.  Numerics are
    the same three exact bf16-product terms, accumulated in f32 by the MXU
    instead of by two adds — agreement with the unfused schedule is
    ulp-level.
    """
    ax, ay, az = anchor
    o_feat = jnp.concatenate(
        [rays[0:1, :] - ax, rays[1:2, :] - ay, rays[2:3, :] - az,
         rays[3:4, :]],
        axis=0,
    )
    rt = rays.shape[1]
    # Both affines in ONE MXU op: concatenate the origin and direction
    # operands along N (one 2Rt-column stream amortizes the per-op fixed
    # cost) and slice the product back apart.
    b = jnp.concatenate([_split3(o_feat), d12], axis=1)  # (12, 2Rt)
    p = jax.lax.dot_general(
        wm12, b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    po, pd = p[:, :rt], p[:, rt:]
    return _pair_tail(po, pd, tc, t_min, t_max_row)


def _pair_hits_t(raysT, wm, tc, t_min, t_max_col, anchor=None):
    """TRANSPOSED pair math: (Rt, 8) rays x (4, 3Tc) chunk -> (Rt, Tc) t.

    The Woop affine as 13 broadcast FMA/mul VPU ops on (Rt, 3Tc) tiles —
    exact f32 and measured 2.5x the MXU HIGHEST schedule on v5e (the K=4
    contraction wastes the systolic array; see tpu_vpu_leaf.py).  Requires
    Tc % 128 == 0 so the b1/b2/s lane-block slices stay tile-aligned.
    ``t_max_col`` broadcasts from (Rt, 1).  ``anchor`` re-centers origins
    for anchored chunk packs (see ``_pair_hits``).
    """
    ox, oy, oz = raysT[:, 0:1], raysT[:, 1:2], raysT[:, 2:3]
    if anchor is not None:
        ax, ay, az = anchor
        ox, oy, oz = ox - ax, oy - ay, oz - az
    dx, dy, dz = raysT[:, 4:5], raysT[:, 5:6], raysT[:, 6:7]
    w0, w1, w2, w3 = wm[0:1, :], wm[1:2, :], wm[2:3, :], wm[3:4, :]
    po = ox * w0 + oy * w1 + oz * w2 + w3  # (Rt, 3Tc)
    pd = dx * w0 + dy * w1 + dz * w2
    ob1, ob2, os_ = po[:, :tc], po[:, tc : 2 * tc], po[:, 2 * tc :]
    db1, db2, ds = pd[:, :tc], pd[:, tc : 2 * tc], pd[:, 2 * tc :]
    t = -os_ * _recip_fast(ds)  # NaN/inf on degenerate ds -> masked below
    b1 = ob1 + t * db1
    b2 = ob2 + t * db2
    valid = (
        (b1 >= -_BARY_EPS)
        & (b2 >= -_BARY_EPS)
        & (b1 + b2 <= 1.0 + _BARY_EPS)
        & (t > t_min)
        & (t < t_max_col)
    )
    return jnp.where(valid, t, MISS_T)


def _closest_kernel(tc, num_chunks, t_min, precision, rays_ref, w_ref, box_ref, t_ref, id_ref):
    rays = rays_ref[...]  # (8, Rt)
    rt = rays.shape[1]
    sub_ids = jax.lax.broadcasted_iota(jnp.int32, (tc, rt), 0)
    invx, invy, invz = _tile_inv_dir(rays)

    def body(c, carry):
        def hit_chunk(carry):
            best_t, best_id = carry  # (1, Rt) each
            tm = _pair_hits(rays, w_ref[c], tc, t_min, MISS_T, precision)
            col_min = jnp.min(tm, axis=0, keepdims=True)  # (1, Rt)
            # Sublane (triangle-within-chunk) achieving the min; BIG if none.
            tri = jnp.min(
                jnp.where(tm <= col_min, sub_ids, jnp.int32(2**30)),
                axis=0,
                keepdims=True,
            )
            improved = col_min < best_t
            best_id = jnp.where(improved, c * tc + tri, best_id)
            best_t = jnp.where(improved, col_min, best_t)
            return best_t, best_id

        # Cluster cull: skip the chunk's triangle math when no ray's live
        # [t_min, best_t] interval overlaps its AABB.
        overlap = _tile_slab_mask(rays, invx, invy, invz, box_ref, c, t_min, carry[0])
        return jax.lax.cond(jnp.any(overlap), hit_chunk, lambda x: x, carry)

    init = (
        jnp.full((1, rt), MISS_T, jnp.float32),
        jnp.full((1, rt), -1, jnp.int32),
    )
    best_t, best_id = jax.lax.fori_loop(0, num_chunks, body, init)
    t_ref[...] = best_t
    id_ref[...] = best_id


def _any_kernel(tc, num_chunks, t_min, precision, rays_ref, tmax_ref, w_ref, box_ref, hit_ref):
    rays = rays_ref[...]
    t_max = tmax_ref[...]  # (1, Rt), broadcasts over sublanes
    rt = rays.shape[1]
    invx, invy, invz = _tile_inv_dir(rays)

    # Carry the running min-t (f32) instead of a bool mask — Mosaic's
    # loop-carried i1 vectors miscompile at this shape.  (A while_loop with
    # an all-blocked early exit measured SLOWER than the predicated
    # fori_loop — it defeats Mosaic's loop pipelining.)
    def body(c, min_t):
        def hit_chunk(min_t):
            tm = _pair_hits(rays, w_ref[c], tc, t_min, t_max, precision)
            return jnp.minimum(min_t, jnp.min(tm, axis=0, keepdims=True))

        # Only rays not yet blocked keep the chunk live.
        live = (min_t >= MISS_T) & _tile_slab_mask(
            rays, invx, invy, invz, box_ref, c, t_min, t_max
        )
        return jax.lax.cond(jnp.any(live), hit_chunk, lambda x: x, min_t)

    min_t = jax.lax.fori_loop(
        0, num_chunks, body, jnp.full((1, rt), MISS_T, jnp.float32)
    )
    hit_ref[...] = (min_t < MISS_T).astype(jnp.int32)


def _pack_rays(origins: Vec3, directions: Vec3, ray_tile: int):
    """Build the planar (8, R') ray array (padded to a tile multiple)."""
    r = origins.x.shape[0]
    n_tiles = -(-r // ray_tile)
    pad = n_tiles * ray_tile - r
    ones = jnp.ones((r,), jnp.float32)
    zeros = jnp.zeros((r,), jnp.float32)
    rays = jnp.stack(
        [
            origins.x, origins.y, origins.z, ones,
            # Padded rays get zero directions -> dp_s == 0 -> never hit.
            directions.x, directions.y, directions.z, zeros,
        ],
        axis=0,
    )
    if pad:
        rays = jnp.pad(rays, ((0, 0), (0, pad)))
    return jax.lax.stop_gradient(rays), n_tiles, r


def _rays_spec(ray_tile):
    return pl.BlockSpec((8, ray_tile), lambda i: (0, i), memory_space=pltpu.VMEM)


def _row_spec(ray_tile):
    return pl.BlockSpec((1, ray_tile), lambda i: (0, i), memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnames=("ray_tile", "t_min", "precision"))
def intersect_closest_pallas(
    packed: WoopPallas,
    origins: Vec3,
    directions: Vec3,
    t_min: float = 1e-4,
    ray_tile: int = RAY_TILE,
    precision=jax.lax.Precision.HIGHEST,
):
    """Closest-hit via the fused kernel.  Returns (t, tri_id, hit)."""
    tc = packed.w.shape[2] // 3
    c = packed.num_chunks
    rays, n_tiles, r = _pack_rays(origins, directions, ray_tile)

    kernel = functools.partial(_closest_kernel, tc, c, t_min, precision)
    best_t, best_id = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            _rays_spec(ray_tile),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # whole w
            pl.BlockSpec(memory_space=pltpu.SMEM),  # chunk AABBs
        ],
        out_specs=(_row_spec(ray_tile), _row_spec(ray_tile)),
        out_shape=(
            jax.ShapeDtypeStruct((1, n_tiles * ray_tile), jnp.float32),
            jax.ShapeDtypeStruct((1, n_tiles * ray_tile), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(n_tiles) * int(c) * ray_tile * (2 * 4 * 3 * tc * 2 + 10 * tc),
            bytes_accessed=int(n_tiles) * (ray_tile * 32) + int(c) * 4 * 3 * tc * 4,
            transcendentals=0,
        ),
    )(rays, packed.w, packed.boxes)

    best_t = best_t[0, :r]
    best_id = best_id[0, :r]
    hit = (best_id >= 0) & (best_id < packed.num_triangles)
    best_id = jnp.where(hit, best_id, -1)
    return jnp.where(hit, best_t, MISS_T), best_id, hit


@functools.partial(jax.jit, static_argnames=("ray_tile", "t_min", "precision"))
def intersect_any_pallas(
    packed: WoopPallas,
    origins: Vec3,
    directions: Vec3,
    t_min: float = 1e-4,
    t_max=3.0e37,
    ray_tile: int = RAY_TILE,
    precision=jax.lax.Precision.HIGHEST,
):
    """Any-hit (occlusion) via the fused kernel.  Returns blocked (R,) bool."""
    tc = packed.w.shape[2] // 3
    c = packed.num_chunks
    rays, n_tiles, r = _pack_rays(origins, directions, ray_tile)
    # Occlusion is piecewise-constant: no gradient may reach the kernel
    # (pallas_call has no AD rule; visibility is detached by design).
    t_max = jax.lax.stop_gradient(jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,)))
    t_max = jnp.pad(t_max, (0, n_tiles * ray_tile - r))[None, :]  # (1, R')

    kernel = functools.partial(_any_kernel, tc, c, t_min, precision)
    blocked = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            _rays_spec(ray_tile),
            _row_spec(ray_tile),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # chunk AABBs
        ],
        out_specs=_row_spec(ray_tile),
        out_shape=jax.ShapeDtypeStruct((1, n_tiles * ray_tile), jnp.int32),
    )(rays, t_max, packed.w, packed.boxes)
    return blocked[0, :r] > 0
