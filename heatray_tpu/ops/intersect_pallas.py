"""Fused Pallas TPU kernels for ray-triangle intersection.

The XLA path (intersect.py) materializes (ray x triangle) transform products
in HBM; these kernels keep everything in VMEM: per ray tile, loop triangle
chunks, run the two Woop transforms as (Rt, 4) @ (4, 3*Tc) MXU dots, fuse
the ~10 VPU ops per pair, and keep the running closest hit in registers.

Layout: ``WoopPallas.w`` is (C, 4, 3*Tc): for chunk c the 4x(3*Tc) matrix
whose column blocks [0:Tc], [Tc:2Tc], [2Tc:3Tc] produce the b1, b2, s
coordinates of all Tc triangles.  Whole-``w``-in-VMEM supports scenes up to
~250k triangles; larger scenes fall back to the XLA path (until the
HBM-streaming variant lands).

All kernel values stay 2D — per-ray scalars are (Rt, 1) columns (keepdims
reductions), which Mosaic handles without vector reshapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect import WoopAccel

MISS_T = 3.0e38  # plain float: jnp constants would be captured by the kernel

RAY_TILE = 256  # rays per grid step (sublane-friendly)
TRI_CHUNK = 512  # triangles per inner iteration (lane dim = 1536)
_DZ_EPS = 1e-15
_BARY_EPS = 1e-6


@struct.dataclass
class WoopPallas:
    """Kernel-layout triangle data (a pytree)."""

    w: jnp.ndarray  # (C, 4, 3*Tc) f32
    num_triangles: int = struct.field(pytree_node=False)

    @property
    def num_chunks(self) -> int:
        return self.w.shape[0]


def pack_for_pallas(accel: WoopAccel, tri_chunk: int = TRI_CHUNK) -> WoopPallas:
    """Repack (T, 3, 4) Woop rows into the (C, 4, 3*Tc) kernel layout.

    Padding triangles get all-zero matrices (d'_z == 0 -> never hit).
    """
    t = accel.w.shape[0]
    c = -(-t // tri_chunk)
    w = jnp.pad(accel.w, ((0, c * tri_chunk - t), (0, 0), (0, 0)))
    # (C, Tc, 3, 4) -> (C, 4, 3, Tc) -> (C, 4, 3*Tc) with x|y|z column blocks
    w = w.reshape(c, tri_chunk, 3, 4).transpose(0, 3, 2, 1)
    w = w.reshape(c, 4, 3 * tri_chunk)
    return WoopPallas(w=jax.lax.stop_gradient(w), num_triangles=t)


def _pair_hits(feat_o, feat_d, wm, tc, t_min, t_max_col):
    """Shared hit math: (Rt, 4) rays x one chunk -> masked t (Rt, Tc)."""
    po = jnp.dot(feat_o, wm, preferred_element_type=jnp.float32)
    pd = jnp.dot(feat_d, wm, preferred_element_type=jnp.float32)
    ox, oy, oz = po[:, :tc], po[:, tc : 2 * tc], po[:, 2 * tc :]
    dx, dy, dz = pd[:, :tc], pd[:, tc : 2 * tc], pd[:, 2 * tc :]
    dz_ok = jnp.abs(dz) > _DZ_EPS
    t = jnp.where(dz_ok, -oz / jnp.where(dz_ok, dz, 1.0), MISS_T)
    b1 = ox + t * dx
    b2 = oy + t * dy
    valid = (
        dz_ok
        & (b1 >= -_BARY_EPS)
        & (b2 >= -_BARY_EPS)
        & (b1 + b2 <= 1.0 + _BARY_EPS)
        & (t > t_min)
        & (t < t_max_col)
    )
    return jnp.where(valid, t, MISS_T)


def _closest_kernel(tc, num_chunks, t_min, o_ref, d_ref, w_ref, t_ref, id_ref):
    feat_o = o_ref[...]
    feat_d = d_ref[...]
    rt = feat_o.shape[0]
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (rt, tc), 1)

    def body(c, carry):
        best_t, best_id = carry  # (Rt, 1) each
        tm = _pair_hits(feat_o, feat_d, w_ref[c], tc, t_min, MISS_T)
        row_min = jnp.min(tm, axis=1, keepdims=True)  # (Rt, 1)
        # Lane (triangle-within-chunk) achieving the min; BIG if none.
        lane = jnp.min(
            jnp.where(tm <= row_min, lane_ids, jnp.int32(2**30)),
            axis=1,
            keepdims=True,
        )
        improved = row_min < best_t
        best_id = jnp.where(improved, c * tc + lane, best_id)
        best_t = jnp.where(improved, row_min, best_t)
        return best_t, best_id

    init = (
        jnp.full((rt, 1), MISS_T, jnp.float32),
        jnp.full((rt, 1), -1, jnp.int32),
    )
    best_t, best_id = jax.lax.fori_loop(0, num_chunks, body, init)
    t_ref[...] = best_t
    id_ref[...] = best_id


def _any_kernel(tc, num_chunks, t_min, o_ref, d_ref, tmax_ref, w_ref, hit_ref):
    feat_o = o_ref[...]
    feat_d = d_ref[...]
    t_max = tmax_ref[...]  # (Rt, 1), broadcasts over lanes
    rt = feat_o.shape[0]

    # Carry the running min-t (f32) instead of a bool mask — Mosaic's
    # loop-carried i1 vectors miscompile at this shape.
    def body(c, min_t):
        tm = _pair_hits(feat_o, feat_d, w_ref[c], tc, t_min, t_max)
        return jnp.minimum(min_t, jnp.min(tm, axis=1, keepdims=True))

    min_t = jax.lax.fori_loop(
        0, num_chunks, body, jnp.full((rt, 1), MISS_T, jnp.float32)
    )
    hit_ref[...] = (min_t < MISS_T).astype(jnp.int32)


def _ray_feats_padded(origins, directions, ray_tile):
    r = origins.shape[0]
    n_tiles = -(-r // ray_tile)
    pad = n_tiles * ray_tile - r
    ones = jnp.ones((r, 1), jnp.float32)
    zeros = jnp.zeros((r, 1), jnp.float32)
    o_feat = jnp.concatenate([origins, ones], axis=-1)
    d_feat = jnp.concatenate([directions, zeros], axis=-1)
    if pad:
        o_feat = jnp.pad(o_feat, ((0, pad), (0, 0)))
        # Padded rays get zero directions -> d'_z == 0 -> never hit.
        d_feat = jnp.pad(d_feat, ((0, pad), (0, 0)))
    o_feat = jax.lax.stop_gradient(o_feat)
    d_feat = jax.lax.stop_gradient(d_feat)
    return o_feat, d_feat, n_tiles, r


def _feat_spec(ray_tile):
    return pl.BlockSpec((ray_tile, 4), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _col_spec(ray_tile):
    return pl.BlockSpec((ray_tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnames=("ray_tile", "t_min"))
def intersect_closest_pallas(
    packed: WoopPallas,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    t_min: float = 1e-4,
    ray_tile: int = RAY_TILE,
):
    """Closest-hit via the fused kernel.  Returns (t, tri_id, hit)."""
    tc = packed.w.shape[2] // 3
    c = packed.num_chunks
    o_feat, d_feat, n_tiles, r = _ray_feats_padded(origins, directions, ray_tile)

    kernel = functools.partial(_closest_kernel, tc, c, t_min)
    best_t, best_id = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            _feat_spec(ray_tile),
            _feat_spec(ray_tile),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # whole w
        ],
        out_specs=(_col_spec(ray_tile), _col_spec(ray_tile)),
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles * ray_tile, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles * ray_tile, 1), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(n_tiles) * int(c) * ray_tile * (2 * 4 * 3 * tc * 2 + 10 * tc),
            bytes_accessed=int(n_tiles) * (ray_tile * 32) + int(c) * 4 * 3 * tc * 4,
            transcendentals=0,
        ),
    )(o_feat, d_feat, packed.w)

    best_t = best_t[:r, 0]
    best_id = best_id[:r, 0]
    hit = (best_id >= 0) & (best_id < packed.num_triangles)
    best_id = jnp.where(hit, best_id, -1)
    return jnp.where(hit, best_t, MISS_T), best_id, hit


@functools.partial(jax.jit, static_argnames=("ray_tile", "t_min"))
def intersect_any_pallas(
    packed: WoopPallas,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    t_min: float = 1e-4,
    t_max=3.0e37,
    ray_tile: int = RAY_TILE,
):
    """Any-hit (occlusion) via the fused kernel.  Returns blocked (R,) bool."""
    tc = packed.w.shape[2] // 3
    c = packed.num_chunks
    o_feat, d_feat, n_tiles, r = _ray_feats_padded(origins, directions, ray_tile)
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))
    t_max = jnp.pad(t_max, (0, n_tiles * ray_tile - r))[:, None]  # (R', 1)

    kernel = functools.partial(_any_kernel, tc, c, t_min)
    blocked = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            _feat_spec(ray_tile),
            _feat_spec(ray_tile),
            _col_spec(ray_tile),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=_col_spec(ray_tile),
        out_shape=jax.ShapeDtypeStruct((n_tiles * ray_tile, 1), jnp.int32),
    )(o_feat, d_feat, t_max, packed.w)
    return blocked[:r, 0] > 0
