"""Ray-triangle intersection (the from-scratch replacement for OpenRL's
closed-source traversal engine, cf. ``3rdParty/OpenRL/rl.h:484``).

Design: triangles are preconditioned into Woop affine transforms (a 3x4
matrix per triangle mapping world space to unit-triangle space).  A batch of
rays then intersects a batch of triangles with two small matmuls

    o' = [o | 1] @ W^T          d' = [d | 0] @ W^T

followed by ~10 VPU ops per (ray, triangle) pair:

    t = -o'_z / d'_z,  b1 = o'_x + t d'_x,  b2 = o'_y + t d'_y

This is the MXU-friendly formulation of Moller-Trumbore: the transform work
runs as dense matmuls, and the compare/select logic vectorizes on the VPU.
The jnp implementation below scans triangle chunks with a running closest-hit
reduction; a tiled Pallas kernel (intersect_pallas.py) shares the same
WoopAccel layout.

Differentiability: hit *selection* (tri ids, front-facing flags) is treated
as piecewise-constant; ``hit_attributes`` recomputes t/barycentrics
differentiably from the selected triangle so gradients flow to vertices.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import struct

# Barycentric tolerance, matching typical watertight-eps choices.
BARY_EPS = 1e-6
MISS_T = jnp.float32(3.0e38)


@struct.dataclass
class WoopAccel:
    """Preconditioned triangle data (a pytree).

    ``w`` holds, per triangle, the 3x4 affine transform rows (A | b) with
    A = [e1 e2 n]^-1 and b = -A v0; a point p maps to barycentric-ish
    coordinates (b1, b2, s) = A p + b.  ``geo_normal`` is the normalized
    geometric normal (for ray offsets and front-face logic downstream).
    """

    w: jnp.ndarray  # (T, 3, 4) f32
    geo_normal: jnp.ndarray  # (T, 3) f32
    num_triangles: int = struct.field(pytree_node=False)


def build_woop(positions: jnp.ndarray, indices: jnp.ndarray) -> WoopAccel:
    """Precondition triangles (pure jnp — differentiable w.r.t. positions)."""
    v0 = positions[indices[:, 0]]
    v1 = positions[indices[:, 1]]
    v2 = positions[indices[:, 2]]
    e1 = v1 - v0
    e2 = v2 - v0
    n = jnp.cross(e1, e2)
    m = jnp.stack([e1, e2, n], axis=-1)  # (T, 3, 3) columns e1|e2|n
    # Invert; degenerate triangles get a zero matrix (never hit).
    det = jnp.linalg.det(m)
    ok = jnp.abs(det) > 1e-20
    safe_m = jnp.where(ok[:, None, None], m, jnp.eye(3)[None])
    a = jnp.linalg.inv(safe_m)
    a = jnp.where(ok[:, None, None], a, jnp.zeros_like(a))
    b = -jnp.einsum("tij,tj->ti", a, v0)
    w = jnp.concatenate([a, b[:, :, None]], axis=-1)  # (T, 3, 4)
    geo_n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
    return WoopAccel(
        w=w.astype(jnp.float32),
        geo_normal=geo_n.astype(jnp.float32),
        num_triangles=int(indices.shape[0]),
    )


def _pad_to(x, n, axis=0):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _ray_features(origins, directions):
    ones = jnp.ones(origins.shape[:-1] + (1,), origins.dtype)
    zeros = jnp.zeros_like(ones)
    o_feat = jnp.concatenate([origins, ones], axis=-1)  # (R, 4)
    d_feat = jnp.concatenate([directions, zeros], axis=-1)  # (R, 4)
    return o_feat, d_feat


def _chunk_hits(o_feat, d_feat, w_chunk, t_min, t_max):
    """All-pairs hit test of a ray batch against a triangle chunk.

    Returns (t, valid) of shape (R, Tc): entry t where the ray hits the
    triangle within (t_min, t_max), else MISS_T.
    """
    op = jnp.einsum(
        "rf,tkf->rtk", o_feat, w_chunk, preferred_element_type=jnp.float32
    )
    dp = jnp.einsum(
        "rf,tkf->rtk", d_feat, w_chunk, preferred_element_type=jnp.float32
    )
    dz = dp[..., 2]
    safe_dz = jnp.where(jnp.abs(dz) > 1e-15, dz, 1.0)
    t = jnp.where(jnp.abs(dz) > 1e-15, -op[..., 2] / safe_dz, MISS_T)
    b1 = op[..., 0] + t * dp[..., 0]
    b2 = op[..., 1] + t * dp[..., 1]
    valid = (
        (b1 >= -BARY_EPS)
        & (b2 >= -BARY_EPS)
        & (b1 + b2 <= 1.0 + BARY_EPS)
        & (t > t_min)
        & (t < t_max)
    )
    return jnp.where(valid, t, MISS_T), dz


def _prep_tris(accel: WoopAccel, tri_chunk: int):
    t_count = accel.w.shape[0]
    chunk = min(tri_chunk, max(t_count, 1))
    n_chunks = -(-t_count // chunk)
    w = _pad_to(accel.w, n_chunks * chunk)
    w = jax.lax.stop_gradient(w).reshape(n_chunks, chunk, 3, 4)
    bases = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    return w, bases


def _block_rays(r: int, ray_block: int):
    block = min(ray_block, max(r, 1))
    n_blocks = -(-r // block)
    return block, n_blocks, n_blocks * block


@functools.partial(jax.jit, static_argnames=("tri_chunk", "ray_block"))
def intersect_closest(
    accel: WoopAccel,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    t_min=1e-4,
    t_max=3.0e37,
    tri_chunk: int = 2048,
    ray_block: int = 65536,
):
    """Closest-hit query: rays (R, 3) x all triangles.

    Tiled both ways: an outer ``lax.map`` over ray blocks bounds the live
    (ray x triangle) intermediates, an inner ``lax.scan`` over triangle
    chunks keeps a running closest hit.  Returns (t, tri_id, front_facing,
    hit_mask); misses get tri_id = -1 and t = MISS_T.  Selection outputs
    carry no gradients (piecewise-constant).
    """
    w, bases = _prep_tris(accel, tri_chunk)
    o_feat, d_feat = _ray_features(origins, directions)
    o_feat = jax.lax.stop_gradient(o_feat)
    d_feat = jax.lax.stop_gradient(d_feat)
    r = origins.shape[0]
    t_max = jnp.asarray(t_max, jnp.float32)

    block, n_blocks, padded = _block_rays(r, ray_block)
    o_feat = _pad_to(o_feat, padded).reshape(n_blocks, block, 4)
    d_feat = _pad_to(d_feat, padded).reshape(n_blocks, block, 4)

    def per_block(feats):
        o_b, d_b = feats
        init = (
            jnp.full((block,), MISS_T, jnp.float32),
            jnp.full((block,), -1, jnp.int32),
            jnp.zeros((block,), jnp.float32),
        )

        def body(carry, args):
            w_chunk, base = args
            best_t, best_id, best_dz = carry
            t, dz = _chunk_hits(o_b, d_b, w_chunk, t_min, t_max)
            t = jnp.minimum(t, best_t[:, None])  # only accept improvements
            arg = jnp.argmin(t, axis=1)
            cand_t = jnp.take_along_axis(t, arg[:, None], axis=1)[:, 0]
            cand_dz = jnp.take_along_axis(dz, arg[:, None], axis=1)[:, 0]
            better = cand_t < best_t
            best_t = jnp.where(better, cand_t, best_t)
            best_id = jnp.where(better, base + arg.astype(jnp.int32), best_id)
            best_dz = jnp.where(better, cand_dz, best_dz)
            return (best_t, best_id, best_dz), None

        out, _ = jax.lax.scan(body, init, (w, bases))
        return out

    best_t, best_id, best_dz = jax.lax.map(per_block, (o_feat, d_feat))
    best_t = best_t.reshape(-1)[:r]
    best_id = best_id.reshape(-1)[:r]
    best_dz = best_dz.reshape(-1)[:r]
    hit = best_id >= 0
    front = best_dz < 0.0
    return best_t, best_id, front, hit


@functools.partial(jax.jit, static_argnames=("tri_chunk", "ray_block"))
def intersect_any(
    accel: WoopAccel,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    t_min=1e-4,
    t_max=3.0e37,
    tri_chunk: int = 2048,
    ray_block: int = 65536,
):
    """Any-hit (occlusion) query; returns a boolean (R,) 'blocked' mask.

    ``t_max`` may be per-ray (R,) — used by NEE shadow rays toward punctual
    lights (``rl_OutRay.maxT``, ``microfacet.rlsl:88``).
    """
    w, _ = _prep_tris(accel, tri_chunk)
    o_feat, d_feat = _ray_features(origins, directions)
    o_feat = jax.lax.stop_gradient(o_feat)
    d_feat = jax.lax.stop_gradient(d_feat)
    r = origins.shape[0]
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))

    block, n_blocks, padded = _block_rays(r, ray_block)
    o_feat = _pad_to(o_feat, padded).reshape(n_blocks, block, 4)
    d_feat = _pad_to(d_feat, padded).reshape(n_blocks, block, 4)
    t_max_b = _pad_to(t_max, padded).reshape(n_blocks, block)

    def per_block(feats):
        o_b, d_b, tm_b = feats

        def body(blocked, w_chunk):
            t, _ = _chunk_hits(o_b, d_b, w_chunk, t_min, tm_b[:, None])
            return blocked | jnp.any(t < MISS_T, axis=1), None

        blocked, _ = jax.lax.scan(body, jnp.zeros((block,), bool), w)
        return blocked

    blocked = jax.lax.map(per_block, (o_feat, d_feat, t_max_b))
    return blocked.reshape(-1)[:r]


def hit_attributes(accel: WoopAccel, origins, directions, tri_id, hit_mask):
    """Differentiable re-evaluation of (t, b1, b2) for selected triangles.

    Gathers the (stop-gradient-selected) triangle's Woop transform and
    recomputes the intersection, letting gradients flow to ray origins,
    directions, and (via accel.w) vertex positions.
    """
    safe_id = jnp.maximum(tri_id, 0)
    w = jnp.take(accel.w, safe_id, axis=0)  # (R, 3, 4)
    o_feat, d_feat = _ray_features(origins, directions)
    op = jnp.einsum("rf,rkf->rk", o_feat, w)
    dp = jnp.einsum("rf,rkf->rk", d_feat, w)
    dz = dp[..., 2]
    safe_dz = jnp.where(jnp.abs(dz) > 1e-15, dz, 1.0)
    t = -op[..., 2] / safe_dz
    b1 = op[..., 0] + t * dp[..., 0]
    b2 = op[..., 1] + t * dp[..., 1]
    t = jnp.where(hit_mask, t, MISS_T)
    b1 = jnp.clip(jnp.where(hit_mask, b1, 0.0), 0.0, 1.0)
    b2 = jnp.clip(jnp.where(hit_mask, b2, 0.0), 0.0, 1.0)
    return t, b1, b2
