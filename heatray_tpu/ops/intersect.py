"""Ray-triangle intersection (the from-scratch replacement for OpenRL's
closed-source traversal engine, cf. ``3rdParty/OpenRL/rl.h:484``).

Design: triangles are preconditioned into Woop affine transforms (a 3x4
matrix per triangle mapping world space to unit-triangle space).  A batch of
rays intersects a batch of triangles with

    op_k = A_k . o + b_k        dp_k = A_k . d        (k in {b1, b2, s})
    t = -op_s / dp_s,  b1 = op_b1 + t dp_b1,  b2 = op_b2 + t dp_b2

**Layout is planar** (TPU-native): the transform is stored as 12 row arrays
``w (12, T)`` and rays as component arrays ``(R,)`` — no tiny trailing axes,
so nothing pads to the (8, 128) f32 tile.  The jnp implementation below
scans triangle chunks with a running closest-hit reduction; the fused Pallas
kernels (intersect_pallas.py) share the same planar contract.

Differentiability: hit *selection* (tri ids, front-facing flags) is treated
as piecewise-constant; ``hit_attributes`` recomputes t/barycentrics
differentiably from the selected triangle so gradients flow to vertices.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import struct

from ..vec import Vec3

# Barycentric tolerance, matching typical watertight-eps choices.
BARY_EPS = 1e-6
MISS_T = jnp.float32(3.0e38)
_DZ_EPS = 1e-15


@struct.dataclass
class WoopAccel:
    """Preconditioned triangle data (a pytree), planar layout.

    ``w`` is (12, T): rows 0-3 = (a0, a1, a2, b) of the b1 output row,
    rows 4-7 = the b2 row, rows 8-11 = the s row, where the affine map is
    (b1, b2, s) = A p + b with A = [e1 e2 n]^-1 and b = -A v0.
    ``geo_normal`` is (3, T), the normalized geometric normal.
    ``tri_min``/``tri_max`` are (3, T) per-triangle AABB corners; with
    Morton-ordered triangles (``scene.geometry._morton_order``) contiguous
    chunks are spatially compact, so per-chunk AABBs (their min/max
    reduction) drive the intersectors' cluster culling — the flat-cluster
    replacement for OpenRL's internal BVH (``rl.h:484``).
    """

    w: jnp.ndarray  # (12, T) f32
    geo_normal: jnp.ndarray  # (3, T) f32
    tri_min: jnp.ndarray  # (3, T) f32
    tri_max: jnp.ndarray  # (3, T) f32
    num_triangles: int = struct.field(pytree_node=False)


def build_woop(positions: jnp.ndarray, indices: jnp.ndarray) -> WoopAccel:
    """Precondition triangles (pure planar jnp — differentiable w.r.t.
    vertex positions).  ``positions`` (3, V), ``indices`` (3, T)."""
    p = Vec3.from_planar(positions)
    i0, i1, i2 = indices[0], indices[1], indices[2]
    v0 = p.map(lambda c: jnp.take(c, i0))
    v1 = p.map(lambda c: jnp.take(c, i1))
    v2 = p.map(lambda c: jnp.take(c, i2))
    e1 = v1 - v0
    e2 = v2 - v0
    n = e1.cross(e2)

    # M = [e1 | e2 | n] columns; invert via adjugate (all planar (T,) math —
    # no (T, 3, 3) temporaries, which would pad 3x128 per triangle).
    # Row-major entries:
    m00, m01, m02 = e1.x, e2.x, n.x
    m10, m11, m12 = e1.y, e2.y, n.y
    m20, m21, m22 = e1.z, e2.z, n.z
    c00 = m11 * m22 - m12 * m21
    c01 = m02 * m21 - m01 * m22
    c02 = m01 * m12 - m02 * m11
    c10 = m12 * m20 - m10 * m22
    c11 = m00 * m22 - m02 * m20
    c12 = m02 * m10 - m00 * m12
    c20 = m10 * m21 - m11 * m20
    c21 = m01 * m20 - m00 * m21
    c22 = m00 * m11 - m01 * m10
    det = m00 * c00 + m01 * c10 + m02 * c20
    ok = jnp.abs(det) > 1e-20
    inv_det = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
    # inv = adj / det; adj = cofactor matrix transposed -> inv[i][j] = c[j][i]
    # but with the cofactors written above as c[i][j] of the *transpose*
    # already (each c_ij is the cofactor of entry (j, i)), inv[i][j] = c_ij.
    a00, a01, a02 = c00 * inv_det, c01 * inv_det, c02 * inv_det
    a10, a11, a12 = c10 * inv_det, c11 * inv_det, c12 * inv_det
    a20, a21, a22 = c20 * inv_det, c21 * inv_det, c22 * inv_det
    b0 = -(a00 * v0.x + a01 * v0.y + a02 * v0.z)
    b1 = -(a10 * v0.x + a11 * v0.y + a12 * v0.z)
    b2 = -(a20 * v0.x + a21 * v0.y + a22 * v0.z)
    w = jnp.stack(
        [a00, a01, a02, b0, a10, a11, a12, b1, a20, a21, a22, b2], axis=0
    ).astype(jnp.float32)
    geo_n = n.normalized()
    tri_min = jnp.stack(
        [
            jnp.minimum(jnp.minimum(v0.x, v1.x), v2.x),
            jnp.minimum(jnp.minimum(v0.y, v1.y), v2.y),
            jnp.minimum(jnp.minimum(v0.z, v1.z), v2.z),
        ]
    )
    tri_max = jnp.stack(
        [
            jnp.maximum(jnp.maximum(v0.x, v1.x), v2.x),
            jnp.maximum(jnp.maximum(v0.y, v1.y), v2.y),
            jnp.maximum(jnp.maximum(v0.z, v1.z), v2.z),
        ]
    )
    return WoopAccel(
        w=w,
        geo_normal=geo_n.to_planar().astype(jnp.float32),
        tri_min=jax.lax.stop_gradient(tri_min.astype(jnp.float32)),
        tri_max=jax.lax.stop_gradient(tri_max.astype(jnp.float32)),
        num_triangles=int(indices.shape[1]),
    )


def _pad_axis(x, n, axis=0, value=0.0):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _inv_dir(d: Vec3) -> Vec3:
    """Safe reciprocal direction for slab tests: sign(d)/max(|d|, tiny),
    magnitude-capped so (box - o) * inv stays finite."""

    def inv(c):
        return jnp.where(c < 0.0, -1.0, 1.0) / jnp.maximum(jnp.abs(c), 1e-18)

    return Vec3(inv(d.x), inv(d.y), inv(d.z))


def _slab_mask(o: Vec3, inv: Vec3, box, t_min, t_far):
    """Ray-AABB slab test of a ray batch against ONE box.

    ``box`` is a (6,) array [minx,miny,minz,maxx,maxy,maxz]; ``t_far`` is
    per-ray (the current closest hit / occlusion maxT).  Returns a boolean
    mask of rays whose [t_min, t_far] interval overlaps the box.
    """
    tx0 = (box[0] - o.x) * inv.x
    tx1 = (box[3] - o.x) * inv.x
    ty0 = (box[1] - o.y) * inv.y
    ty1 = (box[4] - o.y) * inv.y
    tz0 = (box[2] - o.z) * inv.z
    tz1 = (box[5] - o.z) * inv.z
    tn = jnp.maximum(
        jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
        jnp.maximum(jnp.minimum(tz0, tz1), t_min),
    )
    tf = jnp.minimum(
        jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
        jnp.minimum(jnp.maximum(tz0, tz1), t_far),
    )
    return tn <= tf


def _chunk_hits(o, d, w_chunk, t_min, t_max):
    """All-pairs hit test of a ray block against one triangle chunk.

    ``o``/``d``: Vec3 of (Rb,); ``w_chunk``: (12, Tc).  Returns masked entry
    t of shape (Rb, Tc) (MISS_T where no hit) and dp_s (for facing).
    """

    def affine(k, v, with_b):
        r = (
            v.x[:, None] * w_chunk[4 * k + 0][None, :]
            + v.y[:, None] * w_chunk[4 * k + 1][None, :]
            + v.z[:, None] * w_chunk[4 * k + 2][None, :]
        )
        if with_b:
            r = r + w_chunk[4 * k + 3][None, :]
        return r

    op_s = affine(2, o, True)
    dp_s = affine(2, d, False)
    dz_ok = jnp.abs(dp_s) > _DZ_EPS
    t = jnp.where(dz_ok, -op_s / jnp.where(dz_ok, dp_s, 1.0), MISS_T)
    b1 = affine(0, o, True) + t * affine(0, d, False)
    b2 = affine(1, o, True) + t * affine(1, d, False)
    valid = (
        dz_ok
        & (b1 >= -BARY_EPS)
        & (b2 >= -BARY_EPS)
        & (b1 + b2 <= 1.0 + BARY_EPS)
        & (t > t_min)
        & (t < t_max)
    )
    return jnp.where(valid, t, MISS_T), dp_s


def chunk_boxes(accel: WoopAccel, chunk: int, n_chunks: int) -> jnp.ndarray:
    """(n_chunks, 6) per-chunk AABBs (padding triangles form empty boxes)."""
    big = jnp.float32(3.0e38)
    tmin = _pad_axis(accel.tri_min, n_chunks * chunk, axis=1, value=big)
    tmax = _pad_axis(accel.tri_max, n_chunks * chunk, axis=1, value=-big)
    cmin = tmin.reshape(3, n_chunks, chunk).min(axis=2)  # (3, C)
    cmax = tmax.reshape(3, n_chunks, chunk).max(axis=2)
    return jnp.concatenate([cmin, cmax], axis=0).T  # (C, 6)


def _prep_tris(accel: WoopAccel, tri_chunk: int):
    t_count = accel.w.shape[1]
    chunk = min(tri_chunk, max(t_count, 1))
    n_chunks = -(-t_count // chunk)
    w = _pad_axis(accel.w, n_chunks * chunk, axis=1)
    w = jax.lax.stop_gradient(w).reshape(12, n_chunks, chunk).transpose(1, 0, 2)
    bases = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    boxes = chunk_boxes(accel, chunk, n_chunks)
    return w, bases, boxes


def _block_rays(r: int, ray_block: int):
    block = min(ray_block, max(r, 1))
    n_blocks = -(-r // block)
    return block, n_blocks, n_blocks * block


def _pad_vec(v: Vec3, padded: int, n_blocks: int, block: int) -> Vec3:
    return v.map(
        lambda c: _pad_axis(jax.lax.stop_gradient(c), padded).reshape(
            n_blocks, block
        )
    )


@functools.partial(jax.jit, static_argnames=("tri_chunk", "ray_block"))
def intersect_closest(
    accel: WoopAccel,
    origins: Vec3,
    directions: Vec3,
    t_min=1e-4,
    t_max=3.0e37,
    tri_chunk: int = 512,
    ray_block: int = 65536,
):
    """Closest-hit query: rays (Vec3 of (R,)) x all triangles.

    Tiled both ways: an outer ``lax.map`` over ray blocks bounds the live
    (ray x triangle) intermediates, an inner ``lax.scan`` over triangle
    chunks keeps a running closest hit.  Returns (t, tri_id, front_facing,
    hit_mask); misses get tri_id = -1 and t = MISS_T.  Selection outputs
    carry no gradients (piecewise-constant).
    """
    w, bases, boxes = _prep_tris(accel, tri_chunk)
    r = origins.x.shape[0]
    t_max = jnp.asarray(t_max, jnp.float32)

    block, n_blocks, padded = _block_rays(r, ray_block)
    o_b = _pad_vec(origins, padded, n_blocks, block)
    d_b = _pad_vec(directions, padded, n_blocks, block)

    def per_block(feats):
        ox, oy, oz, dx, dy, dz = feats
        o = Vec3(ox, oy, oz)
        d = Vec3(dx, dy, dz)
        inv = _inv_dir(d)
        init = (
            jnp.full((block,), MISS_T, jnp.float32),
            jnp.full((block,), -1, jnp.int32),
            jnp.zeros((block,), jnp.float32),
        )

        def body(carry, args):
            w_chunk, base, box = args
            best_t = carry[0]

            def hit_chunk(carry):
                best_t, best_id, best_dz = carry
                t, dz = _chunk_hits(o, d, w_chunk, t_min, t_max)
                t = jnp.minimum(t, best_t[:, None])  # only accept improvements
                arg = jnp.argmin(t, axis=1)
                cand_t = jnp.take_along_axis(t, arg[:, None], axis=1)[:, 0]
                cand_dz = jnp.take_along_axis(dz, arg[:, None], axis=1)[:, 0]
                better = cand_t < best_t
                best_t = jnp.where(better, cand_t, best_t)
                best_id = jnp.where(
                    better, base + arg.astype(jnp.int32), best_id
                )
                best_dz = jnp.where(better, cand_dz, best_dz)
                return (best_t, best_id, best_dz)

            # Cluster cull: skip the chunk when no ray's live [t_min, best_t]
            # interval overlaps its AABB.
            overlap = _slab_mask(o, inv, box, t_min, jnp.minimum(best_t, t_max))
            return (
                jax.lax.cond(jnp.any(overlap), hit_chunk, lambda c: c, carry),
                None,
            )

        out, _ = jax.lax.scan(body, init, (w, bases, boxes))
        return out

    best_t, best_id, best_dz = jax.lax.map(
        per_block, (o_b.x, o_b.y, o_b.z, d_b.x, d_b.y, d_b.z)
    )
    best_t = best_t.reshape(-1)[:r]
    best_id = best_id.reshape(-1)[:r]
    best_dz = best_dz.reshape(-1)[:r]
    hit = best_id >= 0
    front = best_dz < 0.0
    return best_t, best_id, front, hit


@functools.partial(jax.jit, static_argnames=("tri_chunk", "ray_block"))
def intersect_any(
    accel: WoopAccel,
    origins: Vec3,
    directions: Vec3,
    t_min=1e-4,
    t_max=3.0e37,
    tri_chunk: int = 512,
    ray_block: int = 65536,
):
    """Any-hit (occlusion) query; returns a boolean (R,) 'blocked' mask.

    ``t_max`` may be per-ray (R,) — used by NEE shadow rays toward punctual
    lights (``rl_OutRay.maxT``, ``microfacet.rlsl:88``).
    """
    w, _, boxes = _prep_tris(accel, tri_chunk)
    r = origins.x.shape[0]
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))

    block, n_blocks, padded = _block_rays(r, ray_block)
    o_b = _pad_vec(origins, padded, n_blocks, block)
    d_b = _pad_vec(directions, padded, n_blocks, block)
    t_max_b = _pad_axis(t_max, padded).reshape(n_blocks, block)

    def per_block(feats):
        ox, oy, oz, dx, dy, dz, tm_b = feats
        o = Vec3(ox, oy, oz)
        d = Vec3(dx, dy, dz)
        inv = _inv_dir(d)

        def body(blocked, args):
            w_chunk, box = args

            def hit_chunk(blocked):
                t, _ = _chunk_hits(o, d, w_chunk, t_min, tm_b[:, None])
                return blocked | jnp.any(t < MISS_T, axis=1)

            live = (~blocked) & _slab_mask(o, inv, box, t_min, tm_b)
            return (
                jax.lax.cond(jnp.any(live), hit_chunk, lambda b: b, blocked),
                None,
            )

        blocked, _ = jax.lax.scan(body, jnp.zeros((block,), bool), (w, boxes))
        return blocked

    blocked = jax.lax.map(
        per_block, (o_b.x, o_b.y, o_b.z, d_b.x, d_b.y, d_b.z, t_max_b)
    )
    return blocked.reshape(-1)[:r]


def hit_attributes(accel: WoopAccel, origins: Vec3, directions: Vec3, tri_id, hit_mask):
    """Differentiable re-evaluation of (t, b1, b2) for selected triangles.

    Gathers the (stop-gradient-selected) triangle's Woop rows and recomputes
    the intersection, letting gradients flow to ray origins, directions, and
    (via accel.w) vertex positions.
    """
    safe_id = jnp.maximum(tri_id, 0)
    rows = [jnp.take(accel.w[k], safe_id) for k in range(12)]  # each (R,)

    def affine(k, v, with_b):
        r = rows[4 * k] * v.x + rows[4 * k + 1] * v.y + rows[4 * k + 2] * v.z
        if with_b:
            r = r + rows[4 * k + 3]
        return r

    dz = affine(2, directions, False)
    safe_dz = jnp.where(jnp.abs(dz) > _DZ_EPS, dz, 1.0)
    t = -affine(2, origins, True) / safe_dz
    b1 = affine(0, origins, True) + t * affine(0, directions, False)
    b2 = affine(1, origins, True) + t * affine(1, directions, False)
    t = jnp.where(hit_mask, t, MISS_T)
    b1 = jnp.clip(jnp.where(hit_mask, b1, 0.0), 0.0, 1.0)
    b2 = jnp.clip(jnp.where(hit_mask, b2, 0.0), 0.0, 1.0)
    return t, b1, b2


def gather_geo_normal(accel: WoopAccel, tri_id) -> Vec3:
    """Geometric normal of the selected triangles (Vec3 of (R,))."""
    safe_id = jnp.maximum(tri_id, 0)
    return Vec3(
        jnp.take(accel.geo_normal[0], safe_id),
        jnp.take(accel.geo_normal[1], safe_id),
        jnp.take(accel.geo_normal[2], safe_id),
    )
