"""Pallas TPU BVH-traversal kernels (closest-hit and any-hit).

The TPU-native replacement for the ray scheduler inside OpenRL's closed
runtime (``rlRenderFrame``, ``3rdParty/OpenRL/rl.h:484``), built around the
machine's strengths instead of per-ray MIMD traversal:

- The grid tiles rays; each grid step owns ``ray_tile`` rays as a planar
  ``(8, Rt)`` block (origins/directions on sublanes, rays on lanes).
- ONE scalar ``while`` loop walks the flattened BVH (``ops.bvh``) with a
  short SMEM stack, descending the **near child first** — chosen per tile
  from the tile's aggregate direction sign along each node's split axis —
  so the running closest-t shrinks early and far subtrees slab-cull.
  Node boxes live in SMEM; the slab test broadcasts six scalars against
  ``(1, Rt)`` rows on the VPU; the whole tile shares traversal decisions
  (``any(overlap)``).
- At a leaf, the chunk's ``(4, 3*Tc)`` Woop block is dynamically sliced
  from VMEM and hit-tested against the tile as an MXU contraction + VPU
  selects (shared with ``intersect_pallas._pair_hits``).
- Parked (dead) rays fail the root test and the whole tile exits after
  one node; the occlusion variant exits as soon as every lane is blocked.

Coherence, not stacks, is the scheduling currency on a vector machine: the
integrator feeds tiles of adjacent pixels, and near-first ordering recovers
most of the per-ray early-termination a scalar tracer would get.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..vec import Vec3
from .bvh import BVH
from .intersect_pallas import (
    MISS_T,
    _pack_rays,
    _pair_hits,
    _row_spec,
    _rays_spec,
    _tile_inv_dir,
)

RAY_TILE = 512
# Builder caps depth at MAX_SAH_DEPTH + log2(T) (ops/bvh.py); 96 covers
# 48 + 31 with margin.
STACK_DEPTH = 96


def _node_slab(nbox_ref, i, rays, invx, invy, invz, t_min, t_far):
    """Slab test of the ray tile against node ``i``'s AABB (SMEM scalars
    broadcast against (1, Rt) rows).  Returns a (1, Rt) bool mask.

    ``nbox_ref`` is FLAT (N * 6,): SMEM pads every row of a 2D array to
    512 bytes, so 2D tables overflow the ~1 MiB scalar memory."""
    ox, oy, oz = rays[0:1, :], rays[1:2, :], rays[2:3, :]
    b = i * 6
    tx0 = (nbox_ref[b + 0] - ox) * invx
    tx1 = (nbox_ref[b + 3] - ox) * invx
    ty0 = (nbox_ref[b + 1] - oy) * invy
    ty1 = (nbox_ref[b + 4] - oy) * invy
    tz0 = (nbox_ref[b + 2] - oz) * invz
    tz1 = (nbox_ref[b + 5] - oz) * invz
    tn = jnp.maximum(
        jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
        jnp.maximum(jnp.minimum(tz0, tz1), t_min),
    )
    tf = jnp.minimum(
        jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
        jnp.minimum(jnp.maximum(tz0, tz1), t_far),
    )
    return tn <= tf


def _tile_dir_signs(rays):
    """Aggregate direction sign per axis for the whole tile (scalars):
    True = the tile predominantly travels +axis, so the lower-coordinate
    (left) child is nearer."""
    sx = jnp.sum(rays[4:5, :]) >= 0.0
    sy = jnp.sum(rays[5:6, :]) >= 0.0
    sz = jnp.sum(rays[6:7, :]) >= 0.0
    return sx, sy, sz


def _advance(meta_ref, stack_ref, n_nodes, i, sp, any_ov, code, signs):
    """Shared traversal-control step: descend near-first or pop.

    Internal nodes store ``-1 - axis`` in ``code``; preorder layout makes
    ``left = i + 1`` and ``right = skip[left]``.  The far child is pushed;
    writing at ``stack_ref[sp]`` when NOT descending lands one above the
    live top and is harmless.
    """
    sx, sy, sz = signs
    is_leaf = code >= 0
    descend = any_ov & (~is_leaf)
    left = i + 1
    lc = jnp.minimum(left, n_nodes - 1)
    right = meta_ref[2 * lc + 1]
    axis = -1 - code
    s = jnp.where(axis == 0, sx, jnp.where(axis == 1, sy, sz))
    near = jnp.where(s, left, right)
    far = jnp.where(s, right, left)
    stack_ref[sp] = far
    popped = stack_ref[jnp.maximum(sp - 1, 0)]
    i_next = jnp.where(descend, near, jnp.where(sp > 0, popped, -1))
    sp_next = jnp.where(descend, sp + 1, jnp.maximum(sp - 1, 0))
    return i_next, sp_next


def _closest_kernel(
    tc, n_nodes, t_min, precision,
    rays_ref, nbox_ref, meta_ref, w_ref, t_ref, id_ref, stack_ref,
):
    rays = rays_ref[...]  # (8, Rt)
    rt = rays.shape[1]
    invx, invy, invz = _tile_inv_dir(rays)
    signs = _tile_dir_signs(rays)
    sub_ids = jax.lax.broadcasted_iota(jnp.int32, (tc, rt), 0)

    def cond(carry):
        return carry[0] >= 0

    def body(carry):
        i, sp, best_t, best_id = carry
        overlap = _node_slab(nbox_ref, i, rays, invx, invy, invz, t_min, best_t)
        any_ov = jnp.any(overlap)
        code = meta_ref[2 * i]

        def leaf_fn(args):
            bt, bid = args
            # Bound hit search by the running closest t (self-pruning).
            tm = _pair_hits(rays, w_ref[code], tc, t_min, bt, precision)
            col_min = jnp.min(tm, axis=0, keepdims=True)  # (1, Rt)
            tri = jnp.min(
                jnp.where(tm <= col_min, sub_ids, jnp.int32(2**30)),
                axis=0,
                keepdims=True,
            )
            improved = col_min < bt
            bid = jnp.where(improved, code * tc + tri, bid)
            bt = jnp.where(improved, col_min, bt)
            return bt, bid

        best_t, best_id = jax.lax.cond(
            any_ov & (code >= 0), leaf_fn, lambda a: a, (best_t, best_id)
        )
        i, sp = _advance(meta_ref, stack_ref, n_nodes, i, sp, any_ov, code, signs)
        return i, sp, best_t, best_id

    init = (
        jnp.int32(0),
        jnp.int32(0),
        jnp.full((1, rt), MISS_T, jnp.float32),
        jnp.full((1, rt), -1, jnp.int32),
    )
    _, _, best_t, best_id = jax.lax.while_loop(cond, body, init)
    t_ref[...] = best_t
    id_ref[...] = best_id


def _any_kernel(
    tc, n_nodes, t_min, precision,
    rays_ref, tmax_ref, nbox_ref, meta_ref, w_ref, hit_ref, stack_ref,
):
    rays = rays_ref[...]
    t_max = tmax_ref[...]  # (1, Rt)
    rt = rays.shape[1]
    invx, invy, invz = _tile_inv_dir(rays)
    signs = _tile_dir_signs(rays)

    def cond(carry):
        i, sp, min_t = carry
        # Done when the walk ends OR every lane is already blocked.
        return (i >= 0) & jnp.any(min_t >= MISS_T)

    def body(carry):
        i, sp, min_t = carry
        # Blocked lanes get an empty slab interval so they keep nothing live.
        t_far = jnp.where(min_t < MISS_T, t_min - 1.0, t_max)
        overlap = _node_slab(nbox_ref, i, rays, invx, invy, invz, t_min, t_far)
        any_ov = jnp.any(overlap)
        code = meta_ref[2 * i]

        def leaf_fn(mt):
            tm = _pair_hits(rays, w_ref[code], tc, t_min, t_max, precision)
            return jnp.minimum(mt, jnp.min(tm, axis=0, keepdims=True))

        min_t = jax.lax.cond(any_ov & (code >= 0), leaf_fn, lambda m: m, min_t)
        i, sp = _advance(meta_ref, stack_ref, n_nodes, i, sp, any_ov, code, signs)
        return i, sp, min_t

    init = (jnp.int32(0), jnp.int32(0), jnp.full((1, rt), MISS_T, jnp.float32))
    _, _, min_t = jax.lax.while_loop(cond, body, init)
    hit_ref[...] = (min_t < MISS_T).astype(jnp.int32)


def _smem_spec():
    return pl.BlockSpec(memory_space=pltpu.SMEM)


def _stack_scratch():
    return [pltpu.SMEM((STACK_DEPTH,), jnp.int32)]


@functools.partial(
    jax.jit, static_argnames=("ray_tile", "t_min", "precision", "interpret")
)
def intersect_closest_bvh(
    bvh: BVH,
    origins: Vec3,
    directions: Vec3,
    t_min: float = 1e-4,
    ray_tile: int = RAY_TILE,
    precision=jax.lax.Precision.HIGHEST,
    interpret: bool = False,
):
    """Closest-hit BVH traversal.  Returns (t, tri_id, hit) with original
    triangle ids (padding slots resolved through ``bvh.slot_tri``)."""
    tc = bvh.leaf_size
    n_nodes = bvh.num_nodes
    rays, n_tiles, r = _pack_rays(origins, directions, ray_tile)

    kernel = functools.partial(_closest_kernel, tc, n_nodes, t_min, precision)
    best_t, best_slot = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            _rays_spec(ray_tile),
            _smem_spec(),  # node boxes
            _smem_spec(),  # node meta (code, skip)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # whole chunked w
        ],
        out_specs=(_row_spec(ray_tile), _row_spec(ray_tile)),
        out_shape=(
            jax.ShapeDtypeStruct((1, n_tiles * ray_tile), jnp.float32),
            jax.ShapeDtypeStruct((1, n_tiles * ray_tile), jnp.int32),
        ),
        scratch_shapes=_stack_scratch(),
        interpret=interpret,
    )(rays, bvh.nbox, bvh.meta, bvh.w)

    best_t = best_t[0, :r]
    best_slot = best_slot[0, :r]
    hit = best_slot >= 0
    tri = jnp.take(bvh.slot_tri, jnp.maximum(best_slot, 0))
    tri = jnp.where(hit, tri, -1)
    return jnp.where(hit, best_t, MISS_T), tri, hit


@functools.partial(
    jax.jit, static_argnames=("ray_tile", "t_min", "precision", "interpret")
)
def intersect_any_bvh(
    bvh: BVH,
    origins: Vec3,
    directions: Vec3,
    t_min: float = 1e-4,
    t_max=3.0e37,
    ray_tile: int = RAY_TILE,
    precision=jax.lax.Precision.HIGHEST,
    interpret: bool = False,
):
    """Any-hit (occlusion) BVH traversal; returns a (R,) blocked mask."""
    tc = bvh.leaf_size
    n_nodes = bvh.num_nodes
    rays, n_tiles, r = _pack_rays(origins, directions, ray_tile)
    # Occlusion is piecewise-constant; visibility gradients are detached.
    t_max = jax.lax.stop_gradient(
        jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))
    )
    t_max = jnp.pad(t_max, (0, n_tiles * ray_tile - r))[None, :]

    kernel = functools.partial(_any_kernel, tc, n_nodes, t_min, precision)
    blocked = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            _rays_spec(ray_tile),
            _row_spec(ray_tile),
            _smem_spec(),
            _smem_spec(),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=_row_spec(ray_tile),
        out_shape=jax.ShapeDtypeStruct((1, n_tiles * ray_tile), jnp.int32),
        scratch_shapes=_stack_scratch(),
        interpret=interpret,
    )(rays, t_max, bvh.nbox, bvh.meta, bvh.w)
    return blocked[0, :r] > 0
