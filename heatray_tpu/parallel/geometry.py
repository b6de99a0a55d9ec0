"""Host-sharded geometry: scenes whose triangle data exceeds one device's
memory split across a mesh axis (SURVEY section 2.4 "scene replication
(default) or host-sharded geometry for scenes exceeding HBM").

Design: triangles are Morton-ordered by the scene builder, so splitting the
triangle range into D contiguous shards yields spatially-compact pieces
(a "BVH forest", one per device).  Every device intersects the FULL ray
wavefront against its shard only — the accel arrays carry a leading shard
axis sharded over the mesh, the query is ``vmap``-ed over that axis, and
GSPMD partitions it with zero communication until the final (D, R) -> (R,)
min-reduction (closest hit: argmin over shards; occlusion: any).

This trades D-fold ray-broadcast compute for D-fold geometry memory — the
standard scheme when geometry, not rays, is the memory binder.  The per-ray
closest-hit ids stay GLOBAL via per-shard triangle offsets.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.intersect import MISS_T, WoopAccel, intersect_any, intersect_closest
from ..vec import Vec3
from flax import struct


@struct.dataclass
class ShardedAccel:
    """Per-shard stacked Woop accel (a pytree).  Leading axis = shard,
    device-sharded over the mesh; ``offsets`` maps shard-local triangle ids
    back to global ids."""

    w: jnp.ndarray  # (D, 12, Tp)
    geo_normal: jnp.ndarray  # (D, 3, Tp)
    tri_min: jnp.ndarray  # (D, 3, Tp)
    tri_max: jnp.ndarray  # (D, 3, Tp)
    offsets: jnp.ndarray  # (D,) i32 global id of each shard's triangle 0
    num_triangles: int = struct.field(pytree_node=False)
    num_shards: int = struct.field(pytree_node=False)


def shard_accel(
    accel: WoopAccel, mesh: Mesh, axis: str = "dp"
) -> ShardedAccel:
    """Split a Woop accel into ``mesh.shape[axis]`` Morton-contiguous shards
    and place them sharded over ``axis``.

    Padding triangles have zeroed Woop rows (dp_s == 0 -> never hit) and
    inverted AABBs, exactly like the chunk packers.
    """
    d = mesh.shape[axis]
    t = accel.num_triangles
    tp = -(-t // d)
    big = jnp.float32(3.0e38)

    def pad(x, value=0.0):
        return jnp.pad(
            x, ((0, 0), (0, d * tp - t)), constant_values=value
        ).reshape(x.shape[0], d, tp).transpose(1, 0, 2)

    sharded = ShardedAccel(
        w=pad(accel.w),
        geo_normal=pad(accel.geo_normal),
        tri_min=pad(accel.tri_min, value=big),
        tri_max=pad(accel.tri_max, value=-big),
        offsets=jnp.arange(d, dtype=jnp.int32) * tp,
        num_triangles=t,
        num_shards=d,
    )
    shard = NamedSharding(mesh, P(axis))
    return jax.tree.map(
        lambda a: jax.device_put(a, shard) if a.ndim else a, sharded
    )


@struct.dataclass
class ShardedWideBVH:
    """A Morton-shard FOREST of arity-8 BVHs (a pytree): one WideBVH per
    shard, padded to common shapes and stacked on a leading shard axis so
    the stack can be device-sharded over a mesh axis.  Each device then
    owns 1/D of the geometry (its own BVH + chunk-packed Woop rows) and
    traverses the FULL replicated wavefront against it; results
    min-reduce over the axis.  ``slot_tri`` maps (shard, local slot) ->
    GLOBAL triangle id, so a concatenated slot-ordered shade table indexes
    directly with ``global slot = shard * slots_per_shard + local``."""

    wbox: jnp.ndarray  # (D, Nw, 8, 8)
    wchild: jnp.ndarray  # (D, Nw * 8)
    waxis: jnp.ndarray  # (D, Nw)
    w: jnp.ndarray  # (D, C, K, 3 * Tc)
    slot_tri: jnp.ndarray  # (D, C * Tc) GLOBAL tri ids (-1 pad)
    wanchor: jnp.ndarray  # (D, 3, C)
    slot_offset: jnp.ndarray  # (D,) i32 global slot base (= i * C * Tc)
    leaf_size: int = struct.field(pytree_node=False)
    num_triangles: int = struct.field(pytree_node=False)
    num_shards: int = struct.field(pytree_node=False)

    @property
    def slots_per_shard(self) -> int:
        return self.slot_tri.shape[1]

    def shard_bvh(self, i=0):
        """The local WideBVH of one shard of a shard_map-local (1, ...)
        slice (or shard ``i`` of the full stack)."""
        from ..ops.wide_bvh import WideBVH

        return WideBVH(
            wbox=self.wbox[i],
            wchild=self.wchild[i],
            waxis=self.waxis[i],
            w=self.w[i],
            slot_tri=self.slot_tri[i],
            wanchor=self.wanchor[i],
            leaf_size=self.leaf_size,
            num_triangles=self.num_triangles,
        )


def build_sharded_wide(
    accel: WoopAccel,
    num_shards: int,
    leaf_size: int = 32,
    schedule: str = "fused",
    include: np.ndarray | None = None,
) -> ShardedWideBVH:
    """Split the (Morton-ordered) triangle range into ``num_shards``
    contiguous pieces and build one WideBVH per piece (host side).

    Per-shard node/chunk counts differ; arrays pad to the max (padding
    nodes/chunks are unreachable from each shard's root)."""
    from ..ops.wide_bvh import build_wide_bvh

    t = accel.num_triangles
    d = num_shards
    bounds = [round(i * t / d) for i in range(d + 1)]
    shards = []
    for i in range(d):
        lo, hi = bounds[i], bounds[i + 1]
        sub = WoopAccel(
            w=accel.w[:, lo:hi],
            geo_normal=accel.geo_normal[:, lo:hi],
            tri_min=accel.tri_min[:, lo:hi],
            tri_max=accel.tri_max[:, lo:hi],
            num_triangles=hi - lo,
        )
        inc = include[lo:hi] if include is not None else None
        shards.append((build_wide_bvh(
            sub, leaf_size=leaf_size, include=inc, schedule=schedule
        ), lo))

    nw = max(b.wbox.shape[0] for b, _ in shards)
    c = max(b.w.shape[0] for b, _ in shards)
    tc = shards[0][0].leaf_size
    big = np.float32(3.0e38)

    def pad_to(x, n, axis, value):
        width = [(0, 0)] * x.ndim
        width[axis] = (0, n - x.shape[axis])
        return np.pad(np.asarray(x), width, constant_values=value)

    wbox = np.stack([pad_to(b.wbox, nw, 0, big) for b, _ in shards])
    # Padding nodes: children empty (-1) so they'd exit immediately even
    # if ever visited (they are not: roots are node 0, pads unreachable).
    wchild = np.stack(
        [pad_to(b.wchild, nw * 8, 0, -1) for b, _ in shards]
    )
    waxis = np.stack([pad_to(b.waxis, nw, 0, 0) for b, _ in shards])
    w = np.stack([pad_to(b.w, c, 0, 0.0) for b, _ in shards])
    slot_tri = np.stack(
        [
            np.where(
                pad_to(b.slot_tri, c * tc, 0, -1) >= 0,
                pad_to(b.slot_tri, c * tc, 0, -1) + lo,
                -1,
            )
            for b, lo in shards
        ]
    ).astype(np.int32)
    wanchor = np.stack([pad_to(b.wanchor, c, 1, 0.0) for b, _ in shards])
    return ShardedWideBVH(
        wbox=jnp.asarray(wbox),
        wchild=jnp.asarray(wchild),
        waxis=jnp.asarray(waxis),
        w=jnp.asarray(w, dtype=shards[0][0].w.dtype),
        slot_tri=jnp.asarray(slot_tri),
        wanchor=jnp.asarray(wanchor),
        slot_offset=jnp.arange(d, dtype=jnp.int32) * (c * tc),
        leaf_size=tc,
        num_triangles=t,
        num_shards=d,
    )


def place_sharded_wide(
    swide: ShardedWideBVH, mesh: Mesh, axis: str = "dp"
) -> ShardedWideBVH:
    """Device-put the stacked forest sharded over ``mesh[axis]``."""
    shard = NamedSharding(mesh, P(axis))
    return jax.tree.map(
        lambda a: jax.device_put(a, shard) if a.ndim else a, swide
    )


def make_sharded_wide_intersectors(
    swide: ShardedWideBVH,
    swide_occl: ShardedWideBVH | None,
    mesh: Mesh,
    axis: str = "dp",
    ray_tile: int = 512,
    precision="bf16x3",
    interpret: bool = False,
):
    """(closest, any) over the shard forest via ``shard_map``: each device
    traverses its own shard's wide BVH against the full replicated
    wavefront; (t, slot) min-reduce over the axis with global-slot
    tie-breaking (smallest global slot wins, deterministically).

    Contract matches the wide backend: ``closest -> (t, GLOBAL slot,
    hit)``; pair with a shade table slot-ordered by the concatenated
    ``swide.slot_tri``."""
    from ..ops.wide_bvh import (
        MISS_T,
        intersect_any_wide,
        intersect_closest_wide,
    )

    occl = swide_occl if swide_occl is not None else swide
    big_slot = jnp.int32(1) << 30

    def closest_body(sw, org, direction, t_min):
        t, slot, hit = intersect_closest_wide(
            sw.shard_bvh(0), org, direction, t_min=t_min,
            ray_tile=ray_tile, precision=precision, interpret=interpret,
            return_slots=True,
        )
        t_all = jax.lax.pmin(t, axis)
        cand = jnp.where(
            hit & (t <= t_all), slot + sw.slot_offset[0], big_slot
        )
        slot_all = jax.lax.pmin(cand, axis)
        hit_all = jax.lax.pmax(hit.astype(jnp.int32), axis) > 0
        return (
            jnp.where(hit_all, t_all, MISS_T),
            jnp.where(hit_all, slot_all, -1),
            hit_all,
        )

    def any_body(sw, org, direction, t_min, t_max):
        blocked = intersect_any_wide(
            sw.shard_bvh(0), org, direction, t_min=t_min, t_max=t_max,
            ray_tile=ray_tile, precision=precision, interpret=interpret,
        )
        return jax.lax.pmax(blocked.astype(jnp.int32), axis) > 0

    def closest(org: Vec3, direction: Vec3, t_min):
        return jax.shard_map(
            lambda sw, o, d: closest_body(sw, o, d, t_min),
            mesh=mesh,
            in_specs=(P(axis), P(), P()),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )(swide, org, direction)

    def any_hit(org: Vec3, direction: Vec3, t_min, t_max):
        return jax.shard_map(
            lambda sw, o, d, tm: any_body(sw, o, d, t_min, tm),
            mesh=mesh,
            in_specs=(P(axis), P(), P(), P()),
            out_specs=P(),
            check_vma=False,
        )(occl, org, direction, t_max)

    return closest, any_hit


def make_sharded_intersectors(
    sharded: ShardedAccel,
    sharded_occl: ShardedAccel | None = None,
    tri_chunk: int = 512,
    ray_block: int = 16384,
):
    """(closest, any) callables over shard-split geometry.

    ``closest(org, dir, t_min) -> (t, tri_id, front, hit)`` with global ids;
    ``any(org, dir, t_min, t_max) -> blocked``.  Rays replicate; the vmap
    over the shard axis partitions over the mesh via the accel's sharding.
    """
    occl = sharded_occl if sharded_occl is not None else sharded
    tp = sharded.w.shape[2]

    def closest(org: Vec3, direction: Vec3, t_min):
        def per_shard(w, gn, tmin_, tmax_, off):
            accel = WoopAccel(
                w=w, geo_normal=gn, tri_min=tmin_, tri_max=tmax_,
                num_triangles=tp,
            )
            t, tid, front, hit = intersect_closest(
                accel, org, direction, t_min=t_min,
                tri_chunk=tri_chunk, ray_block=ray_block,
            )
            return t, jnp.where(hit, tid + off, -1), front, hit

        t, tid, front, hit = jax.vmap(per_shard)(
            sharded.w, sharded.geo_normal, sharded.tri_min,
            sharded.tri_max, sharded.offsets,
        )  # each (D, R)
        # Min-reduce over the shard axis (GSPMD inserts the collective).
        sel = jnp.argmin(t, axis=0)  # (R,)
        take = lambda a: jnp.take_along_axis(a, sel[None, :], axis=0)[0]
        return take(t), take(tid), take(front), take(hit)

    def any_hit(org: Vec3, direction: Vec3, t_min, t_max):
        def per_shard(w, gn, tmin_, tmax_):
            accel = WoopAccel(
                w=w, geo_normal=gn, tri_min=tmin_, tri_max=tmax_,
                num_triangles=tp,
            )
            return intersect_any(
                accel, org, direction, t_min=t_min, t_max=t_max,
                tri_chunk=tri_chunk, ray_block=ray_block,
            )

        blocked = jax.vmap(per_shard)(
            occl.w, occl.geo_normal, occl.tri_min, occl.tri_max
        )
        return jnp.any(blocked, axis=0)

    return closest, any_hit
