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
