"""Bounding-volume hierarchy: the from-scratch replacement for the
acceleration structure inside OpenRL's closed runtime (built behind
``rlDrawElements`` retained geometry and consumed by ``rlRenderFrame``,
``3rdParty/OpenRL/rl.h:484``).

Design (TPU-first, not a GPU-BVH translation):

- **Host-side binned-SAH builder** (numpy) over triangle AABBs.  Topology is
  piecewise-constant in vertex positions, so building on host with concrete
  values is exact for rendering and consistent with the differentiable
  contract (hit *selection* is detached; ``hit_attributes`` re-derives the
  continuous quantities).
- **Leaves are fixed-size triangle chunks** (``leaf_size`` triangles, padded
  with never-hit rows): the Pallas traversal tests a whole leaf against a
  whole ray tile as one MXU contraction + VPU select block, so leaf size is
  a lane-geometry choice, not a SAH cost term.
- **Flattened skip-pointer layout** (DFS preorder): node ``i`` descends to
  ``i + 1`` on AABB overlap and jumps to ``skip[i]`` otherwise — traversal
  is a single scalar ``while`` loop with no stack, which is what Mosaic's
  scalar core executes well.  Children are emitted near-side-first along the
  split axis so the running closest-t shrinks early.

The packed ``w`` layout matches ``intersect_pallas.pack_for_pallas``:
``(C, 4, 3*Tc)`` matrices whose column blocks produce the b1/b2/s Woop
coordinates of the chunk's triangles.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .intersect import WoopAccel

# Depth at which the builders stop SAH-splitting and force median splits:
# bounds tree depth (and the kernels' traversal stack) to
# MAX_SAH_DEPTH + log2(T).
MAX_SAH_DEPTH = 48


@dataclasses.dataclass(frozen=True)
class BVHTopology:
    """Host-side (numpy) flattened tree: pure structure, no triangle data."""

    nbox: np.ndarray  # (N, 6) f32 node AABBs [min xyz, max xyz]
    # (N,) i32 node code: chunk id (>= 0) for leaves; -1 - split_axis for
    # internal nodes (the traversal orders children near-side-first along
    # the split axis using the ray tile's direction signs).
    leaf_chunk: np.ndarray
    skip: np.ndarray  # (N,) i32 DFS escape pointer (N = done)
    slot_tri: np.ndarray  # (C * Tc,) i32 chunk slot -> triangle id, -1 pad
    leaf_size: int

    @property
    def num_nodes(self) -> int:
        return self.nbox.shape[0]

    @property
    def num_chunks(self) -> int:
        return self.slot_tri.shape[0] // self.leaf_size


def build_topology(
    tri_min: np.ndarray,
    tri_max: np.ndarray,
    leaf_size: int = 64,
    n_bins: int = 16,
    include: np.ndarray | None = None,
) -> BVHTopology:
    """Binned-SAH build over triangle AABBs.

    ``tri_min``/``tri_max``: (3, T).  ``include``: optional (T,) bool — only
    these triangles enter the tree (used for the occluder-only accel that
    excludes alpha-masked primitives, ``Mesh.cpp:95-100``).
    """
    tri_min = np.asarray(tri_min, np.float32)
    tri_max = np.asarray(tri_max, np.float32)

    # Native C++ builder when available (25s -> ~0.1s at 100k triangles);
    # the numpy path below is the always-available fallback twin.
    from .. import native

    fast = native.bvh_build(tri_min, tri_max, include, leaf_size, n_bins)
    if fast is not None:
        nbox, leaf_chunk, skip, slot_tri = fast
        return BVHTopology(
            nbox=nbox,
            leaf_chunk=leaf_chunk,
            skip=skip,
            slot_tri=slot_tri,
            leaf_size=leaf_size,
        )

    ids = np.arange(tri_min.shape[1], dtype=np.int32)
    if include is not None:
        ids = ids[np.asarray(include, bool)]
    if ids.size == 0:
        # Degenerate: one empty leaf whose box never passes a slab test.
        big = np.float32(3.0e38)
        return BVHTopology(
            nbox=np.array([[big, big, big, -big, -big, -big]], np.float32),
            leaf_chunk=np.array([0], np.int32),
            skip=np.array([1], np.int32),
            slot_tri=np.full((leaf_size,), -1, np.int32),
            leaf_size=leaf_size,
        )
    bmin = tri_min[:, ids].T  # (T', 3)
    bmax = tri_max[:, ids].T
    cent = 0.5 * (bmin + bmax)

    nbox: list[np.ndarray] = []
    leaf_chunk: list[int] = []
    skip: list[int] = []
    leaves: list[np.ndarray] = []  # triangle-id arrays per chunk

    order = np.arange(ids.shape[0])

    def emit(lo: int, hi: int, depth: int = 0) -> None:
        """Emit the subtree over order[lo:hi] (preorder); fills skip after."""
        my = len(nbox)
        sel = order[lo:hi]
        nbox.append(
            np.concatenate([bmin[sel].min(axis=0), bmax[sel].max(axis=0)])
        )
        leaf_chunk.append(-1)
        skip.append(-1)

        if hi - lo <= leaf_size:
            leaf_chunk[my] = len(leaves)
            leaves.append(ids[sel])
            skip[my] = len(nbox)
            return

        c = cent[sel]
        lo_c = c.min(axis=0)
        extent = c.max(axis=0) - lo_c
        axis = int(np.argmax(extent))
        mid = None
        # Past MAX_SAH_DEPTH force median splits so tree depth (and the
        # traversal stack) stays bounded: 48 + log2(T) levels max.
        if extent[axis] > 1e-12 and depth < MAX_SAH_DEPTH:
            # Binned SAH along the widest centroid axis.
            b = np.minimum(
                ((c[:, axis] - lo_c[axis]) / extent[axis] * n_bins).astype(
                    np.int32
                ),
                n_bins - 1,
            )
            counts = np.bincount(b, minlength=n_bins)
            # Per-bin boxes -> prefix/suffix surface-area costs.
            bin_min = np.full((n_bins, 3), np.inf, np.float32)
            bin_max = np.full((n_bins, 3), -np.inf, np.float32)
            for k in range(3):
                np.minimum.at(bin_min[:, k], b, bmin[sel][:, k])
                np.maximum.at(bin_max[:, k], b, bmax[sel][:, k])

            def areas(mn, mx):
                d = np.maximum(mx - mn, 0.0)
                return d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 2] * d[:, 0]

            pre_min = np.minimum.accumulate(bin_min, axis=0)
            pre_max = np.maximum.accumulate(bin_max, axis=0)
            suf_min = np.minimum.accumulate(bin_min[::-1], axis=0)[::-1]
            suf_max = np.maximum.accumulate(bin_max[::-1], axis=0)[::-1]
            n_l = np.cumsum(counts)[:-1]
            n_r = (hi - lo) - n_l
            cost = areas(pre_min, pre_max)[:-1] * n_l + areas(
                suf_min, suf_max
            )[1:] * n_r
            valid = (n_l > 0) & (n_r > 0)
            if valid.any():
                cost = np.where(valid, cost, np.inf)
                split_bin = int(np.argmin(cost))
                left = b <= split_bin
                mid = lo + int(left.sum())
                # Near-side-first partition (stable keeps spatial order).
                order[lo:hi] = np.concatenate([sel[left], sel[~left]])
        if mid is None:
            # Fallback: median split (all centroids in one bin / one side).
            key = np.argsort(c[:, axis], kind="stable")
            order[lo:hi] = sel[key]
            mid = lo + (hi - lo) // 2
        leaf_chunk[my] = -1 - axis  # internal: encode the split axis
        emit(lo, mid, depth + 1)
        emit(mid, hi, depth + 1)
        skip[my] = len(nbox)

    import sys

    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 100_000))
    try:
        emit(0, ids.shape[0])
    finally:
        sys.setrecursionlimit(old_limit)

    slot_tri = np.full((len(leaves) * leaf_size,), -1, np.int32)
    for c, tri in enumerate(leaves):
        slot_tri[c * leaf_size : c * leaf_size + tri.shape[0]] = tri
    return BVHTopology(
        nbox=np.asarray(nbox, np.float32),
        leaf_chunk=np.asarray(leaf_chunk, np.int32),
        skip=np.asarray(skip, np.int32),
        slot_tri=slot_tri,
        leaf_size=leaf_size,
    )


@struct.dataclass
class BVH:
    """Device-side flattened BVH (a pytree).

    Node tables are FLAT 1D (SMEM pads every row of a 2D array to 512
    bytes, so 2D tables overflow the ~1 MiB scalar memory): ``nbox`` is
    (N * 6,) f32, ``meta`` is (N * 2,) i32 interleaving (leaf_chunk | -1,
    skip).  ``w`` is the chunk-padded Woop data in the Pallas pair-math
    layout ``(C, 4, 3*Tc)``; ``slot_tri`` maps kernel hit slots back to
    original triangle ids (-1 for leaf padding).
    """

    nbox: jnp.ndarray  # (N * 6,) f32
    meta: jnp.ndarray  # (N * 2,) i32
    w: jnp.ndarray  # (C, 4, 3*Tc) f32
    slot_tri: jnp.ndarray  # (C * Tc,) i32
    leaf_size: int = struct.field(pytree_node=False)
    num_triangles: int = struct.field(pytree_node=False)

    @property
    def num_nodes(self) -> int:
        return self.nbox.shape[0] // 6

    @property
    def num_chunks(self) -> int:
        return self.w.shape[0]


def pack_bvh(accel: WoopAccel, topo: BVHTopology) -> BVH:
    """Gather the accel's Woop rows into the topology's chunk slots.

    Padding slots get all-zero matrices (dp_s == 0 -> never hit).  The
    packed data is stop-gradient by design: the kernels are piecewise-
    constant selectors; differentiable quantities re-derive from the row
    table (``shade_table.hit_attributes_rows``).
    """
    tc = topo.leaf_size
    c = topo.num_chunks
    # All-numpy packing with ONE device upload at the end: per-op dispatch
    # to a remote TPU costs far more than the host gather (accel.w is
    # concrete here — pack_bvh is a host-side, outside-jit step).
    w_host = np.asarray(accel.w)  # concrete here; one host fetch
    valid = (topo.slot_tri >= 0).astype(np.float32)
    safe = np.maximum(topo.slot_tri, 0)
    w = np.take(w_host, safe, axis=1) * valid[None, :]
    # (12, C*Tc) -> (C, 4, 3*Tc): same layout as pack_for_pallas.
    w = w.reshape(12, c, tc).transpose(1, 0, 2)
    w = w.reshape(c, 3, 4, tc).transpose(0, 2, 1, 3).reshape(c, 4, 3 * tc)
    meta = np.stack([topo.leaf_chunk, topo.skip], axis=1).reshape(-1)
    return BVH(
        nbox=jnp.asarray(topo.nbox.reshape(-1)),
        meta=jnp.asarray(meta),
        w=jnp.asarray(np.ascontiguousarray(w)),
        slot_tri=jnp.asarray(topo.slot_tri),
        leaf_size=tc,
        num_triangles=accel.num_triangles,
    )


def build_bvh(
    accel: WoopAccel,
    leaf_size: int = 64,
    include: np.ndarray | None = None,
) -> BVH:
    """Convenience: topology (host) + packing (device) in one call.

    Must run OUTSIDE jit (the builder needs concrete triangle boxes)."""
    topo = build_topology(
        np.asarray(accel.tri_min),
        np.asarray(accel.tri_max),
        leaf_size=leaf_size,
        include=include,
    )
    return pack_bvh(accel, topo)


# --- numpy reference traversal (for builder validation in tests) ---------


def traverse_closest_numpy(topo: BVHTopology, woop_w: np.ndarray, o, d, t_min=1e-4):
    """Scalar skip-pointer traversal of ONE ray (numpy, test oracle).

    ``woop_w``: (12, T) Woop rows; ``o``/``d``: (3,) arrays.  Returns
    (t, tri_id).
    """
    inv = np.where(d < 0, -1.0, 1.0) / np.maximum(np.abs(d), 1e-18)
    best_t, best_id = 3.0e38, -1
    i = 0
    n = topo.num_nodes
    tc = topo.leaf_size
    while i < n:
        box = topo.nbox[i]
        t0 = (box[:3] - o) * inv
        t1 = (box[3:] - o) * inv
        tn = max(np.minimum(t0, t1).max(), t_min)
        tf = min(np.maximum(t0, t1).min(), best_t)
        if tn <= tf:
            chunk = topo.leaf_chunk[i]
            if chunk >= 0:
                for slot in range(chunk * tc, (chunk + 1) * tc):
                    tri = topo.slot_tri[slot]
                    if tri < 0:
                        continue
                    w = woop_w[:, tri]
                    dz = w[8] * d[0] + w[9] * d[1] + w[10] * d[2]
                    if abs(dz) <= 1e-15:
                        continue
                    oz = w[8] * o[0] + w[9] * o[1] + w[10] * o[2] + w[11]
                    t = -oz / dz
                    if not (t_min < t < best_t):
                        continue
                    b1 = (
                        w[0] * (o[0] + t * d[0])
                        + w[1] * (o[1] + t * d[1])
                        + w[2] * (o[2] + t * d[2])
                        + w[3]
                    )
                    b2 = (
                        w[4] * (o[0] + t * d[0])
                        + w[5] * (o[1] + t * d[1])
                        + w[6] * (o[2] + t * d[2])
                        + w[7]
                    )
                    if b1 >= -1e-6 and b2 >= -1e-6 and b1 + b2 <= 1.0 + 1e-6:
                        best_t, best_id = t, int(tri)
            i += 1
        else:
            i = int(topo.skip[i])
    return best_t, best_id
