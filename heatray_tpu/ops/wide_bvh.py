"""Wide (arity-8) BVH: builder + Pallas TPU traversal kernels.

The round-3 performance core, replacing the binary skip-pointer walk of
``traverse_pallas.py`` on the hot path.  Why wide, on this machine:

- The binary kernel slab-tests ONE node box per scalar-loop iteration as a
  ``(1, Rt)`` row — 1/8 of the VPU's sublanes, and one serial iteration per
  node.  An arity-8 node tests all 8 children at once as ``(8, Rt)`` tiles:
  full VPU, and the per-tile node walk shrinks by ~the arity.
- Child boxes live in VMEM laid out ``(Nw, 8, 8)`` (children on sublanes,
  box coords on lanes 0..5) so the kernel reads ``(8, 1)`` coordinate
  columns that broadcast against ``(1, Rt)`` ray rows.
- Per-child "any ray overlaps" reduces to ONE scalar bitmask via a
  lane-reduction + power-of-two dot, so the 8-way descend decision is 8
  scalar bit tests, not 8 vector reductions.
- Children are pre-sorted along the parent's widest axis; the kernel
  processes leaf children near-first (the running closest-t shrinks before
  the far leaves are tested) and pushes internal children far-first so the
  LIFO stack pops near-first.  "Near" flips per tile from the tile's
  aggregate direction sign — one scalar select.

This is the TPU-native replacement for the traversal scheduler inside
OpenRL's closed runtime (``3rdParty/OpenRL/rl.h:484`` ``rlRenderFrame``);
the reference never sees this layer (its BVH lives behind the OpenRL
binary), so everything here is original design.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..vec import Vec3
from .bvh import BVHTopology, build_topology
from .intersect import WoopAccel
from .intersect_pallas import (
    MISS_T,
    _pack_rays,
    _pair_hits,
    _pair_hits_fused,
    _pair_hits_t,
    _row_spec,
    _rays_spec,
    _split3,
    _tile_inv_dir,
)

ARITY = 8
RAY_TILE = 512
# Wide-tree depth is ~1/3 of the binary depth; each visit pushes <= 7.
STACK_DEPTH = 256

_BIG = np.float32(3.0e38)


@struct.dataclass
class WideBVH:
    """Device-side arity-8 BVH (a pytree).

    ``wbox``: (Nw, 8, 8) f32 — per node, 8 children on sublanes; lanes
    0..5 hold [minx, miny, minz, maxx, maxy, maxz] (6..7 pad).  Empty child
    slots hold an inverted box (min=+BIG, max=-BIG): they fail every slab
    test.
    ``wchild``: (Nw * 8,) i32 child codes — ``>= 0``: wide-node index;
    ``-1``: empty; ``<= -2``: leaf, chunk id = ``-2 - code``.
    ``waxis``: (Nw,) i32 — the axis children are sorted along (ascending).
    ``w``: chunk-packed Woop rows, RE-CENTERED: each chunk's translation
    column has the anchor ``wanchor[c]`` folded in (in float64 at pack
    time), so the kernel evaluates the affine at ``o - anchor``.  Layout
    depends on the build ``schedule``:
    - "fused" (default): (C, 12, 3*Tc) bf16 — the pre-split [Ah; Ah; Al]
      operand of the single-pass K=12 bf16x3 contraction
      (``_pair_hits_fused``); 3x fewer MXU passes per leaf visit.
    - "f32": (C, 4, 3*Tc) f32 — the classic layout for the multi-pass
      schedules (``_pair_hits`` with bf16x3/HIGHEST precision) and the
      HBM-streaming kernels.
    ``slot_tri``: (C * Tc,) i32 chunk slot -> original triangle id (-1
    padding).  ``wanchor``: (3, C) f32 chunk anchor points (SMEM; component-major so the
    three rows pad to lane multiples instead of C rows padding to 128 scalars
    each — the (C, 3) layout overflows the 1 MB SMEM past ~2k chunks).
    """

    wbox: jnp.ndarray
    wchild: jnp.ndarray
    waxis: jnp.ndarray
    w: jnp.ndarray
    slot_tri: jnp.ndarray
    wanchor: jnp.ndarray
    leaf_size: int = struct.field(pytree_node=False)
    num_triangles: int = struct.field(pytree_node=False)

    @property
    def num_nodes(self) -> int:
        return self.wbox.shape[0]

    @property
    def num_chunks(self) -> int:
        return self.w.shape[0]


def collapse_topology(topo: BVHTopology, arity: int = ARITY):
    """Collapse a flat binary topology into arity-N nodes (host, numpy).

    Returns (wbox (Nw, 8, 8), wchild (Nw*8,), waxis (Nw,)) numpy arrays.
    Greedy collapse: starting from a binary subtree root, repeatedly expand
    the largest-surface-area internal slot until ``arity`` slots (or all
    leaves) — the standard BVH8 construction, by surface area so big boxes
    (which overlap the most rays) get split finest.
    """
    nbox, lc, skip = topo.nbox, topo.leaf_chunk, topo.skip

    def area(s: int) -> float:
        b = nbox[s]
        d = np.maximum(b[3:] - b[:3], 0.0)
        return float(d[0] * d[1] + d[1] * d[2] + d[2] * d[0])

    wbox: list[np.ndarray] = []
    wchild: list[np.ndarray] = []
    waxis: list[int] = []

    # Iterative DFS: each work item is (binary root, wide node id to fill).
    wbox.append(None)  # type: ignore[arg-type]
    wchild.append(None)  # type: ignore[arg-type]
    waxis.append(0)
    work = [(0, 0)]
    while work:
        root, my = work.pop()
        slots = [root]
        while len(slots) < arity:
            cand = [s for s in slots if lc[s] < 0]
            if not cand:
                break
            s = max(cand, key=area)
            left = s + 1
            right = skip[left]
            slots.remove(s)
            slots += [int(left), int(right)]

        b = nbox[root]
        ext = b[3:] - b[:3]
        axis = int(np.argmax(ext))
        cent = np.array(
            [0.5 * (nbox[s][axis] + nbox[s][3 + axis]) for s in slots]
        )
        slots = [slots[o] for o in np.argsort(cent, kind="stable")]

        boxes = np.empty((arity, 8), np.float32)
        boxes[:, 0:3] = _BIG
        boxes[:, 3:6] = -_BIG
        boxes[:, 6:8] = 0.0
        codes = np.full((arity,), -1, np.int32)
        for k, s in enumerate(slots):
            boxes[k, 0:6] = nbox[s]
            if lc[s] >= 0:
                codes[k] = -2 - lc[s]
            else:
                child_id = len(wbox)
                wbox.append(None)  # type: ignore[arg-type]
                wchild.append(None)  # type: ignore[arg-type]
                waxis.append(0)
                work.append((s, child_id))
                codes[k] = child_id
        wbox[my] = boxes
        wchild[my] = codes
        waxis[my] = axis

    return (
        np.stack(wbox, axis=0),
        np.concatenate(wchild),
        np.asarray(waxis, np.int32),
    )


def build_wide_bvh(
    accel: WoopAccel,
    leaf_size: int = 32,
    include: np.ndarray | None = None,
    schedule: str = "fused",
) -> WideBVH:
    """Binned-SAH binary build + arity-8 collapse + Woop chunk packing.

    Must run OUTSIDE jit (needs concrete boxes).  ``include`` filters
    triangles (the occluder-only accel, ``Mesh.cpp:95-100``).
    ``schedule``: "fused" (bf16 single-pass pack) or "f32" (see WideBVH).
    """
    topo = build_topology(
        np.asarray(accel.tri_min),
        np.asarray(accel.tri_max),
        leaf_size=leaf_size,
        include=include,
    )
    wbox, wchild, waxis = collapse_topology(topo)

    # Chunk-pack the Woop rows (same layout as bvh.pack_bvh, host-side).
    tc = topo.leaf_size
    c = topo.num_chunks
    w_host = np.asarray(accel.w)
    valid = (topo.slot_tri >= 0).astype(np.float32)
    safe = np.maximum(topo.slot_tri, 0)
    w = np.take(w_host, safe, axis=1).astype(np.float64) * valid[None, :]

    # Per-chunk anchors (chunk AABB centers) + fold their translation into
    # the w3 columns IN FLOAT64: the fold is exactly the cancellation-prone
    # sum, so doing it at double precision leaves w3' accurate to f32 ulp of
    # its (small) recentered value.
    vmask = valid[None, :] > 0
    tmn = np.where(vmask, np.take(np.asarray(accel.tri_min), safe, axis=1), np.inf)
    tmx = np.where(vmask, np.take(np.asarray(accel.tri_max), safe, axis=1), -np.inf)
    lo = tmn.reshape(3, c, tc).min(axis=2)
    hi = tmx.reshape(3, c, tc).max(axis=2)
    ok = np.isfinite(lo) & np.isfinite(hi)
    anchors = np.where(ok, 0.5 * (lo + hi), 0.0).astype(np.float64)  # (3, C)
    a_slot = np.repeat(anchors, tc, axis=1)  # (3, C*Tc)
    for g in range(3):
        w[4 * g + 3] += (
            a_slot[0] * w[4 * g + 0]
            + a_slot[1] * w[4 * g + 1]
            + a_slot[2] * w[4 * g + 2]
        )
    w = w.astype(np.float32)
    w = w.reshape(12, c, tc).transpose(1, 0, 2)
    w = w.reshape(c, 3, 4, tc).transpose(0, 2, 1, 3).reshape(c, 4, 3 * tc)
    if schedule == "fused":
        # Pre-split A side of the single-pass bf16x3 contraction:
        # rows [Ah; Ah; Al] along K (matched against [bh; bl; bh] rays).
        import ml_dtypes

        bf16 = ml_dtypes.bfloat16
        w_hi = w.astype(bf16)
        w_lo = (w - w_hi.astype(np.float32)).astype(bf16)
        w = np.concatenate([w_hi, w_hi, w_lo], axis=1)  # (C, 12, 3Tc)

    return WideBVH(
        wbox=jnp.asarray(wbox),
        wchild=jnp.asarray(wchild),
        waxis=jnp.asarray(waxis),
        w=jnp.asarray(np.ascontiguousarray(w)),
        slot_tri=jnp.asarray(topo.slot_tri),
        wanchor=jnp.asarray(anchors.astype(np.float32)),
        leaf_size=tc,
        num_triangles=accel.num_triangles,
    )


def _children_slab(boxes, rays, invx, invy, invz, t_min, t_far):
    """Slab test of the ray tile against all 8 child boxes at once.

    ``boxes``: (8, 8) — children on sublanes, coords on lanes.  Returns an
    (8, Rt) overlap mask.  ``t_far`` broadcasts from (1, Rt).
    """
    ox, oy, oz = rays[0:1, :], rays[1:2, :], rays[2:3, :]
    tx0 = (boxes[:, 0:1] - ox) * invx  # (8, Rt)
    ty0 = (boxes[:, 1:2] - oy) * invy
    tz0 = (boxes[:, 2:3] - oz) * invz
    tx1 = (boxes[:, 3:4] - ox) * invx
    ty1 = (boxes[:, 4:5] - oy) * invy
    tz1 = (boxes[:, 5:6] - oz) * invz
    tn = jnp.maximum(
        jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
        jnp.maximum(jnp.minimum(tz0, tz1), t_min),
    )
    tf = jnp.minimum(
        jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
        jnp.minimum(jnp.maximum(tz0, tz1), t_far),
    )
    return tn <= tf


_BITCOL = None  # built per-trace below (needs 2D iota)


def _overlap_bits(ov):
    """(8, Rt) overlap mask -> ONE int32 scalar whose bit c = any ray
    overlaps child c."""
    anyc = jnp.any(ov, axis=1, keepdims=True)  # (8, 1)
    pow2 = jnp.left_shift(
        jnp.int32(1), jax.lax.broadcasted_iota(jnp.int32, (ARITY, 1), 0)
    )
    return jnp.sum(jnp.where(anyc, pow2, 0))


def _tile_axis_signs(rays):
    """Aggregate tile direction sign per axis (3 scalar bools: True = the
    tile predominantly travels +axis, so the low-coordinate child is near)."""
    sx = jnp.sum(rays[4:5, :]) >= 0.0
    sy = jnp.sum(rays[5:6, :]) >= 0.0
    sz = jnp.sum(rays[6:7, :]) >= 0.0
    return sx, sy, sz


def _closest_kernel(
    tc, t_min, precision, fused, batch,
    rays_ref, wbox_ref, wchild_ref, waxis_ref, w_ref, wanchor_ref,
    t_ref, id_ref, stack_ref, lq_ref, best_ref, bid_ref,
):
    """Closest-hit tile traversal with a leaf QUEUE and BATCHED drains.

    r5 latency finding (tpu_kernel_variants_probe.py): one pair test is a
    chain of ~15 dependent vector ops whose LATENCY dominates at (Tc, Rt)
    shapes — a visit costs ~0.65 us against ~0.2 us of pure issue
    throughput.  Live leaf chunks are therefore queued in SMEM during the
    node walk and drained ``batch`` at a time as INDEPENDENT pair tests
    merged by a min-tree, letting the compiler interleave the chains
    (measured 1.6-2.3x on sorted bounce wavefronts, bit-identical
    results — a batch prunes against the batch-start bound, which cannot
    change the final min)."""
    rays = rays_ref[...]  # (8, Rt)
    rt = rays.shape[1]
    invx, invy, invz = _tile_inv_dir(rays)
    sx, sy, sz = _tile_axis_signs(rays)
    sub_ids = jax.lax.broadcasted_iota(jnp.int32, (tc, rt), 0)
    # Direction split for the fused schedule: anchor-independent, built
    # once per tile (the origin side is split per leaf visit).
    d12 = _split3(rays[4:8, :]) if fused else None
    B = batch

    def pair(chunk, bound):
        anchor = (
            wanchor_ref[0, chunk],
            wanchor_ref[1, chunk],
            wanchor_ref[2, chunk],
        )
        if fused:
            return _pair_hits_fused(
                rays, d12, w_ref[chunk], tc, t_min, bound, anchor
            )
        return _pair_hits(
            rays, w_ref[chunk], tc, t_min, bound, precision, anchor
        )

    def drain_batch(qs):
        bt = best_ref[...]
        tms = [pair(q, bt) for q in qs]  # B independent op chains
        cand = []
        for q, tm in zip(qs, tms):
            cm = jnp.min(tm, axis=0, keepdims=True)  # (1, Rt)
            tri = jnp.min(
                jnp.where(tm <= cm, sub_ids, jnp.int32(2**30)),
                axis=0,
                keepdims=True,
            )
            cand.append((cm, q * tc + tri))
        while len(cand) > 1:  # pairwise min-merge tree
            (c1, i1), (c2, i2) = cand[0], cand[1]
            take2 = c2 < c1
            cand = cand[2:] + [
                (jnp.minimum(c1, c2), jnp.where(take2, i2, i1))
            ]
        cm, slot = cand[0]
        improved = cm < bt
        bid_ref[...] = jnp.where(improved, slot, bid_ref[...])
        best_ref[...] = jnp.where(improved, cm, bt)

    best_ref[...] = jnp.full((1, rt), MISS_T, jnp.float32)
    bid_ref[...] = jnp.full((1, rt), -1, jnp.int32)

    def cond(carry):
        return carry[0] >= 0

    def body(carry):
        i, sp, nl = carry
        boxes = wbox_ref[i]  # (8, 8)
        best_t = best_ref[...]
        ov = _children_slab(boxes, rays, invx, invy, invz, t_min, best_t)
        bits = _overlap_bits(ov)
        axis = waxis_ref[i]
        sign = jnp.where(axis == 0, sx, jnp.where(axis == 1, sy, sz))

        # Pass 1 (near -> far): queue live leaf children.  Branchless
        # conditional store: a dead child writes to the slot the next live
        # child (or nothing) overwrites.
        for k in range(ARITY):
            c = jnp.where(sign, k, ARITY - 1 - k)
            code = wchild_ref[ARITY * i + c]
            live = (((bits >> c) & 1) > 0) & (code <= -2)
            lq_ref[nl] = jnp.where(live, -2 - code, lq_ref[nl])
            nl = nl + jnp.where(live, 1, 0)

        def drain_cond(n):
            return n >= B

        def drain_body(n):
            drain_batch([lq_ref[n - B + j] for j in range(B)])
            return n - B

        nl = jax.lax.while_loop(drain_cond, drain_body, nl)

        # Pass 2 (far -> near): push internal children; LIFO pops near-first.
        push = jnp.int32(0)
        for k in range(ARITY):
            c = jnp.where(sign, ARITY - 1 - k, k)
            code = wchild_ref[ARITY * i + c]
            live = (((bits >> c) & 1) > 0) & (code >= 0)
            stack_ref[sp + push] = jnp.where(live, code, stack_ref[sp + push])
            push = push + jnp.where(live, 1, 0)

        sp = sp + push
        has = sp > 0
        top = stack_ref[jnp.maximum(sp - 1, 0)]
        return jnp.where(has, top, -1), jnp.maximum(sp - 1, 0), nl

    _, _, nl = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.int32(0), jnp.int32(0))
    )

    # Leftover partial batch (pad by repeating entry 0: idempotent for min).
    @pl.when(nl > 0)
    def _():
        drain_batch([lq_ref[jnp.where(j < nl, j, 0)] for j in range(B)])

    t_ref[...] = best_ref[...]
    id_ref[...] = bid_ref[...]


def _any_kernel(
    tc, t_min, precision, fused,
    rays_ref, tmax_ref, wbox_ref, wchild_ref, waxis_ref, w_ref, wanchor_ref,
    hit_ref, stack_ref, mint_ref,
):
    rays = rays_ref[...]
    t_max = tmax_ref[...]  # (1, Rt)
    rt = rays.shape[1]
    invx, invy, invz = _tile_inv_dir(rays)
    sx, sy, sz = _tile_axis_signs(rays)
    d12 = _split3(rays[4:8, :]) if fused else None

    def pair(chunk, bound):
        anchor = (
            wanchor_ref[0, chunk],
            wanchor_ref[1, chunk],
            wanchor_ref[2, chunk],
        )
        if fused:
            return _pair_hits_fused(
                rays, d12, w_ref[chunk], tc, t_min, bound, anchor
            )
        return _pair_hits(
            rays, w_ref[chunk], tc, t_min, bound, precision, anchor
        )

    mint_ref[...] = jnp.full((1, rt), MISS_T, jnp.float32)

    def cond(carry):
        i, sp, alive = carry
        return (i >= 0) & alive

    def body(carry):
        i, sp, _ = carry
        boxes = wbox_ref[i]
        # Blocked lanes get an empty interval: they keep nothing live.
        t_far = jnp.where(mint_ref[...] < MISS_T, t_min - 1.0, t_max)
        ov = _children_slab(boxes, rays, invx, invy, invz, t_min, t_far)
        bits = _overlap_bits(ov)
        axis = waxis_ref[i]
        sign = jnp.where(axis == 0, sx, jnp.where(axis == 1, sy, sz))

        # Near-first leaf order: an occluder found early blocks its lanes,
        # collapsing their intervals so everything behind it is pruned.
        push = jnp.int32(0)
        for k in range(ARITY):
            c = jnp.where(sign, k, ARITY - 1 - k)
            code = wchild_ref[ARITY * i + c]
            hit_live = (((bits >> c) & 1) > 0)
            leaf_live = hit_live & (code <= -2)

            @pl.when(leaf_live)
            def _():
                chunk = -2 - code
                tm = pair(chunk, t_max)
                mint_ref[...] = jnp.minimum(
                    mint_ref[...], jnp.min(tm, axis=0, keepdims=True)
                )

        # Push internal children far-first so the LIFO pops near-first.
        for k in range(ARITY):
            c = jnp.where(sign, ARITY - 1 - k, k)
            code = wchild_ref[ARITY * i + c]
            int_live = (((bits >> c) & 1) > 0) & (code >= 0)

            @pl.when(int_live)
            def _():
                stack_ref[sp + push] = code

            push = push + jnp.where(int_live, 1, 0)

        sp = sp + push
        has = sp > 0
        top = stack_ref[jnp.maximum(sp - 1, 0)]
        # Early exit as soon as every lane is blocked.
        alive = jnp.any(mint_ref[...] >= MISS_T)
        return jnp.where(has, top, -1), jnp.maximum(sp - 1, 0), alive

    jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.int32(0), jnp.bool_(True))
    )
    hit_ref[...] = (mint_ref[...] < MISS_T).astype(jnp.int32)


def _smem_spec():
    return pl.BlockSpec(memory_space=pltpu.SMEM)


# ---------------------------------------------------------------------------
# Hybrid kernels: row-layout node phase + transposed VPU leaf math
# ---------------------------------------------------------------------------
#
# The MXU pair test wastes the systolic array on a K=4 contraction and pays
# 6 bf16 passes for f32-exact HIGHEST; the same math as 13 broadcast VPU ops
# on a TRANSPOSED (Rt, 3Tc) pair matrix measured 2.5-4x faster AND exact
# (tpu_vpu_leaf.py).  The node phase, however, must stay in the ROW layout
# (children on sublanes, rays on lanes): a fully-transposed kernel puts slab
# tests on (Rt, 8) shapes that use 8 of 128 lanes — measured SLOWER overall.
# So these kernels are hybrids: the traversal loop is the row-layout walk of
# ``_closest_kernel``, and each leaf visit transposes the running best-t row
# to a column, runs the VPU pair test against the per-tile transposed rays,
# and transposes the (Rt, 1) results back.  Leaf size must be a multiple of
# 128 so the b1/b2/s lane-block slices stay tile-aligned.


def _closest_kernel_t(
    tc, t_min,
    rays_ref, wbox_ref, wchild_ref, waxis_ref, w_ref, wanchor_ref,
    t_ref, id_ref, stack_ref, best_ref, bid_ref,
):
    rays = rays_ref[...]  # (8, Rt) row layout for the node phase
    raysT = rays.T  # (Rt, 8), ONE relayout per tile, for the leaf phase
    rt = rays.shape[1]
    invx, invy, invz = _tile_inv_dir(rays)
    sx, sy, sz = _tile_axis_signs(rays)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (rt, tc), 1)

    best_ref[...] = jnp.full((1, rt), MISS_T, jnp.float32)
    bid_ref[...] = jnp.full((1, rt), -1, jnp.int32)

    def cond(carry):
        return carry[0] >= 0

    def body(carry):
        i, sp = carry
        boxes = wbox_ref[i]  # (8, 8) children on sublanes
        best_t = best_ref[...]
        ov = _children_slab(boxes, rays, invx, invy, invz, t_min, best_t)
        bits = _overlap_bits(ov)
        axis = waxis_ref[i]
        sign = jnp.where(axis == 0, sx, jnp.where(axis == 1, sy, sz))

        # Pass 1 (near -> far): leaf children, transposed VPU pair test.
        for k in range(ARITY):
            c = jnp.where(sign, k, ARITY - 1 - k)
            code = wchild_ref[ARITY * i + c]
            live = (((bits >> c) & 1) > 0) & (code <= -2)

            @pl.when(live)
            def _():
                chunk = -2 - code
                bt = best_ref[...]  # (1, Rt)
                anchor = (
                    wanchor_ref[0, chunk],
                    wanchor_ref[1, chunk],
                    wanchor_ref[2, chunk],
                )
                tm = _pair_hits_t(
                    raysT, w_ref[chunk], tc, t_min, bt.T, anchor
                )
                col_min = jnp.min(tm, axis=1, keepdims=True)  # (Rt, 1)
                tri = jnp.min(
                    jnp.where(tm <= col_min, lane_ids, jnp.int32(2**30)),
                    axis=1,
                    keepdims=True,
                )
                row_min = col_min.T  # back to (1, Rt) rows
                improved = row_min < bt
                bid_ref[...] = jnp.where(
                    improved, chunk * tc + tri.T, bid_ref[...]
                )
                best_ref[...] = jnp.where(improved, row_min, bt)

        # Pass 2 (far -> near): push internal children (LIFO -> near pops).
        push = jnp.int32(0)
        for k in range(ARITY):
            c = jnp.where(sign, ARITY - 1 - k, k)
            code = wchild_ref[ARITY * i + c]
            live = (((bits >> c) & 1) > 0) & (code >= 0)

            @pl.when(live)
            def _():
                stack_ref[sp + push] = code

            push = push + jnp.where(live, 1, 0)

        sp = sp + push
        has = sp > 0
        top = stack_ref[jnp.maximum(sp - 1, 0)]
        return jnp.where(has, top, -1), jnp.maximum(sp - 1, 0)

    jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0)))
    t_ref[...] = best_ref[...]
    id_ref[...] = bid_ref[...]


def _any_kernel_t(
    tc, t_min,
    rays_ref, tmax_ref, wbox_ref, wchild_ref, w_ref, wanchor_ref,
    hit_ref, stack_ref, mint_ref,
):
    rays = rays_ref[...]
    raysT = rays.T
    t_max = tmax_ref[...]  # (1, Rt)
    t_max_col = t_max.T  # (Rt, 1) for the leaf phase
    rt = rays.shape[1]
    invx, invy, invz = _tile_inv_dir(rays)

    mint_ref[...] = jnp.full((1, rt), MISS_T, jnp.float32)

    def cond(carry):
        i, sp, alive = carry
        return (i >= 0) & alive

    def body(carry):
        i, sp, _ = carry
        boxes = wbox_ref[i]
        # Blocked lanes get an empty interval.
        t_far = jnp.where(mint_ref[...] < MISS_T, t_min - 1.0, t_max)
        ov = _children_slab(boxes, rays, invx, invy, invz, t_min, t_far)
        bits = _overlap_bits(ov)

        push = jnp.int32(0)
        for c in range(ARITY):  # occlusion: order irrelevant
            code = wchild_ref[ARITY * i + c]
            hit_live = (((bits >> c) & 1) > 0)
            leaf_live = hit_live & (code <= -2)
            int_live = hit_live & (code >= 0)

            @pl.when(leaf_live)
            def _():
                chunk = -2 - code
                anchor = (
                    wanchor_ref[0, chunk],
                    wanchor_ref[1, chunk],
                    wanchor_ref[2, chunk],
                )
                tm = _pair_hits_t(
                    raysT, w_ref[chunk], tc, t_min, t_max_col, anchor
                )
                mint_ref[...] = jnp.minimum(
                    mint_ref[...], jnp.min(tm, axis=1, keepdims=True).T
                )

            @pl.when(int_live)
            def _():
                stack_ref[sp + push] = code

            push = push + jnp.where(int_live, 1, 0)

        sp = sp + push
        has = sp > 0
        top = stack_ref[jnp.maximum(sp - 1, 0)]
        alive = jnp.any(mint_ref[...] >= MISS_T)
        return jnp.where(has, top, -1), jnp.maximum(sp - 1, 0), alive

    jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.int32(0), jnp.bool_(True))
    )
    hit_ref[...] = (mint_ref[...] < MISS_T).astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("ray_tile", "t_min", "interpret", "return_slots")
)
def intersect_closest_vpu(
    bvh: WideBVH,
    origins: Vec3,
    directions: Vec3,
    t_min: float = 1e-4,
    ray_tile: int = RAY_TILE,
    interpret: bool = False,
    return_slots: bool = False,
):
    """Closest-hit wide-BVH traversal, transposed layout + VPU leaf math
    (exact f32; the fast path).  Requires ``bvh.leaf_size % 128 == 0``."""
    tc = bvh.leaf_size
    assert tc % 128 == 0, "VPU leaf math needs leaf_size % 128 == 0"
    assert bvh.w.dtype == jnp.float32, "VPU kernels need a schedule='f32' pack"
    rays, n_tiles, r = _pack_rays(origins, directions, ray_tile)

    kernel = functools.partial(_closest_kernel_t, tc, t_min)
    best_t, best_slot = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            _rays_spec(ray_tile),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wbox
            _smem_spec(),  # wchild
            _smem_spec(),  # waxis
            pl.BlockSpec(memory_space=pltpu.VMEM),  # chunked w
            _smem_spec(),  # wanchor
        ],
        out_specs=(_row_spec(ray_tile), _row_spec(ray_tile)),
        out_shape=(
            jax.ShapeDtypeStruct((1, n_tiles * ray_tile), jnp.float32),
            jax.ShapeDtypeStruct((1, n_tiles * ray_tile), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.SMEM((STACK_DEPTH,), jnp.int32),
            pltpu.VMEM((1, ray_tile), jnp.float32),
            pltpu.VMEM((1, ray_tile), jnp.int32),
        ],
        interpret=interpret,
    )(rays, bvh.wbox, bvh.wchild, bvh.waxis, bvh.w, bvh.wanchor)

    best_t = best_t[0, :r]
    best_slot = best_slot[0, :r]
    hit = best_slot >= 0
    if return_slots:
        return jnp.where(hit, best_t, MISS_T), best_slot, hit
    tri = jnp.take(bvh.slot_tri, jnp.maximum(best_slot, 0))
    tri = jnp.where(hit, tri, -1)
    return jnp.where(hit, best_t, MISS_T), tri, hit


@functools.partial(
    jax.jit, static_argnames=("ray_tile", "t_min", "interpret")
)
def intersect_any_vpu(
    bvh: WideBVH,
    origins: Vec3,
    directions: Vec3,
    t_min: float = 1e-4,
    t_max=3.0e37,
    ray_tile: int = RAY_TILE,
    interpret: bool = False,
):
    """Any-hit wide-BVH traversal, transposed layout + VPU leaf math."""
    tc = bvh.leaf_size
    assert tc % 128 == 0, "VPU leaf math needs leaf_size % 128 == 0"
    assert bvh.w.dtype == jnp.float32, "VPU kernels need a schedule='f32' pack"
    rays, n_tiles, r = _pack_rays(origins, directions, ray_tile)
    t_max = jax.lax.stop_gradient(
        jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))
    )
    t_max = jnp.pad(t_max, (0, n_tiles * ray_tile - r))[None, :]

    kernel = functools.partial(_any_kernel_t, tc, t_min)
    blocked = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            _rays_spec(ray_tile),
            _row_spec(ray_tile),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            _smem_spec(),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            _smem_spec(),  # wanchor
        ],
        out_specs=_row_spec(ray_tile),
        out_shape=jax.ShapeDtypeStruct((1, n_tiles * ray_tile), jnp.int32),
        scratch_shapes=[
            pltpu.SMEM((STACK_DEPTH,), jnp.int32),
            pltpu.VMEM((1, ray_tile), jnp.float32),
        ],
        interpret=interpret,
    )(rays, t_max, bvh.wbox, bvh.wchild, bvh.w, bvh.wanchor)
    return blocked[0, :r] > 0


# ---------------------------------------------------------------------------
# HBM-streaming traversal: scenes past the ~250k-triangle VMEM budget
# ---------------------------------------------------------------------------
#
# The node arrays (wbox/wchild/waxis) are small (~256 B + 36 B per wide node)
# and stay VMEM/SMEM-resident even for multi-million-triangle scenes; only
# the chunked Woop table ``w`` (96 B/triangle) outgrows VMEM.  The streaming
# kernels leave ``w`` in HBM and DMA each visited leaf chunk into one of 8
# VMEM slots.  All live leaf children of a node START their DMAs before the
# first is WAITED on, so up to 8 transfers overlap; the node's slab tests for
# the NEXT stack entry then overlap the tail.  Use a bigger leaf (128+) than
# the VMEM kernels so each DMA moves >= 6 KB.  This replaces OpenRL's
# retained-geometry generality (``rl.h`` rlDrawElements scenes of arbitrary
# size, built behind ``rlRenderFrame``) on TPU terms.


def _closest_stream_kernel(
    tc, t_min, precision,
    rays_ref, wbox_ref, wchild_ref, waxis_ref, w_hbm, wanchor_ref,
    t_ref, id_ref, stack_ref, best_ref, bid_ref, wslots, sems,
):
    rays = rays_ref[...]  # (8, Rt)
    rt = rays.shape[1]
    invx, invy, invz = _tile_inv_dir(rays)
    sx, sy, sz = _tile_axis_signs(rays)
    sub_ids = jax.lax.broadcasted_iota(jnp.int32, (tc, rt), 0)

    best_ref[...] = jnp.full((1, rt), MISS_T, jnp.float32)
    bid_ref[...] = jnp.full((1, rt), -1, jnp.int32)

    def cond(carry):
        return carry[0] >= 0

    def body(carry):
        i, sp = carry
        boxes = wbox_ref[i]
        best_t = best_ref[...]
        ov = _children_slab(boxes, rays, invx, invy, invz, t_min, best_t)
        bits = _overlap_bits(ov)
        axis = waxis_ref[i]
        sign = jnp.where(axis == 0, sx, jnp.where(axis == 1, sy, sz))

        # Phase A: start DMAs for ALL live leaf children (slot k <- child k).
        for k in range(ARITY):
            c = jnp.where(sign, k, ARITY - 1 - k)
            code = wchild_ref[ARITY * i + c]
            live = (((bits >> c) & 1) > 0) & (code <= -2)

            @pl.when(live)
            def _():
                chunk = -2 - code
                pltpu.make_async_copy(
                    w_hbm.at[chunk], wslots.at[k], sems.at[k]
                ).start()

        # Phase B (near -> far): wait + intersect each live leaf.
        for k in range(ARITY):
            c = jnp.where(sign, k, ARITY - 1 - k)
            code = wchild_ref[ARITY * i + c]
            live = (((bits >> c) & 1) > 0) & (code <= -2)

            @pl.when(live)
            def _():
                chunk = -2 - code
                pltpu.make_async_copy(
                    w_hbm.at[chunk], wslots.at[k], sems.at[k]
                ).wait()
                bt = best_ref[...]
                anchor = (
                    wanchor_ref[0, chunk],
                    wanchor_ref[1, chunk],
                    wanchor_ref[2, chunk],
                )
                tm = _pair_hits(
                    rays, wslots[k], tc, t_min, bt, precision, anchor
                )
                col_min = jnp.min(tm, axis=0, keepdims=True)
                tri = jnp.min(
                    jnp.where(tm <= col_min, sub_ids, jnp.int32(2**30)),
                    axis=0,
                    keepdims=True,
                )
                improved = col_min < bt
                bid_ref[...] = jnp.where(
                    improved, chunk * tc + tri, bid_ref[...]
                )
                best_ref[...] = jnp.where(improved, col_min, bt)

        # Phase C (far -> near): push internal children (LIFO -> near pops).
        push = jnp.int32(0)
        for k in range(ARITY):
            c = jnp.where(sign, ARITY - 1 - k, k)
            code = wchild_ref[ARITY * i + c]
            live = (((bits >> c) & 1) > 0) & (code >= 0)

            @pl.when(live)
            def _():
                stack_ref[sp + push] = code

            push = push + jnp.where(live, 1, 0)

        sp = sp + push
        has = sp > 0
        top = stack_ref[jnp.maximum(sp - 1, 0)]
        return jnp.where(has, top, -1), jnp.maximum(sp - 1, 0)

    jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0)))
    t_ref[...] = best_ref[...]
    id_ref[...] = bid_ref[...]


def _any_stream_kernel(
    tc, t_min, precision,
    rays_ref, tmax_ref, wbox_ref, wchild_ref, waxis_ref, w_hbm, wanchor_ref,
    hit_ref, stack_ref, mint_ref, wslots, sems,
):
    rays = rays_ref[...]
    t_max = tmax_ref[...]
    rt = rays.shape[1]
    invx, invy, invz = _tile_inv_dir(rays)

    mint_ref[...] = jnp.full((1, rt), MISS_T, jnp.float32)

    def cond(carry):
        i, sp, alive = carry
        return (i >= 0) & alive

    def body(carry):
        i, sp, _ = carry
        boxes = wbox_ref[i]
        t_far = jnp.where(mint_ref[...] < MISS_T, t_min - 1.0, t_max)
        ov = _children_slab(boxes, rays, invx, invy, invz, t_min, t_far)
        bits = _overlap_bits(ov)

        for k in range(ARITY):
            code = wchild_ref[ARITY * i + k]
            live = (((bits >> k) & 1) > 0) & (code <= -2)

            @pl.when(live)
            def _():
                chunk = -2 - code
                pltpu.make_async_copy(
                    w_hbm.at[chunk], wslots.at[k], sems.at[k]
                ).start()

        push = jnp.int32(0)
        for k in range(ARITY):
            code = wchild_ref[ARITY * i + k]
            hit_live = (((bits >> k) & 1) > 0)
            leaf_live = hit_live & (code <= -2)
            int_live = hit_live & (code >= 0)

            @pl.when(leaf_live)
            def _():
                chunk = -2 - code
                pltpu.make_async_copy(
                    w_hbm.at[chunk], wslots.at[k], sems.at[k]
                ).wait()
                anchor = (
                    wanchor_ref[0, chunk],
                    wanchor_ref[1, chunk],
                    wanchor_ref[2, chunk],
                )
                tm = _pair_hits(
                    rays, wslots[k], tc, t_min, t_max, precision, anchor
                )
                mint_ref[...] = jnp.minimum(
                    mint_ref[...], jnp.min(tm, axis=0, keepdims=True)
                )

            @pl.when(int_live)
            def _():
                stack_ref[sp + push] = code

            push = push + jnp.where(int_live, 1, 0)

        sp = sp + push
        has = sp > 0
        top = stack_ref[jnp.maximum(sp - 1, 0)]
        alive = jnp.any(mint_ref[...] >= MISS_T)
        return jnp.where(has, top, -1), jnp.maximum(sp - 1, 0), alive

    jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.int32(0), jnp.bool_(True))
    )
    hit_ref[...] = (mint_ref[...] < MISS_T).astype(jnp.int32)


def _closest_stream_kernel_t(
    tc, t_min,
    rays_ref, wbox_ref, wchild_ref, waxis_ref, w_hbm, wanchor_ref,
    t_ref, id_ref, stack_ref, best_ref, bid_ref, wslots, sems,
):
    """Streaming closest-hit with TRANSPOSED VPU leaf math: the node walk
    and DMA schedule of ``_closest_stream_kernel``, but each leaf visit
    runs the exact-f32 broadcast pair test (``_pair_hits_t``) instead of
    the K=4 MXU contraction.  Requires ``tc % 128 == 0`` (lane tiles)."""
    rays = rays_ref[...]  # (8, Rt)
    raysT = rays.T
    rt = rays.shape[1]
    invx, invy, invz = _tile_inv_dir(rays)
    sx, sy, sz = _tile_axis_signs(rays)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (rt, tc), 1)

    best_ref[...] = jnp.full((1, rt), MISS_T, jnp.float32)
    bid_ref[...] = jnp.full((1, rt), -1, jnp.int32)

    def cond(carry):
        return carry[0] >= 0

    def body(carry):
        i, sp = carry
        boxes = wbox_ref[i]
        best_t = best_ref[...]
        ov = _children_slab(boxes, rays, invx, invy, invz, t_min, best_t)
        bits = _overlap_bits(ov)
        axis = waxis_ref[i]
        sign = jnp.where(axis == 0, sx, jnp.where(axis == 1, sy, sz))

        # Phase A: start DMAs for ALL live leaf children.
        for k in range(ARITY):
            c = jnp.where(sign, k, ARITY - 1 - k)
            code = wchild_ref[ARITY * i + c]
            live = (((bits >> c) & 1) > 0) & (code <= -2)

            @pl.when(live)
            def _():
                chunk = -2 - code
                pltpu.make_async_copy(
                    w_hbm.at[chunk], wslots.at[k], sems.at[k]
                ).start()

        # Phase B (near -> far): wait + transposed VPU pair test.
        for k in range(ARITY):
            c = jnp.where(sign, k, ARITY - 1 - k)
            code = wchild_ref[ARITY * i + c]
            live = (((bits >> c) & 1) > 0) & (code <= -2)

            @pl.when(live)
            def _():
                chunk = -2 - code
                pltpu.make_async_copy(
                    w_hbm.at[chunk], wslots.at[k], sems.at[k]
                ).wait()
                bt = best_ref[...]  # (1, Rt)
                anchor = (
                    wanchor_ref[0, chunk],
                    wanchor_ref[1, chunk],
                    wanchor_ref[2, chunk],
                )
                tm = _pair_hits_t(raysT, wslots[k], tc, t_min, bt.T, anchor)
                col_min = jnp.min(tm, axis=1, keepdims=True)  # (Rt, 1)
                tri = jnp.min(
                    jnp.where(tm <= col_min, lane_ids, jnp.int32(2**30)),
                    axis=1,
                    keepdims=True,
                )
                row_min = col_min.T
                improved = row_min < bt
                bid_ref[...] = jnp.where(
                    improved, chunk * tc + tri.T, bid_ref[...]
                )
                best_ref[...] = jnp.where(improved, row_min, bt)

        # Phase C (far -> near): push internal children (LIFO pops near).
        push = jnp.int32(0)
        for k in range(ARITY):
            c = jnp.where(sign, ARITY - 1 - k, k)
            code = wchild_ref[ARITY * i + c]
            live = (((bits >> c) & 1) > 0) & (code >= 0)

            @pl.when(live)
            def _():
                stack_ref[sp + push] = code

            push = push + jnp.where(live, 1, 0)

        sp = sp + push
        has = sp > 0
        top = stack_ref[jnp.maximum(sp - 1, 0)]
        return jnp.where(has, top, -1), jnp.maximum(sp - 1, 0)

    jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0)))
    t_ref[...] = best_ref[...]
    id_ref[...] = bid_ref[...]


def _any_stream_kernel_t(
    tc, t_min,
    rays_ref, tmax_ref, wbox_ref, wchild_ref, w_hbm, wanchor_ref,
    hit_ref, stack_ref, mint_ref, wslots, sems,
):
    """Streaming any-hit with transposed VPU leaf math (see closest)."""
    rays = rays_ref[...]
    raysT = rays.T
    t_max = tmax_ref[...]
    t_max_col = t_max.T
    rt = rays.shape[1]
    invx, invy, invz = _tile_inv_dir(rays)

    mint_ref[...] = jnp.full((1, rt), MISS_T, jnp.float32)

    def cond(carry):
        i, sp, alive = carry
        return (i >= 0) & alive

    def body(carry):
        i, sp, _ = carry
        boxes = wbox_ref[i]
        t_far = jnp.where(mint_ref[...] < MISS_T, t_min - 1.0, t_max)
        ov = _children_slab(boxes, rays, invx, invy, invz, t_min, t_far)
        bits = _overlap_bits(ov)

        for k in range(ARITY):
            code = wchild_ref[ARITY * i + k]
            live = (((bits >> k) & 1) > 0) & (code <= -2)

            @pl.when(live)
            def _():
                chunk = -2 - code
                pltpu.make_async_copy(
                    w_hbm.at[chunk], wslots.at[k], sems.at[k]
                ).start()

        push = jnp.int32(0)
        for k in range(ARITY):
            code = wchild_ref[ARITY * i + k]
            hit_live = (((bits >> k) & 1) > 0)
            leaf_live = hit_live & (code <= -2)
            int_live = hit_live & (code >= 0)

            @pl.when(leaf_live)
            def _():
                chunk = -2 - code
                pltpu.make_async_copy(
                    w_hbm.at[chunk], wslots.at[k], sems.at[k]
                ).wait()
                anchor = (
                    wanchor_ref[0, chunk],
                    wanchor_ref[1, chunk],
                    wanchor_ref[2, chunk],
                )
                tm = _pair_hits_t(
                    raysT, wslots[k], tc, t_min, t_max_col, anchor
                )
                mint_ref[...] = jnp.minimum(
                    mint_ref[...], jnp.min(tm, axis=1, keepdims=True).T
                )

            @pl.when(int_live)
            def _():
                stack_ref[sp + push] = code

            push = push + jnp.where(int_live, 1, 0)

        sp = sp + push
        has = sp > 0
        top = stack_ref[jnp.maximum(sp - 1, 0)]
        alive = jnp.any(mint_ref[...] >= MISS_T)
        return jnp.where(has, top, -1), jnp.maximum(sp - 1, 0), alive

    jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.int32(0), jnp.bool_(True))
    )
    hit_ref[...] = (mint_ref[...] < MISS_T).astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("ray_tile", "t_min", "precision", "interpret",
                     "return_slots", "leaf_math"),
)
def intersect_closest_stream(
    bvh: WideBVH,
    origins: Vec3,
    directions: Vec3,
    t_min: float = 1e-4,
    ray_tile: int = RAY_TILE,
    precision=jax.lax.Precision.HIGHEST,
    interpret: bool = False,
    return_slots: bool = False,
    leaf_math: str = "mxu",
):
    """Closest-hit wide-BVH traversal with HBM-resident leaf data.

    ``leaf_math="vpu"`` (needs ``leaf_size % 128 == 0``): exact-f32
    transposed broadcast pair test instead of the MXU contraction."""
    tc = bvh.leaf_size
    assert bvh.w.dtype == jnp.float32, "stream kernels need a schedule='f32' pack"
    rays, n_tiles, r = _pack_rays(origins, directions, ray_tile)

    if leaf_math == "vpu":
        assert tc % 128 == 0, "VPU leaf math needs leaf_size % 128 == 0"
        kernel = functools.partial(_closest_stream_kernel_t, tc, t_min)
    else:
        kernel = functools.partial(
            _closest_stream_kernel, tc, t_min, precision
        )
    best_t, best_slot = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            _rays_spec(ray_tile),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wbox
            _smem_spec(),  # wchild
            _smem_spec(),  # waxis
            pl.BlockSpec(memory_space=pltpu.ANY),  # w stays in HBM
            _smem_spec(),  # wanchor
        ],
        out_specs=(_row_spec(ray_tile), _row_spec(ray_tile)),
        out_shape=(
            jax.ShapeDtypeStruct((1, n_tiles * ray_tile), jnp.float32),
            jax.ShapeDtypeStruct((1, n_tiles * ray_tile), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.SMEM((STACK_DEPTH,), jnp.int32),
            pltpu.VMEM((1, ray_tile), jnp.float32),
            pltpu.VMEM((1, ray_tile), jnp.int32),
            pltpu.VMEM((ARITY, 4, 3 * tc), jnp.float32),
            pltpu.SemaphoreType.DMA((ARITY,)),
        ],
        interpret=interpret,
    )(rays, bvh.wbox, bvh.wchild, bvh.waxis, bvh.w, bvh.wanchor)

    best_t = best_t[0, :r]
    best_slot = best_slot[0, :r]
    hit = best_slot >= 0
    if return_slots:
        return jnp.where(hit, best_t, MISS_T), best_slot, hit
    tri = jnp.take(bvh.slot_tri, jnp.maximum(best_slot, 0))
    tri = jnp.where(hit, tri, -1)
    return jnp.where(hit, best_t, MISS_T), tri, hit


@functools.partial(
    jax.jit,
    static_argnames=("ray_tile", "t_min", "precision", "interpret",
                     "leaf_math"),
)
def intersect_any_stream(
    bvh: WideBVH,
    origins: Vec3,
    directions: Vec3,
    t_min: float = 1e-4,
    t_max=3.0e37,
    ray_tile: int = RAY_TILE,
    precision=jax.lax.Precision.HIGHEST,
    interpret: bool = False,
    leaf_math: str = "mxu",
):
    """Any-hit wide-BVH traversal with HBM-resident leaf data."""
    tc = bvh.leaf_size
    assert bvh.w.dtype == jnp.float32, "stream kernels need a schedule='f32' pack"
    rays, n_tiles, r = _pack_rays(origins, directions, ray_tile)
    t_max = jax.lax.stop_gradient(
        jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))
    )
    t_max = jnp.pad(t_max, (0, n_tiles * ray_tile - r))[None, :]

    if leaf_math == "vpu":
        assert tc % 128 == 0, "VPU leaf math needs leaf_size % 128 == 0"
        kernel = functools.partial(_any_stream_kernel_t, tc, t_min)
        in_specs = [
            _rays_spec(ray_tile),
            _row_spec(ray_tile),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            _smem_spec(),
            pl.BlockSpec(memory_space=pltpu.ANY),
            _smem_spec(),  # wanchor
        ]
        operands = (rays, t_max, bvh.wbox, bvh.wchild, bvh.w, bvh.wanchor)
    else:
        kernel = functools.partial(_any_stream_kernel, tc, t_min, precision)
        in_specs = [
            _rays_spec(ray_tile),
            _row_spec(ray_tile),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            _smem_spec(),
            _smem_spec(),
            pl.BlockSpec(memory_space=pltpu.ANY),
            _smem_spec(),  # wanchor
        ]
        operands = (
            rays, t_max, bvh.wbox, bvh.wchild, bvh.waxis, bvh.w, bvh.wanchor
        )
    blocked = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=_row_spec(ray_tile),
        out_shape=jax.ShapeDtypeStruct((1, n_tiles * ray_tile), jnp.int32),
        scratch_shapes=[
            pltpu.SMEM((STACK_DEPTH,), jnp.int32),
            pltpu.VMEM((1, ray_tile), jnp.float32),
            pltpu.VMEM((ARITY, 4, 3 * tc), jnp.float32),
            pltpu.SemaphoreType.DMA((ARITY,)),
        ],
        interpret=interpret,
    )(*operands)
    return blocked[0, :r] > 0


@functools.partial(
    jax.jit,
    static_argnames=("ray_tile", "t_min", "precision", "interpret",
                     "return_slots"),
)
def intersect_closest_wide(
    bvh: WideBVH,
    origins: Vec3,
    directions: Vec3,
    t_min: float = 1e-4,
    ray_tile: int = RAY_TILE,
    precision=jax.lax.Precision.HIGHEST,
    interpret: bool = False,
    return_slots: bool = False,
):
    """Closest-hit wide-BVH traversal.  Returns (t, id, hit).

    ``return_slots=False``: ids are original triangle ids (resolved through
    ``bvh.slot_tri`` — one extra (R,)-sized gather).  ``return_slots=True``:
    ids are raw chunk-slot ids (``chunk * leaf_size + sub``) for consumers
    holding slot-ordered side tables (the integrator's shade table) — this
    keeps the hot path free of any per-ray id translation."""
    tc = bvh.leaf_size
    rays, n_tiles, r = _pack_rays(origins, directions, ray_tile)

    fused = bvh.w.dtype == jnp.bfloat16
    kernel = functools.partial(_closest_kernel, tc, t_min, precision, fused)
    best_t, best_slot = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            _rays_spec(ray_tile),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wbox
            _smem_spec(),  # wchild
            _smem_spec(),  # waxis
            pl.BlockSpec(memory_space=pltpu.VMEM),  # chunked w
            _smem_spec(),  # wanchor
        ],
        out_specs=(_row_spec(ray_tile), _row_spec(ray_tile)),
        out_shape=(
            jax.ShapeDtypeStruct((1, n_tiles * ray_tile), jnp.float32),
            jax.ShapeDtypeStruct((1, n_tiles * ray_tile), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.SMEM((STACK_DEPTH,), jnp.int32),
            pltpu.VMEM((1, ray_tile), jnp.float32),
            pltpu.VMEM((1, ray_tile), jnp.int32),
        ],
        interpret=interpret,
    )(rays, bvh.wbox, bvh.wchild, bvh.waxis, bvh.w, bvh.wanchor)

    best_t = best_t[0, :r]
    best_slot = best_slot[0, :r]
    hit = best_slot >= 0
    if return_slots:
        return jnp.where(hit, best_t, MISS_T), best_slot, hit
    tri = jnp.take(bvh.slot_tri, jnp.maximum(best_slot, 0))
    tri = jnp.where(hit, tri, -1)
    return jnp.where(hit, best_t, MISS_T), tri, hit


@functools.partial(
    jax.jit, static_argnames=("ray_tile", "t_min", "precision", "interpret")
)
def intersect_any_wide(
    bvh: WideBVH,
    origins: Vec3,
    directions: Vec3,
    t_min: float = 1e-4,
    t_max=3.0e37,
    ray_tile: int = RAY_TILE,
    precision=jax.lax.Precision.HIGHEST,
    interpret: bool = False,
):
    """Any-hit (occlusion) wide-BVH traversal; returns (R,) blocked mask."""
    tc = bvh.leaf_size
    rays, n_tiles, r = _pack_rays(origins, directions, ray_tile)
    # Occlusion is piecewise-constant; visibility gradients are detached.
    t_max = jax.lax.stop_gradient(
        jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))
    )
    t_max = jnp.pad(t_max, (0, n_tiles * ray_tile - r))[None, :]

    fused = bvh.w.dtype == jnp.bfloat16
    kernel = functools.partial(_any_kernel, tc, t_min, precision, fused)
    blocked = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            _rays_spec(ray_tile),
            _row_spec(ray_tile),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            _smem_spec(),
            _smem_spec(),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            _smem_spec(),  # wanchor
        ],
        out_specs=_row_spec(ray_tile),
        out_shape=jax.ShapeDtypeStruct((1, n_tiles * ray_tile), jnp.int32),
        scratch_shapes=[
            pltpu.SMEM((STACK_DEPTH,), jnp.int32),
            pltpu.VMEM((1, ray_tile), jnp.float32),
        ],
        interpret=interpret,
    )(rays, t_max, bvh.wbox, bvh.wchild, bvh.waxis, bvh.w, bvh.wanchor)
    return blocked[0, :r] > 0
