"""Round-5b probe: WHY is per-visit cost 5x higher in divergent tiles?

Same shapes, same pair test, but sorted-d2 tiles pay ~0.4 us/leaf-visit vs
~0.08 us for primary tiles.  Candidate explanations: pl.when branch
overhead (16 conditional regions per node iteration), scalar/vector
sync latency on the vector-derived `bits`, or the argmin id-select chain.
This probe times kernel VARIANTS on the REAL sorted-d2 wavefront:

  v0 baseline     : current kernel
  v1 always-leaf  : pair tests run unconditionally for every leaf child
                    (no pl.when around leaf visits; masked update instead)
  v2 leaf-queue   : branchless leaf collection into an SMEM queue + a
                    drain loop of unconditional pair tests (2 branches
                    per node iter instead of 16)
  v3 no-argmin    : baseline minus the triangle-id masked-min select

Usage: python tpu_kernel_variants_probe.py
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/heatray_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from heatray_tpu.camera import orbit_camera
from heatray_tpu.options import RenderOptions
from heatray_tpu.render.integrator import generate_primary_rays, make_context
from heatray_tpu.ops.intersect_pallas import (
    MISS_T,
    _pack_rays,
    _pair_hits_fused,
    _rays_spec,
    _row_spec,
    _split3,
    _tile_inv_dir,
)
from heatray_tpu.ops.wide_bvh import (
    ARITY,
    STACK_DEPTH,
    _children_slab,
    _overlap_bits,
    _smem_spec,
    _tile_axis_signs,
)
from heatray_tpu.scene.builtin import cornell_box
from heatray_tpu.vec import Vec3

W, H, DEPTH = 1920, 1080, 4
R = W * H

options = RenderOptions(width=W, height=H, max_render_passes=8, max_ray_depth=DEPTH)
scene = cornell_box(light="both", with_spheres=True)
camera = orbit_camera(W, H, distance=6.2, focal_length_mm=35.0)
ctx = make_context(options, scene)
pack = ctx.accel_pack
eps = options.ray_epsilon

src = open("tpu_sorted_visit_probe.py").read()
cut = src.index('print(f"chunks=')
ns = {"__name__": "_svp_lib", "__file__": "tpu_sorted_visit_probe.py"}
exec(compile(src[:cut], "tpu_sorted_visit_probe.py", "exec"), ns)
one_bounce, sort_rays = ns["one_bounce"], ns["sort_rays"]

org, dirn, seq_id, seq_off = jax.jit(
    lambda: generate_primary_rays(camera, ctx.tables, options, 2)
)()
weight = Vec3.ones((R,))
env_on_miss = jnp.ones((R,), bool)
active = jnp.ones((R,), bool)
o2, d2w, w2, e2, a2 = one_bounce(
    org, dirn, weight, env_on_miss, active, jnp.int32(1), 2, seq_id, seq_off
)
s_o, s_d, s_act = sort_rays(o2, d2w, a2)
jax.block_until_ready(s_o.x)


def make_kernel_v7(tc, t_min, batch):
    """Like v6 (leaf queue + batched drain) but with UNANCHORED f32
    component operands and Precision.HIGHEST dots: exact products need no
    per-chunk anchor, so one absolute-coordinate B operand (4, 2Rt) serves
    every chunk, and the batched tail runs on (B*tc, Rt) blocks.  The MXU
    pays ~6 passes instead of 1, but the kernel is TAIL-bound (~25-cycle
    per-op overhead at (tc, Rt) shapes), so batching the tail wins."""

    def kernel(rays_ref, wbox_ref, wchild_ref, waxis_ref, wb1_ref, wb2_ref,
               ws_ref, t_ref, id_ref, stack_ref, lq_ref, best_ref, bid_ref):
        rays = rays_ref[...]
        rt = rays.shape[1]
        invx, invy, invz = _tile_inv_dir(rays)
        sx, sy, sz = _tile_axis_signs(rays)
        B = batch
        o4 = rays[0:4, :]
        d4 = rays[4:8, :]

        from heatray_tpu.ops.intersect_pallas import _recip_fast, _BARY_EPS

        def drain_batch(qs):
            wb1 = jnp.concatenate([wb1_ref[q] for q in qs], axis=1)
            wb2 = jnp.concatenate([wb2_ref[q] for q in qs], axis=1)
            wss = jnp.concatenate([ws_ref[q] for q in qs], axis=1)
            dims = (((0,), (0,)), ((), ()))
            hp = jax.lax.Precision.HIGHEST
            dot = functools.partial(
                jax.lax.dot_general, dimension_numbers=dims, precision=hp,
                preferred_element_type=jnp.float32,
            )
            ob1, db1 = dot(wb1, o4), dot(wb1, d4)
            ob2, db2 = dot(wb2, o4), dot(wb2, d4)
            os_, ds = dot(wss, o4), dot(wss, d4)
            t = -os_ * _recip_fast(ds)
            b1 = ob1 + t * db1
            b2 = ob2 + t * db2
            bt = best_ref[...]
            valid = (
                (b1 >= -_BARY_EPS)
                & (b2 >= -_BARY_EPS)
                & (b1 + b2 <= 1.0 + _BARY_EPS)
                & (t > t_min)
                & (t < bt)
            )
            tm = jnp.where(valid, t, MISS_T)
            col_min = jnp.min(tm, axis=0, keepdims=True)
            sub = jax.lax.broadcasted_iota(jnp.int32, (tc, 1), 0)
            rowval = jnp.concatenate([q * tc + sub for q in qs], axis=0)
            tri = jnp.min(
                jnp.where(tm <= col_min, rowval, jnp.int32(2**30)),
                axis=0, keepdims=True,
            )
            improved = col_min < bt
            bid_ref[...] = jnp.where(improved, tri, bid_ref[...])
            best_ref[...] = jnp.where(improved, col_min, bt)

        best_ref[...] = jnp.full((1, rt), MISS_T, jnp.float32)
        bid_ref[...] = jnp.full((1, rt), -1, jnp.int32)

        def cond(carry):
            return carry[0] >= 0

        def body(carry):
            i, sp, nl = carry
            boxes = wbox_ref[i]
            best_t = best_ref[...]
            ov = _children_slab(boxes, rays, invx, invy, invz, t_min, best_t)
            bits = _overlap_bits(ov)
            axis = waxis_ref[i]
            sign = jnp.where(axis == 0, sx, jnp.where(axis == 1, sy, sz))

            for k in range(ARITY):
                c = jnp.where(sign, k, ARITY - 1 - k)
                code = wchild_ref[ARITY * i + c]
                live = (((bits >> c) & 1) > 0) & (code <= -2)
                lq_ref[nl] = jnp.where(live, -2 - code, lq_ref[nl])
                nl = nl + jnp.where(live, 1, 0)

            def drain_cond(nl):
                return nl >= B

            def drain_body(nl):
                drain_batch([lq_ref[nl - B + j] for j in range(B)])
                return nl - B

            nl = jax.lax.while_loop(drain_cond, drain_body, nl)

            push = jnp.int32(0)
            for k in range(ARITY):
                c = jnp.where(sign, ARITY - 1 - k, k)
                code = wchild_ref[ARITY * i + c]
                live = (((bits >> c) & 1) > 0) & (code >= 0)
                stack_ref[sp + push] = jnp.where(
                    live, code, stack_ref[sp + push]
                )
                push = push + jnp.where(live, 1, 0)

            sp = sp + push
            has = sp > 0
            top = stack_ref[jnp.maximum(sp - 1, 0)]
            return jnp.where(has, top, -1), jnp.maximum(sp - 1, 0), nl

        _, _, nl = jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.int32(0), jnp.int32(0))
        )

        @pl.when(nl > 0)
        def _():
            drain_batch([lq_ref[jnp.where(j < nl, j, 0)] for j in range(B)])

        t_ref[...] = best_ref[...]
        id_ref[...] = bid_ref[...]

    return kernel


def make_kernel_v8(tc, t_min, batch):
    """Leaf queue + drain of ``batch`` INDEPENDENT anchored pair tests
    (identical math to v0), merged once: if per-visit cost is dependency
    latency (not issue throughput), the interleaved chains hide it."""

    def kernel(rays_ref, wbox_ref, wchild_ref, waxis_ref, w_ref, wanchor_ref,
               t_ref, id_ref, stack_ref, lq_ref, best_ref, bid_ref):
        rays = rays_ref[...]
        rt = rays.shape[1]
        invx, invy, invz = _tile_inv_dir(rays)
        sx, sy, sz = _tile_axis_signs(rays)
        d12 = _split3(rays[4:8, :])
        B = batch
        sub_ids1 = jax.lax.broadcasted_iota(jnp.int32, (tc, rt), 0)

        def pair(chunk, bound):
            anchor = (
                wanchor_ref[0, chunk],
                wanchor_ref[1, chunk],
                wanchor_ref[2, chunk],
            )
            return _pair_hits_fused(rays, d12, w_ref[chunk], tc, t_min,
                                    bound, anchor)

        def drain_batch(qs):
            bt = best_ref[...]
            # B independent pair tests against the same bound ...
            tms = [pair(q, bt) for q in qs]
            # ... merged pairwise: per-chunk (col_min, slot) then tree-min.
            cand = []
            for q, tm in zip(qs, tms):
                cm = jnp.min(tm, axis=0, keepdims=True)
                tri = jnp.min(
                    jnp.where(tm <= cm, sub_ids1, jnp.int32(2**30)),
                    axis=0, keepdims=True,
                )
                cand.append((cm, q * tc + tri))
            while len(cand) > 1:
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
            boxes = wbox_ref[i]
            best_t = best_ref[...]
            ov = _children_slab(boxes, rays, invx, invy, invz, t_min, best_t)
            bits = _overlap_bits(ov)
            axis = waxis_ref[i]
            sign = jnp.where(axis == 0, sx, jnp.where(axis == 1, sy, sz))

            for k in range(ARITY):
                c = jnp.where(sign, k, ARITY - 1 - k)
                code = wchild_ref[ARITY * i + c]
                live = (((bits >> c) & 1) > 0) & (code <= -2)
                lq_ref[nl] = jnp.where(live, -2 - code, lq_ref[nl])
                nl = nl + jnp.where(live, 1, 0)

            def drain_cond(nl):
                return nl >= B

            def drain_body(nl):
                drain_batch([lq_ref[nl - B + j] for j in range(B)])
                return nl - B

            nl = jax.lax.while_loop(drain_cond, drain_body, nl)

            push = jnp.int32(0)
            for k in range(ARITY):
                c = jnp.where(sign, ARITY - 1 - k, k)
                code = wchild_ref[ARITY * i + c]
                live = (((bits >> c) & 1) > 0) & (code >= 0)
                stack_ref[sp + push] = jnp.where(
                    live, code, stack_ref[sp + push]
                )
                push = push + jnp.where(live, 1, 0)

            sp = sp + push
            has = sp > 0
            top = stack_ref[jnp.maximum(sp - 1, 0)]
            return jnp.where(has, top, -1), jnp.maximum(sp - 1, 0), nl

        _, _, nl = jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.int32(0), jnp.int32(0))
        )

        @pl.when(nl > 0)
        def _():
            drain_batch([lq_ref[jnp.where(j < nl, j, 0)] for j in range(B)])

        t_ref[...] = best_ref[...]
        id_ref[...] = bid_ref[...]

    return kernel


def make_kernel_v6(tc, t_min, batch):
    """Leaf-queue + BATCHED drain: collect live leaf chunks in SMEM during
    the node walk; every ``batch`` entries, run ONE pair test over the
    batch with component-blocked operands — vector ops get ``batch``x
    longer, amortizing the ~25-cycle per-op overhead that dominates at
    (tc, rt) shapes.  Uses a per-TILE anchor (origin centroid) instead of
    per-chunk anchors so one pre-split B operand serves every chunk."""

    def kernel(rays_ref, wbox_ref, wchild_ref, waxis_ref, wb1_ref, wb2_ref,
               ws_ref, t_ref, id_ref, stack_ref, lq_ref, best_ref, bid_ref):
        rays = rays_ref[...]
        rt = rays.shape[1]
        invx, invy, invz = _tile_inv_dir(rays)
        sx, sy, sz = _tile_axis_signs(rays)
        B = batch

        # Per-tile anchor: origin centroid (sorted tiles have tight
        # origin clusters, so products stay proportional to local scale).
        ax = jnp.sum(rays[0:1, :]) / rt
        ay = jnp.sum(rays[1:2, :]) / rt
        az = jnp.sum(rays[2:3, :]) / rt
        o_feat = jnp.concatenate(
            [rays[0:1, :] - ax, rays[1:2, :] - ay, rays[2:3, :] - az,
             rays[3:4, :]],
            axis=0,
        )
        bmat = jnp.concatenate([_split3(o_feat), _split3(rays[4:8, :])],
                               axis=1)  # (12, 2Rt), built once per tile
        # Runtime w3-correction for the tile anchor: the build folded NO
        # anchor, so w3 is w3_raw; the anchored product needs
        # W^T (o - a) = W^T o - (a . w012 columns) — fold the scalar shift
        # into the o12 "1" feature instead: the w3 row of each component
        # already multiplies o_feat[3] = 1, and the a-shift entered o_feat
        # directly above, so no correction is needed.

        def drain_batch(qs, live_rows):
            """One batched pair test over chunks qs (list of B scalars).
            ``live_rows``: number of real entries (scalar); padded entries
            repeat qs[0] (duplicate visits are idempotent for min)."""
            wb1 = jnp.concatenate([wb1_ref[q] for q in qs], axis=1)
            wb2 = jnp.concatenate([wb2_ref[q] for q in qs], axis=1)
            wss = jnp.concatenate([ws_ref[q] for q in qs], axis=1)
            dims = (((0,), (0,)), ((), ()))
            p1 = jax.lax.dot_general(wb1, bmat, dims,
                                     preferred_element_type=jnp.float32)
            p2 = jax.lax.dot_general(wb2, bmat, dims,
                                     preferred_element_type=jnp.float32)
            ps = jax.lax.dot_general(wss, bmat, dims,
                                     preferred_element_type=jnp.float32)
            ob1, db1 = p1[:, :rt], p1[:, rt:]
            ob2, db2 = p2[:, :rt], p2[:, rt:]
            os_, ds = ps[:, :rt], ps[:, rt:]
            from heatray_tpu.ops.intersect_pallas import _recip_fast, _BARY_EPS
            t = -os_ * _recip_fast(ds)
            b1 = ob1 + t * db1
            b2 = ob2 + t * db2
            bt = best_ref[...]
            valid = (
                (b1 >= -_BARY_EPS)
                & (b2 >= -_BARY_EPS)
                & (b1 + b2 <= 1.0 + _BARY_EPS)
                & (t > t_min)
                & (t < bt)
            )
            tm = jnp.where(valid, t, MISS_T)
            col_min = jnp.min(tm, axis=0, keepdims=True)
            # Row -> slot id map, built from the batch's scalar chunk ids.
            sub = jax.lax.broadcasted_iota(jnp.int32, (tc, 1), 0)
            rowval = jnp.concatenate(
                [q * tc + sub for q in qs], axis=0
            )  # (B*tc, 1)
            tri = jnp.min(
                jnp.where(tm <= col_min, rowval, jnp.int32(2**30)),
                axis=0, keepdims=True,
            )
            improved = col_min < bt
            bid_ref[...] = jnp.where(improved, tri, bid_ref[...])
            best_ref[...] = jnp.where(improved, col_min, bt)

        best_ref[...] = jnp.full((1, rt), MISS_T, jnp.float32)
        bid_ref[...] = jnp.full((1, rt), -1, jnp.int32)

        def cond(carry):
            return carry[0] >= 0

        def body(carry):
            i, sp, nl = carry
            boxes = wbox_ref[i]
            best_t = best_ref[...]
            ov = _children_slab(boxes, rays, invx, invy, invz, t_min, best_t)
            bits = _overlap_bits(ov)
            axis = waxis_ref[i]
            sign = jnp.where(axis == 0, sx, jnp.where(axis == 1, sy, sz))

            # Leaf children -> queue (branchless conditional store).
            for k in range(ARITY):
                c = jnp.where(sign, k, ARITY - 1 - k)
                code = wchild_ref[ARITY * i + c]
                live = (((bits >> c) & 1) > 0) & (code <= -2)
                lq_ref[nl] = jnp.where(live, -2 - code, lq_ref[nl])
                nl = nl + jnp.where(live, 1, 0)

            # Drain full batches.
            def drain_cond(nl):
                return nl >= B

            def drain_body(nl):
                qs = [lq_ref[nl - B + j] for j in range(B)]
                drain_batch(qs, B)
                return nl - B

            nl = jax.lax.while_loop(drain_cond, drain_body, nl)

            push = jnp.int32(0)
            for k in range(ARITY):
                c = jnp.where(sign, ARITY - 1 - k, k)
                code = wchild_ref[ARITY * i + c]
                live = (((bits >> c) & 1) > 0) & (code >= 0)
                stack_ref[sp + push] = jnp.where(
                    live, code, stack_ref[sp + push]
                )
                push = push + jnp.where(live, 1, 0)

            sp = sp + push
            has = sp > 0
            top = stack_ref[jnp.maximum(sp - 1, 0)]
            return jnp.where(has, top, -1), jnp.maximum(sp - 1, 0), nl

        _, _, nl = jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.int32(0), jnp.int32(0))
        )

        # Final partial batch (pad with lq[0]; duplicates are idempotent).
        @pl.when(nl > 0)
        def _():
            qs = [
                lq_ref[jnp.where(j < nl, j, 0)] for j in range(B)
            ]
            drain_batch(qs, nl)

        t_ref[...] = best_ref[...]
        id_ref[...] = bid_ref[...]

    return kernel


def make_kernel(variant, tc, t_min, group=128):
    def kernel(rays_ref, wbox_ref, wchild_ref, waxis_ref, w_ref, wanchor_ref,
               t_ref, id_ref, stack_ref, lq_ref, best_ref, bid_ref):
        rays = rays_ref[...]
        rt = rays.shape[1]
        invx, invy, invz = _tile_inv_dir(rays)
        sx, sy, sz = _tile_axis_signs(rays)
        sub_ids = jax.lax.broadcasted_iota(jnp.int32, (tc, rt), 0)
        d12 = _split3(rays[4:8, :])
        G = rt // group  # lane groups per tile (grouped variants)

        def pair(chunk, bound):
            anchor = (
                wanchor_ref[0, chunk],
                wanchor_ref[1, chunk],
                wanchor_ref[2, chunk],
            )
            return _pair_hits_fused(rays, d12, w_ref[chunk], tc, t_min,
                                    bound, anchor)

        def leaf_update(chunk, live_mask):
            bt = best_ref[...]
            tm = pair(chunk, bt)
            col_min = jnp.min(tm, axis=0, keepdims=True)
            if variant != "v3":
                tri = jnp.min(
                    jnp.where(tm <= col_min, sub_ids, jnp.int32(2**30)),
                    axis=0, keepdims=True,
                )
            improved = col_min < bt
            if live_mask is not None:
                improved = improved & live_mask
            if variant != "v3":
                bid_ref[...] = jnp.where(improved, chunk * tc + tri,
                                         bid_ref[...])
            best_ref[...] = jnp.where(improved, col_min, bt)

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

            if variant in ("v4", "v5"):
                # Grouped leaf visits: per-(child, group) overlap packed
                # into two scalars (children 0-3 / 4-7, G bits per child),
                # then pair tests run per lane GROUP — the sort leaves the
                # ~10% of lanes that need a chunk contiguous, so most
                # groups of most visits skip.
                gbits = [
                    _overlap_bits(ov[:, g * group : (g + 1) * group])
                    for g in range(G)
                ]  # per-group child bitmasks (G scalars)
                for k in range(ARITY):
                    c = jnp.where(sign, k, ARITY - 1 - k)
                    code = wchild_ref[ARITY * i + c]
                    is_leaf = code <= -2

                    for g in range(G):
                        glive = (((gbits[g] >> c) & 1) > 0) & is_leaf

                        @pl.when(glive)
                        def _(g=g):
                            chunk = -2 - code
                            sl = slice(g * group, (g + 1) * group)
                            anchor = (
                                wanchor_ref[0, chunk],
                                wanchor_ref[1, chunk],
                                wanchor_ref[2, chunk],
                            )
                            bt = best_ref[:, sl]
                            tm = _pair_hits_fused(
                                rays[:, sl], d12[:, sl], w_ref[chunk],
                                tc, t_min, bt, anchor,
                            )
                            col_min = jnp.min(tm, axis=0, keepdims=True)
                            # NOTE: slicing a 2D broadcasted_iota on lanes
                            # crashes Mosaic; the sublane iota is group-
                            # independent, so build it per group.
                            sub_g = jax.lax.broadcasted_iota(
                                jnp.int32, (tc, group), 0
                            )
                            tri = jnp.min(
                                jnp.where(tm <= col_min, sub_g,
                                          jnp.int32(2**30)),
                                axis=0, keepdims=True,
                            )
                            improved = col_min < bt
                            bid_ref[:, sl] = jnp.where(
                                improved, chunk * tc + tri, bid_ref[:, sl]
                            )
                            best_ref[:, sl] = jnp.where(improved, col_min, bt)

            elif variant == "v1":
                # Unconditional pair tests for every leaf child.
                for k in range(ARITY):
                    c = jnp.where(sign, k, ARITY - 1 - k)
                    code = wchild_ref[ARITY * i + c]
                    live = (((bits >> c) & 1) > 0) & (code <= -2)
                    chunk = jnp.maximum(-2 - code, 0)
                    leaf_update(chunk, jnp.full((1, rt), live))
            elif variant == "v2":
                # Branchless leaf-queue collection + drain.
                nl = jnp.int32(0)
                for k in range(ARITY):
                    c = jnp.where(sign, k, ARITY - 1 - k)
                    code = wchild_ref[ARITY * i + c]
                    live = (((bits >> c) & 1) > 0) & (code <= -2)
                    lq_ref[nl] = -2 - code
                    nl = nl + jnp.where(live, 1, 0)

                def drain(j, _):
                    leaf_update(lq_ref[j], None)
                    return 0

                jax.lax.fori_loop(0, nl, drain, 0)
            else:  # v0 / v3
                for k in range(ARITY):
                    c = jnp.where(sign, k, ARITY - 1 - k)
                    code = wchild_ref[ARITY * i + c]
                    live = (((bits >> c) & 1) > 0) & (code <= -2)

                    @pl.when(live)
                    def _():
                        leaf_update(-2 - code, None)

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
            return jnp.where(has, top, -1), jnp.maximum(sp - 1, 0)

        jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0)))
        t_ref[...] = best_ref[...]
        id_ref[...] = bid_ref[...]

    return kernel


@functools.partial(jax.jit, static_argnames=("variant", "ray_tile", "group"))
def run_variant(bvh, origins, directions, variant="v0", ray_tile=512,
                group=128):
    tc = bvh.leaf_size
    rays, n_tiles, r = _pack_rays(origins, directions, ray_tile)
    kernel = make_kernel(variant, tc, 1e-4, group=group)
    best_t, best_slot = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            _rays_spec(ray_tile),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            _smem_spec(),
            _smem_spec(),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            _smem_spec(),
        ],
        out_specs=(_row_spec(ray_tile), _row_spec(ray_tile)),
        out_shape=(
            jax.ShapeDtypeStruct((1, n_tiles * ray_tile), jnp.float32),
            jax.ShapeDtypeStruct((1, n_tiles * ray_tile), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.SMEM((STACK_DEPTH,), jnp.int32),
            pltpu.SMEM((ARITY,), jnp.int32),
            pltpu.VMEM((1, ray_tile), jnp.float32),
            pltpu.VMEM((1, ray_tile), jnp.int32),
        ],
    )(rays, bvh.wbox, bvh.wchild, bvh.waxis, bvh.w, bvh.wanchor)
    return best_t[0, :r], best_slot[0, :r]


# --- v6: component-blocked UNANCHORED fused pack -------------------------
import ml_dtypes

_tc = pack.wide.leaf_size
_C = pack.wide.num_chunks
_slot_tri = np.asarray(pack.wide.slot_tri)
_w_host = np.asarray(pack.accel.w).astype(np.float64)
_validm = (_slot_tri >= 0).astype(np.float64)
_w = np.take(_w_host, np.maximum(_slot_tri, 0), axis=1) * _validm[None, :]
_w = _w.reshape(12, _C, _tc).transpose(1, 0, 2)  # (C, 12, Tc)
_w = _w.reshape(_C, 3, 4, _tc).transpose(0, 2, 1, 3).reshape(_C, 4, 3 * _tc)
_w = _w.astype(np.float32)
_bf = ml_dtypes.bfloat16
_w_hi = _w.astype(_bf)
_w_lo = (_w - _w_hi.astype(np.float32)).astype(_bf)
_wf = np.concatenate([_w_hi, _w_hi, _w_lo], axis=1)  # (C, 12, 3Tc)
WB1 = jnp.asarray(np.ascontiguousarray(_wf[:, :, :_tc]))
WB2 = jnp.asarray(np.ascontiguousarray(_wf[:, :, _tc : 2 * _tc]))
WS = jnp.asarray(np.ascontiguousarray(_wf[:, :, 2 * _tc :]))
# f32 component arrays for v7 (unanchored, 4 coefficient rows).
WB1F = jnp.asarray(np.ascontiguousarray(_w[:, :, :_tc]))
WB2F = jnp.asarray(np.ascontiguousarray(_w[:, :, _tc : 2 * _tc]))
WSF = jnp.asarray(np.ascontiguousarray(_w[:, :, 2 * _tc :]))


@functools.partial(jax.jit, static_argnames=("ray_tile", "batch"))
def run_v7(bvh, wb1, wb2, wss, origins, directions, ray_tile=512, batch=4):
    tc = bvh.leaf_size
    rays, n_tiles, r = _pack_rays(origins, directions, ray_tile)
    kernel = make_kernel_v7(tc, 1e-4, batch)
    best_t, best_slot = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            _rays_spec(ray_tile),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            _smem_spec(),
            _smem_spec(),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(_row_spec(ray_tile), _row_spec(ray_tile)),
        out_shape=(
            jax.ShapeDtypeStruct((1, n_tiles * ray_tile), jnp.float32),
            jax.ShapeDtypeStruct((1, n_tiles * ray_tile), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.SMEM((STACK_DEPTH,), jnp.int32),
            pltpu.SMEM((64,), jnp.int32),
            pltpu.VMEM((1, ray_tile), jnp.float32),
            pltpu.VMEM((1, ray_tile), jnp.int32),
        ],
    )(rays, bvh.wbox, bvh.wchild, bvh.waxis, wb1, wb2, wss)
    return best_t[0, :r], best_slot[0, :r]


@functools.partial(jax.jit, static_argnames=("ray_tile", "batch"))
def run_v6(bvh, wb1, wb2, wss, origins, directions, ray_tile=512, batch=4):
    tc = bvh.leaf_size
    rays, n_tiles, r = _pack_rays(origins, directions, ray_tile)
    kernel = make_kernel_v6(tc, 1e-4, batch)
    best_t, best_slot = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            _rays_spec(ray_tile),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            _smem_spec(),
            _smem_spec(),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(_row_spec(ray_tile), _row_spec(ray_tile)),
        out_shape=(
            jax.ShapeDtypeStruct((1, n_tiles * ray_tile), jnp.float32),
            jax.ShapeDtypeStruct((1, n_tiles * ray_tile), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.SMEM((STACK_DEPTH,), jnp.int32),
            pltpu.SMEM((64,), jnp.int32),
            pltpu.VMEM((1, ray_tile), jnp.float32),
            pltpu.VMEM((1, ray_tile), jnp.int32),
        ],
    )(rays, bvh.wbox, bvh.wchild, bvh.waxis, wb1, wb2, wss)
    return best_t[0, :r], best_slot[0, :r]


# Correctness reference
t0, s0 = map(np.asarray, run_variant(pack.wide, s_o, s_d, variant="v0"))

import os

cases = [("v8b8", 512, 8), ("v8b8", 1024, 8),
         ("v8b16", 512, 16), ("v8b16", 1024, 16),
         ("v8b8", 2048, 8), ("v8b16", 2048, 16)]
if os.environ.get("VARIANTS"):
    names = os.environ["VARIANTS"].split(",")
    cases = [("v0", 512, 128)] + [
        (v, rt, g) for v in names for rt, g in ((512, 128), (1024, 128))
    ]


@functools.partial(jax.jit, static_argnames=("ray_tile", "batch"))
def run_v8(bvh, origins, directions, ray_tile=512, batch=4):
    tc = bvh.leaf_size
    rays, n_tiles, r = _pack_rays(origins, directions, ray_tile)
    kernel = make_kernel_v8(tc, 1e-4, batch)
    best_t, best_slot = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            _rays_spec(ray_tile),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            _smem_spec(),
            _smem_spec(),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            _smem_spec(),
        ],
        out_specs=(_row_spec(ray_tile), _row_spec(ray_tile)),
        out_shape=(
            jax.ShapeDtypeStruct((1, n_tiles * ray_tile), jnp.float32),
            jax.ShapeDtypeStruct((1, n_tiles * ray_tile), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.SMEM((STACK_DEPTH,), jnp.int32),
            pltpu.SMEM((64,), jnp.int32),
            pltpu.VMEM((1, ray_tile), jnp.float32),
            pltpu.VMEM((1, ray_tile), jnp.int32),
        ],
    )(rays, bvh.wbox, bvh.wchild, bvh.waxis, bvh.w, bvh.wanchor)
    return best_t[0, :r], best_slot[0, :r]


def call(variant, rt, group, o):
    if variant.startswith("v8"):
        return run_v8(pack.wide, o, s_d, ray_tile=rt, batch=group)
    if variant.startswith("v7"):
        return run_v7(pack.wide, WB1F, WB2F, WSF, o, s_d, ray_tile=rt,
                      batch=group)
    if variant.startswith("v6"):
        return run_v6(pack.wide, WB1, WB2, WS, o, s_d, ray_tile=rt,
                      batch=group)
    return run_variant(pack.wide, o, s_d, variant=variant, ray_tile=rt,
                       group=group)


for variant, rt, group in cases:
    tv, sv = call(variant, rt, group, s_o)
    tv.block_until_ready()

    def run_n(n):
        tt0 = time.perf_counter()
        o = s_o
        for i in range(n):
            tv, sv = call(variant, rt, group,
                          Vec3(o.x + (0.0 * i), o.y, o.z))
        tv.block_until_ready()
        np.asarray(tv[:8])
        return time.perf_counter() - tt0

    run_n(1)
    t_a, t_b = run_n(4), run_n(12)
    ms = (t_b - t_a) / 8 * 1e3
    ok = ""
    if variant != "v0":
        tvn, svn = np.asarray(tv), np.asarray(sv)
        near = np.isclose(tvn, t0, rtol=1e-4, atol=1e-5)
        ok = (f" match_t={near.mean():.4f}"
              f" match_id={(svn == s0).mean():.4f}")
    print(f"{variant} rt={rt} b/g={group}: {ms:6.1f} ms{ok}",
          file=sys.stderr, flush=True)
