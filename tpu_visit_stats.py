"""Traversal visit statistics on REAL bounce wavefronts.

Instrumented copy of the wide-BVH closest kernel that counts, per ray tile:
node visits, leaf visits, and the mean fraction of lanes that actually
overlap each visited leaf.  Answers: how much leaf work is tile-shared
redundancy (one stray lane dragging 255 others through a chunk) vs real
per-lane work — the number that decides whether finer descend granularity
or per-lane traversal is worth building.

Usage: python tpu_visit_stats.py
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
from heatray_tpu.render.integrator import (
    _offset_origin,
    _park_dead,
    generate_primary_rays,
    make_context,
)
from heatray_tpu.render.shade import shade_hits
from heatray_tpu.render.shade_table import GEO_N, HitRows, hit_attributes_rows
from heatray_tpu.ops.intersect_pallas import (
    MISS_T,
    _pack_rays,
    _pair_hits,
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
    _tile_axis_signs,
    intersect_closest_wide,
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


def _stats_kernel(
    tc, t_min, seed_k,
    rays_ref, wbox_ref, wchild_ref, waxis_ref, w_ref, wanchor_ref,
    seed_ref, seed_anchor_ref,
    stats_ref,
    stack_ref, best_ref, acc_ref,
):
    rays = rays_ref[...]
    rt = rays.shape[1]
    invx, invy, invz = _tile_inv_dir(rays)
    sx, sy, sz = _tile_axis_signs(rays)
    d12 = _split3(rays[4:8, :])  # fused-schedule direction split

    best_ref[...] = jnp.full((1, rt), MISS_T, jnp.float32)
    if seed_k:
        # Horizon seeding: one pair test against the K largest triangles
        # tightens most lanes' best_t before the walk starts.
        anchor = (seed_anchor_ref[0], seed_anchor_ref[1], seed_anchor_ref[2])
        tm = _pair_hits(
            rays, seed_ref[...], seed_k, t_min, best_ref[...],
            "bf16x3", anchor,
        )
        best_ref[...] = jnp.minimum(
            best_ref[...], jnp.min(tm, axis=0, keepdims=True)
        )
    acc_ref[0] = 0.0  # node visits
    acc_ref[1] = 0.0  # leaf visits
    acc_ref[2] = 0.0  # sum of per-leaf overlap fractions
    acc_ref[3] = 0.0  # improving visits

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
        acc_ref[0] = acc_ref[0] + 1.0

        for k in range(ARITY):
            c = jnp.where(sign, k, ARITY - 1 - k)
            code = wchild_ref[ARITY * i + c]
            live = (((bits >> c) & 1) > 0) & (code <= -2)

            @pl.when(live)
            def _():
                chunk = -2 - code
                bt = best_ref[...]
                anchor = (
                    wanchor_ref[0, chunk],
                    wanchor_ref[1, chunk],
                    wanchor_ref[2, chunk],
                )
                tm = _pair_hits_fused(
                    rays, d12, w_ref[chunk], tc, t_min, bt, anchor
                )
                col_min = jnp.min(tm, axis=0, keepdims=True)
                best_ref[...] = jnp.minimum(col_min, bt)
                acc_ref[1] = acc_ref[1] + 1.0
                acc_ref[3] = acc_ref[3] + jnp.where(
                    jnp.any(col_min < bt), 1.0, 0.0
                )
                row_c = jnp.sum(
                    jnp.where(
                        jax.lax.broadcasted_iota(jnp.int32, ov.shape, 0) == c,
                        ov.astype(jnp.float32), 0.0,
                    )
                )
                acc_ref[2] = acc_ref[2] + row_c / rt

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
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, rt), 1)
    stats_ref[...] = jnp.where(
        lane == 0, acc_ref[0],
        jnp.where(lane == 1, acc_ref[1],
                  jnp.where(lane == 2, acc_ref[2],
                            jnp.where(lane == 3, acc_ref[3], 0.0))),
    )


@functools.partial(jax.jit, static_argnames=("ray_tile", "seed_k"))
def visit_stats(bvh, origins, directions, seed_w, seed_anchor,
                ray_tile=256, seed_k=0):
    tc = bvh.leaf_size
    rays, n_tiles, r = _pack_rays(origins, directions, ray_tile)
    kernel = functools.partial(_stats_kernel, tc, 1e-4, seed_k)
    stats = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            _rays_spec(ray_tile),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # seed chunk
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed anchor
        ],
        out_specs=_row_spec(ray_tile),
        out_shape=jax.ShapeDtypeStruct((1, n_tiles * ray_tile), jnp.float32),
        scratch_shapes=[
            pltpu.SMEM((STACK_DEPTH,), jnp.int32),
            pltpu.VMEM((1, ray_tile), jnp.float32),
            pltpu.SMEM((4,), jnp.float32),
        ],
    )(rays, bvh.wbox, bvh.wchild, bvh.waxis, bvh.w, bvh.wanchor,
      seed_w, seed_anchor)
    s = stats.reshape(n_tiles, ray_tile)
    return s[:, 0], s[:, 1], s[:, 2], s[:, 3]


# --- build the horizon-seed chunk (K largest-area triangles) -------------
SEED_K = 32
geom = scene.geometry
pos = np.asarray(jnp.stack([geom.positions[k] for k in range(3)], 0))  # (3, V)
idx = np.asarray(geom.indices)  # (3, T)
p0, p1, p2 = pos[:, idx[0]], pos[:, idx[1]], pos[:, idx[2]]
area = 0.5 * np.linalg.norm(np.cross((p1 - p0).T, (p2 - p0).T), axis=1)
top = np.argsort(-area)[:SEED_K]
print(f"seed triangles: {SEED_K}, area share "
      f"{area[top].sum()/area.sum():.2f}", file=sys.stderr)
w_host = np.asarray(pack.accel.w).astype(np.float64)[:, top]  # (12, K)
tmn = np.asarray(pack.accel.tri_min)[:, top]
tmx = np.asarray(pack.accel.tri_max)[:, top]
anchor = 0.5 * (tmn.min(axis=1) + tmx.max(axis=1))  # (3,)
for g in range(3):
    w_host[4 * g + 3] += (
        anchor[0] * w_host[4 * g + 0]
        + anchor[1] * w_host[4 * g + 1]
        + anchor[2] * w_host[4 * g + 2]
    )
w_host = w_host.astype(np.float32)
seed_w = jnp.asarray(
    w_host.reshape(3, 4, SEED_K).reshape(12, SEED_K)
    .reshape(3, 4, SEED_K).transpose(1, 0, 2).reshape(4, 3 * SEED_K)
)
seed_anchor = jnp.asarray(anchor.astype(np.float32))

# --- capture real wavefronts (same as tpu_bounce_sweep) ------------------
org, dirn, seq_id, seq_off = jax.jit(
    lambda: generate_primary_rays(camera, ctx.tables, options, 0)
)()
table = pack.shade_table
closest0 = jax.jit(
    lambda o, d: intersect_closest_wide(
        pack.wide, o, d, ray_tile=options.wide_ray_tile,
        precision="bf16x3", return_slots=True,
    )
)


@jax.jit
def one_bounce(org, dirn, weight, env_on_miss, active, depth):
    t, sid, hit = closest0(org, dirn)
    hit = hit & active
    rows = HitRows(jnp.take(table, jnp.maximum(sid, 0), axis=0, mode="clip"))
    front = dirn.dot(rows.vec(GEO_N)) < 0.0
    t_d, b1, b2 = hit_attributes_rows(rows, org, dirn, hit)
    t_sane = jnp.where(hit, t_d, 1.0)
    res = shade_hits(
        scene, ctx.ms_lut, ctx.tables, 0, depth, org, dirn, weight,
        env_on_miss, seq_id, seq_off, rows, t_sane, b1, b2, front, hit,
        max_ray_depth=DEPTH, rr_start_depth=options.rr_start_depth,
        sample_mode=options.sample_mode,
    )
    p = org + dirn * t_sane
    geo_n = rows.vec(GEO_N)
    e_org, e_dir = _park_dead(
        _offset_origin(p, geo_n, res.ext_dir, eps),
        res.ext_dir, res.ext_active,
    )
    return e_org, e_dir, res.ext_weight, res.ext_env_on_miss, res.ext_active


weight = Vec3.ones((R,))
env_on_miss = jnp.ones((R,), bool)
active = jnp.ones((R,), bool)
cur_o, cur_d = org, dirn
for depth in range(1, DEPTH + 1):
    for seed_k, tag in ((0, "plain"), (SEED_K, "seeded")):
        nodes, leaves, frac, impr = visit_stats(
            pack.wide, cur_o, cur_d, seed_w, seed_anchor, seed_k=seed_k
        )
        nodes, leaves, frac, impr = map(np.asarray, (nodes, leaves, frac, impr))
        mean_frac = frac.sum() / max(leaves.sum(), 1)
        print(
            f"depth {depth} {tag:6s}: act={int(jnp.sum(active))/R:.2f} "
            f"nodes/tile mean={nodes.mean():.1f} "
            f"p95={np.percentile(nodes,95):.0f} "
            f"leaves/tile mean={leaves.mean():.1f} "
            f"p95={np.percentile(leaves,95):.0f} "
            f"(of {pack.wide.num_chunks}) overlap-frac={mean_frac:.3f} "
            f"improving={impr.sum()/max(leaves.sum(),1):.2f}",
            file=sys.stderr,
        )
    out = one_bounce(cur_o, cur_d, weight, env_on_miss, active, jnp.int32(depth))
    cur_o, cur_d, weight, env_on_miss, active = out
