"""Round-5b probe: visit statistics of SORTED bounce wavefronts vs ray tile.

Round 5 made per-bounce sorting ~14x cheaper (multi-operand sort), so the
traversal kernels now run on octant+Morton-sorted wavefronts.  This probe
asks: how much tile-shared redundancy REMAINS after sorting, and would a
finer ray tile (more tiles, fewer shared leaf visits per tile) pay?  For
each bounce depth it sorts the live wavefront exactly as the integrator
does, then measures nodes/tile, leaves/tile, and per-leaf overlap fraction
at ray tiles 512/256/128 — both over all tiles and over live tiles only
(the integrator's segment gating already skips all-parked tiles).

Usage: python tpu_sorted_visit_probe.py
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/heatray_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from heatray_tpu.camera import orbit_camera
from heatray_tpu.options import RenderOptions
from heatray_tpu.render.integrator import (
    _offset_origin,
    _park_dead,
    _wavefront_sort_key,
    generate_primary_rays,
    make_context,
)
from heatray_tpu.render.shade import shade_hits
from heatray_tpu.render.shade_table import GEO_N, gather_rows, hit_attributes_rows
from heatray_tpu.ops.wide_bvh import intersect_closest_wide
from heatray_tpu.scene.builtin import cornell_box
from heatray_tpu.vec import Vec3

# Reuse the instrumented stats kernel from the round-4 probe.
import importlib.util as _ilu

W, H, DEPTH = 1920, 1080, 4
R = W * H

options = RenderOptions(width=W, height=H, max_render_passes=8, max_ray_depth=DEPTH)
scene = cornell_box(light="both", with_spheres=True)
camera = orbit_camera(W, H, distance=6.2, focal_length_mm=35.0)
ctx = make_context(options, scene)
pack = ctx.accel_pack
eps = options.ray_epsilon

# Import the stats-kernel machinery from tpu_visit_stats without running its
# __main__ sweep: load the module source up to the seed-building section.
src = open("tpu_visit_stats.py").read()
cut = src.index("# --- build the horizon-seed chunk")
ns = {"__name__": "_visit_stats_lib", "__file__": "tpu_visit_stats.py"}
exec(compile(src[:cut], "tpu_visit_stats.py", "exec"), ns)
visit_stats = ns["visit_stats"]

seed_w = jnp.zeros((12, 8), jnp.float32)
seed_anchor = jnp.zeros((3,), jnp.float32)

lo = jnp.min(pack.accel.tri_min, axis=1)
hi = jnp.max(pack.accel.tri_max, axis=1)


@jax.jit
def one_bounce(org, dirn, weight, env_on_miss, active, depth, sample_index,
               seq_id, seq_off):
    # return_slots=True: the shade table is SLOT-ordered — gathering it by
    # triangle id returns wrong rows (and wrong normals make the bounce
    # directions unrealistically coherent, poisoning every downstream stat).
    t, tid, hit = intersect_closest_wide(
        pack.wide, org, dirn, t_min=eps, ray_tile=512, return_slots=True
    )
    hit = hit & active
    rows = gather_rows(pack.shade_table, jnp.maximum(tid, 0))
    front = dirn.dot(rows.vec(GEO_N)) < 0.0
    t_d, b1, b2 = hit_attributes_rows(rows, org, dirn, hit)
    t_sane = jnp.where(hit, t_d, 1.0)
    res = shade_hits(
        scene, ctx.ms_lut, ctx.tables, sample_index, depth,
        org, dirn, weight, env_on_miss,
        seq_id, seq_off,
        rows, t_sane, b1, b2, front, hit,
        max_ray_depth=DEPTH, rr_start_depth=options.rr_start_depth,
        sample_mode=options.sample_mode,
    )
    p = org + dirn * t_sane
    geo_n = rows.vec(GEO_N)
    e_org, e_dir = _park_dead(
        _offset_origin(p, geo_n, res.ext_dir, eps), res.ext_dir, res.ext_active
    )
    return e_org, e_dir, res.ext_weight, res.ext_env_on_miss, res.ext_active


@jax.jit
def sort_rays(org, dirn, active):
    key = _wavefront_sort_key(org, dirn, active, lo, hi)
    out = jax.lax.sort(
        (key, org.x, org.y, org.z, dirn.x, dirn.y, dirn.z,
         active.astype(jnp.int32)),
        num_keys=1,
    )
    o = Vec3(out[1], out[2], out[3])
    d = Vec3(out[4], out[5], out[6])
    return o, d, out[7] > 0


org, dirn, seq_id, seq_off = jax.jit(
    lambda: generate_primary_rays(camera, ctx.tables, options, 0)
)()
weight = Vec3.ones((R,))
env_on_miss = jnp.ones((R,), bool)
active = jnp.ones((R,), bool)

print(f"chunks={pack.wide.num_chunks} leaf_size={pack.wide.leaf_size}",
      file=sys.stderr)

cur_o, cur_d = org, dirn
for depth in range(1, DEPTH + 1):
    if depth > 1:
        s_o, s_d, s_act = sort_rays(cur_o, cur_d, active)
    else:
        s_o, s_d, s_act = cur_o, cur_d, active
    n_act = int(jnp.sum(s_act))
    act_np = np.asarray(s_act)
    for rt in (512, 256, 128):
        nodes, leaves, frac, impr = map(
            np.asarray,
            visit_stats(pack.wide, s_o, s_d, seed_w, seed_anchor,
                        ray_tile=rt, seed_k=0),
        )
        live_tile = act_np[: nodes.shape[0] * rt].reshape(-1, rt).any(axis=1)
        lt = max(live_tile.sum(), 1)
        mean_frac = frac.sum() / max(leaves.sum(), 1)
        # MXU leaf-math proxy: total leaf visits x rt lanes each (the pair
        # test runs on the whole tile regardless of overlap).
        print(
            f"depth {depth} rt={rt:3d}: act={n_act/R:.2f} "
            f"live_tiles={live_tile.sum()}/{nodes.shape[0]} "
            f"nodes/live={nodes[live_tile].mean():.1f} "
            f"leaves/live={leaves[live_tile].mean():.1f} "
            f"overlap={mean_frac:.3f} "
            f"leafwork(rt*visits,live)={rt * leaves[live_tile].sum() / 1e6:.1f}M "
            f"nodework={rt * nodes[live_tile].sum() / 1e6:.1f}M",
            file=sys.stderr,
        )
    out = one_bounce(cur_o, cur_d, weight, env_on_miss, active,
                     jnp.int32(depth), 0, seq_id, seq_off)
    cur_o, cur_d, weight, env_on_miss, active = out
