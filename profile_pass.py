"""Decompose the bench pass into stages with REAL wavefront states.

Runs one bounce at a time outside the fused jit, timing closest / any /
shade / gather separately on the actual ray distributions the pass sees.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/heatray_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from heatray_tpu.camera import orbit_camera
from heatray_tpu.options import RenderOptions
from heatray_tpu.render.integrator import (
    _make_wide_intersectors,
    _offset_origin,
    _park_dead,
    build_accel,
    generate_primary_rays,
    make_context,
)
from heatray_tpu.render.shade import make_sequence_lookup, shade_hits
from heatray_tpu.render.shade_table import GEO_N, gather_rows, hit_attributes_rows
from heatray_tpu.scene.builtin import cornell_box
from heatray_tpu.vec import Vec3

W, H, DEPTH = 1920, 1080, 4
R = W * H
options = RenderOptions(width=W, height=H, max_render_passes=8, max_ray_depth=DEPTH)
scene = cornell_box(light="both", with_spheres=True)
camera = orbit_camera(W, H, distance=6.2, focal_length_mm=35.0)
ctx = make_context(options, scene)
pack = ctx.accel_pack
print(f"backend={pack.backend}", file=sys.stderr)
closest_fn, any_fn = _make_wide_intersectors(pack, options)

eps = options.ray_epsilon


def timeit(name, fn, n=6):
    out = fn()
    jax.block_until_ready(jax.tree.leaves(out))
    t0 = time.time()
    o = fn()
    np.asarray(np.ravel(jax.tree.leaves(o)[0])[:1])
    t1 = time.time() - t0
    t0 = time.time()
    for _ in range(n):
        o = fn()
    np.asarray(np.ravel(jax.tree.leaves(o)[0])[:1])
    tn = time.time() - t0
    dt = (tn - t1) / (n - 1)
    print(f"  {name:34s} {dt*1e3:9.2f} ms", file=sys.stderr)
    return dt, out


org, dirn, seq_id, seq_off = jax.jit(
    lambda: generate_primary_rays(camera, ctx.tables, options, 0)
)()
weight = Vec3.ones((R,))
env_on_miss = jnp.ones((R,), bool)
active = jnp.ones((R,), bool)

shade_jit = jax.jit(
    lambda org, dirn, weight, env_on_miss, seq_id, seq_off, rows_arr, t, b1, b2, front, hit, depth: shade_hits(
        scene, ctx.ms_lut, ctx.tables, 0, depth, org, dirn, weight,
        env_on_miss, seq_id, seq_off,
        __import__("heatray_tpu.render.shade_table", fromlist=["HitRows"]).HitRows(rows_arr),
        t, b1, b2, front, hit,
        max_ray_depth=options.max_ray_depth, rr_start_depth=options.rr_start_depth,
        sample_mode=options.sample_mode,
    )
)

gather_jit = jax.jit(lambda tid: jnp.take(pack.shade_table, jnp.maximum(tid, 0), axis=0, mode="clip"))
attr_jit = jax.jit(
    lambda rows_arr, org, dirn, hit: hit_attributes_rows(
        __import__("heatray_tpu.render.shade_table", fromlist=["HitRows"]).HitRows(rows_arr), org, dirn, hit
    )
)

total = {"closest": 0.0, "any": 0.0, "gather": 0.0, "attrs": 0.0, "shade": 0.0}
for depth in range(1, DEPTH + 1):
    print(f"bounce {depth} (active={int(jnp.sum(active))})", file=sys.stderr)
    dt, (t, tid, hit) = timeit("closest", lambda: closest_fn(org, dirn, eps))
    total["closest"] += dt
    hit = hit & active
    dt, rows_arr = timeit("gather rows (T,82)", lambda: gather_jit(tid))
    total["gather"] += dt
    front = jnp.ones(hit.shape, bool)
    dt, (t_d, b1, b2) = timeit("hit attrs", lambda: attr_jit(rows_arr, org, dirn, hit))
    total["attrs"] += dt
    t_sane = jnp.where(hit, t_d, 1.0)
    dt, res = timeit(
        "shade", lambda: shade_jit(org, dirn, weight, env_on_miss, seq_id,
                                   seq_off, rows_arr, t_sane, b1, b2, front, hit,
                                   jnp.int32(depth))
    )
    total["shade"] += dt
    from heatray_tpu.render.shade_table import HitRows
    rows = HitRows(rows_arr)
    p = org + dirn * t_sane
    geo_n = rows.vec(GEO_N)
    s_org, s_dir = _park_dead(
        _offset_origin(p, geo_n, res.shadow_dir, eps), res.shadow_dir, res.shadow_active
    )
    dt, blocked = timeit(
        "any (shadow)", lambda: any_fn(s_org, s_dir, eps, res.shadow_max_t - 2 * eps)
    )
    total["any"] += dt
    e_org, e_dir = _park_dead(
        _offset_origin(p, geo_n, res.ext_dir, eps), res.ext_dir, res.ext_active
    )
    org, dirn = e_org, e_dir
    weight = res.ext_weight
    env_on_miss = res.ext_env_on_miss
    active = res.ext_active

print("TOTALS (per pass):", file=sys.stderr)
for k, v in total.items():
    print(f"  {k:10s} {v*1e3:9.1f} ms", file=sys.stderr)
print(f"  sum        {sum(total.values())*1e3:9.1f} ms", file=sys.stderr)
