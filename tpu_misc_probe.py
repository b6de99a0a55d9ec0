"""Round-5 probe: price the non-traversal line items of the Cornell pass.

PROFILE_r05 puts the pass at ~425 ms with traversal down to ~145; the rest
is sort bursts (~84), shade (~85) and "misc" (~110: row gathers +
unscatter).  This probe prices each candidate on-chip:

1. gather_rows: the 51-col fat row gather at 2.07M rays
2. the two multiscatter-LUT flat gathers inside shade
3. unscatter variants: 3x .at[pix].set vs ONE multisort keyed on pix
4. shade_hits total, and with the ms-LUT gathers stubbed (their share)
5. sort with a STALE order (sort once at d2, reuse at d3/d4): what does
   traversal pay when the order is one bounce old?

Usage: python tpu_misc_probe.py
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
    _offset_origin,
    _park_dead,
    _wavefront_sort_key,
    generate_primary_rays,
    make_context,
)
from heatray_tpu.render import multiscatter as msmod
from heatray_tpu.render.shade import shade_hits
from heatray_tpu.render.shade_table import GEO_N, HitRows, hit_attributes_rows
from heatray_tpu.ops.wide_bvh import intersect_any_wide, intersect_closest_wide
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
table = pack.shade_table
print(f"table {table.shape}", file=sys.stderr)

lo = jnp.min(pack.accel.tri_min, axis=1)
hi = jnp.max(pack.accel.tri_max, axis=1)


def timeit(fn, *args, n=8):
    out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out))
    t0 = time.time()
    o = fn(*args)
    np.asarray(np.ravel(jax.tree.leaves(o)[0])[:1])
    t1 = time.time() - t0
    t0 = time.time()
    for _ in range(n):
        o = fn(*args)
    np.asarray(np.ravel(jax.tree.leaves(o)[0])[:1])
    tn = time.time() - t0
    return (tn - t1) / (n - 1)


# --- capture a d2 wavefront (sorted, as the integrator sees it) -----------
org, dirn, seq_id, seq_off = jax.jit(
    lambda: generate_primary_rays(camera, ctx.tables, options, 0)
)()

closest = jax.jit(
    lambda o, d: intersect_closest_wide(
        pack.wide, o, d, ray_tile=512, return_slots=True
    )
)


@jax.jit
def bounce_once(org, dirn, weight, env_on_miss, active, depth):
    t, sid, hit = closest(org, dirn)
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
        _offset_origin(p, geo_n, res.ext_dir, eps), res.ext_dir, res.ext_active
    )
    return e_org, e_dir, res.ext_weight, res.ext_env_on_miss, res.ext_active


weight, env_on, act = Vec3.ones((R,)), jnp.ones((R,), bool), jnp.ones((R,), bool)
o2, d2, w2, e2, a2 = bounce_once(org, dirn, weight, env_on, act, jnp.int32(1))
o3, d3, w3, e3, a3 = bounce_once(o2, d2, w2, e2, a2, jnp.int32(2))

sortk = jax.jit(lambda o, d, a: jnp.argsort(_wavefront_sort_key(o, d, a, lo, hi)))
order2 = sortk(o2, d2, a2)
perm = jax.jit(lambda v, idx: v.map(lambda c: jnp.take(c, idx)))
o2s, d2s = perm(o2, order2), perm(d2, order2)
t2, sid2, hit2 = closest(o2s, d2s)
jax.block_until_ready(t2)

# --- 1. the fat row gather -------------------------------------------------
t_rows = timeit(
    jax.jit(lambda s: jnp.take(table, jnp.maximum(s, 0), axis=0, mode="clip")),
    sid2,
)
print(f"gather_rows ({table.shape[1]} cols): {t_rows*1e3:7.2f} ms", file=sys.stderr)
half = table[:, :16]
t_rows16 = timeit(
    jax.jit(lambda s: jnp.take(half, jnp.maximum(s, 0), axis=0, mode="clip")),
    sid2,
)
print(f"gather 16-col rows:            {t_rows16*1e3:7.2f} ms", file=sys.stderr)
tableT = table.T  # (K, S): gather along axis=1 (lane-minor)
t_rowsT = timeit(
    jax.jit(lambda s: jnp.take(tableT, jnp.maximum(s, 0), axis=1, mode="clip")),
    sid2,
)
print(f"gather (K,S) axis=1:           {t_rowsT*1e3:7.2f} ms", file=sys.stderr)
tbf = table.astype(jnp.bfloat16)
t_rowsb = timeit(
    jax.jit(lambda s: jnp.take(tbf, jnp.maximum(s, 0), axis=0, mode="clip")),
    sid2,
)
print(f"gather bf16 rows:              {t_rowsb*1e3:7.2f} ms", file=sys.stderr)

# --- 2. multiscatter LUT gathers ------------------------------------------
u = jnp.abs(d2.x)
rough = jnp.abs(d2.y)
t_ms = timeit(
    jax.jit(
        lambda u, r: msmod.compute_multiscattering(
            ctx.ms_lut, Vec3(u, u, u), u, r
        ).x
    ),
    u, rough,
)
print(f"one compute_multiscattering:   {t_ms*1e3:7.2f} ms", file=sys.stderr)

# --- 3. unscatter variants -------------------------------------------------
pix = jnp.argsort(order2)  # stand-in permutation
c3 = (d2.x, d2.y, d2.z)
t_sc3 = timeit(
    jax.jit(
        lambda p, a, b, c: (
            jnp.zeros((R,), jnp.float32).at[p].set(a),
            jnp.zeros((R,), jnp.float32).at[p].set(b),
            jnp.zeros((R,), jnp.float32).at[p].set(c),
        )
    ),
    pix, *c3,
)
print(f"unscatter 3x .at[pix].set:     {t_sc3*1e3:7.2f} ms", file=sys.stderr)
t_ms3 = timeit(
    jax.jit(lambda p, a, b, c: jax.lax.sort((p, a, b, c), num_keys=1)[1:]),
    pix, *c3,
)
print(f"unscatter multisort(pix,3pl):  {t_ms3*1e3:7.2f} ms", file=sys.stderr)

# --- 4. shade, and shade with the ms-LUT stubbed --------------------------
rows2 = HitRows(jnp.take(table, jnp.maximum(sid2, 0), axis=0, mode="clip"))
front2 = d2s.dot(rows2.vec(GEO_N)) < 0.0
t_d2, b12, b22 = hit_attributes_rows(rows2, o2s, d2s, hit2)
ts2 = jnp.where(hit2, t_d2, 1.0)


def shade_fn(o, d, rows, t, b1, b2, front, hit):
    res = shade_hits(
        scene, ctx.ms_lut, ctx.tables, 0, jnp.int32(2), o, d,
        Vec3.ones((R,)), jnp.ones((R,), bool), seq_id, seq_off, rows,
        t, b1, b2, front, hit,
        max_ray_depth=DEPTH, rr_start_depth=options.rr_start_depth,
        sample_mode=options.sample_mode,
    )
    return res.ext_dir.x, res.shadow_dir.x, res.emission.x


t_shade = timeit(jax.jit(shade_fn), o2s, d2s, rows2, ts2, b12, b22, front2, hit2)
print(f"shade_hits (d2):               {t_shade*1e3:7.2f} ms", file=sys.stderr)

orig_ms = msmod.compute_multiscattering
msmod.compute_multiscattering = lambda lut, cs, nd, r: 1.0 + cs * 0.05
import heatray_tpu.render.shade as shmod
shmod.compute_multiscattering = msmod.compute_multiscattering
try:
    t_shade_noms = timeit(
        jax.jit(shade_fn), o2s, d2s, rows2, ts2, b12, b22, front2, hit2
    )
    print(f"shade_hits, ms-LUT stubbed:    {t_shade_noms*1e3:7.2f} ms",
          file=sys.stderr)
finally:
    msmod.compute_multiscattering = orig_ms
    shmod.compute_multiscattering = orig_ms

# hit_attributes alone
t_attr = timeit(
    jax.jit(lambda rows, o, d, h: hit_attributes_rows(rows, o, d, h)[0]),
    rows2, o2s, d2s, hit2,
)
print(f"hit_attributes_rows:           {t_attr*1e3:7.2f} ms", file=sys.stderr)

# --- 5. stale-order traversal ---------------------------------------------
o3s, d3s = perm(o3, order2), perm(d3, order2)  # d3 sorted by d2's order
order3 = sortk(o3, d3, a3)
o3f, d3f = perm(o3, order3), perm(d3, order3)
t_c3_stale = timeit(closest, o3s, d3s)
t_c3_fresh = timeit(closest, o3f, d3f)
t_c3_none = timeit(closest, o3, d3)
print(
    f"closest d3: unsorted {t_c3_none*1e3:6.1f}  stale {t_c3_stale*1e3:6.1f}"
    f"  fresh {t_c3_fresh*1e3:6.1f} ms",
    file=sys.stderr,
)
