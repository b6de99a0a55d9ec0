"""Sweep wide-BVH kernel configs on the REAL bench-pass wavefronts.

Replays the bench bounce loop (Cornell 1080p depth 4) once with the default
kernels to capture the actual per-depth extension and shadow wavefronts —
origins on surfaces, BSDF/VNDF/refracted directions, true activity masks —
then times closest/any-hit kernels across (leaf_size, ray_tile) on those
states.  Isolated synthetic probes mislead: uniform random directions and
synthetic activity got 100-166 ms where the real pass measures 229 ms.

Usage: python tpu_bounce_sweep.py
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
    _slot_order_table,
    generate_primary_rays,
    make_context,
)
from heatray_tpu.render.shade import shade_hits
from heatray_tpu.render.shade_table import GEO_N, HitRows, hit_attributes_rows
from heatray_tpu.ops.wide_bvh import (
    build_wide_bvh,
    intersect_any_wide,
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


# --- capture the real wavefronts ----------------------------------------
org, dirn, seq_id, seq_off = jax.jit(
    lambda: generate_primary_rays(camera, ctx.tables, options, 0)
)()

table = pack.shade_table
slot_tri = pack.wide.slot_tri

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
    s_org, s_dir = _park_dead(
        _offset_origin(p, geo_n, res.shadow_dir, eps),
        res.shadow_dir, res.shadow_active,
    )
    e_org, e_dir = _park_dead(
        _offset_origin(p, geo_n, res.ext_dir, eps),
        res.ext_dir, res.ext_active,
    )
    return (s_org, s_dir, res.shadow_max_t, res.shadow_active,
            e_org, e_dir, res.ext_weight, res.ext_env_on_miss, res.ext_active)


waves = []  # per depth: dict of shadow + next-ext wavefronts
weight = Vec3.ones((R,))
env_on_miss = jnp.ones((R,), bool)
active = jnp.ones((R,), bool)
cur_o, cur_d = org, dirn
for depth in range(1, DEPTH + 1):
    out = one_bounce(cur_o, cur_d, weight, env_on_miss, active, jnp.int32(depth))
    (s_org, s_dir, s_maxt, s_act, e_org, e_dir, e_w, e_env, e_act) = out
    waves.append({
        "depth": depth,
        "closest_in": (cur_o, cur_d, active),
        "shadow": (s_org, s_dir, s_maxt, s_act),
    })
    print(
        f"depth {depth}: active={int(jnp.sum(active))/R:.2f} "
        f"shadow={int(jnp.sum(s_act))/R:.2f} next={int(jnp.sum(e_act))/R:.2f}",
        file=sys.stderr,
    )
    cur_o, cur_d, weight, env_on_miss, active = e_org, e_dir, e_w, e_env, e_act

# --- sweep --------------------------------------------------------------
LEAVES = [32]
TILES = [128, 256, 512, 1024]
print("\n== closest-hit (ms) by depth | any-hit (ms) by depth ==",
      file=sys.stderr)
print(f"{'leaf':>4s} {'rt':>4s} | " +
      " ".join(f"c{d+1:d}" for d in range(DEPTH)) + " | " +
      " ".join(f"a{d:d}" for d in range(1, DEPTH + 1)), file=sys.stderr)
for leaf in LEAVES:
    wide = build_wide_bvh(pack.accel, leaf_size=leaf)
    for rt in TILES:
        closest = jax.jit(
            lambda o, d, wide=wide, rt=rt: intersect_closest_wide(
                wide, o, d, ray_tile=rt, precision="bf16x3",
                return_slots=True,
            )
        )
        anyhit = jax.jit(
            lambda o, d, tm, wide=wide, rt=rt: intersect_any_wide(
                wide, o, d, t_max=tm, ray_tile=rt, precision="bf16x3"
            )
        )
        cms, ams = [], []
        for wv in waves:
            o, d, act = wv["closest_in"]
            cms.append(timeit(closest, o, d) * 1e3)
            so, sd, smaxt, sact = wv["shadow"]
            ams.append(timeit(anyhit, so, sd, smaxt - 2 * eps) * 1e3)
        print(
            f"{leaf:4d} {rt:4d} | " +
            " ".join(f"{m:6.1f}" for m in cms) + " | " +
            " ".join(f"{m:6.1f}" for m in ams),
            file=sys.stderr,
        )
