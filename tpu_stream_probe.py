"""Round-5 probe: where does the large-scene (HBM-streaming) pass spend
its time?

BENCH's large-scene row (high_poly ~300k tris, stream backend) measured
5.7 Mrays/s vs Cornell's 25.4 — this probe breaks the 518 ms pass into
stages on the REAL captured wavefronts:

1. stream closest / any-hit per depth, sorted (as the integrator runs
   them), across ray tiles and stream leaf sizes
2. shade + row gather at this scene's table size
3. the full pass for cross-checking

Usage: python tpu_stream_probe.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/heatray_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from heatray_tpu.options import FrameGlobals, RenderOptions
from heatray_tpu.render.integrator import (
    _offset_origin,
    _park_dead,
    _wavefront_sort_key,
    generate_primary_rays,
    make_context,
    render_pass,
)
from heatray_tpu.render.shade import shade_hits
from heatray_tpu.render.shade_table import GEO_N, HitRows, hit_attributes_rows
from heatray_tpu.ops.wide_bvh import (
    build_wide_bvh,
    intersect_any_stream,
    intersect_closest_stream,
)
from heatray_tpu.scene.builtin import high_poly
from heatray_tpu.scene.geometry import scene_aabb
from heatray_tpu.utils.framing import frame_scene
from heatray_tpu.vec import Vec3

W, H, DEPTH = 1920, 1080, 4
R = W * H

options = RenderOptions(width=W, height=H, max_render_passes=8, max_ray_depth=DEPTH)
scene = high_poly()
camera = frame_scene(np.asarray(scene_aabb(scene.geometry)), W, H, theta=0.35)
ctx = make_context(options, scene)
pack = ctx.accel_pack
eps = options.ray_epsilon
print(
    f"backend={pack.backend} tris={pack.accel.num_triangles} "
    f"chunks={pack.wide.num_chunks} leaf={pack.wide.leaf_size} "
    f"nodes={pack.wide.num_nodes}",
    file=sys.stderr,
)

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


# --- 0. full pass reference ------------------------------------------------
accum = jnp.zeros((4, H, W), jnp.float32)
t_pass = timeit(
    lambda a: render_pass(scene, camera, ctx, options, FrameGlobals.create(2), a),
    accum, n=4,
)
print(f"full pass: {t_pass*1e3:.1f} ms", file=sys.stderr)

# --- 1. capture real wavefronts -------------------------------------------
org, dirn, seq_id, seq_off = jax.jit(
    lambda: generate_primary_rays(camera, ctx.tables, options, 0)
)()
table = pack.shade_table

closest0 = jax.jit(
    lambda o, d: intersect_closest_stream(
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


waves = []
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
        "active": int(jnp.sum(active)),
        "shadow_active": int(jnp.sum(s_act)),
    })
    cur_o, cur_d, weight, env_on_miss, active = e_org, e_dir, e_w, e_env, e_act

for wv in waves:
    print(
        f"depth {wv['depth']}: active={wv['active']/1e6:.2f}M "
        f"shadow={wv['shadow_active']/1e6:.2f}M",
        file=sys.stderr,
    )


@jax.jit
def sort_wave(o, d, act, so, sd, smaxt, sact):
    k = _wavefront_sort_key(o, d, act, lo, hi)
    order = jnp.argsort(k)
    perm = lambda a: jnp.take(a, order)
    return (
        o.map(perm), d.map(perm), perm(act),
        so.map(perm), sd.map(perm), perm(smaxt), perm(sact),
    )


sorted_waves = []
for wv in waves:
    o, d, act = wv["closest_in"]
    so, sd, smaxt, sact = wv["shadow"]
    sw = sort_wave(o, d, act, so, sd, smaxt, sact)
    jax.block_until_ready(sw[0].x)
    sorted_waves.append(sw)

# --- 2. stream kernels per depth, sorted, sweeping rt ---------------------
print("\n== stream closest (c) / any-hit (a) ms by depth, SORTED ==",
      file=sys.stderr)
for rt in (256, 512, 1024):
    closest = jax.jit(
        lambda o, d, rt=rt: intersect_closest_stream(
            pack.wide, o, d, ray_tile=rt, precision="bf16x3",
            return_slots=True,
        )
    )
    anyhit = jax.jit(
        lambda o, d, tm, rt=rt: intersect_any_stream(
            pack.wide_occl, o, d, t_max=tm, ray_tile=rt, precision="bf16x3"
        )
    )
    cs, as_ = [], []
    for sw in sorted_waves:
        (os_, ds_, act_s, sos, sds, smaxts, sacts) = sw
        cs.append(timeit(closest, os_, ds_) * 1e3)
        as_.append(timeit(anyhit, sos, sds, smaxts - 2 * eps) * 1e3)
    print(
        f"rt={rt:5d} | c: " + " ".join(f"{x:6.1f}" for x in cs)
        + f"  sum={sum(cs):6.1f} | a: " + " ".join(f"{x:6.1f}" for x in as_)
        + f"  sum={sum(as_):6.1f}",
        file=sys.stderr,
    )

# --- 3. shade + row gather at this table size -----------------------------
o, d, act = waves[1]["closest_in"]


@jax.jit
def shade_stage(o, d, act):
    t, sid, hit = closest0(o, d)
    return t, sid, hit


t_trav_unsorted = timeit(shade_stage, o, d, act)
print(f"\nclosest d2 UNSORTED (rt=512): {t_trav_unsorted*1e3:.1f} ms",
      file=sys.stderr)


@jax.jit
def shade_only(o, d, sid, hit, act):
    hit = hit & act
    rows = HitRows(jnp.take(table, jnp.maximum(sid, 0), axis=0, mode="clip"))
    front = d.dot(rows.vec(GEO_N)) < 0.0
    t_d, b1, b2 = hit_attributes_rows(rows, o, d, hit)
    t_sane = jnp.where(hit, t_d, 1.0)
    res = shade_hits(
        scene, ctx.ms_lut, ctx.tables, 0, jnp.int32(2), o, d,
        Vec3.ones((R,)), jnp.ones((R,), bool), seq_id, seq_off, rows,
        t_sane, b1, b2, front, hit,
        max_ray_depth=DEPTH, rr_start_depth=options.rr_start_depth,
        sample_mode=options.sample_mode,
    )
    return res.ext_dir.x


t, sid, hit = shade_stage(o, d, act)
jax.block_until_ready(t)
t_shade = timeit(shade_only, o, d, sid, hit, act)
print(f"shade+gather (d2 wavefront): {t_shade*1e3:.1f} ms", file=sys.stderr)

# sort burst at this scene
key_fn = jax.jit(lambda o, d, a: jnp.argsort(_wavefront_sort_key(o, d, a, lo, hi)))
t_sort = timeit(key_fn, o, d, act)
print(f"argsort burst: {t_sort*1e3:.1f} ms", file=sys.stderr)
