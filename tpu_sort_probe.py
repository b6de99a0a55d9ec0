"""Round-5 probe: price the one-take packed-carry permutation and the
value of sorted traversal on REAL bench wavefronts.

Round 4 priced the bounce sort burst at ~370 ms (argsort + ~16 separate
flat takes of the carry).  The VERDICT's attack: pack the 16 carry planes
into ONE (16, R) f32 matrix and permute with a single axis=1 take (round-4
layout probe: 46 ms per (8, R) take), flipping sorting from a net loss to
a win even on the 4k-tri bench scene.  This probe measures, on-chip:

1. permutation primitives: key+argsort, packed (16, R)/(24, R) takes,
   16x separate flat takes (the round-4 status quo), unscatter variants
2. sorted vs unsorted closest/any-hit kernels per depth on the REAL
   captured bounce wavefronts (shadow rays permuted by the SAME order the
   integrator would apply — they inherit the closest sort's lane order)
   across ray tiles 128/256/512

Usage: python tpu_sort_probe.py
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


# --- 1. permutation primitives ------------------------------------------
key = jax.random.key(0)
perm_idx = jax.random.permutation(key, R)
ki = jax.random.randint(key, (R,), 0, 1 << 21, dtype=jnp.int32)
p16 = jax.random.normal(key, (16, R), jnp.float32)
p24 = jax.random.normal(key, (24, R), jnp.float32)
flat = jax.random.normal(key, (R,), jnp.float32)
jax.block_until_ready((perm_idx, ki, p16, p24, flat))

print("== permutation primitives ==", file=sys.stderr)
t_sortpair = timeit(jax.jit(
    lambda: jax.lax.sort((ki, jnp.arange(R, dtype=jnp.int32)), num_keys=1)
))
print(f"sort (key, iota) pairs                  {t_sortpair*1e3:8.2f} ms",
      file=sys.stderr)
t_p16 = timeit(jax.jit(lambda: jnp.take(p16, perm_idx, axis=1)))
print(f"take packed (16,R) axis=1               {t_p16*1e3:8.2f} ms",
      file=sys.stderr)
t_p24 = timeit(jax.jit(lambda: jnp.take(p24, perm_idx, axis=1)))
print(f"take packed (24,R) axis=1               {t_p24*1e3:8.2f} ms",
      file=sys.stderr)
t_16flat = timeit(jax.jit(
    lambda: [jnp.take(flat + i, perm_idx) for i in range(16)]
))
print(f"16x separate flat takes (status quo)    {t_16flat*1e3:8.2f} ms",
      file=sys.stderr)
# pack/unpack overhead: stack 16 flats -> one matrix, then unstack
t_pack = timeit(jax.jit(
    lambda: jnp.stack([flat + i for i in range(16)], axis=0)
))
print(f"pack: stack 16 flats -> (16,R)          {t_pack*1e3:8.2f} ms",
      file=sys.stderr)
t_packed_burst = timeit(jax.jit(
    lambda: jnp.take(
        jnp.stack([flat + i for i in range(16)], axis=0), perm_idx, axis=1
    )[3]
))
print(f"burst: stack + (16,R) take              {t_packed_burst*1e3:8.2f} ms",
      file=sys.stderr)
# unscatter for accumulation: 3-4 planes back to pixel order
t_sc_flat = timeit(jax.jit(
    lambda: jnp.zeros((R,), jnp.float32).at[perm_idx].set(flat)
))
print(f"unscatter 1 flat plane .at[].set        {t_sc_flat*1e3:8.2f} ms",
      file=sys.stderr)
t_sc_p4 = timeit(jax.jit(
    lambda: jnp.zeros((4, R), jnp.float32).at[:, perm_idx].set(p16[:4])
))
print(f"unscatter packed (4,R) .at[:,idx].set   {t_sc_p4*1e3:8.2f} ms",
      file=sys.stderr)
# inverse-permutation alternative: scatter iota once, then packed take
t_inv_take = timeit(jax.jit(
    lambda: jnp.take(
        p16[:4],
        jnp.zeros((R,), jnp.int32).at[perm_idx].set(
            jnp.arange(R, dtype=jnp.int32)
        ),
        axis=1,
    )
))
print(f"unscatter via inv-perm + (4,R) take     {t_inv_take*1e3:8.2f} ms",
      file=sys.stderr)

# --- 2. capture real wavefronts (as tpu_bounce_sweep) -------------------
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
    })
    cur_o, cur_d, weight, env_on_miss, active = e_org, e_dir, e_w, e_env, e_act


@jax.jit
def sort_wave(o, d, act, so, sd, smaxt, sact):
    k = _wavefront_sort_key(o, d, act, lo, hi)
    order = jnp.argsort(k)
    perm = lambda a: jnp.take(a, order)
    return (
        o.map(perm), d.map(perm), perm(act),
        so.map(perm), sd.map(perm), perm(smaxt), perm(sact),
    )


# --- 3. sorted vs unsorted kernels on real wavefronts -------------------
print("\n== closest (c) / any-hit (a) ms by depth: unsorted vs sorted ==",
      file=sys.stderr)
print(f"{'rt':>5s} | " + " ".join(f"c{d}u  c{d}s " for d in range(1, DEPTH + 1))
      + "| " + " ".join(f"a{d}u  a{d}s " for d in range(1, DEPTH + 1)),
      file=sys.stderr)
for rt in (128, 256, 512):
    closest = jax.jit(
        lambda o, d, rt=rt: intersect_closest_wide(
            pack.wide, o, d, ray_tile=rt, precision="bf16x3",
            return_slots=True,
        )
    )
    anyhit = jax.jit(
        lambda o, d, tm, rt=rt: intersect_any_wide(
            pack.wide_occl, o, d, t_max=tm, ray_tile=rt, precision="bf16x3"
        )
    )
    cu, cs, au, as_ = [], [], [], []
    for wv in waves:
        o, d, act = wv["closest_in"]
        so, sd, smaxt, sact = wv["shadow"]
        (os_, ds_, act_s, sos, sds, smaxts, sacts) = sort_wave(
            o, d, act, so, sd, smaxt, sact
        )
        jax.block_until_ready(os_.x)
        cu.append(timeit(closest, o, d) * 1e3)
        cs.append(timeit(closest, os_, ds_) * 1e3)
        au.append(timeit(anyhit, so, sd, smaxt - 2 * eps) * 1e3)
        as_.append(timeit(anyhit, sos, sds, smaxts - 2 * eps) * 1e3)
    print(
        f"{rt:5d} | "
        + " ".join(f"{u:5.0f} {s:5.0f}" for u, s in zip(cu, cs))
        + " | "
        + " ".join(f"{u:5.0f} {s:5.0f}" for u, s in zip(au, as_)),
        file=sys.stderr,
    )
