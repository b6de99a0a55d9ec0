"""On-chip probes for round-4 wavefront reordering design.

The round-3 profile showed the bounce-wavefront sort burst costs ~372 ms
(key + argsort + 13 one-at-a-time XLA takes + unscatter) against ~150 ms
of per-bounce traversal savings — a net loss on small scenes.  This probe
measures every candidate piece of a cheaper reordering path:

- argsort itself vs a counting-sort position computation (cumsum-based)
- XLA gather/scatter throughput by layout: flat (R,), planar (8, R) along
  lanes, row-packed (R, 8)/(R, 16) along sublanes
- traversal value: unsorted vs fully sorted vs octant-bucket-only vs
  active-compaction at realistic (depth-3/4) activity fractions

Usage: python tpu_perm_probe.py
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
    _wavefront_sort_key,
    generate_primary_rays,
    make_context,
)
from heatray_tpu.ops.wide_bvh import intersect_any_wide, intersect_closest_wide
from heatray_tpu.scene.builtin import cornell_box
from heatray_tpu.vec import Vec3

W, H = 1920, 1080
R = W * H

options = RenderOptions(width=W, height=H, max_render_passes=8, max_ray_depth=4)
scene = cornell_box(light="both", with_spheres=True)
camera = orbit_camera(W, H, distance=6.2, focal_length_mm=35.0)
ctx = make_context(options, scene)
pack = ctx.accel_pack

org, dirn, seq_id, seq_off = jax.jit(
    lambda: generate_primary_rays(camera, ctx.tables, options, 0)
)()
jax.block_until_ready(org.x)


def timeit(name, fn, n=8):
    out = fn()
    jax.block_until_ready(jax.tree.leaves(out))
    t0 = time.time()
    o1 = fn()
    np.asarray(jax.tree.leaves(o1)[0]).ravel()[:1]
    t1 = time.time() - t0
    t0 = time.time()
    for _ in range(n):
        o1 = fn()
    np.asarray(jax.tree.leaves(o1)[0]).ravel()[:1]
    tn = time.time() - t0
    dt = (tn - t1) / (n - 1)
    print(f"{name:44s} {dt*1e3:9.2f} ms", file=sys.stderr)
    return dt


key = jax.random.key(0)
ki = jax.random.randint(key, (R,), 0, 1 << 21, dtype=jnp.int32)
perm_idx = jax.random.permutation(key, R)
flat = jax.random.normal(key, (R,), jnp.float32)
planar8 = jax.random.normal(key, (8, R), jnp.float32)
rows8 = jax.random.normal(key, (R, 8), jnp.float32)
rows16 = jax.random.normal(key, (R, 16), jnp.float32)
jax.block_until_ready((ki, perm_idx, flat, planar8, rows8, rows16))

print("== sorting primitives ==", file=sys.stderr)
timeit("argsort (R,) i32", jax.jit(lambda: jnp.argsort(ki)))
timeit("sort pairs (key, iota)", jax.jit(
    lambda: jax.lax.sort((ki, jnp.arange(R, dtype=jnp.int32)), num_keys=1)
))

print("== gather/scatter layouts ==", file=sys.stderr)
timeit("take flat (R,)", jax.jit(lambda: jnp.take(flat, perm_idx)))
timeit("take planar (8,R) axis=1", jax.jit(
    lambda: jnp.take(planar8, perm_idx, axis=1)
))
timeit("take rows (R,8) axis=0", jax.jit(
    lambda: jnp.take(rows8, perm_idx, axis=0)
))
timeit("take rows (R,16) axis=0", jax.jit(
    lambda: jnp.take(rows16, perm_idx, axis=0)
))
timeit("scatter flat i32 .at[].set", jax.jit(
    lambda: jnp.zeros((R,), jnp.int32).at[perm_idx].set(
        jnp.arange(R, dtype=jnp.int32)
    )
))
timeit("scatter rows (R,16) .at[].set", jax.jit(
    lambda: jnp.zeros((R, 16), jnp.float32).at[perm_idx].set(rows16)
))

print("== counting-sort position machinery ==", file=sys.stderr)
L = 1024
Rr = R // L
act = (jax.random.uniform(key, (R,)) < 0.35)
jax.block_until_ready(act)


@jax.jit
def rank_two_bucket(active):
    a = active.reshape(Rr, L).astype(jnp.int32)
    within = jnp.cumsum(a, axis=1)
    row_tot = within[:, -1]
    row_off = jnp.cumsum(row_tot) - row_tot
    rank_act = row_off[:, None] + within - 1  # rank among actives
    n_act = row_off[-1] + row_tot[-1]
    ia = 1 - a
    within_i = jnp.cumsum(ia, axis=1)
    row_tot_i = within_i[:, -1]
    row_off_i = jnp.cumsum(row_tot_i) - row_tot_i
    rank_ina = n_act + row_off_i[:, None] + within_i - 1
    pos = jnp.where(a > 0, rank_act, rank_ina).reshape(-1)
    return pos, n_act


timeit("2-bucket positions (cumsum)", lambda: rank_two_bucket(act))

oct3 = jax.random.randint(key, (R,), 0, 8, dtype=jnp.int32)


@jax.jit
def rank_16_bucket(active, octant):
    k = jnp.where(active, octant, 8).reshape(Rr, L)  # 0..8 (8 = dead)
    onehot = (k[None, :, :] == jnp.arange(9, dtype=jnp.int32)[:, None, None])
    oh = onehot.astype(jnp.int32)  # (9, Rr, L)
    within = jnp.cumsum(oh, axis=2)
    row_tot = within[:, :, -1]  # (9, Rr)
    row_off = jnp.cumsum(row_tot, axis=1) - row_tot
    bucket_tot = row_off[:, -1] + row_tot[:, -1]  # (9,)
    bucket_off = jnp.cumsum(bucket_tot) - bucket_tot
    pos_b = bucket_off[:, None, None] + row_off[:, :, None] + within - 1
    pos = jnp.sum(jnp.where(onehot, pos_b, 0), axis=0).reshape(-1)
    return pos


timeit("9-bucket positions (cumsum)", lambda: rank_16_bucket(act, oct3))

print("== traversal value ==", file=sys.stderr)
rt = options.wide_ray_tile
prec = "bf16x3"
closest = jax.jit(
    lambda o, d: intersect_closest_wide(
        pack.wide, o, d, ray_tile=rt, precision=prec
    )
)
anyhit = jax.jit(
    lambda o, d: intersect_any_wide(
        pack.wide_occl, o, d, t_max=10.0, ray_tile=rt, precision=prec
    )
)
rd = jax.random.normal(key, (3, R))
rd = rd / jnp.linalg.norm(rd, axis=0)
rnd_dir = Vec3(rd[0], rd[1], rd[2])
t, tid, hit = closest(org, dirn)
hit_p = org + dirn * jnp.where(hit, t, 1.0)

lo = jnp.min(pack.accel.tri_min, axis=1)
hi = jnp.max(pack.accel.tri_max, axis=1)

# Realistic depth-3 wavefront: 35% active, dead rays parked.
PARK = 3.0e37
zeros = jnp.zeros((R,), jnp.float32)
p_org = Vec3.where(act, hit_p, PARK)
p_dir = Vec3.where(act, rnd_dir, Vec3(zeros + 1.0, zeros, zeros))
jax.block_until_ready(p_org.x)

timeit("closest bounce all-active unsorted", lambda: closest(hit_p, rnd_dir))
timeit("closest bounce 35%-act unsorted", lambda: closest(p_org, p_dir))


@jax.jit
def full_sort(o, d, active):
    keyv = _wavefront_sort_key(o, d, active, lo, hi)
    order = jnp.argsort(keyv)
    perm = lambda a: jnp.take(a, order)
    return o.map(perm), d.map(perm)


so, sd = full_sort(p_org, p_dir, act)
jax.block_until_ready(so.x)
timeit("closest bounce 35%-act full-sorted", lambda: closest(so, sd))


@jax.jit
def octant_sort(o, d, active):
    octant = (
        (d.x >= 0).astype(jnp.int32)
        | ((d.y >= 0).astype(jnp.int32) << 1)
        | ((d.z >= 0).astype(jnp.int32) << 2)
    )
    pos = rank_16_bucket(active, octant)
    inv = jnp.zeros((R,), jnp.int32).at[pos].set(jnp.arange(R, dtype=jnp.int32))
    perm = lambda a: jnp.take(a, inv)
    return o.map(perm), d.map(perm)


oo, od = octant_sort(p_org, p_dir, act)
jax.block_until_ready(oo.x)
timeit("closest bounce 35%-act octant-bucketed", lambda: closest(oo, od))


@jax.jit
def compact_only(o, d, active):
    pos, _ = rank_two_bucket(active)
    inv = jnp.zeros((R,), jnp.int32).at[pos].set(jnp.arange(R, dtype=jnp.int32))
    perm = lambda a: jnp.take(a, inv)
    return o.map(perm), d.map(perm)


co, cd = compact_only(p_org, p_dir, act)
jax.block_until_ready(co.x)
timeit("closest bounce 35%-act compacted", lambda: closest(co, cd))

timeit("any-hit 35%-act unsorted", lambda: anyhit(p_org, p_dir))
timeit("any-hit 35%-act octant-bucketed", lambda: anyhit(oo, od))

print("== end-to-end reorder bursts ==", file=sys.stderr)
timeit("burst: full_sort (argsort + 6 takes)", lambda: full_sort(p_org, p_dir, act))
timeit("burst: octant_sort (cumsum + 6 takes)", lambda: octant_sort(p_org, p_dir, act))
timeit("burst: compact_only (cumsum + 6 takes)", lambda: compact_only(p_org, p_dir, act))
