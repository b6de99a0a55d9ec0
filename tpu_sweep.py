"""Sweep BVH kernel parameters + shade components on REAL bounce wavefronts.

Timing method: K chained iterations inside ONE jit (each iteration's output
perturbs the next input by *0.0, forcing serialization), so remote-tunnel
fetch noise cancels.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/heatray_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from heatray_tpu.camera import orbit_camera
from heatray_tpu.options import FrameGlobals, RenderOptions
from heatray_tpu.ops import build_woop
from heatray_tpu.ops.bvh import build_bvh
from heatray_tpu.ops.traverse_pallas import intersect_any_bvh, intersect_closest_bvh
from heatray_tpu.render.integrator import (
    _make_wide_intersectors,
    _offset_origin,
    _park_dead,
    make_context,
)
from heatray_tpu.render.shade import shade_hits
from heatray_tpu.render.shade_table import GEO_N, HitRows, gather_rows, hit_attributes_rows
from heatray_tpu.render.integrator import generate_primary_rays
from heatray_tpu.scene.builtin import cornell_box
from heatray_tpu.vec import Vec3

W, H = 1920, 1080
R = W * H
K = 6  # chained iterations

options = RenderOptions(width=W, height=H, max_render_passes=8, max_ray_depth=4)
scene = cornell_box(light="both", with_spheres=True)
camera = orbit_camera(W, H, distance=6.2, focal_length_mm=35.0)
ctx = make_context(options, scene)
pack = ctx.accel_pack
accel = pack.accel

org, dirn, seq_id, seq_off = jax.jit(
    lambda: generate_primary_rays(camera, ctx.tables, options, 0)
)()

# Real bounce-1 wavefront: shade the primaries, take the extension rays.
closest_fn, any_fn = _make_wide_intersectors(pack, options)
t, tid, hit = closest_fn(org, dirn, 1e-4)
rows_arr = jnp.take(pack.shade_table, jnp.maximum(tid, 0), axis=0, mode="clip")
rows = HitRows(rows_arr)
t_d, b1, b2 = hit_attributes_rows(rows, org, dirn, hit)
t_sane = jnp.where(hit, t_d, 1.0)
res = jax.jit(
    lambda org, dirn, rows_arr, t_sane, b1, b2, front, hit: shade_hits(
        scene, ctx.ms_lut, ctx.tables, 0, jnp.int32(1), org, dirn,
        Vec3.ones((R,)), jnp.ones((R,), bool), seq_id, seq_off,
        HitRows(rows_arr), t_sane, b1, b2, front, hit,
        max_ray_depth=4, rr_start_depth=3, sample_mode="sobol",
    )
)(org, dirn, rows_arr, t_sane, b1, b2, front, hit)
p = org + dirn * t_sane
geo_n = rows.vec(GEO_N)
b_org, b_dir = _park_dead(
    _offset_origin(p, geo_n, res.ext_dir, 1e-4), res.ext_dir, res.ext_active
)
jax.block_until_ready(b_org.x)
n_active = int(jnp.sum(res.ext_active))
print(f"bounce wavefront: {n_active}/{R} active", file=sys.stderr)


def chain_time(name, step, init, k=K, args=()):
    """step: (carry, *args) -> carry with real data dependency.  Big arrays
    must arrive via ``args`` (jit params), not closures: closed-over
    constants serialize into the remote compile request (HTTP 413)."""
    f = jax.jit(
        lambda c, *a: jax.lax.fori_loop(0, k, lambda i, c: step(c, *a), c)
    )
    out = f(init, *args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    t0 = time.time()
    out = f(init, *args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    np.asarray(np.ravel(jax.tree.leaves(out)[0])[:8])
    dt = (time.time() - t0) / k
    print(f"{name:46s} {dt*1e3:8.2f} ms ({R/dt/1e6:7.1f} Mr/s)", file=sys.stderr)
    return dt


def sweep_closest(bvh, o, d, label, ray_tile, prec):
    def step(c, bvh, o, d):
        oo = o + Vec3(c * 0.0, c * 0.0, c * 0.0)
        t, tid, hit = intersect_closest_bvh(
            bvh, oo, d, ray_tile=ray_tile, precision=prec
        )
        return t * 0.0
    return chain_time(f"closest {label} rt={ray_tile} {prec}", step,
                      jnp.zeros((R,)), args=(bvh, o, d))


HI = jax.lax.Precision.HIGHEST
HG = jax.lax.Precision.HIGH

mode = sys.argv[1] if len(sys.argv) > 1 else "all"

if mode in ("all", "traverse"):
    for leaf in (32, 64, 128):
        bvh = build_bvh(accel, leaf_size=leaf) if leaf != 64 else pack.bvh
        for rt in (256, 512, 1024):
            sweep_closest(bvh, b_org, b_dir, f"leaf={leaf}", rt, HI)
    bvh64 = pack.bvh
    # sorted variant: order bounce rays by parent-hit chunk id
    key = jnp.where(hit, tid // 64, 1 << 30)
    order = jnp.argsort(key)
    so = b_org.map(lambda c: jnp.take(c, order))
    sd = b_dir.map(lambda c: jnp.take(c, order))
    jax.block_until_ready(so.x)
    sweep_closest(bvh64, so, sd, "leaf=64 SORTED", 512, HI)

    def sort_step(c, key):
        k2 = key + jnp.int32(jnp.sum(c * 0.0))
        order = jnp.argsort(k2)
        return jnp.take(c, order) * 0.0 + c
    chain_time("argsort+take 2M (sort overhead)", sort_step, jnp.zeros((R,)),
               args=(key,))

if mode in ("all", "shade"):
    # Shade total on the bounce wavefront
    def shade_step(c, org, dirn, rows_arr, t_sane, b1, b2, front, hit):
        oo = org + Vec3(c * 0.0, c * 0.0, c * 0.0)
        r = shade_hits(
            scene, ctx.ms_lut, ctx.tables, 0, jnp.int32(1), oo, dirn,
            Vec3.ones((R,)), jnp.ones((R,), bool), seq_id, seq_off,
            HitRows(rows_arr), t_sane, b1, b2, front, hit,
            max_ray_depth=4, rr_start_depth=3, sample_mode="sobol",
        )
        return r.ext_weight.x * 0.0
    chain_time("shade_hits full", shade_step, jnp.zeros((R,)),
               args=(org, dirn, rows_arr, t_sane, b1, b2, front, hit))

    # QMC draws only (5 sequences x 2 values)
    from heatray_tpu.render.shade import make_sequence_lookup
    seq_lookup = make_sequence_lookup(ctx.tables, "sobol")
    def qmc_step(c, seq_id, seq_off):
        acc = c * 0.0
        for k in range(5):
            u, v = seq_lookup(seq_id + 1 + k, seq_off + jnp.int32(acc[0] * 0))
            acc = acc + u + v
        return acc * 0.0
    chain_time("5x QMC sobol draws", qmc_step, jnp.zeros((R,)),
               args=(seq_id, seq_off))

    # Light sampling only
    from heatray_tpu.render.light_sampling import compute_light_sample
    def ls_step(c, geo_n, p):
        u = jnp.clip(c * 0.0 + 0.37, 0.0, 1.0)
        ls = compute_light_sample(scene.lights, geo_n, p, u)
        return ls.direction.x * 0.0
    chain_time("compute_light_sample", ls_step, jnp.zeros((R,)),
               args=(geo_n, p))

    # Row gather only
    def g_step(c, table, tid):
        tt = jnp.maximum(tid + jnp.int32(jnp.sum(c * 0.0)), 0)
        rr = jnp.take(table, tt, axis=0, mode="clip")
        return rr[:, 0] * 0.0
    chain_time("gather rows (R,82)", g_step, jnp.zeros((R,)),
               args=(pack.shade_table, tid))

    # accumulation reshape/update
    def acc_step(c):
        img = jnp.stack([c.reshape(H, W)] * 4, axis=0)
        return img.reshape(4, -1)[0] * 0.0
    chain_time("accum reshape", acc_step, jnp.zeros((R,)))

    # wavefront sort overhead (argsort + permute the full carry: ~12 arrays)
    def sort_step(c, key, o):
        k2 = key + jnp.int32(jnp.sum(c * 0.0))
        order = jnp.argsort(k2)
        outs = [jnp.take(o.x, order), jnp.take(o.y, order), jnp.take(o.z, order)]
        for _ in range(3):
            outs += [jnp.take(o.x, order), jnp.take(o.y, order), jnp.take(o.z, order)]
        return sum(outs) * 0.0 + c
    key0 = jnp.where(hit, tid // 64, 1 << 30)
    chain_time("sort: argsort + 12x take 2M", sort_step, jnp.zeros((R,)),
               args=(key0, b_org))

if mode == "sorted":
    # Strong coherence key: 6-bit Morton of the ray origin within the scene
    # AABB + 3-bit direction octant.  Compare traversal cost on the real
    # bounce wavefront, sorted vs unsorted, across leaf/tile sizes.
    lo = jnp.array([jnp.min(b_org.x), jnp.min(b_org.y), jnp.min(b_org.z)])
    hi = jnp.array([jnp.max(b_org.x), jnp.max(b_org.y), jnp.max(b_org.z)])

    def q(c, l, h, bits=6):
        return jnp.clip(((c - l) / jnp.maximum(h - l, 1e-6) * (1 << bits)).astype(jnp.int32), 0, (1 << bits) - 1)

    def part1by2(x):
        x &= 0x3F
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    qx, qy, qz = q(b_org.x, lo[0], hi[0]), q(b_org.y, lo[1], hi[1]), q(b_org.z, lo[2], hi[2])
    morton = part1by2(qx) | (part1by2(qy) << 1) | (part1by2(qz) << 2)
    octant = ((b_dir.x >= 0).astype(jnp.int32)
              | ((b_dir.y >= 0).astype(jnp.int32) << 1)
              | ((b_dir.z >= 0).astype(jnp.int32) << 2))
    key = (morton << 3) | octant
    key = jnp.where(res.ext_active.reshape(-1), key, jnp.int32(1 << 30))
    order = jnp.argsort(key)
    so = b_org.map(lambda c: jnp.take(c, order))
    sd = b_dir.map(lambda c: jnp.take(c, order))
    jax.block_until_ready(so.x)
    for leaf in (16, 32, 64):
        bvh = build_bvh(accel, leaf_size=leaf) if leaf != 64 else pack.bvh
        for rt in (256, 512):
            sweep_closest(bvh, so, sd, f"MORTON-SORT leaf={leaf}", rt, HI)
    # Unsorted baselines for leaf=16
    bvh16 = build_bvh(accel, leaf_size=16)
    sweep_closest(bvh16, b_org, b_dir, "unsorted leaf=16", 256, HI)

print("DONE", file=sys.stderr)
