"""On-chip validation + sweep of the wide (arity-8) BVH kernels.

Compares against the flat-chunk Pallas kernels on the bench config
(Cornell 1080p): correctness on real hardware (Mosaic, not interpret), then
a throughput sweep over ray_tile / leaf_size / precision on primary and
real-bounce wavefronts.
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
from heatray_tpu.ops import build_woop
from heatray_tpu.ops.intersect_pallas import (
    intersect_closest_pallas,
    pack_for_pallas,
)
from heatray_tpu.ops.wide_bvh import (
    build_wide_bvh,
    intersect_any_wide,
    intersect_closest_wide,
)
from heatray_tpu.render.integrator import generate_primary_rays, make_context
from heatray_tpu.scene.builtin import cornell_box
from heatray_tpu.vec import Vec3

W, H = 1920, 1080
R = W * H
K = 4

options = RenderOptions(width=W, height=H, max_render_passes=8, max_ray_depth=4)
scene = cornell_box(light="both", with_spheres=True)
camera = orbit_camera(W, H, distance=6.2, focal_length_mm=35.0)
ctx = make_context(options, scene)
accel = jax.jit(build_woop)(scene.geometry.positions, scene.geometry.indices)
packed = pack_for_pallas(accel)

org, dirn, seq_id, seq_off = jax.jit(
    lambda: generate_primary_rays(camera, ctx.tables, options, 0)
)()
jax.block_until_ready(org.x)

# Incoherent bounce approximation: random dirs from primary hit points.
t0_, tid0, hit0 = intersect_closest_pallas(packed, org, dirn)
rd = jax.random.normal(jax.random.key(0), (3, R))
rd = rd / jnp.linalg.norm(rd, axis=0)
rnd_dir = Vec3(rd[0], rd[1], rd[2])
hit_p = org + dirn * jnp.where(hit0, t0_, 1.0)
jax.block_until_ready(hit_p.x)


def chain_time(name, step, init, args=(), k=K):
    f = jax.jit(
        lambda c, *a: jax.lax.fori_loop(0, k, lambda i, c: step(c, *a), c)
    )
    out = f(init, *args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    t0 = time.time()
    out = f(init, *args)
    np.asarray(np.ravel(jax.tree.leaves(out)[0])[:8])
    dt = (time.time() - t0) / k
    print(f"{name:52s} {dt*1e3:8.2f} ms ({R/dt/1e6:7.1f} Mr/s)", file=sys.stderr)
    return dt


# --- correctness on real hardware -----------------------------------------
bvh32 = build_wide_bvh(accel, leaf_size=32)
print(f"tris={accel.num_triangles} wide nodes={bvh32.num_nodes} "
      f"chunks={bvh32.num_chunks}", file=sys.stderr)
tw, idw, hw = intersect_closest_wide(bvh32, org, dirn, ray_tile=512)
hr = np.asarray(hit0)
hwn = np.asarray(hw)
agree = (hr == hwn).mean()
m = hr & hwn
t_ok = np.allclose(np.asarray(t0_)[m], np.asarray(tw)[m], rtol=1e-4, atol=1e-4)
print(f"closest agree={agree:.6f} t_ok={t_ok}", file=sys.stderr)
assert agree > 0.9999 and t_ok, "wide kernel disagrees on-chip"

HI = jax.lax.Precision.HIGHEST
HG = "bf16x3"  # manual hi/lo-split schedule (Mosaic has no HIGH lowering)
DF = jax.lax.Precision.DEFAULT

mode = sys.argv[1] if len(sys.argv) > 1 else "all"


def sweep(bvh, o, d, label, rt, prec):
    def step(c, bvh, o, d):
        oo = o + Vec3(c * 0.0, c * 0.0, c * 0.0)
        t, tid, hit = intersect_closest_wide(
            bvh, oo, d, ray_tile=rt, precision=prec
        )
        return t * 0.0
    return chain_time(f"wide closest {label} rt={rt} {prec}", step,
                      jnp.zeros((R,)), args=(bvh, o, d))


def sweep_any(bvh, o, d, label, rt, prec):
    def step(c, bvh, o, d):
        oo = o + Vec3(c * 0.0, c * 0.0, c * 0.0)
        b = intersect_any_wide(bvh, oo, d, t_max=10.0, ray_tile=rt,
                               precision=prec)
        return b.astype(jnp.float32) * 0.0
    return chain_time(f"wide any {label} rt={rt} {prec}", step,
                      jnp.zeros((R,)), args=(bvh, o, d))


if mode in ("all", "sweep"):
    for leaf in (16, 32, 64):
        bvh = build_wide_bvh(accel, leaf_size=leaf) if leaf != 32 else bvh32
        for rt in (256, 512, 1024):
            sweep(bvh, org, dirn, f"PRIMARY leaf={leaf}", rt, HI)
    for rt in (256, 512):
        sweep(bvh32, hit_p, rnd_dir, "BOUNCE leaf=32", rt, HI)
    sweep_any(bvh32, hit_p, rnd_dir, "BOUNCE leaf=32", 512, HI)

if mode in ("all", "prec"):
    for prec in (HI, HG, DF):
        sweep(bvh32, org, dirn, "PRIMARY leaf=32", 512, prec)
    # accuracy check per precision
    for prec in (HG, DF):
        tp, idp, hp = intersect_closest_wide(
            bvh32, org, dirn, ray_tile=512, precision=prec
        )
        hpn = np.asarray(hp)
        agree = (hr == hpn).mean()
        m2 = hr & hpn
        terr = np.abs(np.asarray(tp)[m2] - np.asarray(t0_)[m2])
        rel = terr / np.maximum(np.asarray(t0_)[m2], 1e-6)
        print(f"prec={prec}: hit agree={agree:.6f} max_rel_t={rel.max():.2e}",
              file=sys.stderr)

if mode in ("all", "sorted"):
    # Morton+octant sorted bounce rays (what the integrator will feed).
    lo = jnp.array([jnp.min(hit_p.x), jnp.min(hit_p.y), jnp.min(hit_p.z)])
    hi = jnp.array([jnp.max(hit_p.x), jnp.max(hit_p.y), jnp.max(hit_p.z)])

    def q(c, l, h, bits=6):
        return jnp.clip(
            ((c - l) / jnp.maximum(h - l, 1e-6) * (1 << bits)).astype(jnp.int32),
            0, (1 << bits) - 1,
        )

    def part1by2(x):
        x &= 0x3F
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    qx = q(hit_p.x, lo[0], hi[0])
    qy = q(hit_p.y, lo[1], hi[1])
    qz = q(hit_p.z, lo[2], hi[2])
    morton = part1by2(qx) | (part1by2(qy) << 1) | (part1by2(qz) << 2)
    octant = (
        (rnd_dir.x >= 0).astype(jnp.int32)
        | ((rnd_dir.y >= 0).astype(jnp.int32) << 1)
        | ((rnd_dir.z >= 0).astype(jnp.int32) << 2)
    )
    key = (octant << 18) | morton
    order = jnp.argsort(key)
    so = hit_p.map(lambda c: jnp.take(c, order))
    sd = rnd_dir.map(lambda c: jnp.take(c, order))
    jax.block_until_ready(so.x)
    for rt in (256, 512):
        sweep(bvh32, so, sd, "BOUNCE-SORTED leaf=32", rt, HI)
    bvh16 = build_wide_bvh(accel, leaf_size=16)
    sweep(bvh16, so, sd, "BOUNCE-SORTED leaf=16", 512, HI)
    sweep(bvh32, so, sd, "BOUNCE-SORTED leaf=32", 512, HG)
    sweep(bvh16, so, sd, "BOUNCE-SORTED leaf=16", 512, HG)
    sweep_any(bvh32, so, sd, "BOUNCE-SORTED leaf=32", 512, HG)

print("DONE", file=sys.stderr)
