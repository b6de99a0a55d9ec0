"""Microbenchmark: VPU outer-product leaf test vs the MXU pair test.

The probe showed leaf processing is ~83% of wide-BVH traversal time, and the
MXU schedule (K=4 contraction x 6 bf16 passes for f32-exact HIGHEST) is the
cost.  Candidate replacement: a TRANSPOSED pair matrix (rays on sublanes,
triangles on lanes) where the Woop affine is 13 VPU broadcast-FMA ops on
(Rt, 3Tc) tiles — exact f32, no MXU at all:

    po'[r, j] = ox[r]*W0[j] + oy[r]*W1[j] + oz[r]*W2[j] + W3[j]

with ox as an (Rt, 1) column (from one per-tile ray transpose) and Wk as the
(1, 3Tc) rows the chunk layout already stores.

This script brute-forces the bench scene's chunks three ways (MXU HIGHEST,
MXU bf16x3, VPU transposed) at leaf sizes 128/256/512, checks agreement, and
prints pair-test throughput.  Verdict drives whether wide_bvh switches its
leaf math to the VPU form.

Usage: python tpu_vpu_leaf.py [interpret]
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
from heatray_tpu.ops import build_woop
from heatray_tpu.ops.intersect import WoopAccel
from heatray_tpu.ops.intersect_pallas import (
    MISS_T,
    _pack_rays,
    _pair_hits,
    _row_spec,
    _rays_spec,
)
from heatray_tpu.render.integrator import generate_primary_rays, make_context
from heatray_tpu.scene.builtin import cornell_box

INTERPRET = len(sys.argv) > 1 and sys.argv[1] == "interpret"
_DZ_EPS = 1e-15
_BARY_EPS = 1e-6

if INTERPRET:
    jax.config.update("jax_platforms", "cpu")

W, H = (1920, 1080) if not INTERPRET else (64, 64)
R = W * H

options = RenderOptions(width=W, height=H, max_render_passes=8, max_ray_depth=4)
scene = cornell_box(light="both", with_spheres=True)
camera = orbit_camera(W, H, distance=6.2, focal_length_mm=35.0)
ctx = make_context(options, scene)
accel = jax.jit(build_woop)(scene.geometry.positions, scene.geometry.indices)
T = accel.num_triangles

org, dirn, *_ = jax.jit(
    lambda: generate_primary_rays(camera, ctx.tables, options, 0)
)()
jax.block_until_ready(org.x)


def pack_chunks(accel: WoopAccel, tc: int):
    """(12, T) Woop rows -> (C, 4, 3*Tc) chunk layout (same as wide_bvh)."""
    t = accel.w.shape[1]
    c = -(-t // tc)
    w = jnp.pad(accel.w, ((0, 0), (0, c * tc - t)))
    w = w.reshape(12, c, tc).transpose(1, 0, 2)
    w = w.reshape(c, 3, 4, tc).transpose(0, 2, 1, 3).reshape(c, 4, 3 * tc)
    return jnp.asarray(w)


# --- MXU brute-force kernel (existing _pair_hits) ---------------------------


def _mxu_kernel(tc, nc, t_min, precision, rays_ref, w_ref, t_ref):
    rays = rays_ref[...]
    rt = rays.shape[1]

    def body(c, best):
        tm = _pair_hits(rays, w_ref[c], tc, t_min, best, precision)
        return jnp.minimum(best, jnp.min(tm, axis=0, keepdims=True))

    best = jax.lax.fori_loop(0, nc, body, jnp.full((1, rt), MISS_T, jnp.float32))
    t_ref[...] = best


# --- VPU transposed kernel --------------------------------------------------


def _vpu_pair_hits_t(raysT, wm, tc, t_min, t_max_col):
    """Transposed pair math: (Rt, 8) rays x (4, 3Tc) chunk -> (Rt, Tc) t.

    13 broadcast FMA/mul/add VPU ops on (Rt, 3Tc), all exact f32.
    """
    ox = raysT[:, 0:1]
    oy = raysT[:, 1:2]
    oz = raysT[:, 2:3]
    dx = raysT[:, 4:5]
    dy = raysT[:, 5:6]
    dz = raysT[:, 6:7]
    w0 = wm[0:1, :]  # (1, 3Tc)
    w1 = wm[1:2, :]
    w2 = wm[2:3, :]
    w3 = wm[3:4, :]
    po = ox * w0 + oy * w1 + oz * w2 + w3  # (Rt, 3Tc)
    pd = dx * w0 + dy * w1 + dz * w2
    ob1, ob2, os_ = po[:, :tc], po[:, tc : 2 * tc], po[:, 2 * tc :]
    db1, db2, ds = pd[:, :tc], pd[:, tc : 2 * tc], pd[:, 2 * tc :]
    dz_ok = jnp.abs(ds) > _DZ_EPS
    t = jnp.where(dz_ok, -os_ / jnp.where(dz_ok, ds, 1.0), MISS_T)
    b1 = ob1 + t * db1
    b2 = ob2 + t * db2
    valid = (
        dz_ok
        & (b1 >= -_BARY_EPS)
        & (b2 >= -_BARY_EPS)
        & (b1 + b2 <= 1.0 + _BARY_EPS)
        & (t > t_min)
        & (t < t_max_col)
    )
    return jnp.where(valid, t, MISS_T)


def _vpu_kernel(tc, nc, t_min, rays_ref, w_ref, t_ref):
    rays = rays_ref[...]  # (8, Rt)
    rt = rays.shape[1]
    raysT = rays.T  # ONE transpose per tile, amortized over all chunks

    def body(c, best):  # best: (Rt, 1)
        tm = _vpu_pair_hits_t(raysT, w_ref[c], tc, t_min, best)
        return jnp.minimum(best, jnp.min(tm, axis=1, keepdims=True))

    best = jax.lax.fori_loop(0, nc, body, jnp.full((rt, 1), MISS_T, jnp.float32))
    t_ref[...] = best.T


def run_mxu(w, tc, rt, precision):
    nc = w.shape[0]
    rays, n_tiles, r = _pack_rays(org, dirn, rt)
    f = pl.pallas_call(
        functools.partial(_mxu_kernel, tc, nc, 1e-4, precision),
        grid=(n_tiles,),
        in_specs=[_rays_spec(rt), pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=_row_spec(rt),
        out_shape=jax.ShapeDtypeStruct((1, n_tiles * rt), jnp.float32),
        interpret=INTERPRET,
    )
    return jax.jit(lambda: f(rays, w)[0, :r])


def run_vpu(w, tc, rt):
    nc = w.shape[0]
    rays, n_tiles, r = _pack_rays(org, dirn, rt)
    f = pl.pallas_call(
        functools.partial(_vpu_kernel, tc, nc, 1e-4),
        grid=(n_tiles,),
        in_specs=[_rays_spec(rt), pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=_row_spec(rt),
        out_shape=jax.ShapeDtypeStruct((1, n_tiles * rt), jnp.float32),
        interpret=INTERPRET,
    )
    return jax.jit(lambda: f(rays, w)[0, :r])


def timeit(name, fn, pairs, n=8):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.time()
    np.asarray(fn())
    t1 = time.time() - t0
    t0 = time.time()
    for _ in range(n):
        o = fn()
    np.asarray(o)
    tn = time.time() - t0
    dt = (tn - t1) / (n - 1)
    print(
        f"{name:36s} {dt*1e3:9.2f} ms  ({pairs/dt/1e9:7.2f} Gpairs/s)"
    )
    return dt, out


if INTERPRET:
    # Correctness only: tiny config.
    tc, rt = 128, 256
    w = pack_chunks(accel, tc)
    t_m = np.asarray(run_mxu(w, tc, rt, jax.lax.Precision.HIGHEST)())
    t_v = np.asarray(run_vpu(w, tc, rt)())
    hit_m, hit_v = t_m < MISS_T, t_v < MISS_T
    assert (hit_m == hit_v).mean() > 0.999, (hit_m != hit_v).sum()
    m = hit_m & hit_v
    np.testing.assert_allclose(t_m[m], t_v[m], rtol=1e-5, atol=1e-6)
    print("interpret correctness OK:", m.sum(), "hits agree")
    sys.exit(0)

print(f"tris={T}, rays={R}")
for tc in (128, 256, 512):
    w = pack_chunks(accel, tc)
    nc = w.shape[0]
    pairs = R * nc * tc
    for rt in (256, 512):
        base = f"tc={tc} rt={rt}"
        _, t_hi = timeit(
            f"MXU HIGHEST {base}", run_mxu(w, tc, rt, jax.lax.Precision.HIGHEST), pairs
        )
        timeit(f"MXU bf16x3  {base}", run_mxu(w, tc, rt, "bf16x3"), pairs)
        _, t_vp = timeit(f"VPU transp  {base}", run_vpu(w, tc, rt), pairs)
        a, b = np.asarray(t_hi), np.asarray(t_vp)
        m = (a < MISS_T) & (b < MISS_T)
        agree = ((a < MISS_T) == (b < MISS_T)).mean()
        err = np.abs(a[m] - b[m]).max() if m.any() else 0.0
        print(f"   VPU vs HIGHEST: hit agree {agree:.6f}, max |dt| {err:.2e}")
