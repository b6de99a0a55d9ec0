"""Where does wide-BVH traversal time actually go?  On-chip probe.

Isolates, on the bench scene (Cornell 4.1k tris) and a 2.07M-ray primary
wavefront:
  probe=grid   an empty kernel over the same grid (per-grid-step overhead)
  probe=nodes  the traversal loop with leaf processing disabled
               (node slab tests + stack + scalar loop overhead only)
  probe=leaves brute-force fori_loop over every leaf chunk, no traversal
               (pure pair-test math at the leaf layout)
  probe=full   the shipped kernel
Each at ray_tile in {256, 512, 1024} and leaf_size in {32, 64, 128}.

Usage: python tpu_kernel_probe.py [quick]
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
from heatray_tpu.ops.intersect_pallas import (
    MISS_T,
    _pack_rays,
    _pair_hits,
    _row_spec,
    _rays_spec,
    _tile_inv_dir,
)
from heatray_tpu.ops.wide_bvh import (
    ARITY,
    STACK_DEPTH,
    _children_slab,
    _overlap_bits,
    _smem_spec,
    _tile_axis_signs,
    build_wide_bvh,
    intersect_closest_wide,
)
from heatray_tpu.render.integrator import generate_primary_rays, make_context
from heatray_tpu.scene.builtin import cornell_box

W, H = 1920, 1080
R = W * H
QUICK = len(sys.argv) > 1 and sys.argv[1] == "quick"

options = RenderOptions(width=W, height=H, max_render_passes=8, max_ray_depth=4)
scene = cornell_box(light="both", with_spheres=True)
camera = orbit_camera(W, H, distance=6.2, focal_length_mm=35.0)
ctx = make_context(options, scene)
accel = jax.jit(build_woop)(scene.geometry.positions, scene.geometry.indices)

org, dirn, *_ = jax.jit(
    lambda: generate_primary_rays(camera, ctx.tables, options, 0)
)()
jax.block_until_ready(org.x)


def timeit(name, fn, n=8):
    out = fn()
    jax.block_until_ready(jax.tree.leaves(out))
    t0 = time.time()
    o1 = fn()
    np.asarray(jax.tree.leaves(o1)[0])
    t1 = time.time() - t0
    t0 = time.time()
    for _ in range(n):
        o1 = fn()
    np.asarray(jax.tree.leaves(o1)[0])
    tn = time.time() - t0
    dt = (tn - t1) / (n - 1)
    print(f"{name:44s} {dt*1e3:9.2f} ms  ({R/dt/1e6:8.1f} Mrays/s)")
    return dt


# --- probe kernels -----------------------------------------------------------


def _nodes_kernel(
    t_min, rays_ref, wbox_ref, wchild_ref, waxis_ref, t_ref, stack_ref, best_ref
):
    """Traversal loop WITHOUT leaf processing (nodes + stack only)."""
    rays = rays_ref[...]
    rt = rays.shape[1]
    invx, invy, invz = _tile_inv_dir(rays)
    sx, sy, sz = _tile_axis_signs(rays)
    best_ref[...] = jnp.full((1, rt), MISS_T, jnp.float32)

    def cond(c):
        return c[0] >= 0

    def body(carry):
        i, sp = carry
        boxes = wbox_ref[i]
        ov = _children_slab(boxes, rays, invx, invy, invz, t_min, best_ref[...])
        bits = _overlap_bits(ov)
        push = jnp.int32(0)
        for k in range(ARITY):
            code = wchild_ref[ARITY * i + k]
            live = (((bits >> k) & 1) > 0) & (code >= 0)

            @pl.when(live)
            def _():
                stack_ref[sp + push] = code

            push = push + jnp.where(live, 1, 0)
        sp = sp + push
        has = sp > 0
        top = stack_ref[jnp.maximum(sp - 1, 0)]
        return jnp.where(has, top, -1), jnp.maximum(sp - 1, 0)

    jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0)))
    t_ref[...] = best_ref[...]


def _leaves_kernel(tc, nc, t_min, rays_ref, w_ref, t_ref):
    """Brute-force pair math over every leaf chunk (no traversal)."""
    rays = rays_ref[...]
    rt = rays.shape[1]

    def body(c, best):
        tm = _pair_hits(rays, w_ref[c], tc, t_min, best, jax.lax.Precision.HIGHEST)
        return jnp.minimum(best, jnp.min(tm, axis=0, keepdims=True))

    best = jax.lax.fori_loop(
        0, nc, body, jnp.full((1, rt), MISS_T, jnp.float32)
    )
    t_ref[...] = best


def _empty_kernel(rays_ref, t_ref):
    t_ref[...] = rays_ref[0:1, :] * 0.0


def run_probe(probe, bvh, ray_tile):
    rays, n_tiles, r = _pack_rays(org, dirn, ray_tile)
    out_shape = jax.ShapeDtypeStruct((1, n_tiles * ray_tile), jnp.float32)
    if probe == "grid":
        f = pl.pallas_call(
            _empty_kernel,
            grid=(n_tiles,),
            in_specs=[_rays_spec(ray_tile)],
            out_specs=_row_spec(ray_tile),
            out_shape=out_shape,
        )
        return jax.jit(lambda: f(rays))
    if probe == "nodes":
        f = pl.pallas_call(
            functools.partial(_nodes_kernel, 1e-4),
            grid=(n_tiles,),
            in_specs=[
                _rays_spec(ray_tile),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                _smem_spec(),
                _smem_spec(),
            ],
            out_specs=_row_spec(ray_tile),
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.SMEM((STACK_DEPTH,), jnp.int32),
                pltpu.VMEM((1, ray_tile), jnp.float32),
            ],
        )
        return jax.jit(lambda: f(rays, bvh.wbox, bvh.wchild, bvh.waxis))
    if probe == "leaves":
        tc = bvh.leaf_size
        nc = bvh.num_chunks
        f = pl.pallas_call(
            functools.partial(_leaves_kernel, tc, nc, 1e-4),
            grid=(n_tiles,),
            in_specs=[
                _rays_spec(ray_tile),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=_row_spec(ray_tile),
            out_shape=out_shape,
        )
        return jax.jit(lambda: f(rays, bvh.w))
    # full
    return jax.jit(
        lambda: intersect_closest_wide(bvh, org, dirn, ray_tile=ray_tile)
    )


leaf_sizes = [32] if QUICK else [32, 64, 128]
ray_tiles = [256] if QUICK else [256, 512, 1024]

for ls in leaf_sizes:
    bvh = build_wide_bvh(accel, leaf_size=ls)
    print(
        f"--- leaf={ls}: {bvh.num_nodes} wide nodes, {bvh.num_chunks} chunks"
    )
    for rt in ray_tiles:
        for probe in ("grid", "nodes", "leaves", "full"):
            timeit(f"{probe:7s} leaf={ls} rt={rt}", run_probe(probe, bvh, rt))
