"""Per-stage profiling of one render pass on the real TPU chip.

Times, in isolation: closest-hit, any-hit, shading-only (row gather +
shade_hits), and the full pass, at the bench config (Cornell 1080p depth 4).
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/heatray_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from heatray_tpu.camera import orbit_camera
from heatray_tpu.options import FrameGlobals, RenderOptions
from heatray_tpu.ops.intersect import build_woop
from heatray_tpu.ops.intersect_pallas import (
    intersect_any_pallas,
    intersect_closest_pallas,
    pack_for_pallas,
)
from heatray_tpu.render.integrator import (
    generate_primary_rays,
    make_context,
    render_pass,
)
from heatray_tpu.scene.builtin import cornell_box
from heatray_tpu.vec import Vec3

W, H, DEPTH = 1920, 1080, 4
R = W * H

options = RenderOptions(width=W, height=H, max_render_passes=8, max_ray_depth=DEPTH)
scene = cornell_box(light="both", with_spheres=True)
camera = orbit_camera(W, H, distance=6.2, focal_length_mm=35.0)
ctx = make_context(options, scene)
accel = jax.jit(build_woop)(scene.geometry.positions, scene.geometry.indices)
packed = pack_for_pallas(accel)
print(f"tris={accel.num_triangles} chunks={packed.num_chunks}", file=sys.stderr)

org, dirn, seq_id, seq_off = jax.jit(
    lambda: generate_primary_rays(camera, ctx.tables, options, 0)
)()
jax.block_until_ready(org.x)


def timeit(name, fn, n=8):
    out = fn()
    jax.block_until_ready(jax.tree.leaves(out))
    t0 = time.time()
    o1 = None
    for _ in range(1):
        o1 = fn()
    np.asarray(jax.tree.leaves(o1)[0])
    t1 = time.time() - t0
    t0 = time.time()
    for _ in range(n):
        o1 = fn()
    np.asarray(jax.tree.leaves(o1)[0])
    tn = time.time() - t0
    dt = (tn - t1) / (n - 1)
    print(f"{name:30s} {dt*1e3:9.2f} ms  ({R/dt/1e6:8.1f} Mrays/s)", file=sys.stderr)
    return dt


closest = jax.jit(lambda o, d: intersect_closest_pallas(packed, o, d))
anyhit = jax.jit(lambda o, d: intersect_any_pallas(packed, o, d, t_max=10.0))

timeit("closest primary (2.07M rays)", lambda: closest(org, dirn))

# Incoherent rays: random directions from hit points (approximate bounce).
key = jax.random.key(0)
rd = jax.random.normal(key, (3, R))
rd = rd / jnp.linalg.norm(rd, axis=0)
rnd_dir = Vec3(rd[0], rd[1], rd[2])
t, tid, hit = closest(org, dirn)
hit_p = org + dirn * jnp.where(hit, t, 1.0)
timeit("closest bounce (incoherent)", lambda: closest(hit_p, rnd_dir))
timeit("any-hit shadow", lambda: anyhit(hit_p, rnd_dir))

# Full pass
frame = FrameGlobals.create(2)
accum = jnp.zeros((4, H, W), jnp.float32)
full = jax.jit(lambda a, f: render_pass(scene, camera, ctx, options, f, a))
dt_full = timeit("full pass (depth 4)", lambda: full(accum, frame), n=4)
rays_per_pass = R * (2 * DEPTH)  # approx
print(
    f"full-pass approx: {rays_per_pass/dt_full/1e6:.1f} Mrays/s "
    f"(assuming {rays_per_pass/1e6:.0f}M rays/pass)",
    file=sys.stderr,
)
