"""Per-stage profiling of one render pass on the real TPU chip.

Times, in isolation, on the bench config (Cornell 1080p depth 4):
- wide-BVH closest-hit on coherent primary rays
- wide-BVH closest-hit on incoherent bounce rays, unsorted and sorted
- wide-BVH any-hit (shadow rays)
- the wavefront sort itself (argsort + permutes)
- shading only (row gather + shade_hits)
- the full pass

Usage: python profile_stages.py [backend]   (backend: wide|pallas|bvh)
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
from heatray_tpu.render.integrator import (
    _wavefront_sort_key,
    build_accel,
    generate_primary_rays,
    make_context,
    render_pass,
)
from heatray_tpu.render.shade import shade_hits
from heatray_tpu.render.shade_table import gather_rows, hit_attributes_rows
from heatray_tpu.scene.builtin import cornell_box
from heatray_tpu.vec import Vec3

W, H, DEPTH = 1920, 1080, 4
R = W * H
BACKEND = sys.argv[1] if len(sys.argv) > 1 else "wide"

options = RenderOptions(
    width=W, height=H, max_render_passes=8, max_ray_depth=DEPTH,
    intersect_backend=BACKEND,
)
scene = cornell_box(light="both", with_spheres=True)
camera = orbit_camera(W, H, distance=6.2, focal_length_mm=35.0)
ctx = make_context(options, scene)
pack = ctx.accel_pack
print(
    f"backend={pack.backend} tris={pack.accel.num_triangles}", file=sys.stderr
)

org, dirn, seq_id, seq_off = jax.jit(
    lambda: generate_primary_rays(camera, ctx.tables, options, 0)
)()
jax.block_until_ready(org.x)


def timeit(name, fn, n=8, rays=R):
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
    print(
        f"{name:34s} {dt*1e3:9.2f} ms  ({rays/dt/1e6:8.1f} Mrays/s)",
        file=sys.stderr,
    )
    return dt


if BACKEND == "wide":
    from heatray_tpu.ops.wide_bvh import intersect_any_wide, intersect_closest_wide

    rt = options.wide_ray_tile
    prec = (
        "bf16x3" if options.wide_precision == "bf16x3"
        else jax.lax.Precision.HIGHEST
    )
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
else:
    from heatray_tpu.ops.intersect_pallas import (
        intersect_any_pallas,
        intersect_closest_pallas,
    )

    closest = jax.jit(lambda o, d: intersect_closest_pallas(pack.packed, o, d))
    anyhit = jax.jit(
        lambda o, d: intersect_any_pallas(pack.packed_occl, o, d, t_max=10.0)
    )

timeit("closest primary (coherent)", lambda: closest(org, dirn))

# Incoherent rays: random directions from hit points (approximate bounce).
key = jax.random.key(0)
rd = jax.random.normal(key, (3, R))
rd = rd / jnp.linalg.norm(rd, axis=0)
rnd_dir = Vec3(rd[0], rd[1], rd[2])
t, tid, hit = closest(org, dirn)
hit_p = org + dirn * jnp.where(hit, t, 1.0)
timeit("closest bounce (unsorted)", lambda: closest(hit_p, rnd_dir))

# Sorted bounce: octant+Morton order (what the integrator actually traces).
lo = jnp.min(pack.accel.tri_min, axis=1)
hi = jnp.max(pack.accel.tri_max, axis=1)


@jax.jit
def sort_rays(o, d):
    keyv = _wavefront_sort_key(o, d, jnp.ones(o.x.shape, bool), lo, hi)
    order = jnp.argsort(keyv)
    perm = lambda a: jnp.take(a, order)
    return o.map(perm), d.map(perm)


so, sd = sort_rays(hit_p, rnd_dir)
jax.block_until_ready(so.x)
timeit("closest bounce (sorted)", lambda: closest(so, sd))
timeit("wavefront sort (key+argsort+perm)", lambda: sort_rays(hit_p, rnd_dir))
timeit("any-hit shadow (unsorted)", lambda: anyhit(hit_p, rnd_dir))
timeit("any-hit shadow (sorted)", lambda: anyhit(so, sd))

# Shading only: fat row gather + full shade math at the primary hits.
shade_table = pack.shade_table


@jax.jit
def shade_only():
    rows = gather_rows(shade_table, jnp.maximum(tid, 0))
    t_d, b1, b2 = hit_attributes_rows(rows, org, dirn, hit)
    t_sane = jnp.where(hit, t_d, 1.0)
    front = jnp.ones(hit.shape, bool)
    return shade_hits(
        scene, ctx.ms_lut, ctx.tables, 0, 1, org, dirn,
        Vec3.ones(hit.shape), jnp.ones(hit.shape, bool), seq_id, seq_off,
        rows, t_sane, b1, b2, front, hit,
        max_ray_depth=DEPTH, rr_start_depth=3, sample_mode="sobol",
    )


timeit("shade (gather+BSDF+NEE select)", lambda: shade_only())

# Full pass
frame = FrameGlobals.create(2)
accum = jnp.zeros((4, H, W), jnp.float32)
full = jax.jit(lambda a, f: render_pass(scene, camera, ctx, options, f, a))
_, stats = render_pass(
    scene, camera, ctx, options, frame, accum, with_stats=True
)
rays_per_pass = int(stats["rays"])
dt_full = timeit(
    "full pass (depth 4)", lambda: full(accum, frame), n=4, rays=rays_per_pass
)
print(
    f"full pass: {rays_per_pass/1e6:.1f}M rays -> "
    f"{rays_per_pass/dt_full/1e6:.1f} Mrays/s",
    file=sys.stderr,
)
