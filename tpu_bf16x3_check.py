"""On-chip check of the re-centered bf16x3 default: speed + accuracy vs the
HIGHEST schedule on the bench scene's primary / sorted-bounce / shadow
wavefronts (leaf 32, rt 256)."""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/heatray_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from heatray_tpu.camera import orbit_camera
from heatray_tpu.options import RenderOptions
from heatray_tpu.ops import build_woop
from heatray_tpu.ops.wide_bvh import (
    build_wide_bvh,
    intersect_any_wide,
    intersect_closest_wide,
)
from heatray_tpu.render.integrator import (
    _wavefront_sort_key,
    generate_primary_rays,
    make_context,
)
from heatray_tpu.scene.builtin import cornell_box
from heatray_tpu.vec import Vec3

W, H = 1920, 1080
R = W * H

options = RenderOptions(width=W, height=H, max_render_passes=8, max_ray_depth=4)
scene = cornell_box(light="both", with_spheres=True)
camera = orbit_camera(W, H, distance=6.2, focal_length_mm=35.0)
ctx = make_context(options, scene)
accel = jax.jit(build_woop)(scene.geometry.positions, scene.geometry.indices)
bvh = build_wide_bvh(accel, leaf_size=32)

org, dirn, *_ = jax.jit(
    lambda: generate_primary_rays(camera, ctx.tables, options, 0)
)()
jax.block_until_ready(org.x)

t0_, tid0, hit0 = intersect_closest_wide(bvh, org, dirn, ray_tile=256)
rd = jax.random.normal(jax.random.key(0), (3, R))
rd = rd / jnp.linalg.norm(rd, axis=0)
rnd_dir = Vec3(rd[0], rd[1], rd[2])
hit_p = org + dirn * jnp.where(hit0, t0_, 1.0)
lo = jnp.min(accel.tri_min, axis=1)
hi = jnp.max(accel.tri_max, axis=1)


@jax.jit
def sort_rays(o, d):
    key = _wavefront_sort_key(o, d, jnp.ones(o.x.shape, bool), lo, hi)
    order = jnp.argsort(key)
    perm = lambda a: jnp.take(a, order)
    return o.map(perm), d.map(perm)


so, sd = sort_rays(hit_p, rnd_dir)
jax.block_until_ready(so.x)


def timeit(name, fn, n=10):
    out = fn()
    jax.block_until_ready(jax.tree.leaves(out))
    t0 = time.time()
    np.asarray(jax.tree.leaves(fn())[0])
    t1 = time.time() - t0
    t0 = time.time()
    for _ in range(n):
        o = fn()
    np.asarray(jax.tree.leaves(o)[0])
    tn = time.time() - t0
    dt = (tn - t1) / (n - 1)
    print(f"{name:40s} {dt*1e3:9.2f} ms  ({R/dt/1e6:8.1f} Mrays/s)")
    return out


for prec, label in ((jax.lax.Precision.HIGHEST, "HIGHEST"), ("bf16x3", "bf16x3")):
    out_p = timeit(
        f"{label} primary",
        jax.jit(lambda p=prec: intersect_closest_wide(
            bvh, org, dirn, ray_tile=256, precision=p)),
    )
    timeit(
        f"{label} bounce sorted",
        jax.jit(lambda p=prec: intersect_closest_wide(
            bvh, so, sd, ray_tile=256, precision=p)),
    )
    timeit(
        f"{label} anyhit sorted",
        jax.jit(lambda p=prec: intersect_any_wide(
            bvh, so, sd, t_max=10.0, ray_tile=256, precision=p)),
    )
    if label == "HIGHEST":
        base = out_p
    else:
        t_a, _, hit_a = [np.asarray(x) for x in base]
        t_b, _, hit_b = [np.asarray(x) for x in out_p]
        agree = (hit_a == hit_b).mean()
        m = hit_a & hit_b
        rel = np.abs(t_a[m] - t_b[m]) / np.maximum(t_a[m], 1e-3)
        print(f"bf16x3 vs HIGHEST: hit agree {agree:.6f}, "
              f"max rel t err {rel.max():.2e}")
