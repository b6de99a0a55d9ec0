"""On-chip sweep: transposed VPU-leaf wide-BVH traversal vs the MXU kernel.

Compares the shipped MXU kernel (leaf 32, the round-3 baseline) against the
new VPU kernels at leaf {128, 256} x ray_tile {128, 256, 512} on primary,
unsorted-bounce, sorted-bounce and shadow wavefronts of the bench scene.
Picks the wide-backend defaults.
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
from heatray_tpu.ops.wide_bvh import (
    build_wide_bvh,
    intersect_any_vpu,
    intersect_any_wide,
    intersect_closest_vpu,
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

org, dirn, *_ = jax.jit(
    lambda: generate_primary_rays(camera, ctx.tables, options, 0)
)()
jax.block_until_ready(org.x)

bvh32 = build_wide_bvh(accel, leaf_size=32)
bvh128 = build_wide_bvh(accel, leaf_size=128)
bvh256 = build_wide_bvh(accel, leaf_size=256)
bvh512 = build_wide_bvh(accel, leaf_size=512)

# Bounce wavefront: random dirs from primary hit points; sorted variant.
t0_, tid0, hit0 = intersect_closest_wide(bvh32, org, dirn, ray_tile=256)
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


def timeit(name, fn, n=8):
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
    print(f"{name:44s} {dt*1e3:9.2f} ms  ({R/dt/1e6:8.1f} Mrays/s)")
    return dt, out


def check(base, out):
    t_a, id_a, hit_a = [np.asarray(x) for x in base]
    t_b, id_b, hit_b = [np.asarray(x) for x in out]
    assert (hit_a == hit_b).all(), (hit_a != hit_b).sum()
    m = hit_a
    np.testing.assert_allclose(t_a[m], t_b[m], rtol=1e-4, atol=1e-5)


# MXU baseline (current default config)
_, base_p = timeit(
    "MXU leaf=32 rt=256 primary",
    jax.jit(lambda: intersect_closest_wide(bvh32, org, dirn, ray_tile=256)),
)
timeit(
    "MXU leaf=32 rt=256 bounce sorted",
    jax.jit(lambda: intersect_closest_wide(bvh32, so, sd, ray_tile=256)),
)
timeit(
    "MXU leaf=32 rt=256 anyhit sorted",
    jax.jit(lambda: intersect_any_wide(bvh32, so, sd, t_max=10.0, ray_tile=256)),
)

for name, bvh in (("128", bvh128), ("256", bvh256), ("512", bvh512)):
    for rt in (128, 256, 512):
        _, out = timeit(
            f"VPU leaf={name} rt={rt} primary",
            jax.jit(lambda b=bvh, r=rt: intersect_closest_vpu(b, org, dirn, ray_tile=r)),
        )
        check(base_p, out)
        timeit(
            f"VPU leaf={name} rt={rt} bounce sorted",
            jax.jit(lambda b=bvh, r=rt: intersect_closest_vpu(b, so, sd, ray_tile=r)),
        )
        timeit(
            f"VPU leaf={name} rt={rt} bounce unsorted",
            jax.jit(lambda b=bvh, r=rt: intersect_closest_vpu(b, hit_p, rnd_dir, ray_tile=r)),
        )
        timeit(
            f"VPU leaf={name} rt={rt} anyhit sorted",
            jax.jit(lambda b=bvh, r=rt: intersect_any_vpu(b, so, sd, t_max=10.0, ray_tile=r)),
        )
print("all checks passed")
