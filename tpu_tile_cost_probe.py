"""Round-5b probe: where does per-tile traversal cost come from?

Sorted bounce tiles visit FEWER leaves than primary tiles
(tpu_sorted_visit_probe.py: 1.5-3.4 leaves/live-tile vs 3.6 for primary)
yet cost ~4x more per tile (10.6 vs 2.76 us).  Visits don't explain the
cost, so this probe times the REAL closest-hit kernel:

- at ray tiles 256/512/1024/2048 (if per-tile fixed overhead dominates,
  doubling the tile should nearly halve the time),
- on primary vs sorted-d2/d3/d4 wavefronts (data-dependence),
- on a synthetic wavefront made of ONE primary tile repeated (uniform
  trip counts: isolates while-loop divergence / pipeline stalls).

Device-side timing: N kernel calls chained via fori_loop data dependence.

Usage: python tpu_tile_cost_probe.py
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
from heatray_tpu.ops.wide_bvh import intersect_closest_wide
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

# Build the per-depth wavefronts with the same bounce evolution as
# tpu_sorted_visit_probe (reuse it as a library).
src = open("tpu_sorted_visit_probe.py").read()
cut = src.index('print(f"chunks=')
ns = {"__name__": "_svp_lib", "__file__": "tpu_sorted_visit_probe.py"}
exec(compile(src[:cut], "tpu_sorted_visit_probe.py", "exec"), ns)
one_bounce, sort_rays = ns["one_bounce"], ns["sort_rays"]

org, dirn, seq_id, seq_off = jax.jit(
    lambda: generate_primary_rays(camera, ctx.tables, options, 2)
)()
weight = Vec3.ones((R,))
env_on_miss = jnp.ones((R,), bool)
active = jnp.ones((R,), bool)

waves = {"d1-primary": (org, dirn, active)}
cur_o, cur_d = org, dirn
for depth in range(1, DEPTH):
    cur_o, cur_d, weight, env_on_miss, active = one_bounce(
        cur_o, cur_d, weight, env_on_miss, active, jnp.int32(depth), 2,
        seq_id, seq_off,
    )
    s_o, s_d, s_act = sort_rays(cur_o, cur_d, active)
    waves[f"d{depth+1}-sorted"] = (s_o, s_d, s_act)

# Synthetic uniform wavefront: primary tile 0 repeated everywhere.
u_o = Vec3(*(jnp.tile(g[:512], R // 512) for g in (org.x, org.y, org.z)))
u_d = Vec3(*(jnp.tile(g[:512], R // 512) for g in (dirn.x, dirn.y, dirn.z)))
waves["uniform-tile0"] = (u_o, u_d, jnp.ones((R,), bool))


def timeit(o, d, rt, n=8):
    @jax.jit
    def run(nn):
        def step(i, acc):
            # Real data dependence: perturb the origin by a value XLA
            # cannot constant-fold away (acc * 1e-30 of a traced scalar),
            # so the kernel cannot be hoisted out of the loop.
            t, tid, hit = intersect_closest_wide(
                pack.wide, o + Vec3(acc * 1e-30, 0.0, 0.0), d,
                t_min=eps, ray_tile=rt,
            )
            return acc + t[0]

        return jax.lax.fori_loop(0, nn, step, jnp.float32(0.0))

    run(n).block_until_ready()
    t0 = time.perf_counter()
    run(n).block_until_ready()
    t_n = time.perf_counter() - t0
    t0 = time.perf_counter()
    run(2 * n).block_until_ready()
    t_2n = time.perf_counter() - t0
    return (t_2n - t_n) / n * 1e3  # marginal ms per call: no fixed costs


for name, (o, d, act) in waves.items():
    row = []
    for rt in (256, 512, 1024, 2048):
        try:
            ms = timeit(o, d, rt)
            row.append(f"rt={rt}: {ms:6.1f} ms ({ms * 1e3 / (R // rt):.2f} us/tile)")
        except Exception as e:  # noqa: BLE001
            row.append(f"rt={rt}: FAIL {type(e).__name__}")
    print(f"{name:14s} " + " | ".join(row), file=sys.stderr)
