"""Round-5b probe: xprof ground truth for the traversal-kernel cost gap.

The marginal-time probe (tpu_tile_cost_probe.py) says a FULL-width (2.07M
ray) sorted closest-hit call costs ~2.5 ms, yet the real pass's xprof
trace attributes ~5.4 ms to every 1/8-width (260k ray) SEGMENT call.
This probe traces, with xprof, on identical sorted-d2 wavefronts:

  a) 8 chained full-width calls (rt=512 and rt=1024)
  b) the integrator's segment pattern: scan(3) x 8 cond-gated
     dynamic-slice segment calls at 1/8 width

and prints per-instance op self-times.  If (b)'s instances are several
times slower than (a)'s per-ray, the integrator CONTEXT (cond/scan/slice
layouts), not the kernel, is the hot spot.

Usage: python tpu_kernel_trace_probe.py
"""

import glob
import json
import os
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

src = open("tpu_sorted_visit_probe.py").read()
cut = src.index('print(f"chunks=')
ns = {"__name__": "_svp_lib", "__file__": "tpu_sorted_visit_probe.py"}
exec(compile(src[:cut], "tpu_sorted_visit_probe.py", "exec"), ns)
one_bounce, sort_rays = ns["one_bounce"], ns["sort_rays"]

org, dirn, seq_id, seq_off = jax.jit(
    lambda: generate_primary_rays(camera, ctx.tables, options, 0)
)()
weight = Vec3.ones((R,))
env_on_miss = jnp.ones((R,), bool)
active = jnp.ones((R,), bool)
o2, d2, w2, e2, a2 = one_bounce(
    org, dirn, weight, env_on_miss, active, jnp.int32(1), 0, seq_id, seq_off
)
s_o, s_d, s_act = sort_rays(o2, d2, a2)
jax.block_until_ready(s_o.x)


@jax.jit
def chained_full(o, d, rt_marker):
    def step(i, acc):
        t, tid, hit = intersect_closest_wide(
            pack.wide, o + Vec3(acc * 1e-30, 0.0, 0.0), d,
            t_min=eps, ray_tile=512,
        )
        return acc + t[0]

    return jax.lax.fori_loop(0, 8, step, rt_marker)


@jax.jit
def chained_full_1024(o, d, rt_marker):
    def step(i, acc):
        t, tid, hit = intersect_closest_wide(
            pack.wide, o + Vec3(acc * 1e-30, 0.0, 0.0), d,
            t_min=eps, ray_tile=1024,
        )
        return acc + t[0]

    return jax.lax.fori_loop(0, 8, step, rt_marker)


SEG = 8
seg_n = R // SEG  # 259200 -> pad to tile multiple below


@jax.jit
def seg_pattern(o, d, marker):
    planes = (o.x, o.y, o.z, d.x, d.y, d.z)

    def depth_body(carry, _):
        acc, planes = carry

        def seg_step(acc, s):
            start = s * seg_n

            def do(acc):
                seg = tuple(
                    jax.lax.dynamic_slice_in_dim(p, start, seg_n)
                    for p in planes
                )
                so = Vec3(seg[0] + acc * 1e-30, seg[1], seg[2])
                sd = Vec3(seg[3], seg[4], seg[5])
                t, tid, hit = intersect_closest_wide(
                    pack.wide, so, sd, t_min=eps, ray_tile=512
                )
                return acc + t[0]

            return jax.lax.cond(s >= 0, do, lambda a: a, acc), None

        acc, _ = jax.lax.scan(seg_step, acc, jnp.arange(SEG))
        return (acc, planes), None

    (acc, _), _ = jax.lax.scan(depth_body, (marker, planes), jnp.arange(3))
    return acc


for name, fn in (
    ("full-512", lambda: chained_full(s_o, s_d, jnp.float32(0.0))),
    ("full-1024", lambda: chained_full_1024(s_o, s_d, jnp.float32(0.0))),
    ("segments", lambda: seg_pattern(s_o, s_d, jnp.float32(0.0))),
):
    fn().block_until_ready()
    logdir = f"/tmp/heatray_ktrace_{name}"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        fn().block_until_ready()

    from xprof.convert import raw_to_tool_data as r2t

    paths = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    data, _ = r2t.xspace_to_tool_data(paths, "hlo_stats", {})
    table = json.loads(data)
    cols = [c["label"] for c in table["cols"]]
    iTot = cols.index("Total self time (us)")
    iTxt = cols.index("HLO op text")
    iOcc = cols.index("#Occurrences")
    rows = []
    total = 0.0
    for r in table["rows"]:
        c = [x["v"] if isinstance(x, dict) else x for x in r["c"]]
        total += c[iTot]
        rows.append((c[iTot], c[iTxt][:100], c[iOcc]))
    rows.sort(key=lambda x: -x[0])
    print(f"\n== {name}: device total {total/1e3:.1f} ms", file=sys.stderr)
    for t, txt, occ in rows[:6]:
        print(f"  {t/1e3:8.2f} ms x{occ:4.0f}  {txt}", file=sys.stderr)
