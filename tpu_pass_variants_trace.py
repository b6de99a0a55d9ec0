"""Round-5b probe: trace REAL render_pass variants to find the kernel-time
inflation.

Bare sorted full-width closest calls cost 2.6 ms (rt=512) in isolation,
but the real pass's segment calls cost ~5.4 ms per 1/8-width call (~18x
per-ray).  Trace the real pass with toggles to find the culprit:

  gate=off sort=on   -> full-width in-pass kernel calls
  gate=on  sort=on   -> current default
  remat=off          -> is jax.checkpoint the inflation?

Usage: python tpu_pass_variants_trace.py [variant...]
  variants: default nogate noremat nogate-noremat
"""

import glob
import json
import os
import sys
from collections import defaultdict

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/heatray_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from heatray_tpu.camera import orbit_camera
from heatray_tpu.options import FrameGlobals, RenderOptions
from heatray_tpu.render.integrator import make_context, render_pass
from heatray_tpu.scene.builtin import cornell_box

W, H = 1920, 1080
scene = cornell_box(light="both", with_spheres=True)
camera = orbit_camera(W, H, distance=6.2, focal_length_mm=35.0)

VARIANTS = {
    "default": {},
    "nogate": {"gate_bounces": False},
    "noremat": {"remat_bounces": False},
    "nogate-noremat": {"gate_bounces": False, "remat_bounces": False},
    "rt1024": {"wide_ray_tile": 1024},
    "rt2048": {"wide_ray_tile": 2048},
}
names = sys.argv[1:] or ["default", "nogate", "noremat"]

for vname in names:
    kw = VARIANTS[vname]
    options = RenderOptions(
        width=W, height=H, max_render_passes=8, max_ray_depth=4, **kw
    )
    ctx = make_context(options, scene)
    accum = jnp.zeros((4, H, W), jnp.float32)
    frame = FrameGlobals.create(2)
    full = jax.jit(lambda a, f: render_pass(scene, camera, ctx, options, f, a))
    out = full(accum, frame)
    jax.block_until_ready(out)

    logdir = f"/tmp/heatray_var_{vname}"
    os.system(f"rm -rf {logdir}")
    N = 2
    with jax.profiler.trace(logdir):
        o = accum
        for _ in range(N):
            o = full(o, frame)
        jax.block_until_ready(o)

    from xprof.convert import raw_to_tool_data as r2t

    paths = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    data, _ = r2t.xspace_to_tool_data(paths, "hlo_stats", {})
    table = json.loads(data)
    cols = [c["label"] for c in table["cols"]]
    iTot = cols.index("Total self time (us)")
    iTxt = cols.index("HLO op text")
    iOcc = cols.index("#Occurrences")
    total = 0.0
    closest = any_h = sort_t = 0.0
    rows = []
    for r in table["rows"]:
        c = [x["v"] if isinstance(x, dict) else x for x in r["c"]]
        total += c[iTot]
        txt = c[iTxt]
        if "intersect_closest" in txt:
            closest += c[iTot]
        elif "intersect_any" in txt:
            any_h += c[iTot]
        elif txt.lstrip("%").startswith("sort"):
            sort_t += c[iTot]
        rows.append((c[iTot], txt[:95], c[iOcc]))
    rows.sort(key=lambda x: -x[0])
    print(
        f"\n== {vname}: total {total/1e3/N:.1f} ms/pass | "
        f"closest {closest/1e3/N:.1f} any {any_h/1e3/N:.1f} "
        f"sort {sort_t/1e3/N:.1f}",
        file=sys.stderr,
    )
    for t, txt, occ in rows[:5]:
        print(f"  {t/1e3/N:8.2f} ms/pass x{occ:4.0f}  {txt}", file=sys.stderr)
