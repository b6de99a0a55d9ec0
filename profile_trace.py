"""Per-stage breakdown of the REAL jitted render_pass via an xprof trace.

Captures a device trace of N passes of the exact bench configuration and
aggregates XLA op self-times by the integrator's ``jax.named_scope`` stages
(raygen / sort_wavefront / traverse_closest / shade / traverse_occlusion /
accumulate) plus everything unscoped — the ground truth for where a pass
spends its time (isolated stage replays distort shapes and ray states).

Usage: python profile_trace.py [depth] [sort|nosort]
"""

import glob
import gzip
import os
import re
import sys
import time
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
DEPTH = int(sys.argv[1]) if len(sys.argv) > 1 else 4
SORT = (sys.argv[2] == "sort") if len(sys.argv) > 2 else "auto"

options = RenderOptions(
    width=W, height=H, max_render_passes=8, max_ray_depth=DEPTH,
    sort_bounces=SORT,
)
scene = cornell_box(light="both", with_spheres=True)
camera = orbit_camera(W, H, distance=6.2, focal_length_mm=35.0)
ctx = make_context(options, scene)

accum = jnp.zeros((4, H, W), jnp.float32)
frame = FrameGlobals.create(2)
full = jax.jit(lambda a, f: render_pass(scene, camera, ctx, options, f, a))
out = full(accum, frame)
jax.block_until_ready(out)

logdir = "/tmp/heatray_trace"
os.system(f"rm -rf {logdir}")
N = 3
with jax.profiler.trace(logdir):
    o = accum
    for _ in range(N):
        o = full(o, frame)
    jax.block_until_ready(o)

# --- parse via the xprof hlo_stats converter -----------------------------
import json  # noqa: E402

from xprof.convert import raw_to_tool_data as r2t  # noqa: E402

paths = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
assert paths, f"no xplane under {logdir}"
data, _ = r2t.xspace_to_tool_data(paths, "hlo_stats", {})
table = json.loads(data)
cols = [c["label"] for c in table["cols"]]
iFW = cols.index("Framework op name")
iTot = cols.index("Total self time (us)")
iTxt = cols.index("HLO op text")
iOcc = cols.index("#Occurrences")

STAGES = [
    "raygen", "sort_wavefront", "traverse_closest", "traverse_occlusion",
    "shade", "accumulate",
]
by_stage = defaultdict(float)
rows_out = []
total = 0.0
for r in table["rows"]:
    c = [x["v"] if isinstance(x, dict) else x for x in r["c"]]
    fw, t = c[iFW] or "", c[iTot]
    total += t
    stage = next((s for s in STAGES if s in fw), None)
    if stage is None:
        m = re.search(r"render_pass\)/([^/]+)", fw)
        stage = "other:" + (m.group(1) if m else fw[:40])
    by_stage[stage] += t
    rows_out.append((t, stage, fw, c[iTxt][:90], c[iOcc]))

print(f"\ndevice total: {total/1e3/N:.1f} ms/pass ({N} passes)")
print(f"{'stage':28s} {'ms/pass':>10s} {'%':>6s}")
for k in sorted(by_stage, key=by_stage.get, reverse=True):
    v = by_stage[k] / N
    print(f"{k:28s} {v/1e3:10.2f} {100*by_stage[k]/total:6.1f}")
print("\ntop ops:")
rows_out.sort(key=lambda x: -x[0])
for t, stage, fw, txt, occ in rows_out[:14]:
    print(f"  {t/1e3/N:8.2f} ms/pass x{occ:4.0f} [{stage}] {txt}")
