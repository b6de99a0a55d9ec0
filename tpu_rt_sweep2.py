"""Round-5b probe: ray-tile sweep of the REAL pass.

Timeline analysis (tpu_kernel_trace_probe.py + xplane events) shows the
wide-BVH kernels are DMA-stall-bound in the real pass: the same kernel on
the same data runs ~4x faster when XLA happens to place its operand in
VMEM (isolated probes) than in-pass with HBM operands (~2 us/tile of
stall at rt=512).  Earlier rt sweeps were run in ISOLATION, where the
stall is absent — which is why they concluded rt=512 was best.  This
sweep times the REAL jitted pass at wide_ray_tile 512/1024/2048.

Usage: python tpu_rt_sweep2.py [rt ...]
"""

import sys
import time

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

rts = [int(a) for a in sys.argv[1:]] or [1024, 2048, 512]

for rt in rts:
    options = RenderOptions(
        width=W, height=H, max_render_passes=8, max_ray_depth=4,
        wide_ray_tile=rt,
    )
    ctx = make_context(options, scene)
    accum = jnp.zeros((4, H, W), jnp.float32)
    full = jax.jit(lambda a, f: render_pass(scene, camera, ctx, options, f, a))

    t0 = time.perf_counter()
    out = full(accum, FrameGlobals.create(0))
    jax.block_until_ready(out)
    t_compile = time.perf_counter() - t0

    def run_n(n, o):
        t0 = time.perf_counter()
        for i in range(n):
            o = full(o, FrameGlobals.create(i + 1))
        jax.block_until_ready(o)
        return time.perf_counter() - t0, o

    t4, out = run_n(4, out)
    t20, out = run_n(20, out)
    ms = (t20 - t4) / 16 * 1e3  # slope: removes fixed per-batch overhead
    print(
        f"rt={rt}: {ms:.1f} ms/pass (compile {t_compile:.0f}s, "
        f"t4={t4:.2f}s t20={t20:.2f}s)",
        file=sys.stderr, flush=True,
    )
