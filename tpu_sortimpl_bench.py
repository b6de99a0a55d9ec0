"""Round-5: real-pass compile + runtime for the two sort implementations.

Usage: python tpu_sortimpl_bench.py {multisort|take} [--cache]

Compiles the REAL bench pass (Cornell 1080p depth 4) fresh (no
persistent cache unless --cache), reports fwd compile seconds, fwd
ms/pass slope, bwd compile seconds, fwd+bwd ms/step.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

impl = sys.argv[1]
if "--cache" in sys.argv:
    jax.config.update("jax_compilation_cache_dir", "/tmp/heatray_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from heatray_tpu.camera import orbit_camera
from heatray_tpu.options import FrameGlobals, RenderOptions
from heatray_tpu.render.integrator import make_context, render_pass
from heatray_tpu.scene.builtin import cornell_box

W, H, DEPTH = 1920, 1080, 4
options = RenderOptions(
    width=W, height=H, max_render_passes=66, max_ray_depth=DEPTH,
    sort_impl=impl,
)
scene = cornell_box(light="both", with_spheres=True)
camera = orbit_camera(W, H, distance=6.2, focal_length_mm=35.0)
ctx = make_context(options, scene)
accum = jnp.zeros((4, H, W), jnp.float32)

t0 = time.time()
a = render_pass(scene, camera, ctx, options, FrameGlobals.create(0), accum)
np.asarray(a[0, 0, :1])
t_fwd_compile = time.time() - t0
print(f"[{impl}] fwd compile+first pass: {t_fwd_compile:.1f}s",
      file=sys.stderr)


def chain(n):
    x = accum
    t0 = time.time()
    for i in range(n):
        x = render_pass(
            scene, camera, ctx, options, FrameGlobals.create(1 + i), x
        )
    np.asarray(x[0, 0, :1])
    return time.time() - t0


chain(1)
t1, t2 = chain(4), chain(20)
dt = (t2 - t1) / 16
print(f"[{impl}] fwd slope: {dt*1e3:.1f} ms/pass", file=sys.stderr)

from heatray_tpu.diff.inverse import apply_material_params

ctx_d = make_context(options, scene, static_shading=False)
params = {
    "base_color": scene.materials.base_color,
    "roughness": scene.materials.roughness,
}


def loss_fn(params, idx):
    s = apply_material_params(scene, params)
    a = render_pass(
        s, camera, ctx_d, options, FrameGlobals.create(idx), accum
    )
    img = a[:3] / jnp.maximum(a[3:], 1.0)
    return jnp.mean(img * img)


grad_fn = jax.jit(jax.value_and_grad(loss_fn))
t0 = time.time()
l0, _ = grad_fn(params, 0)
np.asarray(l0)
t_bwd_compile = time.time() - t0
print(f"[{impl}] bwd compile+first step: {t_bwd_compile:.1f}s",
      file=sys.stderr)


def gchain(n):
    t0 = time.time()
    l = None
    for i in range(n):
        l, _ = grad_fn(params, 1 + i)
    np.asarray(l)
    return time.time() - t0


gchain(1)
g1, g2 = gchain(1), gchain(5)
dtg = (g2 - g1) / 4
print(f"[{impl}] fwd+bwd slope: {dtg*1e3:.1f} ms/step", file=sys.stderr)
print(
    f"RESULT {impl} fwd_compile={t_fwd_compile:.1f} fwd_ms={dt*1e3:.1f} "
    f"bwd_compile={t_bwd_compile:.1f} fwdbwd_ms={dtg*1e3:.1f}"
)
