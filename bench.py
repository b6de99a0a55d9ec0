"""Benchmark: forward path-tracing throughput on one TPU chip.

Renders the Cornell-box benchmark scene (driver config 2: triangle meshes,
NEE point/spot lighting, 4 bounces, progressive QMC) at 1080p and reports
Mrays/s against the 100 Mrays/s/chip north-star baseline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    import jax
    import jax.numpy as jnp

    # Remote TPU compiles are slow (~minutes for the full render graph);
    # persist compiled executables across runs.
    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", "/tmp/heatray_jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    width = int(os.environ.get("BENCH_WIDTH", 1920))
    height = int(os.environ.get("BENCH_HEIGHT", 1080))
    depth = int(os.environ.get("BENCH_DEPTH", 4))
    timed_passes = int(os.environ.get("BENCH_PASSES", 64))

    from heatray_tpu.camera import orbit_camera
    from heatray_tpu.options import FrameGlobals, RenderOptions
    from heatray_tpu.render.integrator import make_context, render_pass
    from heatray_tpu.scene.builtin import cornell_box

    options = RenderOptions(
        width=width,
        height=height,
        max_render_passes=max(64, timed_passes + 2),
        max_ray_depth=depth,
    )
    scene = cornell_box(light="both", with_spheres=True)
    camera = orbit_camera(width, height, distance=6.2, focal_length_mm=35.0)
    ctx = make_context(options, scene)
    accum = jnp.zeros((4, height, width), jnp.float32)

    print(
        f"[bench] {width}x{height}, depth {depth}, "
        f"{int(scene.geometry.num_triangles)} tris, device {jax.devices()[0]}",
        file=sys.stderr,
    )

    # Instrumented pass: exact ray count (compile + count).
    t0 = time.time()
    accum1, stats = render_pass(
        scene, camera, ctx, options, FrameGlobals.create(0), accum, with_stats=True
    )
    rays_per_pass = int(stats["rays"])
    jax.block_until_ready(accum1)
    print(
        f"[bench] rays/pass = {rays_per_pass/1e6:.1f} M "
        f"(instrumented pass + compile: {time.time()-t0:.1f}s)",
        file=sys.stderr,
    )

    # Warmup the un-instrumented variant (separate compile).
    t0 = time.time()
    accum = render_pass(
        scene, camera, ctx, options, FrameGlobals.create(1), accum
    )
    jax.block_until_ready(accum)
    print(f"[bench] warmup pass: {time.time()-t0:.1f}s", file=sys.stderr)

    # Timed passes: fetch-slope method.  On the remote-TPU tunnel,
    # block_until_ready does not reliably synchronize; a host fetch of the
    # result does.  Timing n1 and n2 chained passes each ending in a full
    # fetch and taking the slope cancels the (large) fixed fetch cost.
    import numpy as np

    def run_chain(n: int) -> float:
        a = accum
        t0 = time.time()
        for i in range(n):
            a = render_pass(
                scene, camera, ctx, options, FrameGlobals.create(2 + i), a
            )
        np.asarray(a)  # device -> host fetch forces real execution
        return time.time() - t0

    n1 = max(1, timed_passes // 8)
    run_chain(1)  # prime
    t1 = run_chain(n1)
    t2 = run_chain(timed_passes)
    dt = max((t2 - t1) / (timed_passes - n1), 1e-9)

    mrays = rays_per_pass / dt / 1e6
    print(
        f"[bench] slope({n1}->{timed_passes} passes): {dt*1e3:.1f} ms/pass "
        f"-> {mrays:.1f} Mrays/s (t{n1}={t1:.1f}s t{timed_passes}={t2:.1f}s)",
        file=sys.stderr,
    )

    # Backward pass (BASELINE.md: "fwd+bwd measured"): gradient of an L2
    # image loss w.r.t. material parameters through one full render pass
    # (shade table rebuilt in-graph so gradients reach materials; hit ids
    # stay detached through the Pallas kernels by design).
    bwd_mrays = None
    if os.environ.get("BENCH_BWD", "1") != "0":
        from heatray_tpu.diff.inverse import apply_material_params

        ctx_d = make_context(options, scene, static_shading=False)
        accum0 = jnp.zeros((4, height, width), jnp.float32)
        params = {
            "base_color": scene.materials.base_color,
            "roughness": scene.materials.roughness,
        }

        def loss_fn(params, idx):
            s = apply_material_params(scene, params)
            a = render_pass(
                s, camera, ctx_d, options, FrameGlobals.create(idx), accum0
            )
            img = a[:3] / jnp.maximum(a[3:], 1.0)
            return jnp.mean(img * img)

        grad_fn = jax.jit(jax.value_and_grad(loss_fn))
        t0 = time.time()
        l0, g0 = grad_fn(params, 0)
        jax.block_until_ready(l0)
        print(
            f"[bench] bwd warmup (compile + step): {time.time()-t0:.1f}s",
            file=sys.stderr,
        )

        def run_grad_chain(n: int) -> float:
            t0 = time.time()
            l = None
            for i in range(n):
                l, _ = grad_fn(params, 1 + i)
            np.asarray(l)
            return time.time() - t0

        run_grad_chain(1)
        g1 = run_grad_chain(1)
        g2 = run_grad_chain(5)
        dt_g = max((g2 - g1) / 4, 1e-9)
        bwd_mrays = rays_per_pass / dt_g / 1e6
        print(
            f"[bench] fwd+bwd slope: {dt_g*1e3:.1f} ms/step -> "
            f"{bwd_mrays:.1f} Mrays/s (fwd+bwd)",
            file=sys.stderr,
        )

    # Large-scene row (BASELINE.md config 5 regime): ~300k-triangle
    # displaced-sphere scene through the HBM-streaming wide-BVH backend —
    # the tier where traversal dominates real workloads.  The 4k-triangle
    # Cornell number alone says nothing about it.
    large = None
    if os.environ.get("BENCH_LARGE", "1") != "0":
        import numpy as np

        from heatray_tpu.scene.builtin import high_poly
        from heatray_tpu.scene.geometry import scene_aabb
        from heatray_tpu.utils.framing import frame_scene

        scene_l = high_poly()
        n_tris = int(scene_l.geometry.num_triangles)
        camera_l = frame_scene(
            np.asarray(scene_aabb(scene_l.geometry)), width, height,
            theta=0.35,
        )
        ctx_l = make_context(options, scene_l)
        t0 = time.time()
        a1, stats_l = render_pass(
            scene_l, camera_l, ctx_l, options, FrameGlobals.create(0),
            accum * 0.0, with_stats=True,
        )
        rays_l = int(stats_l["rays"])
        jax.block_until_ready(a1)
        print(
            f"[bench] large scene: {n_tris} tris "
            f"({ctx_l.accel_pack.backend} backend), rays/pass = "
            f"{rays_l/1e6:.1f} M (compile+pass {time.time()-t0:.1f}s)",
            file=sys.stderr,
        )
        al = render_pass(
            scene_l, camera_l, ctx_l, options, FrameGlobals.create(1),
            accum * 0.0,
        )
        jax.block_until_ready(al)

        def run_chain_l(n: int) -> float:
            a = accum * 0.0
            t0 = time.time()
            for i in range(n):
                a = render_pass(
                    scene_l, camera_l, ctx_l, options,
                    FrameGlobals.create(2 + i), a,
                )
            np.asarray(a)
            return time.time() - t0

        run_chain_l(1)
        lt1 = run_chain_l(2)
        lt2 = run_chain_l(10)
        dt_l = max((lt2 - lt1) / 8, 1e-9)
        large = rays_l / dt_l / 1e6
        print(
            f"[bench] large-scene slope: {dt_l*1e3:.1f} ms/pass -> "
            f"{large:.1f} Mrays/s",
            file=sys.stderr,
        )

    result = {
        "metric": "fwd path-tracing throughput, Cornell box 1080p depth 4",
        "value": round(mrays, 2),
        "unit": "Mrays/s/chip",
        "vs_baseline": round(mrays / 100.0, 3),
    }
    if bwd_mrays is not None:
        result["fwd_bwd_mrays_per_s"] = round(bwd_mrays, 2)
    if large is not None:
        result["large_scene_mrays_per_s"] = round(large, 2)
        result["large_scene_triangles"] = n_tris
    print(json.dumps(result))


if __name__ == "__main__":
    main()
