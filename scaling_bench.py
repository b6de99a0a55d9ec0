"""Scaling-efficiency measurement -> SCALING_rNN.json.

Measures per-pass wall time and strong-scaling efficiency
(eff(N) = t(1) / (N * t(N)) for a fixed total image) at dp mesh sizes
1/2/4/8 and sp x dp = 4x2, on the virtual 8-device CPU mesh — the harness a
real pod runs unmodified (swap the device list).  Also records the
single-chip TPU pass time when a TPU is attached (dp=1 there; multi-chip
hardware is not reachable from this box).

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scaling_bench.py cpu
  python scaling_bench.py tpu     # single real chip
  python scaling_bench.py merge   # combine partial JSONs -> SCALING_r05.json

North star (BASELINE.md): >= 80% efficiency at >= 2 hosts.
"""

from __future__ import annotations

import json
import os
import sys
import time

OUT = "SCALING_r05.json"


def _timed_passes(run, n=4):
    """Returns (wall seconds/pass, process-CPU seconds/pass).

    On a machine with fewer physical cores than virtual devices the wall
    number under-reports scaling (devices timeshare cores); the CPU-seconds
    number is core-count independent: with perfect partitioning total
    CPU-seconds per pass stays FLAT as the mesh grows, so
    eff_cpu = cpu(1) / cpu(N) isolates partitioning/communication overhead.
    """
    run(0)  # compile
    t0 = time.time()
    run(1)
    t1 = time.time() - t0
    c0 = os.times()
    t0 = time.time()
    for i in range(n):
        run(2 + i)
    tn = (time.time() - t0) / n
    c1 = os.times()
    cpu = (c1.user + c1.system - c0.user - c0.system) / n
    return min(t1, tn), cpu


def bench_cpu() -> dict:
    import jax

    # This box force-registers the remote-TPU platform via sitecustomize;
    # env vars alone do not override it.
    jax.config.update("jax_platforms", "cpu")
    assert jax.default_backend() == "cpu", (
        "run with XLA_FLAGS=--xla_force_host_platform_device_count=8"
    )
    import jax.numpy as jnp
    import numpy as np

    from heatray_tpu.camera import orbit_camera
    from heatray_tpu.options import FrameGlobals, RenderOptions
    from heatray_tpu.parallel.sharding import (
        make_mesh,
        make_mesh_2d,
        make_sharded_pass,
        render_sharded_2d,
        replicate,
        shard_context,
        sharded_accum,
    )
    from heatray_tpu.render.integrator import make_context, render_pass
    from heatray_tpu.scene.builtin import cornell_box

    w = h = 256
    depth = 2
    options = RenderOptions(
        width=w, height=h, max_render_passes=16, max_ray_depth=depth
    )
    scene = cornell_box(light="both", with_spheres=True)
    camera = orbit_camera(w, h, distance=6.2, focal_length_mm=35.0)
    ctx0 = make_context(options, scene)

    import multiprocessing

    cores = multiprocessing.cpu_count()
    results = {
        "config": f"cornell {w}x{h} depth {depth}, cpu virtual mesh",
        "physical_cores": cores,
        "note": (
            "wall efficiency is bounded by physical cores when the mesh "
            "oversubscribes them; cpu-seconds efficiency isolates "
            "partitioning overhead (flat total = perfect)"
        ),
    }
    dp_times = {}
    dp_cpu = {}
    for n in (1, 2, 4, 8):
        mesh = make_mesh(n)
        sc = replicate(scene, mesh)
        cam = replicate(camera, mesh)
        ctx = shard_context(ctx0, mesh)
        accum = sharded_accum(options, mesh)
        pass_fn = make_sharded_pass(sc, cam, ctx, options, mesh)
        sid = ctx.tables.pixel_sequence_id
        soff = ctx.tables.pixel_sequence_offset

        def run(i, accum=accum, pass_fn=pass_fn, sid=sid, soff=soff):
            a = pass_fn(sid, soff, accum, FrameGlobals.create(i))
            jax.block_until_ready(a)

        dt, cpu = _timed_passes(run)
        dp_times[n] = dt
        dp_cpu[n] = cpu
        eff = dp_times[1] / (n * dt)
        eff_cpu = dp_cpu[1] / max(cpu, 1e-9)
        results[f"dp{n}"] = {
            "pass_ms": round(dt * 1e3, 1),
            "cpu_s_per_pass": round(cpu, 3),
            "wall_efficiency": round(eff, 3),
            "cpu_efficiency": round(eff_cpu, 3),
        }
        print(
            f"dp={n}: {dt*1e3:.1f} ms/pass  cpu {cpu:.2f}s  "
            f"eff_wall={eff:.2f} eff_cpu={eff_cpu:.2f}",
            file=sys.stderr,
        )

    # sp x dp 4x2: 8 passes land as 2 rounds of 4 concurrent slices.
    mesh2 = make_mesh_2d(4, 2)
    t0 = time.time()
    render_sharded_2d(scene, camera, ctx0, options, mesh2, num_passes=4)
    compile_and_first = time.time() - t0
    c0 = os.times()
    t0 = time.time()
    a = render_sharded_2d(scene, camera, ctx0, options, mesh2, num_passes=8)
    jax.block_until_ready(a)
    dt8 = time.time() - t0  # 2 rounds -> per-round time/round
    c1 = os.times()
    cpu8 = c1.user + c1.system - c0.user - c0.system
    per_round = dt8 / 2.0
    # One sp round renders 4 passes concurrently; serial cost would be
    # 4 * dp2 pass time.  On a host with fewer PHYSICAL cores than mesh
    # devices the 4 concurrent sp slices timeshare the same cores, so the
    # WALL number collapses by construction (r3's unexplained 0.153);
    # cpu-seconds per pass is the core-count-independent signal — flat
    # total vs dp2 = the sp axis adds no partitioning/communication
    # overhead beyond its one final psum.
    eff_sp_wall = (4 * dp_times[2]) / (4 * per_round)
    cpu_per_pass = cpu8 / 8.0
    eff_sp_cpu = dp_cpu[2] / max(cpu_per_pass, 1e-9)
    results["sp4xdp2"] = {
        "round_ms": round(per_round * 1e3, 1),
        "passes_per_round": 4,
        "wall_efficiency_vs_dp2_serial": round(eff_sp_wall, 3),
        "cpu_s_per_pass": round(cpu_per_pass, 3),
        "cpu_efficiency_vs_dp2": round(eff_sp_cpu, 3),
        "note": (
            "wall efficiency is core-bound on this 2-core host (4 "
            "concurrent sp slices timeshare 2 cores); cpu-seconds "
            "efficiency isolates the partitioning overhead"
        ),
    }
    print(
        f"sp4xdp2: {per_round*1e3:.1f} ms/round (4 passes) "
        f"eff_wall={eff_sp_wall:.2f} eff_cpu={eff_sp_cpu:.2f}",
        file=sys.stderr,
    )
    return {"cpu_virtual_mesh": results}


def bench_tpu() -> dict:
    import jax

    dev = jax.devices()[0]
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/heatray_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from heatray_tpu.camera import orbit_camera
    from heatray_tpu.options import FrameGlobals, RenderOptions
    from heatray_tpu.render.integrator import make_context, render_pass
    from heatray_tpu.scene.builtin import cornell_box

    w, h, depth = 1920, 1080, 4
    options = RenderOptions(
        width=w, height=h, max_render_passes=16, max_ray_depth=depth
    )
    scene = cornell_box(light="both", with_spheres=True)
    camera = orbit_camera(w, h, distance=6.2, focal_length_mm=35.0)
    ctx = make_context(options, scene)
    accum = jnp.zeros((4, h, w), jnp.float32)

    # Fetch-slope timing (the tunnel's block_until_ready is unreliable).
    def chain(n):
        a = accum
        t0 = time.time()
        for i in range(n):
            a = render_pass(scene, camera, ctx, options, FrameGlobals.create(i), a)
        np.asarray(a)
        return time.time() - t0

    chain(1)
    t1 = chain(2)
    t2 = chain(10)
    dt = max((t2 - t1) / 8, 1e-9)
    print(f"tpu single chip: {dt*1e3:.1f} ms/pass", file=sys.stderr)
    return {
        "tpu_single_chip": {
            "device": str(dev),
            "config": f"cornell {w}x{h} depth {depth}",
            "pass_ms": round(dt * 1e3, 1),
            "dp": 1,
        }
    }


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "cpu"
    if mode == "merge":
        merged = {}
        for part in ("/tmp/scaling_cpu.json", "/tmp/scaling_tpu.json"):
            if os.path.exists(part):
                merged.update(json.load(open(part)))
        json.dump(merged, open(OUT, "w"), indent=1)
        print(json.dumps(merged))
        return
    data = bench_cpu() if mode == "cpu" else bench_tpu()
    path = f"/tmp/scaling_{mode}.json"
    json.dump(data, open(path, "w"), indent=1)
    print(json.dumps(data))


if __name__ == "__main__":
    main()
