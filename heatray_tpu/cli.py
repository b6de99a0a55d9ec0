"""Command-line interface: render, benchmark, optimize.

The reference is a GUI app with no CLI (``main.cpp:79`` ignores argv); this
is the headless TPU-native surface.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _add_common(p: argparse.ArgumentParser):
    p.add_argument("--scene", default="multi-material",
                   help="built-in scene name or path to a session .json / model file")
    p.add_argument("--size", type=int, nargs=2, default=(512, 512),
                   metavar=("W", "H"))
    p.add_argument("--passes", type=int, default=32)
    p.add_argument("--depth", type=int, default=10)
    p.add_argument("--sample-mode", default="sobol",
                   choices=["sobol", "halton", "hammersley", "bluenoise", "random"])
    p.add_argument("--bokeh", default="circular",
                   choices=["circular", "pentagon", "hexagon", "octagon"])
    p.add_argument("--orbit", type=float, nargs=3, default=(6.0, 0.0, 0.3),
                   metavar=("DIST", "PHI", "THETA"))
    p.add_argument("--focal-length", type=float, default=50.0, help="mm")
    p.add_argument("--focus-distance", type=float, default=None, help="m")
    p.add_argument("--fstop", type=float, default=0.0,
                   help="aperture f-stop; 0 = pinhole")
    p.add_argument("--env", default=None,
                   help="lat/long HDR image path for environment lighting")
    p.add_argument("--env-exposure", type=float, default=0.0)
    p.add_argument("--env-rotation", type=float, default=0.0)
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    p.add_argument("--max-channel", type=float, default=3.14159265,
                   help="firefly clamp (maxChannelValue)")


def _setup_backend(args):
    import os

    import jax

    # Persistent compilation cache: the full pass graph costs minutes to
    # compile on a (remote) TPU; cache executables across processes so
    # repeat renders and the interactive loop skip it entirely.
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/heatray_jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")


def _build(args):
    import numpy as np

    from heatray_tpu.camera import orbit_camera
    from heatray_tpu.options import RenderOptions
    from heatray_tpu.scene.builtin import BUILTIN_SCENES
    from heatray_tpu.scene.lights import EnvironmentLightDesc

    w, h = args.size
    env = None
    if args.env:
        from heatray_tpu.scene.environments import BUILTIN_ENVIRONMENTS

        if args.env in BUILTIN_ENVIRONMENTS:
            from heatray_tpu.scene.environments import get_environment

            image = get_environment(args.env)  # already top-row-first
        else:
            from heatray_tpu.io_utils.image import load_image

            # EnvironmentLightDesc.image is top-row-first (sky at row 0);
            # load_image returns bottom-first, so flip.
            image = load_image(args.env)[::-1]
        env = EnvironmentLightDesc(
            image=image,
            exposure=args.env_exposure,
            rotation=args.env_rotation,
        )

    if args.scene in BUILTIN_SCENES:
        builder = BUILTIN_SCENES[args.scene]
        try:
            scene = builder(env=env)
        except TypeError:
            scene = builder()
    elif args.scene.endswith(".json"):
        from heatray_tpu.io_utils.session import load_session

        return load_session(args.scene, override_size=(w, h))
    else:
        from heatray_tpu.scene.loaders import load_model_scene

        scene = load_model_scene(args.scene, env=env)

    aperture = 0.0
    if args.fstop > 0.0:
        # ``RenderOptions::Camera::setApertureRadius`` (PassGenerator.h:93).
        aperture = (args.focal_length / args.fstop) / 1000.0
    dist, phi, theta = args.orbit
    camera = orbit_camera(
        w, h, distance=dist, phi=phi, theta=theta,
        focal_length_mm=args.focal_length,
        focus_distance=args.focus_distance,
        aperture_radius=aperture,
    )
    from heatray_tpu.options import AOV

    options = RenderOptions(
        width=w, height=h, max_render_passes=max(args.passes, 1),
        max_ray_depth=args.depth, sample_mode=args.sample_mode,
        bokeh_shape=args.bokeh,
        aov=AOV(getattr(args, "aov", "none")),
        debug_pass_rendering=getattr(args, "debug_pass", None) is not None,
        debug_pass_index=getattr(args, "debug_pass", None) or 0,
    )
    return scene, camera, options


def cmd_render(args) -> int:
    _setup_backend(args)
    import numpy as np

    from heatray_tpu.io_utils.image import save_hdr, save_ldr
    from heatray_tpu.post import PostProcessingParams, apply_post_pipeline
    from heatray_tpu.render import render, resolve

    scene, camera, options = _build(args)
    t0 = time.time()
    import contextlib

    post = PostProcessingParams(tonemapping_enabled=args.tonemap)
    pass_callback = None
    viewer = None
    if args.preview is not None:
        from heatray_tpu.viewer import ProgressiveViewer

        viewer = ProgressiveViewer(port=args.preview).start()
        print(
            f"live preview: http://localhost:{viewer.port}/ "
            f"(updates every {args.preview_every} pass(es))",
            file=sys.stderr,
        )
        pass_callback = viewer.make_callback(
            options, post, every=args.preview_every
        )

    if args.edit:
        if viewer is None:
            print("--edit requires --preview", file=sys.stderr)
            return 2
        from heatray_tpu.interactive import InteractiveRenderer

        dist, phi, theta = args.orbit
        r = InteractiveRenderer(
            scene, camera, options, post=post, viewer=viewer,
            orbit=dict(
                distance=dist, phi=phi, theta=theta,
                focal_length=args.focal_length, fstop=args.fstop,
                focus_distance=args.focus_distance,
            ),
            max_channel_value=args.max_channel,
        )
        viewer.set_scene_info(r.scene_info())
        print("interactive edit loop: POST /edit on the preview port",
              file=sys.stderr)
        accum = r.run(publish_every=args.preview_every)
        img = apply_post_pipeline(accum, r.post)
        if args.out.endswith((".tiff", ".tif", ".npy", ".exr", ".hdr")):
            save_hdr(args.out, np.asarray(resolve(accum)))
        else:
            save_ldr(args.out, np.asarray(img))
        print(f"wrote {args.out}", file=sys.stderr)
        return 0

    if args.trace:
        import jax

        trace_cm = jax.profiler.trace(args.trace)
    else:
        trace_cm = contextlib.nullcontext()
    with trace_cm:
        accum, _ = render(
            scene, camera, options, num_passes=args.passes,
            max_channel_value=args.max_channel,
            pass_callback=pass_callback,
        )
        accum.block_until_ready()
    dt = time.time() - t0
    if args.trace:
        print(f"wrote xprof trace to {args.trace}", file=sys.stderr)
    print(f"rendered {options.width}x{options.height} x{args.passes} passes "
          f"in {dt:.1f}s", file=sys.stderr)

    img = apply_post_pipeline(accum, post)
    if args.out.endswith((".tiff", ".tif", ".npy", ".exr", ".hdr")):
        save_hdr(args.out, np.asarray(resolve(accum)))
    else:
        save_ldr(args.out, np.asarray(img))
    print(f"wrote {args.out}", file=sys.stderr)
    if viewer is not None and args.preview_hold:
        print("render done; preview still serving (ctrl-C to exit)",
              file=sys.stderr)
        try:
            while True:
                time.sleep(1.0)
        except KeyboardInterrupt:
            pass
    return 0


def cmd_sequence_vis(args) -> int:
    import numpy as np

    from heatray_tpu.io_utils.image import save_ldr
    from heatray_tpu.sampling.visualize import scatter_image, sequence_points

    pts = sequence_points(
        sample_mode=args.sample_mode,
        bokeh_shape=args.bokeh,
        sequence_index=args.sequence,
        count=args.count,
        aperture=args.aperture,
    )
    img = scatter_image(pts, size=args.plot_size, aperture=args.aperture)
    save_ldr(args.out, img)
    print(f"wrote {args.out} ({args.count} points)", file=sys.stderr)
    return 0


def cmd_benchmark(args) -> int:
    _setup_backend(args)
    import os

    os.environ.setdefault("BENCH_WIDTH", str(args.size[0]))
    os.environ.setdefault("BENCH_HEIGHT", str(args.size[1]))
    os.environ.setdefault("BENCH_DEPTH", str(args.depth))
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    bench.main()
    return 0


def cmd_optimize(args) -> int:
    _setup_backend(args)
    import jax.numpy as jnp
    import numpy as np

    from heatray_tpu.diff.inverse import optimize
    from heatray_tpu.io_utils.image import load_image, save_ldr
    from heatray_tpu.render import make_context, render, resolve

    scene, camera, options = _build(args)
    target = jnp.asarray(load_image(args.target)[..., :3])
    assert target.shape[:2] == (options.height, options.width), (
        f"target {target.shape} vs render {options.height}x{options.width}"
    )
    ctx = make_context(options, scene, static_shading=False)
    init = {
        "base_color": scene.materials.base_color,
        "roughness": scene.materials.roughness,
    }
    params, losses = optimize(
        scene, camera, ctx, options, target, init,
        steps=args.steps, learning_rate=args.lr, num_passes=args.passes_per_step,
        callback=lambda i, l, p: print(f"step {i}: loss {l:.6f}", file=sys.stderr)
        if i % 10 == 0 else None,
    )
    print(json.dumps({k: np.asarray(v).tolist() for k, v in params.items()}))
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="heatray_tpu",
                                     description="TPU-native path tracer")
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("render", help="render a scene to an image")
    _add_common(p)
    p.add_argument("--out", default="render.png")
    p.add_argument("--tonemap", action="store_true", help="enable ACES tonemap")
    from heatray_tpu.options import AOV

    p.add_argument("--aov", default="none", choices=[m.value for m in AOV],
                   help="debug visualization mode (PassGenerator.h:123-141)")
    p.add_argument("--debug-pass", type=int, default=None, metavar="INDEX",
                   help="freeze rendering to this single pass index "
                        "(PassGenerator.h:145-149)")
    p.add_argument("--trace", default=None, metavar="DIR",
                   help="write a jax.profiler (xprof) trace of the render")
    p.add_argument("--preview", type=int, nargs="?", const=8000, default=None,
                   metavar="PORT",
                   help="serve a live progressive preview over HTTP "
                        "(the headless analog of the reference's window, "
                        "HeatrayRenderer.cpp:319-403)")
    p.add_argument("--preview-every", type=int, default=1, metavar="N",
                   help="update the preview every N passes")
    p.add_argument("--preview-hold", action="store_true",
                   help="keep serving the preview after the render finishes")
    p.add_argument("--edit", action="store_true",
                   help="interactive edit loop: accept material/light/camera "
                        "edits over POST /edit on the preview server and "
                        "reset accumulation on change (the headless analog "
                        "of renderUI, HeatrayRenderer.cpp:690-946); serves "
                        "until ctrl-C")
    p.set_defaults(fn=cmd_render)

    p = sub.add_parser(
        "sequence-vis",
        help="scatter-plot a QMC sequence prefix to a PNG "
             "(HeatrayRenderer.cpp:455-498)",
    )
    p.add_argument("--sample-mode", default="sobol",
                   choices=["sobol", "halton", "hammersley", "bluenoise", "random"])
    p.add_argument("--bokeh", default="circular",
                   choices=["circular", "pentagon", "hexagon", "octagon"])
    p.add_argument("--sequence", type=int, default=0, help="sequence index")
    p.add_argument("--count", type=int, default=64, help="prefix length")
    p.add_argument("--aperture", action="store_true",
                   help="plot the bokeh aperture distribution instead")
    p.add_argument("--plot-size", type=int, default=256)
    p.add_argument("--out", default="sequence.png")
    p.set_defaults(fn=cmd_sequence_vis)

    p = sub.add_parser("benchmark", help="measure rays/s")
    _add_common(p)
    p.set_defaults(fn=cmd_benchmark)

    p = sub.add_parser("optimize", help="inverse-render material parameters")
    _add_common(p)
    p.add_argument("--target", required=True, help="target image path")
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--lr", type=float, default=5e-2)
    p.add_argument("--passes-per-step", type=int, default=1)
    p.set_defaults(fn=cmd_optimize)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
