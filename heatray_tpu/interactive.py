"""Interactive edit loop: the headless analog of the reference's material /
light / camera editors (``HeatrayRenderer::renderUI``,
``HeatrayRenderer.cpp:690-946,948-1599``).

The orchestrator owns the progressive loop; between passes it polls the
viewer's edit queue (HTTP ``POST /edit``), applies each edit to the pure
scene/camera/options pytrees, and — exactly like the reference's
``resetRenderer`` (``HeatrayRenderer.cpp:1601-1608``) — restarts
accumulation from pass 0 whenever an edit changes the light transport.
Post-processing edits (the display pipeline) never reset, matching the
reference where ``PostProcessingParams`` live display-side.

Edit messages (JSON):
  {"type": "material", "index": 0, "base_color": [r,g,b], "roughness": r,
   "metallic": m, "emissive": [r,g,b], "specular_f0": s, "clearcoat": c,
   "clearcoat_roughness": r, "ior": x, "density": d}       (any subset)
  {"type": "directional_light" | "point_light" | "spot_light",
   "index": i, ...DirectionalLight/PointLight/SpotLight fields}
  {"type": "env", "exposure": ev, "rotation": rad, "solid_color": [r,g,b]}
  {"type": "camera", "distance": d, "phi": p, "theta": t, "fstop": f,
   "focal_length": mm, "focus_distance": m}
  {"type": "post", ...PostProcessingParams fields}
  {"type": "transform", "yaw": deg, "pitch": deg, "roll": deg, "scale": s}
  {"type": "options", "max_ray_depth": n}
"""

from __future__ import annotations

import dataclasses
import sys
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .camera import CameraParams, orbit_camera
from .options import FrameGlobals, RenderOptions
from .post import PostProcessingParams
from .render.integrator import RenderContext, make_context, render_pass
from .render.shade_table import build_shade_table
from .scene import edit as scene_edit
from .scene.lights import DirectionalLight, PointLight, SpotLight
from .scene.scene import Scene


def _cond_material(table, index: int, edit: dict):
    """Apply user-facing material parameters to the conditioned table,
    mirroring ``PhysicallyBasedMaterial.cpp:133-145`` (min roughness 0.01,
    F0 x0.08, clearcoat x0.2, alpha = roughness^2)."""
    i = index

    def set_col(arr, vec3):
        return arr.at[:, i].set(jnp.asarray(vec3, jnp.float32))

    if "base_color" in edit:
        table = table.replace(base_color=set_col(table.base_color, edit["base_color"]))
    if "emissive" in edit:
        table = table.replace(emissive=set_col(table.emissive, edit["emissive"]))
    if "metallic" in edit:
        table = table.replace(metallic=table.metallic.at[i].set(float(edit["metallic"])))
    if "roughness" in edit:
        r = max(float(edit["roughness"]), 0.01)
        table = table.replace(
            roughness=table.roughness.at[i].set(r),
            roughness_alpha=table.roughness_alpha.at[i].set(r * r),
        )
    if "specular_f0" in edit:
        table = table.replace(
            specular_f0=table.specular_f0.at[i].set(0.08 * float(edit["specular_f0"]))
        )
    if "clearcoat" in edit:
        table = table.replace(
            clearcoat=table.clearcoat.at[i].set(0.2 * float(edit["clearcoat"]))
        )
    if "clearcoat_roughness" in edit:
        r = max(float(edit["clearcoat_roughness"]), 0.01)
        table = table.replace(
            clearcoat_roughness=table.clearcoat_roughness.at[i].set(r),
            clearcoat_roughness_alpha=table.clearcoat_roughness_alpha.at[i].set(r * r),
        )
    if "ior" in edit:
        table = table.replace(ior=table.ior.at[i].set(float(edit["ior"])))
    if "density" in edit:
        table = table.replace(density=table.density.at[i].set(float(edit["density"])))
    return table


def _light_from_edit(cls, current_kwargs: dict, edit: dict):
    fields = {f.name for f in dataclasses.fields(cls)}
    kwargs = dict(current_kwargs)
    for k, v in edit.items():
        if k in fields:
            kwargs[k] = tuple(v) if isinstance(v, list) else v
    return cls(**kwargs)


def _bank_row_kwargs(kind: str, lights, idx: int) -> dict:
    """Reconstruct light constructor kwargs from the LightBank row so a
    partial edit preserves the light's other parameters (the reference
    mutates the stored Params in place, ``HeatrayRenderer.cpp:875-946``).

    The bank stores radiometric color = color x intensity-scale; decompose
    with the convention max(color) == 1, which round-trips exactly for
    lights created with normalized colors and keeps the radiometric product
    exact for untouched fields either way."""
    import math as _math

    from .scene.lights import LUMENS_TO_WATTS, WATTS_TO_LUMENS

    def decompose(rad, to_intensity):
        rad = np.asarray(rad, np.float64)
        peak = float(rad.max())
        if peak <= 0.0:
            return (0.0, 0.0, 0.0), 0.0
        return tuple((rad / peak).tolist()), to_intensity(peak)

    if kind == "directional_light":
        color, lux = decompose(
            lights.dir_color[idx], lambda w: w * WATTS_TO_LUMENS
        )
        return {
            "direction": tuple(np.asarray(lights.dir_direction[idx]).tolist()),
            "color": color,
            "illuminance": lux,
        }
    if kind == "point_light":
        color, lm = decompose(
            lights.point_color[idx],
            lambda w: w / (LUMENS_TO_WATTS * 4.0 * _math.pi),
        )
        return {
            "position": tuple(np.asarray(lights.point_position[idx]).tolist()),
            "color": color,
            "luminous_intensity": lm,
        }
    if kind == "spot_light":
        color, lm = decompose(
            lights.spot_color[idx],
            lambda w: w / (LUMENS_TO_WATTS * _math.pi),
        )
        cos_in, cos_out = np.asarray(lights.spot_cos_angles[idx]).tolist()
        return {
            "position": tuple(np.asarray(lights.spot_position[idx]).tolist()),
            "direction": tuple(
                np.asarray(lights.spot_direction[idx]).tolist()
            ),
            "color": color,
            "inner_angle": _math.acos(float(np.clip(cos_in, -1.0, 1.0))),
            "outer_angle": _math.acos(float(np.clip(cos_out, -1.0, 1.0))),
            "luminous_intensity": lm,
        }
    raise ValueError(kind)


class InteractiveRenderer:
    """Progressive renderer + edit loop (``HeatrayRenderer`` orchestrator)."""

    def __init__(
        self,
        scene: Scene,
        camera: CameraParams,
        options: RenderOptions,
        post: Optional[PostProcessingParams] = None,
        viewer=None,
        orbit: Optional[dict] = None,
        max_channel_value: float = 3.14159265,
    ):
        self.scene = scene
        self.camera = camera
        # Interactive sessions are compile-latency-sensitive: every
        # RenderOptions edit retraces the pass, and the multi-operand
        # bounce sort costs ~3.5 min to compile at 1080p vs ~35 s for the
        # packed-gather impl (tpu_sortimpl_bench.py) at a ~25% per-pass
        # cost — the right trade for a live preview.  Explicit sort_impl
        # choices are honored.
        if options.sort_impl == "auto":
            options = dataclasses.replace(options, sort_impl="take")
        self.options = options
        self.post = post or PostProcessingParams()
        self.viewer = viewer
        # Orbit state for camera edits (the UI's orbit parameters).
        self.orbit = dict(
            distance=6.0, phi=0.0, theta=0.3, focal_length=50.0,
            fstop=0.0, focus_distance=None, target=(0.0, 0.0, 0.0),
        )
        if orbit:
            self.orbit.update(orbit)
        self.max_channel_value = max_channel_value
        self.ctx: RenderContext = make_context(options, scene)
        self.accum = jnp.zeros(
            (4, options.height, options.width), jnp.float32
        )
        self.pass_index = 0

    def scene_info(self) -> dict:
        """Editable-surface listing for /scene.json (the data the reference's
        material/light editor panels display)."""
        m = self.scene.materials
        lights = self.scene.lights
        return {
            "materials": [
                {
                    "index": i,
                    "kind": "glass" if int(m.kind[i]) else "pbr",
                    "base_color": np.asarray(m.base_color[:, i]).tolist(),
                    "roughness": float(m.roughness[i]),
                    "metallic": float(m.metallic[i]),
                }
                for i in range(m.num_materials)
            ],
            "lights": {
                "directional": int(lights.num_directional),
                "point": int(lights.num_point),
                "spot": int(lights.num_spot),
                "environment": bool(int(lights.env_enabled)),
            },
            "camera": dict(self.orbit),
            "options": {
                "width": self.options.width,
                "height": self.options.height,
                "max_ray_depth": self.options.max_ray_depth,
                "max_render_passes": self.options.max_render_passes,
            },
        }

    # -- resetRenderer (``HeatrayRenderer.cpp:1601-1608``) ------------------
    def reset(self):
        self.accum = jnp.zeros_like(self.accum)
        self.pass_index = 0

    def _rebuild_shade_table(self):
        pack = self.ctx.accel_pack
        if pack is not None and pack.shade_table is not None:
            from .render.shade_table import NUM_COLS

            table = jax.jit(build_shade_table, static_argnames="textured")(
                self.scene, pack.accel,
                textured=pack.shade_table.shape[1] >= NUM_COLS,
            )
            self.ctx = self.ctx.replace(
                accel_pack=pack.replace(shade_table=table)
            )

    def _rebuild_camera(self):
        o = self.orbit
        aperture = 0.0
        if o["fstop"] and o["fstop"] > 0.0:
            aperture = (o["focal_length"] / o["fstop"]) / 1000.0
        self.camera = orbit_camera(
            self.options.width, self.options.height,
            distance=o["distance"], phi=o["phi"], theta=o["theta"],
            target=tuple(o.get("target", (0.0, 0.0, 0.0))),
            focal_length_mm=o["focal_length"],
            focus_distance=o["focus_distance"],
            aperture_radius=aperture,
        )

    def apply_edit(self, edit: dict) -> bool:
        """Apply one edit message; returns True if accumulation must reset."""
        kind = edit.get("type")
        if kind == "material":
            self.scene = self.scene.replace(
                materials=_cond_material(
                    self.scene.materials, int(edit.get("index", 0)), edit
                )
            )
            # Shade rows bake material constants -> rebuild (the analog of
            # ``Material::modify`` re-uploading the uniform block).
            self._rebuild_shade_table()
            return True
        if kind in ("directional_light", "point_light", "spot_light"):
            idx = int(edit.get("index", 0))
            cls, update, add = {
                "directional_light": (
                    DirectionalLight,
                    scene_edit.update_directional_light,
                    scene_edit.add_directional_light,
                ),
                "point_light": (
                    PointLight,
                    scene_edit.update_point_light,
                    scene_edit.add_point_light,
                ),
                "spot_light": (
                    SpotLight,
                    scene_edit.update_spot_light,
                    scene_edit.add_spot_light,
                ),
            }[kind]
            counts = {
                "directional_light": int(self.scene.lights.num_directional),
                "point_light": int(self.scene.lights.num_point),
                "spot_light": int(self.scene.lights.num_spot),
            }
            # Seed unspecified fields from the light's CURRENT bank row
            # (new lights start from the class defaults): a partial edit —
            # e.g. only ``color`` — must not reset position or intensity.
            current = (
                _bank_row_kwargs(kind, self.scene.lights, idx)
                if 0 <= idx < counts[kind] and not edit.get("remove")
                else {}
            )
            light = _light_from_edit(cls, current, edit)
            if edit.get("remove"):
                remove = {
                    "directional_light": scene_edit.remove_directional_light,
                    "point_light": scene_edit.remove_point_light,
                    "spot_light": scene_edit.remove_spot_light,
                }[kind]
                self.scene = remove(self.scene, idx)
            elif idx >= counts[kind]:
                self.scene = add(self.scene, light)
            else:
                self.scene = update(self.scene, idx, light)
            return True
        if kind == "env":
            lights = self.scene.lights
            if "exposure" in edit:
                lights = lights.replace(
                    env_exposure_compensation=jnp.float32(
                        2.0 ** float(edit["exposure"])
                    )
                )
            if "rotation" in edit:
                lights = lights.replace(
                    env_rotation=jnp.float32(float(edit["rotation"]))
                )
            if "solid_color" in edit:
                lights = lights.replace(
                    env_map=jnp.asarray(
                        edit["solid_color"], jnp.float32
                    ).reshape(3, 1, 1),
                )
            if "enabled" in edit:
                lights = lights.replace(
                    env_enabled=jnp.int32(1 if edit["enabled"] else 0)
                )
            self.scene = self.scene.replace(lights=lights)
            return True
        if kind == "load":
            # Drag-drop scene/environment loading (``main.cpp:58``,
            # ``HeatrayRenderer::changeScene/changeEnvironment``).
            path = str(edit["path"])
            what = edit.get("kind") or (
                "env"
                if path.lower().endswith((".hdr", ".exr"))
                else "scene"
            )
            if what == "env":
                from .io_utils.image import load_image

                # EnvironmentLightDesc convention: top row first.
                img = load_image(path)[::-1]
                lights = self.scene.lights.replace(
                    env_map=jnp.asarray(
                        np.ascontiguousarray(
                            np.asarray(img, np.float32).transpose(2, 0, 1)
                        )
                    ),
                    env_enabled=jnp.int32(1),
                )
                self.scene = self.scene.replace(lights=lights)
                return True
            from .scene.loaders import load_model_scene

            new_scene = load_model_scene(path)
            if int(new_scene.lights.env_enabled) == 0 and int(
                self.scene.lights.env_enabled
            ):
                # The reference keeps the current environment across scene
                # changes (``changeScene`` only swaps geometry/materials).
                cur = self.scene.lights
                new_scene = new_scene.replace(
                    lights=new_scene.lights.replace(
                        env_enabled=cur.env_enabled,
                        env_map=cur.env_map,
                        env_exposure_compensation=(
                            cur.env_exposure_compensation
                        ),
                        env_rotation=cur.env_rotation,
                    )
                )
            self.scene = new_scene
            # Auto-frame the camera from the new scene's AABB
            # (``HeatrayRenderer.cpp:288-296,300-310``).
            from .scene.geometry import scene_aabb

            aabb = np.asarray(scene_aabb(self.scene.geometry))
            center = 0.5 * (aabb[0] + aabb[1])
            radius = float(np.linalg.norm(aabb[1] - aabb[0]) * 0.5)
            self.orbit["target"] = tuple(center.tolist())
            self.orbit["distance"] = max(radius * 3.0, 1e-3)
            self.orbit["focus_distance"] = self.orbit["distance"]
            self._rebuild_camera()
            self.ctx = make_context(self.options, self.scene)
            return True
        if kind == "camera":
            for k in ("distance", "phi", "theta", "fstop", "focal_length",
                      "focus_distance"):
                if k in edit:
                    self.orbit[k] = float(edit[k]) if edit[k] is not None else None
            self._rebuild_camera()
            return True
        if kind == "post":
            fields = {f.name for f in dataclasses.fields(PostProcessingParams)}
            updates = {
                k: (tuple(v) if isinstance(v, list) else v)
                for k, v in edit.items()
                if k in fields
            }
            self.post = dataclasses.replace(self.post, **updates)
            return False  # display-side only: no reset
        if kind == "transform":
            m = scene_edit.trs_matrix(
                yaw=np.radians(float(edit.get("yaw", 0.0))),
                pitch=np.radians(float(edit.get("pitch", 0.0))),
                roll=np.radians(float(edit.get("roll", 0.0))),
                scale=float(edit.get("scale", 1.0)),
            )
            self.scene = scene_edit.apply_transform(self.scene, m)
            # Geometry moved: the accel pack is stale -> full rebuild.
            self.ctx = make_context(self.options, self.scene)
            return True
        if kind == "options":
            # The renderUI options panel analog
            # (``HeatrayRenderer.cpp:948-1599``): any RenderOptions field,
            # plus the firefly clamp (a FrameGlobals value).
            if "max_channel_value" in edit:
                self.max_channel_value = float(edit["max_channel_value"])
            fields = {f.name for f in dataclasses.fields(RenderOptions)}
            updates = {k: v for k, v in edit.items() if k in fields}
            if "aov" in updates:
                from .options import AOV

                updates["aov"] = AOV(updates["aov"])
            if updates:
                self.options = dataclasses.replace(self.options, **updates)
                self.ctx = make_context(self.options, self.scene)
                self.accum = jnp.zeros(
                    (4, self.options.height, self.options.width), jnp.float32
                )
            return True
        return False

    def poll_and_apply(self) -> int:
        """Drain the viewer's edit queue; returns the number applied."""
        if self.viewer is None:
            return 0
        edits = self.viewer.poll_edits()
        need_reset = False
        for e in edits:
            try:
                need_reset |= self.apply_edit(e)
            except Exception as exc:  # a bad edit must not kill the loop
                print(f"[interactive] edit failed: {exc}", file=sys.stderr)
        if need_reset:
            self.reset()
        return len(edits)

    def step(self):
        """Render one progressive pass."""
        frame = FrameGlobals.create(
            sample_index=self.pass_index,
            max_channel_value=self.max_channel_value,
        )
        self.accum = render_pass(
            self.scene, self.camera, self.ctx, self.options, frame, self.accum
        )
        self.pass_index += 1

    def publish(self):
        if self.viewer is None:
            return
        from .post import apply_post_pipeline

        img = np.asarray(apply_post_pipeline(self.accum, self.post))
        rgb8 = (np.clip(img[::-1], 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
        self.viewer.update(
            rgb8, self.pass_index, self.options.max_render_passes
        )

    def run(self, max_passes: Optional[int] = None, publish_every: int = 1):
        """The main loop: render until ``max_passes`` (None = serve forever,
        idling at convergence like the reference's vsync loop)."""
        try:
            while True:
                budget = (
                    max_passes
                    if max_passes is not None
                    else self.options.max_render_passes
                )
                if self.pass_index < budget:
                    self.step()
                    if (
                        self.pass_index % publish_every == 0
                        or self.pass_index == budget
                    ):
                        self.publish()
                else:
                    if max_passes is not None:
                        break
                    time.sleep(0.05)  # converged: idle until an edit arrives
                if self.poll_and_apply():
                    self.publish()
        except KeyboardInterrupt:
            pass
        return self.accum
