"""Texture atlas + textured shading tests (the 7 PBR texture slots,
normal mapping, alpha masking; ``physicallyBased.rlsl:56-157``)."""

import numpy as np
import pytest

from heatray_tpu.camera import orbit_camera
from heatray_tpu.options import RenderOptions
from heatray_tpu.render import make_context, render, resolve
from heatray_tpu.scene import (
    PBRParams,
    SceneBuilder,
    plane_mesh,
    sphere_mesh,
    translate,
)
from heatray_tpu.scene.lights import DirectionalLight, EnvironmentLightDesc
from heatray_tpu.scene.textures import AtlasBuilder, sample_atlas

import jax.numpy as jnp


class TestAtlas:
    def test_pack_and_sample(self):
        b = AtlasBuilder()
        img0 = np.zeros((4, 4, 3), np.float32)
        img0[:, :, 0] = 1.0  # red
        img1 = np.zeros((2, 8, 3), np.float32)
        img1[:, :, 2] = 1.0  # blue
        t0 = b.add(img0)
        t1 = b.add(img1)
        atlas = b.build()
        assert atlas.num_textures == 2
        r, g, bl, a = sample_atlas(
            atlas,
            jnp.asarray([t0, t1], jnp.int32),
            jnp.asarray([0.5, 0.5]),
            jnp.asarray([0.5, 0.5]),
        )
        assert np.allclose(np.asarray(r), [1.0, 0.0])
        assert np.allclose(np.asarray(bl), [0.0, 1.0])
        assert np.allclose(np.asarray(a), [1.0, 1.0])

    def test_wrap_repeat(self):
        b = AtlasBuilder()
        grad = np.linspace(0, 1, 8, dtype=np.float32)[None, :, None] * np.ones(
            (8, 8, 3), np.float32
        )
        tid = b.add(grad)
        atlas = b.build()
        # u and u+1 sample identically (GL REPEAT).
        u = jnp.asarray([0.3, 1.3])
        v = jnp.asarray([0.5, 0.5])
        r0, *_ = sample_atlas(atlas, jnp.asarray([tid, tid], jnp.int32), u, v)
        r0 = np.asarray(r0)
        assert np.allclose(r0[0], r0[1], atol=1e-6)

    def test_dedupe_by_key(self):
        b = AtlasBuilder()
        img = np.ones((2, 2, 3), np.float32)
        a = b.add(img, key="same")
        c = b.add(img * 0.5, key="same")  # ignored: same key
        assert a == c

    def test_srgb_conversion(self):
        b = AtlasBuilder()
        tid = b.add(np.full((1, 1, 3), 0.5, np.float32), srgb=True)
        atlas = b.build()
        r, *_ = sample_atlas(
            atlas, jnp.asarray([tid], jnp.int32), jnp.asarray([0.5]), jnp.asarray([0.5])
        )
        # sRGB 0.5 -> linear ~0.2140
        assert np.isclose(float(r[0]), 0.2140, atol=1e-3)


def _checker(n=8):
    c = np.indices((n, n)).sum(axis=0) % 2
    img = np.ones((n, n, 3), np.float32) * c[:, :, None]
    return img


class TestTexturedRender:
    def test_base_color_texture_modulates(self):
        opts = RenderOptions(width=32, height=32, max_render_passes=4, max_ray_depth=2)
        cam = orbit_camera(32, 32, distance=4.0, theta=1.2)
        light = DirectionalLight(direction=(0.0, 1.0, 0.0), illuminance=683.0)

        def scene_with(tex):
            b = SceneBuilder()
            tid = b.add_texture(_checker()) if tex else -1
            b.add_mesh(
                plane_mesh(10, 10),
                PBRParams(base_color=(1.0, 1.0, 1.0), roughness=1.0,
                          specular_f0=0.0, base_color_tex=tid),
            )
            b.add_directional_light(light)
            return b.build()

        img_plain = np.asarray(resolve(render(scene_with(False), cam, opts, num_passes=4)[0]))
        img_tex = np.asarray(resolve(render(scene_with(True), cam, opts, num_passes=4)[0]))
        assert np.isfinite(img_tex).all()
        # Textured version must be darker on average (black squares) and
        # show variance across the plane.
        assert img_tex.mean() < img_plain.mean() * 0.8
        assert img_tex.std() > img_plain.std()

    def test_alpha_mask_passthrough(self):
        """A fully-transparent alpha-masked quad in front of a plane must
        not darken it (pass-through + non-occluding shadows)."""
        opts = RenderOptions(width=24, height=24, max_render_passes=4, max_ray_depth=3)
        cam = orbit_camera(24, 24, distance=4.0, theta=1.2)
        light = DirectionalLight(direction=(0.0, 1.0, 0.0), illuminance=683.0)

        def build(masked):
            b = SceneBuilder()
            rgba = np.ones((2, 2, 4), np.float32)
            rgba[..., 3] = 0.0  # fully transparent texels
            tid = b.add_texture(rgba)
            b.add_mesh(
                plane_mesh(10, 10),
                PBRParams(base_color=(1.0, 1.0, 1.0), roughness=1.0, specular_f0=0.0),
            )
            if masked:
                b.add_mesh(
                    plane_mesh(10, 10),
                    PBRParams(base_color=(1.0, 1.0, 1.0), roughness=1.0,
                              specular_f0=0.0, base_color_tex=tid,
                              alpha_masked=True),
                    transform=translate([0.0, 1.0, 0.0]),
                )
            b.add_directional_light(light)
            return b.build()

        img_bare = np.asarray(resolve(render(build(False), cam, opts, num_passes=4)[0]))
        img_masked = np.asarray(resolve(render(build(True), cam, opts, num_passes=4)[0]))
        assert np.allclose(img_masked, img_bare, atol=5e-3), (
            np.abs(img_masked - img_bare).max()
        )

    def test_emissive_texture_replaces(self):
        opts = RenderOptions(width=16, height=16, max_render_passes=2, max_ray_depth=1)
        cam = orbit_camera(16, 16, distance=3.0)
        b = SceneBuilder()
        tid = b.add_texture(np.full((2, 2, 3), 2.0, np.float32))
        b.add_mesh(
            sphere_mesh(12, 12, 1.0),
            PBRParams(base_color=(0.0, 0.0, 0.0), emissive=(0.0, 0.0, 0.0),
                      emissive_tex=tid),
        )
        b.set_environment(None)
        scene = b.build()
        img = np.asarray(resolve(render(scene, cam, opts, num_passes=2)[0]))
        assert img.max() > 1.0  # the texture REPLACES the (zero) emissive

    def test_normal_map_changes_shading(self):
        opts = RenderOptions(width=24, height=24, max_render_passes=4, max_ray_depth=2)
        cam = orbit_camera(24, 24, distance=4.0, theta=1.2)
        light = DirectionalLight(direction=(0.3, 1.0, 0.2), illuminance=683.0)

        # Tilted-normal map vs flat map.
        def build(nm):
            b = SceneBuilder()
            n = np.zeros((4, 4, 3), np.float32)
            n[..., 0] = 0.5 + (0.3 if nm else 0.0)  # tangent-space x
            n[..., 1] = 0.5
            n[..., 2] = 0.9 if nm else 1.0
            n = n * 0.5 + 0.5 if False else n  # stored as [0,1] already
            tid = b.add_texture(n)
            mesh = plane_mesh(10, 10)
            mesh.tangents = np.tile(np.array([[1.0, 0, 0]], np.float32), (4, 1))
            mesh.bitangents = np.tile(np.array([[0.0, 0, 1.0]], np.float32), (4, 1))
            b.add_mesh(
                mesh,
                PBRParams(base_color=(1.0, 1.0, 1.0), roughness=1.0,
                          specular_f0=0.0, normal_tex=tid),
            )
            b.add_directional_light(light)
            return b.build()

        img_flat = np.asarray(resolve(render(build(False), cam, opts, num_passes=4)[0]))
        img_nm = np.asarray(resolve(render(build(True), cam, opts, num_passes=4)[0]))
        assert np.isfinite(img_nm).all()
        assert np.abs(img_nm - img_flat).max() > 1e-3


class TestMipmaps:
    def _checker(self, n=64):
        img = np.indices((n, n)).sum(axis=0) % 2
        return img.astype(np.float32)

    def test_mip_chain_descriptors(self):
        from heatray_tpu.scene.textures import AtlasBuilder

        b = AtlasBuilder()
        b.add(self._checker(64))
        b.add(np.ones((8, 8, 3), np.float32))
        atlas = b.build()
        assert atlas.num_levels == 7  # 64 -> 1
        # Level sizes halve; short chains alias their 1x1 tail.
        assert list(np.asarray(atlas.mip_width[0])) == [64, 32, 16, 8, 4, 2, 1]
        assert list(np.asarray(atlas.mip_width[1])) == [8, 4, 2, 1, 1, 1, 1]
        off1 = np.asarray(atlas.mip_offset[1])
        assert (off1[3:] == off1[3]).all()

    def test_coarsest_level_is_mean(self):
        from heatray_tpu.scene.textures import AtlasBuilder, sample_atlas

        b = AtlasBuilder()
        b.add(self._checker(32))
        atlas = b.build()
        # Huge footprint forces the 1x1 tail = the image mean (0.5).
        r = sample_atlas(
            atlas,
            jnp.zeros((4,), jnp.int32),
            jnp.array([0.1, 0.4, 0.6, 0.9]),
            jnp.array([0.2, 0.7, 0.3, 0.8]),
            footprint=jnp.full((4,), 1e6, jnp.float32),
        )
        np.testing.assert_allclose(np.asarray(r[0]), 0.5, atol=1e-6)

    def test_zero_footprint_matches_bilinear(self):
        from heatray_tpu.scene.textures import AtlasBuilder, sample_atlas

        b = AtlasBuilder()
        b.add(self._checker(16))
        atlas = b.build()
        u = jnp.linspace(0.05, 0.95, 7)
        v = jnp.linspace(0.1, 0.9, 7)
        tid = jnp.zeros((7,), jnp.int32)
        lo = sample_atlas(atlas, tid, u, v)
        tri = sample_atlas(
            atlas, tid, u, v, footprint=jnp.zeros((7,), jnp.float32)
        )
        np.testing.assert_allclose(np.asarray(tri[0]), np.asarray(lo[0]), atol=1e-6)

    def test_minification_reduces_variance(self):
        """A distant checkered plane: trilinear mip sampling must cut the
        pixel-to-pixel variance versus raw bilinear (the aliasing the
        reference's RL_LINEAR_MIPMAP_LINEAR samplers remove)."""
        import dataclasses

        from heatray_tpu.camera import orbit_camera
        from heatray_tpu.options import RenderOptions
        from heatray_tpu.render import render, resolve
        from heatray_tpu.scene import PBRParams, SceneBuilder, plane_mesh
        from heatray_tpu.scene.lights import EnvironmentLightDesc

        def build():
            b = SceneBuilder()
            tex = b.add_texture(self._checker(256))
            b.add_mesh(
                plane_mesh(40, 40),
                PBRParams(base_color_tex=tex, roughness=1.0),
            )
            b.set_environment(EnvironmentLightDesc(solid_color=(1, 1, 1)))
            return b.build()

        scene = build()
        cam = orbit_camera(32, 32, distance=30.0, theta=0.25)
        base = RenderOptions(
            width=32, height=32, max_render_passes=1, max_ray_depth=1
        )
        img_mip = np.asarray(
            resolve(render(scene, cam, base, num_passes=1)[0])
        )
        img_raw = np.asarray(
            resolve(
                render(
                    scene, cam,
                    dataclasses.replace(base, use_mipmaps=False),
                    num_passes=1,
                )[0]
            )
        )
        hit = img_raw.sum(axis=-1) > 0
        assert hit.sum() > 50
        var_mip = img_mip[hit][:, 0].var()
        var_raw = img_raw[hit][:, 0].var()
        # Near pixels stay at LOD 0 (correctly sharp), so the reduction is
        # bounded; require a clear, deterministic drop.
        assert var_mip < 0.75 * var_raw, (var_mip, var_raw)
