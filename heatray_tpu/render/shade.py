"""Unified surface shading: PBR (roughness/metallic/clearcoat/multiscatter)
and glass (rough dielectric with Beer absorption), evaluated branchlessly per
ray and selected by material kind.

Ports the estimator structure of ``Resources/shaders/physicallyBased.rlsl``,
``glass.rlsl`` and ``microfacet.rlsl`` exactly (parity mode):

- one *direct* (NEE) shadow ray + one *extension* ray per hit per pass
  (``physicallyBased.rlsl``'s ``rl_OutputRayCount = 2``),
- luminance-weighted lobe selection (diffuse / clearcoat / specular),
- luminance-weighted light selection with the environment fall-through; the
  environment is "sampled" by sampling the BSDF with an occlusion test
  (``microfacet.rlsl:93-97``),
- Russian roulette above depth 3 on max(weight) (``physicallyBased.rlsl:279-288``),
- indirect rays that miss geometry contribute NOTHING (their default
  primitive is null — only camera rays and glass refraction rays see the
  environment on miss, ``perspective.rlsl:87``, ``glass.rlsl:254``),
- sequence-index stratification offsets per purpose (+0 sample, +1 lobe/light
  select, +2 RR, +3 indirect sample, +4 indirect lobe select).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from ..sampling.tables import SampleTables, get_sequence_value
from ..scene.lights import LIGHT_TYPE_ENVIRONMENT, LIGHT_TYPE_NONE
from ..scene.materials import KIND_GLASS, KIND_PBR
from ..scene.scene import Scene
from . import brdf
from .bsdf_sampling import cosine_weighted_sample, refract, sample_visible_ggx
from .envmap import env_radiance
from .light_sampling import compute_light_sample
from .multiscatter import compute_multiscattering
from .onb import (
    frame_to_world,
    greater_than_zero,
    luminosity,
    normalize,
    orthonormal_frame,
    saturate,
    world_to_frame,
)

_EMIT_EPS = 1e-5  # ``dot(reflectance, reflectance) > 1e-5`` emission threshold


@struct.dataclass
class ShadeResult:
    """Outputs of shading one wavefront of hits (all (R,) / (R,3))."""

    emission: jnp.ndarray  # (R,3) contribution to accumulate now
    # NEE shadow ray:
    shadow_dir: jnp.ndarray  # (R,3)
    shadow_weight: jnp.ndarray  # (R,3) BSDF weight (zero = no ray)
    shadow_radiance: jnp.ndarray  # (R,3) light radiance if unoccluded
    shadow_max_t: jnp.ndarray  # (R,)
    shadow_active: jnp.ndarray  # (R,) bool
    # Extension ray:
    ext_dir: jnp.ndarray  # (R,3)
    ext_weight: jnp.ndarray  # (R,3)
    ext_env_on_miss: jnp.ndarray  # (R,) bool
    ext_active: jnp.ndarray  # (R,) bool


def _gather(arr, idx):
    return jnp.take(arr, idx, axis=0)


def _interp(attr, indices, tid, w0, b1, b2):
    """Barycentric vertex-attribute interpolation for hit triangles."""
    tri = _gather(indices, tid)  # (R, 3)
    a0 = _gather(attr, tri[:, 0])
    a1 = _gather(attr, tri[:, 1])
    a2 = _gather(attr, tri[:, 2])
    return a0 * w0[:, None] + a1 * b1[:, None] + a2 * b2[:, None]


def shade_hits(
    scene: Scene,
    ms_lut: jnp.ndarray,
    tables: SampleTables,
    sample_index,
    depth,
    org,
    ray_dir,
    weight,
    env_on_miss,
    seq_id,
    seq_off,
    t,
    b1,
    b2,
    tid,
    front,
    active,
    max_ray_depth: int,
    rr_start_depth: int = 3,
) -> ShadeResult:
    """Shade one wavefront of surface hits (masked by ``active``)."""
    r = org.shape[0]
    geom = scene.geometry
    mats = scene.materials
    lights = scene.lights

    safe_tid = jnp.maximum(tid, 0)
    w0 = 1.0 - b1 - b2
    p = org + t[:, None] * ray_dir
    n_shading = normalize(_interp(geom.normals, geom.indices, safe_tid, w0, b1, b2))
    vtx_color = _interp(geom.colors, geom.indices, safe_tid, w0, b1, b2)

    mid = _gather(geom.material_ids, safe_tid)
    kind = _gather(mats.kind, mid)
    is_glass = kind == KIND_GLASS
    base_color = _gather(mats.base_color, mid) * vtx_color
    emissive_c = _gather(mats.emissive, mid)
    metallic = _gather(mats.metallic, mid)
    roughness = _gather(mats.roughness, mid)
    alpha = _gather(mats.roughness_alpha, mid)
    spec_f0 = _gather(mats.specular_f0, mid)
    clearcoat = _gather(mats.clearcoat, mid)
    cc_rough = _gather(mats.clearcoat_roughness, mid)
    cc_alpha = _gather(mats.clearcoat_roughness_alpha, mid)
    ior = _gather(mats.ior, mid)
    density = _gather(mats.density, mid)
    double_sided = _gather(mats.double_sided, mid) > 0

    v = -ray_dir  # unit (ray_dir is unit)

    # --- Face orientation -------------------------------------------------
    # PBR: double-sided flips N on backface; single-sided backface hits pass
    # through unchanged (``physicallyBased.rlsl:95-108``).  Glass always
    # flips on backface (``glass.rlsl:161-167``).
    flip = (~front) & (double_sided | is_glass)
    n = jnp.where(flip[:, None], -n_shading, n_shading)
    pbr_passthrough = (~front) & (~double_sided) & (~is_glass)

    # Glass Beer's-law absorption when exiting the medium
    # (``glass.rlsl:131-136``).
    absorption = 1.0 - base_color
    beer = jnp.exp(absorption * (-density * t)[:, None])
    glass_weight = jnp.where(
        (is_glass & ~front)[:, None], weight * beer, weight
    )

    # --- QMC draws: 5 consecutive sequences -------------------------------
    sidx = sample_index + seq_off
    rnd = [
        get_sequence_value(tables, seq_id + depth + k, sidx) for k in range(5)
    ]

    fx, fz = orthonormal_frame(n)
    n_dot_v = saturate(jnp.sum(n * v, axis=-1))

    # ======================================================================
    # PBR lobes (``physicallyBased.rlsl:205-330``)
    # ======================================================================
    cc_n = n  # clearcoat normal (no clearcoat normalmap yet)
    cc_n_dot_v = n_dot_v
    cc_f = brdf.f_schlick(0.04, cc_n_dot_v)
    cc_scale = cc_f * clearcoat
    bottom = (1.0 - cc_scale)[:, None]

    c_diff = base_color * (1.0 - metallic)[:, None] * bottom
    c_spec = (
        spec_f0[:, None] + (base_color - spec_f0[:, None]) * metallic[:, None]
    ) * bottom

    diff_lum = luminosity(c_diff)
    spec_lum = luminosity(c_spec)
    p_norm = 1.0 / greater_than_zero(diff_lum + spec_lum + cc_scale)
    p_diff = diff_lum * p_norm
    p_spec = spec_lum * p_norm
    p_cc = cc_scale * p_norm

    def select_lobe(u):
        """Lobe pick in reference order: diffuse, clearcoat, specular."""
        sel_d = u <= p_diff
        sel_c = (~sel_d) & (u <= p_diff + p_cc)
        sel_s = (~sel_d) & (~sel_c) & (u <= p_diff + p_cc + p_spec)
        return sel_d, sel_c, sel_s

    def spec_lobe_params(sel_c):
        """Clearcoat vs base specular parameter select."""
        a = jnp.where(sel_c, cc_alpha, alpha)
        rough = jnp.where(sel_c, cc_rough, roughness)
        cs = jnp.where(
            sel_c[:, None],
            jnp.broadcast_to(cc_scale[:, None], c_spec.shape),
            c_spec,
        )
        lobe_p = jnp.where(sel_c, p_cc, p_spec)
        return a, rough, cs, lobe_p

    local_v = world_to_frame(v, fx, n, fz)

    # ---- PBR direct (NEE) ------------------------------------------------
    d_rand = rnd[0]
    d_prob = rnd[1]
    sel_d, sel_c, sel_s = select_lobe(d_prob[:, 0])
    ls = compute_light_sample(lights, n, p, d_prob[:, 1])
    env_sel = ls.light_type == LIGHT_TYPE_ENVIRONMENT

    a_sp, rough_sp, cs_sp, lobep_sp = spec_lobe_params(sel_c)
    ms = compute_multiscattering(ms_lut, cs_sp, n_dot_v, rough_sp)

    # Punctual branch: evaluate BRDF toward the chosen light.
    l_dir = ls.direction
    n_dot_l = jnp.sum(n * l_dir, axis=-1)
    h = normalize(v + l_dir)
    n_dot_h = saturate(jnp.sum(n * h, axis=-1))
    i_dot_h = saturate(jnp.sum(v * h, axis=-1))
    f_diff_punct = (c_diff / jnp.pi) * saturate(n_dot_l)[:, None]
    d_term = brdf.d_ggx(n_dot_h, a_sp)
    f_term = brdf.f_schlick(cs_sp, i_dot_h[:, None])
    g_term = brdf.g2_smith_ggx(saturate(n_dot_l), n_dot_v, a_sp)
    f_spec_punct = (
        d_term[:, None] * f_term * g_term[:, None]
        / greater_than_zero(4.0 * n_dot_v)[:, None]
    ) * ms
    f_punct = jnp.where(sel_d[:, None], f_diff_punct, f_spec_punct)
    lobe_p_sel = jnp.where(sel_d, p_diff, lobep_sp)
    sw_punct = (
        f_punct
        * weight
        / greater_than_zero(lobe_p_sel)[:, None]
        / greater_than_zero(ls.probability)[:, None]
    )
    punct_ok = (
        (~env_sel)
        & (ls.light_type != LIGHT_TYPE_NONE)
        & (n_dot_l > 0.0)
        & (sel_d | sel_c | sel_s)
    )

    # Environment branch: sample the BSDF, occlusion-test toward the env.
    o_diff = frame_to_world(
        cosine_weighted_sample(d_rand[:, 0], d_rand[:, 1]), fx, n, fz
    )
    h_env = frame_to_world(
        sample_visible_ggx(local_v, d_rand[:, 0], d_rand[:, 1], a_sp), fx, n, fz
    )
    i_dot_h_env = saturate(jnp.sum(v * h_env, axis=-1))
    o_spec = normalize(2.0 * i_dot_h_env[:, None] * h_env - v)
    o_env = jnp.where(sel_d[:, None], o_diff, o_spec)
    n_dot_o_env = jnp.sum(n * o_env, axis=-1)
    # diffuse: cosine PDF cancels -> weight = Cdiff (``microfacet.rlsl:25-52``)
    w_diff_env = c_diff
    f_env = brdf.f_schlick(cs_sp, i_dot_h_env[:, None])
    g2 = brdf.g2_smith_ggx(n_dot_v, saturate(n_dot_o_env), a_sp)
    g1 = brdf.g1_smith_ggx(n_dot_v, a_sp)
    w_spec_env = f_env * (g2 / greater_than_zero(g1))[:, None] * ms
    w_env_lobe = jnp.where(sel_d[:, None], w_diff_env, w_spec_env)
    sw_env = (
        w_env_lobe
        * weight
        / greater_than_zero(lobe_p_sel)[:, None]
        / greater_than_zero(ls.probability)[:, None]
    )
    env_ok = (
        env_sel
        & (ls.probability > 0.0)
        & (n_dot_o_env > 0.0)
        & (sel_d | sel_c | sel_s)
    )

    pbr_shadow_dir = jnp.where(env_sel[:, None], o_env, l_dir)
    pbr_shadow_w = jnp.where(env_sel[:, None], sw_env, sw_punct)
    pbr_shadow_rad = jnp.where(
        env_sel[:, None], env_radiance(lights, o_env), ls.radiance
    )
    pbr_shadow_maxt = jnp.where(env_sel, jnp.float32(3.0e37), ls.max_distance)
    pbr_shadow_ok = jnp.where(env_sel, env_ok, punct_ok)

    # ---- PBR indirect ----------------------------------------------------
    # Russian roulette (``physicallyBased.rlsl:279-288``).
    rr_rand = rnd[2][:, 0]
    rr_p = jnp.max(weight, axis=-1)
    rr_on = depth > rr_start_depth
    rr_kill = rr_on & (rr_rand >= rr_p)
    ind_weight = jnp.where(
        (rr_on & ~rr_kill)[:, None], weight / greater_than_zero(rr_p)[:, None], weight
    )

    i_rand = rnd[3]
    i_prob = rnd[4]
    isel_d, isel_c, isel_s = select_lobe(i_prob[:, 0])
    a_isp, rough_isp, cs_isp, lobep_isp = spec_lobe_params(isel_c)
    ms_i = compute_multiscattering(ms_lut, cs_isp, n_dot_v, rough_isp)

    io_diff = frame_to_world(
        cosine_weighted_sample(i_rand[:, 0], i_rand[:, 1]), fx, n, fz
    )
    ih = frame_to_world(
        sample_visible_ggx(local_v, i_rand[:, 0], i_rand[:, 1], a_isp), fx, n, fz
    )
    i_dot_ih = saturate(jnp.sum(v * ih, axis=-1))
    io_spec = normalize(2.0 * i_dot_ih[:, None] * ih - v)
    io = jnp.where(isel_d[:, None], io_diff, io_spec)
    n_dot_io = jnp.sum(n * io, axis=-1)
    fi = brdf.f_schlick(cs_isp, i_dot_ih[:, None])
    g2i = brdf.g2_smith_ggx(n_dot_v, saturate(n_dot_io), a_isp)
    g1i = brdf.g1_smith_ggx(n_dot_v, a_isp)
    iw_spec = fi * (g2i / greater_than_zero(g1i))[:, None] * ms_i
    iw_lobe = jnp.where(isel_d[:, None], c_diff, iw_spec)
    ilobe_p = jnp.where(isel_d, p_diff, lobep_isp)
    pbr_ext_w = ind_weight * iw_lobe / greater_than_zero(ilobe_p)[:, None]
    pbr_ext_ok = (
        (~rr_kill) & (n_dot_io > 0.0) & (isel_d | isel_c | isel_s)
    )
    pbr_ext_dir = io

    pbr_emission = weight * emissive_c

    # ======================================================================
    # Glass (``glass.rlsl:138-280``)
    # ======================================================================
    eta = jnp.where(front, 1.0 / greater_than_zero(ior), ior)
    gw = glass_weight

    gh = frame_to_world(
        sample_visible_ggx(local_v, rnd[0][:, 0], rnd[0][:, 1], alpha), fx, n, fz
    )
    gh_dot_i = saturate(jnp.sum(gh * v, axis=-1))
    fres = brdf.f_fresnel(eta, gh_dot_i)
    refract_u = jnp.where(front, rnd[1][:, 1], 0.0)  # inside: force refract
    do_refract = refract_u < (1.0 - fres)
    g_n_dot_i = saturate(n_dot_v)

    # Refraction (``glass.rlsl:234-256``): transmission = baseColor * G2/G1.
    o_refr = refract(-v, gh, eta)
    o_refr_len = jnp.linalg.norm(o_refr, axis=-1)
    o_refr = o_refr / greater_than_zero(o_refr_len)[:, None]
    n_dot_or = jnp.abs(jnp.sum(n * o_refr, axis=-1))
    g2g = brdf.g2_smith_ggx(g_n_dot_i, n_dot_or, alpha)
    g1g = brdf.g1_smith_ggx(g_n_dot_i, alpha)
    trans_w = base_color * (g2g / greater_than_zero(g1g))[:, None] * gw
    refr_ok = do_refract & (o_refr_len > 1e-8)

    # Reflection direct (``glass.rlsl:257-262`` -> ``directSpecularGlassSample``):
    # the light probability is refractProbability.x and the env-fallback
    # microfacet uses a fresh rand (k2).
    g_ls = compute_light_sample(lights, n, p, rnd[1][:, 0])
    g_env_sel = g_ls.light_type == LIGHT_TYPE_ENVIRONMENT
    gl_dir = g_ls.direction
    g_n_dot_l = jnp.sum(n * gl_dir, axis=-1)
    gh2 = normalize(v + gl_dir)
    g_n_dot_h = saturate(jnp.sum(n * gh2, axis=-1))
    gd = brdf.d_ggx(g_n_dot_h, alpha)
    gg = brdf.g2_smith_ggx(saturate(g_n_dot_l), g_n_dot_i, alpha)
    g_spec = gd * gg / greater_than_zero(4.0 * g_n_dot_i)
    g_sw_punct = (
        g_spec[:, None]
        * base_color
        * gw
        / greater_than_zero(g_ls.probability)[:, None]
    )
    g_punct_ok = (~g_env_sel) & (g_n_dot_l > 0.0) & (~do_refract)

    # Env fallback: fresh VNDF with rand k2 (``glass.rlsl:260-261``).
    gh3 = frame_to_world(
        sample_visible_ggx(local_v, rnd[2][:, 0], rnd[2][:, 1], alpha), fx, n, fz
    )
    gi_dot_h3 = saturate(jnp.sum(v * gh3, axis=-1))
    go3 = normalize(2.0 * gi_dot_h3[:, None] * gh3 - v)
    g_n_dot_o3 = jnp.sum(n * go3, axis=-1)
    g_n_dot_h3 = saturate(jnp.sum(n * gh3, axis=-1))
    gg3 = brdf.g2_smith_ggx(saturate(g_n_dot_o3), g_n_dot_i, alpha)
    # Reference weight: baseColor * (G * IdotH) / (NdotH * NdotI)
    # (``glass.rlsl:62-64`` — VNDF sample weighted with the plain-NDF PDF, a
    # reference idiosyncrasy kept for parity).
    g_w3 = (
        base_color
        * (
            gg3 * gi_dot_h3 / greater_than_zero(g_n_dot_h3 * g_n_dot_i)
        )[:, None]
        * gw
        / greater_than_zero(g_ls.probability)[:, None]
    )
    g_env_ok = g_env_sel & (g_ls.probability > 0.0) & (g_n_dot_o3 > 0.0) & (~do_refract)

    glass_shadow_dir = jnp.where(g_env_sel[:, None], go3, gl_dir)
    glass_shadow_w = jnp.where(g_env_sel[:, None], g_w3, g_sw_punct)
    glass_shadow_rad = jnp.where(
        g_env_sel[:, None], env_radiance(lights, go3), g_ls.radiance
    )
    glass_shadow_maxt = jnp.where(g_env_sel, jnp.float32(3.0e37), g_ls.max_distance)
    glass_shadow_ok = jnp.where(g_env_sel, g_env_ok, g_punct_ok)

    # Reflection indirect (``glass.rlsl:263-278``): RR with k3, sample k4.
    g_rr_rand = rnd[3][:, 0]
    g_rr_p = jnp.max(gw, axis=-1)
    g_rr_kill = rr_on & (g_rr_rand >= g_rr_p)
    g_ind_w = jnp.where(
        (rr_on & ~g_rr_kill)[:, None], gw / greater_than_zero(g_rr_p)[:, None], gw
    )
    gh4 = frame_to_world(
        sample_visible_ggx(local_v, rnd[4][:, 0], rnd[4][:, 1], alpha), fx, n, fz
    )
    gi_dot_h4 = saturate(jnp.sum(v * gh4, axis=-1))
    go4 = normalize(2.0 * gi_dot_h4[:, None] * gh4 - v)
    g_n_dot_o4 = jnp.sum(n * go4, axis=-1)
    g_n_dot_h4 = saturate(jnp.sum(n * gh4, axis=-1))
    gg4 = brdf.g2_smith_ggx(saturate(g_n_dot_o4), g_n_dot_i, alpha)
    g_w4 = (
        base_color
        * (gg4 * gi_dot_h4 / greater_than_zero(g_n_dot_h4 * g_n_dot_i))[:, None]
        * g_ind_w
    )
    g_refl_ext_ok = (~do_refract) & (~g_rr_kill) & (g_n_dot_o4 > 0.0)

    glass_ext_dir = jnp.where(do_refract[:, None], o_refr, go4)
    glass_ext_w = jnp.where(do_refract[:, None], trans_w, g_w4)
    glass_ext_ok = jnp.where(do_refract, refr_ok, g_refl_ext_ok)
    glass_ext_env = do_refract  # refraction rays see the env on miss

    # ======================================================================
    # Combine PBR / glass / passthrough
    # ======================================================================
    emission = jnp.where(is_glass[:, None], 0.0, pbr_emission)

    shadow_dir = jnp.where(is_glass[:, None], glass_shadow_dir, pbr_shadow_dir)
    shadow_w = jnp.where(is_glass[:, None], glass_shadow_w, pbr_shadow_w)
    shadow_rad = jnp.where(is_glass[:, None], glass_shadow_rad, pbr_shadow_rad)
    shadow_maxt = jnp.where(is_glass, glass_shadow_maxt, pbr_shadow_maxt)
    shadow_ok = jnp.where(is_glass, glass_shadow_ok, pbr_shadow_ok)

    ext_dir = jnp.where(is_glass[:, None], glass_ext_dir, pbr_ext_dir)
    ext_w = jnp.where(is_glass[:, None], glass_ext_w, pbr_ext_w)
    ext_ok = jnp.where(is_glass, glass_ext_ok, pbr_ext_ok)
    ext_env = jnp.where(is_glass, glass_ext_env, False)

    # Single-sided PBR backface: pass through unchanged
    # (``physicallyBased.rlsl:102-107``).
    ext_dir = jnp.where(pbr_passthrough[:, None], ray_dir, ext_dir)
    ext_w = jnp.where(pbr_passthrough[:, None], weight, ext_w)
    ext_ok = jnp.where(pbr_passthrough, True, ext_ok)
    ext_env = jnp.where(pbr_passthrough, env_on_miss, ext_env)
    emission = jnp.where(pbr_passthrough[:, None], 0.0, emission)
    shadow_ok = jnp.where(pbr_passthrough, False, shadow_ok)

    # Depth gate: extensions only spawn while depth < maxRayDepth
    # (``physicallyBased.rlsl:277``).
    ext_ok = ext_ok & (depth < max_ray_depth)

    # Emission thresholds (``dot(w, w) > 1e-5``).
    shadow_ok = shadow_ok & (
        jnp.sum(shadow_w * shadow_w, axis=-1) > _EMIT_EPS
    )
    ext_ok = ext_ok & (jnp.sum(ext_w * ext_w, axis=-1) > _EMIT_EPS)

    # Mask everything by 'this lane is an actual live hit'.
    shadow_ok = shadow_ok & active
    ext_ok = ext_ok & active
    emission = jnp.where(active[:, None], emission, 0.0)

    return ShadeResult(
        emission=emission,
        shadow_dir=shadow_dir,
        shadow_weight=jnp.where(shadow_ok[:, None], shadow_w, 0.0),
        shadow_radiance=shadow_rad,
        shadow_max_t=shadow_maxt,
        shadow_active=shadow_ok,
        ext_dir=ext_dir,
        ext_weight=jnp.where(ext_ok[:, None], ext_w, 0.0),
        ext_env_on_miss=ext_env,
        ext_active=ext_ok,
    )
