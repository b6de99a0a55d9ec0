"""Rendering core: BSDFs, sampling, light selection, environment, shading,
and the wavefront integrator."""

from . import brdf, bsdf_sampling, onb
from .envmap import env_radiance
from .integrator import (
    RenderContext,
    generate_primary_rays,
    make_context,
    render,
    render_pass,
    resolve,
)
from .light_sampling import LightSample, compute_light_sample
from .multiscatter import (
    compute_multiscattering,
    generate_multiscatter_lut,
    multiscatter_lut_jnp,
)
from .shade import ShadeResult, shade_hits

__all__ = [
    "brdf",
    "bsdf_sampling",
    "onb",
    "env_radiance",
    "RenderContext",
    "generate_primary_rays",
    "make_context",
    "render",
    "render_pass",
    "resolve",
    "LightSample",
    "compute_light_sample",
    "ShadeResult",
    "shade_hits",
    "compute_multiscattering",
    "generate_multiscatter_lut",
    "multiscatter_lut_jnp",
]
