"""Compute kernels: ray-triangle intersection (jnp + Pallas), BVH."""

from .intersect import (
    MISS_T,
    WoopAccel,
    build_woop,
    hit_attributes,
    intersect_any,
    intersect_closest,
)

__all__ = [
    "MISS_T",
    "WoopAccel",
    "build_woop",
    "hit_attributes",
    "intersect_any",
    "intersect_closest",
]
