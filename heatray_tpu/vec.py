"""Planar 3-vector math — the TPU-native vector representation.

TPU f32 arrays tile as (8 sublanes, 128 lanes); an ``(R, 3)`` or ``(R, 1)``
array therefore pads its last dim to 128 (42x/128x memory expansion — a
1080p wavefront OOMs a 16 GB chip on padding alone).  ``Vec3`` instead holds
three separate ``(R,)`` component arrays: every per-ray quantity in the
renderer is either a flat ``(R,)`` scalar array or a ``Vec3`` of them, so
nothing in the hot path carries a tiny trailing axis.

``Vec3`` is a pytree (works in ``lax.scan`` carries / jit boundaries) with
full operator support so BRDF formulas written for scalars (e.g. Schlick)
apply unchanged to colors.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class Vec3:
    """Three planar components (each an identically-shaped jnp array)."""

    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray

    # --- construction -----------------------------------------------------
    @staticmethod
    def full(shape, vx, vy=None, vz=None, dtype=jnp.float32) -> "Vec3":
        if vy is None:
            vy = vx
        if vz is None:
            vz = vx
        return Vec3(
            jnp.full(shape, vx, dtype),
            jnp.full(shape, vy, dtype),
            jnp.full(shape, vz, dtype),
        )

    @staticmethod
    def zeros(shape, dtype=jnp.float32) -> "Vec3":
        z = jnp.zeros(shape, dtype)
        return Vec3(z, z, z)

    @staticmethod
    def ones(shape, dtype=jnp.float32) -> "Vec3":
        o = jnp.ones(shape, dtype)
        return Vec3(o, o, o)

    @staticmethod
    def splat(s) -> "Vec3":
        """Broadcast one scalar array to all three components."""
        s = jnp.asarray(s)
        return Vec3(s, s, s)

    @staticmethod
    def from_array(arr) -> "Vec3":
        """(..., 3) array -> Vec3 of (...,) components (boundary use only)."""
        arr = jnp.asarray(arr)
        return Vec3(arr[..., 0], arr[..., 1], arr[..., 2])

    @staticmethod
    def from_planar(arr) -> "Vec3":
        """(3, ...) planar array -> Vec3 (zero-copy views)."""
        return Vec3(arr[0], arr[1], arr[2])

    def to_array(self) -> jnp.ndarray:
        """Vec3 -> (..., 3) array (boundary use only — padded layout!)."""
        return jnp.stack([self.x, self.y, self.z], axis=-1)

    def to_planar(self) -> jnp.ndarray:
        """Vec3 -> (3, ...) planar array."""
        return jnp.stack([self.x, self.y, self.z], axis=0)

    # --- arithmetic (elementwise; scalars/arrays broadcast per component) --
    def _coerce(self, other):
        if isinstance(other, Vec3):
            return other
        return Vec3(other, other, other)

    def __add__(self, o):
        o = self._coerce(o)
        return Vec3(self.x + o.x, self.y + o.y, self.z + o.z)

    __radd__ = __add__

    def __sub__(self, o):
        o = self._coerce(o)
        return Vec3(self.x - o.x, self.y - o.y, self.z - o.z)

    def __rsub__(self, o):
        o = self._coerce(o)
        return Vec3(o.x - self.x, o.y - self.y, o.z - self.z)

    def __mul__(self, o):
        o = self._coerce(o)
        return Vec3(self.x * o.x, self.y * o.y, self.z * o.z)

    __rmul__ = __mul__

    def __truediv__(self, o):
        o = self._coerce(o)
        return Vec3(self.x / o.x, self.y / o.y, self.z / o.z)

    def __rtruediv__(self, o):
        o = self._coerce(o)
        return Vec3(o.x / self.x, o.y / self.y, o.z / self.z)

    def __neg__(self):
        return Vec3(-self.x, -self.y, -self.z)

    # --- geometry -----------------------------------------------------------
    def dot(self, o: "Vec3"):
        return self.x * o.x + self.y * o.y + self.z * o.z

    def cross(self, o: "Vec3") -> "Vec3":
        return Vec3(
            self.y * o.z - self.z * o.y,
            self.z * o.x - self.x * o.z,
            self.x * o.y - self.y * o.x,
        )

    def length_sq(self):
        return self.dot(self)

    def norm(self, eps=1e-24):
        # The max() keeps the sqrt gradient finite at zero vectors (a bare
        # sqrt(0) has an infinite derivative that turns masked lanes NaN
        # through the 0-cotangent-times-inf trap).
        return jnp.sqrt(jnp.maximum(self.length_sq(), eps))

    def normalized(self, eps=1e-12) -> "Vec3":
        """Safe normalize: ``rsqrt(len_sq + eps)`` (ADDITIVE softening).

        A max()-floor keeps the primal exact but leaves the derivative
        unbounded just above the floor (d rsqrt ~ x^-3/2); near-antiparallel
        half-vector constructions then overflow cotangents to inf and NaN
        the whole gradient.  The additive form bounds the derivative at
        0.5 * eps^-1.5 while perturbing unit-scale vectors by < 1e-12.
        """
        import jax

        inv = jax.lax.rsqrt(self.length_sq() + eps)
        return self * inv

    # --- elementwise helpers -------------------------------------------------
    def abs(self) -> "Vec3":
        return Vec3(jnp.abs(self.x), jnp.abs(self.y), jnp.abs(self.z))

    def exp(self) -> "Vec3":
        return Vec3(jnp.exp(self.x), jnp.exp(self.y), jnp.exp(self.z))

    def clip(self, lo, hi) -> "Vec3":
        return Vec3(
            jnp.clip(self.x, lo, hi),
            jnp.clip(self.y, lo, hi),
            jnp.clip(self.z, lo, hi),
        )

    def maximum(self, o) -> "Vec3":
        o = self._coerce(o)
        return Vec3(
            jnp.maximum(self.x, o.x),
            jnp.maximum(self.y, o.y),
            jnp.maximum(self.z, o.z),
        )

    def minimum(self, o) -> "Vec3":
        o = self._coerce(o)
        return Vec3(
            jnp.minimum(self.x, o.x),
            jnp.minimum(self.y, o.y),
            jnp.minimum(self.z, o.z),
        )

    def max_component(self):
        return jnp.maximum(jnp.maximum(self.x, self.y), self.z)

    def min_component(self):
        return jnp.minimum(jnp.minimum(self.x, self.y), self.z)

    def sum(self):
        return self.x + self.y + self.z

    def isnan(self):
        return jnp.isnan(self.x) | jnp.isnan(self.y) | jnp.isnan(self.z)

    def isinf(self):
        return jnp.isinf(self.x) | jnp.isinf(self.y) | jnp.isinf(self.z)

    def map(self, fn) -> "Vec3":
        return Vec3(fn(self.x), fn(self.y), fn(self.z))

    def astype(self, dtype) -> "Vec3":
        return Vec3(
            self.x.astype(dtype), self.y.astype(dtype), self.z.astype(dtype)
        )

    @property
    def shape(self):
        return jnp.shape(self.x)

    # --- selection -----------------------------------------------------------
    @staticmethod
    def where(mask, a, b) -> "Vec3":
        """Per-lane select; ``mask`` is a plain boolean array, ``a``/``b``
        are Vec3 or broadcastable scalars."""
        if not isinstance(a, Vec3):
            a = Vec3(a, a, a)
        if not isinstance(b, Vec3):
            b = Vec3(b, b, b)
        return Vec3(
            jnp.where(mask, a.x, b.x),
            jnp.where(mask, a.y, b.y),
            jnp.where(mask, a.z, b.z),
        )


def stop_gradient(v: Vec3) -> Vec3:
    import jax

    return Vec3(
        jax.lax.stop_gradient(v.x),
        jax.lax.stop_gradient(v.y),
        jax.lax.stop_gradient(v.z),
    )
