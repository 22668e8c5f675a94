"""Component-SoA 3-vectors: the TPU-native vector representation.

TPU arrays are tiled (8, 128): an f32 array whose MINOR dimension is 3 is
physically padded to 128 lanes — a 42x memory blowup and 42x lane waste on
every elementwise op (measured: a [N,64,3]-shaped slab test runs ~600x
slower than its [N,64]-per-component equivalent, and [N,16,48,3] gather
outputs OOM'd 16GB HBM at one *megaray*). So the hot path never builds
[..., 3] arrays: a vector wavefront is a :class:`V3` — three independent
[N]-shaped component arrays, each perfectly lane-tiled.

V3 is a registered pytree and supports arithmetic operators, so kernels read
like vector math while every underlying op is a clean [N]-shaped VPU op.
Colors use the same structure (they are float triples too).

Boundary helpers ``from_aos``/``to_aos`` convert at API edges (scene tables,
images) where the 42x-padded form is only touched once.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

# Self-intersection epsilon & ray max. Reference: Rayito_Stage7_QT/RRay.h:23-28
# (stages 1-3 used 1e-5, Rayito_Stage1/rayito.h:303; stage 4+ uses 1e-4 — both
# exposed, defaulting to the final value; the stage-1/2/3 golden scenes pass
# the early epsilon explicitly).
RAY_TMIN = 1.0e-4
RAY_TMIN_EARLY = 1.0e-5
RAY_TMAX = 1.0e30

PI = 3.14159265358979


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class V3:
    x: Any
    y: Any
    z: Any

    # -- arithmetic -----------------------------------------------------
    def __add__(self, o):
        if isinstance(o, V3):
            return V3(self.x + o.x, self.y + o.y, self.z + o.z)
        return V3(self.x + o, self.y + o, self.z + o)

    __radd__ = __add__

    def __sub__(self, o):
        if isinstance(o, V3):
            return V3(self.x - o.x, self.y - o.y, self.z - o.z)
        return V3(self.x - o, self.y - o, self.z - o)

    def __rsub__(self, o):
        if isinstance(o, V3):
            return V3(o.x - self.x, o.y - self.y, o.z - self.z)
        return V3(o - self.x, o - self.y, o - self.z)

    def __mul__(self, o):
        if isinstance(o, V3):
            return V3(self.x * o.x, self.y * o.y, self.z * o.z)
        return V3(self.x * o, self.y * o, self.z * o)

    __rmul__ = __mul__

    def __truediv__(self, o):
        if isinstance(o, V3):
            return V3(self.x / o.x, self.y / o.y, self.z / o.z)
        return V3(self.x / o, self.y / o, self.z / o)

    def __rtruediv__(self, o):
        if isinstance(o, V3):
            return V3(o.x / self.x, o.y / self.y, o.z / self.z)
        return V3(o / self.x, o / self.y, o / self.z)

    def __neg__(self):
        return V3(-self.x, -self.y, -self.z)

    # -- indexing / shaping ---------------------------------------------
    def __getitem__(self, idx):
        return V3(self.x[idx], self.y[idx], self.z[idx])

    @property
    def shape(self):
        return jnp.shape(self.x)

    def reshape(self, *s):
        return V3(self.x.reshape(*s), self.y.reshape(*s), self.z.reshape(*s))

    def broadcast_to(self, shape):
        return V3(
            jnp.broadcast_to(self.x, shape),
            jnp.broadcast_to(self.y, shape),
            jnp.broadcast_to(self.z, shape),
        )

    def astype(self, dt):
        return V3(self.x.astype(dt), self.y.astype(dt), self.z.astype(dt))


def v3(x, y, z) -> V3:
    return V3(jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32),
              jnp.asarray(z, jnp.float32))


def splat(c) -> V3:
    """Constant vector from a length-3 python/numpy sequence."""
    return v3(float(c[0]), float(c[1]), float(c[2]))


def from_aos(a) -> V3:
    """[..., 3] array -> V3 of [...] components (one strided read each)."""
    return V3(a[..., 0], a[..., 1], a[..., 2])


def to_aos(v: V3):
    return jnp.stack([v.x, v.y, v.z], axis=-1)


def dot(a: V3, b: V3):
    return a.x * b.x + a.y * b.y + a.z * b.z


def cross(a: V3, b: V3) -> V3:
    return V3(
        a.y * b.z - a.z * b.y,
        a.z * b.x - a.x * b.z,
        a.x * b.y - a.y * b.x,
    )


def length2(v: V3):
    return dot(v, v)


def length(v: V3):
    return jnp.sqrt(length2(v))


def normalize(v: V3) -> V3:
    """Guards len > 0 like the reference (RMath.h:192)."""
    len2 = length2(v)
    inv = jnp.where(len2 > 0.0, 1.0 / jnp.sqrt(jnp.maximum(len2, 1e-37)), 1.0)
    return v * inv


def where(mask, a: V3, b: V3) -> V3:
    return V3(
        jnp.where(mask, a.x, b.x),
        jnp.where(mask, a.y, b.y),
        jnp.where(mask, a.z, b.z),
    )


def reflect(v: V3, n: V3) -> V3:
    return n * (2.0 * dot(v, n)) - v


def lerp(a: V3, b: V3, t) -> V3:
    return a + (b - a) * t


def min_components(a: V3, b: V3) -> V3:
    return V3(jnp.minimum(a.x, b.x), jnp.minimum(a.y, b.y), jnp.minimum(a.z, b.z))


def max_components(a: V3, b: V3) -> V3:
    return V3(jnp.maximum(a.x, b.x), jnp.maximum(a.y, b.y), jnp.maximum(a.z, b.z))


def make_coordinate_space(normal: V3):
    """Orthonormal frame with Z = normal — the reference's exact up-vector
    rule (RMath.h:946-955): v2 = (0,1,0) unless the normalized direction is
    exactly +/-Y (z.x == 0 AND z.z == 0), in which case (1,0,0). Then
    X = normalize(v2 x Z), Y = Z x X."""
    z = normalize(normal)
    not_y_axis = (z.x != 0.0) | (z.z != 0.0)
    zero = jnp.zeros_like(z.x)
    up = V3(
        jnp.where(not_y_axis, 0.0, 1.0),
        jnp.where(not_y_axis, 1.0, 0.0),
        zero,
    )
    x = normalize(cross(up, z))
    y = cross(z, x)
    return x, y, z


def make_coordinate_space_tangent(normal: V3, tangent: V3):
    """Two-direction frame (RMath.h:960-966): Z = normalized normal,
    Y = normalize(tangent x Z), X = Z x Y — X aligned as much as possible
    with the tangent."""
    z = normalize(normal)
    y = normalize(cross(tangent, z))
    x = cross(z, y)
    return x, y, z


def from_local_frame(v: V3, x: V3, y: V3, z: V3) -> V3:
    return x * v.x + y * v.y + z * v.z


def to_local_frame(v: V3, x: V3, y: V3, z: V3) -> V3:
    return V3(dot(v, x), dot(v, y), dot(v, z))
