"""Batched 3-vector / color math for SoA ray wavefronts.

TPU-native replacement for the reference's scalar ``Color`` / ``Vector`` classes
(reference: Rayito_Stage7_QT/RMath.h:36-360). Everything here operates on
arrays whose last axis is 3 (``[..., 3]``), so a wavefront of N rays is a
single ``[N, 3]`` array and all ops map onto the VPU with no per-element
dispatch.

Conventions:
  * float32 throughout (the reference is float everywhere).
  * ``normalize`` guards len > 0 like the reference (RMath.h:192).
"""

from __future__ import annotations

import jax.numpy as jnp

# Self-intersection epsilon & ray max. Reference: Rayito_Stage7_QT/RRay.h:23-28
# (stages 1-3 used 1e-5; stage 4+ uses 1e-4 — we expose both, defaulting to the
# final value; the stage-1/2/3 golden scenes pass the early epsilon explicitly).
RAY_TMIN = 1.0e-4
RAY_TMIN_EARLY = 1.0e-5  # stages 1-3 (Rayito_Stage1/rayito.h:303)
RAY_TMAX = 1.0e30

PI = 3.14159265358979


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched dot product over the trailing axis-of-3. Returns [...]."""
    return jnp.sum(a * b, axis=-1)


def dot_keep(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Dot product keeping the trailing axis for broadcasting ([..., 1])."""
    return jnp.sum(a * b, axis=-1, keepdims=True)


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.cross(a, b)


def length2(v: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(v * v, axis=-1)


def length(v: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(length2(v))


def normalize(v: jnp.ndarray) -> jnp.ndarray:
    """Normalize over trailing axis; zero vectors pass through unchanged
    (mirrors the len>0 guard in RMath.h:192)."""
    len2 = jnp.sum(v * v, axis=-1, keepdims=True)
    inv = jnp.where(len2 > 0.0, 1.0 / jnp.sqrt(jnp.maximum(len2, 1e-37)), 1.0)
    return v * inv


def lerp(a: jnp.ndarray, b: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    return a + (b - a) * t


def reflect(v: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Mirror v about n (both pointing away from surface)."""
    return 2.0 * dot_keep(v, n) * n - v


def make_coordinate_space(normal: jnp.ndarray):
    """Build an orthonormal frame with Z = normal.

    The reference's exact up-vector rule (Rayito_Stage7_QT/RMath.h:946-955):
    v2 = (0,1,0) unless the normalized direction is exactly +/-Y
    (z.x == 0 AND z.z == 0), in which case (1,0,0).
    Returns (x_axis, y_axis, z_axis), each [..., 3].
    """
    z = normalize(normal)
    zx, zy, zz = z[..., 0], z[..., 1], z[..., 2]
    not_y_axis = (zx != 0.0) | (zz != 0.0)
    up = jnp.stack(
        [
            jnp.where(not_y_axis, jnp.zeros_like(zx), jnp.ones_like(zx)),
            jnp.where(not_y_axis, jnp.ones_like(zy), jnp.zeros_like(zy)),
            jnp.zeros_like(zz),
        ],
        axis=-1,
    )
    x = normalize(cross(up, z))
    y = cross(z, x)
    return x, y, z


def to_local_frame(v, x, y, z):
    """Express world-space v in the (x, y, z) orthonormal frame.
    Mirrors transformToLocalCoordinateSpace (RMath.h:969-976)."""
    return jnp.stack([dot(v, x), dot(v, y), dot(v, z)], axis=-1)


def from_local_frame(v, x, y, z):
    """Express frame-space v back in world space (RMath.h:979-986)."""
    return (
        x * v[..., 0:1] + y * v[..., 1:2] + z * v[..., 2:3]
    )


def vec(x, y, z, dtype=jnp.float32):
    return jnp.array([x, y, z], dtype=dtype)


def clamp_color(c: jnp.ndarray, lo: float = 0.0, hi: float = 1.0) -> jnp.ndarray:
    """Color::clamp (Rayito_Stage1/rayito.h:47-52)."""
    return jnp.clip(c, lo, hi)
