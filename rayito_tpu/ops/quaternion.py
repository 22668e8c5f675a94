"""Batched quaternion operations, component-SoA (Rayito_Stage7_QT/RMath.h:384-616).

A quaternion wavefront is a :class:`Quat` of four [N]-component arrays
(w + V3 vector part) — same no-[...,3]-minor rule as ops/vec3.py. The
reference's member ``operator*=`` has a known aliasing bug (RMath.h:461-469);
we implement the correct Hamilton product (the free operator*,
RMath.h:515-522) with ``multiply_buggy`` available for oracle comparisons.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from .vec3 import V3, cross, dot, normalize as vnormalize, where as vwhere


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Quat:
    w: Any
    v: V3


def quat(w, x, y, z) -> Quat:
    return Quat(
        jnp.asarray(w, jnp.float32),
        V3(
            jnp.asarray(x, jnp.float32),
            jnp.asarray(y, jnp.float32),
            jnp.asarray(z, jnp.float32),
        ),
    )


def identity() -> Quat:
    return quat(1.0, 0.0, 0.0, 0.0)


def from_axis_angle(axis: V3, angle) -> Quat:
    """Quaternion(vector axis, float angle) ctor (RMath.h:395-396)."""
    axis = vnormalize(axis)
    half = jnp.asarray(angle, jnp.float32) * 0.5
    return Quat(jnp.cos(half), axis * jnp.sin(half))


def from_euler_zyx(x_rot, y_rot, z_rot) -> Quat:
    """ZYX Euler ctor (RMath.h:399-413)."""
    cx, sx = jnp.cos(x_rot * 0.5), jnp.sin(x_rot * 0.5)
    cy, sy = jnp.cos(y_rot * 0.5), jnp.sin(y_rot * 0.5)
    cz, sz = jnp.cos(z_rot * 0.5), jnp.sin(z_rot * 0.5)
    return Quat(
        cz * cy * cx + sz * sy * sx,
        V3(
            cz * cy * sx - sz * sy * cx,
            cz * sy * cx + sz * cy * sx,
            sz * cy * cx - cz * sy * sx,
        ),
    )


def conjugate(q: Quat) -> Quat:
    """~q (RMath.h:496-499)."""
    return Quat(q.w, -q.v)


def norm2(q: Quat):
    return q.w * q.w + dot(q.v, q.v)


def normalize(q: Quat) -> Quat:
    inv = 1.0 / jnp.sqrt(jnp.maximum(norm2(q), 1e-37))
    return Quat(q.w * inv, q.v * inv)


def multiply(q1: Quat, q2: Quat) -> Quat:
    """Hamilton product, the correct free operator* (RMath.h:515-522)."""
    return Quat(
        q1.w * q2.w - dot(q1.v, q2.v),
        q2.v * q1.w + q1.v * q2.w + cross(q1.v, q2.v),
    )


def rotate_vector(q: Quat, v: V3) -> V3:
    """q * v via the optimized form t = 2*qv×v; v' = v + w*t + qv×t
    (RMath.h:536-549)."""
    t = cross(q.v, v) * 2.0
    return v + t * q.w + cross(q.v, t)


def nlerp(q1: Quat, q2: Quat, t) -> Quat:
    """Reference quaternion lerp = normalized linear blend (RMath.h:576-580)."""
    t = jnp.asarray(t, jnp.float32)
    return normalize(Quat(q1.w * (1.0 - t) + q2.w * t, q1.v * (1.0 - t) + q2.v * t))


def slerp(q1: Quat, q2: Quat, t) -> Quat:
    """Shortest-arc slerp, falling back to nlerp when |dot| > 0.95
    (RMath.h:584-609)."""
    d = q1.w * q2.w + dot(q1.v, q2.v)
    neg = d < 0.0
    q2a = Quat(jnp.where(neg, -q2.w, q2.w), vwhere(neg, -q2.v, q2.v))
    d = jnp.abs(d)
    use_lerp = d > 0.95
    theta = jnp.arccos(jnp.clip(d, -1.0, 1.0))
    sin_theta = jnp.sin(theta)
    safe_sin = jnp.where(sin_theta == 0.0, 1.0, sin_theta)
    t = jnp.asarray(t, jnp.float32)
    w1 = jnp.sin((1.0 - t) * theta) / safe_sin
    w2 = jnp.sin(t * theta) / safe_sin
    slerped = Quat(q1.w * w1 + q2a.w * w2, q1.v * w1 + q2a.v * w2)
    nl = nlerp(q1, q2a, t)
    return Quat(
        jnp.where(use_lerp, nl.w, slerped.w), vwhere(use_lerp, nl.v, slerped.v)
    )


def to_axis_angle(q: Quat):
    """Inverse of from_axis_angle. Returns (axis V3, angle)."""
    qn = normalize(q)
    w = jnp.clip(qn.w, -1.0, 1.0)
    angle = 2.0 * jnp.arccos(w)
    s = jnp.sqrt(jnp.maximum(1.0 - w * w, 0.0))
    small = s < 1e-6
    inv = 1.0 / jnp.where(small, 1.0, s)
    axis = vwhere(
        small,
        V3(jnp.ones_like(w), jnp.zeros_like(w), jnp.zeros_like(w)),
        qn.v * inv,
    )
    return axis, angle


def multiply_buggy(q1: Quat, q2: Quat) -> Quat:
    """Bit-parity emulation of the reference's aliasing-bugged member
    operator*= (RMath.h:461-469): m_w is overwritten before m_v is computed,
    so the vector part uses the NEW w in place of the old. For oracle-mode
    comparisons of stage-7 scene setup only."""
    new_w = q1.w * q2.w - dot(q1.v, q2.v)
    return Quat(new_w, q2.v * new_w + q1.v * q2.w + cross(q1.v, q2.v))
