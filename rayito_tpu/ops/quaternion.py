"""Batched quaternion operations (Rayito_Stage7_QT/RMath.h:384-616).

Quaternions are [..., 4] arrays laid out (w, x, y, z). The reference's member
``operator*=`` has a known aliasing bug (RMath.h:461-469); we implement the
*correct* Hamilton product (the free operator*, RMath.h:515-522). Scene code
that relied on concatenated rotate() calls can opt into bug emulation via
``multiply_buggy`` if bit-parity with the reference scene setup is ever needed
(SURVEY §2.11 quirk 5 — we document-and-fix by default).
"""

from __future__ import annotations

import jax.numpy as jnp

from .vecmath import cross, dot, normalize as vnormalize


def quat(w, x, y, z):
    return jnp.stack(
        [jnp.asarray(w, jnp.float32), jnp.asarray(x, jnp.float32),
         jnp.asarray(y, jnp.float32), jnp.asarray(z, jnp.float32)],
        axis=-1,
    )


def identity():
    return jnp.array([1.0, 0.0, 0.0, 0.0], jnp.float32)


def from_axis_angle(axis, angle):
    """Quaternion(vector axis, float angle) ctor (RMath.h:395-396)."""
    axis = vnormalize(jnp.asarray(axis, jnp.float32))
    half = jnp.asarray(angle, jnp.float32) * 0.5
    s = jnp.sin(half)
    return jnp.concatenate(
        [jnp.cos(half)[..., None], axis * s[..., None]], axis=-1
    )


def from_euler_zyx(x_rot, y_rot, z_rot):
    """ZYX Euler ctor (RMath.h:399-413): q = qz * qy * qx composed as in the
    reference (half-angle products)."""
    cx, sx = jnp.cos(x_rot * 0.5), jnp.sin(x_rot * 0.5)
    cy, sy = jnp.cos(y_rot * 0.5), jnp.sin(y_rot * 0.5)
    cz, sz = jnp.cos(z_rot * 0.5), jnp.sin(z_rot * 0.5)
    w = cz * cy * cx + sz * sy * sx
    xq = cz * cy * sx - sz * sy * cx
    yq = cz * sy * cx + sz * cy * sx
    zq = sz * cy * cx - cz * sy * sx
    return quat(w, xq, yq, zq)


def conjugate(q):
    """~q (RMath.h:496-499)."""
    return jnp.concatenate([q[..., 0:1], -q[..., 1:4]], axis=-1)


def normalize(q):
    n2 = jnp.sum(q * q, axis=-1, keepdims=True)
    return q / jnp.sqrt(jnp.maximum(n2, 1e-37))


def multiply(q1, q2):
    """Hamilton product, the correct free operator* (RMath.h:515-522)."""
    w1, v1 = q1[..., 0], q1[..., 1:4]
    w2, v2 = q2[..., 0], q2[..., 1:4]
    w = w1 * w2 - dot(v1, v2)
    v = w1[..., None] * v2 + w2[..., None] * v1 + cross(v1, v2)
    return jnp.concatenate([w[..., None], v], axis=-1)


def rotate_vector(q, v):
    """q * v via the optimized form t = 2*qv×v; v' = v + w*t + qv×t
    (RMath.h:536-549)."""
    qv = q[..., 1:4]
    w = q[..., 0:1]
    t = 2.0 * cross(qv, v)
    return v + w * t + cross(qv, t)


def nlerp(q1, q2, t):
    """Reference quaternion lerp = normalized linear blend (RMath.h:576-580)."""
    t = jnp.asarray(t, jnp.float32)[..., None]
    return normalize(q1 * (1.0 - t) + q2 * t)


def slerp(q1, q2, t):
    """Shortest-arc slerp, falling back to (n)lerp when |dot| > 0.95
    (RMath.h:584-609)."""
    d = jnp.sum(q1 * q2, axis=-1)
    q2_adj = jnp.where((d < 0.0)[..., None], -q2, q2)
    d = jnp.abs(d)
    use_lerp = d > 0.95
    d_c = jnp.clip(d, -1.0, 1.0)
    theta = jnp.arccos(d_c)
    sin_theta = jnp.sin(theta)
    safe_sin = jnp.where(sin_theta == 0.0, 1.0, sin_theta)
    t = jnp.asarray(t, jnp.float32)
    w1 = jnp.sin((1.0 - t) * theta) / safe_sin
    w2 = jnp.sin(t * theta) / safe_sin
    slerped = q1 * w1[..., None] + q2_adj * w2[..., None]
    return jnp.where(use_lerp[..., None], nlerp(q1, q2_adj, t), slerped)


def to_axis_angle(q):
    """Inverse of from_axis_angle. Returns (axis [...,3], angle [...])."""
    qn = normalize(q)
    w = jnp.clip(qn[..., 0], -1.0, 1.0)
    angle = 2.0 * jnp.arccos(w)
    s = jnp.sqrt(jnp.maximum(1.0 - w * w, 0.0))
    axis = jnp.where(
        (s < 1e-6)[..., None],
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], jnp.float32), qn[..., 1:4].shape),
        qn[..., 1:4] / jnp.where((s < 1e-6), 1.0, s)[..., None],
    )
    return axis, angle


def multiply_buggy(q1, q2):
    """Bit-parity emulation of the reference's aliasing-bugged member
    operator*= (RMath.h:461-469): m_w is overwritten before m_v is computed,
    so the vector part uses the NEW w1 in place of the old. Provided only for
    oracle-mode comparisons of stage-7 scene setup."""
    w1, v1 = q1[..., 0], q1[..., 1:4]
    w2, v2 = q2[..., 0], q2[..., 1:4]
    new_w = w1 * w2 - dot(v1, v2)
    v = new_w[..., None] * v2 + w2[..., None] * v1 + cross(v1, v2)
    return jnp.concatenate([new_w[..., None], v], axis=-1)
