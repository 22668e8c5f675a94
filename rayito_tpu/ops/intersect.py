"""Batched primitive intersectors.

The reference dispatches ``Shape::intersect`` virtually per shape per ray
(Rayito_Stage7_QT/RScene.h). Here every intersector is a pure, branchless
function over SoA batches: rays broadcast against primitive arrays, producing
dense [rays, prims] (or pre-broadcast) t/hit arrays that map directly onto the
TPU's VPU. Misses are encoded as t = +inf; callers min-reduce.

All functions use a (tmin, tcur) validity interval where ``tcur`` is the
current-closest t (matching the reference's ``t >= intersection.m_t`` reject).
"""

from __future__ import annotations

import jax.numpy as jnp

from .vecmath import cross, dot, normalize

INF = jnp.float32(jnp.inf)


def plane_intersect(o, d, tmin, tcur, pos, normal):
    """One-sided infinite plane (Rayito_Stage7_QT/RScene.h:301-328).

    o, d: [..., 3] ray origin/dir. pos, normal: [..., 3] (broadcastable).
    Returns (t [...], hit [...]). The plane only faces rays with nDotD < 0.
    """
    n_dot_d = dot(normal, d)
    t = (dot(pos, normal) - dot(o, normal)) / jnp.where(n_dot_d == 0.0, 1.0, n_dot_d)
    hit = (n_dot_d < 0.0) & (t < tcur) & (t >= tmin)
    return jnp.where(hit, t, INF), hit


def bullseye_modifier(hit_pos, plane_pos, enabled):
    """Procedural bullseye texture: colorModifier *= 0.2 when
    fmod(dist * 0.25, 1) > 0.5 (RScene.h:324-328)."""
    dist = jnp.sqrt(jnp.sum((hit_pos - plane_pos) ** 2, axis=-1))
    ring = jnp.mod(dist * 0.25, 1.0) > 0.5
    mod = jnp.where(enabled & ring, 0.2, 1.0)
    return mod[..., None] * jnp.ones_like(hit_pos)


def sphere_intersect(o, d, tmin, tcur, center, radius):
    """Stable-quadratic sphere test (RScene.h:397-462, Rayito_Stage3/rayito.h:815-882).

    Returns (t, hit). Picks nearest valid root exactly like the reference:
      miss if t0 >= tcur or t1 < tmin;
      t = t0 if t0 >= tmin else (t1 if t1 < tcur else miss).
    """
    oc = o - center
    a = dot(d, d)
    b = 2.0 * dot(d, oc)
    c = dot(oc, oc) - radius * radius
    disc = b * b - 4.0 * a * c
    has_root = disc >= 0.0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    q = jnp.where(b < 0.0, -0.5 * (b - sq), -0.5 * (b + sq))
    t0 = q / a
    t1 = jnp.where(q != 0.0, c / jnp.where(q == 0.0, 1.0, q), tcur)
    lo = jnp.minimum(t0, t1)
    hi = jnp.maximum(t0, t1)
    valid_window = (lo < tcur) & (hi >= tmin)
    use_lo = lo >= tmin
    use_hi = (~use_lo) & (hi < tcur)
    t = jnp.where(use_lo, lo, hi)
    hit = has_root & valid_window & (use_lo | use_hi)
    return jnp.where(hit, t, INF), hit


def sphere_normal(o, d, t, center):
    """Outward unit normal at the hit point (localPos normalized,
    RScene.h:456-459)."""
    p = o + d * t[..., None]
    return normalize(p - center)


def rect_intersect(o, d, tmin, tcur, corner, side1, side2):
    """Double-sided rectangle (parallelogram) — RectangleLight::intersect
    (Rayito_Stage7_QT/RLight.h:58-117).

    Returns (t, hit, normal [...,3]) with the normal flipped toward the viewer
    (double-sided light).
    """
    normal = normalize(cross(side1, side2))
    n_dot_d = dot(normal, d)
    nonparallel = n_dot_d != 0.0
    t = (dot(corner, normal) - dot(o, normal)) / jnp.where(nonparallel, n_dot_d, 1.0)
    in_range = (t < tcur) & (t >= tmin)

    s1_len = jnp.sqrt(dot(side1, side1))
    s2_len = jnp.sqrt(dot(side2, side2))
    s1n = side1 / jnp.maximum(s1_len, 1e-37)[..., None]
    s2n = side2 / jnp.maximum(s2_len, 1e-37)[..., None]
    world_pt = o + d * t[..., None]
    rel = world_pt - corner
    lx = dot(rel, s1n)
    ly = dot(rel, s2n)
    inside = (lx >= 0.0) & (lx <= s1_len) & (ly >= 0.0) & (ly <= s2_len)

    hit = nonparallel & in_range & inside
    flipped = jnp.where((n_dot_d > 0.0)[..., None], -normal, normal)
    return jnp.where(hit, t, INF), hit, flipped


def triangle_intersect(o, d, tmin, tcur, v0, v1, v2):
    """Möller-Trumbore with the reference's exact formulation
    (Rayito_Stage7_QT/RMesh.h:260-335): det = -dot(d, gnormal), barycentrics
    gamma/beta from scalar triple products.

    Returns (t, hit, beta, gamma, gnormal) where gnormal is the UNnormalized
    geometric normal cross(v1-v0, v2-v0); alpha = 1 - beta - gamma.
    """
    e1 = v1 - v0
    e2 = v2 - v0
    gnormal = cross(e1, e2)
    det = -dot(d, gnormal)
    nonzero = det != 0.0
    inv_det = 1.0 / jnp.where(nonzero, det, 1.0)

    to_v0 = v0 - o
    ray_vert_cross = cross(d, to_v0)
    to_v1 = v1 - o
    gamma = -dot(to_v1, ray_vert_cross) * inv_det
    to_v2 = v2 - o
    beta = dot(to_v2, ray_vert_cross) * inv_det
    t = -dot(to_v0, gnormal) * inv_det

    hit = (
        nonzero
        & (gamma >= 0.0)
        & (gamma <= 1.0)
        & (beta >= 0.0)
        & (beta + gamma <= 1.0)
        & (t >= tmin)
        & (t < tcur)
    )
    return jnp.where(hit, t, INF), hit, beta, gamma, gnormal


def aabb_intersect(o, inv_d, t0, t1, bbox_min, bbox_max):
    """Slab test (Rayito_Stage7_QT/RAccel.h:47-59): clips (t0, t1) to the box.
    Returns (hit, new_t0, new_t1)."""
    tn = (bbox_min - o) * inv_d
    tf = (bbox_max - o) * inv_d
    near = jnp.minimum(tn, tf)
    far = jnp.maximum(tn, tf)
    nt0 = jnp.maximum(t0, jnp.max(near, axis=-1))
    nt1 = jnp.minimum(t1, jnp.min(far, axis=-1))
    return nt0 <= nt1, nt0, nt1
