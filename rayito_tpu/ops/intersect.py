"""Batched primitive intersectors (component-SoA).

The reference dispatches ``Shape::intersect`` virtually per shape per ray
(Rayito_Stage7_QT/RScene.h). Here every intersector is a pure, branchless
function over SoA batches: V3 rays (three [N]-component arrays) against V3
primitive data, producing [..., ] t/hit arrays that map directly onto the
TPU's VPU with zero lane padding (see ops/vec3.py for why [..., 3] arrays
are forbidden on the hot path).

All functions use a (tmin, tcur) validity interval where ``tcur`` is the
current-closest t (matching the reference's ``t >= intersection.m_t``
reject). Misses are encoded as t = +inf; callers min-reduce.
"""

from __future__ import annotations

import jax.numpy as jnp

from .vec3 import V3, cross, dot, normalize

INF = jnp.float32(jnp.inf)


def plane_intersect(o: V3, d: V3, tmin, tcur, pos: V3, normal: V3):
    """One-sided infinite plane (Rayito_Stage7_QT/RScene.h:301-328).

    Returns (t, hit). The plane only faces rays with nDotD < 0.
    """
    n_dot_d = dot(normal, d)
    t = (dot(pos, normal) - dot(o, normal)) / jnp.where(n_dot_d == 0.0, 1.0, n_dot_d)
    hit = (n_dot_d < 0.0) & (t < tcur) & (t >= tmin)
    return jnp.where(hit, t, INF), hit


def sphere_intersect(o: V3, d: V3, tmin, tcur, center: V3, radius):
    """Stable-quadratic sphere test (RScene.h:397-462). Returns (t, hit);
    picks the nearest valid root exactly like the reference."""
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


def rect_intersect(o: V3, d: V3, tmin, tcur, corner: V3, side1: V3, side2: V3):
    """Double-sided rectangle (parallelogram) — RectangleLight::intersect
    (Rayito_Stage7_QT/RLight.h:58-117).

    Returns (t, hit, normal V3) with the normal flipped toward the viewer.
    """
    normal = normalize(cross(side1, side2))
    n_dot_d = dot(normal, d)
    nonparallel = n_dot_d != 0.0
    t = (dot(corner, normal) - dot(o, normal)) / jnp.where(nonparallel, n_dot_d, 1.0)
    in_range = (t < tcur) & (t >= tmin)

    s1_len = jnp.sqrt(dot(side1, side1))
    s2_len = jnp.sqrt(dot(side2, side2))
    s1n = side1 / jnp.maximum(s1_len, 1e-37)
    s2n = side2 / jnp.maximum(s2_len, 1e-37)
    world_pt = o + d * t
    rel = world_pt - corner
    lx = dot(rel, s1n)
    ly = dot(rel, s2n)
    inside = (lx >= 0.0) & (lx <= s1_len) & (ly >= 0.0) & (ly <= s2_len)

    hit = nonparallel & in_range & inside
    flipped = V3(
        jnp.where(n_dot_d > 0.0, -normal.x, normal.x),
        jnp.where(n_dot_d > 0.0, -normal.y, normal.y),
        jnp.where(n_dot_d > 0.0, -normal.z, normal.z),
    )
    return jnp.where(hit, t, INF), hit, flipped


def triangle_intersect(o: V3, d: V3, tmin, tcur, v0: V3, v1: V3, v2: V3):
    """Möller-Trumbore with the reference's exact formulation
    (Rayito_Stage7_QT/RMesh.h:260-335): det = -dot(d, gnormal), barycentrics
    gamma/beta from scalar triple products.

    Returns (t, hit, beta, gamma, gnormal V3) where gnormal is the
    UNnormalized geometric normal; alpha = 1 - beta - gamma.
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


def aabb_intersect(o: V3, inv_d: V3, t0, t1, bmin: V3, bmax: V3):
    """Slab test (Rayito_Stage7_QT/RAccel.h:47-59): clips (t0, t1) to the box.
    Returns (hit, new_t0, new_t1)."""
    tx0 = (bmin.x - o.x) * inv_d.x
    tx1 = (bmax.x - o.x) * inv_d.x
    ty0 = (bmin.y - o.y) * inv_d.y
    ty1 = (bmax.y - o.y) * inv_d.y
    tz0 = (bmin.z - o.z) * inv_d.z
    tz1 = (bmax.z - o.z) * inv_d.z
    near = jnp.maximum(
        jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
        jnp.minimum(tz0, tz1),
    )
    far = jnp.minimum(
        jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
        jnp.maximum(tz0, tz1),
    )
    nt0 = jnp.maximum(t0, near)
    nt1 = jnp.minimum(t1, far)
    return nt0 <= nt1, nt0, nt1


def bullseye_ring(hit_pos: V3, plane_pos: V3):
    """fmod(dist * 0.25, 1) > 0.5 ring test (RScene.h:324-328)."""
    rel = hit_pos - plane_pos
    dist = jnp.sqrt(dot(rel, rel))
    return jnp.mod(dist * 0.25, 1.0) > 0.5
