"""Sample-space warps, vectorized over [N] sample batches (SoA V3 outputs).

Ports the semantics of the reference warp functions
(Rayito_Stage7_QT/RSampling.h:400-533) to branchless array code. Each function
takes float32 arrays u1, u2 in [0,1) and returns arrays.
"""

from __future__ import annotations

import jax.numpy as jnp

from .vec3 import V3
from .vec3 import PI


def concentric_sample_disk(u1, u2):
    """PBRT-style concentric square→disk map (RSampling.h:400-451).

    The reference's four-region if/else cascade becomes nested wheres; the
    (0,0) degeneracy returns (0,0) exactly.
    """
    sx = 2.0 * u1 - 1.0
    sy = 2.0 * u2 - 1.0

    # Region selection identical to the reference branch structure.
    abs_r1 = sx  # region 1: r=sx, theta = sy/sx (or 8 + sy/sx when sy<0)
    cond_a = sx >= -sy
    cond_b = sx > sy
    cond_c = sx <= sy

    safe = lambda num, den: num / jnp.where(den == 0.0, 1.0, den)

    r1 = sx
    theta1 = jnp.where(sy > 0.0, safe(sy, sx), 8.0 + safe(sy, sx))
    r2 = sy
    theta2 = 2.0 - safe(sx, sy)
    r3 = -sx
    theta3 = 4.0 - safe(sy, -sx)
    r4 = -sy
    theta4 = 6.0 + safe(sx, -sy)

    r = jnp.where(
        cond_a,
        jnp.where(cond_b, r1, r2),
        jnp.where(cond_c, r3, r4),
    )
    theta = jnp.where(
        cond_a,
        jnp.where(cond_b, theta1, theta2),
        jnp.where(cond_c, theta3, theta4),
    )
    theta = theta * (PI / 4.0)
    dx = r * jnp.cos(theta)
    dy = r * jnp.sin(theta)
    degenerate = jnp.logical_and(sx == 0.0, sy == 0.0)
    dx = jnp.where(degenerate, 0.0, dx)
    dy = jnp.where(degenerate, 0.0, dy)
    return dx, dy


def uniform_to_sphere(u1, u2):
    """Uniform point on the unit sphere (RSampling.h:456-465). Returns [...,3]."""
    z = 1.0 - 2.0 * u1
    radius = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * PI * u2
    return V3(radius * jnp.cos(phi), radius * jnp.sin(phi), z)


def uniform_to_uniform_disk(u1, u2):
    """sqrt-r disk warp (RSampling.h:470-486)."""
    radius = jnp.sqrt(u1)
    theta = 2.0 * PI * u2
    return radius * jnp.cos(theta), radius * jnp.sin(theta)


def uniform_to_hemisphere(u1, u2):
    """Uniform hemisphere, +Z up (RSampling.h:489-496)."""
    radius = jnp.sqrt(jnp.maximum(0.0, 1.0 - u1 * u1))
    phi = 2.0 * PI * u2
    return V3(radius * jnp.cos(phi), radius * jnp.sin(phi), u1)


def uniform_to_cosine_hemisphere(u1, u2):
    """Cosine-weighted hemisphere via concentric disk projection
    (RSampling.h:500-509)."""
    dx, dy = concentric_sample_disk(u1, u2)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - dx * dx - dy * dy))
    return V3(dx, dy, z)


def uniform_to_cone(u1, u2, cos_theta_max):
    """Uniform direction in a cone about +Z (RSampling.h:512-519)."""
    cos_theta = u1 * (cos_theta_max - 1.0) + 1.0
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    phi = 2.0 * PI * u2
    return V3(jnp.cos(phi) * sin_theta, jnp.sin(phi) * sin_theta, cos_theta)


def uniform_cone_pdf(cos_theta_max):
    """Solid-angle pdf of uniform_to_cone (RSampling.h:521-524)."""
    return jnp.where(
        cos_theta_max >= 1.0,
        0.0,
        1.0 / (2.0 * PI * jnp.maximum(1.0 - cos_theta_max, 1e-37)),
    )


def uniform_to_barycentric_triangle(u1, u2):
    """Uniform barycentrics: btu = 1-sqrt(u1), btv = u2*sqrt(u1)
    (RSampling.h:527-533)."""
    s = jnp.sqrt(u1)
    return 1.0 - s, u2 * s
