"""Primitive intersector tests against closed-form values (SoA API)."""

import jax.numpy as jnp
import numpy as np

from rayito_tpu.ops import intersect as isect
from rayito_tpu.ops.vec3 import V3, from_aos, to_aos

TMIN = 1e-4
TMAX = 1e30


def V(*rows):
    return from_aos(jnp.asarray(np.array(rows, np.float32).reshape(-1, 3)))


def C(x, y, z, n=1):
    return V3(jnp.full(n, x, jnp.float32), jnp.full(n, y, jnp.float32),
              jnp.full(n, z, jnp.float32))


def test_plane_hit_and_one_sided():
    o = V([0, 1, 0], [0, 1, 0], [0, -1, 0])
    d = V([0, -1, 0], [0, 1, 0], [0, -1, 0])
    pos = C(0, 0, 0, 3)
    nrm = C(0, 1, 0, 3)
    t, hit = isect.plane_intersect(o, d, TMIN, jnp.full(3, TMAX), pos, nrm)
    assert bool(hit[0]) and abs(float(t[0]) - 1.0) < 1e-6
    assert not bool(hit[1])  # pointing away
    assert not bool(hit[2])  # below, one-sided


def test_sphere_hit_two_roots():
    t, hit = isect.sphere_intersect(
        V([0, 0, -5]), V([0, 0, 1]), TMIN, jnp.full(1, TMAX), C(0, 0, 0), 1.0
    )
    assert bool(hit[0]) and abs(float(t[0]) - 4.0) < 1e-5


def test_sphere_inside_picks_far_root():
    t, hit = isect.sphere_intersect(
        V([0, 0, 0]), V([0, 0, 1]), TMIN, jnp.full(1, TMAX), C(0, 0, 0), 2.0
    )
    assert bool(hit[0]) and abs(float(t[0]) - 2.0) < 1e-5


def test_sphere_miss():
    t, hit = isect.sphere_intersect(
        V([0, 5, -5]), V([0, 0, 1]), TMIN, jnp.full(1, TMAX), C(0, 0, 0), 1.0
    )
    assert not bool(hit[0])


def test_sphere_respects_tcur():
    t, hit = isect.sphere_intersect(
        V([0, 0, -5]), V([0, 0, 1]), TMIN, jnp.full(1, 2.0), C(0, 0, 0), 1.0
    )
    assert not bool(hit[0])  # closest root at 4 > tcur=2


def test_rect_hit_and_double_sided():
    corner = C(-1, 0, -1)
    s1 = C(2, 0, 0)
    s2 = C(0, 0, 2)
    t, hit, n = isect.rect_intersect(
        V([0, 2, 0]), V([0, -1, 0]), TMIN, jnp.full(1, TMAX), corner, s1, s2
    )
    assert bool(hit[0]) and abs(float(t[0]) - 2.0) < 1e-5
    np.testing.assert_allclose(np.asarray(to_aos(n))[0], [0, 1, 0], atol=1e-6)
    t2, hit2, n2 = isect.rect_intersect(
        V([0, -2, 0]), V([0, 1, 0]), TMIN, jnp.full(1, TMAX), corner, s1, s2
    )
    assert bool(hit2[0])
    np.testing.assert_allclose(np.asarray(to_aos(n2))[0], [0, -1, 0], atol=1e-6)


def test_rect_range_check():
    t, hit, _ = isect.rect_intersect(
        V([5, 2, 0]), V([0, -1, 0]), TMIN, jnp.full(1, TMAX),
        C(-1, 0, -1), C(2, 0, 0), C(0, 0, 2),
    )
    assert not bool(hit[0])


def test_triangle_hit_barycentrics():
    t, hit, beta, gamma, gn = isect.triangle_intersect(
        V([0.25, 0.25, 1.0]), V([0, 0, -1]), TMIN, jnp.full(1, TMAX),
        C(0, 0, 0), C(1, 0, 0), C(0, 1, 0),
    )
    assert bool(hit[0]) and abs(float(t[0]) - 1.0) < 1e-5
    assert abs(float(beta[0]) - 0.25) < 1e-5
    assert abs(float(gamma[0]) - 0.25) < 1e-5


def test_triangle_miss_outside():
    t, hit, *_ = isect.triangle_intersect(
        V([0.9, 0.9, 1.0]), V([0, 0, -1]), TMIN, jnp.full(1, TMAX),
        C(0, 0, 0), C(1, 0, 0), C(0, 1, 0),
    )
    assert not bool(hit[0])


def test_triangle_parallel_ray():
    t, hit, *_ = isect.triangle_intersect(
        V([0, 0, 1.0]), V([1, 0, 0]), TMIN, jnp.full(1, TMAX),
        C(0, 0, 0), C(1, 0, 0), C(0, 1, 0),
    )
    assert not bool(hit[0])


def test_aabb_slab():
    o = V([0, 0, -5])
    inv_d = 1.0 / V([0, 0, 1])  # infs in x/y handled by IEEE
    hit, t0, t1 = isect.aabb_intersect(
        o, inv_d, jnp.float32(TMIN), jnp.float32(TMAX), C(-1, -1, -1), C(1, 1, 1)
    )
    assert bool(hit[0])
    assert abs(float(t0[0]) - 4.0) < 1e-5 and abs(float(t1[0]) - 6.0) < 1e-5
    hit2, *_ = isect.aabb_intersect(
        V([5, 5, -5]), inv_d, jnp.float32(TMIN), jnp.float32(TMAX),
        C(-1, -1, -1), C(1, 1, 1),
    )
    assert not bool(hit2[0])
