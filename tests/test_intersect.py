"""Primitive intersector tests against closed-form values."""

import jax.numpy as jnp
import numpy as np

from rayito_tpu.ops import intersect as isect

TMIN = 1e-4
TMAX = 1e30


def V(*args):
    return jnp.asarray(np.array(args, np.float32).reshape(-1, 3))


def test_plane_hit_and_one_sided():
    o = V([0, 1, 0], [0, 1, 0], [0, -1, 0])
    d = V([0, -1, 0], [0, 1, 0], [0, -1, 0])
    pos = jnp.broadcast_to(jnp.array([0.0, 0.0, 0.0]), (3, 3))
    nrm = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), (3, 3))
    t, hit = isect.plane_intersect(o, d, TMIN, jnp.full(3, TMAX), pos, nrm)
    assert bool(hit[0]) and abs(float(t[0]) - 1.0) < 1e-6
    assert not bool(hit[1])  # pointing away
    assert not bool(hit[2])  # behind/backface (nDotD >= 0 going down from below? d.n = -(-1)= ... )


def test_sphere_hit_two_roots():
    o = V([0, 0, -5])
    d = V([0, 0, 1])
    t, hit = isect.sphere_intersect(
        o, d, TMIN, jnp.full(1, TMAX), jnp.array([[0.0, 0.0, 0.0]]), jnp.array([1.0])
    )
    assert bool(hit[0]) and abs(float(t[0]) - 4.0) < 1e-5


def test_sphere_inside_picks_far_root():
    o = V([0, 0, 0])
    d = V([0, 0, 1])
    t, hit = isect.sphere_intersect(
        o, d, TMIN, jnp.full(1, TMAX), jnp.array([[0.0, 0.0, 0.0]]), jnp.array([2.0])
    )
    assert bool(hit[0]) and abs(float(t[0]) - 2.0) < 1e-5


def test_sphere_miss():
    o = V([0, 5, -5])
    d = V([0, 0, 1])
    t, hit = isect.sphere_intersect(
        o, d, TMIN, jnp.full(1, TMAX), jnp.array([[0.0, 0.0, 0.0]]), jnp.array([1.0])
    )
    assert not bool(hit[0])


def test_sphere_respects_tcur():
    o = V([0, 0, -5])
    d = V([0, 0, 1])
    t, hit = isect.sphere_intersect(
        o, d, TMIN, jnp.full(1, 2.0), jnp.array([[0.0, 0.0, 0.0]]), jnp.array([1.0])
    )
    assert not bool(hit[0])  # closest root at 4 > tcur=2


def test_rect_hit_and_double_sided():
    corner = jnp.array([[-1.0, 0.0, -1.0]])
    s1 = jnp.array([[2.0, 0.0, 0.0]])
    s2 = jnp.array([[0.0, 0.0, 2.0]])
    # from above (normal = cross(s1,s2) = (0,-2*2? ) cross((2,0,0),(0,0,2)) = (0*2-0*0, 0*0-2*2, 0) = (0,-4,0) -> normal down
    o = V([0, 2, 0])
    d = V([0, -1, 0])
    t, hit, n = isect.rect_intersect(o, d, TMIN, jnp.full(1, TMAX), corner, s1, s2)
    assert bool(hit[0]) and abs(float(t[0]) - 2.0) < 1e-5
    # normal flipped toward the viewer (up)
    np.testing.assert_allclose(np.asarray(n[0]), [0, 1, 0], atol=1e-6)
    # from below
    o2 = V([0, -2, 0])
    d2 = V([0, 1, 0])
    t2, hit2, n2 = isect.rect_intersect(o2, d2, TMIN, jnp.full(1, TMAX), corner, s1, s2)
    assert bool(hit2[0])
    np.testing.assert_allclose(np.asarray(n2[0]), [0, -1, 0], atol=1e-6)


def test_rect_range_check():
    corner = jnp.array([[-1.0, 0.0, -1.0]])
    s1 = jnp.array([[2.0, 0.0, 0.0]])
    s2 = jnp.array([[0.0, 0.0, 2.0]])
    o = V([5, 2, 0])
    d = V([0, -1, 0])
    t, hit, _ = isect.rect_intersect(o, d, TMIN, jnp.full(1, TMAX), corner, s1, s2)
    assert not bool(hit[0])


def test_triangle_hit_barycentrics():
    v0 = jnp.array([[0.0, 0.0, 0.0]])
    v1 = jnp.array([[1.0, 0.0, 0.0]])
    v2 = jnp.array([[0.0, 1.0, 0.0]])
    o = V([0.25, 0.25, 1.0])
    d = V([0, 0, -1])
    t, hit, beta, gamma, gn = isect.triangle_intersect(
        o, d, TMIN, jnp.full(1, TMAX), v0, v1, v2
    )
    assert bool(hit[0]) and abs(float(t[0]) - 1.0) < 1e-5
    # hit point (0.25, 0.25): v0 weight 0.5, v1 (beta) 0.25, v2 (gamma) 0.25
    assert abs(float(beta[0]) - 0.25) < 1e-5
    assert abs(float(gamma[0]) - 0.25) < 1e-5


def test_triangle_miss_outside():
    v0 = jnp.array([[0.0, 0.0, 0.0]])
    v1 = jnp.array([[1.0, 0.0, 0.0]])
    v2 = jnp.array([[0.0, 1.0, 0.0]])
    o = V([0.9, 0.9, 1.0])
    d = V([0, 0, -1])
    t, hit, *_ = isect.triangle_intersect(o, d, TMIN, jnp.full(1, TMAX), v0, v1, v2)
    assert not bool(hit[0])


def test_triangle_parallel_ray():
    v0 = jnp.array([[0.0, 0.0, 0.0]])
    v1 = jnp.array([[1.0, 0.0, 0.0]])
    v2 = jnp.array([[0.0, 1.0, 0.0]])
    o = V([0, 0, 1.0])
    d = V([1, 0, 0])
    t, hit, *_ = isect.triangle_intersect(o, d, TMIN, jnp.full(1, TMAX), v0, v1, v2)
    assert not bool(hit[0])


def test_aabb_slab():
    o = V([0, 0, -5])
    inv_d = 1.0 / V([0, 0, 1])  # infs in x/y handled by IEEE
    hit, t0, t1 = isect.aabb_intersect(
        o,
        inv_d,
        jnp.float32(TMIN),
        jnp.float32(TMAX),
        jnp.array([[-1.0, -1.0, -1.0]]),
        jnp.array([[1.0, 1.0, 1.0]]),
    )
    assert bool(hit[0])
    assert abs(float(t0[0]) - 4.0) < 1e-5 and abs(float(t1[0]) - 6.0) < 1e-5
    # miss
    o2 = V([5, 5, -5])
    hit2, *_ = isect.aabb_intersect(
        o2,
        inv_d,
        jnp.float32(TMIN),
        jnp.float32(TMAX),
        jnp.array([[-1.0, -1.0, -1.0]]),
        jnp.array([[1.0, 1.0, 1.0]]),
    )
    assert not bool(hit2[0])
