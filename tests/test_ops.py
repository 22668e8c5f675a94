"""Math-core & warp tests against closed forms (SURVEY §4 test plan)."""

import jax.numpy as jnp
import numpy as np

from rayito_tpu.ops import mis, quaternion as quat, rng as rngo, warps
from rayito_tpu.ops import vec3 as vm
from rayito_tpu.ops.vec3 import V3, to_aos, from_aos


def _rand(shape, seed=0):
    return np.random.default_rng(seed).uniform(size=shape).astype(np.float32)


# ---------------------------------------------------------------------------
# vec3 math core
# ---------------------------------------------------------------------------


def test_normalize_guards_zero():
    v = from_aos(jnp.array([[0.0, 0.0, 0.0], [3.0, 0.0, 4.0]]))
    out = np.asarray(to_aos(vm.normalize(v)))
    np.testing.assert_allclose(out[0], [0, 0, 0])
    np.testing.assert_allclose(out[1], [0.6, 0, 0.8], rtol=1e-6)


def test_coordinate_space_orthonormal():
    n = vm.normalize(from_aos(jnp.asarray(_rand((128, 3)) * 2 - 1)))
    x, y, z = vm.make_coordinate_space(n)
    np.testing.assert_allclose(np.asarray(vm.dot(x, y)), 0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(vm.dot(y, z)), 0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(vm.dot(z, x)), 0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(vm.length(x)), 1, atol=1e-5)
    np.testing.assert_allclose(np.asarray(to_aos(z)), np.asarray(to_aos(n)),
                               atol=1e-5)


def _frame_f64(normal, tangent=None):
    """f64 port of RMath.h:946-966 makeCoordinateSpace (both overloads) —
    the parity oracle for the f32 implementations."""
    z = np.asarray(normal, np.float64)
    z = z / np.linalg.norm(z, axis=-1, keepdims=True)
    if tangent is None:
        not_y = (z[..., 0] != 0.0) | (z[..., 2] != 0.0)
        up = np.stack(
            [np.where(not_y, 0.0, 1.0), np.where(not_y, 1.0, 0.0),
             np.zeros_like(z[..., 2])], axis=-1,
        )
        x = np.cross(up, z)
        x = x / np.linalg.norm(x, axis=-1, keepdims=True)
        y = np.cross(z, x)
    else:
        tg = np.asarray(tangent, np.float64)
        y = np.cross(tg, z)
        y = y / np.linalg.norm(y, axis=-1, keepdims=True)
        x = np.cross(z, y)
    return x, y, z


def test_coordinate_space_matches_reference_rule():
    """The SoA (vec3) frame must reproduce the
    reference's exact up-vector choice (RMath.h:946-955), including normals
    near (but not at) +/-Y — the old near-axis threshold picked a different
    branch there — and exactly at +/-Y."""
    from rayito_tpu.ops import vec3 as v3m

    rs = np.random.default_rng(7)
    n = rs.normal(size=(256, 3)).astype(np.float32)
    # near-axis rows the old |z.z|>0.999 rule misclassified, + exact axes
    n = np.concatenate([
        n,
        np.asarray([[1e-4, 1.0, 0.0], [0.0, 1.0, 1e-4], [0.0, 1.0, 0.0],
                    [0.0, -1.0, 0.0], [0.0, 0.0, 1.0], [1.0, 0.0, 0.0]],
                   np.float32),
    ])
    xr, yr, zr = _frame_f64(n)
    nv = from_aos(jnp.asarray(n))
    xs, ys, zs = v3m.make_coordinate_space(nv)
    np.testing.assert_allclose(np.asarray(to_aos(xs)), xr, atol=2e-5)
    np.testing.assert_allclose(np.asarray(to_aos(ys)), yr, atol=2e-5)
    np.testing.assert_allclose(np.asarray(to_aos(zs)), zr, atol=2e-5)


def test_coordinate_space_tangent_overload():
    """2-arg frame (RMath.h:960-966): Z = normal, Y = norm(tangent x Z),
    X = Z x Y, pinned against the f64 port."""
    from rayito_tpu.ops import vec3 as v3m

    rs = np.random.default_rng(9)
    n = rs.normal(size=(128, 3)).astype(np.float32)
    tg = rs.normal(size=(128, 3)).astype(np.float32)
    xr, yr, zr = _frame_f64(n, tg)
    xs, ys, zs = v3m.make_coordinate_space_tangent(
        from_aos(jnp.asarray(n)), from_aos(jnp.asarray(tg))
    )
    np.testing.assert_allclose(np.asarray(to_aos(xs)), xr, atol=2e-5)
    np.testing.assert_allclose(np.asarray(to_aos(ys)), yr, atol=2e-5)
    np.testing.assert_allclose(np.asarray(to_aos(zs)), zr, atol=2e-5)
    # X aligns with the tangent as much as possible: dot(x, tangent) >= 0
    # and x lies in the (tangent, z) ... plane projection check
    tgu = tg / np.linalg.norm(tg, axis=-1, keepdims=True)
    assert (np.einsum("ij,ij->i", np.asarray(to_aos(xs)), tgu) > -1e-6).all()


def test_frame_round_trip():
    n = vm.normalize(from_aos(jnp.asarray(_rand((64, 3), 1) * 2 - 1)))
    v = from_aos(jnp.asarray(_rand((64, 3), 2) * 2 - 1))
    x, y, z = vm.make_coordinate_space(n)
    local = vm.to_local_frame(v, x, y, z)
    back = vm.from_local_frame(local, x, y, z)
    np.testing.assert_allclose(
        np.asarray(to_aos(back)), np.asarray(to_aos(v)), atol=1e-5
    )


def test_reflect():
    v = from_aos(jnp.array([[1.0, 1.0, 0.0]]))
    n = from_aos(jnp.array([[0.0, 1.0, 0.0]]))
    out = np.asarray(to_aos(vm.reflect(v, n)))
    np.testing.assert_allclose(out, [[-1.0, 1.0, 0.0]], atol=1e-6)


# ---------------------------------------------------------------------------
# warps: ranges and Jacobian/statistical properties
# ---------------------------------------------------------------------------


def _uniform01(n, seed):
    return jnp.asarray(_rand((n,), seed))


def test_concentric_disk_in_unit_disk():
    u1, u2 = _uniform01(4096, 3), _uniform01(4096, 4)
    dx, dy = warps.concentric_sample_disk(u1, u2)
    r2 = np.asarray(dx) ** 2 + np.asarray(dy) ** 2
    assert (r2 <= 1.0 + 1e-6).all()
    # uniform density: mean radius^2 should be ~1/2
    assert abs(r2.mean() - 0.5) < 0.02


def test_concentric_disk_degenerate_center():
    dx, dy = warps.concentric_sample_disk(jnp.float32(0.5), jnp.float32(0.5))
    assert float(dx) == 0.0 and float(dy) == 0.0


def test_uniform_sphere_statistics():
    v = warps.uniform_to_sphere(_uniform01(8192, 5), _uniform01(8192, 6))
    v = np.asarray(to_aos(v))
    np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-5)
    assert np.abs(v.mean(axis=0)).max() < 0.03


def test_cosine_hemisphere_statistics():
    v = warps.uniform_to_cosine_hemisphere(_uniform01(8192, 7), _uniform01(8192, 8))
    v = np.asarray(to_aos(v))
    assert (v[:, 2] >= 0).all()
    # E[cos theta] = 2/3 for pdf = cos/pi
    assert abs(v[:, 2].mean() - 2.0 / 3.0) < 0.01


def test_uniform_hemisphere_statistics():
    v = np.asarray(
        to_aos(warps.uniform_to_hemisphere(_uniform01(8192, 9), _uniform01(8192, 10)))
    )
    # reference maps u1 -> z directly, so z ~ U[0,1): E[z] = 1/2
    assert abs(v[:, 2].mean() - 0.5) < 0.02


def test_cone_within_angle():
    ct_max = 0.8
    v = np.asarray(
        to_aos(warps.uniform_to_cone(_uniform01(4096, 11), _uniform01(4096, 12), ct_max))
    )
    assert (v[:, 2] >= ct_max - 1e-5).all()
    pdf = float(warps.uniform_cone_pdf(jnp.float32(ct_max)))
    np.testing.assert_allclose(pdf, 1.0 / (2 * np.pi * (1 - ct_max)), rtol=1e-5)
    assert float(warps.uniform_cone_pdf(jnp.float32(1.0))) == 0.0


def test_barycentric_triangle_valid():
    bu, bv = warps.uniform_to_barycentric_triangle(
        _uniform01(4096, 13), _uniform01(4096, 14)
    )
    bu, bv = np.asarray(bu), np.asarray(bv)
    assert (bu >= 0).all() and (bv >= 0).all() and (bu + bv <= 1 + 1e-6).all()


# ---------------------------------------------------------------------------
# MIS heuristics
# ---------------------------------------------------------------------------


def test_mis_heuristics():
    b = float(mis.balance_heuristic(1, jnp.float32(0.5), 1, jnp.float32(0.5)))
    p = float(mis.power_heuristic(1, jnp.float32(0.5), 1, jnp.float32(0.5)))
    assert abs(b - 0.5) < 1e-6 and abs(p - 0.5) < 1e-6
    # power heuristic sharpens toward the higher pdf
    p2 = float(mis.power_heuristic(1, jnp.float32(0.9), 1, jnp.float32(0.1)))
    b2 = float(mis.balance_heuristic(1, jnp.float32(0.9), 1, jnp.float32(0.1)))
    assert p2 > b2


# ---------------------------------------------------------------------------
# quaternions
# ---------------------------------------------------------------------------


def test_quaternion_rotation_matches_matrix():
    rs = np.random.default_rng(42)
    axis = rs.normal(size=3)
    axis /= np.linalg.norm(axis)
    angle = 1.234
    q = quat.from_axis_angle(
        V3(jnp.float32(axis[0]), jnp.float32(axis[1]), jnp.float32(axis[2])),
        jnp.float32(angle),
    )
    v = jnp.asarray(rs.normal(size=(16, 3)), jnp.float32)
    out = np.asarray(to_aos(quat.rotate_vector(q, from_aos(v))))
    # Rodrigues formula oracle
    k = axis
    vn = np.asarray(v)
    expected = (
        vn * np.cos(angle)
        + np.cross(k, vn) * np.sin(angle)
        + k[None] * (vn @ k)[:, None] * (1 - np.cos(angle))
    )
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_quaternion_multiply_composition():
    q1 = quat.from_axis_angle(V3(0.0, 0.0, 1.0), jnp.float32(0.7))
    q2 = quat.from_axis_angle(V3(0.0, 1.0, 0.0), jnp.float32(0.4))
    v = V3(1.0, 2.0, 3.0)
    a = quat.rotate_vector(quat.multiply(q1, q2), v)
    b = quat.rotate_vector(q1, quat.rotate_vector(q2, v))
    np.testing.assert_allclose(np.asarray(to_aos(a)), np.asarray(to_aos(b)), atol=1e-5)


def test_quaternion_conjugate_inverts():
    q = quat.from_axis_angle(V3(1.0, 1.0, 0.0), jnp.float32(0.9))
    v = V3(0.3, -0.2, 0.8)
    back = quat.rotate_vector(quat.conjugate(q), quat.rotate_vector(q, v))
    np.testing.assert_allclose(
        np.asarray(to_aos(back)), np.asarray(to_aos(v)), atol=1e-6
    )


def _q4(q):
    return np.array([float(q.w), float(q.v.x), float(q.v.y), float(q.v.z)])


def test_nlerp_endpoints_and_slerp():
    q1 = quat.from_axis_angle(V3(0.0, 0.0, 1.0), jnp.float32(0.0))
    q2 = quat.from_axis_angle(V3(0.0, 0.0, 1.0), jnp.float32(np.pi / 2))
    np.testing.assert_allclose(_q4(quat.nlerp(q1, q2, jnp.float32(0.0))), _q4(q1), atol=1e-6)
    np.testing.assert_allclose(_q4(quat.nlerp(q1, q2, jnp.float32(1.0))), _q4(q2), atol=1e-6)
    # slerp midpoint of a 90° z-rotation is a 45° z-rotation
    mid = quat.slerp(q1, q2, jnp.float32(0.5))
    expect = quat.from_axis_angle(V3(0.0, 0.0, 1.0), jnp.float32(np.pi / 4))
    np.testing.assert_allclose(_q4(mid), _q4(expect), atol=1e-4)


def test_euler_zyx():
    # pure z rotation
    q = quat.from_euler_zyx(jnp.float32(0.0), jnp.float32(0.0), jnp.float32(np.pi / 2))
    v = quat.rotate_vector(q, V3(1.0, 0.0, 0.0))
    np.testing.assert_allclose(np.asarray(to_aos(v)), [0.0, 1.0, 0.0], atol=1e-6)
