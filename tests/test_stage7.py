"""Stage-7 capability tests: keyed TRS transforms, motion blur, demo scenes."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

import rayito_tpu as rt
from rayito_tpu.models.camera import PerspectiveCamera
from rayito_tpu.ops import transform as xfm
from rayito_tpu.ops.vec3 import V3, to_aos
from rayito_tpu.render.pathtracer import render_path
from rayito_tpu.render.trace import scene_intersect
from rayito_tpu.utils.config import RenderConfig


def _xf_tables(tr):
    """Compile a single Transform into the padded table format."""
    s = rt.Scene()
    s.add(rt.Sphere((0, 0, 0), 1.0, rt.DiffuseMaterial((1, 1, 1)), transform=tr))
    sd = s.compile()
    return sd


def test_transform_key_interpolation_matches_reference_semantics():
    """translate lerps; outside the key range pegs to end keys
    (RMath.h:666-715, 850-884)."""
    tr = rt.Transform(
        times=[0.2, 0.8],
        translations=[(0.0, 0.0, 0.0), (2.0, 4.0, -2.0)],
        scales=[(1.0, 1.0, 1.0)] * 2,
        rotations=[(1.0, 0.0, 0.0, 0.0)] * 2,
    )
    sd = _xf_tables(tr)
    times = jnp.asarray([0.0, 0.2, 0.5, 0.8, 1.0], jnp.float32)
    xf_id = jnp.full(times.shape, 1, jnp.int32)  # slot 0 is identity
    t, s, r = xfm.eval_transform(
        sd.xf_times, sd.xf_translate, sd.xf_scale, sd.xf_rotate, sd.xf_nkeys,
        xf_id, times,
    )
    got = np.asarray(to_aos(t))
    np.testing.assert_allclose(got[0], [0, 0, 0], atol=1e-6)  # pegged to first
    np.testing.assert_allclose(got[1], [0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(got[2], [1, 2, -1], atol=1e-5)  # midpoint lerp
    np.testing.assert_allclose(got[3], [2, 4, -2], atol=1e-6)
    np.testing.assert_allclose(got[4], [2, 4, -2], atol=1e-6)  # pegged to last


def test_transform_rotation_nlerp():
    """Rotation interpolation is nlerp (RMath.h:705-715): the midpoint of a
    90-degree z-rotation rotates by 45 degrees."""
    import math

    half = math.pi / 4  # half-angle of 90deg
    tr = rt.Transform(
        times=[0.0, 1.0],
        translations=[(0.0, 0.0, 0.0)] * 2,
        scales=[(1.0, 1.0, 1.0)] * 2,
        rotations=[(1.0, 0.0, 0.0, 0.0), (math.cos(half), 0.0, 0.0, math.sin(half))],
    )
    sd = _xf_tables(tr)
    t, s, r = xfm.eval_transform(
        sd.xf_times, sd.xf_translate, sd.xf_scale, sd.xf_rotate, sd.xf_nkeys,
        jnp.asarray([1], jnp.int32), jnp.asarray([0.5], jnp.float32),
    )
    from rayito_tpu.ops.quaternion import rotate_vector

    v = rotate_vector(r, V3(jnp.ones(1), jnp.zeros(1), jnp.zeros(1)))
    got = np.asarray(to_aos(v))[0]
    c45 = np.cos(np.pi / 4)
    np.testing.assert_allclose(got, [c45, c45, 0.0], atol=1e-4)


def test_to_from_local_round_trip():
    tr = rt.Transform(
        times=[0.0],
        translations=[(1.0, 2.0, 3.0)],
        scales=[(2.0, 0.5, 1.5)],
        rotations=[tuple(np.array([0.9, 0.1, 0.3, -0.2]) / np.linalg.norm([0.9, 0.1, 0.3, -0.2]))],
    )
    sd = _xf_tables(tr)
    t, s, r = xfm.eval_transform(
        sd.xf_times, sd.xf_translate, sd.xf_scale, sd.xf_rotate, sd.xf_nkeys,
        jnp.asarray([1], jnp.int32), jnp.asarray([0.0], jnp.float32),
    )
    rs = np.random.default_rng(0)
    p = V3(*(jnp.asarray(rs.normal(size=1), jnp.float32) for _ in range(3)))
    back = xfm.from_local_point(xfm.to_local_point(p, t, s, r), t, s, r)
    np.testing.assert_allclose(np.asarray(to_aos(back)), np.asarray(to_aos(p)),
                               rtol=1e-4, atol=1e-5)


def test_moving_sphere_motion_blur():
    """A sphere with keys at x=-2 (t=0) and x=+2 (t=1): rays at time 0 hit it
    at -2, rays at time 1 at +2 (Sphere::intersect transforms the ray to
    local space at ray time, RScene.h:397-404)."""
    s = rt.Scene()
    s.add(
        rt.Sphere(
            (0.0, 0.0, 0.0), 1.0, rt.DiffuseMaterial((1, 1, 1)),
            transform=rt.Transform(
                times=[0.0, 1.0],
                translations=[(-2.0, 0.0, 0.0), (2.0, 0.0, 0.0)],
                scales=[(1.0, 1.0, 1.0)] * 2,
                rotations=[(1.0, 0.0, 0.0, 0.0)] * 2,
            ),
        )
    )
    sd = s.compile()
    assert sd.has_motion
    o = V3(jnp.asarray([-2.0, 2.0, -2.0, 2.0], jnp.float32),
           jnp.zeros(4), jnp.full(4, -5.0, jnp.float32))
    d = V3(jnp.zeros(4), jnp.zeros(4), jnp.ones(4))
    time = jnp.asarray([0.0, 0.0, 1.0, 1.0], jnp.float32)
    hit = scene_intersect(sd, o, d, time, 1e-4, jnp.full(4, 1e30, jnp.float32))
    got = np.asarray(hit.valid)
    assert got.tolist() == [True, False, False, True]
    np.testing.assert_allclose(np.asarray(hit.t)[[0, 3]], 4.0, atol=1e-5)


def test_scaled_sphere_intersect():
    """Non-uniform scale: a unit sphere scaled (2,1,1) must be hit at x=±2."""
    s = rt.Scene()
    s.add(
        rt.Sphere(
            (0.0, 0.0, 0.0), 1.0, rt.DiffuseMaterial((1, 1, 1)),
            transform=rt.Transform(
                times=[0.0],
                translations=[(0.0, 0.0, 0.0)],
                scales=[(2.0, 1.0, 1.0)],
                rotations=[(1.0, 0.0, 0.0, 0.0)],
            ),
        )
    )
    sd = s.compile()
    o = V3(jnp.asarray([-5.0, -5.0], jnp.float32),
           jnp.asarray([0.0, 0.0], jnp.float32),
           jnp.asarray([0.0, 1.5], jnp.float32))
    d = V3(jnp.ones(2), jnp.zeros(2), jnp.zeros(2))
    hit = scene_intersect(sd, o, d, jnp.zeros(2), 1e-4, jnp.full(2, 1e30, jnp.float32))
    assert bool(hit.valid[0]) and abs(float(hit.t[0]) - 3.0) < 1e-4  # hits x=-2
    assert not bool(hit.valid[1])  # z=1.5 > minor radius 1: miss


@pytest.mark.slow
def test_stage7_scene1_renders():
    from rayito_tpu.models.demo import STAGE7_CAMERA, stage7_scene1

    scene = stage7_scene1().compile()
    assert scene.has_motion
    cam = PerspectiveCamera.make(
        30.0, *STAGE7_CAMERA, focal_distance=16.0, lens_radius=0.0,
        shutter_open=0.0, shutter_close=1.0,
    )
    cfg = RenderConfig(width=96, height=72, pixel_samples=2, light_samples=1,
                      max_depth=3)
    img = render_path(scene, cfg, cam)
    assert np.isfinite(img).all()
    assert (img >= 0).all()
    assert img.max() > 0.1  # scene is lit


@pytest.mark.slow
def test_stage7_scene2_renders():
    from rayito_tpu.models.demo import STAGE7_SCENE2_CAMERA, stage7_scene2

    scene = stage7_scene2().compile()
    cam = PerspectiveCamera.make(
        30.0, *STAGE7_SCENE2_CAMERA, focal_distance=16.0,
        shutter_open=0.0, shutter_close=1.0,
    )
    cfg = RenderConfig(width=96, height=72, pixel_samples=2, light_samples=1,
                      max_depth=2)
    img = render_path(scene, cfg, cam)
    assert np.isfinite(img).all()
    assert img.max() > 0.05


def test_dof_camera_rays():
    """lens_radius > 0 perturbs ray origins on the lens disk and keeps the
    focal plane sharp (RaytraceMain.cpp:237-264)."""
    cam = PerspectiveCamera.make(
        30.0, (0, 0, 0), (0, 0, 1), (0, 1, 0), focal_distance=10.0,
        lens_radius=0.5,
    )
    n = 256
    rs = np.random.default_rng(1)
    lens_u = jnp.asarray(rs.random(n), jnp.float32)
    lens_v = jnp.asarray(rs.random(n), jnp.float32)
    xu = jnp.full(n, 0.5, jnp.float32)
    yu = jnp.full(n, 0.5, jnp.float32)
    o, d, t = cam.make_rays(xu, yu, lens_u, lens_v, jnp.zeros(n))
    oa = np.asarray(to_aos(o))
    da = np.asarray(to_aos(d))
    # origins spread on the lens
    assert oa[:, 0].std() > 0.05
    # all rays converge at the focal point (0, 0, 10)
    t_f = (10.0 - oa[:, 2]) / da[:, 2]
    focus = oa + da * t_f[:, None]
    np.testing.assert_allclose(focus[:, 0], 0.0, atol=1e-4)
    np.testing.assert_allclose(focus[:, 1], 0.0, atol=1e-4)


@pytest.mark.slow
def test_mesh_shape_light():
    """A mesh wrapped as a ShapeLight illuminates a lambert plane — the
    MAKE_OBJ_A_MESH_LIGHT capability (Rayito_Stage7_QT/MainWindow.cpp:195-199).
    Validated against f64 quadrature of the direct integral.

    The light is a purpose-built 2-triangle quad with its geometric normal
    facing the plane (-y), so the analytic reference is exact. (The
    reference's hand-built cube is deliberately NOT usable here: its quads
    wind inward, it has no bottom face, and the top face is duplicated
    (MainWindow.cpp:93-137) — faithful in make_cube — so every face that
    passes the ShapeLight facing test (RLight.h:305-309) is self-occluded
    and the converged image is dominated by MIS partial weights, not by the
    direct integral.)"""
    from rayito_tpu.models.scene import TriangleMesh

    albedo = 0.8
    power = 5.0
    verts = np.array(
        [[-0.5, 3.0, -0.5], [0.5, 3.0, -0.5], [0.5, 3.0, 0.5],
         [-0.5, 3.0, 0.5]],
        np.float32,
    )
    # winding chosen so cross(p1-p0, p2-p0) == -y (toward the plane)
    tris = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    s = rt.Scene()
    s.add(rt.Plane((0, 0, 0), (0, 1, 0), rt.DiffuseMaterial((albedo,) * 3)))
    quad = TriangleMesh(
        vertices=verts, indices=tris,
        material=rt.DiffuseMaterial((1, 1, 1)),
        face_ids=np.array([0, 0], np.int32),
    )
    s.add(rt.ShapeLight(quad, (1.0, 1.0, 1.0), power))
    scene = s.compile()
    assert scene.light_kinds_host == (2,)

    cam = PerspectiveCamera.make(30.0, (3.0, 6.0, 0.001), (3.0, 0.0, 0.0),
                                 (0.0, 0.0, -1.0))
    cfg = RenderConfig(width=24, height=24, pixel_samples=6, light_samples=2,
                      max_depth=1, aspect_correction=False)
    img = render_path(scene, cfg, cam)
    assert np.isfinite(img).all() and (img >= 0).all()
    got = img[10:14, 10:14, 0].mean()

    # f64 quadrature: direct illumination at the plane point under the camera
    # (x=3, z=0) from the quad at y=3 (x,z in [-0.5, 0.5])
    res = 600
    u = (np.arange(res) + 0.5) / res - 0.5
    xx, zz = np.meshgrid(u, u, indexing="ij")
    px = np.array([3.0, 0.0, 0.0])
    d = np.stack([xx, np.full_like(xx, 3.0), zz], -1) - px
    r2 = (d * d).sum(-1)
    dn = d / np.sqrt(r2)[..., None]
    cos_s = dn[..., 1]
    cos_l = np.abs(-dn[..., 1])
    L = power * (albedo / np.pi) * ((cos_s * cos_l / r2).sum() * (1.0 / res**2))
    assert abs(got - L) / L < 0.15, (got, L)


def test_eval_transform_scalar_and_lane_paths_agree():
    """eval_transform has a scalar-id fast path (where-chain key selection —
    the renderer's hot path) and a per-lane-id gather path
    (_eval_transform_lanes, API surface). They must produce identical
    results or the renderer would silently diverge from the documented
    Transform semantics."""
    tr = rt.Transform()
    tr.set_translation(0.0, (1.0, -2.0, 0.5))
    tr.set_translation(0.6, (3.0, 0.0, -1.0))
    tr.set_translation(1.0, (0.0, 4.0, 2.0))
    tr.set_scaling(0.6, (2.0, 1.0, 0.5))
    tr.set_rotation(1.0, (0.9238795, 0.0, 0.3826834, 0.0))
    sd = _xf_tables(tr)
    xf_id = sd.sph_xf[0]

    times = jnp.asarray(
        np.linspace(-0.2, 1.3, 257, dtype=np.float32)  # incl. out-of-range
    )
    tr_s, sc_s, ro_s = xfm.eval_transform(
        sd.xf_times, sd.xf_translate, sd.xf_scale, sd.xf_rotate,
        sd.xf_nkeys, xf_id, times,
    )
    ids = jnp.broadcast_to(jnp.asarray(xf_id, jnp.int32), times.shape)
    tr_l, sc_l, ro_l = xfm.eval_transform(
        sd.xf_times, sd.xf_translate, sd.xf_scale, sd.xf_rotate,
        sd.xf_nkeys, ids, times,
    )
    for a, b in [(tr_s, tr_l), (sc_s, sc_l), (ro_s.v, ro_l.v)]:
        for comp in "xyz":
            np.testing.assert_array_equal(
                np.asarray(getattr(a, comp)), np.asarray(getattr(b, comp))
            )
    np.testing.assert_array_equal(np.asarray(ro_s.w), np.asarray(ro_l.w))
