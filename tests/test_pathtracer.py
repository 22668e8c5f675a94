"""Path-tracer estimator tests.

(1) Unbiasedness: depth-1 render of a lambert plane lit by one rectangle
    light must match the analytic direct-illumination integral computed by
    dense f64 quadrature (the pdf-correct stage-5 estimator,
    RaytraceMain.cpp:332-448, is unbiased whatever the MIS weights are).
(2) Dirac mirror: a perfect mirror bounce must relay the light's emission
    through the Dirac-chain emission gate (RaytraceMain.cpp:300-306).
(3) Determinism: same seed → identical image; different seed → different.
"""

import dataclasses

import numpy as np
import pytest

import rayito_tpu as rt
from rayito_tpu.models.camera import PerspectiveCamera
from rayito_tpu.render.pathtracer import render_path
from rayito_tpu.utils.config import RenderConfig


def _quad_direct(p, n, albedo, corner, s1, s2, emit, res=400):
    """f64 quadrature of L = ∫ emit·(albedo/π)·cosθs·cosθl/r² dA."""
    u = (np.arange(res) + 0.5) / res
    uu, vv = np.meshgrid(u, u, indexing="ij")
    pts = corner[None, None] + uu[..., None] * s1[None, None] + vv[..., None] * s2[None, None]
    area = np.linalg.norm(np.cross(s1, s2))
    d = pts - p
    r2 = (d * d).sum(-1)
    dn = d / np.sqrt(r2)[..., None]
    ln = np.cross(s1, s2)
    ln = ln / np.linalg.norm(ln)
    cos_s = np.maximum(0.0, (dn * n).sum(-1))
    cos_l = np.abs((dn * ln).sum(-1))  # double-sided light
    integrand = cos_s * cos_l / r2
    da = area / (res * res)
    return emit * (albedo / np.pi) * (integrand.sum() * da)


@pytest.mark.slow
def test_depth1_matches_quadrature():
    albedo = np.array([0.8, 0.6, 0.4])
    emit_c = np.array([1.0, 1.0, 1.0])
    power = 2.0
    # light off to the side so the camera's central rays see the plane
    corner = np.array([1.5, 3.0, -1.0])
    s1 = np.array([2.0, 0.0, 0.0])
    s2 = np.array([0.0, 0.0, 2.0])

    s = rt.Scene()
    s.add(rt.Plane((0, 0, 0), (0, 1, 0), rt.DiffuseMaterial(tuple(albedo))))
    s.add(rt.RectangleLight(tuple(corner), tuple(s1), tuple(s2), tuple(emit_c), power))
    scene = s.compile()

    # camera looking straight down at the origin region
    cam = PerspectiveCamera.make(30.0, (0.0, 8.0, 0.001), (0.0, 0.0, 0.0), (0.0, 0.0, -1.0))
    cfg = RenderConfig(
        width=32, height=32, pixel_samples=8, light_samples=2, max_depth=1,
        aspect_correction=False, seed=3,
    )
    img = render_path(scene, cfg, cam)
    # center pixels all see the plane near the origin; use the exact hit
    # point of the central ray ~ (0,0,0)
    expected = _quad_direct(
        np.zeros(3), np.array([0.0, 1.0, 0.0]), 1.0, corner, s1, s2,
        emit_c * power,
    )
    got = img[14:18, 14:18].mean((0, 1))
    rel = np.abs(got - albedo * expected) / (albedo * expected)
    assert rel.max() < 0.05, (got, albedo * expected)


@pytest.mark.slow
def test_mirror_relays_emission():
    """Camera → mirror plane → rect light: the Dirac chain keeps emission."""
    s = rt.Scene()
    s.add(rt.Plane((0, 0, 0), (0, 1, 0), rt.ReflectionMaterial((1.0, 1.0, 1.0))))
    # big light directly above, so the mirror image fills the view
    s.add(
        rt.RectangleLight((-50.0, 10.0, -50.0), (100.0, 0.0, 0.0), (0.0, 0.0, 100.0),
                          (1.0, 0.5, 0.25), 2.0)
    )
    scene = s.compile()
    cam = PerspectiveCamera.make(30.0, (0.0, 5.0, 0.001), (0.0, 0.0, 0.0), (0.0, 0.0, -1.0))
    cfg = RenderConfig(width=16, height=16, pixel_samples=2, light_samples=1,
                      max_depth=3, aspect_correction=False)
    img = render_path(scene, cfg, cam)
    center = img[6:10, 6:10].mean((0, 1))
    np.testing.assert_allclose(center, [2.0, 1.0, 0.5], rtol=1e-3)


def test_determinism():
    s = rt.Scene()
    s.add(rt.Plane((0, -2, 0), (0, 1, 0), rt.DiffuseMaterial((0.9, 0.9, 1.0))))
    s.add(rt.RectangleLight((-2.5, 4.0, -2.5), (5.0, 0.0, 0.0), (0.0, 0.0, 5.0),
                            (1.0, 1.0, 1.0), 1.0))
    scene = s.compile()
    cam = PerspectiveCamera.make(45.0, (0.0, 5.0, 15.0), (0.0, 0.0, 0.0), (0.0, 1.0, 0.0))
    cfg = RenderConfig(width=24, height=24, pixel_samples=2, light_samples=2, max_depth=2)
    a = render_path(scene, cfg, cam)
    b = render_path(scene, cfg, cam)
    np.testing.assert_array_equal(a, b)
    c = render_path(scene, dataclasses.replace(cfg, seed=5), cam)
    assert np.abs(a - c).max() > 0


def test_fused_frame_matches_sequential_launches():
    """The scanned whole-frame dispatch (_render_path_frame) must be
    BIT-identical, launch for launch, to dispatching the same
    (sample-chunk, row-band) grid one _render_path_pass at a time —
    the fused path is pure orchestration, not a numeric change."""
    import jax.numpy as jnp

    from rayito_tpu.render.pathtracer import (
        _render_path_frame,
        _render_path_pass,
    )

    s = rt.Scene()
    s.add(rt.Plane((0, -2, 0), (0, 1, 0), rt.DiffuseMaterial((0.9, 0.8, 0.7))))
    s.add(rt.Sphere((0.5, -1.0, 0.0), 1.0, rt.DiffuseMaterial((0.2, 0.6, 0.9))))
    s.add(rt.RectangleLight((-2.5, 4.0, -2.5), (5.0, 0.0, 0.0), (0.0, 0.0, 5.0),
                            (1.0, 1.0, 1.0), 2.0))
    scene = s.compile()
    cam = PerspectiveCamera.make(45.0, (0.0, 5.0, 15.0), (0.0, 0.0, 0.0),
                                 (0.0, 1.0, 0.0))
    cfg = RenderConfig(width=20, height=16, pixel_samples=2, light_samples=1,
                       max_depth=2)
    band = 4  # 4 row bands x 2 sample chunks
    si_mat = jnp.asarray([[0, 1], [0, 1], [2, 3], [2, 3]], jnp.int32)
    row0s = jnp.asarray([0, 8, 4, 12], jnp.int32)  # deliberately non-sorted
    imgs, ovf, q = _render_path_frame(scene, cfg, cam, si_mat, row0s, band)
    imgs = np.asarray(imgs)
    # grouped dispatch (the HBM/counter-bounded path) must be identical
    # to the single-scan dispatch, group boundaries included (g=3 makes a
    # ragged 3+1 split)
    from rayito_tpu.render.pathtracer import _dispatch_grid

    imgs_g, ovf_g, q_g = _dispatch_grid(
        scene, cfg, cam, si_mat, row0s, band, band, group=3
    )
    np.testing.assert_array_equal(imgs_g, imgs)
    assert (ovf_g, q_g) == (int(ovf), int(q))
    ovf_s = q_s = 0
    for i in range(si_mat.shape[0]):
        img1, o1, q1 = _render_path_pass(
            scene, cfg, cam, si_mat[i], row0s[i], band
        )
        np.testing.assert_array_equal(imgs[i], np.asarray(img1))
        ovf_s += int(o1)
        q_s += int(q1)
    assert int(ovf) == ovf_s
    assert int(q) == q_s
    assert q_s > 0
