"""Shape-polymorphism and degenerate-input probes.

The renderer pads ray wavefronts to kernel step sizes (pallas_traverse.SB),
chunks samples and row bands, and quantizes/tonemaps at the output edge —
every one of those has off-by-one surface. These tests render odd
resolutions, a 1x1 frame, and an EMPTY scene end-to-end through the public
API and require finite, correctly-shaped output. (The reference handles the
same degenerate inputs by virtue of per-pixel loops — rayito.h:51-97 camera
math has no size assumptions; our wavefront layout must not add any.)
"""

import numpy as np

import rayito_tpu as rt
from rayito_tpu.models.camera import PerspectiveCamera
from rayito_tpu.render.integrator import render_color
from rayito_tpu.render.pathtracer import render_path
from rayito_tpu.utils.config import RenderConfig


def _cam():
    return PerspectiveCamera.make(
        45.0, (0.0, 5.0, 15.0), (0.0, 0.0, 0.0), (0.0, 1.0, 0.0)
    )


def _tiny_scene():
    s = rt.Scene()
    s.add(rt.Plane((0, -2, 0), (0, 1, 0), rt.DiffuseMaterial((0.9, 0.9, 1.0))))
    s.add(rt.RectangleLight((-2.5, 4.0, -2.5), (5.0, 0.0, 0.0),
                            (0.0, 0.0, 5.0), (1.0, 1.0, 1.0), 1.0))
    return s.compile()


def test_odd_resolutions_path_trace():
    scene = _tiny_scene()
    for w, h in ((17, 13), (1, 1), (3, 64)):
        cfg = RenderConfig(width=w, height=h, pixel_samples=1,
                           light_samples=1, max_depth=2)
        img = render_path(scene, cfg, _cam())
        assert img.shape == (h, w, 3)
        assert np.isfinite(img).all()
        assert (img >= 0).all()


def test_odd_resolution_banded_path():
    """Force the row-band branch (n_pix > max_rays_per_pass) at a height
    that does NOT divide the band size: the shifted last band must overlap
    correctly (render twice at different chunkings, require bit-identity)."""
    import dataclasses

    scene = _tiny_scene()
    cfg = RenderConfig(width=32, height=23, pixel_samples=1,
                       light_samples=1, max_depth=2,
                       max_rays_per_pass=32 * 7)  # band=7, 23 = 3*7 + 2
    a = render_path(scene, cfg, _cam())
    assert a.shape == (23, 32, 3)
    assert np.isfinite(a).all()
    big = dataclasses.replace(cfg, max_rays_per_pass=1 << 20)  # one launch
    b = render_path(scene, big, _cam())
    np.testing.assert_array_equal(a, b)


def test_empty_scene_renders_black():
    scene = rt.Scene().compile()
    cfg = RenderConfig(width=9, height=5, pixel_samples=1,
                       light_samples=1, max_depth=2)
    img = render_path(scene, cfg, _cam())
    assert img.shape == (5, 9, 3)
    np.testing.assert_array_equal(img, np.zeros_like(img))
    # stage-1 style direct render too (tuple camera, per its signature)
    img2 = render_color(
        scene,
        RenderConfig(width=9, height=5, pixel_samples=1,
                     light_samples=1, max_depth=1),
        fov=30.0,
        camera=((0.0, 5.0, 15.0), (0.0, 0.0, 0.0), (0.0, 1.0, 0.0)),
    )
    assert np.isfinite(img2).all()
