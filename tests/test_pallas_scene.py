"""Renderer-level parity: Pallas traversal domains vs the XLA cluster path.

The Pallas kernel path (render/pallas_traverse.py + the merged static domain
of accel/kernel_tables.py) must produce the same scene intersections as the
XLA cluster pipeline (render/mesh_intersect.py): same hit/miss, same shape /
material / normal, t within the re-test's float tolerance. Runs in kernel
interpreter mode on the CPU test platform (RAYITO_TRAVERSAL=pallas forces the
kernel path off-TPU).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import rayito_tpu as rt
from rayito_tpu.models.demo import inline_box_mesh
from rayito_tpu.ops.vec3 import V3
from rayito_tpu.render.trace import scene_intersect, scene_occluded


def _shift_mesh(mesh, offset):
    mesh.vertices = np.asarray(mesh.vertices, np.float32) + np.asarray(
        offset, np.float32
    )
    return mesh


def _static_two_mesh_scene():
    """Two identity-transform meshes -> ONE merged Pallas domain."""
    b = rt.Scene()
    b.add(_shift_mesh(inline_box_mesh(rt.DiffuseMaterial((0.8, 0.3, 0.1))),
                      (-2.0, 0.0, 0.0)))
    b.add(_shift_mesh(inline_box_mesh(rt.GlossyMaterial((0.3, 0.8, 0.1), 0.2)),
                      (2.5, 0.5, -1.0)))
    b.add(rt.Sphere((0.0, 3.0, 0.0), 1.0, rt.DiffuseMaterial((0.5, 0.5, 0.9))))
    b.add(rt.RectangleLight((-2.5, 6.0, -2.5), (5.0, 0.0, 0.0),
                            (0.0, 0.0, 5.0), (1.0, 1.0, 1.0), 2.0))
    return b.compile()


def _motion_mesh_scene():
    """One static + one keyed-transform mesh -> two Pallas domains."""
    b = rt.Scene()
    b.add(_shift_mesh(inline_box_mesh(rt.DiffuseMaterial((0.8, 0.3, 0.1))),
                      (-2.0, 0.0, 0.0)))
    moving = inline_box_mesh(rt.DiffuseMaterial((0.2, 0.4, 0.9)))
    tr = rt.Transform()
    tr.set_translation(0.0, (2.0, 0.0, 0.0))
    tr.set_translation(1.0, (2.0, 2.0, 0.0))
    tr.set_rotation(1.0, (0.9238795, 0.0, 0.3826834, 0.0))
    moving.transform = tr
    b.add(moving)
    b.add(rt.RectangleLight((-2.5, 6.0, -2.5), (5.0, 0.0, 0.0),
                            (0.0, 0.0, 5.0), (1.0, 1.0, 1.0), 2.0))
    return b.compile()


def _random_rays(n, seed, aim=(0.0, 0.5, 0.0), spread=6.0):
    rs = np.random.default_rng(seed)
    o = rs.uniform(-spread, spread, (n, 3)).astype(np.float32)
    o[:, 2] += 8.0
    tgt = np.asarray(aim, np.float32) + rs.normal(0, 2.0, (n, 3))
    d = (tgt - o).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return (
        V3(*(jnp.asarray(o[:, k]) for k in range(3))),
        V3(*(jnp.asarray(d[:, k]) for k in range(3))),
    )


def _both_impls(fn, monkeypatch):
    monkeypatch.setenv("RAYITO_TRAVERSAL", "xla")
    ref = fn()
    monkeypatch.setenv("RAYITO_TRAVERSAL", "pallas")
    got = fn()
    return ref, got


@pytest.mark.parametrize("scene_fn,time", [
    (_static_two_mesh_scene, 0.0),
    (_motion_mesh_scene, 0.37),
])
def test_scene_intersect_parity(scene_fn, time, monkeypatch):
    scene = scene_fn()
    if scene_fn is _static_two_mesh_scene:
        # both static meshes merge into ONE world-space kernel domain
        assert len(scene.ktab_xf) == 1 and scene.ktab_small == ()
    else:
        # the static box gets the kernel domain; the tiny TRANSFORMED box
        # routes to the dense XLA fold (a kernel launch for a 1-cluster
        # mesh would be all fixed cost)
        assert len(scene.ktab_xf) == 1 and scene.ktab_small == (1,)
    n = 512
    o, d = _random_rays(n, seed=11)
    tmax = jnp.full((n,), 1e30, jnp.float32)

    def run():
        h = scene_intersect(scene, o, d, jnp.full((n,), time), 1e-4, tmax)
        return h

    ref, got = _both_impls(run, monkeypatch)
    np.testing.assert_array_equal(np.asarray(got.valid), np.asarray(ref.valid))
    np.testing.assert_array_equal(
        np.asarray(got.shape_id), np.asarray(ref.shape_id)
    )
    np.testing.assert_array_equal(np.asarray(got.mat), np.asarray(ref.mat))
    hitm = np.asarray(ref.valid)
    if hitm.any():
        np.testing.assert_allclose(
            np.asarray(got.t)[hitm], np.asarray(ref.t)[hitm], rtol=1e-5
        )
        for comp in "xyz":
            np.testing.assert_allclose(
                np.asarray(getattr(got.normal, comp))[hitm],
                np.asarray(getattr(ref.normal, comp))[hitm],
                atol=1e-5,
            )
    assert hitm.sum() > n // 16  # the parity claim needs real coverage
    assert int(got.overflow) == 0  # kernel path: structurally no truncation


@pytest.mark.parametrize("scene_fn,time", [
    (_static_two_mesh_scene, 0.0),
    # the motion scene exercises the ktab_small occlusion fold: its tiny
    # transformed box bypasses the kernel and must still occlude
    (_motion_mesh_scene, 0.37),
])
def test_scene_occluded_parity(scene_fn, time, monkeypatch):
    scene = scene_fn()
    n = 512
    o, d = _random_rays(n, seed=23)
    tmax = jnp.full((n,), 12.0, jnp.float32)

    def run():
        occ, _ = scene_occluded(
            scene, o, d, jnp.full((n,), time), 1e-4, tmax
        )
        return occ

    ref, got = _both_impls(run, monkeypatch)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    assert np.asarray(ref).any()


def test_full_render_parity(monkeypatch):
    """End-to-end: tiny path-traced frame identical between the traversal
    implementations (jit caches cleared between runs — the impl switch is a
    trace-time decision)."""
    from rayito_tpu.models.camera import PerspectiveCamera
    from rayito_tpu.render.pathtracer import render_path_with_stats
    from rayito_tpu.utils.config import RenderConfig

    scene = _motion_mesh_scene()
    cam = PerspectiveCamera.make(
        30.0, (0.0, 3.0, 12.0), (0.0, 0.5, 0.0), (0.0, 1.0, 0.0)
    )
    cfg = RenderConfig(width=24, height=16, pixel_samples=1, light_samples=1,
                      max_depth=2)

    def run():
        jax.clear_caches()
        img, ovf, q = render_path_with_stats(scene, cfg, cam)
        return np.asarray(img)

    ref, got = _both_impls(run, monkeypatch)
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
