"""Shared-origin occlusion sort (BENCH_NOTES.md round-4 lead 3).

The two NEE shadow queries of a bounce share ray origins; with
``share_occl_sort`` one direction-free origin-cell sort serves both kernel
launches and one packed sort inverts both results (trace.scene_occluded_pair).
The sort is a pure performance permutation — occlusion bits, images, and the
issued-query counter must be IDENTICAL with it on or off. Kernel interpreter
mode on the CPU test platform.
"""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

import rayito_tpu as rt
from rayito_tpu.models.camera import PerspectiveCamera
from rayito_tpu.models.demo import inline_box_mesh
from rayito_tpu.ops.vec3 import V3
from rayito_tpu.render.pathtracer import render_path_with_stats
from rayito_tpu.render.trace import scene_occluded, scene_occluded_pair
from rayito_tpu.utils.config import RenderConfig


def _scene(**kw):
    b = rt.Scene()
    b.add(rt.Plane((0.0, -1.5, 0.0), (0.0, 1.0, 0.0),
                   rt.DiffuseMaterial((0.7, 0.7, 0.8))))
    m1 = inline_box_mesh(rt.DiffuseMaterial((0.8, 0.3, 0.1)))
    m1.vertices = np.asarray(m1.vertices, np.float32) + np.float32([-1.5, 0, 0])
    b.add(m1)
    m2 = inline_box_mesh(rt.GlossyMaterial((0.3, 0.8, 0.1), 0.2))
    m2.vertices = np.asarray(m2.vertices, np.float32) + np.float32([1.5, 0.5, -1])
    b.add(m2)
    b.add(rt.RectangleLight((-2.0, 5.0, -2.0), (4.0, 0.0, 0.0),
                            (0.0, 0.0, 4.0), (1.0, 1.0, 1.0), 3.0))
    b.add(rt.ShapeLight(
        rt.Sphere((0.0, 2.0, 2.5), 0.4, rt.DiffuseMaterial((0.9, 0.9, 0.9))),
        color=(1.0, 0.9, 0.6), power=6.0,
    ))
    return b.compile(traversal="pallas", **kw)


def _rays(n, seed=3):
    rng = np.random.default_rng(seed)
    o = V3(*(jnp.asarray(rng.uniform(-3, 3, n), jnp.float32) for _ in range(3)))
    d = rng.normal(size=(3, n)).astype(np.float32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    return o, V3(*(jnp.asarray(c) for c in d))


def test_pair_matches_independent_calls():
    """scene_occluded_pair (shared sort ON) == two scene_occluded calls,
    bit for bit, including lanes dead in one query but live in the other."""
    sc = _scene()
    sc_on = dataclasses.replace(sc, share_occl_sort=True)
    n = 257  # force SB padding
    o, d1 = _rays(n, seed=5)
    _, d2 = _rays(n, seed=11)
    rng = np.random.default_rng(7)
    tmax1 = jnp.asarray(rng.uniform(0.0, 8.0, n), jnp.float32)
    tmax2 = jnp.asarray(rng.uniform(0.0, 8.0, n), jnp.float32)
    tmax2 = jnp.where(jnp.arange(n) % 3 == 0, 0.0, tmax2)  # dead-in-2 lanes
    time = jnp.zeros((n,), jnp.float32)
    live = (tmax1 > 0) | (tmax2 > 0)

    ref1, _ = scene_occluded(sc, o, d1, time, 1e-4, tmax1)
    ref2, _ = scene_occluded(sc, o, d2, time, 1e-4, tmax2)
    occ1, occ2, _ = scene_occluded_pair(
        sc_on, o, d1, tmax1, d2, tmax2, time, 1e-4, live
    )
    np.testing.assert_array_equal(np.asarray(occ1), np.asarray(ref1))
    np.testing.assert_array_equal(np.asarray(occ2), np.asarray(ref2))


def test_fused_pair_matches_independent_calls():
    """scene_occluded_pair with fuse_occl_pair (BOTH queries in ONE
    2N-lane launch per domain, full coherence key over the combined
    population) == two scene_occluded calls, bit for bit — incl. lanes
    dead in one query but live in the other and lanes dead in both."""
    sc = _scene()
    sc_on = dataclasses.replace(sc, fuse_occl_pair=True)
    n = 257  # force SB padding (the 2N launch pads differently than N)
    o, d1 = _rays(n, seed=5)
    _, d2 = _rays(n, seed=11)
    rng = np.random.default_rng(7)
    tmax1 = jnp.asarray(rng.uniform(0.0, 8.0, n), jnp.float32)
    tmax2 = jnp.asarray(rng.uniform(0.0, 8.0, n), jnp.float32)
    tmax2 = jnp.where(jnp.arange(n) % 3 == 0, 0.0, tmax2)  # dead-in-2 lanes
    tmax1 = jnp.where(jnp.arange(n) % 7 == 0, 0.0, tmax1)
    time = jnp.zeros((n,), jnp.float32)
    live = (tmax1 > 0) | (tmax2 > 0)

    ref1, _ = scene_occluded(sc, o, d1, time, 1e-4, tmax1)
    ref2, _ = scene_occluded(sc, o, d2, time, 1e-4, tmax2)
    occ1, occ2, _ = scene_occluded_pair(
        sc_on, o, d1, tmax1, d2, tmax2, time, 1e-4, live
    )
    np.testing.assert_array_equal(np.asarray(occ1), np.asarray(ref1))
    np.testing.assert_array_equal(np.asarray(occ2), np.asarray(ref2))


def test_render_identical_with_fused_pair():
    """Full path render: fuse_occl_pair on == off (image and counters)."""
    sc = _scene()
    cfg = RenderConfig(width=24, height=16, pixel_samples=2,
                       light_samples=1, max_depth=3, aspect_correction=True)
    cam = PerspectiveCamera.make(
        45.0, (0.0, 3.0, 9.0), (0.0, 0.0, 0.0), (0.0, 1.0, 0.0)
    )
    img_off, _, q_off = render_path_with_stats(sc, cfg, cam)
    img_on, _, q_on = render_path_with_stats(
        dataclasses.replace(sc, fuse_occl_pair=True), cfg, cam
    )
    np.testing.assert_array_equal(np.asarray(img_on), np.asarray(img_off))
    assert int(q_on) == int(q_off)


@pytest.mark.parametrize("mesh_light", [False, True])
def test_render_identical_with_shared_sort(mesh_light):
    """Full path render: share_occl_sort on == off, image and query counter
    (analytic-light scenes take the pair's shared path; a mesh light routes
    the BRDF side through scene_intersect — the pair never fires — so both
    configs must STILL agree)."""
    sc = _scene()
    if not mesh_light:
        cfg = RenderConfig(width=24, height=16, pixel_samples=2,
                           light_samples=1, max_depth=3,
                           aspect_correction=True)
        cam = PerspectiveCamera.make(
            45.0, (0.0, 3.0, 9.0), (0.0, 0.0, 0.0), (0.0, 1.0, 0.0)
        )
        img_off, _, q_off = render_path_with_stats(sc, cfg, cam)
        img_on, _, q_on = render_path_with_stats(
            dataclasses.replace(sc, share_occl_sort=True), cfg, cam
        )
        np.testing.assert_array_equal(np.asarray(img_on), np.asarray(img_off))
        assert int(q_on) == int(q_off)
    else:
        b = rt.Scene()
        b.add(rt.Plane((0.0, -1.5, 0.0), (0.0, 1.0, 0.0),
                       rt.DiffuseMaterial((0.7, 0.7, 0.8))))
        m1 = inline_box_mesh(rt.DiffuseMaterial((0.8, 0.3, 0.1)))
        b.add(m1)
        lm = inline_box_mesh(rt.DiffuseMaterial((0.9, 0.9, 0.9)))
        lm.vertices = np.asarray(lm.vertices, np.float32) * np.float32(0.5) \
            + np.float32([0.0, 3.0, 0.0])
        b.add(rt.ShapeLight(lm, color=(1.0, 1.0, 1.0), power=8.0))
        sc2 = b.compile(traversal="pallas")
        cfg = RenderConfig(width=16, height=12, pixel_samples=1,
                           light_samples=1, max_depth=2,
                           aspect_correction=True)
        cam = PerspectiveCamera.make(
            45.0, (0.0, 2.0, 8.0), (0.0, 0.0, 0.0), (0.0, 1.0, 0.0)
        )
        img_off, _, q_off = render_path_with_stats(sc2, cfg, cam)
        img_on, _, q_on = render_path_with_stats(
            dataclasses.replace(sc2, share_occl_sort=True), cfg, cam
        )
        np.testing.assert_array_equal(np.asarray(img_on), np.asarray(img_off))
        assert int(q_on) == int(q_off)
