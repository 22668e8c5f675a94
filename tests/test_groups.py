"""Nested ShapeSet aggregates (Group) with group transforms.

The reference's ShapeSet is itself a Shape carrying a keyed Transform applied
to incoming rays before its children's transforms (Rayito_Stage7_QT/
RScene.h:113-268, ray-to-local at :122-124). Here Scene.add(Group) flattens
the tree into per-slot parent pointers walked by a statically-unrolled chain
(ops/transform.py eval_chain); these tests pin:

  * bit-identity between a group of identity-transform children and the
    manually-composed equivalent scene (children share the group's slot, so
    the compiled tables and traced programs are IDENTICAL);
  * chain evaluation against pre-baked world-space geometry (f64 compose);
  * depth-3 nesting against a hand-composed single transform;
  * mesh-in-moving-group parity across both traversal implementations;
  * a ShapeLight inside a group sampling from the transformed position.
"""

import dataclasses

import numpy as np
import jax.numpy as jnp

import rayito_tpu as rt
from rayito_tpu.models.camera import PerspectiveCamera
from rayito_tpu.models.demo import inline_box_mesh
from rayito_tpu.ops.vec3 import V3
from rayito_tpu.render.pathtracer import render_path_with_stats
from rayito_tpu.render.trace import scene_intersect
from rayito_tpu.utils.config import RenderConfig


def _rot_y(deg):
    """(w, x, y, z) quaternion for a rotation about +Y."""
    h = np.deg2rad(deg) / 2.0
    return (float(np.cos(h)), 0.0, float(np.sin(h)), 0.0)


def _rays(n, seed, aim, spread=1.5):
    rs = np.random.default_rng(seed)
    o = rs.uniform(-3, 3, (n, 3)).astype(np.float32)
    o[:, 2] += 9.0
    tgt = np.asarray(aim, np.float32) + rs.normal(0, spread, (n, 3))
    d = (tgt - o).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return (
        V3(*(jnp.asarray(o[:, k]) for k in range(3))),
        V3(*(jnp.asarray(d[:, k]) for k in range(3))),
    )


def _quat_rotate(q, v):
    w, x, y, z = [np.float64(c) for c in q]
    qv = np.asarray([x, y, z])
    v = np.asarray(v, np.float64)
    t = 2.0 * np.cross(qv, v)
    return v + w * t + np.cross(qv, t)


def test_identity_children_share_group_slot_bit_exact():
    """Group(T){identity children} compiles to the SAME tables — and renders
    the SAME image bits — as assigning T directly to every child (the
    children collapse onto the group's transform slot)."""
    tr = rt.Transform()
    tr.set_translation(0.0, (0.5, 0.0, 0.0))
    tr.set_translation(1.0, (0.5, 1.0, 0.0))
    tr.set_rotation(1.0, _rot_y(40.0))

    def build(grouped: bool):
        b = rt.Scene()
        b.add(rt.Plane((0, -3, 0), (0, 1, 0), rt.DiffuseMaterial((0.7, 0.7, 0.7))))
        sph = rt.Sphere((0.0, 0.0, 0.0), 0.8, rt.DiffuseMaterial((0.8, 0.2, 0.2)))
        mesh = inline_box_mesh(rt.GlossyMaterial((0.2, 0.7, 0.3), 0.2))
        lamp = rt.ShapeLight(
            rt.Sphere((2.0, 2.0, 0.0), 0.4, None), (1.0, 1.0, 0.9), 4.0
        )
        if grouped:
            g = rt.Group(transform=tr)
            g.add(sph)
            g.add(mesh)
            g.add(lamp)
            b.add(g)
        else:
            sph.transform = tr
            mesh.transform = tr
            lamp.shape.transform = tr
            b.add(sph)
            b.add(mesh)
            b.add(lamp)
        return b.compile(traversal="xla")

    sa = build(True)
    sb = build(False)
    assert sa.xf_depth == 1 and sb.xf_depth == 1  # slots shared, no chain
    np.testing.assert_array_equal(np.asarray(sa.xf_translate),
                                  np.asarray(sb.xf_translate))
    np.testing.assert_array_equal(np.asarray(sa.sph_xf), np.asarray(sb.sph_xf))
    cam = PerspectiveCamera.make(35.0, (0, 2, 9), (0.3, 0, 0), (0, 1, 0),
                                 shutter_open=0.0, shutter_close=1.0)
    cfg = RenderConfig(width=20, height=14, pixel_samples=1, light_samples=1,
                       max_depth=2)
    img_a, _, _ = render_path_with_stats(sa, cfg, cam)
    img_b, _, _ = render_path_with_stats(sb, cfg, cam)
    np.testing.assert_array_equal(np.asarray(img_a), np.asarray(img_b))


def test_group_chain_matches_prebaked_world_geometry():
    """Static group (1-key rotation+translation) with a translated sphere
    child: intersections match a no-transform scene whose geometry is
    pre-baked to world space in f64."""
    q = _rot_y(33.0)
    g_tr = (0.4, -0.2, 0.3)
    c_tr = (1.2, 0.5, 0.0)
    center_local = (0.0, 0.4, 0.0)
    radius = 0.9

    gt = rt.Transform()
    gt.set_translation(0.0, g_tr)
    gt.set_rotation(0.0, q)
    ct = rt.Transform()
    ct.set_translation(0.0, c_tr)

    b = rt.Scene()
    g = rt.Group(transform=gt)
    sph = rt.Sphere(center_local, radius, rt.DiffuseMaterial((0.8, 0.2, 0.2)))
    sph.transform = ct
    g.add(sph)
    b.add(g)
    grouped = b.compile(traversal="xla")
    assert grouped.xf_depth == 2

    # world center = R_g * (center + c_tr) + g_tr  (unit scales)
    world_center = _quat_rotate(
        q, np.asarray(center_local, np.float64) + np.asarray(c_tr)
    ) + np.asarray(g_tr)
    b2 = rt.Scene()
    b2.add(rt.Sphere(tuple(world_center.astype(np.float32)), radius,
                     rt.DiffuseMaterial((0.8, 0.2, 0.2))))
    baked = b2.compile(traversal="xla")

    n = 512
    o, d = _rays(n, 5, world_center, spread=0.8)
    time = jnp.zeros((n,), jnp.float32)
    tmax = jnp.full((n,), 1e30, jnp.float32)
    hg = scene_intersect(grouped, o, d, time, 1e-4, tmax)
    hb = scene_intersect(baked, o, d, time, 1e-4, tmax)
    np.testing.assert_array_equal(np.asarray(hg.valid), np.asarray(hb.valid))
    m = np.asarray(hb.valid)
    assert m.sum() > n // 4
    np.testing.assert_allclose(np.asarray(hg.t)[m], np.asarray(hb.t)[m],
                               rtol=2e-5, atol=2e-5)
    for comp in "xyz":
        np.testing.assert_allclose(
            np.asarray(getattr(hg.normal, comp))[m],
            np.asarray(getattr(hb.normal, comp))[m], atol=2e-4,
        )


def test_nested_groups_depth3_compose():
    """group(R) > group(T) > sphere == single transform (R, translation R*T)
    — static keys compose exactly (in f64 on the host)."""
    q = _rot_y(70.0)
    t_in = (0.0, 1.5, 0.0)

    outer = rt.Group()
    outer.transform.set_rotation(0.0, q)
    inner = rt.Group()
    inner.transform.set_translation(0.0, t_in)
    sph = rt.Sphere((0.5, 0.0, 0.0), 0.6, rt.DiffuseMaterial((0.2, 0.4, 0.9)))
    sph.transform = rt.Transform()
    sph.transform.set_translation(0.0, (0.0, 0.0, 0.7))
    inner.add(sph)
    outer.add(inner)
    b = rt.Scene()
    b.add(outer)
    nested = b.compile(traversal="xla")
    assert nested.xf_depth == 3

    comp = rt.Transform()
    comp.set_rotation(0.0, q)
    comp.set_translation(0.0, tuple(_quat_rotate(q, t_in)))
    sph2 = rt.Sphere((0.5, 0.0, 0.0), 0.6, rt.DiffuseMaterial((0.2, 0.4, 0.9)))
    sph2.transform = comp
    # keep the innermost own-translation as a real chain link on one side
    # and fold it into the sphere's local center on the other
    sph2.position = (0.5, 0.0, 0.7)
    b2 = rt.Scene()
    b2.add(sph2)
    flat = b2.compile(traversal="xla")

    n = 512
    aim = _quat_rotate(q, np.asarray(t_in) + np.asarray([0.5, 0.0, 0.7]))
    o, d = _rays(n, 11, aim, spread=0.5)
    time = jnp.zeros((n,), jnp.float32)
    tmax = jnp.full((n,), 1e30, jnp.float32)
    hg = scene_intersect(nested, o, d, time, 1e-4, tmax)
    hf = scene_intersect(flat, o, d, time, 1e-4, tmax)
    np.testing.assert_array_equal(np.asarray(hg.valid), np.asarray(hf.valid))
    m = np.asarray(hf.valid)
    assert m.sum() > n // 4
    np.testing.assert_allclose(np.asarray(hg.t)[m], np.asarray(hf.t)[m],
                               rtol=2e-5, atol=2e-5)


def test_mesh_in_moving_group_traversal_parity():
    """A large mesh inside a 2-key rotating group exercises the per-domain
    chain walk in BOTH traversal implementations — they must agree."""
    rs = np.random.default_rng(3)
    # a 10x10 grid heightfield: 200 triangles > the 192-tri kernel cutoff
    gx, gz = np.meshgrid(np.linspace(-1.5, 1.5, 11),
                         np.linspace(-1.5, 1.5, 11), indexing="ij")
    gy = 0.3 * np.sin(gx * 2.1) * np.cos(gz * 1.7)
    verts = np.stack([gx, gy, gz], -1).reshape(-1, 3).astype(np.float32)
    idx = []
    for i in range(10):
        for j in range(10):
            a = i * 11 + j
            idx.append((a, a + 1, a + 12))
            idx.append((a, a + 12, a + 11))
    mesh = rt.TriangleMesh(
        vertices=verts, indices=np.asarray(idx, np.int32),
        material=rt.DiffuseMaterial((0.6, 0.6, 0.2)),
    )
    # the mesh's OWN transform keeps the chain real (an identity child
    # would collapse onto the group slot and skip the chain walk)
    mesh.transform = rt.Transform()
    mesh.transform.set_rotation(0.0, _rot_y(-15.0))
    g = rt.Group()
    g.transform.set_translation(0.0, (0.0, -0.5, 0.0))
    g.transform.set_rotation(1.0, _rot_y(50.0))
    g.transform.set_translation(1.0, (0.0, 0.5, 0.0))
    g.add(mesh)
    b = rt.Scene()
    b.add(g)
    b.add(rt.RectangleLight((-2, 5, -2), (4, 0, 0), (0, 0, 4),
                            (1.0, 1.0, 1.0), 2.0))
    scene = b.compile()
    assert scene.xf_depth == 2
    assert len(scene.ktab_xf) >= 1 and scene.ktab_xf[-1] != 0

    n = 1024
    o, d = _rays(n, 17, (0.0, 0.0, 0.0), spread=1.2)
    time = jnp.full((n,), 0.4, jnp.float32)
    tmax = jnp.full((n,), 1e30, jnp.float32)
    hx = scene_intersect(dataclasses.replace(scene, traversal="xla"),
                         o, d, time, 1e-4, tmax)
    hp = scene_intersect(dataclasses.replace(scene, traversal="pallas"),
                         o, d, time, 1e-4, tmax)
    np.testing.assert_array_equal(np.asarray(hp.valid), np.asarray(hx.valid))
    m = np.asarray(hx.valid)
    assert m.sum() > n // 8
    np.testing.assert_allclose(np.asarray(hp.t)[m], np.asarray(hx.t)[m],
                               rtol=1e-5)


def test_rect_light_in_rotated_group_bit_exact():
    """A RectangleLight inside a rotated+translated group renders bitwise
    identically to the same light carrying the group transform directly
    (slot sharing) — pins the chain-aware rect sampling/pdf/analytic-hit
    paths in lights.py."""
    def build(grouped):
        tr = rt.Transform()
        tr.set_translation(0.0, (1.0, 4.0, 0.5))
        tr.set_rotation(0.0, _rot_y(25.0))
        b = rt.Scene()
        b.add(rt.Plane((0, -1, 0), (0, 1, 0), rt.DiffuseMaterial((0.7, 0.7, 0.7))))
        b.add(rt.Sphere((0.0, 0.3, 0.0), 0.8,
                        rt.GlossyMaterial((0.8, 0.6, 0.2), 0.3)))
        lamp = rt.RectangleLight((-1.0, 0.0, -1.0), (2.0, 0, 0), (0, 0, 2.0),
                                 (1.0, 0.95, 0.9), 5.0)
        if grouped:
            g = rt.Group(transform=tr)
            g.add(lamp)
            b.add(g)
        else:
            lamp.transform = tr
            b.add(lamp)
        return b.compile(traversal="xla")

    cam = PerspectiveCamera.make(40.0, (0, 2, 8), (0, 0, 0), (0, 1, 0))
    cfg = RenderConfig(width=18, height=12, pixel_samples=1, light_samples=1,
                       max_depth=2)
    img_g, _, _ = render_path_with_stats(build(True), cfg, cam)
    img_d, _, _ = render_path_with_stats(build(False), cfg, cam)
    np.testing.assert_array_equal(np.asarray(img_g), np.asarray(img_d))
    assert float(np.asarray(img_g).max()) > 0.01


def test_light_in_translated_group_illuminates_from_new_position():
    """A sphere ShapeLight inside a translated group must light the scene
    from its group-transformed position: renders equal (bitwise) to the
    scene with the light translated directly."""
    off = (2.0, 3.0, 1.0)

    def build(grouped):
        tr = rt.Transform()
        tr.set_translation(0.0, off)
        b = rt.Scene()
        b.add(rt.Plane((0, -1, 0), (0, 1, 0), rt.DiffuseMaterial((0.7, 0.7, 0.7))))
        lamp = rt.ShapeLight(rt.Sphere((0.0, 0.0, 0.0), 0.5, None),
                             (1.0, 0.9, 0.8), 6.0)
        if grouped:
            g = rt.Group(transform=tr)
            g.add(lamp)
            b.add(g)
        else:
            lamp.shape.transform = tr
            b.add(lamp)
        return b.compile(traversal="xla")

    cam = PerspectiveCamera.make(40.0, (0, 2, 8), (0, 0, 0), (0, 1, 0))
    cfg = RenderConfig(width=16, height=12, pixel_samples=1, light_samples=1,
                       max_depth=2)
    img_g, _, _ = render_path_with_stats(build(True), cfg, cam)
    img_d, _, _ = render_path_with_stats(build(False), cfg, cam)
    np.testing.assert_array_equal(np.asarray(img_g), np.asarray(img_d))
    assert float(np.asarray(img_g).max()) > 0.01  # scene is actually lit


def test_group_scene_sharded_bit_identical():
    """Transform chains under shard_map: an 8-device render of a group
    scene (depth-2 chain + group light) is bit-identical to 1-device —
    the determinism claim of parallel/sharding.py extends to the new
    chain-walk code paths."""
    import jax

    from rayito_tpu.parallel.sharding import make_mesh, render_path_sharded

    if len(jax.devices("cpu")) < 8:
        import pytest

        pytest.skip("needs 8 virtual CPU devices (conftest provides them)")

    g = rt.Group()
    g.transform.set_translation(0.0, (0.3, 0.0, 0.0))
    g.transform.set_rotation(1.0, _rot_y(35.0))
    sph = rt.Sphere((0.0, 0.4, 0.0), 0.8, rt.DiffuseMaterial((0.8, 0.2, 0.2)))
    sph.transform = rt.Transform()
    sph.transform.set_translation(0.0, (0.8, 0.0, 0.0))
    g.add(sph)
    g.add(rt.ShapeLight(rt.Sphere((2.0, 3.0, 0.0), 0.4, None),
                        (1.0, 1.0, 0.9), 5.0))
    b = rt.Scene()
    b.add(rt.Plane((0, -1.5, 0), (0, 1, 0), rt.DiffuseMaterial((0.7, 0.7, 0.7))))
    b.add(g)
    scene = b.compile(traversal="xla")
    assert scene.xf_depth == 2

    cam = PerspectiveCamera.make(
        40.0, (0, 2, 8), (0, 0, 0), (0, 1, 0),
        shutter_open=0.0, shutter_close=1.0,
    )
    cfg = RenderConfig(width=24, height=16, pixel_samples=2, light_samples=1,
                       max_depth=2)
    img1 = render_path_sharded(scene, cfg, cam,
                               make_mesh(jax.devices("cpu")[:1]))
    img8 = render_path_sharded(scene, cfg, cam,
                               make_mesh(jax.devices("cpu")[:8]))
    assert np.isfinite(img8).all()
    np.testing.assert_array_equal(img1, img8)
