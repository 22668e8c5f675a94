"""Renderer-level parity: Pallas traversal domains vs the XLA cluster path.

The Pallas kernel path (render/pallas_traverse.py + the merged static domain
of accel/kernel_tables.py) must produce the same scene intersections as the
XLA cluster pipeline (render/mesh_intersect.py): same hit/miss, same shape /
material / normal, t within the re-test's float tolerance. Runs in kernel
interpreter mode on the CPU test platform (the scene's static ``traversal``
field forces the kernel path off-TPU; switching it re-keys every jit cache,
so no cache clearing is needed between implementations).
"""

import dataclasses

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


def _static_two_mesh_scene(**compile_kw):
    """Two identity-transform meshes -> ONE merged Pallas domain."""
    b = rt.Scene()
    b.add(_shift_mesh(inline_box_mesh(rt.DiffuseMaterial((0.8, 0.3, 0.1))),
                      (-2.0, 0.0, 0.0)))
    b.add(_shift_mesh(inline_box_mesh(rt.GlossyMaterial((0.3, 0.8, 0.1), 0.2)),
                      (2.5, 0.5, -1.0)))
    b.add(rt.Sphere((0.0, 3.0, 0.0), 1.0, rt.DiffuseMaterial((0.5, 0.5, 0.9))))
    b.add(rt.RectangleLight((-2.5, 6.0, -2.5), (5.0, 0.0, 0.0),
                            (0.0, 0.0, 5.0), (1.0, 1.0, 1.0), 2.0))
    return b.compile(**compile_kw)


def _motion_mesh_scene(**compile_kw):
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
    return b.compile(**compile_kw)


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


def _both_impls(fn, scene):
    """Run ``fn(scene_variant)`` under both traversal implementations."""
    ref = fn(dataclasses.replace(scene, traversal="xla"))
    got = fn(dataclasses.replace(scene, traversal="pallas"))
    return ref, got


@pytest.mark.parametrize("scene_fn,time", [
    (_static_two_mesh_scene, 0.0),
    (_motion_mesh_scene, 0.37),
])
@pytest.mark.parametrize("mt", ["vpu", "mxu", "bw", "bw_closest"])
def test_scene_intersect_parity(scene_fn, time, mt):
    scene = scene_fn(traverse_mt=mt)
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

    def run(sc):
        h = scene_intersect(sc, o, d, jnp.full((n,), time), 1e-4, tmax)
        return h

    ref, got = _both_impls(run, scene)
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
@pytest.mark.parametrize("mt", ["vpu", "mxu", "bw", "bw_closest"])
def test_scene_occluded_parity(scene_fn, time, mt):
    scene = scene_fn(traverse_mt=mt)
    n = 512
    o, d = _random_rays(n, seed=23)
    tmax = jnp.full((n,), 12.0, jnp.float32)

    def run(sc):
        occ, _ = scene_occluded(
            sc, o, d, jnp.full((n,), time), 1e-4, tmax
        )
        return occ

    ref, got = _both_impls(run, scene)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    assert np.asarray(ref).any()


def test_full_render_parity():
    """End-to-end: tiny path-traced frame identical between the traversal
    implementations (the impl choice is a static SceneData field, so each
    variant gets its own jit cache entry — no cache clearing)."""
    from rayito_tpu.models.camera import PerspectiveCamera
    from rayito_tpu.render.pathtracer import render_path_with_stats
    from rayito_tpu.utils.config import RenderConfig

    scene = _motion_mesh_scene()
    cam = PerspectiveCamera.make(
        30.0, (0.0, 3.0, 12.0), (0.0, 0.5, 0.0), (0.0, 1.0, 0.0)
    )
    cfg = RenderConfig(width=24, height=16, pixel_samples=1, light_samples=1,
                      max_depth=2)

    def run(sc):
        img, ovf, q = render_path_with_stats(sc, cfg, cam)
        return np.asarray(img)

    ref, got = _both_impls(run, scene)
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_static_split_parity():
    """``compile(static_split=G)`` partitions the merged static domain into
    G spatial groups (separate launches, t-cap chained; BENCH_NOTES round-4
    lead 2). A pure layout change: scene intersections and occlusion must
    match the single-domain compile exactly."""
    b = rt.Scene()
    for k, off in enumerate([(-3.0, 0.0, 0.0), (0.0, 0.4, -0.8),
                             (3.0, -0.2, 0.5)]):
        b.add(_shift_mesh(
            inline_box_mesh(rt.DiffuseMaterial((0.5 + 0.1 * k, 0.3, 0.2))),
            off,
        ))
    b.add(rt.RectangleLight((-2.5, 6.0, -2.5), (5.0, 0.0, 0.0),
                            (0.0, 0.0, 5.0), (1.0, 1.0, 1.0), 2.0))
    one = b.compile(traversal="pallas", static_split=1)
    split = b.compile(traversal="pallas", static_split=2)
    assert len(one.ktab_xf) == 1 and len(split.ktab_xf) == 2
    assert all(x == 0 for x in split.ktab_xf)

    n = 512
    o, d = _random_rays(n, seed=23)
    tmax = jnp.full((n,), 1e30, jnp.float32)
    time = jnp.zeros((n,), jnp.float32)
    h1 = scene_intersect(one, o, d, time, 1e-4, tmax)
    h2 = scene_intersect(split, o, d, time, 1e-4, tmax)
    np.testing.assert_array_equal(np.asarray(h2.valid), np.asarray(h1.valid))
    np.testing.assert_array_equal(np.asarray(h2.shape_id),
                                  np.asarray(h1.shape_id))
    np.testing.assert_array_equal(np.asarray(h2.t), np.asarray(h1.t))
    occ1, _ = scene_occluded(one, o, d, time, 1e-4, jnp.full((n,), 6.0))
    occ2, _ = scene_occluded(split, o, d, time, 1e-4, jnp.full((n,), 6.0))
    np.testing.assert_array_equal(np.asarray(occ2), np.asarray(occ1))


def _grid_mesh_scene():
    """51x51x2 = 5202 triangles -> 41 kernel clusters: 2 chunks at
    tri_chunk=32 (the smallest legal chunk)."""
    g = 52
    gx, gz = np.meshgrid(np.linspace(-3, 3, g), np.linspace(-3, 3, g),
                         indexing="ij")
    gy = 0.5 * np.sin(gx * 1.3) * np.cos(gz * 1.1)
    verts = np.stack([gx, gy, gz], -1).reshape(-1, 3).astype(np.float32)
    idx = []
    for i in range(g - 1):
        for j in range(g - 1):
            a = i * g + j
            idx.append((a, a + 1, a + g + 1))
            idx.append((a, a + g + 1, a + g))
    b = rt.Scene()
    b.add(rt.TriangleMesh(vertices=verts, indices=np.asarray(idx, np.int32),
                          material=rt.DiffuseMaterial((0.6, 0.5, 0.4))))
    b.add(rt.RectangleLight((-2, 6, -2), (4, 0, 0), (0, 0, 4),
                            (1.0, 1.0, 1.0), 2.0))
    return b.compile(traversal="pallas")


def test_streamed_tri_table_parity():
    """Tables beyond SceneData.tri_chunk clusters stream through VMEM in
    chunks (VERDICT r2 item 4 — no ktab_fits size cap anymore). Forcing a
    tiny chunk size must leave scene intersections BIT-identical to the
    resident-table path, through the public scene API. tri_chunk is a
    compile-time SceneData field (module env default RAYITO_TRI_CHUNK),
    so the variant is built with dataclasses.replace."""
    scene = _grid_mesh_scene()
    assert scene.ktab_tri[0].shape[0] > 32  # must exceed the forced chunk

    n = 512
    o, d = _random_rays(n, seed=43, aim=(0.0, 0.0, 0.0))
    time = jnp.zeros((n,), jnp.float32)
    tmax = jnp.full((n,), 1e30, jnp.float32)

    def run(sc):
        h = scene_intersect(sc, o, d, time, 1e-4, tmax)
        return (np.asarray(h.t), np.asarray(h.valid), np.asarray(h.shape_id))

    import dataclasses

    t_res, v_res, s_res = run(dataclasses.replace(scene, tri_chunk=512))
    # smallest legal chunk -> 2 streamed chunks for the 41-cluster table
    t_str, v_str, s_str = run(dataclasses.replace(scene, tri_chunk=32))
    assert v_res.sum() > n // 4
    np.testing.assert_array_equal(v_str, v_res)
    np.testing.assert_array_equal(s_str, s_res)
    np.testing.assert_array_equal(t_str, t_res)


def test_occlusion_respects_exact_tmax():
    """The kernel's packed key quantizes t to 128-ulp buckets; the occlusion
    path must NOT let that quantization accept hits at t >= tmax (the strict
    t < tmax test — a shadow ray whose tmax lands exactly ON a surface, e.g.
    the sampled light triangle itself, is unoccluded by it). Regression for
    the round-down-tmax fix in scene_occluded: without it, every lane here
    whose hit-t has nonzero low mantissa bits reports a false occlusion."""
    scene = _static_two_mesh_scene()
    n = 512
    # aim straight at the two boxes so most rays hit MESH geometry (the
    # kernel path is what's under test; analytic shapes occlude elsewhere)
    rs = np.random.default_rng(31)
    # inline_box_mesh spans [0,1]x[-2,-1]x[-2,-1]; the scene shifts copies
    # by (-2,0,0) and (2.5,0.5,-1) -> centers below
    tgts = np.where(
        (np.arange(n) % 2 == 0)[:, None],
        np.asarray([-1.5, -1.5, -1.5]),
        np.asarray([3.0, -1.0, -2.5]),
    ) + rs.normal(0, 0.2, (n, 3))
    og = rs.uniform(-4, 4, (n, 3)).astype(np.float32)
    og[:, 2] += 10.0
    dg = (tgts - og).astype(np.float32)
    dg /= np.linalg.norm(dg, axis=1, keepdims=True)
    o = V3(*(jnp.asarray(og[:, k]) for k in range(3)))
    d = V3(*(jnp.asarray(dg[:, k]) for k in range(3)))
    time = jnp.zeros((n,), jnp.float32)

    # exact first-hit distances from the XLA path, restricted to mesh hits
    sc_xla = dataclasses.replace(scene, traversal="xla")
    h = scene_intersect(sc_xla, o, d, time, 1e-4, jnp.full((n,), 1e30))
    hit = np.asarray(h.valid) & (np.asarray(h.shape_id) >= scene.mesh_id0)
    assert hit.sum() > n // 8
    t_exact = np.asarray(h.t)

    sc_pl = dataclasses.replace(scene, traversal="pallas")
    # tmax exactly AT the hit: strictly-less test -> unoccluded
    tmax_at = jnp.asarray(np.where(hit, t_exact, 1e-3).astype(np.float32))
    occ_at, _ = scene_occluded(sc_pl, o, d, time, 1e-4, tmax_at)
    assert not np.asarray(occ_at)[hit].any()

    # tmax comfortably past the hit -> occluded (the shrink is <=2^-16
    # relative, far below the 1% margin)
    tmax_past = jnp.asarray(
        np.where(hit, t_exact * 1.01, 1e-3).astype(np.float32)
    )
    occ_past, _ = scene_occluded(sc_pl, o, d, time, 1e-4, tmax_past)
    assert np.asarray(occ_past)[hit].all()


def test_packed_vm_rows_parity(monkeypatch):
    """The lane-packed winner-row table (tri_vm_packed: 4 logical 32-col
    rows per 128-lane physical row, zero lane padding) must produce the
    BIT-identical Hit as the padded [T, 32] gather it replaces — the
    packed path gathers row idx>>2 and 3-selects group idx&3 after the
    physical transpose (render/trace.py _winner_retest). Auto-packing
    only engages above the measured 96k-triangle crossover, so force it
    on for this small scene."""
    monkeypatch.setenv("RAYITO_PACKED_ROWS", "1")
    scene = _static_two_mesh_scene(traversal="pallas")
    assert scene.tri_vm_packed.shape[0] > 0
    # the padded table is no longer shipped alongside the packed one
    # (dead HBM) — compile the unpacked variant separately
    assert scene.tri_vm_rows.shape[0] == 0
    monkeypatch.setenv("RAYITO_PACKED_ROWS", "0")
    unpacked = _static_two_mesh_scene(traversal="pallas")
    assert unpacked.tri_vm_packed.shape[0] == 0
    n = 512
    o, d = _random_rays(n, seed=23)
    t = jnp.zeros((n,), jnp.float32)
    tmax = jnp.full((n,), 1e30, jnp.float32)
    got = scene_intersect(scene, o, d, t, 1e-4, tmax)
    ref = scene_intersect(unpacked, o, d, t, 1e-4, tmax)
    assert np.asarray(ref.valid).sum() > n // 16
    for a, b in zip(
        jax.tree_util.tree_leaves(got), jax.tree_util.tree_leaves(ref)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_traverse_knobs_thread_through_scene():
    """The kernel block knobs are compile-time SceneData fields
    (traverse_b/wide/sub — round-3 verdict weak #8): trace.py must pass
    the SCENE's values to every launch, and since the knobs are pure
    scheduling, any legal setting produces the identical Hit."""
    scene = _static_two_mesh_scene(traversal="pallas")
    assert (scene.traverse_b, scene.traverse_wide, scene.traverse_sub,
            scene.traverse_sb) == (128, 4, 0, 2048)
    n = 384
    o, d = _random_rays(n, seed=31)
    t = jnp.zeros((n,), jnp.float32)
    tmax = jnp.full((n,), 1e30, jnp.float32)
    base = scene_intersect(scene, o, d, t, 1e-4, tmax)
    assert np.asarray(base.valid).sum() > n // 16
    for kw in (
        {"traverse_b": 64},
        {"traverse_b": 256},
        {"traverse_wide": 1},
        {"traverse_sub": 32},
        {"tri_chunk": 32},
        # sb (rays per grid step) was the LAST import-time kernel-shape
        # env read (round-4 verdict weak #3) — now a compile-time field
        # like the rest; any legal value is pure scheduling
        {"traverse_sb": 1024},
        {"traverse_sb": 256},
        # live-prefix grid truncation is pure-perf: off == on
        {"live_prefix": False},
    ):
        var = dataclasses.replace(scene, **kw)
        got = scene_intersect(var, o, d, t, 1e-4, tmax)
        for a, b in zip(
            jax.tree_util.tree_leaves(got), jax.tree_util.tree_leaves(base)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_tri_chunk_auto_policy(monkeypatch):
    """tri_chunk resolution (BENCH_NOTES round 4: every extra streamed
    chunk pays per-(step, chunk) fixed costs — 480/640/960/1920 measured
    5.88/6.30/6.55/7.17 Mrays/s on the 245k-tri scene): auto prefers a
    fully VMEM-resident table (<=1920 clusters = 15 MiB), streams at 960
    beyond it, keeps the mxu option at its historical 480; an explicit
    RAYITO_TRI_CHUNK env pins the value at compile."""
    from rayito_tpu.models.scene import resolve_tri_chunk

    assert resolve_tri_chunk(0, "vpu") == 480  # no meshes: inert default
    assert resolve_tri_chunk(392, "bw_closest") == 480  # stage-6: floor
    assert resolve_tri_chunk(500, "vpu") == 512  # ceil to 32, resident
    assert resolve_tri_chunk(1920, "bw_closest") == 1920  # big: resident
    assert resolve_tri_chunk(1921, "vpu") == 960  # beyond cap: stream
    assert resolve_tri_chunk(1920, "mxu") == 480  # mxu untuned

    monkeypatch.delenv("RAYITO_TRI_CHUNK", raising=False)
    scene = _static_two_mesh_scene(traversal="pallas")
    assert scene.tri_chunk == 480
    monkeypatch.setenv("RAYITO_TRI_CHUNK", "64")
    assert _static_two_mesh_scene(traversal="pallas").tri_chunk == 64


def test_tri_chunk_small_vmem_budget(monkeypatch):
    """The resident/streaming caps are derived from the scoped-VMEM budget,
    not hard-pinned v5e constants (round-4 verdict weak #5): a TPU
    generation with a smaller budget (modeled via RAYITO_VMEM_LIMIT_MB)
    must fall back to streaming AUTOMATICALLY — and still render the same
    image — instead of failing inside Mosaic at kernel compile."""
    from rayito_tpu.models.scene import resolve_tri_chunk

    monkeypatch.delenv("RAYITO_TRI_CHUNK", raising=False)
    monkeypatch.setenv("RAYITO_VMEM_LIMIT_MB", "8")
    # 8 MiB budget: cap = 7 MiB / 8 KiB = 896 clusters
    assert resolve_tri_chunk(896, "vpu") == 896  # still resident
    assert resolve_tri_chunk(1000, "vpu") == 448  # streams at cap/2
    assert resolve_tri_chunk(1920, "bw_closest") == 448
    assert resolve_tri_chunk(896, "mxu") == 224  # 4x-lane table: cap/4
    monkeypatch.setenv("RAYITO_VMEM_LIMIT_MB", "1")  # out of range
    with pytest.raises(ValueError):
        resolve_tri_chunk(100, "vpu")

    # end-to-end: a ~1.25 MiB budget caps the table at 32 clusters, so the
    # 41-cluster grid scene compiles STREAMED (2 chunks) automatically —
    # and renders identically to the default-budget resident compile
    monkeypatch.setenv("RAYITO_VMEM_LIMIT_MB", "1.25")
    small = _grid_mesh_scene()
    assert small.tri_chunk == 32  # cap 32 < 41 clusters -> streams
    monkeypatch.delenv("RAYITO_VMEM_LIMIT_MB")
    base = _grid_mesh_scene()
    assert base.tri_chunk >= small.ktab_tri[0].shape[0]  # resident
    n = 384
    o, d = _random_rays(n, seed=41, aim=(0.0, 0.0, 0.0))
    t = jnp.zeros((n,), jnp.float32)
    tmax = jnp.full((n,), 1e30, jnp.float32)
    got = scene_intersect(small, o, d, t, 1e-4, tmax)
    ref = scene_intersect(base, o, d, t, 1e-4, tmax)
    assert np.asarray(ref.valid).sum() > n // 16
    for a, b in zip(
        jax.tree_util.tree_leaves(got), jax.tree_util.tree_leaves(ref)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_packed_vm_rows_auto_threshold():
    """Auto-packing engages only above the measured 96k-triangle
    crossover (packing LOSES ~1.5% below it — BENCH_NOTES): a synthetic
    >96k-tri grid mesh compiles with a packed table sized ceil(T/4), the
    small two-box scene compiles without one."""
    small = _static_two_mesh_scene(traversal="pallas")
    assert small.tri_vm_packed.shape[0] == 0

    # 224x224 grid -> 2*223*223 = 99,458 triangles
    g = 224
    xs, zs = np.meshgrid(
        np.linspace(-4, 4, g, dtype=np.float32),
        np.linspace(-4, 4, g, dtype=np.float32),
        indexing="ij",
    )
    verts = np.stack(
        [xs, 0.2 * np.sin(xs * 3) * np.cos(zs * 3), zs], -1
    ).reshape(-1, 3)
    q = np.arange(g * g, dtype=np.int32).reshape(g, g)
    a, b_, c, d_ = (
        q[:-1, :-1].ravel(), q[1:, :-1].ravel(),
        q[1:, 1:].ravel(), q[:-1, 1:].ravel(),
    )
    idx = np.concatenate(
        [np.stack([a, b_, c], 1), np.stack([a, c, d_], 1)], 0
    ).astype(np.int32)
    sc = rt.Scene()
    sc.add(rt.TriangleMesh(verts, idx, rt.DiffuseMaterial((0.5, 0.5, 0.5))))
    big = sc.compile(traversal="pallas")
    t = big.n_tris
    assert t > 96 * 1024
    assert big.tri_vm_packed.shape == ((t + 3) // 4, 128)
    # packed scenes drop the padded [T, 32] table (dead HBM); its logical
    # content is vert|meta fused rows — reconstruct and compare
    assert big.tri_vm_rows.shape[0] == 0
    vm = np.concatenate(
        [np.asarray(big.tri_vert_rows), np.asarray(big.tri_meta_rows)], axis=1
    )
    np.testing.assert_array_equal(
        np.asarray(big.tri_vm_packed).reshape(-1)[: t * 32], vm.reshape(-1)
    )
