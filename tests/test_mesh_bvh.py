"""OBJ loader + BVH build/traversal tests.

BVH correctness criterion: the skip-link traversal must return the same
nearest hit as brute force over all triangles, for random rays (SURVEY §4).
Fixture counts from BASELINE.md: bumpy.obj 24,578 v / 24,576 quads → 49,152
fan triangles; cube.obj 6,146 v / 6,144 quads.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

import rayito_tpu as rt
from rayito_tpu.accel.bvh import build_bvh
from rayito_tpu.models.obj import load_obj
from rayito_tpu.ops.intersect import triangle_intersect
from rayito_tpu.ops.vec3 import V3, from_aos

MODELS = "/root/reference/models"
needs_models = pytest.mark.skipif(
    not os.path.isdir(MODELS), reason="reference models not mounted"
)


@needs_models
def test_obj_counts_bumpy():
    m = load_obj(f"{MODELS}/bumpy.obj", rt.DiffuseMaterial((1, 1, 1)))
    assert m.vertices.shape == (24578, 3)
    assert m.indices.shape == (49152, 3)
    assert m.face_ids.max() == 24575


@needs_models
def test_obj_counts_cube():
    m = load_obj(f"{MODELS}/cube.obj", rt.DiffuseMaterial((1, 1, 1)))
    assert m.vertices.shape == (6146, 3)
    assert m.indices.shape == (12288, 3)


def test_obj_index_forms(tmp_path):
    p = tmp_path / "t.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nvn 0 0 1\n"
        "f 1 2 3\n"  # plain
        "f 1/9/1 2/9/1 3/9/1\n"  # v/vt/vn
        "f 1//1 2//1 3//1\n"  # v//vn
        "f -3 -2 -1\n"  # negative from-end
    )
    m = load_obj(str(p), rt.DiffuseMaterial((1, 1, 1)))
    assert m.indices.shape == (4, 3)
    assert (m.indices == np.array([0, 1, 2])).all()
    assert (m.normal_indices[1] == 0).all()
    assert (m.normal_indices[0] == -1).all()


def test_obj_out_of_range_warns(tmp_path, capfd):
    p = tmp_path / "bad.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 9\nf 1 2 3\n")
    m = load_obj(str(p), rt.DiffuseMaterial((1, 1, 1)))
    # capfd captures OS-level fds so both the native (C stderr) and the
    # Python fallback parser warnings are seen
    assert "out of range" in capfd.readouterr().err
    assert m.indices.shape == (1, 3)  # the bad face dropped (only 2 valid verts)


def test_obj_empty_returns_none(tmp_path):
    p = tmp_path / "empty.obj"
    p.write_text("# nothing\no name\n")
    assert load_obj(str(p), rt.DiffuseMaterial((1, 1, 1))) is None


def _random_tris(n, seed=0):
    rs = np.random.default_rng(seed)
    base = rs.uniform(-5, 5, (n, 1, 3))
    tri = base + rs.uniform(-0.8, 0.8, (n, 3, 3))
    return tri[:, 0].astype(np.float32), tri[:, 1].astype(np.float32), tri[
        :, 2
    ].astype(np.float32)


def _brute_force(o, d, v0, v1, v2, tmin=1e-4):
    ov = from_aos(jnp.asarray(o))[:, None]
    dv = from_aos(jnp.asarray(d))[:, None]
    t, hit, *_ = triangle_intersect(
        ov,
        dv,
        tmin,
        jnp.full((o.shape[0], 1), 1e30),
        from_aos(jnp.asarray(v0))[None, :],
        from_aos(jnp.asarray(v1))[None, :],
        from_aos(jnp.asarray(v2))[None, :],
    )
    t = np.asarray(t)
    idx = t.argmin(1)
    tb = t.min(1)
    return tb, np.where(np.isfinite(tb), idx, -1)


def test_bvh_structure_invariants():
    v0, v1, v2 = _random_tris(257)  # odd count exercises median fallback
    bvh = build_bvh(v0, v1, v2)
    n = 257
    m = 2 * n - 1
    assert bvh.prim.shape == (m,)
    assert (bvh.prim >= 0).sum() == n  # exactly n leaves
    assert sorted(bvh.prim[bvh.prim >= 0].tolist()) == list(range(n))
    assert sorted(bvh.prim_order.tolist()) == list(range(n))
    # every node's box contains its leaf triangle (reordered space)
    leaves = bvh.prim >= 0
    li = bvh.prim[leaves]
    lo = np.minimum(np.minimum(v0[bvh.prim_order], v1[bvh.prim_order]), v2[bvh.prim_order])
    hi = np.maximum(np.maximum(v0[bvh.prim_order], v1[bvh.prim_order]), v2[bvh.prim_order])
    assert (bvh.nodes_min[leaves] <= lo[li] + 1e-6).all()
    assert (bvh.nodes_max[leaves] >= hi[li] - 1e-6).all()


def test_cluster_intersect_matches_brute_force():
    """The production cluster traversal must agree with brute force."""
    v0, v1, v2 = _random_tris(700, seed=5)
    rs = np.random.default_rng(6)
    n_rays = 512
    o = rs.uniform(-8, 8, (n_rays, 3)).astype(np.float32)
    d = rs.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    s = rt.Scene()
    s.add(
        rt.TriangleMesh(
            vertices=np.concatenate([v0, v1, v2], 0),
            indices=np.arange(3 * len(v0), dtype=np.int32).reshape(3, -1).T.copy(),
            material=rt.DiffuseMaterial((1, 1, 1)),
        )
    )
    sd = s.compile()
    from rayito_tpu.render.mesh_intersect import mesh_intersect_clusters

    t_cl, prim_cl, beta, gamma, overflow = mesh_intersect_clusters(
        sd, 0, from_aos(jnp.asarray(o)), from_aos(jnp.asarray(d)), 1e-4,
        jnp.full(n_rays, 1e30, jnp.float32),
    )
    assert int(overflow) == 0
    tb, idxb = _brute_force(
        jnp.asarray(o), jnp.asarray(d),
        np.asarray(sd.tri_v0), np.asarray(sd.tri_v1), np.asarray(sd.tri_v2),
    )
    hit_b = idxb >= 0
    assert (hit_b == (np.asarray(prim_cl) >= 0)).all()
    np.testing.assert_allclose(np.asarray(t_cl)[hit_b], tb[hit_b], rtol=1e-5)


@needs_models
def test_cluster_intersect_matches_brute_force_cube():
    m = load_obj(f"{MODELS}/cube.obj", rt.DiffuseMaterial((1, 1, 1)))
    s = rt.Scene()
    s.add(m)
    sd = s.compile()
    rs = np.random.default_rng(7)
    n_rays = 256
    o = rs.normal(size=(n_rays, 3)).astype(np.float32)
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 6.0
    target = rs.uniform(-0.5, 0.5, (n_rays, 3)).astype(np.float32)
    d = target - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    from rayito_tpu.render.mesh_intersect import mesh_intersect_clusters

    t_cl, prim_cl, *_, overflow = mesh_intersect_clusters(
        sd, 0, from_aos(jnp.asarray(o)), from_aos(jnp.asarray(d)), 1e-4,
        jnp.full(n_rays, 1e30, jnp.float32),
    )
    assert int(overflow) == 0
    tb, idxb = _brute_force(
        jnp.asarray(o), jnp.asarray(d),
        np.asarray(sd.tri_v0), np.asarray(sd.tri_v1), np.asarray(sd.tri_v2),
    )
    hit = idxb >= 0
    assert (hit == (np.asarray(prim_cl) >= 0)).all()
    np.testing.assert_allclose(np.asarray(t_cl)[hit], tb[hit], rtol=1e-5)


def test_native_lib_active_and_agrees_with_python():
    """When the C++ library is built (the repo builds it), the native OBJ
    parse and BVH order must agree with the Python implementations."""
    from rayito_tpu.utils import native
    from rayito_tpu.models.obj import load_obj_python

    if not native.is_available():
        pytest.skip("native library not built")
    if not os.path.isdir(MODELS):
        pytest.skip("reference models not mounted")
    m_native = load_obj(f"{MODELS}/cube.obj", rt.DiffuseMaterial((1, 1, 1)))
    m_py = load_obj_python(f"{MODELS}/cube.obj", rt.DiffuseMaterial((1, 1, 1)))
    np.testing.assert_array_equal(m_native.vertices, m_py.vertices)
    np.testing.assert_array_equal(m_native.indices, m_py.indices)
    np.testing.assert_array_equal(m_native.face_ids, m_py.face_ids)

    # BVH order: both must be valid permutations; cluster bounding quality
    # should be comparable (native may tie-break differently)
    v0 = m_py.vertices[m_py.indices[:, 0]]
    v1 = m_py.vertices[m_py.indices[:, 1]]
    v2 = m_py.vertices[m_py.indices[:, 2]]
    order_n = native.bvh_order(v0, v1, v2)
    assert sorted(order_n.tolist()) == list(range(len(v0)))


def test_tiny_fold_matches_brute_force():
    """The per-triangle scalar fold (TPU fast path for tiny meshes —
    mesh_intersect.TINY_TRI_MAX) must agree with the dense brute-force
    block: same hit set / prim ids, t to float tolerance. The fold is
    compile-time gated (SceneData.tiny_fold, TPU-only by default) because
    its fusion plan is shape-dependent on XLA:CPU; here we force both paths
    on the same scene via dataclasses.replace."""
    import dataclasses

    import jax.numpy as jnp

    import rayito_tpu as rt
    from rayito_tpu.models.demo import inline_box_mesh
    from rayito_tpu.ops.vec3 import V3
    from rayito_tpu.render.mesh_intersect import mesh_intersect_clusters

    b = rt.Scene()
    b.add(inline_box_mesh(rt.DiffuseMaterial((0.8, 0.3, 0.1))))
    scene = b.compile()
    rs = np.random.default_rng(7)
    n = 1024
    o = rs.uniform(-3, 3, (n, 3)).astype(np.float32)
    o[:, 2] += 6.0
    tgt = np.asarray([0.5, -1.5, -1.5]) + rs.normal(0, 0.6, (n, 3))
    d = (tgt - o).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ov = V3(*(jnp.asarray(o[:, k]) for k in range(3)))
    dv = V3(*(jnp.asarray(d[:, k]) for k in range(3)))
    tmax = jnp.full((n,), 1e30, jnp.float32)

    t_a, p_a, b_a, g_a, _ = mesh_intersect_clusters(
        dataclasses.replace(scene, tiny_fold=True), 0, ov, dv, 1e-4, tmax
    )
    t_b, p_b, b_b, g_b, _ = mesh_intersect_clusters(
        dataclasses.replace(scene, tiny_fold=False), 0, ov, dv, 1e-4, tmax
    )
    p_a, p_b = np.asarray(p_a), np.asarray(p_b)
    hit = p_b >= 0
    assert hit.sum() > n // 4
    np.testing.assert_array_equal(p_a >= 0, hit)
    np.testing.assert_array_equal(p_a[hit], p_b[hit])
    np.testing.assert_allclose(np.asarray(t_a)[hit], np.asarray(t_b)[hit],
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(b_a)[hit], np.asarray(b_b)[hit],
                               atol=1e-5)
