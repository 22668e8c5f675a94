"""Fused Pallas traversal kernel vs brute force (interpreter mode on CPU).

The kernel (render/pallas_traverse.py) must find the same hits as a dense
numpy Möller-Trumbore over every triangle: same hit/miss per ray, same
winning primitive, t within the documented ~2^-17 key-packing slack.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from rayito_tpu.accel.kernel_tables import build_kernel_tables
from rayito_tpu.render.pallas_traverse import traverse
from rayito_tpu.ops.vec3 import V3


class _Tbl:
    def __init__(self, kt):
        self.cl_box = jnp.asarray(kt.cl_box)
        self.tri = jnp.asarray(kt.tri)
        self.n_supers = kt.n_supers


def _brute(o, d, tmin, tmax, v0, v1, v2, valid):
    e1 = v1 - v0
    e2 = v2 - v0
    p = np.cross(d[:, None, :], e2[None])
    det = np.einsum("tk,ntk->nt", e1, p)
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = 1.0 / det
        tv = o[:, None, :] - v0[None]
        u = np.einsum("ntk,ntk->nt", tv, p) * inv
        q = np.cross(tv, e1[None])
        v = np.einsum(
            "ntk,ntk->nt", np.broadcast_to(d[:, None, :], q.shape), q
        ) * inv
        t = np.einsum("tk,ntk->nt", e2, q) * inv
    ok = (
        (det != 0) & (u >= 0) & (v >= 0) & (u + v <= 1)
        & (t >= tmin) & (t < tmax[:, None]) & valid[None]
    )
    t = np.where(ok, t, np.inf)
    tb = t.min(1)
    return tb, np.where(np.isfinite(tb), t.argmin(1), -1)


def _geometry(n_tris, seed, spread=0.3):
    rs = np.random.default_rng(seed)
    centers = np.cumsum(rs.normal(0, 0.3, (n_tris, 3)), 0).astype(np.float32)
    v0 = centers + rs.normal(0, spread, (n_tris, 3)).astype(np.float32)
    v1 = centers + rs.normal(0, spread, (n_tris, 3)).astype(np.float32)
    v2 = centers + rs.normal(0, spread, (n_tris, 3)).astype(np.float32)
    return centers, v0, v1, v2


def _check(o, d, tmax, v0, v1, v2, valid, tmin=1e-4):
    v0c, v1c, v2c = v0.copy(), v1.copy(), v2.copy()
    v0c[~valid] = 0
    v1c[~valid] = 0
    v2c[~valid] = 0
    tbl = _Tbl(build_kernel_tables(v0, v1, v2, valid))
    t_b, p_b = _brute(o, d, tmin, tmax, v0c, v1c, v2c, valid)
    both = None
    # sort_rays permutes + inverse-permutes: output must be identical
    for sort_rays in (False, True):
        t_k, p_k = traverse(
            V3(*(jnp.asarray(o[:, k]) for k in range(3))),
            V3(*(jnp.asarray(d[:, k]) for k in range(3))),
            jnp.asarray(tmax), tbl, tmin, interpret=True,
            sort_rays=sort_rays,
        )
        t_k, p_k = np.asarray(t_k), np.asarray(p_k)
        np.testing.assert_array_equal(np.isfinite(t_k), np.isfinite(t_b))
        both = np.isfinite(t_k)
        if both.any():
            rel = np.abs(t_k[both] - t_b[both]) / np.maximum(t_b[both], 1e-6)
            assert rel.max() < 1e-4  # key-packing slack is 2^-17
            np.testing.assert_array_equal(p_k[both], p_b[both])
    return int(both.sum())


def test_kernel_matches_brute_force_aimed():
    centers, v0, v1, v2 = _geometry(700, seed=7)
    rs = np.random.default_rng(8)
    n = 600
    o = (centers.mean(0) + rs.normal(0, 25, (n, 3))).astype(np.float32)
    tgt = centers[rs.integers(0, 700, n)]
    d = tgt - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    valid = np.ones(700, bool)
    valid[rs.integers(0, 700, 40)] = False
    tmax = np.full(n, np.inf, np.float32)
    tmax[n // 2 :] = rs.uniform(1.0, 40.0, n - n // 2).astype(np.float32)
    hits = _check(o, d.astype(np.float32), tmax, v0, v1, v2, valid)
    assert hits > n // 4  # aimed rays: meaningful coverage


def test_kernel_axis_aligned_and_misses():
    centers, v0, v1, v2 = _geometry(300, seed=3)
    rs = np.random.default_rng(4)
    n = 300
    o = rs.uniform(-10, 10, (n, 3)).astype(np.float32)
    d = rs.normal(size=(n, 3)).astype(np.float32)
    d[:40, 0] = 0.0  # axis-aligned rays: zero direction components
    d[40:60, :2] = 0.0
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    tmax = np.full(n, np.inf, np.float32)
    tmax[-50:] = 0.0  # dead lanes (occluded): must produce no hits, no NaN
    _check(o, d, tmax, v0, v1, v2, np.ones(300, bool))


def test_kernel_single_triangle_and_padding():
    v0 = np.array([[0.0, 0.0, 5.0]], np.float32)
    v1 = np.array([[1.0, 0.0, 5.0]], np.float32)
    v2 = np.array([[0.0, 1.0, 5.0]], np.float32)
    n = 64
    o = np.zeros((n, 3), np.float32)
    o[:, 0] = np.linspace(0, 1.2, n)
    o[:, 1] = 0.2
    d = np.zeros((n, 3), np.float32)
    d[:, 2] = 1.0
    tmax = np.full(n, np.inf, np.float32)
    hits = _check(o, d, tmax, v0, v1, v2, np.ones(1, bool))
    assert hits > 0
