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


def test_kernel_wide_sweep_bit_identical(monkeypatch):
    """The lane-carried ILP width (worklist grouping + the 1-wide tail
    loop for cnt % WIDE) is pure scheduling: W=1 (all-tail sequential),
    W=3 (ragged tails), W=8 must produce BIT-identical (t, prim) to the
    default. Exercises empty worklists, cnt < W, and cnt % W != 0."""
    import jax

    from rayito_tpu.render import pallas_traverse as pt

    centers, v0, v1, v2 = _geometry(500, seed=11)
    rs = np.random.default_rng(12)
    n = 400
    o = (centers.mean(0) + rs.normal(0, 20, (n, 3))).astype(np.float32)
    tgt = centers[rs.integers(0, 500, n)]
    d = (tgt - o).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    tmax = np.full(n, np.inf, np.float32)
    tmax[-60:] = 0.0  # dead lanes: empty worklists
    valid = np.ones(500, bool)
    tbl = _Tbl(build_kernel_tables(v0, v1, v2, valid))
    ov = V3(*(jnp.asarray(o[:, k]) for k in range(3)))
    dv = V3(*(jnp.asarray(d[:, k]) for k in range(3)))

    outs = {}
    # wide is a first-class traverse() knob now (compile-time resolved via
    # SceneData.traverse_wide in production) — no monkeypatching needed
    for w in (1, 3, pt.WIDE, 8):
        t_k, p_k = traverse(
            ov, dv, jnp.asarray(tmax), tbl, 1e-4, interpret=True,
            sort_rays=False, wide=w,
        )
        outs[w] = (np.asarray(t_k), np.asarray(p_k))
    ref_t, ref_p = outs[1]
    assert np.isfinite(ref_t).sum() > 100  # meaningful coverage
    for w, (t_k, p_k) in outs.items():
        np.testing.assert_array_equal(t_k, ref_t, err_msg=f"W={w}")
        np.testing.assert_array_equal(p_k, ref_p, err_msg=f"W={w}")


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


def test_kernel_any_hit_occlusion_semantics():
    """any_hit mode: (prim >= 0) must equal brute-force occlusion for every
    ray, under both sort modes and both prune policies. Lanes freeze on
    their first accepted hit (sign bit set), so the reported prim may be
    ANY occluder, not the nearest — only hit/miss is contracted."""
    import os

    from rayito_tpu.render import pallas_traverse as ptv

    centers, v0, v1, v2 = _geometry(900, seed=11)
    rs = np.random.default_rng(12)
    n = 700
    o = (centers.mean(0) + rs.normal(0, 20, (n, 3))).astype(np.float32)
    tgt = centers[rs.integers(0, 900, n)]
    d = tgt - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = d.astype(np.float32)
    valid = np.ones(900, bool)
    valid[rs.integers(0, 900, 60)] = False
    tmax = rs.uniform(0.5, 60.0, n).astype(np.float32)
    tmax[-40:] = 0.0  # dead (already-occluded) lanes: must stay miss

    v0c, v1c, v2c = v0.copy(), v1.copy(), v2.copy()
    v0c[~valid] = 0
    v1c[~valid] = 0
    v2c[~valid] = 0
    tbl = _Tbl(build_kernel_tables(v0, v1, v2, valid))
    t_b, _ = _brute(o, d, 1e-4, tmax, v0c, v1c, v2c, valid)
    occ_b = np.isfinite(t_b)

    orig = ptv._PRUNE_MODE
    try:
        for prune_mode in ("0", "1"):
            ptv._PRUNE_MODE = prune_mode
            for sort_rays in (False, True):
                _, p_k = traverse(
                    V3(*(jnp.asarray(o[:, k]) for k in range(3))),
                    V3(*(jnp.asarray(d[:, k]) for k in range(3))),
                    jnp.asarray(tmax), tbl, 1e-4, interpret=True,
                    sort_rays=sort_rays, want_t=False, any_hit=True,
                )
                occ_k = np.asarray(p_k) >= 0
                np.testing.assert_array_equal(occ_k, occ_b)
    finally:
        ptv._PRUNE_MODE = orig


def test_kernel_prune_bit_identical_closest_hit():
    """The best-t cluster prune must be EXACT: closest-hit output with
    prune forced on is bit-identical to prune off (same t keys, same
    winning prims)."""
    from rayito_tpu.render import pallas_traverse as ptv

    centers, v0, v1, v2 = _geometry(800, seed=21)
    rs = np.random.default_rng(22)
    n = 500
    o = (centers.mean(0) + rs.normal(0, 15, (n, 3))).astype(np.float32)
    tgt = centers[rs.integers(0, 800, n)]
    d = tgt - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = d.astype(np.float32)
    tmax = np.full(n, np.inf, np.float32)
    tbl = _Tbl(build_kernel_tables(v0, v1, v2, np.ones(800, bool)))

    orig = ptv._PRUNE_MODE
    outs = {}
    try:
        for prune_mode in ("0", "1"):
            ptv._PRUNE_MODE = prune_mode
            t_k, p_k = traverse(
                V3(*(jnp.asarray(o[:, k]) for k in range(3))),
                V3(*(jnp.asarray(d[:, k]) for k in range(3))),
                jnp.asarray(tmax), tbl, 1e-4, interpret=True,
                sort_rays=True,
            )
            outs[prune_mode] = (np.asarray(t_k), np.asarray(p_k))
    finally:
        ptv._PRUNE_MODE = orig
    np.testing.assert_array_equal(outs["0"][0], outs["1"][0])
    np.testing.assert_array_equal(outs["0"][1], outs["1"][1])


def test_kernel_bw_matches_vpu():
    """Baldwin–Weber mode ('bw', accel/kernel_tables.build_bw_rows) vs the
    exact Möller-Trumbore kernel on the same tables: identical hit/miss and
    winners, t within the shared key quantization + the ~1e-6 relative BW
    formulation error (both formulations quantize t to the same 2^-17
    packed-key grid; scene-level callers re-test winners exactly, so only
    winner identity and the accept set are contracted here)."""
    from rayito_tpu.accel.kernel_tables import build_bw_rows

    centers, v0, v1, v2 = _geometry(700, seed=31)
    rs = np.random.default_rng(32)
    n = 600
    o = (centers.mean(0) + rs.normal(0, 25, (n, 3))).astype(np.float32)
    tgt = centers[rs.integers(0, 700, n)]
    d = tgt - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = d.astype(np.float32)
    valid = np.ones(700, bool)
    valid[rs.integers(0, 700, 40)] = False
    tmax = np.full(n, np.inf, np.float32)
    tmax[n // 2 :] = rs.uniform(1.0, 40.0, n - n // 2).astype(np.float32)

    kt = build_kernel_tables(v0, v1, v2, valid)
    tbl_vpu = _Tbl(kt)
    tbl_bw = _Tbl(kt)
    tbl_bw.tri = jnp.asarray(build_bw_rows(kt.tri))

    ov = V3(*(jnp.asarray(o[:, k]) for k in range(3)))
    dv = V3(*(jnp.asarray(d[:, k]) for k in range(3)))
    t_v, p_v = traverse(ov, dv, jnp.asarray(tmax), tbl_vpu, 1e-4,
                        interpret=True, sort_rays=True)
    t_w, p_w = traverse(ov, dv, jnp.asarray(tmax), tbl_bw, 1e-4,
                        interpret=True, sort_rays=True, mt_mode="bw")
    t_v, p_v = np.asarray(t_v), np.asarray(p_v)
    t_w, p_w = np.asarray(t_w), np.asarray(p_w)
    np.testing.assert_array_equal(np.isfinite(t_w), np.isfinite(t_v))
    both = np.isfinite(t_v)
    assert both.sum() > n // 4
    np.testing.assert_array_equal(p_w[both], p_v[both])
    rel = np.abs(t_w[both] - t_v[both]) / np.maximum(t_v[both], 1e-6)
    assert rel.max() < 1e-4


def test_mask_kernel_multi_group_matches_xla():
    """The mask kernel's grouped bit-pack (>1024 clusters: one pack matmul
    per 1024-cluster group, _pack_weights) must produce bit-identical masks
    to the XLA reference packer for a 1920-cluster box table — the big-scene
    regime that used to fall back to XLA slab fusions (~40 ms/frame)."""
    from rayito_tpu.render.pallas_traverse import (
        SB,
        _block_masks,
        _block_masks_pallas,
    )

    rs = np.random.default_rng(7)
    c = 1920  # multiple of 128 (lane-padded table), 2 pack groups
    n_words = -(-c // 32)
    lo = rs.uniform(-20, 19, (3, c)).astype(np.float32)
    box = np.concatenate(
        [lo, lo + rs.uniform(0.1, 2.0, (3, c)).astype(np.float32),
         np.zeros((2, c), np.float32)], axis=0
    )  # [8, C]
    o = rs.uniform(-25, 25, (SB, 3)).astype(np.float32)
    d = rs.normal(size=(SB, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    tmax = np.full(SB, np.inf, np.float32)
    tmax[SB // 2 :] = rs.uniform(1, 50, SB - SB // 2).astype(np.float32)
    tmax[:64] = 0.0  # dead lanes: structurally empty mask rows

    soat = jnp.asarray(
        np.concatenate(
            [o, d, tmax[:, None], np.zeros((SB, 1), np.float32)], axis=1
        )
    ).reshape(1, SB, 8)
    m_xla = np.asarray(_block_masks(
        *(jnp.asarray(o[:, k]) for k in range(3)),
        *(1.0 / jnp.asarray(d[:, k]) for k in range(3)),
        1e-4, jnp.asarray(tmax), jnp.asarray(box), SB // 128,
    ))
    for gate in (0, 1024, 256, 128):
        m_pallas = np.asarray(_block_masks_pallas(
            soat, jnp.asarray(box), 1e-4, n_words, True, gate=gate
        ))
        assert m_pallas.shape == m_xla.shape == (SB // 128, n_words)
        np.testing.assert_array_equal(m_pallas, m_xla)
        assert m_pallas.any()  # the scene actually produces candidates


def test_mask_kernel_three_groups_gated_matches_xla():
    """>=3 pack groups (c_pad > 2048) with the unit gate ON — the
    big-scene-with-subtree-cuts regime (2712 clusters). The gated
    accumulation must go through the VMEM scratch at static offsets: the
    previous out_ref read-modify-write form needed a dynamic-sublane load
    at 64-column offsets that land mid-lane-tile for >2 groups, which
    Mosaic rejects at COMPILE time ("dynamic load with unaligned
    indices") — so this configuration could never run on hardware.
    Interpret mode pins the semantics; bit-identity on hardware is
    asserted by every frame_ab warmup."""
    from rayito_tpu.render.pallas_traverse import (
        SB,
        _block_masks,
        _block_masks_pallas,
    )

    rs = np.random.default_rng(23)
    c = 2816  # 128-multiple, 3 pack groups (1024+1024+768 lanes)
    n_real = 2712
    n_words = -(-c // 32)
    lo = rs.uniform(-20, 19, (3, c)).astype(np.float32)
    # push the tail of group 2 far away so some units gate off
    lo[1, 2048:] += 400.0
    box = np.concatenate(
        [lo, lo + rs.uniform(0.1, 2.0, (3, c)).astype(np.float32),
         np.zeros((2, c), np.float32)], axis=0
    )
    box[0:6, n_real:] = 1e30  # lane pads inside the last unit
    o = rs.uniform(-25, 25, (SB, 3)).astype(np.float32)
    d = rs.normal(size=(SB, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    tmax = np.full(SB, np.inf, np.float32)
    tmax[:64] = 0.0  # dead lanes
    soat = jnp.asarray(
        np.concatenate(
            [o, d, tmax[:, None], np.zeros((SB, 1), np.float32)], axis=1
        )
    ).reshape(1, SB, 8)
    m_xla = np.asarray(_block_masks(
        *(jnp.asarray(o[:, k]) for k in range(3)),
        *(1.0 / jnp.asarray(d[:, k]) for k in range(3)),
        1e-4, jnp.asarray(tmax), jnp.asarray(box), SB // 128,
    ))
    for gate in (0, 1024, 512):
        m_pallas = np.asarray(_block_masks_pallas(
            soat, jnp.asarray(box), 1e-4, n_words, True, gate=gate
        ))
        assert m_pallas.shape == m_xla.shape == (SB // 128, n_words)
        np.testing.assert_array_equal(m_pallas, m_xla)
        assert m_pallas.any()


def test_mask_gate_skips_disjoint_groups_exactly():
    """Group-root gate on spatially-disjoint groups: rays aimed only at
    group 0's region must produce bit-identical masks with the gate on
    (group 1's slab is skipped and its words written as zeros) — and the
    gate must also match when lane pads (1e30 point boxes) fill part of
    group 1, exercising the root-union pad masking."""
    from rayito_tpu.render.pallas_traverse import (
        SB,
        _block_masks,
        _block_masks_pallas,
    )

    rs = np.random.default_rng(11)
    c = 1152  # 2 pack groups: 1024 + 128 real lanes
    n_words = -(-c // 32)
    lo = rs.uniform(-10, 9, (3, c)).astype(np.float32)
    lo[0, 1024:] += 500.0  # group 1 lives far away on +x
    box = np.concatenate(
        [lo, lo + rs.uniform(0.1, 2.0, (3, c)).astype(np.float32),
         np.zeros((2, c), np.float32)], axis=0
    )
    # half the lanes of group 1's band are pads (never-hit point boxes)
    box[0:6, 1088:] = 1e30
    o = rs.uniform(-15, 15, (SB, 3)).astype(np.float32)
    o[:, 0] -= 40.0  # west of group 0, far from group 1
    tgt = np.stack([lo[k, rs.integers(0, 1024, SB)] for k in range(3)], 1)
    d = (tgt - o).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    tmax = np.full(SB, np.inf, np.float32)
    soat = jnp.asarray(
        np.concatenate(
            [o, d, tmax[:, None], np.zeros((SB, 1), np.float32)], axis=1
        )
    ).reshape(1, SB, 8)
    m_off = np.asarray(_block_masks_pallas(
        soat, jnp.asarray(box), 1e-4, n_words, True, gate=0
    ))
    m_xla = np.asarray(_block_masks(
        *(jnp.asarray(o[:, k]) for k in range(3)),
        *(1.0 / jnp.asarray(d[:, k]) for k in range(3)),
        1e-4, jnp.asarray(tmax), jnp.asarray(box), SB // 128,
    ))
    np.testing.assert_array_equal(m_off, m_xla)
    for unit in (1024, 512, 256):
        m_on = np.asarray(_block_masks_pallas(
            soat, jnp.asarray(box), 1e-4, n_words, True, gate=unit
        ))
        np.testing.assert_array_equal(m_on, m_xla)
        assert m_on[:, :32].any()        # group 0 really has candidates
        assert not m_on[:, 32:].any()    # group 1 fully skipped -> zeros


def test_mask_gate_single_group_sub_units():
    """Sub-group unit gate on a SINGLE-pack-group scene (stage-6 regime:
    392 real clusters -> c_pad 512 < 1024). Units 128/256 must be
    bit-identical to the ungated kernel, including when rays only reach
    the first unit's region (later unit slabs skipped, partials absent
    from the accumulated halves). gate=1024 has one unit here and must
    resolve to the identical ungated kernel."""
    from rayito_tpu.render.pallas_traverse import (
        SB,
        _block_masks,
        _block_masks_pallas,
    )

    rs = np.random.default_rng(13)
    c = 512  # one pack group, lane-padded 128-multiple
    n_real = 392
    n_words = -(-c // 32)
    lo = rs.uniform(-10, 9, (3, c)).astype(np.float32)
    # units 1-3 far north (+y), off the rays' west->east travel axis
    lo[1, 128:] += 300.0 + 50.0 * (np.arange(c - 128) // 128)
    box = np.concatenate(
        [lo, lo + rs.uniform(0.1, 2.0, (3, c)).astype(np.float32),
         np.zeros((2, c), np.float32)], axis=0
    )
    box[0:6, n_real:] = 1e30  # lane pads inside unit 3
    o = rs.uniform(-15, 15, (SB, 3)).astype(np.float32)
    o[:, 0] -= 40.0
    tgt = np.stack([lo[k, rs.integers(0, 128, SB)] for k in range(3)], 1)
    d = (tgt - o).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    tmax = np.full(SB, np.inf, np.float32)
    soat = jnp.asarray(
        np.concatenate(
            [o, d, tmax[:, None], np.zeros((SB, 1), np.float32)], axis=1
        )
    ).reshape(1, SB, 8)
    m_xla = np.asarray(_block_masks(
        *(jnp.asarray(o[:, k]) for k in range(3)),
        *(1.0 / jnp.asarray(d[:, k]) for k in range(3)),
        1e-4, jnp.asarray(tmax), jnp.asarray(box), SB // 128,
    ))
    for unit in (0, 1024, 256, 128):
        m = np.asarray(_block_masks_pallas(
            soat, jnp.asarray(box), 1e-4, n_words, True, gate=unit
        ))
        np.testing.assert_array_equal(m, m_xla)
    assert m_xla[:, :4].any()      # unit 0 really has candidates
    assert not m_xla[:, 4:].any()  # units 1-3 skippable -> zeros


def test_items_grid_bit_identical(monkeypatch):
    """The experimental item-grid traversal (worklist-as-grid with
    scalar-prefetch index maps, RAYITO_TRAVERSE_ITEMS) must produce
    BIT-identical (t, prim) to the scan kernel — same ascending-cluster
    strict-< fold, pad items duplicate the block's last real cluster
    (idempotent), unvisited blocks gated to miss. Exercises dead lanes
    (empty blocks), cnt % W pads, both sort modes, and the interpret-mode
    static grid."""
    import jax

    from rayito_tpu.render import pallas_traverse as pt

    centers, v0, v1, v2 = _geometry(500, seed=21)
    rs = np.random.default_rng(22)
    n = 400
    o = (centers.mean(0) + rs.normal(0, 20, (n, 3))).astype(np.float32)
    tgt = centers[rs.integers(0, 500, n)]
    d = (tgt - o).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    tmax = np.full(n, np.inf, np.float32)
    tmax[-60:] = 0.0  # dead lanes -> empty item blocks
    valid = np.ones(500, bool)
    tbl = _Tbl(build_kernel_tables(v0, v1, v2, valid))
    ov = V3(*(jnp.asarray(o[:, k]) for k in range(3)))
    dv = V3(*(jnp.asarray(d[:, k]) for k in range(3)))

    monkeypatch.setattr(pt, "ITEMS_MAX", 2048)
    monkeypatch.setattr(pt, "ITEMS_CAP", 16)
    try:
        for sort_rays in (False, True):
            t_s, p_s = traverse(
                ov, dv, jnp.asarray(tmax), tbl, 1e-4, interpret=True,
                sort_rays=sort_rays, items=False,
            )
            t_i, p_i = traverse(
                ov, dv, jnp.asarray(tmax), tbl, 1e-4, interpret=True,
                sort_rays=sort_rays, items=True,
            )
            assert np.isfinite(np.asarray(t_s)).sum() > 100
            np.testing.assert_array_equal(np.asarray(t_i), np.asarray(t_s))
            np.testing.assert_array_equal(np.asarray(p_i), np.asarray(p_s))
    finally:
        monkeypatch.undo()
        jax.clear_caches()


def test_items_overflow_falls_back_to_scan_kernel(monkeypatch):
    """An item list beyond ITEMS_MAX / per-block ITEMS_CAP must NOT be
    silently truncated (round-3 advisor, medium): the overflow flag routes
    the launch through a lax.cond to the scan kernel, so results stay
    bit-identical to items=False even when the budget is absurdly small."""
    from rayito_tpu.render import pallas_traverse as pt

    centers, v0, v1, v2 = _geometry(500, seed=21)
    rs = np.random.default_rng(22)
    n = 400
    o = (centers.mean(0) + rs.normal(0, 20, (n, 3))).astype(np.float32)
    tgt = centers[rs.integers(0, 500, n)]
    d = (tgt - o).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    tmax = np.full(n, np.inf, np.float32)
    valid = np.ones(500, bool)
    tbl = _Tbl(build_kernel_tables(v0, v1, v2, valid))
    ov = V3(*(jnp.asarray(o[:, k]) for k in range(3)))
    dv = V3(*(jnp.asarray(d[:, k]) for k in range(3)))

    # a 8-item budget is overflowed by any real launch here
    monkeypatch.setattr(pt, "ITEMS_MAX", 8)
    monkeypatch.setattr(pt, "ITEMS_CAP", 4)
    t_s, p_s = traverse(
        ov, dv, jnp.asarray(tmax), tbl, 1e-4, interpret=True,
        sort_rays=False, items=False,
    )
    t_i, p_i = traverse(
        ov, dv, jnp.asarray(tmax), tbl, 1e-4, interpret=True,
        sort_rays=False, items=True,
    )
    assert np.isfinite(np.asarray(t_s)).sum() > 100
    np.testing.assert_array_equal(np.asarray(t_i), np.asarray(t_s))
    np.testing.assert_array_equal(np.asarray(p_i), np.asarray(p_s))


def test_items_build_overflow_and_alignment():
    """_build_items invariants: per-block runs are ascending and W-aligned
    (pads duplicate the last real cluster), the grid bound is CLAMPED to
    the prefetch array on overflow (reads past it crash the backend), and
    block_used marks exactly the blocks with any mask bit."""
    from rayito_tpu.render.pallas_traverse import _CIDBITS, _build_items

    w = 4
    masks = np.zeros((3, 2), np.int32)
    masks[0, 0] = 0b1011  # clusters 0, 1, 3 -> pad to 4 (dup 3)
    masks[2, 1] = 1 << 5  # cluster 37 -> pad to 4 (dup x3)
    items, n_steps, overflow, used = (
        np.asarray(x) for x in _build_items(jnp.asarray(masks), w, 64, 8)
    )
    assert not overflow and int(n_steps) == 2
    got = [(x >> _CIDBITS, x & ((1 << _CIDBITS) - 1)) for x in items[:8]]
    assert got == [(0, 0), (0, 1), (0, 3), (0, 3),
                   (2, 37), (2, 37), (2, 37), (2, 37)]
    assert (items[8:] == -1).all()
    np.testing.assert_array_equal(used, [True, False, True])

    # overflow: total beyond maxitems clamps the grid, flags overflow
    dense = np.full((4, 2), -1, np.int32)  # 64 bits set per block
    items, n_steps, overflow, used = (
        np.asarray(x) for x in _build_items(jnp.asarray(dense), w, 128, 64)
    )
    assert bool(overflow) and int(n_steps) == 128 // w
    # per-block CAP breach also flags
    _, _, overflow, _ = _build_items(jnp.asarray(dense), w, 1024, 8)
    assert bool(overflow)


def test_fused_sort_bit_identical():
    """fuse_sort carries the ray columns through the coherence sort as
    extra sort operands instead of sort-then-row-gather; outputs must be
    bit-identical to the gather form (same perm: the packed key embeds
    the lane id, and lax.sort is stable either way)."""
    centers, v0, v1, v2 = _geometry(300, seed=21)
    rs = np.random.default_rng(22)
    n = 500
    o = (centers.mean(0) + rs.normal(0, 20, (n, 3))).astype(np.float32)
    tgt = centers[rs.integers(0, 300, n)]
    d = (tgt - o).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    valid = np.ones(300, bool)
    tbl = _Tbl(build_kernel_tables(v0, v1, v2, valid))
    tmax = jnp.full((n,), jnp.inf)
    args = (
        V3(*(jnp.asarray(o[:, k]) for k in range(3))),
        V3(*(jnp.asarray(d[:, k]) for k in range(3))),
        tmax, tbl, 1e-4,
    )
    for any_hit in (False, True):
        t_g, p_g = traverse(*args, interpret=True, sort_rays=True,
                            fuse_sort=False, any_hit=any_hit)
        t_f, p_f = traverse(*args, interpret=True, sort_rays=True,
                            fuse_sort=True, any_hit=any_hit)
        np.testing.assert_array_equal(np.asarray(p_g), np.asarray(p_f))
        np.testing.assert_array_equal(np.asarray(t_g), np.asarray(t_f))


def test_gather_chunks_bit_identical():
    """The chunked live-prefix row gather (gather_chunks) is pure perf:
    step-aligned gather chunks wholly past the live prefix are skipped
    behind lax.cond, so (t, prim) must be BIT-identical to the monolithic
    soa8[perm] gather — including with a large dead tail (tmax=0 lanes,
    which sort past the live prefix and land in skipped chunks) and for
    both closest-hit and any-hit launches."""
    centers, v0, v1, v2 = _geometry(400, seed=31)
    rs = np.random.default_rng(32)
    n = 2048  # sb=256 -> 8 steps: divisible by gather_chunks=4
    o = (centers.mean(0) + rs.normal(0, 20, (n, 3))).astype(np.float32)
    tgt = centers[rs.integers(0, 400, n)]
    d = (tgt - o).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    tmax = np.full(n, np.inf, np.float32)
    tmax[n // 3 :] = 0.0  # dead tail: 2/3 of lanes sort past the prefix
    tbl = _Tbl(build_kernel_tables(v0, v1, v2, np.ones(400, bool)))
    args = (
        V3(*(jnp.asarray(o[:, k]) for k in range(3))),
        V3(*(jnp.asarray(d[:, k]) for k in range(3))),
        jnp.asarray(tmax), tbl, 1e-4,
    )
    for any_hit in (False, True):
        t_m, p_m = traverse(*args, interpret=True, sort_rays=True,
                            live_prefix=True, sb=256, gather_chunks=0,
                            any_hit=any_hit)
        # +4 = chunked (default form), -4 = the hybrid monolithic-fallback
        # variant (measured loss, kept as an option); both must be
        # bit-identical to the monolithic gather
        for gcv in (4, -4):
            t_c, p_c = traverse(*args, interpret=True, sort_rays=True,
                                live_prefix=True, sb=256, gather_chunks=gcv,
                                any_hit=any_hit)
            np.testing.assert_array_equal(np.asarray(p_m), np.asarray(p_c))
            if t_m is not None:
                np.testing.assert_array_equal(
                    np.asarray(t_m), np.asarray(t_c))
    # fully-live wavefront: every chunk runs, still identical
    tmax2 = jnp.full((n,), jnp.inf)
    t_m, p_m = traverse(args[0], args[1], tmax2, tbl, 1e-4, interpret=True,
                        sort_rays=True, live_prefix=True, sb=256,
                        gather_chunks=0)
    t_c, p_c = traverse(args[0], args[1], tmax2, tbl, 1e-4, interpret=True,
                        sort_rays=True, live_prefix=True, sb=256,
                        gather_chunks=4)
    np.testing.assert_array_equal(np.asarray(p_m), np.asarray(p_c))
    np.testing.assert_array_equal(np.asarray(t_m), np.asarray(t_c))
