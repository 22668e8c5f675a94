"""Geometry tables for the fused Pallas traversal kernel.

The Pallas kernel (render/pallas_traverse.py) keeps the ENTIRE mesh geometry
resident in VMEM and wants everything lane-aligned:

  * triangles are grouped into clusters of KTRI = 128 consecutive triangles
    of the global BVH-DFS order (the same order the XLA path's 48-wide
    clusters are cut from, so GLOBAL TRIANGLE IDS ARE IDENTICAL across both
    traversal implementations and tri_meta_rows / the winner re-test are
    shared);
  * each cluster's triangle data is one [KCOMP=16, 128] block: rows 0-8 are
    v0.xyz, e1.xyz, e2.xyz (classic Möller-Trumbore precomputation), rows
    9-15 pad to the f32 sublane multiple so a dynamic cluster index lands on
    an aligned block;
  * cluster AABBs are a [8, C_pad] table (rows 0-5 = min.xyz / max.xyz,
    lanes padded to 128 with never-hit boxes). The table is padded to whole
    KSC=8-cluster groups for dynamic-index alignment only — no
    supercluster-level boxes exist: a supercluster pre-mask provably
    cannot tighten the cluster masks (nested boxes; tools/sc_mask_check.py).

Padding triangles are all-zero (degenerate: e1 = e2 = 0 → det 0 → miss) and
excluded from every box.

One table can merge MANY meshes: for scenes without motion every mesh lives
in world space, so all static meshes concatenate into a single table and one
kernel launch traverses the whole scene's triangle geometry (the role of the
reference's scene-level Bvh<ShapeSet>, RScene.h:135-147). Meshes with keyed
transforms get their own per-mesh table (rays enter in mesh-local space).
"""

from __future__ import annotations

import dataclasses

import numpy as np

KTRI = 128  # triangles per kernel cluster (one [B, 128] MT block)
KSC = 8  # tri-table alignment group (the kernel's dynamic cluster index
# lands on whole-KSC-padded tables; no supercluster BOXES are built — a
# supercluster pre-mask provably cannot tighten the cluster masks, see
# tools/sc_mask_check.py and BENCH_NOTES.md round 3)
KCOMP = 16  # sublane-aligned rows per cluster block (9 used)

INF = np.float32(np.inf)


@dataclasses.dataclass
class KernelTables:
    """Host-side tables for one kernel launch domain (a mesh, or all
    static meshes merged). tri_base maps cluster-local hits back to global
    triangle ids: global = tri_base[cluster] + lane. Per-cluster bases (not
    a single offset) let one table merge meshes that are NOT contiguous in
    the global triangle order."""

    tri: np.ndarray  # [C, KCOMP, 128] f32: v0/e1/e2 component rows
    cl_box: np.ndarray  # [8, C_pad] f32
    root_min: np.ndarray  # [3] f32 whole-domain AABB (wavefront pre-cull)
    root_max: np.ndarray  # [3] f32
    tri_base: np.ndarray  # [C_full] i32 global id of each cluster's lane 0
    # piecewise-affine form of tri_base: ((cl_start, tri0), ...) per merged
    # segment — lets hot paths compute global ids with a short where-chain
    # instead of a [N]-indexed gather
    seg: tuple
    n_clusters: int
    n_supers: int  # KSC-group count (tri-table alignment; no sc boxes —
    # a supercluster pre-mask provably cannot tighten the cluster masks,
    # see tools/sc_mask_check.py)

    @property
    def tri0(self) -> int:
        """Global id of the first triangle (single-segment tables)."""
        return int(self.tri_base[0])


# A degenerate far-away point box. NOT +inf/-inf: the slab test multiplies
# (box - o) by 1/d, and infinities there produce near=-inf/far=+inf — an
# inverted-infinite box HITS every ray. A point at 1e30 gives
# near == far == huge, which max(near, tmin) > min(far, tmax) rejects.
NEVER_HIT = np.float32(1e30)


def _box_table(lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """[K, 3]/[K, 3] -> [8, K_pad] with lanes padded by never-hit boxes.
    Degenerate inputs (lo=+inf from an empty cluster) are replaced too."""
    k = lo.shape[0]
    k_pad = max(128, -(-k // 128) * 128)
    out = np.full((8, k_pad), NEVER_HIT, np.float32)
    out[6:8, :] = 0.0
    bad = ~np.isfinite(lo).all(1) | ~np.isfinite(hi).all(1)
    lo = np.where(bad[:, None], NEVER_HIT, lo.astype(np.float32))
    hi = np.where(bad[:, None], NEVER_HIT, hi.astype(np.float32))
    out[0:3, :k] = lo.T
    out[3:6, :k] = hi.T
    return out


def _segment_clusters(v0, v1, v2, valid, tri0, cuts=None):
    """One segment (a contiguous run of global triangle ids) -> per-cluster
    (tri blocks [c, KCOMP, KTRI], cl_min [c, 3], cl_max [c, 3], base [c]).

    ``cuts`` (optional [n_cuts] i32, increasing, cuts[0] == 0): cluster cut
    STARTS within the segment — each cluster holds rows cuts[k]..cuts[k+1]
    padded to KTRI lanes (every span must be <= KTRI). Without cuts,
    clusters are fixed KTRI-row chunks. Subtree-aligned cuts
    (accel/bvh.py bvh_prim_order_cuts) give tighter per-cluster AABBs at
    the cost of partially-filled lanes; the kernel prices a cluster by its
    slab-hit rate, not its occupancy, so tighter boxes win when they cut
    the hit rate by more than the cluster count grows (measured 10-21%
    fewer MT blocks, tools/cluster_quality_check.py)."""
    f32 = np.float32
    t = v0.shape[0]
    v0 = np.asarray(v0, f32)
    v1 = np.asarray(v1, f32)
    v2 = np.asarray(v2, f32)
    valid = np.asarray(valid, bool)
    if cuts is None:
        c = max(1, -(-t // KTRI))
        starts = np.arange(c, dtype=np.int64) * KTRI
        ends = np.minimum(starts + KTRI, t)
    else:
        cuts = np.asarray(cuts, np.int64)
        # drop cuts that land in the segment's invalid pad tail
        t_real = int(valid.sum()) if valid.size else 0
        # valid rows are a prefix (segment pads are appended); cuts index
        # REAL rows [0, t_real)
        cuts = cuts[cuts < max(t_real, 1)]
        c = max(1, len(cuts))
        starts = cuts if len(cuts) else np.zeros(1, np.int64)
        ends = np.append(starts[1:], t_real)
        if (ends - starts > KTRI).any():
            raise ValueError("cluster cut span exceeds KTRI")

    # gather rows per cluster lane: idx[c, KTRI] with an in-range clamp and
    # an explicit lane-validity mask
    lane = np.arange(KTRI, dtype=np.int64)
    idx = starts[:, None] + lane[None, :]
    lane_ok = idx < ends[:, None]
    idx = np.minimum(idx, max(t - 1, 0))
    validp = valid[idx] & lane_ok if t else np.zeros((c, KTRI), bool)
    v0p = np.where(validp[..., None], v0[idx], 0.0)
    v1p = np.where(validp[..., None], v1[idx], 0.0)
    v2p = np.where(validp[..., None], v2[idx], 0.0)
    e1 = v1p - v0p
    e2 = v2p - v0p

    tri = np.zeros((c, KCOMP, KTRI), f32)
    for comp in range(3):
        tri[:, comp + 0, :] = v0p[:, :, comp]
        tri[:, comp + 3, :] = e1[:, :, comp]
        tri[:, comp + 6, :] = e2[:, :, comp]

    lo = np.minimum(np.minimum(v0p, v1p), v2p)
    hi = np.maximum(np.maximum(v0p, v1p), v2p)
    vmask = validp[..., None]
    cl_min = np.where(vmask, lo, INF).min(1).astype(f32)
    cl_max = np.where(vmask, hi, -INF).max(1).astype(f32)
    base = tri0 + starts
    return tri, cl_min, cl_max, base


def build_kernel_tables_multi(segments) -> KernelTables:
    """Build one launch domain from MANY segments. Each segment is
    (v0 [T,3], v1, v2, valid [T] bool, tri0) with an optional 6th element
    ``cuts`` (subtree-aligned cluster cut starts, see _segment_clusters) —
    triangles already in global order within the segment, padding rows
    included and marked invalid. Segments need not be contiguous with each
    other: tri_base records every cluster's global lane-0 id. Segments with
    cuts disable the piecewise-affine ``seg`` fast path (cluster bases are
    no longer KTRI-strided); winner-id recovery falls back to the tri_base
    gather."""
    f32 = np.float32
    parts = [_segment_clusters(*seg) for seg in segments]
    any_cuts = any(len(seg) > 5 and seg[5] is not None for seg in segments)
    seg_table = []
    off = 0
    for p, s in zip(parts, segments):
        seg_table.append((off, int(s[4])))
        off += p[0].shape[0]
    if any_cuts:
        seg_table = []
    tri_c = np.concatenate([p[0] for p in parts], 0)
    cl_min = np.concatenate([p[1] for p in parts], 0)
    cl_max = np.concatenate([p[2] for p in parts], 0)
    base = np.concatenate([p[3] for p in parts], 0)
    c = tri_c.shape[0]

    s = -(-c // KSC)
    c_full = s * KSC  # tri table padded to whole superclusters so a
    # dynamically-indexed cluster block always exists
    cpad = c_full - c
    tri = np.concatenate(
        [tri_c, np.zeros((cpad, KCOMP, KTRI), f32)], 0
    ) if cpad else tri_c
    tri_base = np.concatenate(
        [base, np.zeros(cpad, np.int64)]
    ).astype(np.int32)

    cl_min_p = np.concatenate([cl_min, np.full((cpad, 3), INF, f32)], 0)
    cl_max_p = np.concatenate([cl_max, np.full((cpad, 3), -INF, f32)], 0)

    any_valid = np.isfinite(cl_min).all(1).any()
    root_min = (
        np.where(np.isfinite(cl_min), cl_min, INF).min(0)
        if any_valid
        else np.full(3, INF, f32)
    )
    root_max = (
        np.where(np.isfinite(cl_max), cl_max, -INF).max(0)
        if any_valid
        else np.full(3, -INF, f32)
    )

    return KernelTables(
        tri=tri,
        cl_box=_box_table(cl_min_p, cl_max_p),
        root_min=root_min.astype(f32),
        root_max=root_max.astype(f32),
        tri_base=tri_base,
        seg=tuple(seg_table),
        n_clusters=c,
        n_supers=s,
    )


def build_kernel_tables(
    v0: np.ndarray, v1: np.ndarray, v2: np.ndarray, valid: np.ndarray,
    tri0: int = 0,
) -> KernelTables:
    """Single-segment convenience wrapper (one mesh)."""
    return build_kernel_tables_multi([(v0, v1, v2, valid, tri0)])


# number of per-ray features the MXU triangle test contracts over:
# [dx dy dz | cx cy cz | ox oy oz | 1] + 6 zero-padding rows to the f32
# sublane tile (the matmul's K dim)
MXU_FEAT = 16


def build_mxu_weights(tri: np.ndarray) -> np.ndarray:
    """Per-cluster MXU weight blocks for the Plücker/plane triangle test.

    ``tri``: [C, KCOMP, 128] (v0/e1/e2 component rows, kernel-table layout).
    Returns [C, MXU_FEAT, 4*KTRI] f32 where, for triangle lane j of cluster
    c, columns j, 128+j, 256+j, 384+j hold the weights producing

        w0 = d·m0 + (o×d)·e0      (edge v1→v2, opposite v0)
        w1 = d·m1 + (o×d)·e1      (edge v2→v0)
        w2 = d·m2 + (o×d)·e2      (edge v0→v1)
        tnum = n·v0 − n·o         (n = m0+m1+m2 = unnormalized 2A·n̂)

    under the feature vector P = [d, o×d, o, 1, 0...]. Identities:
    Σe_i = 0 and Σm_i = n, so the denominator n·d = w0+w1+w2 needs no
    column of its own; t = tnum / (w0+w1+w2), and the inside test is the
    sign-agreement of (w0, w1, w2). Built in f64, stored f32. Degenerate
    (all-zero padding) triangles produce all-zero columns → w_i = 0,
    den = 0 → t = inf/nan → every range compare fails, same as the VPU
    Möller-Trumbore's det == 0 path."""
    c, _, k = tri.shape
    t64 = tri.astype(np.float64)
    a = np.stack([t64[:, 0], t64[:, 1], t64[:, 2]], -1)  # v0 [C,128,3]
    e1 = np.stack([t64[:, 3], t64[:, 4], t64[:, 5]], -1)
    e2 = np.stack([t64[:, 6], t64[:, 7], t64[:, 8]], -1)
    b = a + e1  # v1
    cc = a + e2  # v2
    # line (p -> q): direction q - p, moment p × q
    edges = [
        (cc - b, np.cross(b, cc)),  # L0: v1 -> v2
        (a - cc, np.cross(cc, a)),  # L1: v2 -> v0
        (b - a, np.cross(a, b)),  # L2: v0 -> v1
    ]
    n = edges[0][1] + edges[1][1] + edges[2][1]  # Σm = 2A·n̂
    w = np.zeros((c, MXU_FEAT, 4 * k), np.float64)
    for i, (e, m) in enumerate(edges):
        col = slice(i * k, (i + 1) * k)
        for ax in range(3):
            w[:, 0 + ax, col] = m[:, :, ax]  # d · m
            w[:, 3 + ax, col] = e[:, :, ax]  # (o×d) · e
    col = slice(3 * k, 4 * k)
    for ax in range(3):
        w[:, 6 + ax, col] = -n[:, :, ax]  # −n · o
    w[:, 9, col] = np.einsum("cka,cka->ck", n, a)  # + n · v0
    return w.astype(np.float32)


def build_bw_rows(tri: np.ndarray) -> np.ndarray:
    """Per-cluster rows for the Baldwin–Weber (precomputed plane + affine
    barycentric) VPU triangle test — same [C, KCOMP, 128] layout as the
    Möller-Trumbore table, ~0.6x the per-block vector-op count.

    ``tri``: [C, KCOMP, 128] v0/e1/e2 component rows. Output rows per
    triangle lane:

        0-2  n.xyz       (n = e1 × e2, unnormalized)
        3    d  = n·v0                            (plane equation)
        4-6  ru.xyz = (e2 × n) / (n·n)            (u row of [e1 e2 n]^-1)
        7    ud = -ru·v0
        8-10 rv.xyz = (n × e1) / (n·n)
        11   vd = -rv·v0

    The kernel computes den = n·dir, t = (d − n·o)/den, p = o + t·dir,
    u = ru·p + ud, v = rv·p + vd and the usual inside/range tests.
    Identity: [u, v, w]ᵀ = [e1 e2 n]⁻¹ (p − v0), det([e1 e2 n]) = n·n.

    Degenerate (zero-area or padding) triangles get all-zero rows with
    d = −1: den = 0 and num = −1 make t = −inf, so every range compare
    fails — the same structural-miss path as MT's det == 0. Built in f64,
    stored f32."""
    c, kcomp, k = tri.shape
    t64 = tri.astype(np.float64)
    v0 = np.stack([t64[:, 0], t64[:, 1], t64[:, 2]], -1)  # [C,128,3]
    e1 = np.stack([t64[:, 3], t64[:, 4], t64[:, 5]], -1)
    e2 = np.stack([t64[:, 6], t64[:, 7], t64[:, 8]], -1)
    n = np.cross(e1, e2)
    nn = np.einsum("cka,cka->ck", n, n)
    good = nn > 0.0
    inv = np.where(good, 1.0 / np.where(good, nn, 1.0), 0.0)[..., None]
    ru = np.cross(e2, n) * inv
    rv = np.cross(n, e1) * inv
    out = np.zeros((c, kcomp, k), np.float64)
    for ax in range(3):
        out[:, 0 + ax] = n[:, :, ax]
        out[:, 4 + ax] = ru[:, :, ax]
        out[:, 8 + ax] = rv[:, :, ax]
    out[:, 3] = np.where(good, np.einsum("cka,cka->ck", n, v0), -1.0)
    out[:, 7] = -np.einsum("cka,cka->ck", ru, v0)
    out[:, 11] = -np.einsum("cka,cka->ck", rv, v0)
    out[:, 0:3] *= good[:, None, :]
    return out.astype(np.float32)
