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
    lanes padded to 128 with never-hit boxes); superclusters group
    KSC = 8 consecutive clusters with the same [8, S_pad] layout.

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
KSC = 8  # clusters per supercluster (guard granularity: 1024 tris)
KCOMP = 16  # sublane-aligned rows per cluster block (9 used)

INF = np.float32(np.inf)


@dataclasses.dataclass
class KernelTables:
    """Host-side tables for one kernel launch domain (a mesh, or all
    static meshes merged). tri0 maps cluster-local hits back to global
    triangle ids: global = tri0 + cluster * KTRI + lane."""

    tri: np.ndarray  # [C, KCOMP, 128] f32: v0/e1/e2 component rows
    cl_box: np.ndarray  # [8, C_pad] f32
    sc_box: np.ndarray  # [8, S_pad] f32
    root_min: np.ndarray  # [3] f32 whole-domain AABB (wavefront pre-cull)
    root_max: np.ndarray  # [3] f32
    n_clusters: int
    n_supers: int
    tri0: int  # global id of this table's first triangle


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


def build_kernel_tables(
    v0: np.ndarray, v1: np.ndarray, v2: np.ndarray, valid: np.ndarray,
    tri0: int = 0,
) -> KernelTables:
    """Build from triangles ALREADY in global order (padding rows included,
    marked invalid). v*: [T, 3] f32; valid: [T] bool; tri0: global id of
    row 0."""
    f32 = np.float32
    t = v0.shape[0]
    c = max(1, -(-t // KTRI))
    tp = c * KTRI
    pad = tp - t

    def padded(a):
        a = np.asarray(a, f32)
        if pad:
            return np.concatenate([a, np.zeros((pad, 3), f32)], 0)
        return a

    v0p, v1p, v2p = padded(v0), padded(v1), padded(v2)
    validp = np.concatenate([np.asarray(valid, bool), np.zeros(pad, bool)])
    # degenerate-out invalid rows so they can never produce a hit
    v0p[~validp] = 0.0
    v1p[~validp] = 0.0
    v2p[~validp] = 0.0
    e1 = v1p - v0p
    e2 = v2p - v0p

    s = -(-c // KSC)
    c_full = s * KSC  # tri table padded to whole superclusters so a
    # dynamically-indexed cluster block always exists
    tri = np.zeros((c_full, KCOMP, KTRI), f32)
    for comp in range(3):
        tri[:c, comp + 0, :] = v0p[:, comp].reshape(c, KTRI)
        tri[:c, comp + 3, :] = e1[:, comp].reshape(c, KTRI)
        tri[:c, comp + 6, :] = e2[:, comp].reshape(c, KTRI)

    lo = np.minimum(np.minimum(v0p, v1p), v2p).reshape(c, KTRI, 3)
    hi = np.maximum(np.maximum(v0p, v1p), v2p).reshape(c, KTRI, 3)
    vmask = validp.reshape(c, KTRI, 1)
    cl_min = np.where(vmask, lo, INF).min(1).astype(f32)
    cl_max = np.where(vmask, hi, -INF).max(1).astype(f32)

    cpad = c_full - c
    cl_min_p = np.concatenate([cl_min, np.full((cpad, 3), INF, f32)], 0)
    cl_max_p = np.concatenate([cl_max, np.full((cpad, 3), -INF, f32)], 0)
    # supercluster box over real children only (inf rows are stripped by
    # _box_table per-cluster; strip here with nan-safe reductions)
    grp_min = cl_min_p.reshape(s, KSC, 3)
    grp_max = cl_max_p.reshape(s, KSC, 3)
    sc_min = np.where(np.isfinite(grp_min), grp_min, INF).min(1)
    sc_max = np.where(np.isfinite(grp_max), grp_max, -INF).max(1)

    any_valid = validp.any()
    root_min = cl_min.min(0) if any_valid else np.full(3, INF, f32)
    root_max = cl_max.max(0) if any_valid else np.full(3, -INF, f32)

    return KernelTables(
        tri=tri,
        cl_box=_box_table(cl_min_p, cl_max_p),
        sc_box=_box_table(sc_min, sc_max),
        root_min=root_min.astype(f32),
        root_max=root_max.astype(f32),
        n_clusters=c,
        n_supers=s,
        tri0=tri0,
    )
