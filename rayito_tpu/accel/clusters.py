"""Triangle clustering for the TPU wavefront mesh intersector.

The skip-link BVH walk (accel/bvh.py) is correct but pointer-chasing is the
one thing a TPU cannot do fast: a lock-step while_loop pays the WORST lane's
path length on every lane, with a serial dependency per step. Measured on
real hardware it runs ~0.1 Mrays/s, while dense slab/triangle tests run at
28-45 Gtests/s and gathers at 240-310 GB/s. So the device-side structure is
re-shaped into something rank-uniform:

  * triangles are reordered by the BVH's DFS order (spatially coherent runs)
    and cut into fixed-size CLUSTERS of TRI_PER_CLUSTER consecutive
    triangles (padded with degenerate tris), each with an AABB;
  * clusters are grouped 16-at-a-time into SUPERCLUSTERS with their own
    AABBs (a fixed-arity, fixed-depth 2-level tree).

Device traversal (render/mesh_intersect.py) is then three dense phases:
dense ray×supercluster slab tests → children expansion → compacted
(ray, cluster) pair processing with one 48-triangle Möller-Trumbore block
per pair. No per-lane loops, no stacks; every op is a big rectangular
VPU/gather op. This is the reference Bvh<T>'s *role* (RAccel.h:194-560)
re-derived for the TPU execution model.
"""

from __future__ import annotations

import dataclasses

import numpy as np

TRI_PER_CLUSTER = 48
CLUSTERS_PER_SUPER = 16


SC_ROW_WIDTH = 128  # 6*16 children box floats + padding, lane-aligned
TRI_ROW_WIDTH = 512  # 9*48 triangle floats (SoA within the row) + padding


@dataclasses.dataclass
class MeshClusters:
    """Host-side cluster tables for one mesh (triangles already reordered)."""

    v0: np.ndarray  # [Tp, 3] padded reordered triangles
    v1: np.ndarray
    v2: np.ndarray
    pad_mask: np.ndarray  # [Tp] True for real triangles
    cl_min: np.ndarray  # [C, 3]
    cl_max: np.ndarray  # [C, 3]
    sc_min: np.ndarray  # [S, 3]
    sc_max: np.ndarray  # [S, 3]
    sc_rows: np.ndarray  # [S, 128]: children boxes packed per supercluster
    tri_rows: np.ndarray  # [C, 512]: 48 triangles packed SoA-in-row per cluster
    n_clusters: int
    n_supers: int


def build_clusters(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray) -> MeshClusters:
    """Cluster triangles that are ALREADY in BVH-DFS order."""
    f32 = np.float32
    t = v0.shape[0]
    c = max(1, -(-t // TRI_PER_CLUSTER))
    tp = c * TRI_PER_CLUSTER
    pad = tp - t

    def padded(a):
        if pad:
            return np.concatenate([a, np.zeros((pad, 3), f32)], 0).astype(f32)
        return a.astype(f32)

    v0p, v1p, v2p = padded(v0), padded(v1), padded(v2)
    pad_mask = np.arange(tp) < t

    lo = np.minimum(np.minimum(v0p, v1p), v2p).reshape(c, TRI_PER_CLUSTER, 3)
    hi = np.maximum(np.maximum(v0p, v1p), v2p).reshape(c, TRI_PER_CLUSTER, 3)
    # padded (degenerate, all-zero) triangles must not inflate boxes
    valid = pad_mask.reshape(c, TRI_PER_CLUSTER, 1)
    cl_min = np.where(valid, lo, np.inf).min(1).astype(f32)
    cl_max = np.where(valid, hi, -np.inf).max(1).astype(f32)

    s = -(-c // CLUSTERS_PER_SUPER)
    cpad = s * CLUSTERS_PER_SUPER - c
    cl_min_p = np.concatenate([cl_min, np.full((cpad, 3), np.inf, f32)], 0)
    cl_max_p = np.concatenate([cl_max, np.full((cpad, 3), -np.inf, f32)], 0)
    sc_min = cl_min_p.reshape(s, CLUSTERS_PER_SUPER, 3).min(1).astype(f32)
    sc_max = cl_max_p.reshape(s, CLUSTERS_PER_SUPER, 3).max(1).astype(f32)

    # --- packed ROW tables (the device gather format): TPU gathers are fast
    # only for whole rows of 2-D, lane-aligned tables (measured ~140x vs
    # per-element 1-D gathers), so each supercluster packs its 16 children's
    # boxes into one 128-float row and each cluster packs its 48 triangles
    # into one 512-float row, components grouped SoA within the row.
    sc_rows = np.zeros((s, SC_ROW_WIDTH), f32)
    kids_min = cl_min_p.reshape(s, CLUSTERS_PER_SUPER, 3)
    kids_max = cl_max_p.reshape(s, CLUSTERS_PER_SUPER, 3)
    for comp in range(3):
        sc_rows[:, comp * 16 : (comp + 1) * 16] = kids_min[:, :, comp]
        sc_rows[:, 48 + comp * 16 : 48 + (comp + 1) * 16] = kids_max[:, :, comp]

    tri_rows = np.zeros((c, TRI_ROW_WIDTH), f32)
    verts = (v0p, v1p, v2p)
    for vi in range(3):
        for comp in range(3):
            col = (vi * 3 + comp) * TRI_PER_CLUSTER
            tri_rows[:, col : col + TRI_PER_CLUSTER] = verts[vi][:, comp].reshape(
                c, TRI_PER_CLUSTER
            )
    cpad_rows = np.zeros((cpad, TRI_ROW_WIDTH), f32)  # degenerate tris: never hit
    tri_rows = np.concatenate([tri_rows, cpad_rows], 0)

    return MeshClusters(
        v0=v0p,
        v1=v1p,
        v2=v2p,
        pad_mask=pad_mask,
        cl_min=cl_min_p,
        cl_max=cl_max_p,
        sc_min=sc_min,
        sc_max=sc_max,
        sc_rows=sc_rows,
        tri_rows=tri_rows,
        n_clusters=s * CLUSTERS_PER_SUPER,  # padded count (inf boxes never hit)
        n_supers=s,
    )
