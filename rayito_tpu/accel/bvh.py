"""BVH construction (host): the DFS primitive order that feeds clustering.

Build algorithm matches the reference Bvh<T> (Rayito_Stage7_QT/RAccel.h:262-372):
  * exactly 2N-1 nodes for N primitives, leaves hold 1 primitive,
  * split axis = largest extent of the node's bbox,
  * split position = spatial midpoint (explicitly not SAH, RAccel.h:171-183),
  * degenerate partitions fall back to a median split,
  * node bbox = union of member element bboxes.

The device does NOT walk this tree: per-lane pointer chasing is the one thing
a TPU cannot do fast (the reference traverses with a 50-entry per-ray stack,
RAccel.h:377-560). Only the tree's DFS primitive ORDER is consumed — it makes
consecutive triangles spatially coherent, and accel/clusters.py cuts that
order into the fixed-size clusters the dense traversal
(render/mesh_intersect.py) operates on. Build is NumPy on host (scene prep,
same place the reference builds) with a native C++ fast path (utils/native).
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class BuiltBvh:
    """Host-side BVH: node boxes + the primitive permutation."""

    nodes_min: np.ndarray  # [M, 3] float32
    nodes_max: np.ndarray  # [M, 3] float32
    prim: np.ndarray  # [M] int32 (leaf primitive in *reordered* space, -1 internal)
    prim_order: np.ndarray  # [N] int32: reordered[i] = original[prim_order[i]]
    depth: int
    # lo of every maximal subtree with <= cut_cap prims (when built with
    # cut_cap > 0) — the subtree-aligned cluster cut boundaries
    cut_starts: np.ndarray = None


def _prim_bounds(v0, v1, v2):
    bb_min = np.minimum(np.minimum(v0, v1), v2)
    bb_max = np.maximum(np.maximum(v0, v1), v2)
    return bb_min, bb_max


def bvh_prim_order(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray) -> np.ndarray:
    """DFS primitive order for clustering — native C++ builder when
    available (utils/native.py), else the Python builder below. Either is a
    valid midpoint-split BVH order; they may differ in tie-breaking."""
    from ..utils.native import bvh_order as native_order

    if v0.shape[0] == 0:
        return np.zeros(0, np.int32)
    order = native_order(
        np.asarray(v0, np.float32), np.asarray(v1, np.float32),
        np.asarray(v2, np.float32),
    )
    if order is not None:
        return order
    return build_bvh(v0, v1, v2).prim_order


def bvh_prim_order_cuts(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray,
                        cap: int):
    """DFS primitive order plus SUBTREE-ALIGNED cluster cut starts: the lo
    of every maximal subtree holding <= cap primitives, in increasing order
    (they partition [0, n)). Clusters cut at these boundaries never straddle
    a subtree, so each cluster's AABB is as tight as the tree provides —
    measured 10-21% fewer slab-hit MT blocks than fixed-``cap`` chunks of
    the same order (tools/cluster_quality_check.py). Native builder when
    available, else the Python builder; the ORDER is identical to
    ``bvh_prim_order`` from the same builder."""
    from ..utils.native import bvh_order_cuts as native_cuts

    if v0.shape[0] == 0:
        return np.zeros(0, np.int32), np.zeros(0, np.int32)
    res = native_cuts(
        np.asarray(v0, np.float32), np.asarray(v1, np.float32),
        np.asarray(v2, np.float32), cap,
    )
    if res is not None:
        return res
    built = build_bvh(v0, v1, v2, cut_cap=cap)
    return built.prim_order, built.cut_starts


def build_bvh(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray,
              cut_cap: int = 0) -> BuiltBvh:
    """Build over triangle soup. Returns threaded arrays; triangle data must be
    reordered by ``prim_order`` so leaves index contiguously. With
    ``cut_cap`` > 0, ``cut_starts`` records the lo of every maximal subtree
    with <= cut_cap primitives (DFS pre-order = increasing)."""
    n = v0.shape[0]
    f32, i32 = np.float32, np.int32
    if n == 0:
        return BuiltBvh(
            np.zeros((0, 3), f32),
            np.zeros((0, 3), f32),
            np.zeros(0, i32),
            np.zeros(0, i32),
            0,
        )

    bb_min, bb_max = _prim_bounds(v0.astype(f32), v1.astype(f32), v2.astype(f32))
    centroids = 0.5 * (bb_min + bb_max)

    m = 2 * n - 1
    nodes_min = np.zeros((m, 3), f32)
    nodes_max = np.zeros((m, 3), f32)
    left_child = np.full(m, -1, i32)
    prim = np.full(m, -1, i32)

    order = np.arange(n)

    # Iterative DFS build with explicit stack: (node_idx, lo, hi).
    # Children are allocated consecutively (reference stores only firstChild).
    next_free = 1
    stack = [(0, 0, n)]
    max_depth = 0
    depth_stack = [0]
    pbig_stack = [True]  # parent count > cut_cap (root counts as such)
    cut_starts = []
    while stack:
        node, lo, hi = stack.pop()
        depth = depth_stack.pop()
        parent_big = pbig_stack.pop()
        max_depth = max(max_depth, depth)
        idxs = order[lo:hi]
        nb_min = bb_min[idxs].min(axis=0)
        nb_max = bb_max[idxs].max(axis=0)
        nodes_min[node] = nb_min
        nodes_max[node] = nb_max
        count = hi - lo
        if cut_cap > 0 and parent_big and count <= cut_cap:
            cut_starts.append(lo)  # DFS pre-order pops -> increasing lo
        if count == 1:
            prim[node] = lo  # reordered position
            continue
        extent = nb_max - nb_min
        axis = int(np.argmax(extent))
        mid = 0.5 * (nb_min[axis] + nb_max[axis])
        cvals = centroids[idxs, axis]
        mask = cvals < mid
        n_left = int(mask.sum())
        if n_left == 0 or n_left == count:
            # Degenerate spatial split -> median split ("better to be merely
            # crappy than pathologically stupid", RAccel.h:342-350).
            n_left = count // 2
            part = np.argpartition(cvals, n_left)
            order[lo:hi] = idxs[part]
        else:
            # std::partition equivalent: lefts first (stable not required)
            order[lo:hi] = np.concatenate([idxs[mask], idxs[~mask]])
        lchild = next_free
        next_free += 2
        left_child[node] = lchild
        # push right first so left is processed next (DFS order = left first)
        big = count > cut_cap
        stack.append((lchild + 1, lo + n_left, hi))
        depth_stack.append(depth + 1)
        pbig_stack.append(big)
        stack.append((lchild, lo, lo + n_left))
        depth_stack.append(depth + 1)
        pbig_stack.append(big)

    assert next_free == m, (next_free, m)

    return BuiltBvh(
        nodes_min, nodes_max, prim, order.astype(i32), max_depth,
        np.asarray(cut_starts, i32) if cut_cap > 0 else None,
    )
