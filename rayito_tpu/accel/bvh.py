"""BVH construction (host) and skip-link flattening (device layout).

Build algorithm matches the reference Bvh<T> (Rayito_Stage7_QT/RAccel.h:262-372):
  * exactly 2N-1 nodes for N primitives, leaves hold 1 primitive,
  * split axis = largest extent of the node's bbox,
  * split position = spatial midpoint (explicitly not SAH, RAccel.h:171-183),
  * degenerate partitions fall back to a median split,
  * node bbox = union of member element bboxes.

Device layout is where we diverge from the reference on purpose: the
reference traverses with a 50-entry per-ray stack (RAccel.h:377-560), which is
hostile to a SIMD machine. We instead *thread* the tree with skip links
("hit_link" = next node in DFS order when the box is entered, "miss_link" =
DFS successor skipping the subtree), so a whole wavefront of rays walks the
tree in lock-step with one int32 cursor per lane and zero stack traffic —
a single gather + AABB test + masked triangle test per step. t-pruning against
the current best hit replaces the reference's front-to-back interval pruning.

Build is NumPy on host (scene prep, same place the reference builds); the
traversal kernels live in ops/trace and render/.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class BuiltBvh:
    """Host-side BVH: threaded node arrays + the primitive permutation."""

    nodes_min: np.ndarray  # [M, 3] float32
    nodes_max: np.ndarray  # [M, 3] float32
    hit_link: np.ndarray  # [M] int32 (next node if box entered; -1 = done)
    miss_link: np.ndarray  # [M] int32 (next node if box missed; -1 = done)
    prim: np.ndarray  # [M] int32 (leaf primitive in *reordered* space, -1 internal)
    prim_order: np.ndarray  # [N] int32: reordered[i] = original[prim_order[i]]
    depth: int


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


def build_bvh(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray) -> BuiltBvh:
    """Build over triangle soup. Returns threaded arrays; triangle data must be
    reordered by ``prim_order`` so leaves index contiguously."""
    n = v0.shape[0]
    f32, i32 = np.float32, np.int32
    if n == 0:
        return BuiltBvh(
            np.zeros((0, 3), f32),
            np.zeros((0, 3), f32),
            np.zeros(0, i32),
            np.zeros(0, i32),
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
    while stack:
        node, lo, hi = stack.pop()
        depth = depth_stack.pop()
        max_depth = max(max_depth, depth)
        idxs = order[lo:hi]
        nb_min = bb_min[idxs].min(axis=0)
        nb_max = bb_max[idxs].max(axis=0)
        nodes_min[node] = nb_min
        nodes_max[node] = nb_max
        count = hi - lo
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
        stack.append((lchild + 1, lo + n_left, hi))
        depth_stack.append(depth + 1)
        stack.append((lchild, lo, lo + n_left))
        depth_stack.append(depth + 1)

    assert next_free == m, (next_free, m)

    # Thread the tree: DFS order. Because children were allocated in DFS pop
    # order above, node indices are NOT in DFS sequence, so compute links by
    # walking the structure.
    hit_link = np.full(m, -1, i32)
    miss_link = np.full(m, -1, i32)

    # iterative: (node, successor) where successor = DFS successor of subtree
    walk = [(0, -1)]
    while walk:
        node, succ = walk.pop()
        miss_link[node] = succ
        lc = left_child[node]
        if lc < 0:  # leaf: entering just tests the prim, then continue to succ
            hit_link[node] = succ
        else:
            hit_link[node] = lc
            walk.append((lc, lc + 1))  # left's successor is right sibling
            walk.append((lc + 1, succ))  # right's successor is our successor

    return BuiltBvh(
        nodes_min, nodes_max, hit_link, miss_link, prim, order.astype(i32), max_depth
    )
