"""Offline A/B: MT-block cost under candidate CLUSTERINGS.

The traversal cost is (number of slab-hit clusters unioned per 128-ray
block) x (one fixed-cost [B, 128] MT block each) — independent of how many
real triangles a cluster holds. So a clustering with MORE but TIGHTER
clusters wins iff the total block count drops. Candidates, all preserving
the `global = tri_base[cluster] + lane` contiguity contract:

  a) prod: midpoint-BVH DFS order cut into fixed 128-triangle chunks
     (accel/kernel_tables.py today);
  b) subtree128: same BVH, clusters = maximal subtrees with <= 128 tris
     (no chunk straddles a subtree boundary; lanes padded);
  c) sah128: binned-SAH BVH DFS order, fixed 128 chunks;
  d) sah-subtree: SAH BVH, maximal <= 128 subtrees;
  e) sah-subtree96/64: smaller subtree caps (more, tighter clusters).

Cost proxy per ray population: total MT blocks = sum over 128-ray blocks
of |union of slab-hit clusters|, after the production coherence sort.
Also prints the per-ray mean slab-hit count (the perfect-compaction floor).
CPU-only, no TPU needed.
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from rayito_tpu.models.camera import PerspectiveCamera  # noqa: E402
from rayito_tpu.models.demo import STAGE6_CAMERA, stage6_scene  # noqa: E402
from rayito_tpu.render.pallas_traverse import B, _coherence_key  # noqa: E402

KTRI = 128


def tri_soup_from_scene():
    scene = stage6_scene().compile(traversal="xla")
    tri = np.asarray(scene.ktab_tri[0])  # [C, 16, 128] v0/e1/e2 rows
    c = tri.shape[0]
    v0 = tri[:, 0:3].transpose(0, 2, 1).reshape(c * KTRI, 3)
    e1 = tri[:, 3:6].transpose(0, 2, 1).reshape(c * KTRI, 3)
    e2 = tri[:, 6:9].transpose(0, 2, 1).reshape(c * KTRI, 3)
    valid = (np.abs(e1).sum(1) > 0) | (np.abs(e2).sum(1) > 0)
    return v0[valid], (v0 + e1)[valid], (v0 + e2)[valid]


# --- recursive builders that keep (lo, hi) ranges so subtrees can be cut ---


def build_ranges(v0, v1, v2, mode: str):
    """Returns (order [N], subtree list of (lo, hi, depth) in DFS order)."""
    bb_min = np.minimum(np.minimum(v0, v1), v2)
    bb_max = np.maximum(np.maximum(v0, v1), v2)
    cent = 0.5 * (bb_min + bb_max)
    n = v0.shape[0]
    order = np.arange(n)
    nodes = []  # (lo, hi) every node, DFS

    def split_midpoint(idxs, nb_min, nb_max):
        extent = nb_max - nb_min
        axis = int(np.argmax(extent))
        mid = 0.5 * (nb_min[axis] + nb_max[axis])
        mask = cent[idxs, axis] < mid
        nl = int(mask.sum())
        if nl == 0 or nl == len(idxs):
            nl = len(idxs) // 2
            part = np.argpartition(cent[idxs, axis], nl)
            return idxs[part], nl
        return np.concatenate([idxs[mask], idxs[~mask]]), nl

    def split_sah(idxs, nb_min, nb_max):
        nbins = 16
        best = (np.inf, -1, -1)
        ext = nb_max - nb_min
        for axis in range(3):
            if ext[axis] <= 0:
                continue
            cv = cent[idxs, axis]
            bins = np.minimum(
                ((cv - nb_min[axis]) / ext[axis] * nbins).astype(np.int64),
                nbins - 1,
            )
            # bin bounds + counts
            cnt = np.bincount(bins, minlength=nbins)
            bmin = np.full((nbins, 3), np.inf)
            bmax = np.full((nbins, 3), -np.inf)
            for b in range(nbins):
                sel = bins == b
                if cnt[b]:
                    bmin[b] = bb_min[idxs[sel]].min(0)
                    bmax[b] = bb_max[idxs[sel]].max(0)
            # prefix/suffix surface areas
            def areas(mn, mx):
                d = np.maximum(mx - mn, 0)
                return d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 0] * d[:, 2]

            lmin = np.minimum.accumulate(bmin, 0)
            lmax = np.maximum.accumulate(bmax, 0)
            rmin = np.minimum.accumulate(bmin[::-1], 0)[::-1]
            rmax = np.maximum.accumulate(bmax[::-1], 0)[::-1]
            lc = np.cumsum(cnt)
            for b in range(nbins - 1):
                nl, nr = lc[b], len(idxs) - lc[b]
                if nl == 0 or nr == 0:
                    continue
                cost = areas(lmin[b : b + 1], lmax[b : b + 1])[0] * nl + areas(
                    rmin[b + 1 : b + 2], rmax[b + 1 : b + 2]
                )[0] * nr
                if cost < best[0]:
                    best = (cost, axis, b)
        if best[1] < 0:
            return split_midpoint(idxs, nb_min, nb_max)
        _, axis, b = best
        cv = cent[idxs, axis]
        bins = np.minimum(
            ((cv - nb_min[axis]) / ext[axis] * nbins).astype(np.int64),
            nbins - 1,
        )
        mask = bins <= b
        nl = int(mask.sum())
        return np.concatenate([idxs[mask], idxs[~mask]]), nl

    split = split_sah if mode == "sah" else split_midpoint

    stack = [(0, n, 0)]
    while stack:
        lo, hi, depth = stack.pop()
        idxs = order[lo:hi]
        nodes.append((lo, hi, depth))
        if hi - lo <= 4:
            continue
        nb_min = bb_min[idxs].min(0)
        nb_max = bb_max[idxs].max(0)
        new, nl = split(idxs, nb_min, nb_max)
        order[lo:hi] = new
        stack.append((lo + nl, hi, depth + 1))
        stack.append((lo, lo + nl, depth + 1))
    # restore DFS order of nodes (stack pops right-subtree later; sort by lo
    # then by -hi gives parent-before-children left-first)
    nodes.sort(key=lambda t: (t[0], -t[1]))
    return order, nodes


def subtree_cuts(nodes, n, cap):
    """Maximal subtrees with size <= cap, in DFS order -> (lo, hi) list."""
    cuts = []
    covered = 0
    for lo, hi, _ in nodes:
        if lo < covered:
            continue
        if hi - lo <= cap:
            cuts.append((lo, hi))
            covered = hi
    assert covered == n
    return cuts


def boxes_for(cuts, order, bb_min, bb_max):
    lo_ = np.array([bb_min[order[a:b]].min(0) for a, b in cuts])
    hi_ = np.array([bb_max[order[a:b]].max(0) for a, b in cuts])
    return lo_, hi_


def slab(lo_, hi_, o, d, tmin, tmax):
    inv = 1.0 / d
    t0 = (lo_[None] - o[:, None, :]) * inv[:, None, :]
    t1 = (hi_[None] - o[:, None, :]) * inv[:, None, :]
    near = np.minimum(t0, t1).max(axis=2)
    far = np.maximum(t0, t1).min(axis=2)
    return (np.maximum(near, tmin) <= np.minimum(far, tmax[:, None])) & (
        far >= tmin
    )


def block_cost(hit, order):
    h = hit[order]
    nb = h.shape[0] // B
    blk = h[: nb * B].reshape(nb, B, -1).any(axis=1)
    du = blk.sum(1)
    return du.sum(), du[du > 0].mean(), np.percentile(du[du > 0], 90)


def main():
    v0, v1, v2 = tri_soup_from_scene()
    n = v0.shape[0]
    bb_min = np.minimum(np.minimum(v0, v1), v2)
    bb_max = np.maximum(np.maximum(v0, v1), v2)
    print(f"{n} triangles")

    clusterings = {}
    # morton-order clustering: sort by 30-bit 3D morton code of triangle
    # centroids, cut every 128 — SAME cluster count as prod, spatially
    # compact runs without any tree (kept cheap to build)
    cent = 0.5 * (bb_min + bb_max)
    q = ((cent - cent.min(0)) / np.maximum(np.ptp(cent, 0), 1e-30)
         * 1023).astype(np.uint64)

    def spread(x):
        x = x & 0x3FF
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    morton = spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (
        spread(q[:, 2]) << 2
    )
    order_m = np.argsort(morton, kind="stable")
    clusterings["morton-128chunk"] = (
        order_m, [(i, min(i + KTRI, n)) for i in range(0, n, KTRI)]
    )
    for mode in ("midpoint", "sah"):
        order, nodes = build_ranges(v0, v1, v2, mode)
        # fixed 128 chunks of the DFS order
        chunks = [(i, min(i + KTRI, n)) for i in range(0, n, KTRI)]
        clusterings[f"{mode}-128chunk"] = (order, chunks)
        for cap in (128, 96, 64):
            cuts = subtree_cuts(nodes, n, cap)
            key = f"{mode}-subtree{cap}"
            clusterings[key] = (order, cuts)

    cam = PerspectiveCamera.make(30.0, *STAGE6_CAMERA)
    rs = np.random.default_rng(0)
    m = 1 << 15
    px = rs.uniform(size=m).astype(np.float32)
    py = rs.uniform(size=m).astype(np.float32)
    z = jnp.zeros((m,), jnp.float32)
    o_, d_, _ = cam.make_rays(jnp.asarray(px), jnp.asarray(py), z, z, z)
    o_cam = np.stack([np.asarray(o_.x), np.asarray(o_.y), np.asarray(o_.z)], 1)
    d_cam = np.stack([np.asarray(d_.x), np.asarray(d_.y), np.asarray(d_.z)], 1)

    pops = {"camera": (o_cam, d_cam)}
    # bounce-like (origins on geometry via first slab entry of prod boxes)
    order0, chunks0 = clusterings["midpoint-128chunk"]
    lo0, hi0 = boxes_for(chunks0, order0, bb_min, bb_max)
    inv = 1.0 / d_cam
    t0 = (lo0[None] - o_cam[:, None, :]) * inv[:, None, :]
    t1 = (hi0[None] - o_cam[:, None, :]) * inv[:, None, :]
    near = np.minimum(t0, t1).max(2)
    far = np.maximum(t0, t1).min(2)
    hit0 = (np.maximum(near, 1e-4) <= far) & (far >= 1e-4)
    t_ent = np.where(hit0, near, np.inf).min(1)
    ok = np.isfinite(t_ent)
    o_b = (o_cam + d_cam * t_ent[:, None])[ok]
    dirs = rs.normal(size=(o_b.shape[0], 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    pops["bounce"] = (o_b.astype(np.float32), dirs.astype(np.float32))

    for pname, (o, d) in pops.items():
        mm = o.shape[0]
        tmax = np.full(mm, 1e30, np.float32)
        print(f"\n[{pname}] {mm} rays")
        for cname, (order, cuts) in clusterings.items():
            lo_, hi_ = boxes_for(cuts, order, bb_min, bb_max)
            hit = slab(lo_, hi_, o, d, 1e-4, tmax)
            # production coherence sort (root box from this clustering)
            box8 = np.full((8, len(cuts)), 0, np.float32)
            box8[0:3] = lo_.T
            box8[3:6] = hi_.T
            key = np.asarray(
                _coherence_key(
                    *(jnp.asarray(o[:, k]) for k in range(3)),
                    *(jnp.asarray(d[:, k]) for k in range(3)),
                    jnp.asarray(tmax), jnp.asarray(box8), 1e-4,
                )
            )
            sort = np.argsort(key, kind="stable")
            total, mean, p90 = block_cost(hit, sort)
            perray = hit.sum(1).mean()
            print(
                f"  {cname:<18} C={len(cuts):4d}  blocks {total:7d}  "
                f"union mean {mean:6.2f} p90 {p90:5.1f}  per-ray {perray:5.2f}"
            )


if __name__ == "__main__":
    main()
