"""A/B microbenchmark: VPU Möller-Trumbore vs MXU Plücker vs Baldwin–Weber
triangle blocks.

VERDICT r2 item 1: the round-2 roofline priced the traversal kernel's
[B-ray, 128-tri] test only on the VPU (~720 vreg-ops, 540-860 ns measured)
and never considered the MXU. This tool measures both implementations of
``render/pallas_traverse._traverse_blocks`` on identical synthetic work and
reports ns per (ray-block x cluster) MT block, plus output parity.

Synthetic setup: C clusters of 128 random triangles in the unit box, rays
from a shell aimed inward, and ALL-ONES candidate masks so every ray-block
tests every cluster — the measured quantity is pure per-block cost at a
KNOWN density (no mask noise).

Usage:  python tools/mxu_mt_bench.py [--clusters C] [--steps S] [--iters K]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from rayito_tpu.accel.kernel_tables import (
    KCOMP,
    KTRI,
    build_bw_rows,
    build_mxu_weights,
)
from rayito_tpu.render.pallas_traverse import RB, SB, _traverse_blocks


def synth(c_clusters: int, n_steps: int, seed=0, density=None):
    rs = np.random.default_rng(seed)
    t = c_clusters * KTRI
    # triangles: random small triangles centered in the unit box
    ctr = rs.uniform(-1, 1, (t, 3))
    v0 = ctr + rs.normal(0, 0.05, (t, 3))
    v1 = ctr + rs.normal(0, 0.05, (t, 3))
    v2 = ctr + rs.normal(0, 0.05, (t, 3))
    tri = np.zeros((c_clusters, KCOMP, KTRI), np.float32)
    for ax in range(3):
        tri[:, ax, :] = v0[:, ax].reshape(c_clusters, KTRI)
        tri[:, 3 + ax, :] = (v1 - v0)[:, ax].reshape(c_clusters, KTRI)
        tri[:, 6 + ax, :] = (v2 - v0)[:, ax].reshape(c_clusters, KTRI)

    n = n_steps * SB
    o = rs.normal(size=(n, 3))
    o = 4.0 * o / np.linalg.norm(o, axis=1, keepdims=True)
    aim = rs.uniform(-0.8, 0.8, (n, 3))
    d = aim - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    soa8 = np.zeros((n, 8), np.float32)
    soa8[:, 0:3] = o
    soa8[:, 3:6] = d
    soa8[:, 6] = 1.0e30
    soat = soa8.reshape(n_steps, SB, 8)

    n_words = -(-c_clusters // 32)
    masks = np.zeros((n_steps * RB, n_words), np.uint32)
    if density is None or density >= c_clusters:
        for c in range(c_clusters):
            masks[:, c // 32] |= np.uint32(1) << np.uint32(c % 32)
        per_block = c_clusters
    else:
        # production-like sparse masks: `density` random clusters per block
        for b in range(masks.shape[0]):
            for c in rs.choice(c_clusters, density, replace=False):
                masks[b, c // 32] |= np.uint32(1) << np.uint32(c % 32)
        per_block = density
    return (
        jnp.asarray(tri),
        jnp.asarray(build_mxu_weights(tri)),
        jnp.asarray(soat),
        jnp.asarray(masks.view(np.int32)),
        per_block,
    )


def run(mode, masks, soat, tab, iters, tmin=1e-4):
    # prune off: matches the production default (traverse._prune_for)
    box = jnp.zeros((8, 8), jnp.float32)  # unused when prune=False
    kw = dict(tmin=tmin, interpret=False, mt_mode=mode, prune=False)
    t, p = _traverse_blocks(masks, soat, tab, box, **kw)
    _ = float(t.sum())  # compile + sync
    t0 = time.perf_counter()
    outs = []
    for _ in range(iters):
        outs.append(_traverse_blocks(masks, soat, tab, box, **kw))
    _ = float(outs[-1][0].sum() + outs[0][0].sum())  # relay-safe sync
    dt = (time.perf_counter() - t0) / iters
    return dt, outs[-1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clusters", type=int, default=32)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--density", type=int, default=None,
                    help="random clusters per ray-block (default: all)")
    args = ap.parse_args()

    tri, wts, soat, masks, per_block = synth(
        args.clusters, args.steps, density=args.density
    )
    n_blocks = args.steps * RB
    mt_blocks = n_blocks * per_block

    dt_v, (tv, pv) = run("vpu", masks, soat, tri, args.iters)
    dt_m, (tm, pm) = run("mxu", masks, soat, wts, args.iters)
    bw = jnp.asarray(build_bw_rows(np.asarray(tri)))
    dt_b, (tb, pb) = run("bw", masks, soat, bw, args.iters)

    pv = np.asarray(pv).ravel()
    pm = np.asarray(pm).ravel()
    tv = np.asarray(tv).ravel()
    tm = np.asarray(tm).ravel()
    hit_v = pv >= 0
    agree_prim = (pv == pm).mean()
    both = hit_v & (pm >= 0)
    rel_t = np.abs(tm[both] - tv[both]) / np.maximum(tv[both], 1e-9)

    print(f"clusters={args.clusters} steps={args.steps} "
          f"({mt_blocks} MT blocks/iter, {args.steps * SB} rays)")
    print(f"vpu : {dt_v*1e3:8.3f} ms/iter  {dt_v/mt_blocks*1e9:8.1f} ns/block")
    print(f"mxu : {dt_m*1e3:8.3f} ms/iter  {dt_m/mt_blocks*1e9:8.1f} ns/block")
    print(f"bw  : {dt_b*1e3:8.3f} ms/iter  {dt_b/mt_blocks*1e9:8.1f} ns/block")
    print(f"speedup vpu/mxu: {dt_v/dt_m:.3f}x  vpu/bw: {dt_v/dt_b:.3f}x")
    pb = np.asarray(pb).ravel()
    print(f"bw prim agreement vs vpu: {(np.asarray(pv).ravel() == pb).mean():.5f}")
    print(f"parity: hit-rate {hit_v.mean():.3f}, prim agreement "
          f"{agree_prim:.5f}, max rel t diff {rel_t.max() if both.any() else 0:.2e}")


if __name__ == "__main__":
    main()
