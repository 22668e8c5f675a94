"""Offline sweep: coherence-key layouts vs block union density.

The production key is (octant:3 | morton(entry cell):10) after the packed
sort's top-13-bit truncation (pallas_traverse._coherence_key + the 1-op
packed sort). This tool scores layout candidates on the stage-6 scene for
camera and bounce-like populations WITHOUT touching the kernel:

  * prod-13        octant(3) + entry-cell morton truncated to 10 bits
  * prod-full      octant(3) + full 27-bit morton (what a 2-operand,
                   ~2x-cost sort would buy)
  * dir-major      direction morton(6: 2 bits/axis of d in [-1,1],
                   subsumes the octant) + entry cell (7)
  * cell-major     entry cell (7) + direction morton (6)
  * 6d-interleave  cell/direction bits alternated (cell major)
  * oct+cell+dir   octant(3) + cell(7) + within-octant |d| bits (3)

Score = total slab-hit cluster visits across live blocks (the traversal
kernel's MT-block count is proportional); mean/p90 shown for context.
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
from rayito_tpu.render.pallas_traverse import B  # noqa: E402

from density_sort_check import slab  # noqa: E402


def part1by2(x, nbits):
    x = x.astype(np.int64) & ((1 << nbits) - 1)
    out = np.zeros_like(x)
    for b in range(nbits):
        out |= ((x >> b) & 1) << (3 * b)
    return out


def morton3(qx, qy, qz, nbits):
    return (
        (part1by2(qx, nbits) << 2)
        | (part1by2(qy, nbits) << 1)
        | part1by2(qz, nbits)
    )


def quant(v, lo, hi, nbits):
    s = (v - lo) / (hi - lo) * (1 << nbits)
    return np.clip(s, 0, (1 << nbits) - 1).astype(np.int64)


def score(hit, key):
    order = np.argsort(key, kind="stable")
    h = hit[order]
    nb = h.shape[0] // B
    blk = h[: nb * B].reshape(nb, B, -1).any(axis=1)
    du = blk.sum(1)
    live = du > 0
    return du[live].sum(), du[live].mean(), np.percentile(du[live], 90)


def main():
    scene = stage6_scene().compile(traversal="xla")
    box = np.asarray(scene.ktab_box[0])
    rmin = box[0:3].min(axis=1)
    mx = np.where(box[3:6] >= 1e29, -np.inf, box[3:6])
    rmax = mx.max(axis=1)
    ext = np.maximum(rmax - rmin, 1e-30)

    cam = PerspectiveCamera.make(30.0, *STAGE6_CAMERA)
    rs = np.random.default_rng(0)
    n = 1 << 15
    px = rs.uniform(size=n).astype(np.float32)
    py = rs.uniform(size=n).astype(np.float32)
    z = jnp.zeros((n,), jnp.float32)
    o_, d_, _ = cam.make_rays(jnp.asarray(px), jnp.asarray(py), z, z, z)
    o_cam = np.stack([np.asarray(o_.x), np.asarray(o_.y), np.asarray(o_.z)], 1)
    d_cam = np.stack([np.asarray(d_.x), np.asarray(d_.y), np.asarray(d_.z)], 1)

    pops = {"camera": (o_cam, d_cam)}
    hit0, near0 = slab(box, o_cam, d_cam, 1e-4, np.full(n, 1e30, np.float32))
    t_ent = np.where(hit0, near0, np.inf).min(axis=1)
    ok = np.isfinite(t_ent)
    o_b = (o_cam + d_cam * t_ent[:, None])[ok]
    dirs = rs.normal(size=(o_b.shape[0], 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    pops["bounce"] = (o_b.astype(np.float32), dirs.astype(np.float32))

    for name, (o, d) in pops.items():
        m = o.shape[0]
        tmax = np.full(m, 1e30, np.float32)
        hit, near = slab(box, o, d, 1e-4, tmax)

        tn = np.clip(np.where(np.isfinite(near), near, np.inf).min(1), 0, 3e38)
        tn = np.where(np.isfinite(tn), tn, 0.0)
        e = o + d * tn[:, None]
        q9 = [quant(e[:, k], rmin[k], rmax[k], 9) for k in range(3)]
        q7a = [x >> 2 for x in q9]  # 7-bit cells (padded from 9)
        cell27 = morton3(*q9, 9)
        cell21 = morton3(*[x >> 2 for x in q9], 7)
        octant = (
            (d[:, 0] < 0).astype(np.int64) * 4
            + (d[:, 1] < 0).astype(np.int64) * 2
            + (d[:, 2] < 0)
        )
        dq = [quant(d[:, k], -1.0, 1.0001, 2) for k in range(3)]
        dir6 = morton3(*dq, 2)
        # within-octant |d| major-axis bits: rank of |dx|,|dy|,|dz|
        ad = np.abs(d)
        major = ad.argmax(1)

        keys = {
            "prod-13": ((octant << 27) | cell27) >> 17,
            "prod-full": (octant << 27) | cell27,
            "dir-major(6)+cell(21)": (dir6 << 21) | cell21,
            "cell(21)+dir(6)": (cell21 << 6) | dir6,
            "oct+cell21+major": (octant << 23) | (cell21 << 2) | major,
            "oct+cell27 full+dir6": ((octant << 33) | (cell27 << 6) | dir6),
        }
        # 6d interleave: 7 cell bits + 2 dir bits per axis
        k6 = np.zeros(m, np.int64)
        for axis_bits, arrs, base in ((7, q7a, 2), (2, dq, 0)):
            pass
        # interleave (cx,cy,cz,dx,dy,dz) bit-planes, cell-major per plane
        k6 = np.zeros(m, np.int64)
        shift = 0
        for b in range(7 - 1, -1, -1):
            for a in range(3):
                k6 = (k6 << 1) | ((q7a[a] >> b) & 1)
            if b < 2:
                for a in range(3):
                    k6 = (k6 << 1) | ((dq[a] >> b) & 1)
        keys["6d-interleave"] = k6

        print(f"[{name}] {m} rays")
        for label, key in keys.items():
            tot, mean, p90 = score(hit, key)
            print(f"  {label:<24} total {tot:8d}  mean {mean:6.2f}  p90 {p90:5.1f}")


if __name__ == "__main__":
    main()
