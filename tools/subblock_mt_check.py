"""Offline predictor: would per-SUB-BLOCK MT reduce traversal vector work?

The traversal kernel tests each 128-ray block's candidate-cluster UNION
with [128, 128] MT blocks. A finer scheme keeps the 128-ray block for the
mask/collect machinery but emits candidate masks per 32-ray (or 64-ray)
SUB-block and runs [32, 128] ([64, 128]) MT only for participating subs:
vector work becomes proportional to the sum of sub-unions instead of
4x (2x) the block union.

This tool computes, on the stage-6 scene under the PRODUCTION coherence
order (octant+morton key, pallas_traverse._coherence_key), the exact
vector-work ratio

    ratio_k = sum over blocks of sum over subs of union_k(sub)
              ----------------------------------------------- (k = 32, 64)
              (128/k) * sum over blocks of union_128(block)

for camera and bounce-like ray populations, plus the work-item count
ratio (scalar-loop iterations scale with ITEMS, not vector size). The
sub-block scheme is worth kernel work only if ratio_k is well below 1
while the item ratio stays affordable. CPU-only, no TPU needed.
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from rayito_tpu.models.camera import PerspectiveCamera  # noqa: E402
from rayito_tpu.models.demo import STAGE6_CAMERA, stage6_scene  # noqa: E402
from rayito_tpu.ops.vec3 import V3  # noqa: E402
from rayito_tpu.render.pallas_traverse import B, _coherence_key  # noqa: E402


def slab(box, o, d, tmin, tmax):
    inv = 1.0 / d
    t0 = (box[0:3, :][None] - o[:, :, None]) * inv[:, :, None]
    t1 = (box[3:6, :][None] - o[:, :, None]) * inv[:, :, None]
    near = np.minimum(t0, t1).max(axis=1)
    far = np.maximum(t0, t1).min(axis=1)
    return (np.maximum(near, tmin) <= np.minimum(far, tmax[:, None])) & (
        far >= tmin
    )


def main():
    scene = stage6_scene().compile(traversal="xla")
    box = np.asarray(scene.ktab_box[0])

    cam = PerspectiveCamera.make(30.0, *STAGE6_CAMERA)
    rs = np.random.default_rng(0)
    n = 1 << 15

    pops = {}
    px = rs.uniform(size=n).astype(np.float32)
    py = rs.uniform(size=n).astype(np.float32)
    z = jnp.zeros((n,), jnp.float32)
    o_, d_, _ = cam.make_rays(jnp.asarray(px), jnp.asarray(py), z, z, z)
    o_cam = np.stack([np.asarray(o_.x), np.asarray(o_.y), np.asarray(o_.z)], 1)
    d_cam = np.stack([np.asarray(d_.x), np.asarray(d_.y), np.asarray(d_.z)], 1)
    pops["camera"] = (o_cam, d_cam)

    hit0 = slab(box, o_cam, d_cam, 1e-4, np.full(n, 1e30, np.float32))
    # bounce-like: origins propagated onto geometry, random directions
    inv = 1.0 / d_cam
    t0 = (box[0:3, :][None] - o_cam[:, :, None]) * inv[:, :, None]
    t1 = (box[3:6, :][None] - o_cam[:, :, None]) * inv[:, :, None]
    near = np.minimum(t0, t1).max(axis=1)
    t_ent = np.where(hit0, near, np.inf).min(axis=1)
    ok = np.isfinite(t_ent)
    o_b = (o_cam + d_cam * t_ent[:, None])[ok]
    dirs = rs.normal(size=(o_b.shape[0], 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    pops["bounce"] = (o_b.astype(np.float32), dirs.astype(np.float32))

    for name, (o, d) in pops.items():
        m = o.shape[0]
        tmax = np.full(m, 1e30, np.float32)
        hit = slab(box, o, d, 1e-4, tmax)
        key = np.asarray(_coherence_key(
            *(jnp.asarray(o[:, k]) for k in range(3)),
            *(jnp.asarray(d[:, k]) for k in range(3)),
            jnp.asarray(tmax), jnp.asarray(box), 1e-4,
        ))
        h = hit[np.argsort(key, kind="stable")]
        nb = h.shape[0] // B
        h = h[: nb * B]
        u128 = h.reshape(nb, B, -1).any(axis=1).sum(1)  # [nb]
        items128 = u128.sum()
        print(f"[{name}] {m} rays, {nb} blocks, "
              f"union128 mean {u128[u128 > 0].mean():.2f}")
        for k in (64, 32, 16):
            s = B // k
            sub = h.reshape(nb, s, k, -1).any(axis=2)  # [nb, s, C]
            uk = sub.sum(axis=(1, 2))
            ratio = uk.sum() / (s * items128)
            # lockstep scheme: per iteration one item from EACH sub (same
            # vector footprint as one [B,128] block); iterations per block
            # = max over subs of that sub's union
            mx = sub.sum(axis=2).max(axis=1)  # [nb]
            print(f"  sub={k:3d}: vector-work ratio {ratio:.3f}  "
                  f"work items x{uk.sum() / items128:.2f}  "
                  f"lockstep iters ratio {mx.sum() / items128:.3f}")


if __name__ == "__main__":
    main()
