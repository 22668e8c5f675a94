"""Offline A/B: block union density under candidate ray orderings.

The traversal cost driver is the per-128-ray-block candidate-cluster UNION
(BENCH_NOTES roofline). This tool compares, on the stage-6 scene with
camera and bounce-like ray populations, the mean/p90 union density under:

  a) no sort,
  b) the production octant+morton coherence key (pallas_traverse),
  c) sorting by each ray's NEAREST slab-hit cluster id (would cost one
     extra [N, C] pass before the sort if adopted),
  d) (octant, nearest-cluster) lexicographic.

If (c)/(d) don't beat (b) by ~2x on bounce rays, the extra mask pass
cannot pay for itself and the idea is dead. CPU-only, no TPU needed.
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
from rayito_tpu.ops.vec3 import V3  # noqa: E402


def slab(box, o, d, tmin, tmax):
    inv = 1.0 / d
    t0 = (box[0:3, :][None] - o[:, :, None]) * inv[:, :, None]
    t1 = (box[3:6, :][None] - o[:, :, None]) * inv[:, :, None]
    near = np.minimum(t0, t1).max(axis=1)
    far = np.maximum(t0, t1).min(axis=1)
    hit = (np.maximum(near, tmin) <= np.minimum(far, tmax[:, None])) & (
        far >= tmin
    )
    return hit, np.where(hit, near, np.inf)


def density(hit, order):
    h = hit[order]
    nb = h.shape[0] // B
    blk = h[: nb * B].reshape(nb, B, -1).any(axis=1)
    du = blk.sum(1)
    live = du > 0
    return du[live].mean(), np.percentile(du[live], 90)


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

    # bounce-like: origins ON the geometry (propagate camera rays to their
    # first slab-hit entry), cosine-ish random upward directions
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
        live = hit.any(1)
        nearest = np.where(live, np.argmin(near, axis=1), 1 << 20)

        key_prod = np.asarray(_coherence_key(
            *(jnp.asarray(o[:, k]) for k in range(3)),
            *(jnp.asarray(d[:, k]) for k in range(3)),
            jnp.asarray(tmax), jnp.asarray(box), 1e-4,
        ))
        octant = (
            (d[:, 0] < 0).astype(np.int64) * 4
            + (d[:, 1] < 0).astype(np.int64) * 2
            + (d[:, 2] < 0)
        )
        orders = {
            "unsorted": np.arange(m),
            "octant+morton (prod)": np.argsort(key_prod, kind="stable"),
            "nearest-cluster": np.argsort(nearest, kind="stable"),
            "octant,nearest-cl": np.lexsort((nearest, octant)),
            "nearest-cl,octant": np.lexsort((octant, nearest)),
        }
        print(f"[{name}] {m} rays, live {live.mean():.2f}")
        for label, order in orders.items():
            mean, p90 = density(hit, order)
            print(f"  {label:<22} union mean {mean:6.2f}  p90 {p90:5.1f}")


if __name__ == "__main__":
    main()
