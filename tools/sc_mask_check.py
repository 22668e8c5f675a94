"""Empirical check for VERDICT r2 item 2 (supercluster pre-mask).

Claim under test: feeding the supercluster boxes (sc_box) through a
pre-mask before the cluster mask would reduce the traversal kernel's
union density. This tool demonstrates it CANNOT: every cluster box is
contained in its supercluster's box (the supercluster box is the union of
its children), so slab-hit(cluster) ⟹ slab-hit(supercluster) and

    cluster_mask AND expand(supercluster_mask) == cluster_mask

for every ray. The supercluster level can only make the MASK COMPUTATION
cheaper (test S boxes first, then the ~hit fraction of clusters), never the
mask tighter — union density, the traversal cost driver, is untouched.

Run prints the verification over the stage-6 bench scene's camera rays and
a bounce-like ray population, plus the per-128-ray-block density histogram
with and without the supercluster AND.
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from rayito_tpu.accel.kernel_tables import KSC, NEVER_HIT  # noqa: E402
from rayito_tpu.models.camera import PerspectiveCamera  # noqa: E402
from rayito_tpu.models.demo import STAGE6_CAMERA, stage6_scene  # noqa: E402


def slab_hits(box, o, d, tmin, tmax):
    """[8, K] box table x [N, 3] rays -> [N, K] bool."""
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
    cl_box = np.asarray(scene.ktab_box[0])  # [8, C_pad]
    c_pad = cl_box.shape[1]
    # rebuild the supercluster boxes from the cluster table (KSC children)
    real = cl_box[0] < NEVER_HIT
    n_real = int(real.sum())
    s = -(-n_real // KSC)
    sc_lo = np.full((s, 3), np.inf, np.float32)
    sc_hi = np.full((s, 3), -np.inf, np.float32)
    for c in range(n_real):
        g = c // KSC
        sc_lo[g] = np.minimum(sc_lo[g], cl_box[0:3, c])
        sc_hi[g] = np.maximum(sc_hi[g], cl_box[3:6, c])

    cam = PerspectiveCamera.make(30.0, *STAGE6_CAMERA)
    rs = np.random.default_rng(0)
    n = 1 << 14
    px = rs.uniform(size=n).astype(np.float32)
    py = rs.uniform(size=n).astype(np.float32)
    zero = jnp.zeros((n,), jnp.float32)
    o, d, _ = cam.make_rays(jnp.asarray(px), jnp.asarray(py), zero, zero, zero)
    o = np.stack([np.asarray(o.x), np.asarray(o.y), np.asarray(o.z)], 1)
    d = np.stack([np.asarray(d.x), np.asarray(d.y), np.asarray(d.z)], 1)

    pops = {}
    for name, (oo, dd) in {
        "camera": (o, d),
        # bounce-like: origins near the geometry, random directions
        "bounce": (
            rs.uniform(-3, 3, (n, 3)).astype(np.float32),
            (lambda v: v / np.linalg.norm(v, axis=1, keepdims=True))(
                rs.normal(size=(n, 3)).astype(np.float32)
            ),
        ),
    }.items():
        tmax = np.full(n, 1e30, np.float32)
        cl_hit = slab_hits(cl_box, oo, dd, 1e-4, tmax)  # [N, C_pad]
        sc_box8 = np.full((8, s), NEVER_HIT, np.float32)
        sc_box8[0:3] = sc_lo.T
        sc_box8[3:6] = sc_hi.T
        sc_hit = slab_hits(sc_box8, oo, dd, 1e-4, tmax)  # [N, S]
        sc_exp = np.repeat(sc_hit, KSC, axis=1)[:, :c_pad]
        if sc_exp.shape[1] < c_pad:  # pad lanes hold NEVER_HIT boxes
            sc_exp = np.concatenate(
                [sc_exp,
                 np.zeros((n, c_pad - sc_exp.shape[1]), bool)], axis=1
            )
        anded = cl_hit & sc_exp
        identical = np.array_equal(anded, cl_hit)
        # per-128-ray-block union density (the kernel's cost driver)
        nb = n // 128
        blk = cl_hit[: nb * 128].reshape(nb, 128, c_pad).any(axis=1)
        blk_and = anded[: nb * 128].reshape(nb, 128, c_pad).any(axis=1)
        du = blk.sum(1)
        da = blk_and.sum(1)
        pops[name] = (identical, du.mean(), np.percentile(du, 90),
                      da.mean(), np.percentile(da, 90))
        print(f"{name:>7}: AND-with-supercluster leaves cluster mask "
              f"identical: {identical}")
        print(f"         block union density  raw mean {du.mean():6.2f} "
              f"p90 {np.percentile(du, 90):5.1f}   with-sc mean "
              f"{da.mean():6.2f} p90 {np.percentile(da, 90):5.1f}")
    assert all(v[0] for v in pops.values()), "nesting violated?!"
    print("theorem holds: supercluster pre-mask cannot tighten the cluster "
          "mask (boxes are nested); it can only cheapen mask COMPUTATION.")


if __name__ == "__main__":
    main()
