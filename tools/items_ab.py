"""A/B: scan-kernel traversal vs the experimental item-grid traversal.

Runs both implementations on the stage-6 merged domain for three ray
populations (coherent camera primaries, shuffled, bounce-like), asserts
output EQUALITY (same winner prim ids / t keys), and times each with
interleaved back-to-back pairs (the only accepted protocol, BENCH_NOTES).

Usage: python tools/items_ab.py [--reps 10] [--mt vpu|bw]
"""

import argparse
import os
import sys
import time
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from rayito_tpu.models.camera import PerspectiveCamera
from rayito_tpu.models.demo import STAGE6_CAMERA, stage6_scene
from rayito_tpu.ops.vec3 import V3
from rayito_tpu.render import pallas_traverse as pt

N = 1 << 17


def _sync(x):
    return float(jnp.asarray(x).sum())


def ray_sets():
    cam = PerspectiveCamera.make(
        30.0, *STAGE6_CAMERA, focal_distance=16.0, lens_radius=0.0
    )
    w = 512
    rows = N // w
    px, py = jnp.meshgrid(jnp.arange(w), jnp.arange(rows), indexing="xy")
    xu = (px.reshape(-1) + 0.5) / w
    yu = 1.0 - (py.reshape(-1) + 128.0 + 0.5) / 512.0
    z = jnp.zeros((N,), jnp.float32)
    o, d, _ = cam.make_rays(xu, yu, z, z, z)
    sets = {"primary": (o, d)}
    rs = np.random.default_rng(0)
    perm = jnp.asarray(rs.permutation(N))
    sets["shuffled"] = (
        V3(o.x[perm], o.y[perm], o.z[perm]),
        V3(d.x[perm], d.y[perm], d.z[perm]),
    )
    ox = jnp.asarray(rs.uniform(-4, 4, N), jnp.float32)
    oz = jnp.asarray(rs.uniform(-4, 4, N), jnp.float32)
    oy = jnp.full((N,), -1.9, jnp.float32)
    dv = rs.normal(size=(N, 3))
    dv[:, 1] = np.abs(dv[:, 1])
    dv /= np.linalg.norm(dv, axis=1, keepdims=True)
    sets["bounce"] = (
        V3(ox, oy, oz),
        V3(*(jnp.asarray(dv[:, k], jnp.float32) for k in range(3))),
    )
    return sets


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--mt", default="vpu", choices=["vpu", "bw"])
    args = ap.parse_args()
    scene = stage6_scene().compile()
    if args.mt == "bw":
        from rayito_tpu.accel.kernel_tables import build_bw_rows

        tri = build_bw_rows(np.asarray(scene.ktab_tri[0]))
    else:
        tri = scene.ktab_tri[0]
    view = types.SimpleNamespace(tri=tri, cl_box=scene.ktab_box[0])
    print(
        f"backend={jax.default_backend()} B={pt.B} W={pt.ITEMS_W} "
        f"mt={args.mt} clusters={view.tri.shape[0]} "
        f"ITEMS_MAX={pt.ITEMS_MAX} CAP={pt.ITEMS_CAP}"
    )
    tmax = jnp.full((N,), 1e30, jnp.float32)

    trav = jax.jit(
        lambda o, d, use_items: pt.traverse(
            o, d, tmax, view, 1e-4, interpret=False, sort_rays=True,
            mt_mode=args.mt, items=use_items,
        ),
        static_argnames=("use_items",),
    )

    # item-count / overflow stats per population (build on the SORTED
    # wavefront, mirroring traverse's internal order)
    @jax.jit
    def stats(o, d):
        n_steps = max(1, -(-N // pt.SB))
        soa8 = jnp.stack(
            [o.x, o.y, o.z, d.x, d.y, d.z, tmax, jnp.zeros_like(tmax)], 1
        )
        key = pt._coherence_key(
            o.x, o.y, o.z, d.x, d.y, d.z, tmax,
            jnp.asarray(view.cl_box), 1e-4,
        )
        lane_ids = jnp.arange(N, dtype=jnp.int32)
        packed = ((key >> 17) << 17) | lane_ids
        perm = jax.lax.sort(packed) & jnp.int32((1 << 17) - 1)
        soa8 = soa8[perm]
        soat = soa8.reshape(n_steps, pt.SB, 8)
        nw = -(-jnp.asarray(view.cl_box).shape[1] // 32)
        masks = pt._block_masks_pallas(
            soat, view.cl_box, 1e-4, int(nw), False
        )
        items, nst, ovf, used = pt._build_items(
            masks, pt.ITEMS_W, pt.ITEMS_MAX, pt.ITEMS_CAP
        )
        return nst * pt.ITEMS_W, ovf

    for name, (o, d) in ray_sets().items():
        n_items, ovf = stats(o, d)
        print(f"{name:9s} items={int(n_items)} overflow={bool(ovf)}")
        t0_, p0 = trav(o, d, False)
        t1_, p1 = trav(o, d, True)
        eq_p = bool((jnp.asarray(p0) == jnp.asarray(p1)).all())
        eq_t = bool(
            (
                jnp.nan_to_num(jnp.asarray(t0_), posinf=1e30)
                == jnp.nan_to_num(jnp.asarray(t1_), posinf=1e30)
            ).all()
        )
        hits = int((np.asarray(p0) >= 0).sum())
        print(f"{name:9s} parity prim={eq_p} t={eq_t} hits={hits}")
        if not (eq_p and eq_t):
            bad = np.nonzero(np.asarray(p0) != np.asarray(p1))[0][:8]
            print(
                "  first diffs:", bad,
                "p0", np.asarray(p0)[bad], "p1", np.asarray(p1)[bad],
            )
        # interleaved timing pairs
        for rep in range(3):
            ts = {}
            for label, flag in (("scan", False), ("items", True)):
                _sync(trav(o, d, flag)[1])  # warm
                t0 = time.perf_counter()
                outs = [trav(o, d, flag) for _ in range(args.reps)]
                _sync(outs[-1][1])
                ts[label] = (time.perf_counter() - t0) / args.reps
            print(
                f"  pair{rep}: scan {ts['scan']*1e3:7.2f} ms "
                f"({N/ts['scan']/1e6:6.2f} Mrays/s)   "
                f"items {ts['items']*1e3:7.2f} ms "
                f"({N/ts['items']/1e6:6.2f} Mrays/s)"
            )


if __name__ == "__main__":
    main()
