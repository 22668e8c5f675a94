"""Hardware perf probe for the Pallas mesh traversal (run on the TPU chip).

Times ``traverse`` (render/pallas_traverse.py) on the stage-6 merged domain
for three ray populations — coherent camera primaries, the same rays
shuffled (incoherence worst case), and hemisphere-scattered bounce-like
rays — with the coherence sort on and off, plus the XLA-side mask phase
alone. Prints one line per datapoint. Used to drive B/RB and sort-key
tuning; not part of the test suite.
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


def _time(fn, *args, reps=10, **kw):
    out = fn(*args, **kw)
    _sync(out[0])  # compile + warm
    t0 = time.perf_counter()
    outs = [fn(*args, **kw) for _ in range(reps)]
    _sync(outs[-1][0])
    return (time.perf_counter() - t0) / reps


def ray_sets(scene):
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
    # bounce-like: origins on a plane under the mesh, random hemisphere dirs
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
    args = ap.parse_args()
    scene = stage6_scene().compile()
    view = types.SimpleNamespace(tri=scene.ktab_tri[0], cl_box=scene.ktab_box[0])
    print(f"backend={jax.default_backend()} B={pt.B} RB={pt.RB} "
          f"clusters={view.tri.shape[0]}")
    tmax = jnp.full((N,), 1e30, jnp.float32)

    masks_fn = jax.jit(
        lambda ox, oy, oz, dx, dy, dz: pt._block_masks(
            ox, oy, oz, 1.0 / dx, 1.0 / dy, 1.0 / dz, 1e-4, tmax,
            view.cl_box, N // pt.B,
        )
    )

    trav = jax.jit(
        lambda o, d, sort: pt.traverse(
            o, d, tmax, view, 1e-4, interpret=False, sort_rays=sort
        ),
        static_argnames=("sort",),
    )

    for name, (o, d) in ray_sets(scene).items():
        dt_m = _time(
            lambda: (masks_fn(o.x, o.y, o.z, d.x, d.y, d.z),), reps=args.reps
        )
        for sort in (False, True):
            dt = _time(lambda: trav(o, d, sort), reps=args.reps)
            t, p = trav(o, d, sort)
            hits = int((np.asarray(p) >= 0).sum())
            print(
                f"{name:9s} sort={int(sort)} {dt*1e3:8.2f} ms "
                f"{N/dt/1e6:7.2f} Mrays/s  hits={hits}  "
                f"(mask phase alone {dt_m*1e3:.2f} ms)"
            )


if __name__ == "__main__":
    main()
