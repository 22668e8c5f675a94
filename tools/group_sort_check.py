"""Offline A/B: union density cost of quantizing the coherence sort to
16-ray groups.

Why: the per-ray sort's row gather moves f32[N, 8] rows whose 8-lane minor
dim pads to 128 lanes on TPU (16x physical traffic — ~237 us of a ~500 us
sort+gather bill per 131k-ray launch, bench profile r3). If rays are
sorted in GROUPS of 16 consecutive wavefront lanes (group key = min of the
group's packed keys), the permutation moves dense [N/16, 128] rows with
ZERO padding and the key sort shrinks 16x. The price is coherence: a
group's 16 rays ride together, so block unions can only widen.

This tool scores that price the same way density_sort_check does: total
slab-hit cluster visits across live 128-ray blocks (proportional to the
traversal kernel's MT-block count), on camera and bounce-like populations
of the stage-6 scene. Camera rays arrive in pixel order (16 consecutive
lanes are 16 adjacent pixels — near-identical keys), so the expected
penalty there is ~0; the open question is bounce/shadow rays.

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

from density_sort_check import slab  # noqa: E402


def score(hit, order):
    h = hit[order]
    nb = h.shape[0] // B
    blk = h[: nb * B].reshape(nb, B, -1).any(axis=1)
    du = blk.sum(1)
    live = du > 0
    return du[live].sum(), du[live].mean(), np.percentile(du[live], 90)


def main():
    scene = stage6_scene().compile(traversal="xla")
    box = np.asarray(scene.ktab_box[0])

    cam = PerspectiveCamera.make(30.0, *STAGE6_CAMERA)
    rs = np.random.default_rng(0)
    n = 1 << 15

    pops = {}
    # camera rays in PIXEL ORDER (the wavefront layout the sort sees)
    pix = np.arange(n)
    px = ((pix % 512) / 512.0).astype(np.float32)
    py = ((pix // 512) / 512.0 * 4).astype(np.float32)  # 64 rows
    z = jnp.zeros((n,), jnp.float32)
    o_, d_, _ = cam.make_rays(jnp.asarray(px), jnp.asarray(py), z, z, z)
    o_cam = np.stack([np.asarray(o_.x), np.asarray(o_.y), np.asarray(o_.z)], 1)
    d_cam = np.stack([np.asarray(d_.x), np.asarray(d_.y), np.asarray(d_.z)], 1)
    pops["camera"] = (o_cam, d_cam)

    # bounce-like: origins on the geometry in PIXEL ORDER, random dirs
    hit0, near0 = slab(box, o_cam, d_cam, 1e-4, np.full(n, 1e30, np.float32))
    t_ent = np.where(hit0, near0, np.inf).min(axis=1)
    ok = np.isfinite(t_ent)
    o_b = (o_cam + d_cam * t_ent[:, None])[ok]
    dirs = rs.normal(size=(o_b.shape[0], 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    pops["bounce"] = (o_b.astype(np.float32), dirs.astype(np.float32))

    for name, (o, d) in pops.items():
        m = (o.shape[0] // 16) * 16
        o, d = o[:m], d[:m]
        tmax = np.full(m, 1e30, np.float32)
        hit, _ = slab(box, o, d, 1e-4, tmax)

        key = np.asarray(_coherence_key(
            *(jnp.asarray(o[:, k]) for k in range(3)),
            *(jnp.asarray(d[:, k]) for k in range(3)),
            jnp.asarray(tmax), jnp.asarray(box), 1e-4,
        ))
        # the packed 1-op sort keeps the top 13 bits of the key
        key13 = (key >> 17).astype(np.int64)

        orders = {}
        orders["per-ray (prod)"] = np.argsort(key13, kind="stable")
        for g in (8, 16, 32):
            gk = key13[: m // g * g].reshape(-1, g).min(axis=1)
            gperm = np.argsort(gk, kind="stable")
            orders[f"group-{g} (min key)"] = (
                gperm[:, None] * g + np.arange(g)[None, :]
            ).reshape(-1)
        gk0 = key13.reshape(-1, 16)[:, 0]
        gperm = np.argsort(gk0, kind="stable")
        orders["group-16 (first key)"] = (
            gperm[:, None] * 16 + np.arange(16)[None, :]
        ).reshape(-1)

        print(f"[{name}] {m} rays")
        base = None
        for label, order in orders.items():
            tot, mean, p90 = score(hit, order)
            if base is None:
                base = tot
            print(
                f"  {label:<22} visits {tot:7.0f} ({tot / base:5.3f}x)"
                f"  mean {mean:6.2f}  p90 {p90:5.1f}"
            )


if __name__ == "__main__":
    main()
