"""Interleaved frame-level A/B of a compile-time SceneData option.

The only accepted evidence protocol for default changes (BENCH_NOTES.md):
back-to-back interleaved pairs on an idle host — same-code throughput drifts
9.7-11.6 Mrays/s on ~hour scales through the relay, so sequential sweeps are
meaningless at the few-percent level.

Usage:
  python tools/frame_ab.py --field share_occl_sort --a 0 --b 1
  python tools/frame_ab.py --scene big --field share_occl_sort --a 0 --b 1
  python tools/frame_ab.py --field max_depth --a 3 --b 8   (RenderConfig)

Also asserts the two configs' images agree bit-for-bit (a pure-perf knob
must not change output).
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from rayito_tpu.models.camera import PerspectiveCamera
from rayito_tpu.models.demo import (
    STAGE6_CAMERA,
    STAGE7_SCENE2_CAMERA,
    big_streamed_scene,
    stage6_scene,
    stage7_scene2,
)
from rayito_tpu.render.pathtracer import _render_path_frame
from rayito_tpu.utils.config import RenderConfig


def make(scene_name):
    if scene_name == "stage6":
        cfg = RenderConfig(width=512, height=512, pixel_samples=2,
                           light_samples=1, max_depth=3,
                           aspect_correction=True, max_rays_per_pass=1 << 17)
        return (stage6_scene(),
                PerspectiveCamera.make(30.0, *STAGE6_CAMERA,
                                       focal_distance=16.0, lens_radius=0.0),
                cfg)
    if scene_name == "stage7b":
        cfg = RenderConfig(width=512, height=256, pixel_samples=1,
                           light_samples=1, max_depth=3,
                           aspect_correction=True, max_rays_per_pass=1 << 17)
        return (stage7_scene2(),
                PerspectiveCamera.make(30.0, *STAGE7_SCENE2_CAMERA,
                                       focal_distance=16.0, lens_radius=0.0,
                                       shutter_open=0.0, shutter_close=1.0),
                cfg)
    if scene_name == "big":
        cfg = RenderConfig(width=512, height=512, pixel_samples=1,
                           light_samples=1, max_depth=3,
                           aspect_correction=True, max_rays_per_pass=1 << 17)
        return (big_streamed_scene(),
                PerspectiveCamera.make(40.0, *STAGE6_CAMERA),
                cfg)
    raise SystemExit(f"unknown scene {scene_name}")


def frame_args(cfg):
    band = min(cfg.height, cfg.max_rays_per_pass // cfg.width)
    r0s = [min(r0, cfg.height - band) for r0 in range(0, cfg.height, band)]
    return (jnp.zeros((len(r0s), 1), jnp.int32),
            jnp.asarray(r0s, jnp.int32), band)


def run_frames(scene, cfg, cam, si_mat, row0s, band, frames):
    t0 = time.perf_counter()
    outs = [
        _render_path_frame(scene, cfg, cam, si_mat, row0s, band)
        for _ in range(frames)
    ]
    _ = float(outs[-1][0].sum() + outs[0][0].sum())  # relay-safe sync
    dt = (time.perf_counter() - t0) / frames
    q = sum(int(x[2]) for x in outs)
    return q / frames / dt / 1e6, outs[0][0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="stage6",
                    choices=["stage6", "stage7b", "big"])
    ap.add_argument("--field", required=True)
    ap.add_argument("--a", required=True)
    ap.add_argument("--b", required=True)
    ap.add_argument("--pairs", type=int, default=3)
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--depth", type=int, default=None,
                    help="override max_depth on BOTH sides (e.g. prune A/B "
                    "at depth 8)")
    args = ap.parse_args()

    builder, cam, cfg = make(args.scene)
    if args.depth is not None:
        cfg = dataclasses.replace(cfg, max_depth=args.depth)
    COMPILE_FIELDS = ("static_split", "cluster_cuts", "traverse_mt")
    scene0 = None if args.field in COMPILE_FIELDS else builder.compile()

    def coerce(v, cur):
        return type(cur)(int(v)) if isinstance(cur, (bool, int)) else v

    variants = {}
    for tag, val in (("A", args.a), ("B", args.b)):
        if args.field in COMPILE_FIELDS:
            kw = {args.field: val if args.field == "traverse_mt"
                  else (val if args.field == "cluster_cuts" else int(val))}
            variants[tag] = (builder.compile(**kw), cfg)
        elif hasattr(cfg, args.field):
            c2 = dataclasses.replace(
                cfg, **{args.field: coerce(val, getattr(cfg, args.field))}
            )
            variants[tag] = (scene0, c2)
        else:
            cur = getattr(scene0, args.field)
            variants[tag] = (
                dataclasses.replace(scene0, **{args.field: coerce(val, cur)}),
                cfg,
            )

    # warm both executables, keep warmup images for the identity check
    imgs = {}
    for tag, (sc, c2) in variants.items():
        fa = frame_args(c2)
        m, img = run_frames(sc, c2, cam, *fa, 1)
        imgs[tag] = np.asarray(img)
        val = args.a if tag == "A" else args.b
        print(f"warm {tag} ({args.field}={val}): {m:.2f} Mrays/s", flush=True)
    if imgs["A"].shape == imgs["B"].shape:
        same = np.array_equal(imgs["A"], imgs["B"])
        print(f"images bit-identical: {same}", flush=True)

    res = {"A": [], "B": []}
    for p in range(args.pairs):
        for tag in ("A", "B") if p % 2 == 0 else ("B", "A"):
            sc, c2 = variants[tag]
            m, _ = run_frames(sc, c2, cam, *frame_args(c2), args.frames)
            res[tag].append(m)
            print(f"pair {p} {tag}: {m:.2f} Mrays/s", flush=True)
    for tag in ("A", "B"):
        v = res[tag]
        print(f"{tag}: {' '.join(f'{x:.2f}' for x in v)}  "
              f"median {sorted(v)[len(v) // 2]:.2f}")


if __name__ == "__main__":
    main()
