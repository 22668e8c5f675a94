"""Op-level device-time profile of one bench band (run on the TPU chip).

Captures a jax.profiler trace of `_render_path_pass` on the stage-6 bench
configuration, parses the perfetto trace, and prints the top ops by total
device time with their HLO category. Drives the fusion/perf work; not part
of the test suite.

Usage: python tools/frame_profile.py [--top 30] [--depth 3] [--nee 1]
"""

import argparse
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--depth", type=int, default=3)
    ap.add_argument("--light-samples", type=int, default=1)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--logdir", default="/tmp/rayito_prof")
    args = ap.parse_args()

    from rayito_tpu.models.camera import PerspectiveCamera
    from rayito_tpu.models.demo import STAGE6_CAMERA, stage6_scene
    from rayito_tpu.render.pathtracer import _render_path_pass
    from rayito_tpu.utils.config import RenderConfig

    width, height = 512, 512
    cfg = RenderConfig(
        width=width,
        height=height,
        pixel_samples=2,
        light_samples=args.light_samples,
        max_depth=args.depth,
        aspect_correction=True,
        max_rays_per_pass=1 << 17,
    )
    scene = stage6_scene().compile()
    cam = PerspectiveCamera.make(
        30.0, *STAGE6_CAMERA, focal_distance=16.0, lens_radius=0.0
    )
    si = jnp.arange(1, dtype=jnp.int32)
    band = min(height, cfg.max_rays_per_pass // width)

    img, _, _ = _render_path_pass(scene, cfg, cam, si, 0, band)
    _ = float(img.sum())
    t0 = time.perf_counter()
    for _ in range(args.reps):
        img, _, _ = _render_path_pass(scene, cfg, cam, si, 0, band)
    _ = float(img.sum())
    wall = (time.perf_counter() - t0) / args.reps
    print(f"band wall: {wall * 1e3:.1f} ms ({band} rows x {width})")

    os.system(f"rm -rf {args.logdir}")
    with jax.profiler.trace(args.logdir):
        for _ in range(args.reps):
            img, _, _ = _render_path_pass(scene, cfg, cam, si, 0, band)
        _ = float(img.sum())

    from rayito_tpu.utils.profiling import collect_device_ops, phase_table

    ops = collect_device_ops(args.logdir)
    if not ops:
        print("no trace found", file=sys.stderr)
        return
    total = sum(us for us, _ in ops.values())
    print(f"total device op time: {total / 1e3 / args.reps:.1f} ms/band")
    print(f"{'op':<60} {'ms/band':>9} {'count':>6} {'pct':>6}")
    for name, (us, cnt) in sorted(ops.items(), key=lambda kv: -kv[1][0])[
        : args.top
    ]:
        print(
            f"{name[:60]:<60} {us / 1e3 / args.reps:9.2f} "
            f"{cnt // args.reps:6d} {us / total * 100:5.1f}%"
        )
    print("\nphase rollup:")
    for label, ms, cnt in phase_table(args.logdir, divisor=args.reps):
        print(f"  {label:<45} {ms:8.2f} ms  ({cnt} ops)")


if __name__ == "__main__":
    main()
