"""Benchmark: Mrays/sec/chip on the stage-6 bumpy.obj BVH scene.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is measured Mrays/s divided by the 50 Mrays/s/chip target
(BASELINE.json north_star).

Ray accounting (honest, counted on-device): the scene-intersection queries
the integrator semantically ISSUES — alive-lane traces, NEE shadow
occlusions on lanes whose masks require one, and NEE BRDF-side traces.
Dead lanes and masked-off queries do NOT count, so the metric cannot be
inflated by dense-lane padding and stays comparable when lane-compaction
optimizations land (it only gets harder to hit).
"""

import argparse
import contextlib
import json
import sys
import time

import jax
import jax.numpy as jnp

from rayito_tpu.models.camera import PerspectiveCamera
from rayito_tpu.models.demo import STAGE6_CAMERA, stage6_scene
from rayito_tpu.render.pathtracer import _render_path_pass
from rayito_tpu.utils.config import RenderConfig

TARGET_MRAYS = 50.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--profile",
        nargs="?",
        const="/tmp/rayito_bench_prof",
        default=None,
        metavar="LOGDIR",
        help="capture a jax.profiler trace of the timed frames and print a "
        "per-phase device-time table to stderr (SURVEY §5)",
    )
    args = ap.parse_args()
    width, height = 512, 512
    cfg = RenderConfig(
        width=width,
        height=height,
        pixel_samples=2,  # 4 spp per pass chunk below
        light_samples=1,
        max_depth=3,
        aspect_correction=True,
        max_rays_per_pass=1 << 17,  # 131k-lane row bands: best measured
        # throughput (larger waves hit HBM pressure from [N, K] intermediates)
    )
    scene = stage6_scene().compile()
    cam = PerspectiveCamera.make(
        30.0, *STAGE6_CAMERA, focal_distance=16.0, lens_radius=0.0
    )

    si = jnp.arange(1, dtype=jnp.int32)  # one sample per launch; row bands
    band = min(height, cfg.max_rays_per_pass // width)
    # warmup / compile (row0 is traced: one executable covers all bands)
    img, _, _ = _render_path_pass(scene, cfg, cam, si, 0, band)
    _ = float(img.sum())

    frames = 3
    prof = (
        jax.profiler.trace(args.profile)
        if args.profile
        else contextlib.nullcontext()
    )
    t0 = time.perf_counter()
    with prof:
        outs = []
        for _ in range(frames):
            for r0 in range(0, height, band):
                outs.append(
                    _render_path_pass(
                        scene, cfg, cam, si, min(r0, height - band), band
                    )
                )
        # one hard sync at the end (block_until_ready does not reliably
        # block through the axon relay; a scalar readback does)
        _ = float(outs[-1][0].sum() + outs[0][0].sum())
    dt = (time.perf_counter() - t0) / frames

    if args.profile:
        from rayito_tpu.utils.profiling import phase_table

        print(f"per-frame device-time phases ({frames} frames):",
              file=sys.stderr)
        for label, ms, cnt in phase_table(args.profile, divisor=frames):
            print(f"  {label:<45} {ms:8.2f} ms  ({cnt} ops)", file=sys.stderr)

    # issued-query counters were computed on-device during the timed region;
    # reading them back now costs nothing against the measurement
    queries = sum(int(q) for _, _, q in outs)
    mrays = queries / frames / dt / 1e6

    print(
        json.dumps(
            {
                "metric": "stage6_bumpy_bvh_path_trace",
                "value": round(mrays, 3),
                "unit": "Mrays/s/chip",
                "vs_baseline": round(mrays / TARGET_MRAYS, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
