"""Benchmark: Mrays/sec/chip on the reference demo scenes.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", "extra"}:
  * the headline metric is the stage-6 bumpy.obj BVH scene (BASELINE.json's
    north star: 50 Mrays/s/chip);
  * "extra" carries the stage-7 scene-2 motion/many-shape config
    (10 kinematic spheres + 10 tumbling cubes, BENCH_NOTES.md) — the
    BASELINE.md-tracked animated scene.

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
from rayito_tpu.models.demo import (
    STAGE6_CAMERA,
    STAGE7_SCENE2_CAMERA,
    big_streamed_scene,
    stage6_scene,
    stage7_scene2,
)
from rayito_tpu.render.pathtracer import _render_path_frame
from rayito_tpu.utils.config import RenderConfig

TARGET_MRAYS = 50.0


def time_config(scene, cam, cfg, frames=10, profile_dir=None, windows=1):
    """Time ``windows`` back-to-back windows of ``frames`` full frames of
    row-banded 1-sample launches. Returns a list of per-window Mrays/s
    (issued queries / wall time) — multiple windows let the artifact carry
    the same-session SPREAD (the relay host drifts 12.3-13.7 on identical
    code across hours, so a single number under-informs round-over-round
    comparisons; see BENCH_NOTES measurement protocol)."""
    height = cfg.height
    band = min(height, cfg.max_rays_per_pass // cfg.width)
    # one fused dispatch per frame: sample 0 over all row bands (the
    # launch grid _render_path_frame scans over on-device)
    r0s = [min(r0, height - band) for r0 in range(0, height, band)]
    si_mat = jnp.zeros((len(r0s), 1), jnp.int32)
    row0s = jnp.asarray(r0s, jnp.int32)
    # warmup / compile (row0 is traced: one executable covers all bands)
    img, _, _ = _render_path_frame(scene, cfg, cam, si_mat, row0s, band)
    _ = float(img.sum())

    results = []
    for w in range(windows):
        prof = (
            jax.profiler.trace(profile_dir)
            if profile_dir and w == 0
            else contextlib.nullcontext()
        )
        t0 = time.perf_counter()
        with prof:
            outs = []
            for _ in range(frames):
                outs.append(
                    _render_path_frame(scene, cfg, cam, si_mat, row0s, band)
                )
            # one hard sync at the end (block_until_ready does not reliably
            # block through the axon relay; a scalar readback does)
            _ = float(outs[-1][0].sum() + outs[0][0].sum())
        dt = (time.perf_counter() - t0) / frames

        # issued-query counters were computed on-device during the timed
        # region; reading them back now costs nothing vs the measurement
        queries = sum(int(q) for _, _, q in outs)
        results.append(queries / frames / dt / 1e6)
    return results


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
    ap.add_argument(
        "--skip-motion", action="store_true",
        help="headline stage-6 metric only (skip the stage-7b extra)",
    )
    ap.add_argument(
        "--skip-big", action="store_true",
        help="skip the 245k-triangle streamed-scene extra",
    )
    args = ap.parse_args()

    cfg6 = RenderConfig(
        width=512,
        height=512,
        pixel_samples=2,  # 4 spp per pass chunk below
        light_samples=1,
        max_depth=3,
        aspect_correction=True,
        max_rays_per_pass=1 << 17,  # 131k-lane row bands: best measured
        # throughput (larger waves hit HBM pressure from [N, K] intermediates)
    )
    scene6 = stage6_scene().compile()
    cam6 = PerspectiveCamera.make(
        30.0, *STAGE6_CAMERA, focal_distance=16.0, lens_radius=0.0
    )
    windows6 = time_config(
        scene6, cam6, cfg6, profile_dir=args.profile,
        windows=1 if args.profile else 3,
    )
    mrays6 = sorted(windows6)[len(windows6) // 2]  # median window

    if args.profile:
        from rayito_tpu.utils.profiling import phase_table

        print("per-frame device-time phases (10 frames):", file=sys.stderr)
        for label, ms, cnt in phase_table(args.profile, divisor=10):
            print(f"  {label:<45} {ms:8.2f} ms  ({cnt} ops)", file=sys.stderr)

    extra = {"stage6_windows": [round(w, 3) for w in windows6]}
    if not args.skip_motion:
        # stage-7 scene 2: the BASELINE.md-tracked animated/motion-blur
        # config (512x256, 1 spp, depth 3 — BENCH_NOTES.md "Many-mesh
        # datapoint")
        cfg7 = RenderConfig(
            width=512,
            height=256,
            pixel_samples=1,
            light_samples=1,
            max_depth=3,
            aspect_correction=True,
            max_rays_per_pass=1 << 17,
        )
        scene7 = stage7_scene2().compile()
        cam7 = PerspectiveCamera.make(
            30.0, *STAGE7_SCENE2_CAMERA,
            focal_distance=16.0, lens_radius=0.0,
            shutter_open=0.0, shutter_close=1.0,
        )
        extra["stage7b_motion_path_trace"] = round(
            time_config(scene7, cam7, cfg7)[0], 3
        )

    if not args.skip_big:
        # 245k-triangle streamed-kernel scene (VERDICT r3 item 5): the
        # design's worst tracked number — union density across 5
        # overlapping instances — recorded in the driver artifact so it
        # cannot silently regress (BENCH_NOTES.md "Big-scene datapoint")
        cfg_big = RenderConfig(
            width=512,
            height=512,
            pixel_samples=1,
            light_samples=1,
            max_depth=3,
            aspect_correction=True,
            max_rays_per_pass=1 << 17,
        )
        scene_big = big_streamed_scene().compile()
        cam_big = PerspectiveCamera.make(40.0, *STAGE6_CAMERA)
        big_w = time_config(scene_big, cam_big, cfg_big, frames=3, windows=3)
        extra["big_245k_streamed_path_trace"] = round(
            sorted(big_w)[len(big_w) // 2], 3
        )
        extra["big_windows"] = [round(w, 3) for w in big_w]

    print(
        json.dumps(
            {
                "metric": "stage6_bumpy_bvh_path_trace",
                "value": round(mrays6, 3),
                "unit": "Mrays/s/chip",
                "vs_baseline": round(mrays6 / TARGET_MRAYS, 4),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
