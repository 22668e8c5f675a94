"""Bench a >200k-triangle scene through the STREAMED kernel path.

Round-2's 12 MB ktab_fits cap silently dropped such scenes to the XLA
cluster pipeline (VERDICT r2 item 4); the streamed cluster-chunk kernel
removed the cap. This renders 5 shifted bumpy.obj instances (~5x59k
triangles, ~2300 clusters -> streamed chunks of TRI_CHUNK clusters) merged into ONE
world-space traversal domain and reports Mrays/s.

Run on TPU:  python tools/bench_big_scene.py
"""

import sys
import time


sys.path.insert(0, "/root/repo")

import jax.numpy as jnp  # noqa: E402


from rayito_tpu.models.camera import PerspectiveCamera  # noqa: E402
from rayito_tpu.models.demo import STAGE6_CAMERA  # noqa: E402
from rayito_tpu.render.pathtracer import _render_path_pass  # noqa: E402
from rayito_tpu.utils.config import RenderConfig  # noqa: E402


def main():
    from rayito_tpu.models.demo import big_streamed_scene

    scene = big_streamed_scene().compile()
    n_cl = scene.ktab_tri[0].shape[0]
    print(f"tris={scene.n_tris} clusters={n_cl} domains={len(scene.ktab_xf)} "
          f"traversal={scene.traversal} (streamed: {n_cl} > tri_chunk={scene.tri_chunk})",
          file=sys.stderr)
    assert scene.n_tris > 200_000 and scene.traversal in ("pallas", "xla")

    cfg = RenderConfig(width=512, height=512, pixel_samples=1,
                       light_samples=1, max_depth=3,
                       aspect_correction=True, max_rays_per_pass=1 << 17)
    cam = PerspectiveCamera.make(40.0, *STAGE6_CAMERA)
    band = min(cfg.height, cfg.max_rays_per_pass // cfg.width)
    si = jnp.arange(1, dtype=jnp.int32)
    img, _, _ = _render_path_pass(scene, cfg, cam, si, 0, band)
    _ = float(img.sum())
    frames = 3
    prof_dir = "/tmp/rayito_big_prof" if "--profile" in sys.argv else None
    import contextlib

    import jax

    prof = jax.profiler.trace(prof_dir) if prof_dir else contextlib.nullcontext()
    t0 = time.perf_counter()
    outs = []
    with prof:
        for _f in range(frames):
            for r0 in range(0, cfg.height, band):
                outs.append(_render_path_pass(
                    scene, cfg, cam, si, min(r0, cfg.height - band), band))
        _ = float(outs[-1][0].sum() + outs[0][0].sum())
    dt = (time.perf_counter() - t0) / frames
    if prof_dir:
        from rayito_tpu.utils.profiling import phase_table

        for label, ms, cnt in phase_table(prof_dir, divisor=frames):
            print(f"  {label:<45} {ms:8.2f} ms  ({cnt} ops)", file=sys.stderr)
    q = sum(int(x[2]) for x in outs)
    print(f"big-scene ({scene.n_tris} tris, streamed kernel): "
          f"{q / frames / dt / 1e6:.2f} Mrays/s  frame {dt*1e3:.1f} ms")


if __name__ == "__main__":
    main()
