"""Progressive rendering with checkpoint/resume.

The reference renders one-shot with no recovery (SURVEY §5: "no checkpointing
of partial renders"). Monte-Carlo accumulation is trivially resumable —
samples are additive — so this module renders in sample-chunks, persists the
running radiance SUM + sample count after each chunk, and resumes from the
newest checkpoint. Seeds are derived per sample index, so a resumed render is
bit-identical to an uninterrupted one.

Checkpoints carry a digest of every render input (config fields, camera,
scene arrays); resume refuses a checkpoint whose digest mismatches instead of
silently blending incompatible partial accumulations.
"""

from __future__ import annotations

import dataclasses
import hashlib
import os
import sys
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.camera import PerspectiveCamera
from ..models.scene import SceneData
from ..utils.config import RenderConfig
from .pathtracer import _render_path_pass


@dataclasses.dataclass
class RenderStats:
    samples_done: int
    samples_total: int
    seconds: float
    rays_traced: int  # issued scene queries (see pathtrace_wave docstring)
    overflow: int = 0  # cluster-traversal truncations (Hit.overflow)

    @property
    def mrays_per_sec(self) -> float:
        return self.rays_traced / max(self.seconds, 1e-9) / 1e6


def render_inputs_digest(scene: SceneData, config: RenderConfig,
                         camera: PerspectiveCamera) -> str:
    """Stable digest of everything that determines the accumulated image."""
    h = hashlib.sha256()
    h.update(repr(config).encode())
    for leaf in jax.tree_util.tree_leaves((camera, scene)):
        arr = np.asarray(leaf)
        h.update(str(arr.shape).encode())
        h.update(arr.tobytes())
    return h.hexdigest()


def render_progressive(
    scene: SceneData,
    config: RenderConfig,
    camera: PerspectiveCamera,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 1,
    on_progress: Optional[Callable[[RenderStats], None]] = None,
    on_preview: Optional[Callable[[np.ndarray, RenderStats], None]] = None,
    mesh=None,
):
    """Render config.pixel_samples² samples/pixel in resumable chunks.

    ``on_preview`` (if given) receives the CURRENT mean-radiance image
    [H,W,3] and stats after every chunk — the live-viewer feed (the Qt
    window's image-watching role, Rayito_Stage7_QT/MainWindow.cpp:37-91).

    Returns (image [H,W,3] mean radiance, RenderStats). Large frames
    (width*height > config.max_rays_per_pass) are rendered in pixel-row
    bands per sample so a single launch never exceeds the wave budget;
    checkpoints are then per whole sample.

    ``mesh`` (a jax.sharding.Mesh) shards every chunk's wavefront across
    its devices via parallel/sharding.py — the multi-chip path with the
    full progressive surface (checkpoint/resume, stats, live preview).
    Per-lane counter-based seeding keeps the accumulated image bit-identical
    to the unsharded render and independent of the device count, so a
    checkpoint written sharded may resume unsharded and vice versa (the
    digest covers render inputs only, not the execution layout).
    """
    spp_total = config.pixel_samples**2
    w, h = config.width, config.height
    n_pix = w * h
    banded = mesh is None and n_pix > config.max_rays_per_pass

    digest = None
    acc = np.zeros((h, w, 3), np.float32)
    s_done = 0
    if checkpoint_path and os.path.exists(checkpoint_path):
        digest = render_inputs_digest(scene, config, camera)
        ck = np.load(checkpoint_path, allow_pickle=False)
        ck_digest = str(ck["digest"]) if "digest" in ck else None
        if ck["acc"].shape == acc.shape and ck_digest == digest:
            acc = ck["acc"].astype(np.float32)
            s_done = int(ck["samples_done"])
        else:
            print(
                f"[rayito_tpu] checkpoint {checkpoint_path} does not match "
                "the render inputs (digest/shape mismatch) — starting fresh",
                file=sys.stderr,
            )

    def save_checkpoint():
        nonlocal digest
        if digest is None:
            digest = render_inputs_digest(scene, config, camera)
        tmp = checkpoint_path + ".tmp"
        np.savez(
            tmp if not tmp.endswith(".npz") else tmp[:-4],
            acc=acc,
            samples_done=s_done,
            spp_total=spp_total,
            seed=config.seed,
            digest=digest,
        )
        # numpy appends .npz; normalize and atomically replace
        produced = tmp if os.path.exists(tmp) else tmp + ".npz"
        os.replace(produced, checkpoint_path)

    t0 = time.perf_counter()
    rays = 0
    overflow = 0
    chunks_since_save = 0
    if mesh is not None:
        # per-device wave budget scales the per-chunk sample count; chunks
        # below one full sample are handled by sharding's own lane chunking
        lane_budget = config.max_rays_per_pass * int(mesh.devices.size)
        chunk = max(1, min(spp_total, lane_budget // n_pix))
    else:
        chunk = 1 if banded else max(
            1, min(spp_total, config.max_rays_per_pass // n_pix)
        )
    while s_done < spp_total:
        hi = min(s_done + chunk, spp_total)
        si = jnp.arange(s_done, hi, dtype=jnp.int32)
        if mesh is not None:
            from ..parallel.sharding import sharded_lane_range

            acc_flat = acc.reshape(-1, 3)
            ovf, q = sharded_lane_range(
                scene, config, camera, mesh,
                s_done * n_pix, hi * n_pix, acc_flat,
            )
            overflow += int(ovf)
            rays += int(q)
        elif banded:
            # same band decomposition as render_path_with_stats: uniform
            # band height, last band shifted up and cropped
            band = max(1, config.max_rays_per_pass // w)
            n_bands = -(-h // band)
            outs = [
                _render_path_pass(
                    scene, config, camera, si, min(b * band, h - band), band
                )
                for b in range(n_bands)
            ]
            for b, (out, ovf, q) in enumerate(outs):
                r0 = min(b * band, h - band)
                skip = max(0, b * band - r0)
                acc[r0 + skip : r0 + band] += np.asarray(out)[skip:]
                overflow += int(ovf)
                rays += int(q)
        else:
            img, ovf, q = _render_path_pass(scene, config, camera, si)
            acc += np.asarray(img)
            overflow += int(ovf)
            rays += int(q)
        s_done = hi
        chunks_since_save += 1
        if checkpoint_path and (
            chunks_since_save >= checkpoint_every or s_done >= spp_total
        ):
            save_checkpoint()
            chunks_since_save = 0
        if on_progress or on_preview:
            st = RenderStats(
                s_done, spp_total, time.perf_counter() - t0, rays, overflow
            )
            if on_progress:
                on_progress(st)
            if on_preview:
                on_preview(acc / np.float32(max(s_done, 1)), st)

    if overflow:
        print(
            f"[rayito_tpu] WARNING: cluster-traversal candidate overflow x"
            f"{overflow} — K1/K2 budgets exceeded; nearest hits may have "
            "been dropped (see render/mesh_intersect.py)",
            file=sys.stderr,
        )
    stats = RenderStats(
        s_done, spp_total, time.perf_counter() - t0, rays, overflow
    )
    return acc / np.float32(spp_total), stats
