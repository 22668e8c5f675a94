"""Progressive rendering with checkpoint/resume.

The reference renders one-shot with no recovery (SURVEY §5: "no checkpointing
of partial renders"). Monte-Carlo accumulation is trivially resumable —
samples are additive — so this module renders in sample-chunks, persists the
running radiance SUM + sample count after each chunk, and resumes from the
newest checkpoint. Seeds are derived per sample index, so a resumed render is
bit-identical to an uninterrupted one.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Callable, Optional

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
    rays_traced: int

    @property
    def mrays_per_sec(self) -> float:
        return self.rays_traced / max(self.seconds, 1e-9) / 1e6


def render_progressive(
    scene: SceneData,
    config: RenderConfig,
    camera: PerspectiveCamera,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 1,
    on_progress: Optional[Callable[[RenderStats], None]] = None,
):
    """Render config.pixel_samples² samples/pixel in resumable chunks.

    Returns (image [H,W,3] mean radiance, RenderStats).
    """
    spp_total = config.pixel_samples**2
    n_pix = config.width * config.height
    chunk = max(1, min(spp_total, config.max_rays_per_pass // n_pix))

    acc = np.zeros((config.height, config.width, 3), np.float32)
    s_done = 0
    if checkpoint_path and os.path.exists(checkpoint_path):
        ck = np.load(checkpoint_path)
        if (
            ck["acc"].shape == acc.shape
            and int(ck["spp_total"]) == spp_total
            and int(ck["seed"]) == config.seed
        ):
            acc = ck["acc"].astype(np.float32)
            s_done = int(ck["samples_done"])

    nls = config.light_samples**2 if scene.n_lights else 0
    rays_per_lane = config.max_depth * (1 + 2 * nls)
    t0 = time.perf_counter()
    rays = 0
    chunks_since_save = 0
    while s_done < spp_total:
        hi = min(s_done + chunk, spp_total)
        si = jnp.arange(s_done, hi, dtype=jnp.int32)
        acc += np.asarray(_render_path_pass(scene, config, camera, si))
        rays += (hi - s_done) * n_pix * rays_per_lane
        s_done = hi
        chunks_since_save += 1
        if checkpoint_path and (
            chunks_since_save >= checkpoint_every or s_done >= spp_total
        ):
            tmp = checkpoint_path + ".tmp"
            np.savez(
                tmp if not tmp.endswith(".npz") else tmp[:-4],
                acc=acc,
                samples_done=s_done,
                spp_total=spp_total,
                seed=config.seed,
            )
            # numpy appends .npz; normalize and atomically replace
            produced = tmp if os.path.exists(tmp) else tmp + ".npz"
            os.replace(produced, checkpoint_path)
            chunks_since_save = 0
        if on_progress:
            on_progress(
                RenderStats(s_done, spp_total, time.perf_counter() - t0, rays)
            )

    stats = RenderStats(s_done, spp_total, time.perf_counter() - t0, rays)
    return acc / np.float32(spp_total), stats
