"""Stage-1 golden-image parity: deterministic scene must match out_ref.ppm
(BASELINE.md: 'stage 1 should be ~bit-exact')."""

import os

import numpy as np
import pytest

from rayito_tpu.models.demo import STAGE1_CAMERA, STAGE1_FOV, stage1_scene
from rayito_tpu.render.integrator import render_color
from rayito_tpu.utils.config import CONFIG_STAGE123
from rayito_tpu.utils.image import quantize_ppm, read_ppm, rmse_8bit

GOLDEN = "/root/reference/Rayito_Stage1/out_ref.ppm"


@pytest.mark.skipif(not os.path.exists(GOLDEN), reason="reference not mounted")
def test_stage1_matches_golden():
    scene = stage1_scene().compile()
    img = render_color(scene, CONFIG_STAGE123, fov=STAGE1_FOV, camera=STAGE1_CAMERA)
    ours = quantize_ppm(img)
    ref = read_ppm(GOLDEN)
    assert ours.shape == ref.shape
    diff = np.abs(ours.astype(int) - ref.astype(int))
    exact = (diff == 0).all(axis=-1).mean()
    # Deterministic scene: expect near bit-exactness; tolerate ±1 LSB from
    # float associativity differences on a tiny fraction of pixels.
    assert diff.max() <= 1, f"max channel diff {diff.max()}"
    assert exact > 0.995, f"only {exact:.4%} pixels bit-exact"
    assert rmse_8bit(ours, ref) < 0.02
