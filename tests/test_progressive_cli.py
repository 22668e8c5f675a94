"""Progressive checkpoint/resume + CLI smoke tests."""

import dataclasses
import os
import subprocess
import sys

import numpy as np
import pytest

import rayito_tpu as rt
from rayito_tpu.models.camera import PerspectiveCamera
from rayito_tpu.models.demo import STAGE5_CAMERA, stage5_scene
from rayito_tpu.render.progressive import render_progressive
from rayito_tpu.utils.config import RenderConfig


def test_checkpoint_resume_bit_identical(tmp_path):
    """A crashed-and-resumed render equals an uninterrupted one exactly
    (samples are keyed by index, not sequential state)."""
    scene = stage5_scene().compile()
    cam = PerspectiveCamera.make(30.0, *STAGE5_CAMERA)
    cfg = RenderConfig(width=32, height=24, pixel_samples=4, light_samples=1,
                      max_depth=2, max_rays_per_pass=32 * 24 * 4)
    ck = str(tmp_path / "ck.npz")

    img_full, stats = render_progressive(scene, cfg, cam)
    assert stats.samples_done == 16
    assert stats.rays_traced > 0

    def interrupt(st):
        if st.samples_done >= 8:
            raise KeyboardInterrupt

    with pytest.raises(KeyboardInterrupt):
        render_progressive(scene, cfg, cam, checkpoint_path=ck,
                           on_progress=interrupt)
    assert os.path.exists(ck)
    img_res, _ = render_progressive(scene, cfg, cam, checkpoint_path=ck)
    np.testing.assert_array_equal(img_full, img_res)


def test_checkpoint_ignored_on_config_mismatch(tmp_path):
    scene = stage5_scene().compile()
    cam = PerspectiveCamera.make(30.0, *STAGE5_CAMERA)
    cfg = RenderConfig(width=16, height=12, pixel_samples=2, light_samples=1,
                      max_depth=1)
    ck = str(tmp_path / "ck.npz")
    render_progressive(scene, cfg, cam, checkpoint_path=ck)
    # different seed -> stale checkpoint must be discarded, not resumed
    cfg2 = dataclasses.replace(cfg, seed=99)
    img2, stats2 = render_progressive(scene, cfg2, cam, checkpoint_path=ck)
    assert stats2.samples_done == 4


@pytest.mark.slow
def test_cli_renders_ppm(tmp_path):
    out = str(tmp_path / "out.ppm")
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    r = subprocess.run(
        [sys.executable, "-m", "rayito_tpu.cli", "--scene", "stage1",
         "--width", "64", "--height", "64", "-o", out],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r.returncode == 0, r.stderr
    from rayito_tpu.utils.image import read_ppm

    img = read_ppm(out)
    assert img.shape == (64, 64, 3)
    assert "nan=0" in r.stderr


@pytest.mark.slow
def test_cli_sharded_matches_unsharded(tmp_path):
    """--sharded over the 8-virtual-device CPU mesh must write the exact
    same PPM bytes as the plain path (the §2.9 determinism contract at the
    CLI surface, not just the library API)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outs = {}
    for label, extra in (("plain", []), ("sharded", ["--sharded"])):
        out = str(tmp_path / f"{label}.ppm")
        env = dict(
            os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=repo,
            XLA_FLAGS=os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8",
        )
        r = subprocess.run(
            [sys.executable, "-m", "rayito_tpu.cli", "--scene", "stage5",
             "--width", "48", "--height", "32", "--pixel-samples", "2",
             "--depth", "2", "-o", out] + extra,
            capture_output=True, text=True, env=env, timeout=600,
        )
        assert r.returncode == 0, r.stderr
        with open(out, "rb") as f:
            outs[label] = f.read()
    assert outs["plain"] == outs["sharded"]
