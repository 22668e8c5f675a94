"""MWC oracle mode: replay the reference's exact RNG stream (SURVEY §7).

tools/oracle/mwc_oracle.cpp re-derives the stage-2/3 renderers with the
reference's sequential Marsaglia multiply-with-carry consumption order and
f32 arithmetic. Measured results this pins (2026-08-17, g++ -O2
-ffp-contract=off, glibc libm):

  * stage 2: the oracle reproduces Rayito_Stage2/out_ref.ppm BIT-EXACTLY
    (all 786k bytes equal) with right-to-left argument evaluation for the
    two sampleSurface draws — mechanical end-to-end verification of the
    camera math, plane/rect intersections, MWC recurrence, shading,
    clamp/quantize, and PPM conventions this package mirrors.
  * stage 3: 2.88% RMSE, 64.6% of pixels exact; the sky/light region
    (rows 0-128) is ~100% exact while the ground plane diverges. The
    divergence is CHAOS, not semantics: recompiling the SAME oracle with
    fused-multiply-add contraction (-mfma -ffp-contract=fast — a 1-ulp
    class perturbation) moves its own output by 1.90% RMSE / 57% of pixels.
    The stage-3 estimator races the sphere-ShapeLight's own quadratic root
    against the shadow tMax (the sampled point IS the first intersection,
    Rayito_Stage3/main.cpp:131-141, self-occlusion pointer quirk SURVEY
    §2.11.7), so last-ulp rounding decides per-sample visibility. No
    reimplementation can beat ~2-3% RMSE against that golden without
    replicating the original compiler's exact instruction selection.

This is the evidence behind the calibrated stage-3 bound in
test_golden_direct.py.
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

from rayito_tpu.utils.image import read_ppm

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(REPO, "tools", "oracle", "mwc_oracle.cpp")
REF2 = "/root/reference/Rayito_Stage2/out_ref.ppm"
REF3 = "/root/reference/Rayito_Stage3/out_ref.ppm"

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(shutil.which("g++") is None, reason="no g++"),
    pytest.mark.skipif(not os.path.exists(REF2), reason="reference not mounted"),
]


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    exe = tmp_path_factory.mktemp("oracle") / "mwc_oracle"
    subprocess.run(
        ["g++", "-O2", "-ffp-contract=off", "-o", str(exe), SRC], check=True
    )
    return str(exe)


def _render(oracle, stage, out, order="rtl"):
    subprocess.run([oracle, str(stage), out, order], check=True, timeout=300)
    return read_ppm(out).astype(int)


def test_stage2_oracle_bit_exact(oracle, tmp_path):
    """The full 512x512x64spp stage-2 golden, reproduced byte-for-byte."""
    img = _render(oracle, 2, str(tmp_path / "s2.ppm"))
    ref = read_ppm(REF2).astype(int)
    assert (img == ref).all(), f"max diff {np.abs(img - ref).max()}"


def test_stage3_oracle_chaos_floor(oracle, tmp_path):
    """Stage 3 sits at the knife-edge chaos floor: sky exact, global ~3%."""
    img = _render(oracle, 3, str(tmp_path / "s3.ppm"))
    ref = read_ppm(REF3).astype(int)
    diff = img - ref
    rmse = float(np.sqrt((diff.astype(float) ** 2).mean())) / 255.0
    assert rmse < 0.04, f"oracle-vs-golden RMSE {rmse:.4f} regressed"
    exact = (diff == 0).all(axis=2)
    # chaos-free region: the sky + light band has no sphere-light shadows
    assert exact[:128].mean() > 0.99, f"sky exactness {exact[:128].mean():.4f}"
    # and the oracle must still agree for most pixels globally
    assert exact.mean() > 0.55, f"global exactness {exact.mean():.4f}"
