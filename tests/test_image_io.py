"""Image IO / tonemap / diagnostics unit tests (SURVEY §2.8, §2.10).

PPM quantization is truncation-exact against the reference's cast
(Rayito_Stage1/main.cpp:126-131: clamp then static_cast<unsigned char>
(v * 255)); PFM is spec-valid binary (a DOCUMENTED deviation — the
reference's WRITE_PFM streams floats as formatted text after a binary
header, Rayito_Stage1/main.cpp:122); the tone map matches the GUI's
(value * 2^exposure)^(1/gamma) clamp (Rayito_Stage4_QT/MainWindow.cpp:
45-71); diagnostics mirror the blue-NaN / green-negative GUI coloring
(Rayito_Stage7_QT/MainWindow.cpp:53-69).
"""

import numpy as np

from rayito_tpu.utils.image import (
    diagnose,
    diagnostic_colors,
    quantize_ppm,
    read_pfm,
    read_ppm,
    tone_map,
    write_pfm,
    write_ppm,
)


def test_ppm_round_trip_and_truncation(tmp_path):
    rs = np.random.default_rng(3)
    img = rs.uniform(-0.1, 1.2, (7, 5, 3)).astype(np.float32)
    q = quantize_ppm(img)
    # truncation semantics: clamp to [0,1], then trunc(v*255)
    ref = (np.clip(img, 0.0, 1.0) * 255.0).astype(np.uint8)
    np.testing.assert_array_equal(q, ref)
    p = str(tmp_path / "t.ppm")
    write_ppm(p, img)
    np.testing.assert_array_equal(read_ppm(p), q)


def test_pfm_round_trip_exact(tmp_path):
    rs = np.random.default_rng(4)
    img = rs.normal(size=(6, 9, 3)).astype(np.float32) * 37.5
    img[0, 0, 0] = 1e-38  # denormal-adjacent survives
    p = str(tmp_path / "t.pfm")
    write_pfm(p, img)
    back = read_pfm(p)
    np.testing.assert_array_equal(back, img)  # bit-exact, top row first
    # header is spec-valid: PF, dims, negative scale = little-endian
    with open(p, "rb") as f:
        assert f.readline().strip() == b"PF"
        assert f.readline().split() == [b"9", b"6"]
        assert float(f.readline()) == -1.0


def test_tone_map_semantics():
    img = np.array([[[0.25, 1.0, 4.0]]], np.float32)
    out = tone_map(img, exposure=0.0, gamma=2.2)
    np.testing.assert_allclose(
        out[0, 0], [0.25 ** (1 / 2.2), 1.0, 1.0], rtol=1e-6
    )  # >1 clamps AFTER the power curve
    # exposure doubles radiance per stop, applied before gamma
    np.testing.assert_allclose(
        tone_map(img, exposure=1.0)[0, 0, 0],
        (0.5) ** (1 / 2.2),
        rtol=1e-6,
    )
    assert (tone_map(np.array([[[-3.0, 0.0, 0.5]]])) >= 0).all()


def test_diagnostics_mirror_gui_coloring():
    img = np.array(
        [[[np.nan, 0.0, 0.0], [-1.0, 0.5, 0.5], [0.2, 0.2, 0.2]]],
        np.float32,
    )
    d = diagnose(img)
    assert d["nan_pixels"] == 1 and d["negative_pixels"] == 1
    c = diagnostic_colors(img)
    np.testing.assert_array_equal(c[0, 0], [0.0, 0.0, 1.0])  # NaN -> blue
    np.testing.assert_array_equal(c[0, 1], [0.0, 1.0, 0.0])  # neg -> green
    np.testing.assert_array_equal(c[0, 2], img[0, 2])
