"""Image buffers and PPM/PFM IO.

Replaces the reference's ``Image`` heap buffer + inline PPM writer
(Rayito_Stage7_QT/rayito.h:25-44, Rayito_Stage1/main.cpp:77-133) and the Qt
tone-mapping/diagnostic display (Rayito_Stage7_QT/MainWindow.cpp:37-91).

Framebuffers are float32 [H, W, 3] numpy/jnp arrays in *screen* orientation
(row 0 = top of image, matching PPM's top-down layout).
"""

from __future__ import annotations

import numpy as np


def write_ppm(path: str, img) -> None:
    """Binary P6 PPM, clamped to [0,1] then scaled by 255 and truncated —
    byte = (uchar)(c * 255), exactly like the reference
    (Rayito_Stage1/main.cpp:125-132)."""
    img = np.asarray(img, dtype=np.float32)
    h, w = img.shape[0], img.shape[1]
    clamped = np.clip(img, 0.0, 1.0)
    data = (clamped * 255.0).astype(np.uint8)  # C-style float->uchar truncation
    with open(path, "wb") as f:
        f.write(b"P6\n%d %d\n255\n" % (w, h))
        f.write(data.tobytes())


def quantize_ppm(img) -> np.ndarray:
    """Return the uint8 image exactly as write_ppm would encode it."""
    img = np.asarray(img, dtype=np.float32)
    return (np.clip(img, 0.0, 1.0) * 255.0).astype(np.uint8)


def read_ppm(path: str) -> np.ndarray:
    """Read a binary P6 PPM into a uint8 [H, W, 3] array. Handles comment
    lines and arbitrary whitespace in the header."""
    with open(path, "rb") as f:
        raw = f.read()
    # Parse header tokens: magic, width, height, maxval.
    tokens = []
    i = 0
    while len(tokens) < 4:
        # skip whitespace
        while i < len(raw) and raw[i : i + 1].isspace():
            i += 1
        if raw[i : i + 1] == b"#":  # comment to end of line
            while i < len(raw) and raw[i : i + 1] != b"\n":
                i += 1
            continue
        start = i
        while i < len(raw) and not raw[i : i + 1].isspace():
            i += 1
        tokens.append(raw[start:i])
    if tokens[0] != b"P6":
        raise ValueError(f"not a binary PPM: {tokens[0]!r}")
    w, h, maxval = int(tokens[1]), int(tokens[2]), int(tokens[3])
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    i += 1  # single whitespace after maxval
    data = np.frombuffer(raw, dtype=np.uint8, count=w * h * 3, offset=i)
    return data.reshape(h, w, 3)


def write_pfm(path: str, img) -> None:
    """Color PFM, the role of the reference's WRITE_PFM HDR switch
    (Rayito_Stage1/main.cpp:55-57,79-83,122) — with its bugs fixed, a
    documented deviation: the reference streams each float through
    ofstream operator<< AFTER the binary header, i.e. unparseable ASCII
    with no separators (its own comment: "if you can find a viewer that
    will read it"), and emits rows top-down against the spec's bottom-up
    convention. We write spec-valid little-endian (-1.0 scale) binary
    floats, rows bottom-up, so standard viewers read it upright."""
    img = np.asarray(img, dtype=np.float32)
    h, w = img.shape[0], img.shape[1]
    with open(path, "wb") as f:
        f.write(b"PF\n%d %d\n-1.0\n" % (w, h))
        f.write(img[::-1].astype("<f4").tobytes())


def read_pfm(path: str) -> np.ndarray:
    """Inverse of write_pfm: [H, W, 3] float32, top row first."""
    with open(path, "rb") as f:
        assert f.readline().strip() == b"PF"
        w, h = (int(v) for v in f.readline().split())
        scale = float(f.readline())
        dt = "<f4" if scale < 0 else ">f4"
        data = np.frombuffer(f.read(w * h * 3 * 4), dtype=dt)
    return data.reshape(h, w, 3)[::-1].astype(np.float32)


def tone_map(img, exposure: float = 0.0, gamma: float = 2.2) -> np.ndarray:
    """GUI tone map: (value * 2^exposure)^(1/gamma), clamped
    (Rayito_Stage4_QT/MainWindow.cpp:45-71). Returns float32 in [0,1]."""
    img = np.asarray(img, dtype=np.float32)
    out = np.maximum(img * (2.0 ** exposure), 0.0) ** (1.0 / gamma)
    return np.clip(out, 0.0, 1.0)


def diagnose(img) -> dict:
    """NaN/negative pixel diagnostics, the numeric equivalent of the GUI's
    blue-NaN / green-negative coloring (Rayito_Stage7_QT/MainWindow.cpp:53-69)."""
    img = np.asarray(img)
    nan_mask = np.isnan(img).any(axis=-1)
    neg_mask = (~nan_mask) & (img < 0.0).any(axis=-1)
    return {
        "nan_pixels": int(nan_mask.sum()),
        "negative_pixels": int(neg_mask.sum()),
        "min": float(np.nanmin(img)) if img.size else 0.0,
        "max": float(np.nanmax(img)) if img.size else 0.0,
    }


def diagnostic_colors(img) -> np.ndarray:
    """Render NaN pixels blue and negative pixels green, like the GUI."""
    img = np.asarray(img, dtype=np.float32).copy()
    nan_mask = np.isnan(img).any(axis=-1)
    neg_mask = (~nan_mask) & (img < 0.0).any(axis=-1)
    img[nan_mask] = np.array([0.0, 0.0, 1.0], np.float32)
    img[neg_mask] = np.array([0.0, 1.0, 0.0], np.float32)
    return img


def rmse_8bit(a, b) -> float:
    """Per-pixel RMSE between two uint8 images, normalized to [0,1] scale —
    the BASELINE.json accuracy metric (RMSE < 2%)."""
    a = np.asarray(a, dtype=np.float64) / 255.0
    b = np.asarray(b, dtype=np.float64) / 255.0
    return float(np.sqrt(np.mean((a - b) ** 2)))
