"""Live viewer: PNG encoder validity + HTTP roundtrip + progressive feed."""

import json
import struct
import urllib.error
import urllib.request
import zlib

import numpy as np

from rayito_tpu.utils.viewer import LiveViewer, encode_png


def _decode_png(data: bytes):
    """Tiny validating decoder for the encoder's own output."""
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    pos = 8
    w = h = None
    idat = b""
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack(">I", data[pos + 8 + ln : pos + 12 + ln])
        assert crc == (zlib.crc32(tag + payload) & 0xFFFFFFFF)
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", payload[:10])
            assert (depth, ctype) == (8, 2)
        elif tag == b"IDAT":
            idat += payload
        pos += 12 + ln
    raw = np.frombuffer(zlib.decompress(idat), np.uint8).reshape(h, w * 3 + 1)
    assert (raw[:, 0] == 0).all()  # filter byte None
    return raw[:, 1:].reshape(h, w, 3)


def test_png_roundtrip():
    rs = np.random.default_rng(0)
    img = rs.integers(0, 256, (7, 13, 3), dtype=np.uint8)
    np.testing.assert_array_equal(_decode_png(encode_png(img)), img)


def test_viewer_serves_frames_and_stats():
    v = LiveViewer(port=0)  # ephemeral port
    try:
        img = np.zeros((4, 6, 3), np.float32)
        img[:, :, 0] = 0.5

        class St:
            samples_done, samples_total = 3, 16
            seconds, rays_traced = 1.5, 1000
            mrays_per_sec = 0.000667

        v.update(img, St())
        base = f"http://127.0.0.1:{v.port}"
        page = urllib.request.urlopen(base + "/", timeout=10).read()
        assert b"progressive render" in page
        png = urllib.request.urlopen(base + "/frame.png", timeout=10).read()
        decoded = _decode_png(png)
        assert decoded.shape == (4, 6, 3)
        assert decoded[:, :, 0].min() > 100  # tone-mapped red channel lit
        st = json.loads(
            urllib.request.urlopen(base + "/stats.json", timeout=10).read()
        )
        assert st["samples_done"] == 3 and st["samples_total"] == 16
    finally:
        v.close()


def test_progressive_on_preview_feed():
    """render_progressive drives on_preview with the running mean image."""
    import rayito_tpu as rt
    from rayito_tpu.models.camera import PerspectiveCamera
    from rayito_tpu.render.progressive import render_progressive
    from rayito_tpu.utils.config import RenderConfig

    b = rt.Scene()
    b.add(rt.Plane((0, -1, 0), (0, 1, 0), rt.DiffuseMaterial((0.7, 0.7, 0.7))))
    b.add(rt.RectangleLight((-1, 4, -1), (2, 0, 0), (0, 0, 2),
                            (1.0, 1.0, 1.0), 4.0))
    scene = b.compile()
    cam = PerspectiveCamera.make(40.0, (0, 2, 6), (0, 0, 0), (0, 1, 0))
    cfg = RenderConfig(width=8, height=6, pixel_samples=2, light_samples=1,
                       max_depth=2)
    seen = []
    img, stats = render_progressive(
        scene, cfg, cam, on_preview=lambda im, st: seen.append(
            (im.copy(), st.samples_done))
    )
    assert seen, "preview callback never fired"
    assert seen[-1][1] == stats.samples_total
    np.testing.assert_allclose(seen[-1][0], img, rtol=1e-6)
    assert seen[0][0].shape == (6, 8, 3)


def test_viewer_interactive_knobs_roundtrip():
    """Interactive mode: /knobs.json serves the knob set, POST /render
    enqueues a submission that wait_knobs() returns, and the stored knob
    values update (the Qt spinbox round trip)."""
    v = LiveViewer(port=0, knobs={"width": 640, "exposure": 0.0})
    try:
        base = f"http://127.0.0.1:{v.port}"
        got = json.loads(
            urllib.request.urlopen(base + "/knobs.json", timeout=10).read()
        )
        assert got == {"width": 640, "exposure": 0.0}
        assert b"knobs.json" in urllib.request.urlopen(
            base + "/", timeout=10).read()
        body = json.dumps(
            {"width": "320", "exposure": "1.5", "bogus": "1"}).encode()
        req = urllib.request.Request(base + "/render", data=body,
                                     method="POST")
        assert urllib.request.urlopen(req, timeout=10).status == 200
        sub = v.wait_knobs()
        assert sub["width"] == "320" and sub["exposure"] == "1.5"
        assert v.knobs == {"width": "320", "exposure": "1.5"}  # bogus dropped
        v.set_state("rendering")
        st = json.loads(
            urllib.request.urlopen(base + "/stats.json", timeout=10).read()
        )
        assert st["state"] == "rendering"
    finally:
        v.close()


def test_viewer_knobs_disabled_by_default():
    v = LiveViewer(port=0)
    try:
        base = f"http://127.0.0.1:{v.port}"
        try:
            urllib.request.urlopen(base + "/knobs.json", timeout=10)
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
        body = json.dumps({"width": "1"}).encode()
        try:
            urllib.request.urlopen(
                urllib.request.Request(base + "/render", data=body,
                                       method="POST"), timeout=10)
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        v.close()


def test_apply_knobs_coercion():
    """Knob strings coerce onto the arg namespace; invalid values keep
    the old setting; fov and shutter route specially."""
    import argparse

    from rayito_tpu.cli import apply_knobs

    ns = argparse.Namespace(
        width=640, height=480, pixel_samples=2, light_samples=1, depth=3,
        focal_distance=16.0, lens_radius=0.0, shutter=(0.0, 1.0),
        exposure=0.0, gamma=2.2,
    )
    fov = apply_knobs(ns, 30.0, {
        "width": "320", "depth": "8", "fov": "45",
        "shutter_open": "0.25", "gamma": "junk", "pixel_samples": "0",
        "lens_radius": "0.5", "unknown": "9",
    })
    assert fov == 45.0
    assert ns.width == 320 and ns.depth == 8
    assert ns.shutter == (0.25, 1.0)
    assert ns.gamma == 2.2          # junk ignored
    assert ns.pixel_samples == 2    # < 1 ignored
    assert ns.lens_radius == 0.5
