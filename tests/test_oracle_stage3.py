"""Cross-validate the wavefront direct renderer against a scalar f64 oracle.

The oracle re-derives the stage-3 algorithm (Rayito_Stage3/main.cpp trace():
one-sided bullseye plane, stable-quadratic spheres, double-sided rect light,
uniform-sphere ShapeLight with the self-occlusion pointer quirk) in plain
NumPy float64 — an independent implementation path from the JAX wavefront
code. Probe pixels away from knife-edge regions must agree within MC noise.

This is the principled semantics check that the golden-image RMSE test
cannot provide for stage 3 (see test_golden_direct.py docstring).
"""

import dataclasses

import numpy as np
import pytest

TMIN = 1e-5

PLANE_P = np.array([0.0, -2.0, 0.0])
PLANE_N = np.array([0.0, 1.0, 0.0])
SPHERES = [
    (np.array([3.0, -1.0, 0.0]), 1.0, "purplish"),
    (np.array([-3.0, 0.0, -2.0]), 2.0, "phong"),
    (np.array([0.0, 0.0, 2.0]), 1.0, "emitter"),
]
RECT_C = np.array([-2.5, 4.0, -2.5])
RECT_S1 = np.array([5.0, 0.0, 0.0])
RECT_S2 = np.array([0.0, 0.0, 5.0])
MATS = {
    "blueish": np.array([0.9, 0.9, 1.0]),
    "purplish": np.array([0.9, 0.7, 0.8]),
    "phong": np.array([0.7, 0.9, 0.7]),
}
RECT_EMIT = np.array([1.0, 1.0, 1.0])
SPH_EMIT = np.array([1.0, 1.0, 0.1]) * 4.0


def _norm(v):
    l = np.linalg.norm(v)
    return v / l if l > 0 else v


def _intersect(o, d, tmax):
    best = (np.inf, -1, None, 1.0, None)
    n_dot_d = PLANE_N @ d
    if n_dot_d < 0:
        t = (PLANE_P @ PLANE_N - o @ PLANE_N) / (d @ PLANE_N)
        if TMIN <= t < min(best[0], tmax):
            pos = o + t * d
            cmod = (
                0.2
                if np.fmod(np.linalg.norm(pos - PLANE_P) * 0.25, 1.0) > 0.5
                else 1.0
            )
            best = (t, 0, PLANE_N.copy(), cmod, "blueish")
    for i, (c, r, m) in enumerate(SPHERES):
        oc = o - c
        a = d @ d
        b = 2 * d @ oc
        cc = oc @ oc - r * r
        disc = b * b - 4 * a * cc
        if disc < 0:
            continue
        sq = np.sqrt(disc)
        q = -0.5 * (b - sq) if b < 0 else -0.5 * (b + sq)
        t0 = q / a
        t1 = cc / q if q != 0 else min(best[0], tmax)
        t0, t1 = min(t0, t1), max(t0, t1)
        cur = min(best[0], tmax)
        if t0 >= cur or t1 < TMIN:
            continue
        if t0 >= TMIN:
            t = t0
        elif t1 < cur:
            t = t1
        else:
            continue
        best = (t, 1 + i, _norm(o + t * d - c), 1.0, m)
    nrm = _norm(np.cross(RECT_S1, RECT_S2))
    n_dot_d = nrm @ d
    if n_dot_d != 0:
        t = (RECT_C @ nrm - o @ nrm) / (d @ nrm)
        if TMIN <= t < min(best[0], tmax):
            rel = o + t * d - RECT_C
            lx, ly = rel @ _norm(RECT_S1), rel @ _norm(RECT_S2)
            if 0 <= lx <= np.linalg.norm(RECT_S1) and 0 <= ly <= np.linalg.norm(
                RECT_S2
            ):
                best = (t, 4, -nrm if nrm @ d > 0 else nrm, 1.0, "rect_emitter")
    return best


def _shade(mat, n, in_dir, l_dir):
    if mat == "phong":
        h = _norm(l_dir - in_dir)
        return max(0.0, h @ n) ** 16 * MATS["phong"]
    if mat in ("emitter", "rect_emitter"):
        return np.zeros(3)
    return max(0.0, l_dir @ n) * MATS[mat]


def _emittance(mat):
    if mat == "emitter":
        return SPH_EMIT
    if mat == "rect_emitter":
        return RECT_EMIT
    return np.zeros(3)


def _trace(rng, o, d, nls=16):
    t, oid, n, cmod, mat = _intersect(o, d, np.inf)
    if oid < 0:
        return np.zeros(3)
    res = _emittance(mat).copy()
    pos = o + t * d
    for li in range(2):
        acc = np.zeros(3)
        for _ in range(nls):
            u1, u2 = rng.random(), rng.random()
            if li == 0:
                lp = RECT_C + RECT_S1 * u1 + RECT_S2 * u2
                ln = _norm(np.cross(RECT_S1, RECT_S2))
                if ln @ (lp - pos) > 0:
                    ln = -ln
                accept_self = 4
                emit = RECT_EMIT
            else:
                z = 1 - 2 * u1
                r_ = np.sqrt(max(0.0, 1 - z * z))
                phi = 2 * np.pi * u2
                ln = np.array([r_ * np.cos(phi), r_ * np.sin(phi), z])
                lp = ln + SPHERES[2][0]
                if ln @ (pos - lp) < 0:
                    ln = -ln
                    lp = ln + SPHERES[2][0]
                accept_self = -99  # ShapeLight pointer quirk: self never matches
                emit = SPH_EMIT
            to_l = lp - pos
            dist = np.linalg.norm(to_l)
            to_l = to_l / dist
            _, soid, *_ = _intersect(pos, to_l, dist)
            if soid < 0 or soid == accept_self:
                acc += emit * cmod * _shade(mat, n, d, to_l)
        res += acc / nls
    return res


def _camera_ray(xu, yu):
    eye = np.array([0.0, 5.0, 15.0])
    fwd = _norm(-eye)
    right = _norm(np.cross(fwd, np.array([0.0, 1.0, 0.0])))
    up = _norm(np.cross(right, fwd))
    tanf = np.tan(np.deg2rad(45))
    return eye, _norm(fwd + right * (xu - 0.5) * tanf + up * (yu - 0.5) * tanf)


# Probes away from geometric edges and the knife-edge highlight lobe.
PROBES = [(450, 256), (100, 256), (330, 340)]


@pytest.mark.slow
def test_direct_renderer_matches_f64_oracle():
    from rayito_tpu.models.demo import STAGE23_CAMERA, STAGE23_FOV, stage3_scene
    from rayito_tpu.render.integrator import render_direct
    from rayito_tpu.utils.config import CONFIG_STAGE123

    rng = np.random.default_rng(7)
    oracle_vals = {}
    for py, px in PROBES:
        acc = np.zeros(3)
        n_cam = 120
        for _ in range(n_cam):
            xu = (px + rng.random()) / 512
            yu = 1 - (py + rng.random()) / 512
            o, d = _camera_ray(xu, yu)
            acc += _trace(rng, o, d, nls=8)
        oracle_vals[(py, px)] = np.clip(acc / n_cam, 0, 1)

    cfg = dataclasses.replace(
        CONFIG_STAGE123, pixel_samples=4, light_samples=4
    )
    scene = stage3_scene().compile()
    img = render_direct(scene, cfg, fov=STAGE23_FOV, camera=STAGE23_CAMERA)

    for (py, px), oracle in oracle_vals.items():
        ours = np.clip(img[py - 2 : py + 3, px - 2 : px + 3].mean((0, 1)), 0, 1)
        err = np.abs(ours - oracle).max()
        # tolerance: MC noise of both estimators plus the light-sphere
        # knife-edge pass-rate difference (f32 vs f64), both O(a few %)
        assert err < 0.06, f"probe ({py},{px}): ours {ours} vs oracle {oracle}"
