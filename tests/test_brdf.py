"""BRDF property tests: pdf normalization, sample/pdf consistency, energy.

These are the chi-square/consistency checks SURVEY §4 prescribes, done as
Monte-Carlo integral identities (robust and implementation-independent).
Conventions under test: incoming TOWARD surface, outgoing AWAY
(RMaterial.h:30-59); SA variants.
"""

import jax.numpy as jnp
import numpy as np

from rayito_tpu.ops import brdf
from rayito_tpu.ops.vec3 import V3, dot, from_aos, normalize, to_aos
from rayito_tpu.ops.vec3 import PI

N = 50_000
RS = np.random.default_rng(11)


def _u(n=N):
    return jnp.asarray(RS.uniform(size=n), jnp.float32)


def _normal_out():
    nrm = V3(jnp.zeros(N), jnp.zeros(N), jnp.ones(N))
    # outgoing in upper hemisphere, fixed-ish grazing mix
    r = RS.uniform(-1, 1, size=(N, 2)).astype(np.float32)
    out = normalize(V3(jnp.asarray(r[:, 0]), jnp.asarray(r[:, 1]), jnp.ones(N)))
    return nrm, out


def _uniform_sphere_dirs(n=N):
    z = RS.uniform(-1, 1, n)
    phi = RS.uniform(0, 2 * np.pi, n)
    r = np.sqrt(np.maximum(0, 1 - z * z))
    return V3(
        jnp.asarray(r * np.cos(phi), jnp.float32),
        jnp.asarray(r * np.sin(phi), jnp.float32),
        jnp.asarray(z, jnp.float32),
    )


def test_lambert_pdf_normalizes():
    """∫ pdf_SA dω over the sphere = 1 (pdf = |n·i|/π on the reflection
    hemisphere, 0 on the same-side hemisphere)."""
    nrm, out = _normal_out()
    inc = _uniform_sphere_dirs()
    _, pdf = brdf.lambert_evaluate_sa(inc, out, nrm)
    # uniform-sphere MC: E[pdf] * 4π = ∫pdf
    integral = float(jnp.mean(pdf)) * 4 * np.pi
    assert abs(integral - 1.0) < 0.03, integral


def test_lambert_sample_weight_is_one():
    """f·|n·i|/pdf == 1 exactly for every cosine-hemisphere sample."""
    nrm, out = _normal_out()
    inc, f, pdf = brdf.lambert_sample_sa(out, nrm, _u(), _u())
    w = np.asarray(f * jnp.abs(dot(-inc, nrm)) / jnp.maximum(pdf, 1e-30))
    ok = np.asarray(pdf) > 1e-6
    np.testing.assert_allclose(w[ok], 1.0, atol=1e-3)


def test_lambert_samples_opposite_hemisphere():
    """Sampled incoming points toward the surface: n·i < 0 when n·o > 0."""
    nrm, out = _normal_out()
    inc, f, pdf = brdf.lambert_sample_sa(out, nrm, _u(), _u())
    ndi = np.asarray(dot(inc, nrm))
    ndo = np.asarray(dot(out, nrm))
    ok = np.asarray(pdf) > 1e-5
    assert (np.sign(ndi[ok]) != np.sign(ndo[ok])).mean() > 0.999


def test_glossy_sample_pdf_consistency():
    """Two MC estimators of ∫ f·|cos| dω must agree: (a) BRDF importance
    sampling E[f·cos/pdf], (b) uniform-sphere sampling E[f·cos]·4π."""
    nrm = V3(jnp.zeros(N), jnp.zeros(N), jnp.ones(N))
    out = normalize(V3(0.4, 0.0, 0.7)).broadcast_to((N,))
    expo = jnp.float32(1.0 / (0.3 * 0.3))
    inc, f, pdf = brdf.glossy_sample_sa(out, nrm, _u(), _u(), expo)
    w = f * jnp.abs(dot(-inc, nrm)) / jnp.maximum(pdf, 1e-30)
    est_a = float(jnp.mean(jnp.where(pdf > 1e-6, w, 0.0)))
    dirs = _uniform_sphere_dirs()
    f_u, _ = brdf.glossy_evaluate_sa(dirs, out, nrm, expo)
    est_b = float(jnp.mean(f_u * jnp.abs(dot(dirs, nrm)))) * 4 * np.pi
    assert abs(est_a - est_b) / max(est_b, 1e-6) < 0.05, (est_a, est_b)


def test_glossy_energy_bounded():
    """Reflected energy ∫ f·cos ≤ ~1 for the A-S model at moderate angles."""
    nrm = V3(jnp.zeros(N), jnp.zeros(N), jnp.ones(N))
    out = normalize(V3(0.2, 0.1, 0.95)).broadcast_to((N,))
    for rough in (0.1, 0.3):
        expo = jnp.float32(1.0 / rough**2)
        inc, f, pdf = brdf.glossy_sample_sa(out, nrm, _u(), _u(), expo)
        w = jnp.where(pdf > 1e-6, f * jnp.abs(dot(-inc, nrm)) / pdf, 0.0)
        e = float(jnp.mean(w))
        assert e < 1.2, (rough, e)


def test_reflection_is_mirror():
    nrm = V3(jnp.zeros(1), jnp.zeros(1), jnp.ones(1))
    out = normalize(V3(jnp.ones(1), jnp.zeros(1), jnp.ones(1)))
    inc, f, pdf = brdf.reflection_sample_sa(out, nrm)
    # incoming toward surface = mirror of outgoing through the normal, negated
    expect = -normalize(V3(-jnp.ones(1), jnp.zeros(1), jnp.ones(1)))
    np.testing.assert_allclose(
        np.asarray(to_aos(inc)), np.asarray(to_aos(expect)), atol=1e-6
    )
    assert float(f[0]) == 1.0
    np.testing.assert_allclose(float(pdf[0]), abs(float(dot(-inc, nrm)[0])), atol=1e-6)


def test_kind_dispatch_matches_singles():
    nrm, out = _normal_out()
    u1, u2 = _u(), _u()
    kind = jnp.full((N,), brdf.KIND_LAMBERT, jnp.int32)
    expo = jnp.ones((N,), jnp.float32)
    inc_d, f_d, pdf_d = brdf.sample_sa(kind, expo, out, nrm, u1, u2)
    inc_s, f_s, pdf_s = brdf.lambert_sample_sa(out, nrm, u1, u2)
    np.testing.assert_allclose(
        np.asarray(to_aos(inc_d)), np.asarray(to_aos(inc_s)), atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(pdf_d), np.asarray(pdf_s), atol=1e-6)
    # emitters always sample pdf 0 (path terminates)
    kind_e = jnp.full((N,), brdf.KIND_EMITTER, jnp.int32)
    _, f_e, pdf_e = brdf.sample_sa(kind_e, expo, out, nrm, u1, u2)
    assert float(jnp.max(pdf_e)) == 0.0 and float(jnp.max(f_e)) == 0.0


def test_phong_has_no_path_brdf():
    """Phong is the stage-3/4 direct shader; in path mode Material::evaluate
    returns no Brdf so the path ends (RaytraceMain.cpp:319-323). sample_sa
    must agree with evaluate_sa: both return f=0, pdf=0 — not the Lambert
    fallthrough (round-3 verdict weak #4)."""
    nrm, out = _normal_out()
    expo = jnp.ones((N,), jnp.float32)
    kind_p = jnp.full((N,), brdf.KIND_PHONG, jnp.int32)
    _, f_s, pdf_s = brdf.sample_sa(kind_p, expo, out, nrm, _u(), _u())
    assert float(jnp.max(pdf_s)) == 0.0 and float(jnp.max(f_s)) == 0.0
    f_e, pdf_e = brdf.evaluate_sa(kind_p, expo, out, out, nrm)
    assert float(jnp.max(pdf_e)) == 0.0 and float(jnp.max(f_e)) == 0.0


def test_psa_variants_roundtrip():
    """PSA pdf x |n.i| == SA pdf for every kind; Dirac samplePSA pdf == 1
    (RMaterial.h:60-87,417-423)."""
    nrm, out = _normal_out()
    u1, u2 = _u(), _u()
    expo = jnp.full((N,), 9.0, jnp.float32)
    for k in (brdf.KIND_LAMBERT, brdf.KIND_GLOSSY, brdf.KIND_REFLECTION):
        kind = jnp.full((N,), k, jnp.int32)
        inc, f_sa, pdf_sa_v = brdf.sample_sa(kind, expo, out, nrm, u1, u2)
        inc_p, f_psa, pdf_psa_v = brdf.sample_psa(kind, expo, out, nrm, u1, u2)
        np.testing.assert_allclose(
            np.asarray(to_aos(inc_p)), np.asarray(to_aos(inc)), atol=0
        )
        np.testing.assert_allclose(np.asarray(f_psa), np.asarray(f_sa), atol=0)
        cos_i = np.abs(np.asarray(dot(inc, nrm)))
        np.testing.assert_allclose(
            np.asarray(pdf_psa_v) * cos_i, np.asarray(pdf_sa_v),
            atol=1e-6, rtol=1e-5,
        )
        if k == brdf.KIND_REFLECTION:
            np.testing.assert_allclose(np.asarray(pdf_psa_v), 1.0, atol=1e-5)
        # evaluate/pdf variants agree the same way (Dirac: both 0)
        f_e, pdf_e = brdf.evaluate_sa(kind, expo, inc, out, nrm)
        f_ep, pdf_ep = brdf.evaluate_psa(kind, expo, inc, out, nrm)
        np.testing.assert_allclose(np.asarray(f_ep), np.asarray(f_e), atol=0)
        np.testing.assert_allclose(
            np.asarray(pdf_ep) * cos_i, np.asarray(pdf_e), atol=1e-6, rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(brdf.pdf_psa(kind, expo, inc, out, nrm)) * cos_i,
            np.asarray(brdf.pdf_sa(kind, expo, inc, out, nrm)),
            atol=1e-6, rtol=1e-5,
        )
