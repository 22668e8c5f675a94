"""Vectorized BRDFs, dispatched by material kind (component-SoA).

The reference's ``Brdf`` virtual hierarchy (Rayito_Stage7_QT/RMaterial.h:23-433)
becomes pure array functions over V3 wavefronts blended by material-kind
masks — every lane computes each BRDF kind's cheap arithmetic but only keeps
its own; no gather-based dispatch, no divergence, no [..., 3] lane padding.

Direction conventions (RMaterial.h:30-59): **incoming points TOWARD the
surface, outgoing points AWAY**. All functions return SOLID-ANGLE f/pdf
(the path tracer uses the SA variants exclusively —
RaytraceMain.cpp:383,413,456). f is a scalar per lane (the reference Brdfs
are colorless; material color multiplies outside).

Dirac handling (PerfectReflection): evaluate ≡ 0 with pdf 0; sample returns
f=1 with pdf = |n·i| (SA), and is_dirac masks NEE off (RaytraceMain.cpp:332).
"""

from __future__ import annotations

import jax.numpy as jnp

from .vec3 import (
    V3,
    dot,
    from_local_frame,
    make_coordinate_space,
    normalize,
    where as vwhere,
)
from .vec3 import PI
from .warps import uniform_to_cosine_hemisphere

KIND_LAMBERT = 0
KIND_GLOSSY = 1
KIND_REFLECTION = 2
KIND_EMITTER = 3
KIND_PHONG = 4


def _same_hemisphere(n_dot_i, n_dot_o):
    """Reject when incoming and outgoing are on the same side
    (RMaterial.h:101-108): reflection requires opposite signs."""
    return ((n_dot_i > 0.0) & (n_dot_o > 0.0)) | ((n_dot_i < 0.0) & (n_dot_o < 0.0))


# ---------------------------------------------------------------------------
# Lambert (RMaterial.h:91-205)
# ---------------------------------------------------------------------------


def lambert_evaluate_sa(incoming: V3, outgoing: V3, normal: V3):
    n_dot_i = dot(incoming, normal)
    n_dot_o = dot(outgoing, normal)
    reject = _same_hemisphere(n_dot_i, n_dot_o)
    f = jnp.where(reject, 0.0, 1.0 / PI)
    pdf = jnp.where(reject, 0.0, jnp.abs(n_dot_i) / PI)
    return f, pdf


def lambert_sample_sa(outgoing: V3, normal: V3, u1, u2):
    local_incoming = -uniform_to_cosine_hemisphere(u1, u2)
    x, y, z = make_coordinate_space(normal)
    incoming = from_local_frame(local_incoming, x, y, z)
    flip = dot(outgoing, normal) < 0.0
    incoming = vwhere(flip, -incoming, incoming)
    pdf = jnp.abs(dot(-incoming, normal)) / PI
    f = jnp.full_like(pdf, 1.0 / PI)
    return incoming, f, pdf


# ---------------------------------------------------------------------------
# Glossy — isotropic Ashikhmin-Shirley with the D-BRDF denominator
# (RMaterial.h:208-372). exponent = 1/roughness^2.
# ---------------------------------------------------------------------------


def _glossy_half(incoming: V3, outgoing: V3, normal: V3) -> V3:
    """Half-vector with the near-parallel guard (RMaterial.h:241-245)."""
    near = dot(outgoing, incoming) > 0.999
    h = normalize(outgoing - incoming)
    return vwhere(near, normal, h)


def glossy_evaluate_sa(incoming: V3, outgoing: V3, normal: V3, exponent):
    n_dot_i = dot(incoming, normal)
    n_dot_o = dot(outgoing, normal)
    reject = _same_hemisphere(n_dot_i, n_dot_o)
    half = _glossy_half(incoming, outgoing, normal)
    n_dot_h = jnp.abs(dot(normal, half))
    d = (exponent + 1.0) * jnp.power(jnp.maximum(n_dot_h, 0.0), exponent) / (2.0 * PI)
    # D-BRDF denominator: 4*|nDotO + -nDotI - nDotO * -nDotI|
    denom = 4.0 * jnp.abs(n_dot_o + (-n_dot_i) - n_dot_o * (-n_dot_i))
    f = d / jnp.maximum(denom, 1e-37)
    o_dot_h = jnp.abs(dot(outgoing, half))
    pdf = d / jnp.maximum(4.0 * o_dot_h, 1e-37)
    f = jnp.where(reject, 0.0, f)
    pdf = jnp.where(reject, 0.0, pdf)
    return f, pdf


def glossy_sample_sa(outgoing: V3, normal: V3, u1, u2, exponent):
    phi = 2.0 * PI * u1
    cos_theta = jnp.power(jnp.maximum(1.0 - u2, 0.0), 1.0 / (exponent + 1.0))
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    local_half = V3(sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta)
    x, y, z = make_coordinate_space(normal)
    half = from_local_frame(local_half, x, y, z)
    flip = dot(outgoing, normal) < 0.0
    half = vwhere(flip, -half, half)
    incoming = outgoing - half * (2.0 * dot(outgoing, half))
    f, pdf = glossy_evaluate_sa(incoming, outgoing, normal, exponent)
    return incoming, f, pdf


# ---------------------------------------------------------------------------
# PerfectReflection (RMaterial.h:376-433) — Dirac mirror
# ---------------------------------------------------------------------------


def reflection_sample_sa(outgoing: V3, normal: V3):
    n_dot_o = dot(normal, outgoing)
    sgn = jnp.where(n_dot_o < 0.0, 1.0, -1.0)
    incoming = outgoing + normal * (2.0 * n_dot_o * sgn)
    pdf = jnp.abs(dot(-incoming, normal))
    f = jnp.ones_like(pdf)
    return incoming, f, pdf


# ---------------------------------------------------------------------------
# Phong — the stage-3/4 direct-shading model (Rayito_Stage3/rayito.h:455-480)
# ---------------------------------------------------------------------------


def phong_shade(normal: V3, in_direction: V3, light_direction: V3, exponent):
    half = normalize(light_direction - in_direction)
    return jnp.power(jnp.maximum(0.0, dot(half, normal)), exponent)


def lambert_shade(normal: V3, light_direction: V3):
    return jnp.maximum(0.0, dot(light_direction, normal))


# ---------------------------------------------------------------------------
# Kind-dispatched wavefront API
# ---------------------------------------------------------------------------


def is_dirac(kind):
    return kind == KIND_REFLECTION


def evaluate_sa(kind, exponent, incoming: V3, outgoing: V3, normal: V3):
    """Mask-blended BRDF evaluation for a wavefront with mixed materials.
    Emitters and Dirac mirrors evaluate to (0, 0)."""
    f_l, pdf_l = lambert_evaluate_sa(incoming, outgoing, normal)
    f_g, pdf_g = glossy_evaluate_sa(incoming, outgoing, normal, exponent)
    f = jnp.where(kind == KIND_LAMBERT, f_l, jnp.where(kind == KIND_GLOSSY, f_g, 0.0))
    pdf = jnp.where(
        kind == KIND_LAMBERT, pdf_l, jnp.where(kind == KIND_GLOSSY, pdf_g, 0.0)
    )
    return f, pdf


def sample_sa(kind, exponent, outgoing: V3, normal: V3, u1, u2):
    """Mask-blended BRDF sampling. Returns (incoming V3, f, pdf)."""
    i_l, f_l, pdf_l = lambert_sample_sa(outgoing, normal, u1, u2)
    i_g, f_g, pdf_g = glossy_sample_sa(outgoing, normal, u1, u2, exponent)
    i_r, f_r, pdf_r = reflection_sample_sa(outgoing, normal)
    is_g = kind == KIND_GLOSSY
    is_r = kind == KIND_REFLECTION
    incoming = vwhere(is_r, i_r, vwhere(is_g, i_g, i_l))
    f = jnp.where(is_r, f_r, jnp.where(is_g, f_g, f_l))
    pdf = jnp.where(is_r, pdf_r, jnp.where(is_g, pdf_g, pdf_l))
    # emitters have no BRDF (Material::evaluate returns NULL brdf,
    # RMaterial.h:530-555) — force pdf 0 so the path terminates. Phong is
    # the stage-3/4 direct-lighting shader only; in path mode it likewise
    # has no Brdf (evaluate_sa already returns 0), so terminate here too
    # rather than silently sampling the Lambert fallthrough branch.
    none = (kind == KIND_EMITTER) | (kind == KIND_PHONG)
    f = jnp.where(none, 0.0, f)
    pdf = jnp.where(none, 0.0, pdf)
    return incoming, f, pdf


def pdf_sa(kind, exponent, incoming: V3, outgoing: V3, normal: V3):
    """Brdf::pdfSA — solid-angle pdf of the in/out/normal configuration
    (Dirac kinds: 0, RMaterial.h:80-84,425)."""
    _, pdf = evaluate_sa(kind, exponent, incoming, outgoing, normal)
    return pdf


# ---------------------------------------------------------------------------
# Projected-solid-angle (PSA) variants (RMaterial.h:60-87). The reference's
# base-class defaults divide the SA pdf by |n·i|; reflectance is unchanged.
# The renderer only ever calls the SA variants (RaytraceMain.cpp:383,413,456)
# — these exist for interface parity. For the Dirac mirror, samplePSA's pdf
# is exactly 1 (sampleSA pdf = |n·i|, RMaterial.h:417-423).
# ---------------------------------------------------------------------------


def _to_psa(pdf_sa_val, incoming: V3, normal: V3):
    return pdf_sa_val / jnp.maximum(jnp.abs(dot(incoming, normal)), 1e-37)


def evaluate_psa(kind, exponent, incoming: V3, outgoing: V3, normal: V3):
    """Brdf::evaluatePSA — (f, pdf wrt projected solid angle)."""
    f, pdf = evaluate_sa(kind, exponent, incoming, outgoing, normal)
    return f, _to_psa(pdf, incoming, normal)


def sample_psa(kind, exponent, outgoing: V3, normal: V3, u1, u2):
    """Brdf::samplePSA — (incoming, f, pdf wrt projected solid angle)."""
    incoming, f, pdf = sample_sa(kind, exponent, outgoing, normal, u1, u2)
    return incoming, f, _to_psa(pdf, incoming, normal)


def pdf_psa(kind, exponent, incoming: V3, outgoing: V3, normal: V3):
    """Brdf::pdfPSA = pdfSA / |n·i| (RMaterial.h:80-86)."""
    return _to_psa(
        pdf_sa(kind, exponent, incoming, outgoing, normal), incoming, normal
    )
