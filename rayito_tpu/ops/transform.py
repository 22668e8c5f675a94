"""Keyed Scale-Rotate-Translate transform evaluation (motion blur), SoA.

The reference Transform (Rayito_Stage7_QT/RMath.h:619-941) is a keyed TRS
track, not a matrix. A scene's transforms live in padded tables
(xf_times [X,K], xf_translate [X,K,3], xf_scale [X,K,3], xf_rotate [X,K,4],
xf_nkeys [X]); evaluation gathers per-lane keys and interpolates, producing
component-SoA (V3 translation, V3 scaling, Quat rotation) per lane. The
[.., 3]/[.., 4] minor dims exist only in the small static tables; everything
per-lane is SoA.

Interpolation semantics match the reference exactly:
  * key lookup pegs to the first/last key outside the time range
    (timeIndex, RMath.h:850-884),
  * translate/scale lerp, rotation **nlerp** (not slerp — RMath.h:705-715),
  * to-local: (~R)·(p−T)/S for points, (~R)·v/S for vectors, (~R)·n for
    normals (no inverse-scale normal correction — documented reference quirk,
    SURVEY §2.11.10) (RMath.h:814-842).

Rays keep their parameterization under to-local because direction is scaled
by the same 1/S as points — local-space t equals world-space t (RRay.h:78-87).
"""

from __future__ import annotations

import jax.numpy as jnp

from . import quaternion as quat
from .vec3 import V3


def eval_transform(xf_times, xf_translate, xf_scale, xf_rotate, xf_nkeys, xf_id, time):
    """Evaluate TRS tracks at per-lane times.

    xf_id: int32 [...], time: float32 [...] (broadcast together).
    Returns (translation V3, scaling V3, rotation Quat), each of shape [...].
    """
    k = xf_times.shape[-1]
    xf_id = jnp.broadcast_to(jnp.asarray(xf_id, jnp.int32), jnp.shape(time))
    time = jnp.asarray(time, jnp.float32)

    def key_v3(track, idx):
        # track [X, K, 3]; gather one key per lane as components
        return V3(
            track[xf_id, idx, 0], track[xf_id, idx, 1], track[xf_id, idx, 2]
        )

    def key_quat(idx):
        return quat.Quat(
            xf_rotate[xf_id, idx, 0],
            V3(
                xf_rotate[xf_id, idx, 1],
                xf_rotate[xf_id, idx, 2],
                xf_rotate[xf_id, idx, 3],
            ),
        )

    if k == 1:
        zero = jnp.zeros_like(time, jnp.int32)
        return key_v3(xf_translate, zero), key_v3(xf_scale, zero), key_quat(zero)

    nkeys = xf_nkeys[xf_id]
    times = xf_times[xf_id]  # [..., K] — K small and static
    key_valid = jnp.arange(k, dtype=jnp.int32) < nkeys[..., None]
    before = (times <= time[..., None]) & key_valid
    idx = jnp.maximum(jnp.sum(before.astype(jnp.int32), axis=-1) - 1, 0)
    last = jnp.maximum(nkeys - 1, 0)
    idx = jnp.minimum(idx, last)
    idx_next = jnp.minimum(idx + 1, last)

    t0 = jnp.take_along_axis(times, idx[..., None], axis=-1)[..., 0]
    t1 = jnp.take_along_axis(times, idx_next[..., None], axis=-1)[..., 0]
    denom = t1 - t0
    frac = jnp.where(
        denom > 0.0, (time - t0) / jnp.where(denom == 0.0, 1.0, denom), 0.0
    )
    frac = jnp.clip(frac, 0.0, 1.0)

    tr = quat_lerp_v3(key_v3(xf_translate, idx), key_v3(xf_translate, idx_next), frac)
    sc = quat_lerp_v3(key_v3(xf_scale, idx), key_v3(xf_scale, idx_next), frac)
    ro = quat.nlerp(key_quat(idx), key_quat(idx_next), frac)
    return tr, sc, ro


def quat_lerp_v3(a: V3, b: V3, t) -> V3:
    return a + (b - a) * t


def to_local_point(p: V3, translation: V3, scaling: V3, rotation) -> V3:
    return quat.rotate_vector(quat.conjugate(rotation), p - translation) / scaling


def from_local_point(p: V3, translation: V3, scaling: V3, rotation) -> V3:
    return quat.rotate_vector(rotation, p * scaling) + translation


def to_local_vector(v: V3, translation: V3, scaling: V3, rotation) -> V3:
    return quat.rotate_vector(quat.conjugate(rotation), v) / scaling


def from_local_vector(v: V3, translation: V3, scaling: V3, rotation) -> V3:
    return quat.rotate_vector(rotation, v * scaling)


def to_local_normal(n: V3, translation: V3, scaling: V3, rotation) -> V3:
    return quat.rotate_vector(quat.conjugate(rotation), n)


def from_local_normal(n: V3, translation: V3, scaling: V3, rotation) -> V3:
    return quat.rotate_vector(rotation, n)
