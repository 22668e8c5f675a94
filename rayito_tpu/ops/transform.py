"""Keyed Scale-Rotate-Translate transform evaluation (motion blur).

The reference Transform (Rayito_Stage7_QT/RMath.h:619-941) is a keyed TRS
track, not a matrix. Here a whole scene's transforms live in padded arrays
(xf_times [X,K], xf_translate [X,K,3], xf_scale [X,K,3], xf_rotate [X,K,4],
xf_nkeys [X]) and evaluation is vectorized over rays: given per-lane transform
ids and times, produce per-lane (translation, scaling, rotation).

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


def eval_transform(xf_times, xf_translate, xf_scale, xf_rotate, xf_nkeys, xf_id, time):
    """Evaluate TRS tracks at per-lane times.

    xf_id: int32 [...], time: float32 [...] (broadcastable together).
    Returns (translation [...,3], scaling [...,3], rotation [...,4]).
    """
    times = xf_times[xf_id]  # [..., K]
    k = times.shape[-1]
    nkeys = xf_nkeys[xf_id]  # [...]

    if k == 1:
        return (
            xf_translate[xf_id][..., 0, :],
            xf_scale[xf_id][..., 0, :],
            xf_rotate[xf_id][..., 0, :],
        )

    t_in = jnp.asarray(time, jnp.float32)[..., None]  # [..., 1]
    # index of the key just before `time` (pegged to valid range), computed as
    # (number of keys with key_time <= time) - 1, clamped to [0, nkeys-2] for
    # interpolation and to nkeys-1 when time is past the end.
    key_valid = (
        jnp.arange(k, dtype=jnp.int32) < nkeys[..., None]
    )  # padded keys excluded
    before = (times <= t_in) & key_valid
    idx = jnp.maximum(jnp.sum(before.astype(jnp.int32), axis=-1) - 1, 0)
    last = jnp.maximum(nkeys - 1, 0)
    idx = jnp.minimum(idx, last)
    idx_next = jnp.minimum(idx + 1, last)

    t0 = jnp.take_along_axis(times, idx[..., None], axis=-1)[..., 0]
    t1 = jnp.take_along_axis(times, idx_next[..., None], axis=-1)[..., 0]
    time_f = jnp.asarray(time, jnp.float32)
    denom = t1 - t0
    frac = jnp.where(denom > 0.0, (time_f - t0) / jnp.where(denom == 0.0, 1.0, denom), 0.0)
    # peg outside the range (reference: outT = 0 at/before first key and at last)
    frac = jnp.clip(frac, 0.0, 1.0)

    def gather_key(track, i):
        # track[xf_id] is [..., K, C]; select key i per lane
        tk = track[xf_id]
        return jnp.take_along_axis(
            tk, i[..., None, None].astype(jnp.int32), axis=-2
        )[..., 0, :]

    tr0 = gather_key(xf_translate, idx)
    tr1 = gather_key(xf_translate, idx_next)
    sc0 = gather_key(xf_scale, idx)
    sc1 = gather_key(xf_scale, idx_next)
    ro0 = gather_key(xf_rotate, idx)
    ro1 = gather_key(xf_rotate, idx_next)

    f = frac[..., None]
    translation = tr0 * (1.0 - f) + tr1 * f
    scaling = sc0 * (1.0 - f) + sc1 * f
    rotation = quat.nlerp(ro0, ro1, frac)
    # exact-key case: frac==0 already returns key values; nlerp(q,q,0)=q. ok.
    return translation, scaling, rotation


def to_local_point(p, translation, scaling, rotation):
    return quat.rotate_vector(quat.conjugate(rotation), p - translation) / scaling


def from_local_point(p, translation, scaling, rotation):
    return quat.rotate_vector(rotation, p * scaling) + translation


def to_local_vector(v, translation, scaling, rotation):
    return quat.rotate_vector(quat.conjugate(rotation), v) / scaling


def from_local_vector(v, translation, scaling, rotation):
    return quat.rotate_vector(rotation, v * scaling)


def to_local_normal(n, translation, scaling, rotation):
    return quat.rotate_vector(quat.conjugate(rotation), n)


def from_local_normal(n, translation, scaling, rotation):
    return quat.rotate_vector(rotation, n)
