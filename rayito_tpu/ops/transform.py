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

    xf_id: int32 scalar (one transform per call — every renderer call site
    folds over shapes with a host loop); time: float32 [...] per lane.
    Returns (translation V3, scaling V3, rotation Quat) of time's shape.

    A scalar xf_id means the key tracks can be pulled with ONE tiny dynamic
    slice and the per-lane key selection becomes a where-chain over the
    (small, static) key count. The previous form broadcast xf_id to the
    lane shape and issued TEN [N]-indexed gathers per evaluation — measured
    1.2 ms each on a 131k-ray wave (4-byte gather rows), ~40 ms of a 113 ms
    bench band across the NEE light evaluations.
    """
    k = xf_times.shape[-1]
    xf_id = jnp.asarray(xf_id, jnp.int32)
    if jnp.ndim(xf_id) != 0:  # per-lane ids: general gather path
        return _eval_transform_lanes(
            xf_times, xf_translate, xf_scale, xf_rotate, xf_nkeys, xf_id, time
        )
    time = jnp.asarray(time, jnp.float32)

    row_t = xf_translate[xf_id]  # [K, 3] dynamic slice of a small table
    row_s = xf_scale[xf_id]
    row_r = xf_rotate[xf_id]  # [K, 4]

    if k == 1:
        sh = jnp.shape(time)
        bc = lambda c: jnp.broadcast_to(c, sh)
        tr = V3(bc(row_t[0, 0]), bc(row_t[0, 1]), bc(row_t[0, 2]))
        sc = V3(bc(row_s[0, 0]), bc(row_s[0, 1]), bc(row_s[0, 2]))
        ro = quat.Quat(
            bc(row_r[0, 0]), V3(bc(row_r[0, 1]), bc(row_r[0, 2]), bc(row_r[0, 3]))
        )
        return tr, sc, ro

    nkeys = xf_nkeys[xf_id]  # scalar
    times = xf_times[xf_id]  # [K]
    key_valid = jnp.arange(k, dtype=jnp.int32) < nkeys
    before = (times[None, :] <= time[..., None]) & key_valid[None, :]
    idx = jnp.maximum(jnp.sum(before.astype(jnp.int32), axis=-1) - 1, 0)
    last = jnp.maximum(nkeys - 1, 0)
    idx = jnp.minimum(idx, last)
    idx_next = jnp.minimum(idx + 1, last)

    def sel_scalar(row_k, idx_lane):
        # row_k: [K] scalars; idx_lane: [...] in [0, K). where-chain beats a
        # [N]-indexed gather for small static K.
        out = jnp.broadcast_to(row_k[0], idx_lane.shape)
        for j in range(1, k):
            out = jnp.where(idx_lane == j, row_k[j], out)
        return out

    def sel_v3(row, idx_lane):
        return V3(
            sel_scalar(row[:, 0], idx_lane),
            sel_scalar(row[:, 1], idx_lane),
            sel_scalar(row[:, 2], idx_lane),
        )

    def sel_quat(idx_lane):
        return quat.Quat(
            sel_scalar(row_r[:, 0], idx_lane),
            V3(
                sel_scalar(row_r[:, 1], idx_lane),
                sel_scalar(row_r[:, 2], idx_lane),
                sel_scalar(row_r[:, 3], idx_lane),
            ),
        )

    t0 = sel_scalar(times, idx)
    t1 = sel_scalar(times, idx_next)
    denom = t1 - t0
    frac = jnp.where(
        denom > 0.0, (time - t0) / jnp.where(denom == 0.0, 1.0, denom), 0.0
    )
    frac = jnp.clip(frac, 0.0, 1.0)

    tr = quat_lerp_v3(sel_v3(row_t, idx), sel_v3(row_t, idx_next), frac)
    sc = quat_lerp_v3(sel_v3(row_s, idx), sel_v3(row_s, idx_next), frac)
    ro = quat.nlerp(sel_quat(idx), sel_quat(idx_next), frac)
    return tr, sc, ro


def _eval_transform_lanes(xf_times, xf_translate, xf_scale, xf_rotate,
                          xf_nkeys, xf_id, time):
    """Per-lane transform ids (API-surface path; the renderer always calls
    with a scalar id). Ten [N]-indexed gathers per call — fine off the hot
    path."""
    k = xf_times.shape[-1]
    xf_id = jnp.broadcast_to(jnp.asarray(xf_id, jnp.int32), jnp.shape(time))
    time = jnp.asarray(time, jnp.float32)

    def key_v3(track, idx):
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


# ---------------------------------------------------------------------------
# Transform CHAINS (nested ShapeSet aggregates).
#
# The reference's ShapeSet is itself a Shape with its own keyed Transform:
# rays are transformed into the set's local space BEFORE the children see
# them (Rayito_Stage7_QT/RScene.h:122-124), and children can be aggregates
# too, so a shape's effective transform is a CHAIN applied sequentially.
# The flat device layout keeps one transform slot per shape plus a parent
# pointer per slot (xf_parent, -1 = root); the chain is walked with a
# STATICALLY-unrolled loop of depth = the scene's max nesting (xf_depth).
# TRS tracks are NOT composed into one track at compile: the composition of
# two interpolated tracks is not itself a lerp/nlerp track, so sequential
# per-time evaluation is the only exact match for the reference semantics.
# ---------------------------------------------------------------------------


def eval_chain(
    xf_times, xf_translate, xf_scale, xf_rotate, xf_nkeys, xf_parent,
    depth: int, xf_id, time,
):
    """Evaluate the transform chain ending at scalar slot ``xf_id``.

    Returns a child-first list of ``depth`` links ``(present, T, S, R)``;
    ``present`` is None for the first link (a shape's own slot always
    exists) and a traced scalar bool for ancestors (False once the walk
    passes the root). With depth == 1 this is exactly one eval_transform —
    the pre-group fast path, zero added cost."""
    links = []
    xid = jnp.asarray(xf_id, jnp.int32)
    present = None
    for level in range(depth):
        safe = jnp.maximum(xid, 0)
        t_l, s_l, r_l = eval_transform(
            xf_times, xf_translate, xf_scale, xf_rotate, xf_nkeys, safe, time
        )
        links.append((present, t_l, s_l, r_l))
        if level + 1 < depth:
            up = xf_parent[safe]
            xid = jnp.where(xid >= 0, up, jnp.int32(-1))
            present = xid >= 0
    return links


def _mask_v3(present, new: V3, old: V3) -> V3:
    from .vec3 import where as vwhere

    return vwhere(present, new, old)


def ray_to_local_chain(links, o: V3, d: V3):
    """Transform a ray through the chain, OUTERMOST (root) link first —
    the order the reference applies nested set transforms. Returns
    (o_local, d_local, rot) where ``rot`` is the composed world-from-local
    rotation (outermost ⊗ ... ⊗ innermost) for rotating normals back out."""
    from . import quaternion as quat

    rot = None
    for present, t_l, s_l, r_l in reversed(links):
        o2 = to_local_point(o, t_l, s_l, r_l)
        d2 = to_local_vector(d, t_l, s_l, r_l)
        if present is None:
            o, d = o2, d2
        else:
            o = _mask_v3(present, o2, o)
            d = _mask_v3(present, d2, d)
        if rot is None:
            rot = r_l if present is None else _mask_quat(present, r_l)
        else:
            r2 = quat.multiply(rot, r_l)
            if present is None:
                rot = r2
            else:
                rot = quat.Quat(
                    jnp.where(present, r2.w, rot.w),
                    _mask_v3(present, r2.v, rot.v),
                )
    return o, d, rot


def _mask_quat(present, q):
    """q where present else identity."""
    from . import quaternion as quat

    return quat.Quat(
        jnp.where(present, q.w, 1.0),
        V3(
            jnp.where(present, q.v.x, 0.0),
            jnp.where(present, q.v.y, 0.0),
            jnp.where(present, q.v.z, 0.0),
        ),
    )


def _apply_chain(links, x, one_link, innermost_first: bool):
    order = links if innermost_first else list(reversed(links))
    for present, t_l, s_l, r_l in order:
        x2 = one_link(x, t_l, s_l, r_l)
        x = x2 if present is None else _mask_v3(present, x2, x)
    return x


def from_local_point_chain(links, p: V3) -> V3:
    """local -> world: innermost link first."""
    return _apply_chain(links, p, from_local_point, innermost_first=True)


def from_local_vector_chain(links, v: V3) -> V3:
    return _apply_chain(links, v, from_local_vector, innermost_first=True)


def from_local_normal_chain(links, n: V3) -> V3:
    return _apply_chain(links, n, from_local_normal, innermost_first=True)


def to_local_point_chain(links, p: V3) -> V3:
    """world -> local: outermost link first."""
    return _apply_chain(links, p, to_local_point, innermost_first=False)


def to_local_vector_chain(links, v: V3) -> V3:
    return _apply_chain(links, v, to_local_vector, innermost_first=False)


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
