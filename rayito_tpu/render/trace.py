"""Wavefront scene intersection (component-SoA).

The reference's ``ShapeSet::intersect`` walks a shape list / BVH with virtual
dispatch per ray (Rayito_Stage7_QT/RScene.h:113-268). Here a whole SoA ray
wavefront is intersected against each *kind* of primitive in one dense
batched op (rays × shapes broadcasting for the handful of top-level shapes),
plus the dense cluster traversal for triangle meshes; per-kind winners are
min-reduced. This is the "flat arrays + min-reduction instead of pointer
dispatch" design from SURVEY §7; the top level is deliberately brute-forced
(the reference itself only builds a scene BVH for >2 finite shapes; dozens
of dense AABB/quadric tests are cheaper than divergent traversal on a vector
machine).

All per-lane vectors are V3 component-SoA (ops/vec3.py) — no [..., 3]
arrays anywhere on the hot path.

Keyed TRS transforms (motion blur) are applied per-(ray, shape) when the
scene has any non-identity transform; static scenes skip that math entirely
via the ``has_motion`` static flag.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..models.scene import SceneData
from ..ops import transform as xf
from ..ops.intersect import (
    INF,
    aabb_intersect,
    plane_intersect,
    rect_intersect,
    sphere_intersect,
    triangle_intersect,
)
from ..ops.vec3 import V3, cross, from_aos, normalize, where as vwhere


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Hit:
    """SoA intersection record (the reference's Intersection, RRay.h:98-155)."""

    t: jnp.ndarray  # [N] float32; INF where no hit
    valid: jnp.ndarray  # [N] bool
    shape_id: jnp.ndarray  # [N] int32 global shape id; -1 = miss
    mat: jnp.ndarray  # [N] int32 material id; -1 = miss
    normal: V3  # [N] components
    color_mod: jnp.ndarray  # [N] scalar modifier (bullseye texture)
    overflow: jnp.ndarray  # [] int32: cluster-traversal candidate truncations
    # beyond the K1/K2 budgets (mesh_intersect.py). Nonzero means the bounded
    # traversal MAY have dropped a nearest hit on a denser-than-budget scene;
    # it is summed per render and surfaced via RenderStats / the CLI.


def _eval_xf_pairwise(scene: SceneData, xf_ids, time):
    """Per-(ray, shape) TRS evaluation: xf_ids [S], time [N] -> [N, S]."""
    return xf.eval_transform(
        scene.xf_times,
        scene.xf_translate,
        scene.xf_scale,
        scene.xf_rotate,
        scene.xf_nkeys,
        xf_ids[None, :],
        time[:, None] * jnp.ones((1, xf_ids.shape[0]), jnp.float32),
    )


def _rays_to_local(scene: SceneData, xf_ids, o: V3, d: V3, time):
    """Transform rays into each shape's local space.

    Returns (o_l, d_l of shape [N, S] (or broadcastable [N, 1]), trs|None).
    Local t equals world t (RRay.h:78-87).
    """
    if not scene.has_motion:
        return o[:, None], d[:, None], None
    trs = _eval_xf_pairwise(scene, xf_ids, time)
    translation, scaling, rotation = trs
    o_l = xf.to_local_point(o[:, None], translation, scaling, rotation)
    d_l = xf.to_local_vector(d[:, None], translation, scaling, rotation)
    return o_l, d_l, trs


def _winner_ray(o_l: V3, d_l: V3, idx, o: V3, d: V3, trs):
    """Local-space ray of the winning shape per lane (static scenes: world
    ray IS the local ray — avoids OOB gathers on the broadcast axis)."""
    if trs is None:
        return o, d
    sel = lambda a: jnp.take_along_axis(a, idx[:, None], axis=1)[:, 0]
    return (
        V3(sel(o_l.x), sel(o_l.y), sel(o_l.z)),
        V3(sel(d_l.x), sel(d_l.y), sel(d_l.z)),
    )


def _winner_rotation(trs, idx):
    from ..ops.quaternion import Quat

    _, _, rotation = trs
    sel = lambda a: jnp.take_along_axis(a, idx[:, None], axis=1)[:, 0]
    return Quat(
        sel(rotation.w), V3(sel(rotation.v.x), sel(rotation.v.y), sel(rotation.v.z))
    )


def _argmin_t(t_ns):
    """t_ns [N, S] -> (t_best [N], idx [N])."""
    idx = jnp.argmin(t_ns, axis=1).astype(jnp.int32)
    t = jnp.take_along_axis(t_ns, idx[:, None], axis=1)[:, 0]
    return t, idx


# ---------------------------------------------------------------------------
# Per-kind candidate intersections
# ---------------------------------------------------------------------------


def _planes_candidate(scene: SceneData, o: V3, d: V3, time, tmin, tmax):
    o_l, d_l, trs = _rays_to_local(scene, scene.pln_xf, o, d, time)
    pos = from_aos(scene.pln_pos)[None, :]  # V3 of [1, P]
    nrm = from_aos(scene.pln_normal)[None, :]
    t_ns, _ = plane_intersect(o_l, d_l, tmin, tmax[:, None], pos, nrm)
    t, idx = _argmin_t(t_ns)
    valid = jnp.isfinite(t)
    # bullseye modifier uses the LOCAL-space hit position (the reference
    # intersects the plane in local space, RScene.h:306-328)
    o_w, d_w = _winner_ray(o_l, d_l, idx, o, d, trs)
    t_safe = jnp.where(valid, t, 0.0)
    hit_pos = o_w + d_w * t_safe
    pln_pos_w = from_aos(scene.pln_pos)[idx]
    rel = hit_pos - pln_pos_w
    dist = jnp.sqrt(rel.x * rel.x + rel.y * rel.y + rel.z * rel.z)
    ring = jnp.mod(dist * 0.25, 1.0) > 0.5
    color_mod = jnp.where(scene.pln_bullseye[idx] & ring & valid, 0.2, 1.0)
    n_local = from_aos(scene.pln_normal)[idx]
    if trs is not None:
        from ..ops.quaternion import rotate_vector

        normal = rotate_vector(_winner_rotation(trs, idx), n_local)
    else:
        normal = n_local
    return t, idx, scene.pln_mat[idx], normal, color_mod


def _spheres_candidate(scene: SceneData, o: V3, d: V3, time, tmin, tmax):
    o_l, d_l, trs = _rays_to_local(scene, scene.sph_xf, o, d, time)
    center = from_aos(scene.sph_center)[None, :]
    t_ns, _ = sphere_intersect(
        o_l, d_l, tmin, tmax[:, None], center, scene.sph_radius[None]
    )
    t, idx = _argmin_t(t_ns)
    o_w, d_w = _winner_ray(o_l, d_l, idx, o, d, trs)
    t_safe = jnp.where(jnp.isfinite(t), t, 0.0)
    p_local = o_w + d_w * t_safe
    n_local = normalize(p_local - from_aos(scene.sph_center)[idx])
    if trs is not None:
        from ..ops.quaternion import rotate_vector

        normal = rotate_vector(_winner_rotation(trs, idx), n_local)
    else:
        normal = n_local
    return (
        t,
        scene.sphere_id0 + idx,
        scene.sph_mat[idx],
        normal,
        jnp.ones_like(t),
    )


def _rects_candidate(scene: SceneData, o: V3, d: V3, time, tmin, tmax):
    o_l, d_l, trs = _rays_to_local(scene, scene.rect_xf, o, d, time)
    corner = from_aos(scene.rect_corner)[None, :]
    s1 = from_aos(scene.rect_side1)[None, :]
    s2 = from_aos(scene.rect_side2)[None, :]
    t_ns, _, normals = rect_intersect(o_l, d_l, tmin, tmax[:, None], corner, s1, s2)
    t, idx = _argmin_t(t_ns)
    sel = lambda a: jnp.take_along_axis(
        jnp.broadcast_to(a, t_ns.shape), idx[:, None], axis=1
    )[:, 0]
    n_local = V3(sel(normals.x), sel(normals.y), sel(normals.z))
    if trs is not None:
        from ..ops.quaternion import rotate_vector

        normal = rotate_vector(_winner_rotation(trs, idx), n_local)
    else:
        normal = n_local
    return (
        t,
        scene.rect_id0 + idx,
        scene.rect_mat[idx],
        normal,
        jnp.ones_like(t),
    )


def _mesh_local_ray(scene: SceneData, mi: int, o: V3, d: V3, time):
    if not scene.has_motion:
        return o, d, None
    translation, scaling, rotation = xf.eval_transform(
        scene.xf_times,
        scene.xf_translate,
        scene.xf_scale,
        scene.xf_rotate,
        scene.xf_nkeys,
        scene.mesh_xf[mi],
        time,
    )
    o_l = xf.to_local_point(o, translation, scaling, rotation)
    d_l = xf.to_local_vector(d, translation, scaling, rotation)
    return o_l, d_l, rotation


def _mesh_candidate(scene: SceneData, o: V3, d: V3, time, tmin, tmax):
    """Intersect all meshes (sequential host loop over the static mesh count;
    each mesh has its own local space, mirroring Mesh::intersect,
    RMesh.h:62-81). Uses the dense cluster traversal (mesh_intersect.py)."""
    from .mesh_intersect import mesh_intersect_clusters

    n = o.shape[0]
    t_best = jnp.full((n,), INF)
    prim_best = jnp.full((n,), -1, jnp.int32)
    beta_best = jnp.zeros((n,), jnp.float32)
    gamma_best = jnp.zeros((n,), jnp.float32)
    rot_best = None
    overflow = jnp.int32(0)

    for mi in range(scene.n_meshes):
        o_l, d_l, rotation = _mesh_local_ray(scene, mi, o, d, time)
        t_cap = jnp.minimum(t_best, tmax)
        t_m, prim_m, beta_m, gamma_m, ovf_m = mesh_intersect_clusters(
            scene, mi, o_l, d_l, tmin, t_cap
        )
        overflow = overflow + ovf_m
        closer = prim_m >= 0
        t_best = jnp.where(closer, t_m, t_best)
        prim_best = jnp.where(closer, prim_m, prim_best)
        beta_best = jnp.where(closer, beta_m, beta_best)
        gamma_best = jnp.where(closer, gamma_m, gamma_best)
        if scene.has_motion:
            from ..ops.quaternion import Quat

            if rot_best is None:
                rot_best = Quat(
                    jnp.ones((n,), jnp.float32),
                    V3(*(jnp.zeros((n,), jnp.float32),) * 3),
                )
            rot_best = Quat(
                jnp.where(closer, rotation.w, rot_best.w),
                vwhere(closer, rotation.v, rot_best.v),
            )

    valid = prim_best >= 0
    pr = jnp.maximum(prim_best, 0)
    alpha = 1.0 - beta_best - gamma_best
    # shading normal: barycentric-interpolated vertex normals when present,
    # else normalized geometric normal (RMesh.h:308-328). All per-triangle
    # data comes from ONE packed row gather (tri_meta_rows, see scene.py).
    meta = scene.tri_meta_rows[pr]  # [N, 16]
    n0 = V3(meta[:, 0], meta[:, 1], meta[:, 2])
    n1 = V3(meta[:, 3], meta[:, 4], meta[:, 5])
    n2 = V3(meta[:, 6], meta[:, 7], meta[:, 8])
    has_n = meta[:, 9] > 0.5
    mesh_idx = meta[:, 11].astype(jnp.int32)
    gnormal = V3(meta[:, 12], meta[:, 13], meta[:, 14])  # precomputed unit
    n_interp = n0 * alpha + n1 * beta_best + n2 * gamma_best
    n_local = vwhere(has_n, normalize(n_interp), gnormal)
    if rot_best is not None:
        from ..ops.quaternion import rotate_vector

        normal = rotate_vector(rot_best, n_local)
    else:
        normal = n_local
    return (
        jnp.where(valid, t_best, INF),
        jnp.where(valid, scene.mesh_id0 + mesh_idx, -1),
        jnp.where(valid, scene.mesh_mat[mesh_idx], -1),
        normal,
        jnp.ones_like(t_best),
        overflow,
    )


# ---------------------------------------------------------------------------
# Scene-level closest-hit and any-hit
# ---------------------------------------------------------------------------


def scene_intersect(scene: SceneData, o: V3, d: V3, time, tmin, tmax) -> Hit:
    """Closest hit for a wavefront. o, d: V3 of [N]; time: [N]; tmin: scalar;
    tmax: [N] (or scalar broadcastable)."""
    n = o.shape[0]
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (n,))
    time = jnp.broadcast_to(jnp.asarray(time, jnp.float32), (n,))

    best = (
        jnp.full((n,), INF),
        jnp.full((n,), -1, jnp.int32),
        jnp.full((n,), -1, jnp.int32),
        V3(jnp.zeros((n,)), jnp.zeros((n,)), jnp.zeros((n,))),
        jnp.ones((n,), jnp.float32),
    )

    def fold(best, cand):
        t_b, id_b, mat_b, n_b, cm_b = best
        t_c, id_c, mat_c, n_c, cm_c = cand
        closer = t_c < t_b
        return (
            jnp.where(closer, t_c, t_b),
            jnp.where(closer, id_c.astype(jnp.int32), id_b),
            jnp.where(closer, mat_c.astype(jnp.int32), mat_b),
            vwhere(closer, n_c, n_b),
            jnp.where(closer, cm_c, cm_b),
        )

    overflow = jnp.int32(0)
    if scene.n_planes:
        best = fold(best, _planes_candidate(scene, o, d, time, tmin, tmax))
    if scene.n_spheres:
        best = fold(best, _spheres_candidate(scene, o, d, time, tmin, tmax))
    if scene.n_rects:
        best = fold(best, _rects_candidate(scene, o, d, time, tmin, tmax))
    if scene.n_meshes:
        cand = _mesh_candidate(scene, o, d, time, tmin, tmax)
        overflow = cand[-1]
        best = fold(best, cand[:-1])

    t, shape_id, mat, normal, color_mod = best
    valid = jnp.isfinite(t) & (t < tmax)
    return Hit(
        t=t,
        valid=valid,
        shape_id=jnp.where(valid, shape_id, -1),
        mat=jnp.where(valid, mat, -1),
        normal=normal,
        color_mod=jnp.where(valid, color_mod, 1.0),
        overflow=overflow,
    )


def scene_occluded(scene: SceneData, o: V3, d: V3, time, tmin, tmax):
    """Any-hit shadow query (ShapeSet::doesIntersect).

    Returns (occluded bool [N], overflow [] int32 — see Hit.overflow)."""
    n = o.shape[0]
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (n,))
    time = jnp.broadcast_to(jnp.asarray(time, jnp.float32), (n,))
    occluded = jnp.zeros((n,), bool)

    if scene.n_planes:
        o_l, d_l, _ = _rays_to_local(scene, scene.pln_xf, o, d, time)
        t_ns, _ = plane_intersect(
            o_l,
            d_l,
            tmin,
            tmax[:, None],
            from_aos(scene.pln_pos)[None, :],
            from_aos(scene.pln_normal)[None, :],
        )
        occluded |= jnp.any(jnp.isfinite(t_ns), axis=1)
    if scene.n_spheres:
        o_l, d_l, _ = _rays_to_local(scene, scene.sph_xf, o, d, time)
        t_ns, _ = sphere_intersect(
            o_l,
            d_l,
            tmin,
            tmax[:, None],
            from_aos(scene.sph_center)[None, :],
            scene.sph_radius[None],
        )
        occluded |= jnp.any(jnp.isfinite(t_ns), axis=1)
    if scene.n_rects:
        o_l, d_l, _ = _rays_to_local(scene, scene.rect_xf, o, d, time)
        t_ns, _, _ = rect_intersect(
            o_l,
            d_l,
            tmin,
            tmax[:, None],
            from_aos(scene.rect_corner)[None, :],
            from_aos(scene.rect_side1)[None, :],
            from_aos(scene.rect_side2)[None, :],
        )
        occluded |= jnp.any(jnp.isfinite(t_ns), axis=1)

    from .mesh_intersect import mesh_intersect_clusters

    overflow = jnp.int32(0)
    for mi in range(scene.n_meshes):
        o_l, d_l, _ = _mesh_local_ray(scene, mi, o, d, time)
        _, prim_m, _, _, ovf_m = mesh_intersect_clusters(
            scene,
            mi,
            o_l,
            d_l,
            tmin,
            jnp.where(occluded, 0.0, tmax),  # already-occluded lanes do no work
            any_hit=True,
        )
        occluded |= prim_m >= 0
        overflow = overflow + ovf_m

    return occluded, overflow


def material_row(scene: SceneData, mat_ids):
    """One packed row gather per lane: (kind [N]i32, color V3, param [N])."""
    row = scene.mat_rows[jnp.maximum(mat_ids, 0)]  # [N, 8]
    return (
        row[:, 0].astype(jnp.int32),
        V3(row[:, 1], row[:, 2], row[:, 3]),
        row[:, 4],
    )


def material_emittance(scene: SceneData, mat_ids):
    """emittance() per lane as V3: color*power for emitters, black otherwise
    (RMaterial.h:530-555). mat_ids: [N] int32 (−1 allowed)."""
    from ..ops.brdf import KIND_EMITTER

    kind, color, power = material_row(scene, mat_ids)
    is_emit = (kind == KIND_EMITTER) & (mat_ids >= 0)
    gain = jnp.where(is_emit, power, 0.0)
    return color * gain
