"""Wavefront scene intersection.

The reference's ``ShapeSet::intersect`` walks a shape list / BVH with virtual
dispatch per ray (Rayito_Stage7_QT/RScene.h:113-268). Here a whole SoA ray
wavefront is intersected against each *kind* of primitive in one dense
batched op (rays × shapes broadcasting for the handful of top-level shapes),
plus a lock-step skip-link BVH walk for triangle meshes; the per-kind winners
are then min-reduced. This is the "flat arrays + min-reduction instead of
pointer dispatch" design from SURVEY §7, and deliberately brute-forces the
top level (the reference itself only builds a scene BVH for >2 finite shapes;
dozens of dense AABB/quadric tests are cheaper than divergent traversal on a
vector machine).

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
from ..ops.vecmath import normalize

I32_NONE = jnp.int32(-1)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Hit:
    """SoA intersection record (the reference's Intersection, RRay.h:98-155)."""

    t: jnp.ndarray  # [N] float32; INF where no hit
    valid: jnp.ndarray  # [N] bool
    shape_id: jnp.ndarray  # [N] int32 global shape id; -1 = miss
    mat: jnp.ndarray  # [N] int32 material id; -1 = miss
    normal: jnp.ndarray  # [N, 3]
    color_mod: jnp.ndarray  # [N] scalar modifier (bullseye texture)


def _eval_xf(scene: SceneData, xf_ids, time):
    """Per-(ray, shape) TRS evaluation. xf_ids [S], time [N] -> [N, S, ...]."""
    return xf.eval_transform(
        scene.xf_times,
        scene.xf_translate,
        scene.xf_scale,
        scene.xf_rotate,
        scene.xf_nkeys,
        xf_ids[None, :],
        time[:, None],
    )


def _rays_to_local(scene: SceneData, xf_ids, o, d, time):
    """Transform rays into each shape's local space.

    Returns (o_local [N,S,3], d_local [N,S,3], trs or None). When the scene is
    static this is a free broadcast. Local t equals world t (RRay.h:78-87).
    """
    if not scene.has_motion:
        return o[:, None, :], d[:, None, :], None
    trs = _eval_xf(scene, xf_ids, time)
    translation, scaling, rotation = trs
    o_l = xf.to_local_point(o[:, None, :], translation, scaling, rotation)
    d_l = xf.to_local_vector(d[:, None, :], translation, scaling, rotation)
    return o_l, d_l, trs


def _normal_from_local(trs, n_local, winner_idx):
    """Rotate the winning shape's local normal back to world (normals rotate
    only; no inverse-scale correction — reference quirk, RMath.h:834-842)."""
    if trs is None:
        return n_local
    _, _, rotation = trs
    rot_w = jnp.take_along_axis(
        rotation, winner_idx[:, None, None].astype(jnp.int32), axis=1
    )[:, 0, :]
    from ..ops import quaternion as quat

    return quat.rotate_vector(rot_w, n_local)


def _argmin_t(t_ns):
    """t_ns [N, S] -> (t_best [N], idx [N])."""
    idx = jnp.argmin(t_ns, axis=1).astype(jnp.int32)
    t = jnp.take_along_axis(t_ns, idx[:, None], axis=1)[:, 0]
    return t, idx


def _gather_winner_ray(o_l, d_l, idx, o, d, trs):
    """Local-space ray of the winning shape per lane.

    When the scene is static, o_l/d_l are broadcast views with a size-1 shape
    axis — gathering them by shape index would be out-of-bounds (jnp fills
    OOB gathers with NaN); the world ray IS the local ray, so return it."""
    if trs is None:
        return o, d
    o_w = jnp.take_along_axis(o_l, idx[:, None, None], axis=1)[:, 0]
    d_w = jnp.take_along_axis(d_l, idx[:, None, None], axis=1)[:, 0]
    return o_w, d_w


# ---------------------------------------------------------------------------
# Per-kind candidate intersections
# ---------------------------------------------------------------------------


def _planes_candidate(scene: SceneData, o, d, time, tmin, tmax):
    o_l, d_l, trs = _rays_to_local(scene, scene.pln_xf, o, d, time)
    t_ns, _ = plane_intersect(
        o_l, d_l, tmin, tmax[:, None], scene.pln_pos[None], scene.pln_normal[None]
    )
    t, idx = _argmin_t(t_ns)
    valid = jnp.isfinite(t)
    # bullseye modifier uses the LOCAL-space hit position (the reference
    # intersects the plane in local space, RScene.h:306-328)
    o_w, d_w = _gather_winner_ray(o_l, d_l, idx, o, d, trs)
    t_safe = jnp.where(valid, t, 0.0)  # keep inf out of the bullseye math
    hit_pos = o_w + d_w * t_safe[:, None]
    pln_pos_w = scene.pln_pos[idx]
    dist = jnp.sqrt(jnp.sum((hit_pos - pln_pos_w) ** 2, axis=-1))
    ring = jnp.mod(dist * 0.25, 1.0) > 0.5
    color_mod = jnp.where(scene.pln_bullseye[idx] & ring & valid, 0.2, 1.0)
    n_local = scene.pln_normal[idx]
    normal = _normal_from_local(trs, n_local, idx)
    return (
        t,
        idx,  # shape id base 0
        scene.pln_mat[idx],
        normal,
        color_mod,
    )


def _spheres_candidate(scene: SceneData, o, d, time, tmin, tmax):
    o_l, d_l, trs = _rays_to_local(scene, scene.sph_xf, o, d, time)
    t_ns, _ = sphere_intersect(
        o_l,
        d_l,
        tmin,
        tmax[:, None],
        scene.sph_center[None],
        scene.sph_radius[None],
    )
    t, idx = _argmin_t(t_ns)
    o_w, d_w = _gather_winner_ray(o_l, d_l, idx, o, d, trs)
    t_safe = jnp.where(jnp.isfinite(t), t, 0.0)
    p_local = o_w + d_w * t_safe[:, None]
    n_local = normalize(p_local - scene.sph_center[idx])
    normal = _normal_from_local(trs, n_local, idx)
    return (
        t,
        scene.sphere_id0 + idx,
        scene.sph_mat[idx],
        normal,
        jnp.ones_like(t),
    )


def _rects_candidate(scene: SceneData, o, d, time, tmin, tmax):
    o_l, d_l, trs = _rays_to_local(scene, scene.rect_xf, o, d, time)
    t_ns, _, normals = rect_intersect(
        o_l,
        d_l,
        tmin,
        tmax[:, None],
        scene.rect_corner[None],
        scene.rect_side1[None],
        scene.rect_side2[None],
    )
    t, idx = _argmin_t(t_ns)
    n_local = jnp.take_along_axis(normals, idx[:, None, None], axis=1)[:, 0]
    normal = _normal_from_local(trs, n_local, idx)
    return (
        t,
        scene.rect_id0 + idx,
        scene.rect_mat[idx],
        normal,
        jnp.ones_like(t),
    )


# ---------------------------------------------------------------------------
# BVH traversal (skip-link, lock-step over the wavefront)
# ---------------------------------------------------------------------------


def bvh_traverse(scene: SceneData, root, o, d, tmin, t_init, any_hit: bool = False):
    """Walk one mesh's threaded BVH for a whole wavefront.

    Every lane holds a single int32 cursor; per step: gather node, slab test
    (bounded by the lane's current best t), masked Möller-Trumbore on leaf
    primitives, advance cursor to hit_link/miss_link. Lanes finish by setting
    cursor = -1; the loop ends when all lanes are done. This replaces the
    reference's 50-entry traversal stack (RAccel.h:377-560) with a stackless
    walk that is SIMD-coherent by construction.

    Returns (t_best [N], prim_best [N] (-1 = miss), beta [N], gamma [N]).
    """
    n = o.shape[0]
    inv_d = 1.0 / d  # IEEE inf handling gives correct slab behavior
    node0 = jnp.full((n,), root, jnp.int32)
    state = (
        node0,
        t_init,
        jnp.full((n,), -1, jnp.int32),
        jnp.zeros((n,), jnp.float32),
        jnp.zeros((n,), jnp.float32),
    )

    def cond(s):
        return jnp.any(s[0] >= 0)

    def body(s):
        node, t_best, prim_best, beta_b, gamma_b = s
        active = node >= 0
        nd = jnp.maximum(node, 0)
        bmin = scene.bvh_min[nd]
        bmax = scene.bvh_max[nd]
        meta = scene.bvh_meta[nd]
        hit_link, miss_link, prim = meta[:, 0], meta[:, 1], meta[:, 2]
        box_hit, _, _ = aabb_intersect(o, inv_d, tmin, t_best, bmin, bmax)
        box_hit = box_hit & active
        is_leaf = prim >= 0
        pr = jnp.maximum(prim, 0)
        t, hit, beta, gamma, _ = triangle_intersect(
            o, d, tmin, t_best, scene.tri_v0[pr], scene.tri_v1[pr], scene.tri_v2[pr]
        )
        tri_hit = hit & box_hit & is_leaf
        t_best = jnp.where(tri_hit, t, t_best)
        prim_best = jnp.where(tri_hit, pr, prim_best)
        beta_b = jnp.where(tri_hit, beta, beta_b)
        gamma_b = jnp.where(tri_hit, gamma, gamma_b)
        nxt = jnp.where(box_hit, hit_link, miss_link)
        if any_hit:
            nxt = jnp.where(prim_best >= 0, -1, nxt)
        node = jnp.where(active, nxt, -1)
        return node, t_best, prim_best, beta_b, gamma_b

    node, t_best, prim_best, beta, gamma = jax.lax.while_loop(cond, body, state)
    return t_best, prim_best, beta, gamma


def _mesh_candidate(scene: SceneData, o, d, time, tmin, tmax):
    """Intersect all meshes (sequential host loop over the static mesh count;
    each mesh has its own local space + BVH, mirroring Mesh::intersect,
    RMesh.h:62-81)."""
    n = o.shape[0]
    t_best = jnp.where(jnp.ones((n,), bool), INF, INF)
    prim_best = jnp.full((n,), -1, jnp.int32)
    beta_best = jnp.zeros((n,), jnp.float32)
    gamma_best = jnp.zeros((n,), jnp.float32)
    rot_best: Optional[jnp.ndarray] = None

    for mi in range(scene.n_meshes):
        if scene.has_motion:
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
        else:
            o_l, d_l, rotation = o, d, None
        t_cap = jnp.minimum(t_best, tmax)
        t_m, prim_m, beta_m, gamma_m = bvh_traverse(
            scene, scene.mesh_bvh_root[mi], o_l, d_l, tmin, t_cap
        )
        closer = prim_m >= 0
        t_best = jnp.where(closer, t_m, t_best)
        prim_best = jnp.where(closer, prim_m, prim_best)
        beta_best = jnp.where(closer, beta_m, beta_best)
        gamma_best = jnp.where(closer, gamma_m, gamma_best)
        if scene.has_motion:
            if rot_best is None:
                rot_best = jnp.broadcast_to(
                    jnp.array([1.0, 0.0, 0.0, 0.0], jnp.float32), (n, 4)
                )
            rot_best = jnp.where(closer[:, None], rotation, rot_best)

    valid = prim_best >= 0
    pr = jnp.maximum(prim_best, 0)
    alpha = 1.0 - beta_best - gamma_best
    # shading normal: barycentric-interpolated vertex normals when present,
    # else normalized geometric normal (RMesh.h:308-328)
    v0, v1, v2 = scene.tri_v0[pr], scene.tri_v1[pr], scene.tri_v2[pr]
    gnormal = jnp.cross(v1 - v0, v2 - v0)
    n_interp = (
        scene.tri_n0[pr] * alpha[:, None]
        + scene.tri_n1[pr] * beta_best[:, None]
        + scene.tri_n2[pr] * gamma_best[:, None]
    )
    n_local = jnp.where(
        scene.tri_has_normals[pr][:, None],
        normalize(n_interp),
        normalize(gnormal),
    )
    if rot_best is not None:
        from ..ops import quaternion as quat

        normal = quat.rotate_vector(rot_best, n_local)
    else:
        normal = n_local
    mesh_idx = scene.tri_mesh[pr]
    return (
        jnp.where(valid, t_best, INF),
        jnp.where(valid, scene.mesh_id0 + mesh_idx, -1),
        jnp.where(valid, scene.mesh_mat[mesh_idx], -1),
        normal,
        jnp.ones_like(t_best),
    )


# ---------------------------------------------------------------------------
# Scene-level closest-hit and any-hit
# ---------------------------------------------------------------------------


def scene_intersect(scene: SceneData, o, d, time, tmin, tmax) -> Hit:
    """Closest hit for a wavefront. o, d: [N,3]; time: [N]; tmin: scalar;
    tmax: [N] (or scalar broadcastable)."""
    n = o.shape[0]
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (n,))
    time = jnp.broadcast_to(jnp.asarray(time, jnp.float32), (n,))

    best = (
        jnp.full((n,), INF),
        jnp.full((n,), -1, jnp.int32),
        jnp.full((n,), -1, jnp.int32),
        jnp.zeros((n, 3), jnp.float32),
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
            jnp.where(closer[:, None], n_c, n_b),
            jnp.where(closer, cm_c, cm_b),
        )

    if scene.n_planes:
        best = fold(best, _planes_candidate(scene, o, d, time, tmin, tmax))
    if scene.n_spheres:
        best = fold(best, _spheres_candidate(scene, o, d, time, tmin, tmax))
    if scene.n_rects:
        best = fold(best, _rects_candidate(scene, o, d, time, tmin, tmax))
    if scene.n_meshes:
        best = fold(best, _mesh_candidate(scene, o, d, time, tmin, tmax))

    t, shape_id, mat, normal, color_mod = best
    valid = jnp.isfinite(t) & (t < tmax)
    return Hit(
        t=t,
        valid=valid,
        shape_id=jnp.where(valid, shape_id, -1),
        mat=jnp.where(valid, mat, -1),
        normal=normal,
        color_mod=jnp.where(valid, color_mod, 1.0),
    )


def scene_occluded(scene: SceneData, o, d, time, tmin, tmax) -> jnp.ndarray:
    """Any-hit shadow query (ShapeSet::doesIntersect). Returns bool [N]."""
    n = o.shape[0]
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (n,))
    time = jnp.broadcast_to(jnp.asarray(time, jnp.float32), (n,))
    occluded = jnp.zeros((n,), bool)

    if scene.n_planes:
        o_l, d_l, _ = _rays_to_local(scene, scene.pln_xf, o, d, time)
        t_ns, _ = plane_intersect(
            o_l, d_l, tmin, tmax[:, None], scene.pln_pos[None], scene.pln_normal[None]
        )
        occluded |= jnp.any(jnp.isfinite(t_ns), axis=1)
    if scene.n_spheres:
        o_l, d_l, _ = _rays_to_local(scene, scene.sph_xf, o, d, time)
        t_ns, _ = sphere_intersect(
            o_l, d_l, tmin, tmax[:, None], scene.sph_center[None], scene.sph_radius[None]
        )
        occluded |= jnp.any(jnp.isfinite(t_ns), axis=1)
    if scene.n_rects:
        o_l, d_l, _ = _rays_to_local(scene, scene.rect_xf, o, d, time)
        t_ns, _, _ = rect_intersect(
            o_l,
            d_l,
            tmin,
            tmax[:, None],
            scene.rect_corner[None],
            scene.rect_side1[None],
            scene.rect_side2[None],
        )
        occluded |= jnp.any(jnp.isfinite(t_ns), axis=1)
    for mi in range(scene.n_meshes):
        if scene.has_motion:
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
        else:
            o_l, d_l = o, d
        _, prim_m, _, _ = bvh_traverse(
            scene,
            scene.mesh_bvh_root[mi],
            o_l,
            d_l,
            tmin,
            jnp.where(occluded, 0.0, tmax),  # already-occluded lanes do no work
            any_hit=True,
        )
        occluded |= prim_m >= 0

    return occluded


def material_emittance(scene: SceneData, mat_ids):
    """emittance() per lane: color*power for emitters, black otherwise
    (RMaterial.h:530-555). mat_ids: [N] int32 (−1 allowed)."""
    safe = jnp.maximum(mat_ids, 0)
    kind = scene.mat_kind[safe]
    color = scene.mat_color[safe]
    power = scene.mat_param[safe]
    from ..ops.brdf import KIND_EMITTER

    emit = color * power[:, None]
    return jnp.where(((kind == KIND_EMITTER) & (mat_ids >= 0))[:, None], emit, 0.0)
