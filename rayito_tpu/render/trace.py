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


def _shape_local_ray(scene: SceneData, xfid, o: V3, d: V3, time):
    """Ray into ONE shape's local space (xfid: traced scalar transform id).
    Local t equals world t (RRay.h:78-87). Static scenes skip the math."""
    if not scene.has_motion:
        return o, d, None
    translation, scaling, rotation = xf.eval_transform(
        scene.xf_times,
        scene.xf_translate,
        scene.xf_scale,
        scene.xf_rotate,
        scene.xf_nkeys,
        xfid,
        time,
    )
    o_l = xf.to_local_point(o, translation, scaling, rotation)
    d_l = xf.to_local_vector(d, translation, scaling, rotation)
    return o_l, d_l, rotation


def _identity_quat(n):
    from ..ops.quaternion import Quat

    return Quat(
        jnp.ones((n,), jnp.float32), V3(*(jnp.zeros((n,), jnp.float32),) * 3)
    )


# ---------------------------------------------------------------------------
# Per-kind candidate intersections.
#
# Each kind folds a host loop over its (few) shapes with flat [N] ops. A
# dense [N, S] broadcast looks natural but is poison on TPU: the S-sized
# minor dim pads to 128 lanes, so 5 spheres cost 25x their arithmetic
# (measured: 9.5 ms -> <1 ms per 131k-ray wave for plane+spheres+rect).
# ---------------------------------------------------------------------------


class _WinnerFold:
    """Per-shape fold that SELECTS winner attributes in-loop instead of
    gathering them afterwards. A [N]-indexed gather from a tiny per-kind
    table moves 4-byte rows at ~1.3 GB/s on TPU (measured: the winner
    attribute gathers dominated scene_intersect); a where() select per
    shape fuses into the elementwise stream for free."""

    def __init__(self, scene, o: V3, d: V3, n):
        self.scene = scene
        self.n = n
        self.t = jnp.full((n,), INF)
        self.idx = jnp.zeros((n,), jnp.int32)
        self.mat = jnp.zeros((n,), jnp.int32)
        self.o_w, self.d_w = o, d
        self.rot = _identity_quat(n) if scene.has_motion else None
        self.v3s = {}

    def track_v3(self, name, init=None):
        z = jnp.zeros((self.n,), jnp.float32)
        self.v3s[name] = init if init is not None else V3(z, z, z)

    def update(self, closer, i, t_i, mat_i, o_l, d_l, rot, **v3_vals):
        n = self.n
        self.t = jnp.where(closer, t_i, self.t)
        self.idx = jnp.where(closer, jnp.int32(i), self.idx)
        self.mat = jnp.where(closer, mat_i, self.mat)
        for name, val in v3_vals.items():
            self.v3s[name] = vwhere(
                closer,
                V3(
                    jnp.broadcast_to(val.x, (n,)),
                    jnp.broadcast_to(val.y, (n,)),
                    jnp.broadcast_to(val.z, (n,)),
                ),
                self.v3s[name],
            )
        if self.scene.has_motion:
            from ..ops.quaternion import Quat

            if rot is None:
                rot = _identity_quat(n)
            self.o_w = vwhere(closer, o_l, self.o_w)
            self.d_w = vwhere(closer, d_l, self.d_w)
            self.rot = Quat(
                jnp.where(closer, jnp.broadcast_to(rot.w, (n,)), self.rot.w),
                vwhere(
                    closer,
                    V3(
                        jnp.broadcast_to(rot.v.x, (n,)),
                        jnp.broadcast_to(rot.v.y, (n,)),
                        jnp.broadcast_to(rot.v.z, (n,)),
                    ),
                    self.rot.v,
                ),
            )


def _rotate_out(rot_b, n_local):
    if rot_b is None:
        return n_local
    from ..ops.quaternion import rotate_vector

    return rotate_vector(rot_b, n_local)


def select_small(table, ids, n_rows: int):
    """table[ids] for a tiny table via a where-chain (no gather): ids [N]
    in [0, n_rows)."""
    out = jnp.broadcast_to(table[0], ids.shape)
    for i in range(1, n_rows):
        out = jnp.where(ids == i, table[i], out)
    return out


def _planes_candidate(scene: SceneData, o: V3, d: V3, time, tmin, tmax):
    pos = from_aos(scene.pln_pos)
    nrm = from_aos(scene.pln_normal)
    n = o.shape[0]
    f = _WinnerFold(scene, o, d, n)
    f.track_v3("pos")
    f.track_v3("nrm")
    bulls_b = jnp.zeros((n,), bool)
    for i in range(scene.n_planes):
        o_l, d_l, rot = _shape_local_ray(scene, scene.pln_xf[i], o, d, time)
        t_i, _ = plane_intersect(
            o_l, d_l, tmin, jnp.minimum(f.t, tmax), pos[i], nrm[i]
        )
        closer = t_i < f.t
        f.update(closer, i, t_i, scene.pln_mat[i], o_l, d_l, rot,
                 pos=pos[i], nrm=nrm[i])
        bulls_b = jnp.where(closer, scene.pln_bullseye[i], bulls_b)
    t = f.t
    valid = jnp.isfinite(t)
    # bullseye modifier uses the LOCAL-space hit position (the reference
    # intersects the plane in local space, RScene.h:306-328)
    t_safe = jnp.where(valid, t, 0.0)
    hit_pos = f.o_w + f.d_w * t_safe
    rel = hit_pos - f.v3s["pos"]
    dist = jnp.sqrt(rel.x * rel.x + rel.y * rel.y + rel.z * rel.z)
    ring = jnp.mod(dist * 0.25, 1.0) > 0.5
    color_mod = jnp.where(bulls_b & ring & valid, 0.2, 1.0)
    normal = _rotate_out(f.rot, f.v3s["nrm"])
    return t, f.idx, f.mat, normal, color_mod


def _spheres_candidate(scene: SceneData, o: V3, d: V3, time, tmin, tmax):
    center = from_aos(scene.sph_center)
    n = o.shape[0]
    f = _WinnerFold(scene, o, d, n)
    f.track_v3("center")
    for i in range(scene.n_spheres):
        o_l, d_l, rot = _shape_local_ray(scene, scene.sph_xf[i], o, d, time)
        t_i, _ = sphere_intersect(
            o_l, d_l, tmin, jnp.minimum(f.t, tmax), center[i],
            scene.sph_radius[i],
        )
        closer = t_i < f.t
        f.update(closer, i, t_i, scene.sph_mat[i], o_l, d_l, rot,
                 center=center[i])
    t = f.t
    t_safe = jnp.where(jnp.isfinite(t), t, 0.0)
    p_local = f.o_w + f.d_w * t_safe
    normal = _rotate_out(f.rot, normalize(p_local - f.v3s["center"]))
    return (
        t,
        scene.sphere_id0 + f.idx,
        f.mat,
        normal,
        jnp.ones_like(t),
    )


def _rects_candidate(scene: SceneData, o: V3, d: V3, time, tmin, tmax):
    corner = from_aos(scene.rect_corner)
    s1 = from_aos(scene.rect_side1)
    s2 = from_aos(scene.rect_side2)
    n = o.shape[0]
    f = _WinnerFold(scene, o, d, n)
    f.track_v3("nrm")
    for i in range(scene.n_rects):
        o_l, d_l, rot = _shape_local_ray(scene, scene.rect_xf[i], o, d, time)
        t_i, _, nrm_i = rect_intersect(
            o_l, d_l, tmin, jnp.minimum(f.t, tmax), corner[i], s1[i], s2[i]
        )
        closer = t_i < f.t
        f.update(closer, i, t_i, scene.rect_mat[i], o_l, d_l, rot, nrm=nrm_i)
    normal = _rotate_out(f.rot, f.v3s["nrm"])
    return (
        f.t,
        scene.rect_id0 + f.idx,
        f.mat,
        normal,
        jnp.ones_like(f.t),
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


def _mesh_shading(scene: SceneData, t_best, prim_best, beta_best, gamma_best,
                  rot_best, overflow):
    """Shared winner shading resolution: normals / material / shape id from
    the winning global triangle id (used by both traversal implementations)."""
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
    mesh_mat = select_small(scene.mesh_mat, mesh_idx, scene.n_meshes)
    return (
        jnp.where(valid, t_best, INF),
        jnp.where(valid, scene.mesh_id0 + mesh_idx, -1),
        jnp.where(valid, mesh_mat, -1),
        normal,
        jnp.ones_like(t_best),
        overflow,
    )


def _domain_local_ray(scene: SceneData, di: int, o: V3, d: V3, time):
    """Ray into traversal-domain ``di``'s local space (identity-transform
    domains stay in world space — local ray IS the world ray)."""
    xfi = scene.ktab_xf[di]
    if not scene.has_motion or xfi == 0:
        return o, d, None
    translation, scaling, rotation = xf.eval_transform(
        scene.xf_times,
        scene.xf_translate,
        scene.xf_scale,
        scene.xf_rotate,
        scene.xf_nkeys,
        jnp.int32(xfi),
        time,
    )
    o_l = xf.to_local_point(o, translation, scaling, rotation)
    d_l = xf.to_local_vector(d, translation, scaling, rotation)
    return o_l, d_l, rotation


def use_pallas_traversal(scene: SceneData) -> bool:
    from .pallas_traverse import traversal_impl

    return (
        len(scene.ktab_xf) > 0
        and scene.ktab_fits
        and traversal_impl() == "pallas"
    )


def _mesh_candidate_pallas(scene: SceneData, o: V3, d: V3, time, tmin, tmax):
    """Mesh intersection via the fused Pallas kernel: one launch per
    traversal domain (all static meshes share ONE merged domain — the
    scene-level Bvh<ShapeSet> role, RScene.h:135-147). Overflow is
    structurally zero: every slab-hit cluster is tested."""
    import types

    from ..accel.kernel_tables import KTRI
    from ..ops.intersect import triangle_intersect
    from .pallas_traverse import traverse

    n = o.shape[0]
    t_best = jnp.full((n,), INF)
    prim_best = jnp.full((n,), -1, jnp.int32)
    beta_best = jnp.zeros((n,), jnp.float32)
    gamma_best = jnp.zeros((n,), jnp.float32)
    rot_best = _identity_quat(n) if scene.has_motion else None

    for di in range(len(scene.ktab_xf)):
        o_l, d_l, rotation = _domain_local_ray(scene, di, o, d, time)
        view = types.SimpleNamespace(
            tri=scene.ktab_tri[di], cl_box=scene.ktab_box[di]
        )
        _, p_d = traverse(
            o_l, d_l, jnp.minimum(t_best, tmax), view, tmin, want_t=False
        )
        # winner re-test per domain: exact t + barycentrics from one packed
        # vertex-row gather (the kernel's packed key carries ~2^-17 t slack
        # and its winner id; the fold across domains compares EXACT t)
        found = p_d >= 0
        p_safe = jnp.maximum(p_d, 0)
        cl = p_safe // KTRI
        lane = p_safe - cl * KTRI
        segs = scene.ktab_seg[di]
        if 0 < len(segs) <= 16:
            # piecewise-affine cluster -> global id (no gather)
            g_d = jnp.int32(segs[0][1]) + cl * KTRI
            for cl0_s, tri0_s in segs[1:]:
                g_d = jnp.where(
                    cl >= cl0_s, jnp.int32(tri0_s) + (cl - cl0_s) * KTRI, g_d
                )
            g_d = g_d + lane
        else:
            g_d = scene.ktab_base[di][cl] + lane
        vrow = scene.tri_vert_rows[jnp.where(found, g_d, 0)]  # [N, 16]
        t_fin, h_fin, beta, gamma, _ = triangle_intersect(
            o_l, d_l, tmin, jnp.full((n,), INF),
            V3(vrow[:, 0], vrow[:, 1], vrow[:, 2]),
            V3(vrow[:, 3], vrow[:, 4], vrow[:, 5]),
            V3(vrow[:, 6], vrow[:, 7], vrow[:, 8]),
        )
        closer = found & h_fin & (t_fin < jnp.minimum(t_best, tmax))
        t_best = jnp.where(closer, t_fin, t_best)
        prim_best = jnp.where(closer, g_d, prim_best)
        beta_best = jnp.where(closer, beta, beta_best)
        gamma_best = jnp.where(closer, gamma, gamma_best)
        if scene.has_motion:
            from ..ops.quaternion import Quat

            if rotation is None:  # world-space domain: identity rotation
                rotation = _identity_quat(n)
            rot_best = Quat(
                jnp.where(closer, jnp.broadcast_to(rotation.w, (n,)), rot_best.w),
                vwhere(
                    closer,
                    V3(
                        jnp.broadcast_to(rotation.v.x, (n,)),
                        jnp.broadcast_to(rotation.v.y, (n,)),
                        jnp.broadcast_to(rotation.v.z, (n,)),
                    ),
                    rot_best.v,
                ),
            )

    # tiny transformed meshes fold via the dense XLA path (a kernel launch
    # per 1-cluster mesh would be all fixed cost — scene.ktab_small)
    overflow = jnp.int32(0)
    for mi in scene.ktab_small:
        from .mesh_intersect import mesh_intersect_clusters

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

            rot_best = Quat(
                jnp.where(closer, rotation.w, rot_best.w),
                vwhere(closer, rotation.v, rot_best.v),
            )

    return _mesh_shading(
        scene, t_best, prim_best, beta_best, gamma_best, rot_best,
        overflow,
    )


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

    return _mesh_shading(
        scene, t_best, prim_best, beta_best, gamma_best, rot_best, overflow
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
        # cap the mesh query at the analytic winner's t: the traversal's
        # per-ray tmax feeds the cluster slab tests, so a ray that already
        # hit the ground plane / a sphere prunes every cluster behind that
        # hit (the fold would discard those hits anyway)
        tmax_mesh = jnp.minimum(tmax, best[0])
        if use_pallas_traversal(scene):
            cand = _mesh_candidate_pallas(scene, o, d, time, tmin, tmax_mesh)
        else:
            cand = _mesh_candidate(scene, o, d, time, tmin, tmax_mesh)
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

    pos, nrm = from_aos(scene.pln_pos), from_aos(scene.pln_normal)
    for i in range(scene.n_planes):
        o_l, d_l, _ = _shape_local_ray(scene, scene.pln_xf[i], o, d, time)
        _, hit = plane_intersect(o_l, d_l, tmin, tmax, pos[i], nrm[i])
        occluded |= hit
    center = from_aos(scene.sph_center)
    for i in range(scene.n_spheres):
        o_l, d_l, _ = _shape_local_ray(scene, scene.sph_xf[i], o, d, time)
        _, hit = sphere_intersect(
            o_l, d_l, tmin, tmax, center[i], scene.sph_radius[i]
        )
        occluded |= hit
    corner = from_aos(scene.rect_corner)
    s1, s2 = from_aos(scene.rect_side1), from_aos(scene.rect_side2)
    for i in range(scene.n_rects):
        o_l, d_l, _ = _shape_local_ray(scene, scene.rect_xf[i], o, d, time)
        _, hit, _ = rect_intersect(o_l, d_l, tmin, tmax, corner[i], s1[i], s2[i])
        occluded |= hit

    overflow = jnp.int32(0)
    if scene.n_meshes and use_pallas_traversal(scene):
        import types

        from .pallas_traverse import traverse

        for di in range(len(scene.ktab_xf)):
            o_l, d_l, _ = _domain_local_ray(scene, di, o, d, time)
            view = types.SimpleNamespace(
                tri=scene.ktab_tri[di], cl_box=scene.ktab_box[di]
            )
            _, p_d = traverse(
                o_l, d_l, jnp.where(occluded, 0.0, tmax), view, tmin,
                want_t=False,
            )
            occluded |= p_d >= 0
        from .mesh_intersect import mesh_intersect_clusters

        for mi in scene.ktab_small:  # tiny transformed meshes: XLA fold
            o_l, d_l, _ = _mesh_local_ray(scene, mi, o, d, time)
            _, prim_m, _, _, ovf_m = mesh_intersect_clusters(
                scene, mi, o_l, d_l, tmin,
                jnp.where(occluded, 0.0, tmax), any_hit=True,
            )
            occluded |= prim_m >= 0
            overflow = overflow + ovf_m
        return occluded, overflow

    from .mesh_intersect import mesh_intersect_clusters

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
    """Per-lane material lookup: (kind [N]i32, color V3, param [N]).
    Small tables use a where-chain (fuses into the elementwise stream;
    a [N]-indexed small-row gather runs at ~1.3 GB/s on TPU)."""
    ids = jnp.maximum(mat_ids, 0)
    m = scene.mat_rows.shape[0]
    if m <= 16:
        kind = select_small(scene.mat_kind, ids, m)
        color = V3(
            select_small(scene.mat_color[:, 0], ids, m),
            select_small(scene.mat_color[:, 1], ids, m),
            select_small(scene.mat_color[:, 2], ids, m),
        )
        param = select_small(scene.mat_param, ids, m)
        return kind.astype(jnp.int32), color, param
    row = scene.mat_rows[ids]  # [N, 8]
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
