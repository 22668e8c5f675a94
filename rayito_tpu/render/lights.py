"""Area-light sampling with pdfs (stage 5-7 semantics) for NEE/MIS — SoA.

Implements the pdf-aware Light::sampleSurface / intersectPdf family
(Rayito_Stage7_QT/RLight.h:185-247 rect, :280-330 ShapeLight;
RScene.h:525-601 sphere) as vectorized per-light functions over V3
wavefronts. Each light index is a HOST-static value (lights are few);
per-lane light *choice* is handled by computing all lights' candidates and
selecting by the lane's chosen index.

All transforms are evaluated per lane at the ray time (motion-blurred lights).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.scene import LIGHT_MESH, LIGHT_RECT, LIGHT_SPHERE, SceneData
from ..ops import transform as xfm
from ..ops.intersect import sphere_intersect
from ..ops.vec3 import (
    V3,
    cross,
    dot,
    from_local_frame,
    make_coordinate_space,
    normalize,
    splat,
    where as vwhere,
)
from ..ops.vec3 import PI
from ..ops.warps import uniform_cone_pdf, uniform_to_cone, uniform_to_sphere

PDF_CLAMP = 1.0e10  # "really big PDFs blow up power-heuristic MIS" (RLight.h:210-215)


def _lane_links(scene: SceneData, xf_id, time):
    """Evaluate a transform CHAIN at per-lane times (nested Group
    aggregates, ops/transform.py eval_chain). With xf_depth == 1 this is
    one eval_transform — the pre-group fast path."""
    time = jnp.asarray(time, jnp.float32)
    return xfm.eval_chain(
        scene.xf_times,
        scene.xf_translate,
        scene.xf_scale,
        scene.xf_rotate,
        scene.xf_nkeys,
        scene.xf_parent,
        scene.xf_depth,
        jnp.asarray(xf_id, jnp.int32),
        time,
    )


def _const3(arr_row) -> V3:
    """Row of a small [K,3] table -> constant V3."""
    return V3(arr_row[0], arr_row[1], arr_row[2])


def _sample_rect(scene: SceneData, idx, ref_pos: V3, time, u1, u2):
    """RectangleLight sampleSurface body (RLight.h:185-247); ``idx`` may be
    a host int (unrolled dispatch) or a traced scalar (rolled fori)."""
    links = _lane_links(scene, scene.rect_xf[idx], time)
    corner = _const3(scene.rect_corner[idx])
    s1 = _const3(scene.rect_side1[idx])
    s2 = _const3(scene.rect_side2[idx])
    pos_local = corner + s1 * u1 + s2 * u2
    pos = xfm.from_local_point_chain(links, pos_local)
    outgoing = ref_pos - pos
    dist = jnp.sqrt(jnp.maximum(dot(outgoing, outgoing), 1e-37))
    outgoing = outgoing / dist
    nrm = cross(s1, s2).broadcast_to(pos.shape)
    # transform out as a VECTOR to preserve scale — |n| is the area
    # (RLight.h:199-202)
    nrm_w = xfm.from_local_vector_chain(links, nrm)
    area = jnp.sqrt(jnp.maximum(dot(nrm_w, nrm_w), 1e-37))
    nrm_w = nrm_w / area
    flip = dot(nrm_w, outgoing) < 0.0
    nrm_w = vwhere(flip, -nrm_w, nrm_w)
    pdf = dist * dist / jnp.maximum(area * jnp.abs(dot(nrm_w, outgoing)), 1e-37)
    pdf = jnp.where(pdf > PDF_CLAMP, 0.0, pdf)
    return pos, nrm_w, pdf


def _sample_sphere(scene: SceneData, idx, ref_pos: V3, time, u1, u2,
                   tmin: float):
    """Sphere ShapeLight sampleSurface body (RScene.h:525-601 + the
    RLight.h:305-309 backface rejection); ``idx`` host int or traced."""
    links = _lane_links(scene, scene.sph_xf[idx], time)
    center = _const3(scene.sph_center[idx])
    radius = scene.sph_radius[idx]
    local_ref = xfm.to_local_point_chain(links, ref_pos)
    to_center = center - local_ref
    dist2 = dot(to_center, to_center)
    inside = dist2 < radius * radius * 1.00001

    # --- inside branch: uniform over the sphere (RScene.h:536-551)
    n_in = uniform_to_sphere(u1, u2)
    pos_in_local = n_in * radius + center
    n_in_w = xfm.from_local_normal_chain(links, n_in)
    pos_in = xfm.from_local_point_chain(links, pos_in_local)
    to_surf = ref_pos - pos_in
    sapdf = 3.0 / (4.0 * PI * radius * radius)  # factor-3 quirk (RScene.h:598-601)
    pdf_in = (
        dot(to_surf, to_surf)
        * sapdf
        / jnp.maximum(jnp.abs(dot(normalize(to_surf), n_in_w)), 1e-37)
    )

    # --- outside branch: cone sampling + verification ray (RScene.h:552-575)
    sin2 = radius * radius / jnp.maximum(dist2, 1e-37)
    cos_theta_max = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2))
    x, y, z = make_coordinate_space(to_center)
    cone = normalize(from_local_frame(uniform_to_cone(u1, u2, cos_theta_max), x, y, z))
    t_hit, did_hit = sphere_intersect(
        local_ref,
        cone,
        tmin,
        jnp.full(jnp.shape(u1), 1.0e30, jnp.float32),
        center.broadcast_to(jnp.shape(u1)),
        radius,
    )
    t = jnp.where(did_hit, t_hit, dot(to_center, cone))
    pos_out_local = local_ref + cone * t
    n_out = normalize(pos_out_local - center)
    n_out_w = xfm.from_local_normal_chain(links, n_out)
    pos_out = xfm.from_local_point_chain(links, pos_out_local)
    pdf_out = uniform_cone_pdf(cos_theta_max)

    pos = vwhere(inside, pos_in, pos_out)
    nrm = vwhere(inside, n_in_w, n_out_w)
    pdf = jnp.where(inside, pdf_in, pdf_out)
    # ShapeLight wrapper: discard samples whose normal faces away from the
    # reference point (RLight.h:305-309)
    facing = dot(nrm, ref_pos - pos) >= 0.0
    pdf = jnp.where(facing, pdf, 0.0)
    return pos, nrm, pdf


def sample_light(scene: SceneData, li: int, ref_pos: V3, ref_normal: V3, time,
                 u1, u2, u3, tmin: float):
    """sampleSurface for light ``li`` (host-static index).

    Returns (light_pos V3, light_normal V3, pdf [N]); pdf == 0 marks a
    rejected sample (backfacing ShapeLight sample / clamped rect pdf).
    """
    kind = scene.light_kinds_host[li]
    idx = scene.light_indices_host[li]
    if kind == LIGHT_RECT:
        return _sample_rect(scene, idx, ref_pos, time, u1, u2)
    elif kind == LIGHT_SPHERE:
        return _sample_sphere(scene, idx, ref_pos, time, u1, u2, tmin)
    elif kind == LIGHT_MESH:
        return _sample_mesh_light(scene, idx, ref_pos, time, u1, u2, u3)
    else:
        raise NotImplementedError(f"unknown light kind {kind}")


def sample_chosen_light_rolled(scene: SceneData, light_idx, ref_pos: V3, time,
                               u1, u2, tmin: float):
    """Rolled per-lane light sampling for MANY-light scenes: ONE fori_loop
    body over the light table (both analytic kinds evaluated per row, the
    lane keeps the row matching its chosen ``light_idx``), so compile time
    is O(1) in the light count instead of the unrolled O(L) (VERDICT r2
    item 7; the reference's analogue is the ShapeSet virtual dispatch,
    RScene.h:135-147). Requires every light to be rect/sphere — mesh
    lights need host-static CDF slices and keep the unrolled path."""
    n = ref_pos.shape[0]
    zero = jnp.zeros((n,), jnp.float32)
    init = (V3(zero, zero, zero), V3(zero, zero, zero), zero)

    kinds = set(scene.light_kinds_host)  # host-static presence guards

    def body(li, carry):
        pos_a, nrm_a, pdf_a = carry
        kind = scene.light_kind[li]
        idx = scene.light_index[li]
        if LIGHT_RECT in kinds and LIGHT_SPHERE in kinds:
            pos_r, nrm_r, pdf_r = _sample_rect(
                scene, idx, ref_pos, time, u1, u2
            )
            pos_s, nrm_s, pdf_s = _sample_sphere(
                scene, idx, ref_pos, time, u1, u2, tmin
            )
            is_rect = kind == LIGHT_RECT
            pos_i = vwhere(is_rect, pos_r, pos_s)
            nrm_i = vwhere(is_rect, nrm_r, nrm_s)
            pdf_i = jnp.where(is_rect, pdf_r, pdf_s)
        elif LIGHT_RECT in kinds:
            pos_i, nrm_i, pdf_i = _sample_rect(
                scene, idx, ref_pos, time, u1, u2
            )
        else:
            pos_i, nrm_i, pdf_i = _sample_sphere(
                scene, idx, ref_pos, time, u1, u2, tmin
            )
        sel = light_idx == li
        return (
            vwhere(sel, pos_i, pos_a),
            vwhere(sel, nrm_i, nrm_a),
            jnp.where(sel, pdf_i, pdf_a),
        )

    return jax.lax.fori_loop(0, scene.n_lights, body, init)


def _sample_mesh_light(scene: SceneData, mi: int, ref_pos: V3, time, u1, u2, u3):
    """Mesh ShapeLight sampling (Mesh::sampleSurface, RMesh.h:131-186):
    triangle ~ area via the per-mesh CDF, uniform barycentric point,
    pdf = dist^2 * (1/totalArea) / |cos| with LOCAL-space area (scaling
    quirk preserved, RMesh.h:199-200). ShapeLight discards backfacing
    samples (RLight.h:305-309)."""
    from ..accel.clusters import TRI_PER_CLUSTER

    tri0, _ = scene.mesh_tri_ranges[mi]
    cl0, n_cl = scene.mesh_cl_ranges[mi]
    n_tri_padded = n_cl * TRI_PER_CLUSTER
    cdf = scene.tri_area_cdf[tri0 : tri0 + n_tri_padded]
    total = scene.mesh_total_area[mi]
    # triangle selection: first cum > u3*total (upper_bound semantics,
    # RMesh.h:146-157); zero-area padding can never be selected
    tri_rel = jnp.searchsorted(cdf, u3 * total, side="right").astype(jnp.int32)
    tri_rel = jnp.minimum(tri_rel, n_tri_padded - 1)
    # fetch the triangle from the packed row table
    cl_sel = tri_rel // TRI_PER_CLUSTER
    j_sel = tri_rel - cl_sel * TRI_PER_CLUSTER
    wrow = scene.tri_rows[cl0 + cl_sel]
    cols9 = j_sel[:, None] + jnp.arange(9, dtype=jnp.int32)[None, :] * TRI_PER_CLUSTER
    c = jnp.take_along_axis(wrow, cols9, axis=1)
    p0 = V3(c[:, 0], c[:, 1], c[:, 2])
    p1 = V3(c[:, 3], c[:, 4], c[:, 5])
    p2 = V3(c[:, 6], c[:, 7], c[:, 8])
    from ..ops.warps import uniform_to_barycentric_triangle

    alpha, beta = uniform_to_barycentric_triangle(u1, u2)
    gamma = 1.0 - alpha - beta
    pos_local = p0 * alpha + p1 * beta + p2 * gamma
    nrm_local = cross(p1 - p0, p2 - p0)

    links = _lane_links(scene, scene.mesh_xf[mi], time)
    pos = xfm.from_local_point_chain(links, pos_local)
    nrm = normalize(xfm.from_local_normal_chain(links, nrm_local))
    to_surf = ref_pos - pos
    sapdf = 1.0 / jnp.maximum(total, 1e-37)
    pdf = (
        dot(to_surf, to_surf)
        * sapdf
        / jnp.maximum(jnp.abs(dot(normalize(to_surf), nrm)), 1e-37)
    )
    # ShapeLight wrapper: reject samples facing away from the reference point
    facing = dot(nrm, to_surf) >= 0.0
    pdf = jnp.where(facing, pdf, 0.0)
    return pos, nrm, pdf


def _rect_intersect_pdf(scene: SceneData, idx, ray_o: V3, ray_d: V3, t,
                        hit_normal: V3, time):
    links = _lane_links(scene, scene.rect_xf[idx], time)
    s1 = xfm.from_local_vector_chain(
        links, _const3(scene.rect_side1[idx]).broadcast_to(ray_o.shape)
    )
    s2 = xfm.from_local_vector_chain(
        links, _const3(scene.rect_side2[idx]).broadcast_to(ray_o.shape)
    )
    c = cross(s1, s2)
    area = jnp.sqrt(jnp.maximum(dot(c, c), 1e-37))
    pdf = t * t / jnp.maximum(jnp.abs(dot(hit_normal, -ray_d)) * area, 1e-37)
    return jnp.where(pdf > PDF_CLAMP, 0.0, pdf)


def _sphere_intersect_pdf(scene: SceneData, idx, ray_o: V3, ray_d: V3, t,
                          hit_normal: V3, time):
    links = _lane_links(scene, scene.sph_xf[idx], time)
    center = _const3(scene.sph_center[idx])
    radius = scene.sph_radius[idx]
    local_ref = xfm.to_local_point_chain(links, ray_o)
    to_center = center - local_ref
    dist2 = dot(to_center, to_center)
    inside = dist2 < radius * radius * 1.00001
    surf_pos = ray_o + ray_d * t
    to_surf = ray_o - surf_pos
    sapdf = 3.0 / (4.0 * PI * radius * radius)
    pdf_in = (
        dot(to_surf, to_surf)
        * sapdf
        / jnp.maximum(jnp.abs(dot(normalize(to_surf), hit_normal)), 1e-37)
    )
    sin2 = radius * radius / jnp.maximum(dist2, 1e-37)
    cos_theta_max = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2))
    pdf_out = uniform_cone_pdf(cos_theta_max)
    return jnp.where(inside, pdf_in, pdf_out)


def _mesh_intersect_pdf(scene: SceneData, idx, ray_o: V3, ray_d: V3, t,
                        hit_normal: V3):
    # Mesh::pdfSA (RMesh.h:188-197): dist^2 / (totalArea * |cos|)
    surf_pos = ray_o + ray_d * t
    to_surf = ray_o - surf_pos
    total = scene.mesh_total_area[idx]
    return (
        dot(to_surf, to_surf)
        / jnp.maximum(total, 1e-37)
        / jnp.maximum(jnp.abs(dot(normalize(to_surf), hit_normal)), 1e-37)
    )


def light_intersect_pdf(scene: SceneData, li: int, ray_o: V3, ray_d: V3, t,
                        hit_normal: V3, time):
    """intersectPdf for light ``li`` — the MIS pdf of hitting the light by BRDF
    sampling. Caller must already have verified the hit IS this light."""
    kind = scene.light_kinds_host[li]
    idx = scene.light_indices_host[li]
    if kind == LIGHT_RECT:
        return _rect_intersect_pdf(scene, idx, ray_o, ray_d, t, hit_normal, time)
    elif kind == LIGHT_SPHERE:
        return _sphere_intersect_pdf(scene, idx, ray_o, ray_d, t, hit_normal, time)
    elif kind == LIGHT_MESH:
        return _mesh_intersect_pdf(scene, idx, ray_o, ray_d, t, hit_normal)
    else:
        raise NotImplementedError(f"unknown light kind {kind}")


def light_intersect_pdf_rolled(scene: SceneData, light_idx, ray_o: V3,
                               ray_d: V3, t, hit_normal: V3, time):
    """Rolled intersectPdf over the light table (one fori body; lanes keep
    the row matching their chosen light) — O(1) compile in the light count.
    All three kinds supported (the mesh pdf needs no host-static slices)."""
    n = ray_o.shape[0]
    init = jnp.zeros((n,), jnp.float32)

    kinds = set(scene.light_kinds_host)  # host-static: absent kinds'
    # tables may be empty, so their branches must not be traced at all

    def body(li, pdf_a):
        kind = scene.light_kind[li]
        idx = scene.light_index[li]
        p_i = None
        if LIGHT_MESH in kinds:
            p_i = _mesh_intersect_pdf(scene, idx, ray_o, ray_d, t, hit_normal)
        if LIGHT_SPHERE in kinds:
            p_s = _sphere_intersect_pdf(
                scene, idx, ray_o, ray_d, t, hit_normal, time
            )
            p_i = p_s if p_i is None else jnp.where(
                kind == LIGHT_SPHERE, p_s, p_i
            )
        if LIGHT_RECT in kinds:
            p_r = _rect_intersect_pdf(
                scene, idx, ray_o, ray_d, t, hit_normal, time
            )
            p_i = p_r if p_i is None else jnp.where(
                kind == LIGHT_RECT, p_r, p_i
            )
        return jnp.where(light_idx == li, p_i, pdf_a)

    return jax.lax.fori_loop(0, scene.n_lights, body, init)


def light_emitted(scene: SceneData, li: int) -> V3:
    """emitted() = color * power (RLight.h:31). Constant V3."""
    c = scene.light_color[li]
    p = scene.light_power[li]
    return V3(c[0] * p, c[1] * p, c[2] * p)


def _rect_hit_analytic(scene: SceneData, idx, o: V3, d: V3, time, tmin):
    from ..ops.intersect import rect_intersect

    n = o.shape[0]
    tmax = jnp.full((n,), 1.0e30, jnp.float32)
    links = _lane_links(scene, scene.rect_xf[idx], time)
    o_l = xfm.to_local_point_chain(links, o)
    d_l = xfm.to_local_vector_chain(links, d)
    corner = _const3(scene.rect_corner[idx]).broadcast_to((n,))
    s1 = _const3(scene.rect_side1[idx]).broadcast_to((n,))
    s2 = _const3(scene.rect_side2[idx]).broadcast_to((n,))
    t, hit, nrm_l = rect_intersect(o_l, d_l, tmin, tmax, corner, s1, s2)
    nrm = xfm.from_local_normal_chain(links, nrm_l)
    return t, nrm, hit


def _sphere_hit_analytic(scene: SceneData, idx, o: V3, d: V3, time, tmin):
    from ..ops.intersect import sphere_intersect
    from ..ops.vec3 import normalize as vnormalize

    n = o.shape[0]
    tmax = jnp.full((n,), 1.0e30, jnp.float32)
    links = _lane_links(scene, scene.sph_xf[idx], time)
    o_l = xfm.to_local_point_chain(links, o)
    d_l = xfm.to_local_vector_chain(links, d)
    center = _const3(scene.sph_center[idx]).broadcast_to((n,))
    t, hit = sphere_intersect(o_l, d_l, tmin, tmax, center, scene.sph_radius[idx])
    t_safe = jnp.where(hit, t, 0.0)
    nrm_l = vnormalize(o_l + d_l * t_safe - center)
    nrm = xfm.from_local_normal_chain(links, nrm_l)
    return t, nrm, hit


def light_hit_analytic(scene: SceneData, li: int, o: V3, d: V3, time, tmin):
    """Direct ray-vs-light intersection for rect/sphere lights (local-space,
    motion-aware). Lets the NEE BRDF-side replace a full scene intersect with
    (analytic light hit + any-hit occlusion) — semantically the reference's
    'full intersect, hit shape == light' check (RaytraceMain.cpp:419-424)
    since the light is the nearest hit iff it is hit and nothing is closer.

    Returns (t [N], normal V3, hit [N]) or None for mesh lights (caller must
    fall back to the full intersect)."""
    kind = scene.light_kinds_host[li]
    idx = scene.light_indices_host[li]
    if kind == LIGHT_RECT:
        return _rect_hit_analytic(scene, idx, o, d, time, tmin)
    elif kind == LIGHT_SPHERE:
        return _sphere_hit_analytic(scene, idx, o, d, time, tmin)
    return None


def light_hit_analytic_rolled(scene: SceneData, light_idx, o: V3, d: V3,
                              time, tmin):
    """Rolled analytic hit of each lane's CHOSEN light (one fori body over
    the light table). Requires all lights rect/sphere."""
    n = o.shape[0]
    zero = jnp.zeros((n,), jnp.float32)
    init = (zero, V3(zero, zero, zero), jnp.zeros((n,), bool))

    kinds = set(scene.light_kinds_host)  # host-static presence guards

    def body(li, carry):
        t_a, n_a, h_a = carry
        kind = scene.light_kind[li]
        idx = scene.light_index[li]
        if LIGHT_RECT in kinds and LIGHT_SPHERE in kinds:
            t_r, n_r, h_r = _rect_hit_analytic(scene, idx, o, d, time, tmin)
            t_s, n_s, h_s = _sphere_hit_analytic(scene, idx, o, d, time, tmin)
            is_rect = kind == LIGHT_RECT
            t_i = jnp.where(is_rect, t_r, t_s)
            n_i = vwhere(is_rect, n_r, n_s)
            h_i = jnp.where(is_rect, h_r, h_s)
        elif LIGHT_RECT in kinds:
            t_i, n_i, h_i = _rect_hit_analytic(scene, idx, o, d, time, tmin)
        else:
            t_i, n_i, h_i = _sphere_hit_analytic(scene, idx, o, d, time, tmin)
        sel = light_idx == li
        return (
            jnp.where(sel, t_i, t_a),
            vwhere(sel, n_i, n_a),
            jnp.where(sel, h_i, h_a),
        )

    return jax.lax.fori_loop(0, scene.n_lights, body, init)
