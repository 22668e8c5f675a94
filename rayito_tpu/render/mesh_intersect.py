"""Dense two-level cluster traversal — the TPU mesh-intersection hot path.

Replaces per-lane BVH pointer chasing with rank-uniform phases
(see accel/clusters.py for why):

  1. dense ray x supercluster slab tests ([N, S] VPU op);
  2. top-K1 nearest superclusters per ray; ONE row gather fetches each
     selected supercluster's 16 children boxes (a packed 128-float row —
     measured ~140x faster than per-element gathers on TPU); dense slab of
     the [N, K1*16] cluster candidates; top-K2 nearest;
  3. (ray, cluster) PAIR COMPACTION: valid pairs are sorted to the front and
     processed in fixed-size chunks — each pair fetches its cluster's packed
     512-float triangle row (48 triangles, SoA within the row) and runs one
     48-wide Moller-Trumbore block, so gather volume tracks ACTUAL work.
     Pair results are inverse-permuted back to dense [N, K2] form and
     min-reduced per ray.

**No scatters anywhere** (XLA lowers potentially-colliding scatters to serial
loops on TPU) and **no small-minor-dim arrays** (physically padded to 128
lanes — see ops/vec3.py).

Bounded-truncation contract: a ray considers at most K1 superclusters and K2
clusters (nearest-first). Rays with more candidates than that are counted in
the returned ``overflow`` diagnostic; the K defaults cover the reference
scenes with overflow 0 (tests assert it). This plays the role of the
reference's 50-entry traversal stack (RAccel.h:377-560) at lock-step cost of
O(1) dense phases per wave.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..accel.clusters import CLUSTERS_PER_SUPER, TRI_PER_CLUSTER
from ..ops.intersect import INF
from ..ops.vec3 import V3, from_aos

K1_SUPERS = 16  # superclusters considered per ray (nearest-first)
K2_CLUSTERS = 24  # clusters considered per ray (nearest-first)
PAIR_CHUNKS = 4  # pair chunk size = n_rays // PAIR_CHUNKS


def _slab6(ox, oy, oz, ix, iy, iz, tmin, tmax, bx0, by0, bz0, bx1, by1, bz1):
    """Component-wise slab test; returns entry t or INF. All args broadcast."""
    tx0 = (bx0 - ox) * ix
    tx1 = (bx1 - ox) * ix
    ty0 = (by0 - oy) * iy
    ty1 = (by1 - oy) * iy
    tz0 = (bz0 - oz) * iz
    tz1 = (bz1 - oz) * iz
    near = jnp.maximum(
        jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
        jnp.minimum(tz0, tz1),
    )
    far = jnp.minimum(
        jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
        jnp.maximum(tz0, tz1),
    )
    t0 = jnp.maximum(near, tmin)
    t1 = jnp.minimum(far, tmax)
    return jnp.where(t0 <= t1, t0, INF)


TINY_TRI_MAX = 48  # per-triangle scalar fold below this count (see below)


def _tiny_mesh_fold(scene, mi: int, o: V3, d: V3, tmin, tmax):
    """Per-triangle scalar fold for TINY meshes (the stage-7 tumbling cubes:
    12 triangles each). A dense [N, T] Möller-Trumbore pads its minor dim to
    128 lanes, costing ~128 lane-ops per ray per op regardless of T; a host
    loop of T per-triangle [N]-wide tests costs ~45*T — an order of magnitude
    less for T <= ~100. Each triangle's vertices come from one STATIC row of
    tri_vert_rows (XLA constant-folds the row access), so the whole fold is
    a fused elementwise stream with zero gathers, sorts, or top_k.

    Same contract as mesh_intersect_clusters; overflow is structurally 0."""
    from ..ops.intersect import triangle_intersect

    tri0, tcount = scene.mesh_tri_ranges[mi]
    n = o.shape[0]
    t_best = jnp.full((n,), INF)
    prim = jnp.full((n,), -1, jnp.int32)
    beta = jnp.zeros((n,), jnp.float32)
    gamma = jnp.zeros((n,), jnp.float32)
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (n,))
    for j in range(tcount):
        row = scene.tri_vert_rows[tri0 + j]  # [16] static row -> constants
        t_j, hit, b_j, g_j, _ = triangle_intersect(
            o, d, tmin, jnp.minimum(t_best, tmax),
            V3(row[0], row[1], row[2]),
            V3(row[3], row[4], row[5]),
            V3(row[6], row[7], row[8]),
        )
        closer = hit & (t_j < t_best)
        t_best = jnp.where(closer, t_j, t_best)
        prim = jnp.where(closer, jnp.int32(tri0 + j), prim)
        beta = jnp.where(closer, b_j, beta)
        gamma = jnp.where(closer, g_j, gamma)
    return t_best, prim, beta, gamma, jnp.int32(0)


def _brute_force_mesh(scene, cl0, n_cl, tri0, o: V3, d: V3, tmin, tmax):
    """Dense MT over every triangle row of a small mesh."""
    from ..ops.intersect import triangle_intersect

    T = TRI_PER_CLUSTER
    n = o.shape[0]
    rows = scene.tri_rows[cl0 : cl0 + n_cl]  # [C, 512] static slice
    nt = n_cl * T

    def comp(base):
        return rows[:, base * T : (base + 1) * T].reshape(1, nt)

    v0 = V3(comp(0), comp(1), comp(2))
    v1 = V3(comp(3), comp(4), comp(5))
    v2 = V3(comp(6), comp(7), comp(8))
    t, hit, beta, gamma, _ = triangle_intersect(
        o[:, None], d[:, None], tmin, tmax[:, None], v0, v1, v2
    )
    j = jnp.argmin(t, axis=1).astype(jnp.int32)
    sel = lambda a: jnp.take_along_axis(a, j[:, None], axis=1)[:, 0]
    t_best = sel(t)
    ok = jnp.isfinite(t_best)
    prim = jnp.where(ok, tri0 + j, -1)
    return t_best, prim, sel(beta), sel(gamma), jnp.int32(0)


def mesh_intersect_clusters(scene, mi: int, o: V3, d: V3, tmin, tmax,
                            any_hit=False):
    """Nearest hit of mesh ``mi`` for local-space rays o, d (V3 of [N]).

    Returns (t [N], prim [N] global tri id or -1, beta [N], gamma [N],
    overflow [] int32 — count of candidate truncations beyond K1/K2).
    """
    sc0, n_sc = scene.mesh_sc_ranges[mi]
    cl0, n_cl = scene.mesh_cl_ranges[mi]
    tri0 = scene.mesh_tri_ranges[mi][0]
    n = o.shape[0]
    inv_d = 1.0 / d
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (n,))

    # Small meshes: clustering machinery costs more than it saves — the
    # reference's own top-level heuristic in spirit (brute force when tiny,
    # RScene.h:135). TINY meshes use a per-triangle scalar fold (no 128-lane
    # padding at all); small-but-not-tiny ones a dense [N, T] block.
    if scene.tiny_fold and scene.mesh_tri_ranges[mi][1] <= TINY_TRI_MAX:
        return _tiny_mesh_fold(scene, mi, o, d, tmin, tmax)
    if n_cl <= 4:
        return _brute_force_mesh(scene, cl0, n_cl, tri0, o, d, tmin, tmax)

    k1 = min(n_sc, K1_SUPERS)
    k2 = min(k1 * CLUSTERS_PER_SUPER, K2_CLUSTERS)

    # ---- phase 1: dense supercluster slab (small broadcast table)
    scm = from_aos(scene.sc_min[sc0 : sc0 + n_sc])
    scx = from_aos(scene.sc_max[sc0 : sc0 + n_sc])
    t_sc = _slab6(
        o.x[:, None], o.y[:, None], o.z[:, None],
        inv_d.x[:, None], inv_d.y[:, None], inv_d.z[:, None],
        tmin, tmax[:, None],
        scm.x[None, :], scm.y[None, :], scm.z[None, :],
        scx.x[None, :], scx.y[None, :], scx.z[None, :],
    )  # [N, S]
    # ---- RAY COMPACTION: everything below phase 1 runs only on the rays
    # that hit ANY supercluster (an [N]-sized sort brings them to the front;
    # typically a small fraction of the wavefront). Fixed blocks of R
    # compacted rays then run phase 2 (children expansion) and phase 3
    # (dense triangle blocks) together.
    lane_ids = jnp.arange(n, dtype=jnp.int32)
    has_cand = jnp.any(jnp.isfinite(t_sc), axis=1)
    big = jnp.int32(2**31 - 1)
    key = jnp.where(has_cand, lane_ids, big)
    _, ray_of_slot = jax.lax.sort((key, lane_ids), num_keys=1)  # [N]
    n_active = jnp.sum(has_cand.astype(jnp.int32))

    R = max(256, min(4096, n // PAIR_CHUNKS))
    max_blocks = -(-n // R)
    pad_slots = max_blocks * R - n
    if pad_slots:
        ray_of_slot = jnp.concatenate(
            [ray_of_slot, jnp.zeros(pad_slots, jnp.int32)]
        )
    T = TRI_PER_CLUSTER

    def blk_cond(s):
        return (s[3] * R < n_active) & (s[3] < max_blocks)

    def blk_body(s):
        t_slots, prim_slots, overflow, ci = s
        startp = ci * R
        rs = jax.lax.dynamic_slice_in_dim(ray_of_slot, startp, R)  # [R]
        ob = o[rs]
        db = d[rs]
        ib = V3(1.0 / db.x, 1.0 / db.y, 1.0 / db.z)
        tmax_b = tmax[rs]

        # ---- phase 2 (per block): children boxes via packed row gathers
        t_sc_b = t_sc[rs]  # [R, S] row gather
        neg_t1, sc_idx = jax.lax.top_k(-t_sc_b, k1)  # [R, k1]
        sc_valid = neg_t1 > -INF
        overflow = overflow + jnp.sum(
            jnp.maximum(
                jnp.sum(jnp.isfinite(t_sc_b).astype(jnp.int32), axis=1) - k1, 0
            )
        )
        rows = scene.sc_rows[sc0 + sc_idx]  # [R, k1, 128]
        t_cl = _slab6(
            ob.x[:, None, None], ob.y[:, None, None], ob.z[:, None, None],
            ib.x[:, None, None], ib.y[:, None, None], ib.z[:, None, None],
            tmin, tmax_b[:, None, None],
            rows[:, :, 0:16], rows[:, :, 16:32], rows[:, :, 32:48],
            rows[:, :, 48:64], rows[:, :, 64:80], rows[:, :, 80:96],
        )
        t_cl = jnp.where(sc_valid[:, :, None], t_cl, INF).reshape(
            R, k1 * CLUSTERS_PER_SUPER
        )
        overflow = overflow + jnp.sum(
            jnp.maximum(
                jnp.sum((t_cl < INF).astype(jnp.int32), axis=1) - k2, 0
            )
        )
        neg_t2, cand = jax.lax.top_k(-t_cl, k2)  # [R, k2] slots into k1*16
        pv = neg_t2 > -INF
        sc_sel = jnp.take_along_axis(sc_idx, cand >> 4, axis=1)  # [R, k2]
        cl_sel = sc_sel * CLUSTERS_PER_SUPER + (cand & 15)

        # ---- phase 3 (per block): dense triangle blocks
        trows = scene.tri_rows[cl0 + cl_sel]  # [R, k2, 512]

        def comp(base):
            return trows[:, :, base * T : (base + 1) * T]  # [R, k2, 48]

        v0x, v0y, v0z = comp(0), comp(1), comp(2)
        v1x, v1y, v1z = comp(3), comp(4), comp(5)
        v2x, v2y, v2z = comp(6), comp(7), comp(8)
        dx = db.x[:, None, None]
        dy = db.y[:, None, None]
        dz = db.z[:, None, None]
        ox = ob.x[:, None, None]
        oy = ob.y[:, None, None]
        oz = ob.z[:, None, None]
        # Möller-Trumbore, reference formulation (RMesh.h:260-335)
        e1x, e1y, e1z = v1x - v0x, v1y - v0y, v1z - v0z
        e2x, e2y, e2z = v2x - v0x, v2y - v0y, v2z - v0z
        gnx = e1y * e2z - e1z * e2y
        gny = e1z * e2x - e1x * e2z
        gnz = e1x * e2y - e1y * e2x
        det = -(dx * gnx + dy * gny + dz * gnz)
        inv_det = 1.0 / jnp.where(det == 0.0, 1.0, det)
        t0x, t0y, t0z = v0x - ox, v0y - oy, v0z - oz
        rcx = dy * t0z - dz * t0y
        rcy = dz * t0x - dx * t0z
        rcz = dx * t0y - dy * t0x
        t1x, t1y, t1z = v1x - ox, v1y - oy, v1z - oz
        gamma = -(t1x * rcx + t1y * rcy + t1z * rcz) * inv_det
        t2x, t2y, t2z = v2x - ox, v2y - oy, v2z - oz
        beta = (t2x * rcx + t2y * rcy + t2z * rcz) * inv_det
        t = -(t0x * gnx + t0y * gny + t0z * gnz) * inv_det
        hit = (
            (det != 0.0)
            & (gamma >= 0.0)
            & (gamma <= 1.0)
            & (beta >= 0.0)
            & (beta + gamma <= 1.0)
            & (t >= tmin)
            & (t < tmax_b[:, None, None])
            & pv[:, :, None]
        )
        t_tri = jnp.where(hit, t, INF).reshape(R, k2 * T)
        t_ray = jnp.min(t_tri, axis=1)
        arg = jnp.argmin(t_tri, axis=1).astype(jnp.int32)
        cl_win = jnp.take_along_axis(cl_sel, (arg // T)[:, None], axis=1)[:, 0]
        prim_ray = tri0 + cl_win * T + (arg % T)
        t_slots = jax.lax.dynamic_update_slice_in_dim(t_slots, t_ray, startp, 0)
        prim_slots = jax.lax.dynamic_update_slice_in_dim(
            prim_slots, prim_ray, startp, 0
        )
        return t_slots, prim_slots, overflow, ci + 1

    from ..utils.vma import carry_init

    t_slots, prim_slots, overflow, _ = jax.lax.while_loop(
        blk_cond,
        blk_body,
        (
            # slot buffers / overflow counter become varying inside the body
            # (mixed with per-shard ray state); carry_init marks the fresh
            # inits varying too when tracing under shard_map (utils/vma.py)
            carry_init(jnp.full((max_blocks * R,), INF, jnp.float32)),
            carry_init(jnp.full((max_blocks * R,), -1, jnp.int32)),
            carry_init(jnp.int32(0)),
            jnp.int32(0),
        ),
    )
    # unsort slot results back to ray order ([N]-sized multi-operand sort)
    _, t_best, prim_best = jax.lax.sort(
        (ray_of_slot[:n], t_slots[:n], prim_slots[:n]), num_keys=1
    )

    hit_mask = jnp.isfinite(t_best) & (t_best < tmax) & (prim_best >= 0)
    if any_hit:
        # occlusion queries only need the boolean: skip winner resolution
        zero = jnp.zeros((n,), jnp.float32)
        return (
            jnp.where(hit_mask, t_best, INF),
            jnp.where(hit_mask, prim_best, -1),
            zero,
            zero,
            overflow,
        )
    # barycentrics of the winning triangle: one packed vertex-row gather
    # ([N, 16] — scene.tri_vert_rows) + re-test
    pr_safe = jnp.maximum(prim_best, 0)
    # transpose-then-consume: column slices of a T(8,128) gather output are
    # a per-column relayout on TPU (see trace._winner_retest); a physical
    # Pallas transpose makes the components dense row views
    from .pallas_traverse import transpose_rows

    vrow = transpose_rows(scene.tri_vert_rows[pr_safe])
    wv0 = V3(vrow[0], vrow[1], vrow[2])
    wv1 = V3(vrow[3], vrow[4], vrow[5])
    wv2 = V3(vrow[6], vrow[7], vrow[8])
    from ..ops.intersect import triangle_intersect

    t_fin, h_fin, beta, gamma, _ = triangle_intersect(
        o, d, tmin, jnp.full((n,), INF), wv0, wv1, wv2
    )
    ok = hit_mask & h_fin
    return (
        jnp.where(ok, t_fin, INF),
        jnp.where(ok, prim_best, -1),
        beta,
        gamma,
        overflow,
    )
