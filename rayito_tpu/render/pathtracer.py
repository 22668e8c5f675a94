"""Wavefront path tracer with next-event estimation and two-way MIS (SoA).

This is the TPU rewrite of ``pathTrace`` + ``RenderThread``
(Rayito_Stage7_QT/RaytraceMain.cpp:47-482): the per-pixel recursive loop
becomes a bounce-rolled (lax.fori_loop) wavefront program over component-SoA
ray state; masked lanes replace control flow; the NEE inner loop is a rolled
``lax.fori_loop``. Colors and vectors are V3 component tuples — no [..., 3]
arrays (see ops/vec3.py).

Faithfully reproduced semantics (SURVEY §2.8):
  * emission added only at bounce 0 or through an unbroken chain of Dirac
    bounces (RaytraceMain.cpp:300-306),
  * per-sample uniform light selection, power-heuristic MIS between the
    light sample and a BRDF sample, each with its own shadow query
    (:357-439),
  * light loop scale = n_lights / num_light_samples (:335,443),
  * continuation ray = -incoming with throughput update
    f*|cos|/(pdf*brdfWeight) (:450-475),
  * no Russian roulette; fixed max depth.

Sampler taxonomy matches the reference's CMJ pattern sizes
(RaytraceMain.cpp:84-108), keyed by pure (pixel, purpose, bounce) hashes
instead of a sequential MWC chain.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models.camera import PerspectiveCamera
from ..models.scene import SceneData
from ..ops import rng as rngo
from ..ops.brdf import (
    KIND_EMITTER,
    KIND_GLOSSY,
    KIND_REFLECTION,
    evaluate_sa,
    sample_sa,
)
from ..ops.mis import power_heuristic
from ..ops.vec3 import V3, dot, from_aos, where as vwhere
from ..ops.vec3 import RAY_TMAX
from ..utils.config import RenderConfig
from ..utils.vma import carry_init
from . import lights as L
from .integrator import _pixel_grid, _subpixel_jitter, screen_uv
from .trace import (
    material_emittance,
    scene_intersect,
    scene_occluded,
    scene_occluded_pair,
)


def _mat_lookup(scene: SceneData, mat_ids):
    from .trace import material_row

    kind, color, param = material_row(scene, mat_ids)
    # Glossy exponent = 1/roughness² (RMaterial.h:211); guarded for non-glossy
    exponent = jnp.where(
        kind == KIND_GLOSSY, 1.0 / jnp.maximum(param * param, 1e-12), 1.0
    )
    return kind, color, exponent


# beyond this many lights the NEE machinery rolls into fori_loop bodies
# (lights.py *_rolled) instead of unrolling per light — compile time O(1)
# in the light count (VERDICT r2 item 7). Mesh lights need host-static CDF
# slices, so rolling requires an all-rect/sphere light set.
ROLL_LIGHTS = 8


def _select_by_light(stacked, light_idx):
    """stacked [L, N] -> per-lane selection by light_idx [N] via a
    where-chain (L is small; fuses into the elementwise stream)."""
    out = stacked[0]
    for li in range(1, stacked.shape[0]):
        out = jnp.where(light_idx == li, stacked[li], out)
    return jnp.broadcast_to(out, stacked.shape[1:])


def _select_v3_by_light(stacked: V3, light_idx) -> V3:
    return V3(
        _select_by_light(stacked.x, light_idx),
        _select_by_light(stacked.y, light_idx),
        _select_by_light(stacked.z, light_idx),
    )


def pathtrace_wave(scene: SceneData, config: RenderConfig, o: V3, d: V3, time,
                   px, py, si, active=None):
    """Trace one wavefront of camera rays to completion.

    o, d: V3 of [N]; time [N]; px, py [N] pixel coords; si [N] pixel-sample
    index. Returns (radiance V3 of [N], overflow [] int32, queries [] int32)
    where ``queries`` counts the scene queries the integrator semantically
    issued (alive-lane traces + NEE shadow/BRDF-side queries on lanes whose
    masks require one) — the honest ray-throughput denominator, invariant
    under lane compaction / dead-lane optimizations.

    ``active`` (optional bool [N]) marks lanes that exist only as launch
    padding as dead from bounce 0: they trace with tmax 0 (near-free), return
    black, and are excluded from the query counter so padding cannot inflate
    the throughput metric.
    """
    n = o.shape[0]
    f32 = jnp.float32
    zeros = jnp.zeros((n,), f32)
    result = V3(zeros, zeros, zeros)
    throughput = V3(jnp.ones((n,), f32), jnp.ones((n,), f32), jnp.ones((n,), f32))
    alive = jnp.ones((n,), bool) if active is None else active
    num_dirac = jnp.zeros((n,), jnp.int32)
    overflow0 = jnp.int32(0)
    queries0 = jnp.int32(0)

    n_lights = scene.n_lights
    nls = config.light_samples * config.light_samples if n_lights else 0
    ps = config.pixel_samples
    ls = config.light_samples
    seed = np.uint32(config.seed)
    tmin = config.ray_tmin

    pxu = px.astype(jnp.uint32)
    pyu = py.astype(jnp.uint32)
    siu = si.astype(jnp.uint32)
    analytic_lights = all(k in (0, 1) for k in scene.light_kinds_host)
    roll_lights = n_lights > ROLL_LIGHTS and analytic_lights
    emitted_const = (
        [] if roll_lights
        else [L.light_emitted(scene, li) for li in range(n_lights)]
    )

    def bounce_body(bounce, carry):
        o, d, result, throughput, alive, num_dirac, overflow, queries = carry
        # dead lanes trace with tmax 0: they produce no candidates in the
        # traversal (and the coherence sort groups them into empty blocks)
        hit = scene_intersect(
            scene, o, d, time, tmin, jnp.where(alive, RAY_TMAX, 0.0)
        )
        overflow = overflow + hit.overflow
        queries = queries + jnp.sum(alive.astype(jnp.int32))
        lane = alive & hit.valid

        kind, mat_color, exponent = _mat_lookup(scene, hit.mat)

        # ---- emission gate: camera-visible or pure-Dirac chain
        gate = lane & ((bounce == 0) | (num_dirac == bounce))
        emit = material_emittance(scene, hit.mat)
        contrib = throughput * emit
        result = result + vwhere(gate, contrib, V3(zeros, zeros, zeros))

        # emitters terminate the path (no BRDF — RaytraceMain.cpp:319-323)
        lane = lane & (kind != KIND_EMITTER)

        is_dirac = (kind == KIND_REFLECTION) & lane
        num_dirac = num_dirac + is_dirac.astype(jnp.int32)

        position = o + d * hit.t
        outgoing = -d
        normal = hit.normal
        cmod_color = mat_color * hit.color_mod
        bounce_u = bounce.astype(jnp.uint32)

        # ---- next-event estimation with MIS (non-Dirac lanes only)
        if n_lights > 0 and nls > 0:
            nee_lane = lane & ~is_dirac

            perm_sel = rngo.hash_combine(
                pxu, pyu, rngo.PURPOSE_LIGHT_SELECT, bounce_u, seed
            )
            perm_elem = rngo.hash_combine(
                pxu, pyu, rngo.PURPOSE_LIGHT_ELEMENT, bounce_u, seed
            )
            perm_light = rngo.hash_combine(
                pxu, pyu, rngo.PURPOSE_LIGHT, bounce_u, seed
            )
            perm_brdf = rngo.hash_combine(
                pxu, pyu, rngo.PURPOSE_BRDF, bounce_u, seed
            )

            def nee_body(lsi, nee_carry):
                acc, nee_ovf, nee_q = nee_carry
                fsi = siu * np.uint32(nls) + lsi.astype(jnp.uint32)
                # light selection (1D pattern of (ps*ls)² samples)
                liu = rngo.cmj_sample_1d(fsi, (ps * ls) ** 2, perm_sel)
                light_idx = jnp.minimum(
                    (liu * n_lights).astype(jnp.int32), n_lights - 1
                )
                lsu, lsv = rngo.cmj_sample_2d(fsi, ps * ls, ps * ls, perm_light)
                leu = rngo.cmj_sample_1d(fsi, (ps * ls) ** 2, perm_elem)

                if roll_lights:
                    # rolled: one fori body over the light table; per-lane
                    # gathers for the tiny emitted/shape-id rows
                    lp, _, lpdf = L.sample_chosen_light_rolled(
                        scene, light_idx, position, time, lsu, lsv, tmin
                    )
                    pw = scene.light_power[light_idx]
                    emitted = V3(
                        scene.light_color[light_idx, 0] * pw,
                        scene.light_color[light_idx, 1] * pw,
                        scene.light_color[light_idx, 2] * pw,
                    )
                    chosen_sid = scene.light_shape_id[light_idx]
                else:
                    # sample every light, select the chosen one per lane
                    cand = [
                        L.sample_light(
                            scene, li, position, normal, time, lsu, lsv, leu,
                            tmin,
                        )
                        for li in range(n_lights)
                    ]
                    lp = _select_v3_by_light(
                        V3(
                            jnp.stack([c[0].x for c in cand]),
                            jnp.stack([c[0].y for c in cand]),
                            jnp.stack([c[0].z for c in cand]),
                        ),
                        light_idx,
                    )
                    lpdf = _select_by_light(
                        jnp.stack([c[2] for c in cand]), light_idx
                    )
                    emitted = _select_v3_by_light(
                        V3(
                            jnp.stack(
                                [jnp.broadcast_to(e.x, (n,))
                                 for e in emitted_const]
                            ),
                            jnp.stack(
                                [jnp.broadcast_to(e.y, (n,))
                                 for e in emitted_const]
                            ),
                            jnp.stack(
                                [jnp.broadcast_to(e.z, (n,))
                                 for e in emitted_const]
                            ),
                        ),
                        light_idx,
                    )
                    from .trace import select_small

                    chosen_sid = select_small(
                        scene.light_shape_id, light_idx, n_lights
                    )

                # --- light-sampled direction
                light_incoming = position - lp
                dist = jnp.sqrt(
                    jnp.maximum(dot(light_incoming, light_incoming), 1e-37)
                )
                light_incoming = light_incoming / dist
                f_l, brdf_pdf_l = evaluate_sa(
                    kind, exponent, light_incoming, outgoing, normal
                )
                ok_l = nee_lane & (lpdf > 0.0) & (f_l > 0.0) & (brdf_pdf_l > 0.0)
                nee_q = nee_q + jnp.sum(ok_l.astype(jnp.int32))
                tmax_l = jnp.where(ok_l, dist - tmin, 0.0)

                # --- BRDF-sampled direction toward the same light.
                # "Full intersect, hit shape == the chosen light"
                # (RaytraceMain.cpp:419-424) is equivalent to: the light is
                # hit analytically AND nothing else is closer — so when no
                # mesh lights are present, one cheap analytic hit + one
                # any-hit occlusion replaces the full nearest-hit query.
                # Sampled BEFORE the light-side occlusion so the two shadow
                # queries (identical origins, different directions) can
                # share one origin-cell sort (scene_occluded_pair).
                bsu, bsv = rngo.cmj_sample_2d(fsi, ps * ls, ps * ls, perm_brdf)
                b_in, f_b, pdf_b = sample_sa(kind, exponent, outgoing, normal, bsu, bsv)
                ok_b = nee_lane & (pdf_b > 0.0) & (f_b > 0.0)
                analytic = analytic_lights  # LIGHT_RECT / LIGHT_SPHERE
                if analytic:
                    if roll_lights:
                        t_l, n_l, l_hit = L.light_hit_analytic_rolled(
                            scene, light_idx, position, -b_in, time, tmin
                        )
                    else:
                        hits = [
                            L.light_hit_analytic(
                                scene, li, position, -b_in, time, tmin
                            )
                            for li in range(n_lights)
                        ]
                        t_l = _select_by_light(
                            jnp.stack([hh[0] for hh in hits]), light_idx
                        )
                        n_l = _select_v3_by_light(
                            V3(
                                jnp.stack([hh[1].x for hh in hits]),
                                jnp.stack([hh[1].y for hh in hits]),
                                jnp.stack([hh[1].z for hh in hits]),
                            ),
                            light_idx,
                        )
                        l_hit = _select_by_light(
                            jnp.stack([hh[2] for hh in hits]), light_idx
                        )
                    ok_b = ok_b & l_hit
                    nee_q = nee_q + jnp.sum(ok_b.astype(jnp.int32))
                    occluded, blocked, ovf_lb = scene_occluded_pair(
                        scene,
                        position,
                        -light_incoming,
                        tmax_l,
                        -b_in,
                        jnp.where(ok_b, jnp.where(l_hit, t_l, 0.0) - tmin, 0.0),
                        time,
                        tmin,
                        live=ok_l | ok_b,
                    )
                    nee_ovf = nee_ovf + ovf_lb
                    hit_light = ok_b & ~blocked
                    sh_t, sh_n = t_l, n_l
                else:
                    occluded, ovf_l = scene_occluded(
                        scene, position, -light_incoming, time, tmin, tmax_l
                    )
                    nee_ovf = nee_ovf + ovf_l
                    nee_q = nee_q + jnp.sum(ok_b.astype(jnp.int32))
                    sh = scene_intersect(
                        scene,
                        position,
                        -b_in,
                        time,
                        tmin,
                        jnp.where(ok_b, RAY_TMAX, tmin),
                    )
                    nee_ovf = nee_ovf + sh.overflow
                    hit_light = ok_b & sh.valid & (sh.shape_id == chosen_sid)
                    sh_t, sh_n = sh.t, sh.normal

                ok_l = ok_l & ~occluded
                w_l = power_heuristic(1.0, lpdf, 1.0, brdf_pdf_l)
                gain_l = jnp.where(
                    ok_l,
                    f_l
                    * jnp.abs(dot(-light_incoming, normal))
                    * w_l
                    / jnp.maximum(lpdf, 1e-37),
                    0.0,
                )
                acc = acc + emitted * cmod_color * gain_l
                if roll_lights:
                    lpdf_b = L.light_intersect_pdf_rolled(
                        scene, light_idx, position, -b_in, sh_t, sh_n, time
                    )
                else:
                    lpdf_b = [
                        L.light_intersect_pdf(
                            scene, li, position, -b_in, sh_t, sh_n, time
                        )
                        for li in range(n_lights)
                    ]
                    lpdf_b = _select_by_light(jnp.stack(lpdf_b), light_idx)
                ok_b = hit_light & (lpdf_b > 0.0)
                w_b = power_heuristic(1.0, pdf_b, 1.0, lpdf_b)
                gain_b = jnp.where(
                    ok_b,
                    f_b * jnp.abs(dot(-b_in, normal)) * w_b
                    / jnp.maximum(pdf_b, 1e-37),
                    0.0,
                )
                return acc + emitted * cmod_color * gain_b, nee_ovf, nee_q

            light_acc, overflow, queries = jax.lax.fori_loop(
                0, nls, nee_body,
                # fresh-constant carries marked varying under shard_map
                # (utils/vma.py; idempotent for the already-varying ones)
                carry_init((V3(zeros, zeros, zeros), overflow, queries)),
            )
            scale = f32(n_lights) / f32(nls)
            result = result + throughput * light_acc * scale

        # ---- sample BRDF for the path continuation
        perm_bounce = rngo.hash_combine(
            pxu, pyu, rngo.PURPOSE_BOUNCE, bounce_u, seed
        )
        bu, bv = rngo.cmj_sample_2d(siu, ps, ps, perm_bounce)
        incoming, f_c, pdf_c = sample_sa(kind, exponent, outgoing, normal, bu, bv)
        cont = lane & (pdf_c > 0.0)
        gain_c = jnp.where(
            cont,
            f_c * jnp.abs(dot(-incoming, normal)) / jnp.maximum(pdf_c, 1e-37),
            1.0,
        )
        throughput = vwhere(cont, throughput * cmod_color * gain_c, throughput)
        o = vwhere(cont, position, o)
        d = vwhere(cont, -incoming, d)
        alive = cont
        return o, d, result, throughput, alive, num_dirac, overflow, queries

    # Rolled bounce loop: ONE compiled bounce body regardless of max_depth.
    o, d, result, throughput, alive, num_dirac, overflow, queries = (
        jax.lax.fori_loop(
            0, config.max_depth, bounce_body,
            carry_init(
                (o, d, result, throughput, alive, num_dirac, overflow0,
                 queries0)
            ),
        )
    )
    return result, overflow, queries


@partial(jax.jit, static_argnames=("config", "rows"))
def _render_path_pass(scene: SceneData, config: RenderConfig, camera: PerspectiveCamera,
                      si_chunk, row0=0, rows: int = 0):
    """Pixel rows [row0, row0+rows) × the pixel-sample indices in si_chunk;
    returns (SUM image [rows, W, 3] (AoS only at this output boundary),
    overflow [] int32, queries [] int32 — see pathtrace_wave).
    rows=0 means the full height; row0 may be a traced scalar (bands of the
    same height share one compiled executable)."""
    w, h = config.width, config.height
    if rows == 0:
        rows = h
    n_si = si_chunk.shape[0]
    px, py = _pixel_grid(w, rows)
    py = py + jnp.asarray(row0, jnp.int32)
    px = jnp.tile(px, n_si)
    py = jnp.tile(py, n_si)
    si = jnp.repeat(si_chunk.astype(jnp.int32), w * rows)
    h = rows
    ps = config.pixel_samples
    seed = np.uint32(config.seed)

    jx, jy = _subpixel_jitter(config, px, py, si, ps, ps)
    xu, yu = screen_uv(config, px, py, jx, jy)

    perm_lens = rngo.hash_combine(
        px.astype(jnp.uint32), py.astype(jnp.uint32), rngo.PURPOSE_LENS, seed
    )
    lens_u, lens_v = rngo.cmj_sample_2d(si.astype(jnp.uint32), ps, ps, perm_lens)
    perm_time = rngo.hash_combine(
        px.astype(jnp.uint32), py.astype(jnp.uint32), rngo.PURPOSE_TIME, seed
    )
    time_u = rngo.cmj_sample_1d(si.astype(jnp.uint32), ps * ps, perm_time)

    o, d, t = camera.make_rays(xu, yu, lens_u, lens_v, time_u)
    radiance, overflow, queries = pathtrace_wave(
        scene, config, o, d, t, px, py, si
    )
    img = jnp.stack(
        [
            radiance.x.reshape(n_si, h, w).sum(axis=0),
            radiance.y.reshape(n_si, h, w).sum(axis=0),
            radiance.z.reshape(n_si, h, w).sum(axis=0),
        ],
        axis=-1,
    )
    return img, overflow, queries


@partial(jax.jit, static_argnames=("config", "rows"))
def _render_path_frame(scene: SceneData, config: RenderConfig,
                       camera: PerspectiveCamera, si_mat, row0s,
                       rows: int = 0):
    """ONE device dispatch for a whole launch grid: lax.scan over the
    (sample-chunk, row-band) launches that render_path_with_stats would
    otherwise dispatch from the host one by one. Through the axon relay
    each dispatch costs ~ms of host gap (measured ~17 ms of a ~88 ms
    stage-6 bench frame wall-vs-device difference at 8 launches/frame),
    so a frame's launches are folded into a single executable.

    si_mat: [L, k] int32 sample indices per launch; row0s: [L] int32 first
    row per launch. Returns (imgs [L, rows, W, 3], overflow, queries) with
    the counters summed across launches. Bit-identical per-launch images
    to L separate _render_path_pass calls (the scan body IS that pass)."""

    def step(carry, xs):
        ovf, q = carry
        si, r0 = xs
        img, o1, q1 = _render_path_pass(scene, config, camera, si, r0, rows)
        return (ovf + o1, q + q1), img

    (overflow, queries), imgs = jax.lax.scan(
        step, (jnp.int32(0), jnp.int32(0)), (si_mat, row0s)
    )
    return imgs, overflow, queries


def _dispatch_grid(scene, config, camera, si_mat, row0s, rows, out_rows,
                   group=None):
    """Dispatch a launch grid through _render_path_frame in BOUNDED groups.

    The scan materializes every launch's [out_rows, W, 3] image at once,
    so an unbounded grid would trade the per-launch HBM headroom the
    chunking exists to protect (a 1080p 256-spp render would scan-allocate
    multiple GB); and its on-device int32 query counter can wrap across
    thousands of launches. Groups are capped at ~64 MB of scan output AND
    ~2^30 worst-case counted queries, with per-group totals accumulated in
    Python ints. Returns (imgs np [L, out_rows, W, 3], overflow, queries)."""
    n_launch = si_mat.shape[0]
    launch_bytes = max(1, out_rows * config.width * 3 * 4)
    # worst-case issued queries per launch: every lane alive every bounce,
    # one trace + two NEE-side queries per light sample
    q_est = max(
        1,
        config.max_rays_per_pass
        * config.max_depth
        * (1 + 2 * config.light_samples * config.light_samples),
    )
    g = group or int(max(1, min(n_launch,
                                (64 << 20) // launch_bytes,
                                (1 << 30) // q_est)))
    imgs = []
    overflow = 0
    queries = 0
    for i0 in range(0, n_launch, g):
        im, o1, q1 = _render_path_frame(
            scene, config, camera, si_mat[i0 : i0 + g],
            row0s[i0 : i0 + g], rows,
        )
        imgs.append(np.asarray(im))
        overflow += int(o1)
        queries += int(q1)
    return (
        np.concatenate(imgs, axis=0) if len(imgs) > 1 else imgs[0],
        overflow,
        queries,
    )


def render_path_with_stats(scene: SceneData, config: RenderConfig,
                           camera: PerspectiveCamera):
    """Stage-5/6/7 path-traced render (box-filtered mean of spp² samples).

    Returns (image, overflow int, queries int). Waves are chunked to
    config.max_rays_per_pass lanes per device launch — over sample indices
    first, then over pixel-row bands when a single sample still exceeds the
    budget (large frames: keeps the traversal's [N, K] intermediates inside
    comfortable HBM headroom). A frame's chunks run as FEW device
    dispatches (_dispatch_grid groups them under fixed memory/counter
    bounds — one dispatch for typical frames); accumulation order on the
    host matches the historical launch-by-launch loop bit for bit."""
    spp_total = config.pixel_samples * config.pixel_samples
    w, h = config.width, config.height
    n_pix = w * h
    acc = np.zeros((h, w, 3), np.float32)
    overflow = 0
    queries = 0
    if n_pix <= config.max_rays_per_pass:
        chunk = max(1, min(spp_total, config.max_rays_per_pass // n_pix))
        n_full = spp_total // chunk
        if n_full:
            si_mat = jnp.arange(n_full * chunk, dtype=jnp.int32).reshape(
                n_full, chunk
            )
            imgs, ovf, q = _dispatch_grid(
                scene, config, camera, si_mat,
                jnp.zeros((n_full,), jnp.int32), 0, h,
            )
            for img in imgs:
                acc += img
            overflow += ovf
            queries += q
        if n_full * chunk < spp_total:  # ragged tail chunk, one launch
            si = jnp.arange(n_full * chunk, spp_total, dtype=jnp.int32)
            img, ovf, q = _render_path_pass(scene, config, camera, si)
            acc += np.asarray(img)
            overflow += int(ovf)
            queries += int(q)
    else:
        band = max(1, config.max_rays_per_pass // w)
        n_bands = -(-h // band)
        # uniform band height -> ONE compiled executable for every band
        # (row0 is traced); the last band renders past the frame edge and is
        # cropped (out-of-frame pixels cost a few wasted lanes)
        r0s = [min(b * band, h - band) for b in range(n_bands)]
        si_mat = jnp.repeat(
            jnp.arange(spp_total, dtype=jnp.int32)[:, None], n_bands, axis=0
        )  # [(spp, band) grid, 1] — sample-major, matching the old loop
        row0s = jnp.asarray(r0s * spp_total, jnp.int32)
        imgs, ovf, q = _dispatch_grid(
            scene, config, camera, si_mat, row0s, band, band
        )
        for s0 in range(spp_total):
            for b in range(n_bands):
                r0 = r0s[b]
                done = b * band  # rows already accumulated by earlier bands
                skip = max(0, done - r0)  # overlap of a shifted last band
                acc[r0 + skip : r0 + band] += imgs[s0 * n_bands + b][skip:]
        overflow += ovf
        queries += q
    return acc / np.float32(spp_total), overflow, queries


def render_path(scene: SceneData, config: RenderConfig, camera: PerspectiveCamera):
    """render_path_with_stats, image only (the common call)."""
    img, overflow, _ = render_path_with_stats(scene, config, camera)
    if overflow:
        import sys

        print(
            f"[rayito_tpu] WARNING: cluster-traversal candidate overflow x"
            f"{overflow} — K1/K2 budgets exceeded; nearest hits may have been "
            "dropped (see render/mesh_intersect.py)",
            file=sys.stderr,
        )
    return img
