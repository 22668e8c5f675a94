"""Integrators: stage-1 flat color, stage-2/3/4 direct lighting (SoA).

(The full path tracer with NEE+MIS lives in render/pathtracer.py.)

The reference's per-pixel nested loops (Rayito_Stage3/main.cpp:227-254,
trace() at :96-159) become a wavefront: ONE array program over all
pixel samples at once, jitted per (scene shape, config). Pixel-sample
accumulation is a reshape+mean, no scatter needed since each pixel draws the
same number of samples.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models.camera import make_camera_ray_stage1
from ..models.scene import LIGHT_RECT, LIGHT_SPHERE, SceneData
from ..ops import rng as rngo
from ..ops.brdf import KIND_EMITTER, KIND_LAMBERT, KIND_PHONG
from ..ops.vec3 import V3, cross, dot, from_aos, normalize, splat, where as vwhere
from ..ops.warps import uniform_to_sphere
from ..utils.config import RenderConfig
from .trace import material_emittance, scene_intersect

# ---------------------------------------------------------------------------
# Screen-sample generation
# ---------------------------------------------------------------------------


def _pixel_grid(width: int, height: int):
    py, px = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.int32),
        jnp.arange(width, dtype=jnp.int32),
        indexing="ij",
    )
    return px.reshape(-1), py.reshape(-1)


def screen_uv(config: RenderConfig, px, py, jx, jy):
    """Map pixel indices + intra-pixel jitter to [0,1]^2 screen coords.

    Stage 1-2 divide by (w-1)/(h-1); stage 3+ divide by w/h (SURVEY §2.11.2).
    y is flipped: PPM rows are top-down, screen space is bottom-up
    (Rayito_Stage1/main.cpp:95-101).
    """
    w = jnp.float32(config.width - 1 if config.pixel_div_minus_one else config.width)
    h = jnp.float32(config.height - 1 if config.pixel_div_minus_one else config.height)
    xu = (px.astype(jnp.float32) + jx) / w
    yu = 1.0 - (py.astype(jnp.float32) + jy) / h
    if config.aspect_correction:
        # RenderThread aspect fix: xu' = (xu - 0.5) * (w/h) + 0.5 so that
        # height controls zoom (RaytraceMain.cpp:72-74,138)
        xu = (xu - 0.5) * (jnp.float32(config.width) / jnp.float32(config.height)) + 0.5
    return xu, yu


def _subpixel_jitter(config: RenderConfig, px, py, si, spp_x, spp_y):
    """Stratified CMJ jitter in the pixel, keyed by (pixel, purpose, seed).
    Replaces the reference's sequential per-thread MWC stream with a
    counter-based pattern — same stratification, fully parallel."""
    perm = rngo.hash_combine(
        px.astype(jnp.uint32),
        py.astype(jnp.uint32),
        rngo.PURPOSE_SUBPIXEL,
        np.uint32(config.seed),
    )
    jx, jy = rngo.cmj_sample_2d(si.astype(jnp.uint32), spp_x, spp_y, perm)
    return jx, jy


def _image_aos(v: V3, n_si, h, w, reduce="sum"):
    """V3 wavefront -> [H, W, 3] image (AoS only at the output boundary)."""
    comps = []
    for c in (v.x, v.y, v.z):
        c = c.reshape(n_si, h, w)
        comps.append(c.sum(axis=0) if reduce == "sum" else c.mean(axis=0))
    return jnp.stack(comps, axis=-1)


# ---------------------------------------------------------------------------
# Stage 1: deterministic flat-color render
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("config", "fov", "camera"))
def _render_color_pass(scene: SceneData, config: RenderConfig, fov, camera):
    px, py = _pixel_grid(config.width, config.height)
    xu, yu = screen_uv(config, px, py, jnp.float32(0.0), jnp.float32(0.0))
    o, d = make_camera_ray_stage1(fov, *camera, xu, yu)
    t = jnp.zeros(xu.shape[0], jnp.float32)
    hit = scene_intersect(scene, o, d, t, config.ray_tmin, jnp.float32(1.0e30))
    color = from_aos(scene.mat_color)[jnp.maximum(hit.mat, 0)]
    zero = jnp.zeros_like(color.x)
    color = vwhere(hit.valid, color, V3(zero, zero, zero))
    return _image_aos(color, 1, config.height, config.width)


def render_color(scene: SceneData, config: RenderConfig, fov=30.0,
                 camera=((0.0, 0.0, 0.0), (0.0, 0.0, 1.0), (0.0, 1.0, 0.0))):
    """Stage-1 render: material color on hit, black on miss
    (Rayito_Stage1/main.cpp:93-135). Deterministic, 1 spp."""
    cam = tuple(tuple(float(x) for x in v) for v in camera)
    return np.asarray(_render_color_pass(scene, config, float(fov), cam))


# ---------------------------------------------------------------------------
# Stages 2-4: direct lighting with per-light area sampling
# ---------------------------------------------------------------------------


def _material_shade(scene: SceneData, mat_ids, normal: V3, in_dir: V3,
                    light_dir: V3) -> V3:
    """Stage-3/4 Material::shade (Rayito_Stage3/rayito.h:441-506):
    lambert = max(0,l.n)*color; phong = max(0,h.n)^exp*color; emitter = 0."""
    from .trace import material_row

    kind, color, expo = material_row(scene, mat_ids)
    lamb = jnp.maximum(0.0, dot(light_dir, normal))
    half = normalize(light_dir - in_dir)
    phong = jnp.power(jnp.maximum(0.0, dot(half, normal)), expo)
    s = jnp.where(kind == KIND_LAMBERT, lamb, jnp.where(kind == KIND_PHONG, phong, 0.0))
    s = jnp.where(kind == KIND_EMITTER, 0.0, s)
    return color * s


def _sample_light_surface_direct(scene: SceneData, li: int, ref_pos: V3, u1, u2):
    """Stage-2/3 Light::sampleSurface for light index ``li`` (host-static).

    RectangleLight: uniform in parallelogram, normal flipped toward ref
    (Rayito_Stage3/rayito.h:677-688). Sphere ShapeLight: uniform sphere point,
    flipped to the ref side (Rayito_Stage3/rayito.h:104-117).
    Returns (light_point V3, light_normal V3).
    """
    kind = scene.light_kinds_host[li]
    idx = scene.light_indices_host[li]
    if kind == LIGHT_RECT:
        corner = from_aos(scene.rect_corner)[idx]
        s1 = from_aos(scene.rect_side1)[idx]
        s2 = from_aos(scene.rect_side2)[idx]
        nrm = normalize(cross(s1, s2))
        pos = corner + s1 * u1 + s2 * u2
        nrm = nrm.broadcast_to(pos.shape)
        flip = dot(nrm, pos - ref_pos) > 0.0
        nrm = vwhere(flip, -nrm, nrm)
        return pos, nrm
    elif kind == LIGHT_SPHERE:
        center = from_aos(scene.sph_center)[idx]
        radius = scene.sph_radius[idx]
        nrm = uniform_to_sphere(u1, u2)
        pos = nrm * radius + center
        flip = dot(nrm, ref_pos - pos) < 0.0
        nrm = vwhere(flip, -nrm, nrm)
        pos = vwhere(flip, nrm * radius + center, pos)
        return pos, nrm
    else:
        raise NotImplementedError("mesh ShapeLight not used by direct stages")


@partial(jax.jit, static_argnames=("config", "fov", "camera", "spp_x", "spp_y"))
def _render_direct_pass(scene: SceneData, config: RenderConfig, fov, camera,
                        spp_x: int, spp_y: int, si_chunk=None):
    """One wavefront pass over all pixels × the sample indices in si_chunk.
    Returns the SUM image over those samples [H, W, 3]."""
    w, h = config.width, config.height
    if si_chunk is None:
        si_chunk = jnp.arange(spp_x * spp_y, dtype=jnp.int32)
    n_si = si_chunk.shape[0]
    px, py = _pixel_grid(w, h)
    px = jnp.tile(px, n_si)
    py = jnp.tile(py, n_si)
    si = jnp.repeat(si_chunk.astype(jnp.int32), w * h)
    jx, jy = _subpixel_jitter(config, px, py, si, spp_x, spp_y)
    xu, yu = screen_uv(config, px, py, jx, jy)
    o, d = make_camera_ray_stage1(fov, *camera, xu, yu)
    n = xu.shape[0]
    t0 = jnp.zeros(n, jnp.float32)

    hit = scene_intersect(scene, o, d, t0, config.ray_tmin, jnp.float32(1.0e30))
    result = material_emittance(scene, hit.mat)
    position = o + d * hit.t

    ls_total = config.light_samples * config.light_samples
    for li in range(scene.n_lights):
        lc = scene.light_color[li]
        lpow = scene.light_power[li]
        emitted = V3(lc[0] * lpow, lc[1] * lpow, lc[2] * lpow)
        light_sid = scene.light_shape_id[li]
        perm = rngo.hash_combine(
            px.astype(jnp.uint32),
            py.astype(jnp.uint32),
            si.astype(jnp.uint32),
            rngo.PURPOSE_LIGHT,
            np.uint32(li),
            np.uint32(config.seed),
        )

        # Rolled loop over the stratified light samples: ONE compiled body
        # regardless of light_samples² (the reference just loops,
        # RaytraceMain.cpp:339).
        def light_body(ls, acc, perm=perm, emitted=emitted, light_sid=light_sid,
                       li=li):
            u1, u2 = rngo.cmj_sample_2d(
                jnp.full(n, ls, jnp.uint32),
                config.light_samples,
                config.light_samples,
                perm,
            )
            lp, ln = _sample_light_surface_direct(scene, li, position, u1, u2)
            to_light = lp - position
            dist = jnp.sqrt(jnp.maximum(dot(to_light, to_light), 1e-37))
            to_light = to_light / dist
            # Shadow: full intersect; occlusion by the light itself is
            # accepted for rect lights only (stage-3 semantics + ShapeLight
            # pointer quirk — Rayito_Stage3/main.cpp:140, rayito.h:710-719)
            shadow = scene_intersect(
                scene, position, to_light, t0, config.ray_tmin, dist
            )
            if scene.light_kinds_host[li] == LIGHT_RECT:
                visible = (~shadow.valid) | (shadow.shape_id == light_sid)
            else:
                visible = ~shadow.valid
            shade = _material_shade(scene, hit.mat, hit.normal, d, to_light)
            gain = jnp.where(visible & hit.valid, hit.color_mod, 0.0)
            return acc + emitted * shade * gain

        zero = jnp.zeros(n, jnp.float32)
        acc = jax.lax.fori_loop(0, ls_total, light_body, V3(zero, zero, zero))
        result = result + acc * (1.0 / jnp.float32(ls_total))

    zero = jnp.zeros(n, jnp.float32)
    result = vwhere(hit.valid, result, V3(zero, zero, zero))
    return _image_aos(result, n_si, h, w)


def render_direct(scene: SceneData, config: RenderConfig, fov=45.0,
                  camera=((0.0, 5.0, 15.0), (0.0, 0.0, 0.0), (0.0, 1.0, 0.0)),
                  spp=None):
    """Stage-2/3/4 direct-lighting render. ``spp`` overrides the per-axis
    (pixel_samples x pixel_samples) stratification with an (spp, 1) pattern
    (stage 2 uses 64 unstratified samples). Samples are chunked into
    wavefronts of at most config.max_rays_per_pass rays."""
    if spp is not None:
        spp_x, spp_y = int(spp), 1
    else:
        spp_x = spp_y = config.pixel_samples
    cam = tuple(tuple(float(x) for x in v) for v in camera)
    spp_total = spp_x * spp_y
    n_pix = config.width * config.height
    chunk = max(1, min(spp_total, config.max_rays_per_pass // n_pix))
    acc = np.zeros((config.height, config.width, 3), np.float32)
    for s0 in range(0, spp_total, chunk):
        si = jnp.arange(s0, min(s0 + chunk, spp_total), dtype=jnp.int32)
        acc += np.asarray(
            _render_direct_pass(scene, config, float(fov), cam, spp_x, spp_y, si)
        )
    return acc / np.float32(spp_total)
