"""Perspective camera with depth of field and motion-blur shutter (SoA).

TPU-native rewrite of the reference camera (Rayito_Stage7_QT/RaytraceMain.cpp:
205-267, rayito.h:51-97): instead of a virtual ``makeRay`` per pixel sample,
``make_rays`` generates an entire component-SoA wavefront of rays in one
vectorized call.

Numeric-fidelity notes (SURVEY §2.11):
  * ``tan_fov = tan(fov_degrees * pi / 180)`` uses the FULL stated angle as
    the screen-width multiplier (no /2) — reference quirk, replicated exactly
    (RaytraceMain.cpp:216).
  * Shutter time = open + (close - open) * timeU (rayito.h:63-66).
  * DOF is blended by mask, not branched — cheaper on a vector machine and
    shard_map-compatible.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.vec3 import V3, cross, dot, normalize, splat, where as vwhere
from ..ops.vec3 import PI
from ..ops.warps import uniform_to_uniform_disk


def _look_basis(origin, target, up, normalize_all: bool):
    o = splat(origin)
    fwd = normalize(splat(target) - o)
    right = cross(fwd, splat(up))
    if normalize_all:
        right = normalize(right)
    cam_up = cross(right, fwd)
    if normalize_all:
        cam_up = normalize(cam_up)
    return o, fwd, right, cam_up


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PerspectiveCamera:
    """Precomputed camera basis; a pytree so it can live inside jitted code."""

    origin: V3  # scalar components
    forward: V3
    right: V3
    up: V3
    tan_fov: jnp.ndarray
    focal_distance: jnp.ndarray
    lens_radius: jnp.ndarray
    shutter_open: jnp.ndarray
    shutter_close: jnp.ndarray

    @staticmethod
    def make(
        fov_degrees: float,
        origin,
        target,
        up,
        focal_distance: float = 16.0,
        lens_radius: float = 0.0,
        shutter_open: float = 0.0,
        shutter_close: float = 0.0,
    ) -> "PerspectiveCamera":
        # Reference does NOT normalize right/up in the stage-5+ camera ctor
        # (RaytraceMain.cpp:221-222); forward is normalized.
        o, fwd, right, cam_up = _look_basis(origin, target, up, normalize_all=False)
        return PerspectiveCamera(
            origin=o,
            forward=fwd,
            right=right,
            up=cam_up,
            tan_fov=jnp.float32(math.tan(fov_degrees * PI / 180.0)),
            focal_distance=jnp.float32(focal_distance),
            lens_radius=jnp.float32(lens_radius),
            shutter_open=jnp.float32(shutter_open),
            shutter_close=jnp.float32(shutter_close),
        )

    def time(self, time_u):
        return self.shutter_open + (self.shutter_close - self.shutter_open) * time_u

    def make_rays(self, x_screen, y_screen, lens_u, lens_v, time_u):
        """Generate rays for screen positions in [0,1]^2 (batched).

        Returns (origin V3 [N], direction V3 [N], time [N]). Mirrors
        PerspectiveCamera::makeRay (RaytraceMain.cpp:224-267) including the
        uniform-disk lens sampling for DOF.
        """
        sx = (jnp.asarray(x_screen, jnp.float32) - 0.5) * self.tan_fov
        sy = (jnp.asarray(y_screen, jnp.float32) - 0.5) * self.tan_fov
        direction = normalize(self.forward + self.right * sx + self.up * sy)
        origin = self.origin.broadcast_to(sx.shape)
        t = jnp.broadcast_to(self.time(jnp.asarray(time_u, jnp.float32)), sx.shape)

        # DOF path computed unconditionally, blended by lens_radius > 0
        hshift, vshift = uniform_to_uniform_disk(
            jnp.asarray(lens_u, jnp.float32), jnp.asarray(lens_v, jnp.float32)
        )
        hshift = hshift * self.lens_radius
        vshift = vshift * self.lens_radius
        local_len = jnp.sqrt(sx * sx + sy * sy + 1.0)
        focus_t = self.focal_distance * local_len  # = focal/(1/len) = focal/local_z
        focus_point = origin + direction * focus_t
        new_origin = origin + self.right * hshift + self.up * vshift
        new_dir = normalize(focus_point - new_origin)
        use_dof = self.lens_radius > 0.0
        origin = vwhere(use_dof, new_origin, origin)
        direction = vwhere(use_dof, new_dir, direction)
        return origin, direction, t


def make_camera_ray_stage1(fov_degrees, origin, target, up, xu, yu):
    """The free-function camera of stages 1-4 (Rayito_Stage1/main.cpp:28-52):
    identical direction math but with explicitly normalized right/up basis.
    Returns (origin V3 [N], direction V3 [N])."""
    o, fwd, right, cam_up = _look_basis(origin, target, up, normalize_all=True)
    tan_fov = jnp.float32(math.tan(fov_degrees * PI / 180.0))
    xu = jnp.asarray(xu, jnp.float32)
    yu = jnp.asarray(yu, jnp.float32)
    direction = normalize(
        fwd + right * ((xu - 0.5) * tan_fov) + cam_up * ((yu - 0.5) * tan_fov)
    )
    return o.broadcast_to(xu.shape), direction
