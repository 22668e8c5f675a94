"""Perspective camera with depth of field and motion-blur shutter.

TPU-native rewrite of the reference camera (Rayito_Stage7_QT/RaytraceMain.cpp:205-267,
rayito.h:51-97): instead of a virtual ``makeRay`` per pixel sample, ``make_rays``
generates an entire SoA wavefront of rays in one vectorized call.

Numeric-fidelity notes (SURVEY §2.11):
  * ``tan_fov = tan(fov_degrees * pi / 180)`` uses the FULL stated angle as the
    screen-width multiplier (no /2) — reference quirk, replicated exactly
    (RaytraceMain.cpp:216).
  * Shutter time = open + (close - open) * timeU (rayito.h:63-66).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from ..ops import vecmath as vm
from ..ops.warps import uniform_to_uniform_disk


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PerspectiveCamera:
    """Precomputed camera basis; a pytree so it can live inside jitted code."""

    origin: jnp.ndarray  # [3]
    forward: jnp.ndarray  # [3]
    right: jnp.ndarray  # [3]
    up: jnp.ndarray  # [3]
    tan_fov: jnp.ndarray  # scalar
    focal_distance: jnp.ndarray  # scalar
    lens_radius: jnp.ndarray  # scalar
    shutter_open: jnp.ndarray  # scalar
    shutter_close: jnp.ndarray  # scalar

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
        origin = jnp.asarray(origin, jnp.float32)
        target = jnp.asarray(target, jnp.float32)
        upv = jnp.asarray(up, jnp.float32)
        forward = vm.normalize(target - origin)
        # Reference does NOT normalize right/up in the stage-5+ camera ctor
        # (RaytraceMain.cpp:221-222) — forward and up are assumed orthonormal
        # enough. We match.
        right = vm.cross(forward, upv)
        cam_up = vm.cross(right, forward)
        return PerspectiveCamera(
            origin=origin,
            forward=forward,
            right=right,
            up=cam_up,
            tan_fov=jnp.float32(math.tan(fov_degrees * vm.PI / 180.0)),
            focal_distance=jnp.float32(focal_distance),
            lens_radius=jnp.float32(lens_radius),
            shutter_open=jnp.float32(shutter_open),
            shutter_close=jnp.float32(shutter_close),
        )

    def time(self, time_u: jnp.ndarray) -> jnp.ndarray:
        return self.shutter_open + (self.shutter_close - self.shutter_open) * time_u

    def make_rays(self, x_screen, y_screen, lens_u, lens_v, time_u):
        """Generate rays for screen positions in [0,1]^2 (batched).

        Returns (origin [N,3], direction [N,3], time [N]). Mirrors
        PerspectiveCamera::makeRay (RaytraceMain.cpp:224-267) including the
        uniform-disk lens sampling for DOF.
        """
        x_screen = jnp.asarray(x_screen, jnp.float32)
        sx = (x_screen - 0.5) * self.tan_fov
        sy = (jnp.asarray(y_screen, jnp.float32) - 0.5) * self.tan_fov
        direction = vm.normalize(
            self.forward + self.right * sx[..., None] + self.up * sy[..., None]
        )
        origin = jnp.broadcast_to(self.origin, direction.shape)
        t = self.time(jnp.asarray(time_u, jnp.float32))

        def with_dof(_):
            hshift, vshift = uniform_to_uniform_disk(
                jnp.asarray(lens_u, jnp.float32), jnp.asarray(lens_v, jnp.float32)
            )
            hshift = hshift * self.lens_radius
            vshift = vshift * self.lens_radius
            # local direction z for the focal-plane parameterization
            local_len = jnp.sqrt(sx * sx + sy * sy + 1.0)
            local_z = 1.0 / local_len
            focus_t = self.focal_distance / local_z
            focus_point = origin + direction * focus_t[..., None]
            new_origin = (
                origin + self.right * hshift[..., None] + self.up * vshift[..., None]
            )
            new_dir = vm.normalize(focus_point - new_origin)
            return new_origin, new_dir

        def no_dof(_):
            return origin, direction

        origin, direction = jax.lax.cond(self.lens_radius > 0.0, with_dof, no_dof, None)
        return origin, direction, jnp.broadcast_to(t, direction.shape[:-1])


def make_camera_ray_stage1(fov_degrees, origin, target, up, xu, yu):
    """The free-function camera of stages 1-4 (Rayito_Stage1/main.cpp:28-52).

    Identical direction math but with explicitly normalized right/up basis.
    Returns (origin [N,3], direction [N,3]).
    """
    origin = jnp.asarray(origin, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    upv = jnp.asarray(up, jnp.float32)
    forward = vm.normalize(target - origin)
    right = vm.normalize(vm.cross(forward, upv))
    cam_up = vm.normalize(vm.cross(right, forward))
    tan_fov = jnp.float32(math.tan(fov_degrees * vm.PI / 180.0))
    xu = jnp.asarray(xu, jnp.float32)
    yu = jnp.asarray(yu, jnp.float32)
    direction = vm.normalize(
        forward
        + right * ((xu - 0.5) * tan_fov)[..., None]
        + cam_up * ((yu - 0.5) * tan_fov)[..., None]
    )
    return jnp.broadcast_to(origin, direction.shape), direction
