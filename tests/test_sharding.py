"""Multi-device sharding: N-device render == 1-device == unsharded, bitwise.

Pins the determinism claim of parallel/sharding.py (the TPU-native
replacement for the reference's 16-thread tile decomposition,
Rayito_Stage7_QT/RaytraceMain.cpp:502-568): per-lane counter-based CMJ
seeding makes the image independent of how the wavefront is partitioned
across devices. conftest.py provisions 8 virtual CPU devices.
"""

import jax
import numpy as np
import pytest

import rayito_tpu as rt
from rayito_tpu.models.camera import PerspectiveCamera
from rayito_tpu.models.demo import inline_box_mesh, stage5_scene
from rayito_tpu.parallel.sharding import make_mesh, render_path_sharded
from rayito_tpu.render.pathtracer import render_path
from rayito_tpu.utils.config import RenderConfig


@pytest.fixture(scope="module")
def small_setup():
    builder = stage5_scene()
    builder.add(inline_box_mesh(rt.DiffuseMaterial((0.8, 0.3, 0.1))))
    scene = builder.compile()
    camera = PerspectiveCamera.make(
        30.0, (0.0, 5.0, 15.0), (0.0, 0.0, 0.0), (0.0, 1.0, 0.0)
    )
    config = RenderConfig(
        width=40, height=24, pixel_samples=2, light_samples=1, max_depth=3
    )
    return scene, camera, config


def test_eight_devices_available():
    assert len(jax.devices("cpu")) >= 8


def test_sharded_bit_identical_across_device_counts(small_setup):
    scene, camera, config = small_setup
    img1 = render_path_sharded(scene, config, camera,
                               make_mesh(jax.devices("cpu")[:1]))
    img8 = render_path_sharded(scene, config, camera,
                               make_mesh(jax.devices("cpu")[:8]))
    assert np.isfinite(img8).all()
    np.testing.assert_array_equal(img1, img8)


def test_sharded_matches_unsharded(small_setup):
    scene, camera, config = small_setup
    img8 = render_path_sharded(scene, config, camera,
                               make_mesh(jax.devices("cpu")[:8]))
    ref = render_path(scene, config, camera)
    np.testing.assert_array_equal(np.asarray(img8, np.float32),
                                  ref.astype(np.float32))


def test_graft_entry_dryrun_subprocess():
    """The driver artifact path itself: dryrun_multichip must be green from
    an arbitrary caller env (it self-forces the CPU platform)."""
    import __graft_entry__ as g

    g.dryrun_multichip(8)
