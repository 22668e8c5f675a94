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


def test_sharded_launch_chunking_bit_identical(small_setup):
    """Arbitrary-size frames (VERDICT r3 item 2): a wave budget that forces
    many launches (with a ragged, padded tail) must reproduce the
    single-launch image bit for bit, and padding lanes must not inflate the
    issued-query counter."""
    import dataclasses

    from rayito_tpu.parallel.sharding import render_path_sharded_with_stats
    from rayito_tpu.render.pathtracer import render_path_with_stats

    scene, camera, config = small_setup
    mesh8 = make_mesh(jax.devices("cpu")[:8])
    img_one, _, q_one = render_path_sharded_with_stats(
        scene, config, camera, mesh8
    )
    # 40*24*4 = 3840 lanes; budget 96*8 = 768/launch -> 5 full launches
    # exactly; 100*8 = 800 -> 4 full + ragged 640-lane tail
    for budget in (96, 100):
        small = dataclasses.replace(config, max_rays_per_pass=budget)
        img_b, _, q_b = render_path_sharded_with_stats(
            scene, small, camera, mesh8
        )
        np.testing.assert_array_equal(img_one, img_b)
        assert q_b == q_one
    # 7 devices: 3840 lanes % 7 != 0, so the tail launch carries INACTIVE
    # padding lanes — image and query counter must be unaffected
    small = dataclasses.replace(config, max_rays_per_pass=100)
    img7, _, q7 = render_path_sharded_with_stats(
        scene, small, camera, make_mesh(jax.devices("cpu")[:7])
    )
    np.testing.assert_array_equal(img_one, img7)
    assert q7 == q_one
    # honest accounting: sharded queries == the unsharded counter
    _, _, q_ref = render_path_with_stats(scene, config, camera)
    assert q_one == q_ref


def test_sharded_pallas_traversal(small_setup):
    """The production TPU multi-chip combination — the Pallas traversal
    kernel under shard_map (VERDICT r3 item 3) — must agree with the XLA
    cluster path and be device-count invariant (kernel interpreter mode on
    the CPU test platform)."""
    import dataclasses

    scene, camera, config = small_setup
    sc_pl = dataclasses.replace(scene, traversal="pallas")
    img1 = render_path_sharded(sc_pl, config, camera,
                               make_mesh(jax.devices("cpu")[:1]))
    img8 = render_path_sharded(sc_pl, config, camera,
                               make_mesh(jax.devices("cpu")[:8]))
    np.testing.assert_array_equal(img1, img8)
    # and against the XLA traversal, sharded + unsharded
    ref = render_path(dataclasses.replace(scene, traversal="xla"),
                      config, camera)
    assert np.isfinite(img8).all()
    np.testing.assert_allclose(np.asarray(img8), ref, rtol=0, atol=2e-5)


def test_sharded_progressive_checkpoint(small_setup, tmp_path):
    """Progressive accumulation + checkpoint/resume through the sharded
    path: interrupted-and-resumed == uninterrupted == unsharded."""
    from rayito_tpu.render.progressive import render_progressive

    scene, camera, config = small_setup
    mesh8 = make_mesh(jax.devices("cpu")[:8])
    img, stats = render_progressive(scene, config, camera, mesh=mesh8)
    assert stats.rays_traced > 0
    ref = render_path(scene, config, camera)
    np.testing.assert_array_equal(np.asarray(img, np.float32),
                                  ref.astype(np.float32))

    # force multiple chunks; interrupt after the first checkpoint save
    import dataclasses

    cfg_small = dataclasses.replace(config, max_rays_per_pass=40 * 24 // 8)
    ck = str(tmp_path / "sharded.ckpt.npz")
    calls = {"n": 0}

    def interrupt(st):
        calls["n"] += 1
        if calls["n"] == 1:
            raise KeyboardInterrupt

    try:
        render_progressive(scene, cfg_small, camera, checkpoint_path=ck,
                           on_progress=interrupt, mesh=mesh8)
    except KeyboardInterrupt:
        pass
    img2, st2 = render_progressive(scene, cfg_small, camera,
                                   checkpoint_path=ck, mesh=mesh8)
    assert st2.samples_done == config.pixel_samples**2
    np.testing.assert_array_equal(np.asarray(img2, np.float32),
                                  ref.astype(np.float32))


def test_graft_entry_dryrun_subprocess():
    """The driver artifact path itself: dryrun_multichip must be green from
    an arbitrary caller env (it self-forces the CPU platform)."""
    import __graft_entry__ as g

    g.dryrun_multichip(8)
