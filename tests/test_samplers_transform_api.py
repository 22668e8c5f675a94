"""Sampler taxonomy + Transform mutator API tests (reference parity surface)."""

import jax.numpy as jnp
import numpy as np

import rayito_tpu as rt
from rayito_tpu.ops import samplers


def test_sampler_kinds_ranges_and_stratification():
    idx = jnp.arange(16, dtype=jnp.uint32)
    for kind in ("random", "stratified", "cmj"):
        d1, d2 = samplers.sample_2d(kind, idx, 4, 4, jnp.uint32(7))
        a, b = np.asarray(d1), np.asarray(d2)
        assert (a >= 0).all() and (a < 1).all()
        assert (b >= 0).all() and (b < 1).all()
        s1 = np.asarray(samplers.sample_1d(kind, idx, 16, jnp.uint32(9)))
        assert (s1 >= 0).all() and (s1 < 1).all()
    # stratified: one sample per grid cell when index walks the grid
    d1, d2 = samplers.sample_2d("stratified", idx, 4, 4, jnp.uint32(3))
    cells = set(zip((np.asarray(d1) * 4).astype(int).tolist(),
                    (np.asarray(d2) * 4).astype(int).tolist()))
    assert len(cells) == 16


def test_transform_mutators_reference_semantics():
    """set*/translate/rotate with findOrInsertKey key management
    (RMath.h:719-797, 886-940)."""
    tr = rt.Transform()
    tr.translate(0.0, (0.0, -2.0, -2.0))  # key 0
    tr.rotate(1.0, (np.cos(np.pi / 8), 0.0, np.sin(np.pi / 8), 0.0))  # appends key
    assert tr.times == [0.0, 1.0]
    assert tr.translations[1] == (0.0, -2.0, -2.0)  # duplicated end key
    np.testing.assert_allclose(tr.rotations[0], (1, 0, 0, 0))
    np.testing.assert_allclose(
        tr.rotations[1], (np.cos(np.pi / 8), 0.0, np.sin(np.pi / 8), 0.0), atol=1e-7
    )

    # insertion BETWEEN keys interpolates
    tr2 = rt.Transform()
    tr2.set_translation(0.0, (0.0, 0.0, 0.0))
    tr2.set_translation(1.0, (4.0, 0.0, 0.0))
    tr2.set_scaling(0.25, (2.0, 2.0, 2.0))  # inserts interpolated key at 0.25
    assert tr2.times == [0.0, 0.25, 1.0]
    np.testing.assert_allclose(tr2.translations[1], (1.0, 0.0, 0.0))
    assert tr2.scales[1] == (2.0, 2.0, 2.0)

    # insertion BEFORE the range duplicates the first key
    tr2.set_rotation(-1.0, (0.0, 1.0, 0.0, 0.0))
    assert tr2.times[0] == -1.0
    assert tr2.rotations[0] == (0.0, 1.0, 0.0, 0.0)

    # rotate concatenation: two quarter-turns about Y = half-turn
    tr3 = rt.Transform()
    q = (np.cos(np.pi / 4), 0.0, np.sin(np.pi / 4), 0.0)
    tr3.rotate(0.0, q).rotate(0.0, q)
    np.testing.assert_allclose(tr3.rotations[0], (0.0, 0.0, 1.0, 0.0), atol=1e-7)


def test_mutated_transform_renders():
    """A builder-mutated transform flows through compile + intersect."""
    from rayito_tpu.ops.vec3 import V3
    from rayito_tpu.render.trace import scene_intersect

    s = rt.Scene()
    tr = rt.Transform()
    tr.set_translation(0.0, (-2.0, 0.0, 0.0))
    tr.set_translation(1.0, (2.0, 0.0, 0.0))
    s.add(rt.Sphere((0, 0, 0), 1.0, rt.DiffuseMaterial((1, 1, 1)), transform=tr))
    sd = s.compile()
    o = V3(jnp.asarray([-2.0], jnp.float32), jnp.zeros(1), jnp.full(1, -5.0))
    d = V3(jnp.zeros(1), jnp.zeros(1), jnp.ones(1))
    hit = scene_intersect(sd, o, d, jnp.zeros(1), 1e-4, jnp.full(1, 1e30))
    assert bool(hit.valid[0])
