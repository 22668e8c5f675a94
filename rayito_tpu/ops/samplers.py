"""Sampler taxonomy: random / stratified / correlated multi-jittered.

The reference exposes a ``Sampler`` class hierarchy (RandomSampler,
StratifiedRandomSampler, CorrelatedMultiJitterSampler —
Rayito_Stage7_QT/RSampling.h:64-382) holding per-thread mutable state. The
TPU equivalents are pure functions of (index, pattern size, permutation):
every lane of a wavefront draws its sample independently, which is the same
taxonomy without the sequential state (SURVEY §7 'Sampling').

All return float32 in [0, 1). ``kind`` selects the generator:
  * "random": pure hash — the RandomSampler passthrough (RSampling.h:112-149),
  * "stratified": jittered grid — StratifiedRandomSampler (RSampling.h:152-246)
    without the dead-1D-pattern stage-5/6 bug (SURVEY §2.3),
  * "cmj": Kensler CMJ — the production sampler (RSampling.h:253-382).
"""

from __future__ import annotations

import jax.numpy as jnp

from . import rng as rngo


def random_sample_1d(index, n, permutation):
    """Unstratified: hash of (index, permutation)."""
    return rngo.cmj_rand_float(jnp.asarray(index, jnp.uint32), permutation)


def random_sample_2d(index, nx, ny, permutation):
    i = jnp.asarray(index, jnp.uint32)
    p = rngo.u32(permutation)
    return (
        rngo.cmj_rand_float(i, p * rngo.u32(0xA399D265)),
        rngo.cmj_rand_float(i, p * rngo.u32(0x711AD6A5)),
    )


def stratified_sample_1d(index, n, permutation):
    """(index + jitter) / n over a 1-D grid."""
    i = jnp.asarray(index, jnp.uint32)
    jitter = rngo.cmj_rand_float(i, rngo.u32(permutation))
    return (i.astype(jnp.float32) + jitter) / jnp.float32(n)


def stratified_sample_2d(index, nx, ny, permutation):
    """((ix + jx) / nx, (iy + jy) / ny) over an nx x ny grid; index walks the
    grid row-major like the reference's precomputed pattern."""
    i = jnp.asarray(index, jnp.uint32)
    p = rngo.u32(permutation)
    ix = (i % jnp.uint32(nx)).astype(jnp.float32)
    iy = (i // jnp.uint32(nx)).astype(jnp.float32)
    jx = rngo.cmj_rand_float(i, p * rngo.u32(0xA399D265))
    jy = rngo.cmj_rand_float(i, p * rngo.u32(0x711AD6A5))
    return (ix + jx) / jnp.float32(nx), (iy + jy) / jnp.float32(ny)


def cmj_sample_1d(index, n, permutation):
    return rngo.cmj_sample_1d(jnp.asarray(index, jnp.uint32), n, permutation)


def cmj_sample_2d(index, nx, ny, permutation):
    return rngo.cmj_sample_2d(jnp.asarray(index, jnp.uint32), nx, ny, permutation)


SAMPLERS_1D = {
    "random": random_sample_1d,
    "stratified": stratified_sample_1d,
    "cmj": cmj_sample_1d,
}
SAMPLERS_2D = {
    "random": random_sample_2d,
    "stratified": stratified_sample_2d,
    "cmj": cmj_sample_2d,
}


def sample_1d(kind, index, n, permutation):
    return SAMPLERS_1D[kind](index, n, permutation)


def sample_2d(kind, index, nx, ny, permutation):
    return SAMPLERS_2D[kind](index, nx, ny, permutation)
