"""Counter-based random number generation for TPU wavefronts.

Two generators, both stateless/vectorized so a whole ray wavefront draws its
random numbers in one VPU op — no per-thread mutable RNG objects:

1. **Marsaglia MWC** (bit-parity mode) — the reference's ``Rng``
   (Rayito_Stage7_QT/RSampling.h:27-58). Kept for unit tests and "oracle mode"
   debugging where we want the exact same float stream as the C++ code.

2. **Correlated Multi-Jittered (CMJ) hashing** — the reference's production
   sampler (RSampling.h:253-382, after Kensler, Pixar Tech Memo 13-01). It is
   already storageless & hash-based, which makes it *ideal* for TPU: every
   (pixel, sample, bounce, purpose) tuple maps to a permutation seed and the
   sample value is pure uint32 arithmetic.

All functions accept and return jnp arrays and are safe under jit/vmap/pallas.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_U32 = jnp.uint32

# float = u32 * 2.328306e-10f — the reference's canonical-float constant
# (RSampling.h:46). NOTE: this is slightly less than 1/2^32; values are [0, 1).
# (Kept as a Python float so importing this module doesn't init a jax backend.)
_CANONICAL = float(np.float32(2.328306e-10))


def u32(x) -> jnp.ndarray:
    return jnp.asarray(x, dtype=_U32)


# ---------------------------------------------------------------------------
# Marsaglia multiply-with-carry (bit-parity with the reference Rng)
# ---------------------------------------------------------------------------

MWC_Z0 = 362436069
MWC_W0 = 521288629


def mwc_init(z=MWC_Z0, w=MWC_W0):
    """Fresh MWC state. z/w may be arrays for a batch of streams."""
    return u32(z), u32(w)


def mwc_next_u32(state):
    """Advance MWC; returns (new_state, u32). Exact reference recurrence
    (RSampling.h:50-56)."""
    z, w = state
    z = u32(36969) * (z & u32(65535)) + (z >> 16)
    w = u32(18000) * (w & u32(65535)) + (w >> 16)
    return (z, w), (z << 16) + w


def mwc_next_float(state):
    state, i = mwc_next_u32(state)
    return state, i.astype(jnp.float32) * _CANONICAL


def u32_to_float01(i: jnp.ndarray) -> jnp.ndarray:
    """Canonical [0,1) float from raw 32 bits, reference-style."""
    return i.astype(jnp.float32) * _CANONICAL


# ---------------------------------------------------------------------------
# Kensler CMJ permutation / hash (exact constants from RSampling.h:334-381)
# ---------------------------------------------------------------------------


def cmj_permute(i: jnp.ndarray, num, permutation: jnp.ndarray) -> jnp.ndarray:
    """Hash-based cycle-walking permutation of ``i`` in [0, num).

    ``num`` must be a static int (same for the whole batch); ``i`` and
    ``permutation`` are uint32 arrays. The do/while cycle-walk becomes a
    lax.while_loop whose predicate is 'any lane still out of range' — expected
    <2 iterations since w+1 < 2*num.
    """
    i = u32(i)
    permutation = u32(permutation)
    num_u = u32(num)
    w = num_u - u32(1)
    w = w | (w >> 1)
    w = w | (w >> 2)
    w = w | (w >> 4)
    w = w | (w >> 8)
    w = w | (w >> 16)

    def round_fn(x):
        x = x ^ permutation
        x = x * u32(0xE170893D)
        x = x ^ (permutation >> 16)
        x = x ^ ((x & w) >> 4)
        x = x ^ (permutation >> 8)
        x = x * u32(0x0929EB3F)
        x = x ^ (permutation >> 23)
        x = x ^ ((x & w) >> 1)
        x = x * (u32(1) | (permutation >> 27))
        x = x * u32(0x6935FA69)
        x = x ^ ((x & w) >> 11)
        x = x * u32(0x74DCB303)
        x = x ^ ((x & w) >> 2)
        x = x * u32(0x9E501CC3)
        x = x ^ ((x & w) >> 2)
        x = x * u32(0xC860A3DF)
        x = x & w
        x = x ^ (x >> 5)
        return x

    # do { ... } while (i >= num), masked so converged lanes hold their value.
    i = round_fn(i)

    # Power-of-two num: round_fn ends with `x &= w` (w = num-1, all ones)
    # followed by `x ^= x >> 5`, which cannot leave [0, w] — the cycle-walk
    # condition is false on every lane, so the while_loop below never
    # iterates and skipping it is bit-identical. But the loop was ALSO a
    # fusion boundary: dropping it outright let XLA inline+duplicate the
    # ~30-op hash chain into every consumer and cost 10% of the stage-6
    # frame (13.6 -> 12.3 Mrays/s, bisected on hardware). Keep the result
    # materialized behind an optimization_barrier instead — boundary
    # without the loop's [N]-wide any() reduce. ``num`` is static, so the
    # branch resolves at trace time.
    if num & (num - 1):

        def cond(x):
            return jnp.any(x >= num_u)

        def body(x):
            return jnp.where(x >= num_u, round_fn(x), x)

        i = jax.lax.while_loop(cond, body, i)
    else:
        i = jax.lax.optimization_barrier(i)
    return (i + permutation) % num_u


def cmj_rand_float(i: jnp.ndarray, permutation: jnp.ndarray) -> jnp.ndarray:
    """Avalanche hash → canonical float in [0,1) (RSampling.h:370-381)."""
    i = u32(i)
    permutation = u32(permutation)
    i = i ^ permutation
    i = i ^ (i >> 17)
    i = i ^ (i >> 10)
    i = i * u32(0xB36534E5)
    i = i ^ (i >> 12)
    i = i ^ (i >> 21)
    i = i * u32(0x93FC4795)
    i = i ^ u32(0xDF6E307F)
    i = i ^ (i >> 17)
    i = i * (u32(1) | (permutation >> 18))
    return u32_to_float01(i)


def cmj_sample_1d(index: jnp.ndarray, n: int, permutation: jnp.ndarray) -> jnp.ndarray:
    """1-D CMJ sample for pattern of n samples (RSampling.h:272-279).
    Salt constants match the reference exactly."""
    permutation = u32(permutation)
    pidx = cmj_permute(index, n, permutation * u32(0x8FF3CD11))
    sx = cmj_rand_float(pidx, permutation * u32(0xA399D265))
    return (pidx.astype(jnp.float32) + sx) / jnp.float32(n)


def cmj_sample_2d(index: jnp.ndarray, nx: int, ny: int, permutation: jnp.ndarray):
    """2-D CMJ sample for an nx×ny pattern (RSampling.h:288-315).
    Returns (d1, d2), each float32 in [0,1)."""
    permutation = u32(permutation)
    n = nx * ny
    pidx = cmj_permute(index, n, permutation * u32(0xC2D3C8FB))
    ix = cmj_permute(pidx % u32(nx), nx, permutation * u32(0xA511E9B3))
    iy = cmj_permute(pidx // u32(nx), ny, permutation * u32(0x63D83595))
    sx = cmj_rand_float(pidx, permutation * u32(0xA399D265))
    sy = cmj_rand_float(pidx, permutation * u32(0x711AD6A5))
    d1 = (ix.astype(jnp.float32) + (iy.astype(jnp.float32) + sx) / jnp.float32(ny)) / jnp.float32(nx)
    d2 = (pidx.astype(jnp.float32) + sy) / jnp.float32(n)
    return d1, d2


# ---------------------------------------------------------------------------
# Permutation-seed derivation
#
# The reference seeds each CMJ sampler with rng.nextUInt32() per tile and
# refills per pixel (RaytraceMain.cpp:76-108,165-169). We replace that chain
# with a pure hash of (pixel_id, purpose, bounce[, extra]) so every lane of a
# wavefront derives its seeds independently & deterministically — same
# reproducibility guarantee, no sequential state.
# ---------------------------------------------------------------------------


def hash_combine(*vals) -> jnp.ndarray:
    """Mix an arbitrary tuple of uint32 arrays/ints into one uint32 seed.
    Wang-hash style finalizer over a running FNV-ish accumulator."""
    h = u32(0x9E3779B9)
    for v in vals:
        v = u32(v)
        h = h ^ (v + u32(0x9E3779B9) + (h << 6) + (h >> 2))
        # wang hash round for avalanche
        h = (h ^ u32(61)) ^ (h >> 16)
        h = h + (h << 3)
        h = h ^ (h >> 4)
        h = h * u32(0x27D4EB2D)
        h = h ^ (h >> 15)
    return h


# Purpose salts — the complete mapping from the reference's per-thread
# SamplerContainer of 8 sampler streams (Rayito_Stage7_QT/RaytraceMain.cpp:
# 84-108, samplers built per pixel at :215-248) to this renderer's pure
# counter-based CMJ keys. The reference gives each purpose its OWN
# sequentially-seeded sampler object; here each purpose gets its own
# permutation salt, hashed with (pixel.x, pixel.y, purpose, [bounce], seed)
# — hash_combine() below — so streams are decorrelated by construction and
# independent of scheduling. Pattern sizes match the reference exactly:
#
#   reference sampler (RaytraceMain.cpp)   salt here              CMJ pattern
#   m_sampler      (subpixel x,y)          PURPOSE_SUBPIXEL       ps x ps
#   m_lensSampler  (DOF lens u,v)          PURPOSE_LENS           ps x ps
#   m_timeSampler  (shutter 1D)            PURPOSE_TIME           (ps*ps) 1D
#   m_bounceSampler(continuation u,v)      PURPOSE_BOUNCE         ps x ps
#   per-bounce light loop, per sample:
#   m_lightSelectionSampler (1D)           PURPOSE_LIGHT_SELECT   (ps*ls)^2 1D
#   m_lightElementSampler   (1D)           PURPOSE_LIGHT_ELEMENT  (ps*ls)^2 1D
#   m_lightSampler          (u,v)          PURPOSE_LIGHT          (ps*ls)x(ps*ls)
#   m_brdfSampler           (u,v)          PURPOSE_BRDF           (ps*ls)x(ps*ls)
#
# The light-loop salts key on (pixel, purpose, bounce) and index the pattern
# with flat sample index si*nls+lsi (pathtracer.py:150-160): one stratified
# pattern spans all (pixel sample x light sample) draws of a bounce, exactly
# the reference's pattern-size choice; unlike the reference the streams do
# not advance with consumption order, so any lane/chunk schedule reproduces
# the same numbers (the determinism the tile-seeded MWC could not give).
PURPOSE_SUBPIXEL = 0x51BD0010
PURPOSE_LENS = 0x51BD0020
PURPOSE_TIME = 0x51BD0030
PURPOSE_BOUNCE = 0x51BD0040
PURPOSE_LIGHT_SELECT = 0x51BD0050
PURPOSE_LIGHT_ELEMENT = 0x51BD0060
PURPOSE_LIGHT = 0x51BD0070
PURPOSE_BRDF = 0x51BD0080
