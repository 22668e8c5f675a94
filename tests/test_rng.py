"""RNG & sampler tests: MWC bit-parity, CMJ bijection/stratification."""

import jax.numpy as jnp
import numpy as np

from rayito_tpu.ops import rng as rngo


def _mwc_oracle(n, z=362436069, w=521288629):
    """Pure-Python oracle of the documented Marsaglia MWC recurrence
    (SURVEY §2.3): z=36969*(z&65535)+(z>>16); w=18000*(w&65535)+(w>>16)."""
    out = []
    for _ in range(n):
        z = (36969 * (z & 65535) + (z >> 16)) & 0xFFFFFFFF
        w = (18000 * (w & 65535) + (w >> 16)) & 0xFFFFFFFF
        out.append(((z << 16) + w) & 0xFFFFFFFF)
    return out


def _mwc_stream(n, z=362436069, w=521288629):
    """Jitted scan producing n MWC uint32s in one dispatch."""
    import jax

    def step(state, _):
        state, v = rngo.mwc_next_u32(state)
        return state, v

    _, vals = jax.jit(lambda s: jax.lax.scan(step, s, None, length=n))(
        rngo.mwc_init(z, w)
    )
    return np.asarray(vals)


def test_mwc_bit_parity():
    got = _mwc_stream(64)
    assert [int(v) for v in got] == _mwc_oracle(64)


def test_mwc_float_range():
    vals = rngo.u32_to_float01(jnp.asarray(_mwc_stream(1000)))
    vals = np.asarray(vals)
    assert (vals >= 0.0).all() and (vals < 1.0).all()
    assert abs(vals.mean() - 0.5) < 0.05


def test_mwc_vectorized_streams():
    """Batch of states advances element-wise identically to scalar streams."""
    z = jnp.array([1, 2, 3], jnp.uint32)
    w = jnp.array([10, 20, 30], jnp.uint32)
    state = (z, w)
    state, v = rngo.mwc_next_u32(state)
    for i, (zi, wi) in enumerate([(1, 10), (2, 20), (3, 30)]):
        assert int(v[i]) == _mwc_oracle(1, zi, wi)[0]


def test_cmj_permute_is_bijection():
    for num in [7, 16, 33, 100]:
        idx = jnp.arange(num, dtype=jnp.uint32)
        out = np.asarray(rngo.cmj_permute(idx, num, jnp.uint32(0xDEADBEEF)))
        assert sorted(out.tolist()) == list(range(num))


def test_cmj_permute_varies_with_seed():
    idx = jnp.arange(64, dtype=jnp.uint32)
    a = np.asarray(rngo.cmj_permute(idx, 64, jnp.uint32(1)))
    b = np.asarray(rngo.cmj_permute(idx, 64, jnp.uint32(2)))
    assert (a != b).any()


def test_cmj_2d_stratification():
    """Kensler CMJ: the n samples of an nx×ny pattern land one per stratum on
    the nx×ny grid, one per column of the n-column grid in x, and one per row
    of the n-row grid in y."""
    nx, ny = 4, 4
    n = nx * ny
    idx = jnp.arange(n, dtype=jnp.uint32)
    d1, d2 = rngo.cmj_sample_2d(idx, nx, ny, jnp.uint32(12345))
    d1, d2 = np.asarray(d1), np.asarray(d2)
    assert (d1 >= 0).all() and (d1 < 1).all()
    assert (d2 >= 0).all() and (d2 < 1).all()
    # one sample in each coarse stratum
    cells = set(zip((d1 * nx).astype(int).tolist(), (d2 * ny).astype(int).tolist()))
    assert len(cells) == n
    # fully stratified projections (n fine strata each)
    assert sorted((d2 * n).astype(int).tolist()) == list(range(n))


def test_cmj_1d_stratification():
    n = 16
    idx = jnp.arange(n, dtype=jnp.uint32)
    d = np.asarray(rngo.cmj_sample_1d(idx, n, jnp.uint32(99)))
    assert sorted((d * n).astype(int).tolist()) == list(range(n))


def test_hash_combine_determinism_and_spread():
    a = rngo.hash_combine(jnp.uint32(1), jnp.uint32(2), jnp.uint32(3))
    b = rngo.hash_combine(jnp.uint32(1), jnp.uint32(2), jnp.uint32(3))
    c = rngo.hash_combine(jnp.uint32(1), jnp.uint32(2), jnp.uint32(4))
    assert int(a) == int(b)
    assert int(a) != int(c)
    # batched
    xs = jnp.arange(4096, dtype=jnp.uint32)
    hs = np.asarray(rngo.hash_combine(xs, jnp.uint32(7)))
    assert len(np.unique(hs)) > 4000  # near-collision-free on small domains
