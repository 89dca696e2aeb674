"""Software IEEE-754 binary64 (ops/f64.py) vs numpy's hardware f64.

The TPU device path uses these ops for the scalar FLOAT64 lossy codec
(quantize/reconstruct, field_encoder.hpp:98-118 / field_decoder.hpp:110-130);
every op must be bit-exact against IEEE, including subnormals, signed zeros,
infinities and halfway rounding.
"""

import numpy as np
import pytest

from cloudini_tpu.ops import f64 as sf


def _pairs(bits_u64):
    import jax.numpy as jnp

    return (
        jnp.asarray((bits_u64 & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
        jnp.asarray((bits_u64 >> np.uint64(32)).astype(np.uint32)),
    )


def _unpair(p):
    lo = np.asarray(p[0]).astype(np.uint64)
    hi = np.asarray(p[1]).astype(np.uint64)
    return lo | (hi << np.uint64(32))


def _bit_corpus(n=60000, seed=0):
    rng = np.random.default_rng(seed)
    special = np.array(
        [
            0, 1 << 63,  # +-0
            0x7FF0000000000000, 0xFFF0000000000000,  # +-inf
            1, 0x000FFFFFFFFFFFFF,  # subnormal extremes
            0x0010000000000000, 0x7FEFFFFFFFFFFFFF,  # min/max normal
            0x3FE0000000000000, 0x3FF0000000000000, 0x4000000000000000,
            0x3FF8000000000000, 0xBFF8000000000000,  # +-1.5
            0x4330000000000000, 0x4340000000000000,  # 2^52, 2^53
            0x43DFFFFFFFFFFFFF, 0x43E0000000000000,  # just below / at 2^63
        ],
        dtype=np.uint64,
    )
    rand = rng.integers(0, 2**64, n, dtype=np.uint64)
    # halfway-rounding stress: zeroed mantissa tails
    tails = rng.integers(0, 2**64, n // 4, dtype=np.uint64) & np.uint64(0xFFFFFFFF00000000)
    return np.concatenate([special, rand, tails])


CONSTANTS = [
    1000.0,
    1e6,
    0.001,
    1e-6,
    0.5,
    3.0,
    float(np.float64(1.0) / np.float64(np.float32(0.001))),  # the codec multiplier
    float(np.float64(np.float32(1e-6))),  # the codec reconstruction constant
    7.25e-300,
    1.3e300,
]


@pytest.mark.parametrize("c", CONSTANTS)
def test_mul_const_bit_exact(c):
    bits = _bit_corpus()
    vals = bits.view(np.float64)
    with np.errstate(all="ignore"):
        want = vals * np.float64(c)
    got = _unpair(sf.mul_const(_pairs(bits), c)).view(np.float64)
    m = ~np.isnan(vals)  # NaN payload propagation rules differ per platform
    assert np.array_equal(want[m].view(np.uint64), got[m].view(np.uint64))
    assert np.all(np.isnan(got[~m]))


def test_round_away_to_i64():
    bits = _bit_corpus(seed=1)
    vals = bits.view(np.float64)
    with np.errstate(all="ignore"):
        a = np.abs(vals)
        r = np.floor(a) + (a - np.floor(a) >= 0.5)
        want_r = np.copysign(r, vals)
    got = _unpair(sf.round_away_to_i64(_pairs(bits))).astype(np.int64)
    in_range = np.isfinite(vals) & (np.abs(want_r) < 2**63)
    assert np.array_equal(got[in_range], want_r[in_range].astype(np.int64))
    assert np.all(got[~in_range] == np.int64(-(2**63)))  # cvttsd2si semantics


def test_i64_to_f64_exact():
    rng = np.random.default_rng(2)
    iv = np.concatenate(
        [
            rng.integers(-(2**63), 2**63, 60000, dtype=np.int64),
            np.array(
                [0, 1, -1, 2**53, 2**53 + 1, -(2**63), 2**63 - 1, 2**62 + 3],
                dtype=np.int64,
            ),
        ]
    )
    got = _unpair(sf.i64_to_f64(_pairs(iv.view(np.uint64)))).view(np.float64)
    want = iv.astype(np.float64)
    assert np.array_equal(got.view(np.uint64), want.view(np.uint64))


def test_quantize_reconstruct_chain():
    """The exact chain the codec runs: round(x*mult) -> int64 -> f64 * res."""
    rng = np.random.default_rng(3)
    x = 1.7e9 + np.cumsum(rng.exponential(1e-4, 50000))
    bits = x.view(np.uint64)
    res = 1e-6
    mult = float(np.float64(1.0) / np.float64(np.float32(res)))
    res_c = float(np.float64(np.float32(res)))
    q = sf.round_away_to_i64(sf.mul_const(_pairs(bits), mult))
    f = _unpair(sf.mul_const(sf.i64_to_f64(q), res_c)).view(np.float64)
    want_q = np.floor(np.abs(x * mult)) + (np.abs(x * mult) % 1 >= 0.5)
    want_q = np.copysign(want_q, x).astype(np.int64)
    want = want_q.astype(np.float64) * np.float64(res_c)
    assert np.array_equal(f.view(np.uint64), want.view(np.uint64))
