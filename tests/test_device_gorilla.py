"""Device Gorilla encode (ops/gorilla.py) vs the numpy wire kernel of truth
(ref/gorilla.py, itself locked to the reference C++ by test_golden.py).

Covers the classic bit-packer gotchas the reference's own suite sweeps
(test_field_encoders.cpp:280-513): same-value runs, window reuse vs reset,
chunk-boundary state resets, NaN/denormal bit patterns, ragged tails.
"""

import numpy as np
import pytest

from cloudini_tpu import (
    CompressionOption,
    EncodingInfo,
    EncodingOptions,
    FieldType,
    PointField,
    PointcloudEncoder,
)
from cloudini_tpu.core.plan import build_plan
from cloudini_tpu.ops.gorilla import gorilla_tokens
from cloudini_tpu.ref import gorilla as ref_gorilla

CHUNK = 1024


def _device_tokens(bits: np.ndarray, type_bits: int, n_valid=None):
    """One chunk through the device kernel -> (flat payload bytes, lengths)."""
    import jax.numpy as jnp

    from cloudini_tpu.ops import u64

    n = len(bits)
    valid = np.arange(n) < (n if n_valid is None else n_valid)
    if type_bits == 64:
        arr = bits.astype(np.uint64)
        lo = jnp.asarray((arr & 0xFFFFFFFF).astype(np.uint32)[None, :])
        hi = jnp.asarray((arr >> 32).astype(np.uint32)[None, :])
        mat, lengths = gorilla_tokens((lo, hi), 64, jnp.asarray(valid[None, :]))
    else:
        mat, lengths = gorilla_tokens(
            jnp.asarray(bits.astype(np.uint32)[None, :]), 32, jnp.asarray(valid[None, :])
        )
    mat = np.stack([np.asarray(l) for l in mat], axis=-1)[0]
    lengths = np.asarray(lengths)[0]
    payload = b"".join(mat[i, : lengths[i]].tobytes() for i in range(n))
    return payload, lengths


def _check(bits: np.ndarray, type_bits: int, n_valid=None):
    nv = len(bits) if n_valid is None else n_valid
    want_payload, want_lengths = ref_gorilla.encode_column(bits[:nv], type_bits)
    got_payload, got_lengths = _device_tokens(bits, type_bits, n_valid)
    assert np.array_equal(got_lengths[:nv], want_lengths)
    assert np.all(got_lengths[nv:] == 0)
    assert got_payload == want_payload


def _f64_bits(values: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(values, dtype=np.float64).view(np.uint64)


def _f32_bits(values: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(values, dtype=np.float32).view(np.uint32)


class TestTokenParity:
    def test_monotonic_timestamps(self):
        t = 1.7e9 + np.arange(500) * 1e-4  # the real-bag common case
        _check(_f64_bits(t), 64)

    def test_constant_run(self):
        _check(_f64_bits(np.full(300, 3.25)), 64)

    def test_constant_then_jump(self):
        v = np.concatenate([np.full(100, 1.5), np.full(100, -7.25), np.full(7, 1.5)])
        _check(_f64_bits(v), 64)

    def test_random_walk(self):
        rng = np.random.default_rng(0)
        _check(_f64_bits(np.cumsum(rng.normal(0, 1e-3, 800)) + 42.0), 64)

    def test_random_bits(self):
        rng = np.random.default_rng(1)
        _check(rng.integers(0, 2**64, 700, dtype=np.uint64), 64)

    def test_window_expand_contract(self):
        # engineered lead/trail ladders: force reuse chains and resets
        bits = []
        for lead in [4, 8, 8, 12, 8, 2, 30, 31, 40, 1]:
            for trail in [0, 8, 16, 4]:
                width = 64 - lead - trail
                if width <= 0:
                    continue
                bits.append(((1 << width) - 1) << trail)
        _check(np.array(bits, dtype=np.uint64), 64)

    def test_single_bit_patterns(self):
        bits = np.array([1 << k for k in range(64)] + [0, 0, 1, 1 << 63], dtype=np.uint64)
        _check(bits, 64)

    def test_nan_inf_denormal(self):
        v = np.array(
            [0.0, -0.0, np.nan, np.inf, -np.inf, 5e-324, 1.5, np.nan, np.nan, 2.5],
            dtype=np.float64,
        )
        _check(v.view(np.uint64), 64)

    def test_ragged_tail(self):
        rng = np.random.default_rng(2)
        bits = rng.integers(0, 2**64, 256, dtype=np.uint64)
        _check(bits, 64, n_valid=129)

    def test_single_point(self):
        _check(_f64_bits(np.array([3.14])), 64)

    def test_two_points(self):
        _check(_f64_bits(np.array([3.14, 3.15])), 64)

    def test_float32_random_walk(self):
        rng = np.random.default_rng(3)
        _check(_f32_bits(np.cumsum(rng.normal(0, 0.01, 600)).astype(np.float32)), 32)

    def test_float32_random_bits(self):
        rng = np.random.default_rng(4)
        _check(rng.integers(0, 2**32, 500, dtype=np.uint32).astype(np.uint32), 32)

    def test_float32_constant_run(self):
        _check(_f32_bits(np.full(100, -2.5, dtype=np.float32)), 32)

    def test_multi_chunk_batch(self):
        """Window state must reset per chunk (v4_codec.cpp:69)."""
        import jax.numpy as jnp

        rng = np.random.default_rng(5)
        c, n = 3, 200
        vals = np.cumsum(rng.normal(0, 1e-3, (c, n)), axis=1) + 9.0
        arr = np.ascontiguousarray(vals).view(np.uint64).reshape(c, n)
        lo = jnp.asarray((arr & 0xFFFFFFFF).astype(np.uint32))
        hi = jnp.asarray((arr >> 32).astype(np.uint32))
        valid = jnp.ones((c, n), bool)
        mat, lengths = gorilla_tokens((lo, hi), 64, valid)
        mat = np.stack([np.asarray(l) for l in mat], axis=-1)
        lengths = np.asarray(lengths)
        for i in range(c):
            want_payload, want_lengths = ref_gorilla.encode_column(arr[i], 64)
            got = b"".join(mat[i, k, : lengths[i, k]].tobytes() for k in range(n))
            assert np.array_equal(lengths[i], want_lengths)
            assert got == want_payload


class TestPipelineParity:
    def _info(self, version=5):
        return EncodingInfo(
            fields=(
                PointField("x", 0, FieldType.FLOAT32, 0.001),
                PointField("y", 4, FieldType.FLOAT32, 0.001),
                PointField("z", 8, FieldType.FLOAT32, 0.001),
                PointField("timestamp", 12, FieldType.FLOAT64, None),
            ),
            width=0,
            height=1,
            point_step=20,
            encoding_opt=EncodingOptions.LOSSY,
            compression_opt=CompressionOption.NONE,
            version=version,
        )

    def _rows(self, n, seed=0):
        rng = np.random.default_rng(seed)
        xyz = np.cumsum(rng.normal(0, 0.05, (n, 3)), axis=0).astype(np.float32)
        ts = 1.7e9 + np.cumsum(rng.exponential(1e-4, n))
        rows = np.zeros((n, 20), dtype=np.uint8)
        rows[:, 0:12] = xyz.view(np.uint8).reshape(n, 12)
        rows[:, 12:20] = ts.view(np.uint8).reshape(n, 8)
        return rows

    def test_device_encoder_supports_gorilla_plan(self):
        from cloudini_tpu.ops.device_codec import encoder_supports_plan

        info = self._info()
        n = self._rows(1)  # noqa: F841 - touch builder
        assert encoder_supports_plan(build_plan(info))

    @pytest.mark.parametrize("n", [1, 7, CHUNK, CHUNK + 1, 3 * CHUNK + 17])
    def test_device_vs_host_streams(self, n):
        """Mixed FloatN+Gorilla interleaved stream: device == host bytes
        (host is oracle-locked by test_golden.py)."""
        info = self._info()
        rows = self._rows(n, seed=n)
        host = PointcloudEncoder(info, backend="host", chunk_points=CHUNK).encode(rows)
        enc = PointcloudEncoder(info, backend="device", chunk_points=CHUNK)
        assert enc.backend == "device"
        dev = enc.encode(rows)
        assert dev == host

    def test_device_vs_host_with_ring_v5(self):
        """Full DDS-fixture-shaped schema: XYZI FloatN + u16 adaptive ring +
        f64 Gorilla timestamp, V5."""
        n = 2 * CHUNK + 100
        rng = np.random.default_rng(9)
        info = EncodingInfo(
            fields=(
                PointField("x", 0, FieldType.FLOAT32, 0.001),
                PointField("y", 4, FieldType.FLOAT32, 0.001),
                PointField("z", 8, FieldType.FLOAT32, 0.001),
                PointField("intensity", 12, FieldType.FLOAT32, 0.001),
                PointField("ring", 16, FieldType.UINT16, None),
                PointField("timestamp", 18, FieldType.FLOAT64, None),
            ),
            width=0,
            height=1,
            point_step=26,
            encoding_opt=EncodingOptions.LOSSY,
            compression_opt=CompressionOption.NONE,
            version=5,
        )
        xyzi = np.cumsum(rng.normal(0, 0.05, (n, 4)), axis=0).astype(np.float32)
        ring = (np.arange(n) % 32).astype(np.uint16)
        ts = 1.7e9 + np.cumsum(rng.exponential(1e-4, n))
        rows = np.zeros((n, 26), dtype=np.uint8)
        rows[:, 0:16] = xyzi.view(np.uint8).reshape(n, 16)
        rows[:, 16:18] = ring.view(np.uint8).reshape(n, 2)
        rows[:, 18:26] = ts.view(np.uint8).reshape(n, 8)
        host = PointcloudEncoder(info, backend="host", chunk_points=CHUNK).encode(rows)
        enc = PointcloudEncoder(info, backend="device", chunk_points=CHUNK)
        assert enc.backend == "device"
        dev = enc.encode(rows)
        assert dev == host


def test_large_chunk_beyond_32k():
    """Regression: orbit table count must scale with the chunk size — a fixed
    log2 cap silently corrupted reset chains longer than 2^15 steps."""
    rng = np.random.default_rng(42)
    n = 40000
    # alternating windows force a reset at (almost) every point
    lead = np.where(np.arange(n) % 2 == 0, 2, 10)
    trail = np.where(np.arange(n) % 2 == 0, 8, 0)
    xors = np.zeros(n, dtype=np.uint64)
    for i in range(1, n):
        width = 64 - lead[i] - trail[i]
        xors[i] = ((1 << width) - 1) << trail[i]
    bits = np.zeros(n, dtype=np.uint64)
    for i in range(1, n):
        bits[i] = bits[i - 1] ^ xors[i]
    _check(bits, 64)
