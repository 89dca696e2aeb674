"""Varint codec tests — mirrors the reference's differential-oracle pattern
(test_field_encoders.cpp:165-278): the vectorized codec vs the verbatim scalar
implementation, exhaustive over short prefixes plus randomized long values."""

import numpy as np
import pytest

from cloudini_tpu.ref.varint import (
    decode_varint_scalar,
    encode_varint64_scalar,
    pack_varints,
    unpack_varints,
    varint_lengths,
    zigzag_decode,
    zigzag_encode,
)


def test_scalar_roundtrip_exhaustive_small():
    for v in range(-300, 300):
        buf = encode_varint64_scalar(v)
        back, n = decode_varint_scalar(buf)
        assert n == len(buf)
        assert back == v


def test_vectorized_matches_scalar_randomized():
    rng = np.random.default_rng(0)
    magnitudes = rng.integers(0, 63, 20000).astype(np.int64)
    base = rng.integers(0, 2**62, 20000, dtype=np.int64)
    signs = (rng.integers(0, 2, 20000, dtype=np.int64) * 2 - 1)
    vals = (signs * (base >> magnitudes)).astype(np.int64)
    stream = pack_varints(vals)
    want = b"".join(encode_varint64_scalar(int(v)) for v in vals)
    assert stream.tobytes() == want
    back, nan_mask, consumed = unpack_varints(stream, len(vals))
    assert consumed == len(stream)
    assert not nan_mask.any()
    assert np.array_equal(back, vals)


def test_zigzag_int64_min_wraps_to_nan_marker():
    """INT64_MIN zigzags to 2**64-1; the +1 bias wraps to 0 = the NaN marker —
    faithful to the reference's wraparound."""
    v = np.array([-(2**63)], dtype=np.int64)
    u = zigzag_encode(v)
    assert u[0] == 0
    assert encode_varint64_scalar(-(2**63)) == b"\x00"


def test_lengths_at_group_boundaries():
    points = []
    for k in range(1, 10):
        b = 1 << (7 * k)
        points += [b - 1, b]
    u = np.array(points, dtype=np.uint64)
    lens = varint_lengths(u)
    for i, k in enumerate(range(1, 10)):
        assert lens[2 * i] == k
        assert lens[2 * i + 1] == k + 1


def test_truncated_stream_raises():
    stream = np.array([0x80, 0x80], dtype=np.uint8)  # continuation never ends
    with pytest.raises(ValueError):
        unpack_varints(stream, 1)


def test_scalar_truncated_raises():
    with pytest.raises(ValueError):
        decode_varint_scalar(b"\x80\x80\x80")
    with pytest.raises(ValueError):
        decode_varint_scalar(b"")


def test_scalar_overflow_raises():
    with pytest.raises(ValueError):
        decode_varint_scalar(b"\xff" * 10 + b"\x7f")


def test_nan_marker_raises_in_scalar_decode():
    with pytest.raises(ValueError, match="NaN marker"):
        decode_varint_scalar(b"\x00")


def test_zigzag_roundtrip_extremes():
    vals = np.array([0, 1, -1, 2**62, -(2**62), 2**63 - 1, -(2**63) + 1], dtype=np.int64)
    u = zigzag_encode(vals)
    back = zigzag_decode(u - np.uint64(1))
    assert np.array_equal(back, vals)
