"""Device decode of mixed varint + fixed-width (COPY/XOR) interleaved streams.

The pure-varint fast path finds token boundaries by counting terminator bytes;
mixed plans can't (fixed-token bytes have arbitrary MSBs), so the device uses
speculative successors + binary lifting (device_codec._decode_general). Every
test cross-checks the device rows bit-exactly against the host decoder on
streams produced by the host encoder (itself locked to the reference C++ by
tests/test_golden.py).
"""

import numpy as np
import pytest

from cloudini_tpu.codec.pipeline import PointcloudDecoder, PointcloudEncoder
from cloudini_tpu.core.types import (
    CompressionOption,
    EncodingInfo,
    EncodingOptions,
    FieldType,
    PointField,
)

CHUNK = 512


def _info(fields, n, step, encoding, version=4, comp=CompressionOption.NONE):
    return EncodingInfo(
        fields=tuple(fields), width=n, height=1, point_step=step,
        encoding_opt=encoding, compression_opt=comp, version=version,
    )


def _roundtrip_both(info, rows):
    enc = PointcloudEncoder(info, backend="host", chunk_points=CHUNK)
    data = enc.encode(rows, write_header=False)
    host = PointcloudDecoder(backend="host", chunk_points=CHUNK).decode(info, data)
    dev_dec = PointcloudDecoder(backend="device", chunk_points=CHUNK)
    dev = dev_dec.decode(info, data)
    assert np.array_equal(host, dev), "device decode differs from host"
    return host


def _lidar_rows(rng, n):
    pts = np.cumsum(rng.normal(0, 0.05, (n, 3)), axis=0).astype(np.float32)
    return pts


def test_mixed_floatn_copy_u8():
    """XYZ lossy varints + a COPY uint8 intensity between them on the wire."""
    rng = np.random.default_rng(0)
    n = 3 * CHUNK + 77
    pts = _lidar_rows(rng, n)
    inten = rng.integers(0, 256, (n, 1), dtype=np.uint8)
    rows = np.zeros((n, 13), np.uint8)
    rows[:, :12] = pts.view(np.uint8).reshape(n, 12)
    rows[:, 12:] = inten
    fields = [
        PointField("x", 0, FieldType.FLOAT32, 0.001),
        PointField("y", 4, FieldType.FLOAT32, 0.001),
        PointField("z", 8, FieldType.FLOAT32, 0.001),
        PointField("intensity", 12, FieldType.UINT8, None),
    ]
    out = _roundtrip_both(_info(fields, n, 13, EncodingOptions.LOSSY), rows)
    assert np.array_equal(out[:, 12], rows[:, 12])
    err = np.abs(out[:, :12].copy().view(np.float32).reshape(n, 3) - pts).max()
    assert err <= 0.001 * 1.0001


def test_mixed_with_nans_and_int_delta():
    """NaN markers + an INT_DELTA u32 + COPY u8 in one interleaved stream."""
    rng = np.random.default_rng(1)
    n = 2 * CHUNK + 13
    pts = _lidar_rows(rng, n)
    pts[rng.random(n) < 0.05] = np.nan
    seq = np.cumsum(rng.integers(0, 3, n, dtype=np.int64)).astype(np.uint32)
    flag = rng.integers(0, 2, (n, 1), dtype=np.uint8)
    rows = np.zeros((n, 17), np.uint8)
    rows[:, :12] = pts.view(np.uint8).reshape(n, 12)
    rows[:, 12:16] = seq.view(np.uint8).reshape(n, 4)
    rows[:, 16:] = flag
    fields = [
        PointField("x", 0, FieldType.FLOAT32, 0.001),
        PointField("y", 4, FieldType.FLOAT32, 0.001),
        PointField("z", 8, FieldType.FLOAT32, 0.001),
        PointField("seq", 12, FieldType.UINT32, None),
        PointField("flag", 16, FieldType.UINT8, None),
    ]
    out = _roundtrip_both(_info(fields, n, 17, EncodingOptions.LOSSY), rows)
    assert np.array_equal(out[:, 12:16].copy().view(np.uint32).ravel(), seq)
    assert np.array_equal(out[:, 16], rows[:, 16])
    got = out[:, :12].copy().view(np.float32).reshape(n, 3)
    nan_mask = np.isnan(pts)
    assert np.array_equal(np.isnan(got), nan_mask)
    err = np.abs(np.where(nan_mask, 0, got - pts)).max()
    assert err <= 0.001 * 1.0001


def test_lossless_f32_xor():
    """LOSSLESS FLOAT32 -> XOR residuals (fixed stride, no varints at all)."""
    rng = np.random.default_rng(2)
    n = CHUNK + 200
    pts = _lidar_rows(rng, n)
    rows = pts.view(np.uint8).reshape(n, 12)
    fields = [
        PointField("x", 0, FieldType.FLOAT32, None),
        PointField("y", 4, FieldType.FLOAT32, None),
        PointField("z", 8, FieldType.FLOAT32, None),
    ]
    out = _roundtrip_both(_info(fields, n, 12, EncodingOptions.LOSSLESS), rows)
    assert np.array_equal(out, rows)  # lossless


def test_lossless_f64_xor_v3():
    """FLOAT64 in a version-3 stream uses fixed 8-byte XOR (not Gorilla)."""
    rng = np.random.default_rng(3)
    n = CHUNK + 31
    ts = (1.7e9 + np.cumsum(rng.uniform(0, 1e-3, n))).astype(np.float64)
    rows = ts.view(np.uint8).reshape(n, 8)
    fields = [PointField("t", 0, FieldType.FLOAT64, None)]
    info = _info(fields, n, 8, EncodingOptions.LOSSLESS, version=3)
    out = _roundtrip_both(info, rows)
    assert np.array_equal(out, rows)


def test_none_encoding_all_copy():
    rng = np.random.default_rng(4)
    n = 2 * CHUNK + 5
    rows = rng.integers(0, 256, (n, 10), dtype=np.uint8)
    fields = [
        PointField("a", 0, FieldType.FLOAT32, None),
        PointField("b", 4, FieldType.UINT32, None),
        PointField("c", 8, FieldType.UINT16, None),
    ]
    info = _info(fields, n, 10, EncodingOptions.NONE)
    out = _roundtrip_both(info, rows)
    assert np.array_equal(out, rows)


def test_mixed_truncated_stream_raises():
    rng = np.random.default_rng(5)
    n = CHUNK
    pts = _lidar_rows(rng, n)
    inten = rng.integers(0, 256, (n, 1), dtype=np.uint8)
    rows = np.zeros((n, 13), np.uint8)
    rows[:, :12] = pts.view(np.uint8).reshape(n, 12)
    rows[:, 12:] = inten
    fields = [
        PointField("x", 0, FieldType.FLOAT32, 0.001),
        PointField("y", 4, FieldType.FLOAT32, 0.001),
        PointField("z", 8, FieldType.FLOAT32, 0.001),
        PointField("intensity", 12, FieldType.UINT8, None),
    ]
    info = _info(fields, n, 13, EncodingOptions.LOSSY)
    data = PointcloudEncoder(info, backend="host", chunk_points=CHUNK).encode(
        rows, write_header=False
    )
    # chop the tail of the (single) chunk but keep the frame size honest
    import struct

    payload = data[4:]
    cut = payload[: len(payload) - 40]
    bad = struct.pack("<I", len(cut)) + cut
    with pytest.raises(ValueError):
        PointcloudDecoder(backend="device", chunk_points=CHUNK).decode(info, bad)
