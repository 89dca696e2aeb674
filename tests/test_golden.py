"""Differential golden-bytes tests: the new framework vs the reference C++
library (compiled in place as the oracle). Mirrors the reference's own test
strategy (SURVEY §4): synthetic mode-forcing sequences, chunk/probe boundary
sweeps, NaN cases, and real-fixture round trips."""

import numpy as np
import pytest

from cloudini_tpu import (
    CompressionOption,
    EncodingInfo,
    EncodingOptions,
    FieldType,
    PointField,
    PointcloudDecoder,
    PointcloudEncoder,
)


def _make_xyz(n, seed=0, nan_frac=0.0, dtype=np.float32, walk=True):
    rng = np.random.default_rng(seed)
    if walk:
        steps = rng.normal(0, 0.05, size=(n, 3))
        data = np.cumsum(steps, axis=0) + rng.uniform(-50, 50, size=3)
    else:
        data = rng.uniform(-100, 100, size=(n, 3))
    data = data.astype(dtype)
    if nan_frac > 0:
        mask = rng.random((n, 3)) < nan_frac
        data[mask] = np.nan
    return data


def _rows(*cols, point_step=None):
    """Pack typed columns into (n, point_step) uint8 rows at packed offsets."""
    n = len(cols[0])
    sizes = [c.dtype.itemsize for c in cols]
    offsets = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    step = point_step or int(sum(sizes))
    rows = np.zeros((n, step), dtype=np.uint8)
    for c, off in zip(cols, offsets):
        rows[:, off : off + c.dtype.itemsize] = c.reshape(-1, 1).view(np.uint8).reshape(n, c.dtype.itemsize)
    return rows


def _xyz_info(n, compression=CompressionOption.NONE, version=5, res=0.001):
    return EncodingInfo(
        fields=(
            PointField("x", 0, FieldType.FLOAT32, res),
            PointField("y", 4, FieldType.FLOAT32, res),
            PointField("z", 8, FieldType.FLOAT32, res),
        ),
        width=n,
        height=1,
        point_step=12,
        encoding_opt=EncodingOptions.LOSSY,
        compression_opt=compression,
        version=version,
    )


def _assert_bitexact(oracle, info, raw: bytes):
    """Encode both ways, compare bytes; then cross-decode both directions."""
    mine = PointcloudEncoder(info).encode(raw)
    golden = oracle.encode(info, raw)
    assert mine == golden, f"encode bytes differ: len {len(mine)} vs {len(golden)}"
    my_dec = PointcloudDecoder().decode_full(mine)[1].tobytes()
    ref_dec = oracle.decode(golden)
    assert my_dec == ref_dec, "decoded output differs"
    return mine


# ------------------------------------------------------------------ XYZ lossy


@pytest.mark.parametrize("n", [1, 2, 7, 4095, 4096, 4097, 32767, 32768, 32769, 70000])
def test_xyz_lossy_none_boundaries(oracle, n):
    data = _make_xyz(n, seed=n)
    _assert_bitexact(oracle, _xyz_info(n), data.tobytes())


@pytest.mark.parametrize("nan_frac", [0.01, 0.3, 1.0])
def test_xyz_lossy_nan(oracle, nan_frac):
    data = _make_xyz(5000, seed=42, nan_frac=nan_frac)
    _assert_bitexact(oracle, _xyz_info(5000), data.tobytes())


def test_xyz_lossy_extreme_values(oracle):
    rng = np.random.default_rng(3)
    data = rng.uniform(-3e6, 3e6, size=(2000, 3)).astype(np.float32)
    data[::17] = 0.0
    data[::29] *= 1e3  # overflow int32 after quantization -> SSE sentinel
    _assert_bitexact(oracle, _xyz_info(2000), data.tobytes())


def test_xyz_rounding_ties(oracle):
    # values that quantize exactly onto .5 boundaries: ties-to-even (SIMD path)
    res = 0.001
    vals = (np.arange(-4000, 4000, dtype=np.float32) + np.float32(0.5)) * np.float32(res)
    data = np.stack([vals, vals, vals], axis=1).astype(np.float32)
    n = data.shape[0]
    _assert_bitexact(oracle, _xyz_info(n), data.tobytes())


# ------------------------------------------------------------------ XYZI (FloatN-4)


@pytest.mark.parametrize("n", [100, 4097, 33000])
def test_xyzi_floatn4(oracle, n):
    data = _make_xyz(n, seed=n + 1)
    intensity = np.random.default_rng(7).uniform(0, 255, n).astype(np.float32)
    rows = _rows(data[:, 0].copy(), data[:, 1].copy(), data[:, 2].copy(), intensity)
    info = EncodingInfo(
        fields=(
            PointField("x", 0, FieldType.FLOAT32, 0.001),
            PointField("y", 4, FieldType.FLOAT32, 0.001),
            PointField("z", 8, FieldType.FLOAT32, 0.001),
            PointField("intensity", 12, FieldType.FLOAT32, 0.1),
        ),
        width=n,
        height=1,
        point_step=16,
        encoding_opt=EncodingOptions.LOSSY,
        compression_opt=CompressionOption.NONE,
        version=5,
    )
    _assert_bitexact(oracle, info, rows.tobytes())


# ------------------------------------------------------------------ scalar lossy float (5th field)


def test_fifth_lossy_float_scalar_path(oracle):
    """5 leading lossy floats -> no FloatN fusion at all (count must be 3 or 4);
    exercises the scalar ties-away path (codec_common.cpp:69-83)."""
    n = 3000
    rng = np.random.default_rng(11)
    cols = [
        (np.cumsum(rng.normal(0, 0.03, n)) + 5).astype(np.float32) for _ in range(5)
    ]
    rows = _rows(*cols)
    fields = tuple(PointField(f"f{i}", i * 4, FieldType.FLOAT32, 0.001) for i in range(5))
    info = EncodingInfo(
        fields=fields, width=n, height=1, point_step=20,
        encoding_opt=EncodingOptions.LOSSY, compression_opt=CompressionOption.NONE, version=5,
    )
    _assert_bitexact(oracle, info, rows.tobytes())


def test_lossy_float64(oracle):
    n = 2000
    rng = np.random.default_rng(13)
    x = _make_xyz(n, seed=1)
    ts = (1.7e9 + np.cumsum(rng.uniform(0, 1e-3, n))).astype(np.float64)
    rows = _rows(x[:, 0].copy(), x[:, 1].copy(), x[:, 2].copy(), ts)
    info = EncodingInfo(
        fields=(
            PointField("x", 0, FieldType.FLOAT32, 0.001),
            PointField("y", 4, FieldType.FLOAT32, 0.001),
            PointField("z", 8, FieldType.FLOAT32, 0.001),
            PointField("t", 12, FieldType.FLOAT64, 1e-6),
        ),
        width=n, height=1, point_step=20,
        encoding_opt=EncodingOptions.LOSSY, compression_opt=CompressionOption.NONE, version=5,
    )
    _assert_bitexact(oracle, info, rows.tobytes())


# ------------------------------------------------------------------ integer paths (V4)


@pytest.mark.parametrize(
    "ftype,np_dtype",
    [
        (FieldType.INT16, np.int16),
        (FieldType.UINT16, np.uint16),
        (FieldType.INT32, np.int32),
        (FieldType.UINT32, np.uint32),
        (FieldType.INT64, np.int64),
        (FieldType.UINT64, np.uint64),
    ],
)
def test_int_delta_v4(oracle, ftype, np_dtype):
    """version=4 keeps integers on the plain delta-varint path."""
    n = 5000
    rng = np.random.default_rng(int(ftype))
    iinfo = np.iinfo(np_dtype)
    vals = rng.integers(iinfo.min, int(iinfo.max) + 1, n, dtype=np_dtype)
    x = _make_xyz(n, seed=2)
    rows = _rows(x[:, 0].copy(), x[:, 1].copy(), x[:, 2].copy(), vals)
    info = EncodingInfo(
        fields=(
            PointField("x", 0, FieldType.FLOAT32, 0.001),
            PointField("y", 4, FieldType.FLOAT32, 0.001),
            PointField("z", 8, FieldType.FLOAT32, 0.001),
            PointField("v", 12, ftype),
        ),
        width=n, height=1, point_step=12 + np.dtype(np_dtype).itemsize,
        encoding_opt=EncodingOptions.LOSSY, compression_opt=CompressionOption.NONE, version=4,
    )
    _assert_bitexact(oracle, info, rows.tobytes())


def test_int8_copy_path(oracle):
    n = 3000
    rng = np.random.default_rng(21)
    x = _make_xyz(n, seed=3)
    flags = rng.integers(0, 256, n, dtype=np.uint8)
    rows = _rows(x[:, 0].copy(), x[:, 1].copy(), x[:, 2].copy(), flags)
    info = EncodingInfo(
        fields=(
            PointField("x", 0, FieldType.FLOAT32, 0.001),
            PointField("y", 4, FieldType.FLOAT32, 0.001),
            PointField("z", 8, FieldType.FLOAT32, 0.001),
            PointField("flag", 12, FieldType.UINT8),
        ),
        width=n, height=1, point_step=13,
        encoding_opt=EncodingOptions.LOSSY, compression_opt=CompressionOption.NONE, version=5,
    )
    _assert_bitexact(oracle, info, rows.tobytes())


# ------------------------------------------------------------------ lossless paths


def test_lossless_xor_float32(oracle):
    n = 4000
    data = _make_xyz(n, seed=5)
    info = _xyz_info(n)
    info = info.with_(encoding_opt=EncodingOptions.LOSSLESS,
                      fields=tuple(f for f in info.fields))
    _assert_bitexact(oracle, info, data.tobytes())


@pytest.mark.parametrize("n", [1, 2, 100, 33000])
def test_gorilla_float64(oracle, n):
    """FLOAT64 without resolution -> Gorilla bit-packing (v>=4)."""
    rng = np.random.default_rng(n)
    ts = 1.7e9 + np.cumsum(rng.uniform(0, 1e-3, n))
    ts[::7] = ts[0]  # inject same-value runs (Gorilla '0'-bit path)  # some repeats
    if n > 10:
        ts[5:10] = ts[4]  # identical-run -> single '0' bits
    rows = _rows(ts.astype(np.float64))
    info = EncodingInfo(
        fields=(PointField("t", 0, FieldType.FLOAT64),),
        width=n, height=1, point_step=8,
        encoding_opt=EncodingOptions.LOSSY, compression_opt=CompressionOption.NONE, version=5,
    )
    _assert_bitexact(oracle, info, rows.tobytes())


def test_v3_float64_uses_raw_xor(oracle):
    """version=3 must NOT use Gorilla (cloudini.cpp:374; locked by reference
    test_field_encoders.cpp:860-926)."""
    n = 1000
    rng = np.random.default_rng(31)
    ts = 1.7e9 + np.cumsum(rng.uniform(0, 1e-3, n))
    rows = _rows(ts.astype(np.float64))
    info = EncodingInfo(
        fields=(PointField("t", 0, FieldType.FLOAT64),),
        width=n, height=1, point_step=8,
        encoding_opt=EncodingOptions.LOSSY, compression_opt=CompressionOption.NONE, version=3,
    )
    mine = _assert_bitexact(oracle, info, rows.tobytes())
    # raw XOR is 8 bytes/value: stream must be strictly larger than Gorilla's
    info4 = info.with_(version=4)
    gor = PointcloudEncoder(info4).encode(rows.tobytes())
    assert len(mine) > len(gor)


# ------------------------------------------------------------------ NONE encoding


def test_encoding_none_passthrough(oracle):
    n = 2000
    data = _make_xyz(n, seed=6)
    info = _xyz_info(n).with_(encoding_opt=EncodingOptions.NONE)
    _assert_bitexact(oracle, info, data.tobytes())


# ------------------------------------------------------------------ V5 adaptive ints


def _v5_info(n, extra_fields, point_step):
    base = (
        PointField("x", 0, FieldType.FLOAT32, 0.001),
        PointField("y", 4, FieldType.FLOAT32, 0.001),
        PointField("z", 8, FieldType.FLOAT32, 0.001),
    )
    return EncodingInfo(
        fields=base + tuple(extra_fields),
        width=n, height=1, point_step=point_step,
        encoding_opt=EncodingOptions.LOSSY, compression_opt=CompressionOption.NONE, version=5,
    )


def _v5_rows(n, int_vals, seed=0):
    x = _make_xyz(n, seed=seed)
    return _rows(x[:, 0].copy(), x[:, 1].copy(), x[:, 2].copy(), int_vals)


@pytest.mark.parametrize("n", [64, 4095, 4096, 4097, 32768, 32775, 70000])
def test_v5_mode_probe_boundaries(oracle, n):
    """The probe-boundary sweep from the reference test suite
    (test_field_encoders.cpp:676-693)."""
    rng = np.random.default_rng(n)
    ring = (np.arange(n) % 16).astype(np.uint16)  # palette-friendly
    rows = _v5_rows(n, ring, seed=n)
    info = _v5_info(n, [PointField("ring", 12, FieldType.UINT16)], 14)
    _assert_bitexact(oracle, info, rows.tobytes())


def test_v5_mode_delta_varint(oracle):
    n = 6000
    vals = np.random.default_rng(1).integers(-100000, 100000, n, dtype=np.int32)
    rows = _v5_rows(n, vals)
    info = _v5_info(n, [PointField("v", 12, FieldType.INT32)], 16)
    _assert_bitexact(oracle, info, rows.tobytes())


def test_v5_mode_rle(oracle):
    n = 6000
    # long runs of huge unrelated values -> RLE wins over delta & palette
    rng = np.random.default_rng(2)
    run_vals = rng.integers(0, 2**63, 30, dtype=np.int64)
    vals = np.repeat(run_vals, n // 30)[:n].astype(np.int64)
    rows = _v5_rows(n, vals)
    info = _v5_info(n, [PointField("v", 12, FieldType.INT64)], 20)
    _assert_bitexact(oracle, info, rows.tobytes())


def test_v5_mode_delta_rle(oracle):
    n = 6000
    # strictly increasing with constant step -> DeltaRle wins
    vals = (np.arange(n, dtype=np.int64) * 1000003).astype(np.int64)
    rows = _v5_rows(n, vals)
    info = _v5_info(n, [PointField("v", 12, FieldType.INT64)], 20)
    _assert_bitexact(oracle, info, rows.tobytes())


def test_v5_mode_palette(oracle):
    n = 6000
    rng = np.random.default_rng(4)
    uniq = rng.integers(0, 2**31, 7, dtype=np.uint32)
    vals = uniq[rng.integers(0, 7, n)]
    rows = _v5_rows(n, vals)
    info = _v5_info(n, [PointField("v", 12, FieldType.UINT32)], 16)
    _assert_bitexact(oracle, info, rows.tobytes())


def test_v5_multiple_adaptive_fields(oracle):
    n = 40000  # spans probe + second chunk
    rng = np.random.default_rng(5)
    ring = (np.arange(n) % 32).astype(np.uint16)
    count = np.cumsum(rng.integers(0, 3, n)).astype(np.uint32)
    x = _make_xyz(n, seed=9)
    rows = _rows(x[:, 0].copy(), x[:, 1].copy(), x[:, 2].copy(), ring, count)
    info = _v5_info(
        n,
        [PointField("ring", 12, FieldType.UINT16), PointField("count", 14, FieldType.UINT32)],
        18,
    )
    _assert_bitexact(oracle, info, rows.tobytes())


def test_v5_float_only_falls_back_to_v4(oracle):
    """V5 float-only output must be byte-identical to V4 (wire lock from
    test_field_encoders.cpp:746-753)."""
    n = 5000
    data = _make_xyz(n, seed=10)
    v5 = PointcloudEncoder(_xyz_info(n, version=5)).encode(data.tobytes())
    v4 = PointcloudEncoder(_xyz_info(n, version=4)).encode(data.tobytes())
    assert v5[:14] != v4[:14]  # headers differ in the version digits  # headers differ (version digits)
    # strip headers (find end of header: null terminator)
    assert v5[v5.index(b"\0") + 1 :] == v4[v4.index(b"\0") + 1 :]


# ------------------------------------------------------------------ stage 2


@pytest.mark.parametrize("compression", [CompressionOption.LZ4, CompressionOption.ZSTD])
def test_stage2_cross_decode(oracle, compression):
    """Compressed streams must cross-decode in both directions (byte equality of
    the compressed payload is additionally asserted when the system libraries
    match the reference's vendored versions)."""
    n = 40000
    data = _make_xyz(n, seed=100)
    info = _xyz_info(n, compression=compression)
    mine = PointcloudEncoder(info).encode(data.tobytes())
    golden = oracle.encode(info, data.tobytes())
    # system liblz4 1.9.4 / libzstd 1.5.7 currently produce byte-identical
    # output to the reference's vendored versions — assert full equality while
    # that holds (cross-decode below is the invariant that must never break)
    assert mine == golden
    # cross-decode
    assert oracle.decode(mine) == PointcloudDecoder().decode_full(golden)[1].tobytes()
    assert PointcloudDecoder().decode_full(mine)[1].tobytes() == oracle.decode(golden)
    # size parity: ours must be <= reference
    assert len(mine) <= len(golden)


# ------------------------------------------------------------------ real fixtures


def test_lidar_pcd_roundtrip(oracle, lidar_pcd):
    from cloudini_tpu.io.pcd import read_pcd

    schema, rows = read_pcd(lidar_pcd)
    fields = tuple(
        PointField(f.name, f.offset, f.type, 0.001 if f.type == FieldType.FLOAT32 else None)
        for f in schema.fields
    )
    info = schema.with_(
        fields=fields,
        encoding_opt=EncodingOptions.LOSSY,
        compression_opt=CompressionOption.NONE,
        version=5,
    )
    _assert_bitexact(oracle, info, rows.tobytes())


# ------------------------------------------------------------------ legacy v2

# The reference ENCODER cannot emit version 2 (it always writes u32 chunk
# framing, cloudini.cpp:572-588, which v2 decode does not read) — v2 streams
# only exist from old releases. v2 decode semantics (cloudini.cpp:664-666,
# v4_codec.cpp:108-116): the whole payload is ONE stage-2 unit and ONE
# unframed stage-1 chunk, decoded length-driven (expected_points=0) with a
# single predictor reset — NO 32Ki-point chunking. These tests synthesize a
# v2 stream and lock our decode against the reference's.


def _synthesize_v2(info, rows: np.ndarray) -> bytes:
    from cloudini_tpu.codec import stage2
    from cloudini_tpu.core.header import encode_header
    from cloudini_tpu.core.plan import build_plan
    from cloudini_tpu.ref import stage1 as np_stage1

    plan = build_plan(info, for_decode=False)
    payload = np_stage1.encode_chunk(plan, rows).tobytes()  # one chunk, no reset
    payload = stage2.compress_chunk(info.compression_opt, payload)
    return encode_header(info) + payload


@pytest.mark.parametrize("compression", [CompressionOption.NONE, CompressionOption.LZ4])
def test_v2_legacy_decode(oracle, compression):
    # 40001 points crosses the 32768 boundary: proves the decoder does NOT
    # reset predictors mid-stream for v2 (one continuous chunk)
    n = 40001
    data = _make_xyz(n, seed=202)
    info = _xyz_info(n, compression=compression, version=2)
    stream = _synthesize_v2(info, np.frombuffer(data.tobytes(), np.uint8).reshape(n, 12))
    ref = oracle.decode(stream)
    mine_info, mine = PointcloudDecoder().decode_full(stream)
    assert mine_info.version == 2
    assert mine.tobytes() == ref


def test_v2_legacy_decode_float64_xor(oracle):
    """v2 + FLOAT64 without resolution must use XOR, never Gorilla
    (Gorilla requires version >= 4, codec_common.cpp:116-198)."""
    n = 3000
    rng = np.random.default_rng(7)
    ts = (1.7e9 + np.cumsum(rng.uniform(0, 1e-4, n))).astype(np.float64)
    x = _make_xyz(n, seed=8)
    rows = _rows(x[:, 0].copy(), x[:, 1].copy(), x[:, 2].copy(), ts)
    info = EncodingInfo(
        fields=(
            PointField("x", 0, FieldType.FLOAT32, 0.001),
            PointField("y", 4, FieldType.FLOAT32, 0.001),
            PointField("z", 8, FieldType.FLOAT32, 0.001),
            PointField("t", 12, FieldType.FLOAT64, None),
        ),
        width=n, height=1, point_step=20,
        encoding_opt=EncodingOptions.LOSSY,
        compression_opt=CompressionOption.NONE,
        version=2,
    )
    stream = _synthesize_v2(info, rows)
    ref = oracle.decode(stream)
    assert PointcloudDecoder().decode_full(stream)[1].tobytes() == ref
