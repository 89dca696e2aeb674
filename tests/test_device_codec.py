"""Parity tests: JAX device stage-1 codec vs the numpy wire kernel of truth
(which is itself locked bit-exact to the reference C++ by test_golden.py)."""

import numpy as np
import pytest

from cloudini_tpu import (
    CompressionOption,
    EncodingInfo,
    EncodingOptions,
    FieldType,
    PointField,
)
from cloudini_tpu.core.plan import build_plan
from cloudini_tpu.ref import stage1 as np_stage1

CHUNK = 2048  # small chunk capacity keeps CPU tests fast


def _device_encoder(plan, step):
    from cloudini_tpu.ops.device_codec import DeviceStage1Encoder

    return DeviceStage1Encoder(plan, step, chunk_points=CHUNK)


def _device_decoder(plan, step, max_bytes=None):
    from cloudini_tpu.ops.device_codec import DeviceStage1Decoder

    return DeviceStage1Decoder(plan, step, chunk_points=CHUNK, max_bytes=max_bytes)


def _pad_chunks(rows, chunk):
    n, step = rows.shape
    c = (n + chunk - 1) // chunk
    out = np.zeros((c, chunk, step), dtype=np.uint8)
    n_valid = np.zeros(c, dtype=np.int32)
    for i in range(c):
        part = rows[i * chunk : (i + 1) * chunk]
        out[i, : len(part)] = part
        n_valid[i] = len(part)
    return out, n_valid


def _xyz_rows(n, seed=0, nan_frac=0.0, extra=None):
    rng = np.random.default_rng(seed)
    data = (np.cumsum(rng.normal(0, 0.05, (n, 3)), axis=0) + 3).astype(np.float32)
    if nan_frac:
        data[rng.random((n, 3)) < nan_frac] = np.nan
    cols = [data[:, 0].copy(), data[:, 1].copy(), data[:, 2].copy()]
    if extra is not None:
        cols.append(extra)
    sizes = [c.dtype.itemsize for c in cols]
    offs = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    step = int(sum(sizes))
    rows = np.zeros((n, step), dtype=np.uint8)
    for c, off in zip(cols, offs):
        rows[:, off : off + c.dtype.itemsize] = c.reshape(-1, 1).view(np.uint8).reshape(n, -1)
    return rows, offs, step


def _compare_encode(info, rows):
    plan = build_plan(info)
    enc = _device_encoder(plan, info.point_step)
    chunks, n_valid = _pad_chunks(rows, CHUNK)
    payloads, sizes = enc.encode_chunks(chunks, n_valid)
    payloads, sizes = np.asarray(payloads), np.asarray(sizes)
    for i in range(chunks.shape[0]):
        want = np_stage1.encode_chunk(plan, rows[i * CHUNK : i * CHUNK + n_valid[i]])
        got = payloads[i, : sizes[i]]
        assert sizes[i] == len(want), f"chunk {i}: size {sizes[i]} vs {len(want)}"
        assert np.array_equal(got, want), f"chunk {i}: bytes differ"
    return plan, payloads, sizes, chunks, n_valid


def _compare_decode(info, plan, payloads, sizes, chunks, n_valid):
    dec = _device_decoder(plan, info.point_step, max_bytes=payloads.shape[1])
    out, consumed = dec.decode_chunks(payloads, sizes, n_valid)
    out, consumed = np.asarray(out), np.asarray(consumed)
    assert np.array_equal(consumed, sizes)  # regular stream consumes everything
    for i in range(chunks.shape[0]):
        got = out[i, : n_valid[i]]
        want = chunks[i, : n_valid[i]]
        _assert_rows_equal(info, got, want)


def _assert_rows_equal(info, got, want):
    """Decoded rows must match the round-tripped (quantized) original."""
    plan = build_plan(info, for_decode=True)
    ref = np.zeros_like(want)
    data = np_stage1.encode_chunk(build_plan(info), want)
    np_stage1.decode_chunk(plan, data, ref, want.shape[0])
    assert np.array_equal(got, ref)


@pytest.mark.parametrize("n", [1, 5, CHUNK - 1, CHUNK, CHUNK + 1, 3 * CHUNK + 17])
def test_xyz_device_encode_decode(n):
    rows, _, step = _xyz_rows(n, seed=n)
    info = EncodingInfo(
        fields=(
            PointField("x", 0, FieldType.FLOAT32, 0.001),
            PointField("y", 4, FieldType.FLOAT32, 0.001),
            PointField("z", 8, FieldType.FLOAT32, 0.001),
        ),
        width=n, height=1, point_step=step,
        encoding_opt=EncodingOptions.LOSSY, compression_opt=CompressionOption.NONE,
    )
    args = _compare_encode(info, rows)
    _compare_decode(info, *args)


@pytest.mark.parametrize("nan_frac", [0.02, 0.5, 1.0])
def test_xyz_device_nan(nan_frac):
    n = 3 * CHUNK
    rows, _, step = _xyz_rows(n, seed=9, nan_frac=nan_frac)
    info = EncodingInfo(
        fields=(
            PointField("x", 0, FieldType.FLOAT32, 0.001),
            PointField("y", 4, FieldType.FLOAT32, 0.001),
            PointField("z", 8, FieldType.FLOAT32, 0.001),
        ),
        width=n, height=1, point_step=step,
        encoding_opt=EncodingOptions.LOSSY, compression_opt=CompressionOption.NONE,
    )
    args = _compare_encode(info, rows)
    _compare_decode(info, *args)


def test_xyz_device_extreme_overflow():
    n = CHUNK
    rng = np.random.default_rng(4)
    data = rng.uniform(-3e9, 3e9, size=(n, 3)).astype(np.float32)  # int32 overflow
    rows = np.ascontiguousarray(data).view(np.uint8).reshape(n, 12)
    info = EncodingInfo(
        fields=(
            PointField("x", 0, FieldType.FLOAT32, 0.001),
            PointField("y", 4, FieldType.FLOAT32, 0.001),
            PointField("z", 8, FieldType.FLOAT32, 0.001),
        ),
        width=n, height=1, point_step=12,
        encoding_opt=EncodingOptions.LOSSY, compression_opt=CompressionOption.NONE,
    )
    args = _compare_encode(info, rows)
    _compare_decode(info, *args)


def test_scalar_f32_and_int_device():
    """Non-fused scalar f32 lossy (ties-away path) + u16/i64 delta varints;
    version=4 keeps integers on the interleaved path."""
    n = 2 * CHUNK + 100
    rng = np.random.default_rng(6)
    rows, offs, step = _xyz_rows(n, seed=11)
    ring = rng.integers(0, 65536, n, dtype=np.uint16)
    intensity = rng.uniform(0, 300, n).astype(np.float32)
    counter = np.cumsum(rng.integers(0, 2**40, n, dtype=np.int64)).astype(np.int64)
    rows2 = np.zeros((n, step + 14), dtype=np.uint8)
    rows2[:, :step] = rows
    rows2[:, step : step + 2] = ring.reshape(-1, 1).view(np.uint8).reshape(n, 2)
    rows2[:, step + 2 : step + 6] = intensity.reshape(-1, 1).view(np.uint8).reshape(n, 4)
    rows2[:, step + 6 :] = counter.reshape(-1, 1).view(np.uint8).reshape(n, 8)
    info = EncodingInfo(
        fields=(
            PointField("x", 0, FieldType.FLOAT32, 0.001),
            PointField("y", 4, FieldType.FLOAT32, 0.001),
            PointField("z", 8, FieldType.FLOAT32, 0.001),
            PointField("ring", step, FieldType.UINT16),
            PointField("intensity", step + 2, FieldType.FLOAT32, 0.01),
            PointField("counter", step + 6, FieldType.INT64),
        ),
        width=n, height=1, point_step=step + 14,
        encoding_opt=EncodingOptions.LOSSY, compression_opt=CompressionOption.NONE,
        version=4,
    )
    args = _compare_encode(info, rows2)
    _compare_decode(info, *args)


def test_f64_lossy_device_roundtrip():
    """FLOAT64 lossy on device: software IEEE binary64 (ops/f64.py) must match
    the host path bit-for-bit (TPU's native emulated f64 is 1-ulp inexact)."""
    n = CHUNK + 33
    rng = np.random.default_rng(21)
    t = 1.7e9 + np.cumsum(rng.exponential(1e-4, n))
    t[rng.random(n) < 0.02] = np.nan
    rows = np.ascontiguousarray(t).view(np.uint8).reshape(n, 8)
    info = EncodingInfo(
        fields=(PointField("t", 0, FieldType.FLOAT64, 1e-6),),
        width=n, height=1, point_step=8,
        encoding_opt=EncodingOptions.LOSSY, compression_opt=CompressionOption.NONE,
    )
    args = _compare_encode(info, rows)
    _compare_decode(info, *args)


def test_copy_and_xor_device_encode():
    """COPY (uint8) and XOR (lossless f32) units on the device encoder."""
    n = CHUNK + 10
    rng = np.random.default_rng(8)
    rows, _, step = _xyz_rows(n, seed=13, extra=rng.integers(0, 256, n, dtype=np.uint8))
    info = EncodingInfo(
        fields=(
            PointField("x", 0, FieldType.FLOAT32, None),
            PointField("y", 4, FieldType.FLOAT32, None),
            PointField("z", 8, FieldType.FLOAT32, None),
            PointField("flag", 12, FieldType.UINT8),
        ),
        width=n, height=1, point_step=step,
        encoding_opt=EncodingOptions.LOSSLESS, compression_opt=CompressionOption.NONE,
    )
    _compare_encode(info, rows)  # decode of mixed fixed-size: host path


def test_noncanonical_zero_varint_is_nan_marker_parity():
    """biased == 0 is the NaN marker regardless of token length (the +1 bias
    reserves it; reference decodeVarint checks u == 0): a non-canonical
    2-byte zero (0x80 0x00) must decode identically on the numpy oracle and
    the device path — NaN output in a float lane."""
    import numpy as np

    from cloudini_tpu.core.plan import build_plan
    from cloudini_tpu.core.types import (
        CompressionOption,
        EncodingInfo,
        EncodingOptions,
        FieldType,
        PointField,
    )
    from cloudini_tpu.ops.device_codec import DeviceStage1Decoder
    from cloudini_tpu.ref import stage1 as np_stage1

    info = EncodingInfo(
        fields=(
            PointField("x", 0, FieldType.FLOAT32, 0.001),
            PointField("y", 4, FieldType.FLOAT32, 0.001),
            PointField("z", 8, FieldType.FLOAT32, 0.001),
        ),
        width=2, height=1, point_step=12,
        encoding_opt=EncodingOptions.LOSSY, compression_opt=CompressionOption.NONE,
    )
    plan = build_plan(info, for_decode=True)
    # point 0: x=biased2 (value 0 after -1... canonical), y=NONCANONICAL zero,
    # z=canonical 1-byte; point 1: three 1-byte tokens
    stream = bytes([0x02, 0x80, 0x00, 0x02, 0x02, 0x02, 0x02])
    data = np.frombuffer(stream, np.uint8)
    out_np = np.zeros((2, 12), np.uint8)
    consumed = np_stage1.decode_chunk(plan, data, out_np, 2)
    assert consumed == len(stream)

    n = 16
    dec = DeviceStage1Decoder(plan, 12, chunk_points=n, max_bytes=64)
    payloads = np.zeros((1, 64), np.uint8)
    payloads[0, : len(stream)] = data
    rows, cons = dec.decode_chunks(
        payloads, np.array([len(stream)], np.int32), np.array([2], np.int32)
    )
    rows = np.asarray(rows)
    assert int(np.asarray(cons)[0]) == len(stream)
    assert np.array_equal(rows[0, :2], out_np), (
        rows[0, :2].view(np.float32), out_np.view(np.float32)
    )
    # the y lane of point 0 must be NaN on both
    assert np.isnan(out_np[0].view(np.float32)[1])


def test_noncanonical_zero_varint_native_parity():
    """The native sequential decoder must agree: biased==0 at any length is
    the NaN marker (runtime.cpp get_varint), not an error."""
    import numpy as np

    from cloudini_tpu import native
    from cloudini_tpu.core.plan import build_plan
    from cloudini_tpu.core.types import (
        CompressionOption,
        EncodingInfo,
        EncodingOptions,
        FieldType,
        PointField,
    )
    from cloudini_tpu.ref import stage1 as np_stage1

    if not native.available():
        import pytest

        pytest.skip("native runtime unavailable")
    info = EncodingInfo(
        fields=(
            PointField("x", 0, FieldType.FLOAT32, 0.001),
            PointField("y", 4, FieldType.FLOAT32, 0.001),
            PointField("z", 8, FieldType.FLOAT32, 0.001),
        ),
        width=2, height=1, point_step=12,
        encoding_opt=EncodingOptions.LOSSY, compression_opt=CompressionOption.NONE,
    )
    plan = build_plan(info, for_decode=True)
    stream = bytes([0x02, 0x80, 0x00, 0x02, 0x02, 0x02, 0x02])
    data = np.frombuffer(stream, np.uint8)
    out_np = np.zeros((2, 12), np.uint8)
    import os

    prev = os.environ.get("CLOUDINI_TPU_NO_NATIVE")
    os.environ["CLOUDINI_TPU_NO_NATIVE"] = "1"
    try:
        np_stage1.decode_chunk(plan, data, out_np, 2)  # pure numpy oracle
    finally:
        if prev is None:
            os.environ.pop("CLOUDINI_TPU_NO_NATIVE")
        else:
            os.environ["CLOUDINI_TPU_NO_NATIVE"] = prev
    out_nat = np.zeros((2, 12), np.uint8)
    consumed = native.decode_chunk(plan, data, out_nat, 2)
    assert consumed == len(stream)
    assert np.array_equal(out_nat, out_np)


def test_encode_many_restores_encoder_state():
    """encode_many's fallback loop must not leave the encoder's header/info
    pointing at the last cloud's width (would corrupt later encode() calls)."""
    import numpy as np

    from cloudini_tpu.codec.pipeline import PointcloudDecoder, PointcloudEncoder
    from cloudini_tpu.core.types import (
        CompressionOption,
        EncodingInfo,
        EncodingOptions,
        FieldType,
        PointField,
    )

    rng = np.random.default_rng(0)
    info = EncodingInfo(
        fields=(
            PointField("x", 0, FieldType.FLOAT32, 0.001),
            PointField("y", 4, FieldType.FLOAT32, 0.001),
            PointField("z", 8, FieldType.FLOAT32, 0.001),
        ),
        width=500, height=1, point_step=12,
        encoding_opt=EncodingOptions.LOSSY, compression_opt=CompressionOption.NONE,
    )
    enc = PointcloudEncoder(info, backend="host")
    clouds = [
        np.cumsum(rng.normal(0, 0.05, (n, 3)), 0).astype(np.float32).tobytes()
        for n in (200, 300)
    ]
    streams = enc.encode_many(clouds)
    assert len(streams) == 2
    # the encoder still encodes ITS OWN width correctly afterwards
    rows = np.cumsum(rng.normal(0, 0.05, (500, 3)), 0).astype(np.float32)
    stream = enc.encode(rows.tobytes())
    dinfo, decoded = PointcloudDecoder(backend="host").decode_full(stream)
    assert dinfo.num_points == 500 and decoded.shape[0] == 500
    import pytest

    with pytest.raises(ValueError, match="infos"):
        enc.encode_many(clouds, infos=[info])
