"""Adversarial/malformed-input tests — mirrors the reference's hardening
(SURVEY §4): truncated streams, chunk-count mismatches, V5 section attacks."""

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


def _xyz_info(n, compression=CompressionOption.NONE):
    return EncodingInfo(
        fields=(
            PointField("x", 0, FieldType.FLOAT32, 0.001),
            PointField("y", 4, FieldType.FLOAT32, 0.001),
            PointField("z", 8, FieldType.FLOAT32, 0.001),
        ),
        width=n, height=1, point_step=12,
        encoding_opt=EncodingOptions.LOSSY, compression_opt=compression,
    )


def _stream(n=1000, compression=CompressionOption.NONE, seed=0):
    rng = np.random.default_rng(seed)
    data = np.cumsum(rng.normal(0, 0.05, (n, 3)), axis=0).astype(np.float32)
    info = _xyz_info(n, compression)
    payload = PointcloudEncoder(info).encode(data.tobytes(), write_header=False)
    return info, payload


def test_missing_chunks_for_declared_points():
    info, payload = _stream(1000)
    too_many = info.with_(width=5000)  # declares more points than encoded
    with pytest.raises(ValueError):
        PointcloudDecoder().decode(too_many, payload)


def test_extra_chunks_beyond_declared_points():
    info, payload = _stream(40000)  # two chunks
    too_few = info.with_(width=10)
    with pytest.raises(ValueError):
        PointcloudDecoder().decode(too_few, payload)


def test_chunk_size_exceeding_buffer():
    info, payload = _stream(1000)
    corrupt = bytearray(payload)
    corrupt[0:4] = (2**31).to_bytes(4, "little")
    with pytest.raises(ValueError):
        PointcloudDecoder().decode(info, bytes(corrupt))


def test_payload_with_magic_rejected():
    info, payload = _stream(10)
    with pytest.raises(ValueError, match="header"):
        PointcloudDecoder().decode(info, b"CLOUDINI_V05" + payload)


def test_v5_unknown_mode_byte():
    n = 500
    rng = np.random.default_rng(1)
    ring = (np.arange(n) % 8).astype(np.uint16)
    rows = np.zeros((n, 14), dtype=np.uint8)
    xyz = np.cumsum(rng.normal(0, 0.05, (n, 3)), axis=0).astype(np.float32)
    rows[:, :12] = xyz.view(np.uint8).reshape(n, 12)
    rows[:, 12:] = ring.reshape(-1, 1).view(np.uint8).reshape(n, 2)
    info = EncodingInfo(
        fields=(
            PointField("x", 0, FieldType.FLOAT32, 0.001),
            PointField("y", 4, FieldType.FLOAT32, 0.001),
            PointField("z", 8, FieldType.FLOAT32, 0.001),
            PointField("ring", 12, FieldType.UINT16),
        ),
        width=n, height=1, point_step=14,
        encoding_opt=EncodingOptions.LOSSY, compression_opt=CompressionOption.NONE,
    )
    payload = bytearray(PointcloudEncoder(info).encode(rows.tobytes(), write_header=False))
    # the adaptive section's mode byte is the last section; stomp it to 0xEE.
    # find it by decoding once and corrupting the byte at the section start.
    from cloudini_tpu.core.plan import build_plan
    from cloudini_tpu.ref import stage1 as np_stage1

    plan = build_plan(info, for_decode=True)
    chunk = np.frombuffer(bytes(payload[4:]), np.uint8)
    out = np.zeros((n, 14), np.uint8)
    consumed = np_stage1.decode_chunk(plan, chunk, out, n)
    payload[4 + consumed] = 0xEE
    with pytest.raises(ValueError, match="mode byte"):
        PointcloudDecoder().decode(info, bytes(payload))


def test_v5_rle_run_overflow():
    """RLE runs must not exceed the declared point count."""
    n = 500
    vals = np.full(n, 7, dtype=np.uint16)
    rows = np.zeros((n, 14), dtype=np.uint8)
    xyz = np.ones((n, 3), np.float32)
    rows[:, :12] = xyz.view(np.uint8).reshape(n, 12)
    rows[:, 12:] = vals.reshape(-1, 1).view(np.uint8).reshape(n, 2)
    info = EncodingInfo(
        fields=(
            PointField("x", 0, FieldType.FLOAT32, 0.001),
            PointField("y", 4, FieldType.FLOAT32, 0.001),
            PointField("z", 8, FieldType.FLOAT32, 0.001),
            PointField("ring", 12, FieldType.UINT16),
        ),
        width=n, height=1, point_step=14,
        encoding_opt=EncodingOptions.LOSSY, compression_opt=CompressionOption.NONE,
    )
    payload = bytearray(PointcloudEncoder(info).encode(rows.tobytes(), write_header=False))
    # corrupt the RLE run length varint (last bytes of the stream)
    payload[-1] = 0xFF
    payload.append(0x10)  # run length now huge
    # fix the chunk size prefix
    payload[0:4] = (len(payload) - 4).to_bytes(4, "little")
    with pytest.raises(ValueError):
        PointcloudDecoder().decode(info, bytes(payload))


def test_truncated_compressed_chunk():
    info, payload = _stream(1000, CompressionOption.ZSTD)
    with pytest.raises(Exception):
        PointcloudDecoder().decode(info, payload[: len(payload) // 2])


def test_decoder_width_times_height_not_trusted():
    """Decode derives per-chunk point counts from min(remaining, chunk);
    a huge declared width with a tiny payload must raise, not allocate-run."""
    info, payload = _stream(100)
    huge = info.with_(width=2**24, height=1)
    with pytest.raises(ValueError):
        PointcloudDecoder().decode(huge, payload)


def test_gorilla_corrupt_window_rejected():
    """A window-reuse token before any window, or a new window whose
    leading+meaningful exceeds the type width, must raise — not shift by a
    negative count (numpy oracle) or hit UB (native runtime)."""
    from cloudini_tpu.ref.gorilla import decode_column

    import struct

    first8 = struct.pack("<d", 1.5)
    # case 1: flag=1, control=0 right after the first value (no window yet)
    s1 = first8 + bytes([0b01])
    with pytest.raises(ValueError, match="Gorilla"):
        decode_column(np.frombuffer(s1, np.uint8), 2, 64)
    # case 2: new window with stored_lead=31, meaningful=64 -> 95 > 64
    head = 0b11 | (31 << 2) | (63 << 7)
    s2 = first8 + struct.pack("<H", head) + bytes(10)
    with pytest.raises(ValueError, match="Gorilla"):
        decode_column(np.frombuffer(s2, np.uint8), 2, 64)

    # native runtime path (skipped when the toolchain is unavailable)
    from cloudini_tpu import native

    if native.available():
        from cloudini_tpu.core.plan import build_plan

        info = EncodingInfo(
            fields=(PointField("t", 0, FieldType.FLOAT64, None),),
            width=2, height=1, point_step=8,
            encoding_opt=EncodingOptions.LOSSLESS,
            compression_opt=CompressionOption.NONE,
        )
        plan = build_plan(info, for_decode=True)
        out = np.zeros((2, 8), np.uint8)
        for s in (s1, s2):
            with pytest.raises(ValueError, match="Gorilla"):
                native.decode_chunk(plan, np.frombuffer(s, np.uint8), out, 2)
