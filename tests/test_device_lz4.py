"""Device LZ4 block compressor (ops/lz4.py): every stream must decode with
liblz4's LZ4_decompress_safe — the same library the reference links
(codec_common.cpp:260) — and the fused-pipeline stream must round-trip through
the framework decoder and the reference C++."""

import ctypes

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
from cloudini_tpu.codec import stage2
from cloudini_tpu.ops.lz4 import compress_bound, lz4_compress_chunks

CHUNK = 1024


def _ref_compress(b: bytes) -> bytes:
    lib = stage2._lz4()
    bound = stage2.lz4_compress_bound(len(b))
    dst = ctypes.create_string_buffer(bound)
    n = lib.LZ4_compress_default(b, dst, len(b), bound)
    assert n > 0
    return dst.raw[:n]


def _device_lz4(arr: np.ndarray) -> bytes:
    import jax.numpy as jnp

    n = len(arr)
    b = max(n, 16)
    data = np.zeros((1, b), np.uint8)
    data[0, :n] = arr
    out, osz = lz4_compress_chunks(
        jnp.asarray(data), jnp.asarray(np.array([n], np.int32)), compress_bound(b)
    )
    return bytes(np.asarray(out)[0, : int(np.asarray(osz)[0])])


def _lz4_roundtrip(blob: bytes, n: int) -> bytes:
    return stage2.decompress_chunk(CompressionOption.LZ4, blob, max(n, 1))


def _corpus():
    rng = np.random.default_rng(0)
    return {
        "zeros": np.zeros(50000, np.uint8),
        "random": rng.integers(0, 256, 50000, dtype=np.uint8),
        "period16": np.tile(rng.integers(0, 256, 16, dtype=np.uint8), 3000),
        "period26": np.tile(rng.integers(0, 256, 26, dtype=np.uint8), 2000),
        "runs_and_noise": np.concatenate(
            [np.zeros(997, np.uint8), rng.integers(0, 256, 1003, dtype=np.uint8)] * 10
        ),
        "tiny1": np.array([7], np.uint8),
        "tiny12": np.arange(12, dtype=np.uint8),
        "tiny13": np.zeros(13, np.uint8),
        "boundary_run": np.concatenate(
            [rng.integers(0, 256, 100, dtype=np.uint8), np.zeros(17, np.uint8)]
        ),
    }


@pytest.mark.parametrize("name", sorted(_corpus()))
def test_liblz4_roundtrip(name):
    arr = _corpus()[name]
    blob = _device_lz4(arr)
    assert _lz4_roundtrip(blob, len(arr)) == arr.tobytes()


@pytest.mark.parametrize("name", ["zeros", "period16", "period26", "tiny13"])
def test_ratio_matches_liblz4_on_periodic(name):
    """On runs and short periods (the structure stage-1 streams have), the
    fixed-distance matcher must not lose to liblz4's hash chains."""
    arr = _corpus()[name]
    assert len(_device_lz4(arr)) <= len(_ref_compress(arr.tobytes()))


def test_multi_chunk_batch():
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    c, b = 4, 8192
    data = rng.integers(0, 4, (c, b), dtype=np.uint8)  # compressible
    sizes = np.array([b, 100, 13, 1], np.int32)
    out, osz = lz4_compress_chunks(jnp.asarray(data), jnp.asarray(sizes), compress_bound(b))
    out, osz = np.asarray(out), np.asarray(osz)
    for i in range(c):
        got = _lz4_roundtrip(bytes(out[i, : osz[i]]), int(sizes[i]))
        assert got == data[i, : sizes[i]].tobytes()


def _xyzi_info(compression=CompressionOption.LZ4):
    return EncodingInfo(
        fields=(
            PointField("x", 0, FieldType.FLOAT32, 0.001),
            PointField("y", 4, FieldType.FLOAT32, 0.001),
            PointField("z", 8, FieldType.FLOAT32, 0.001),
            PointField("intensity", 12, FieldType.FLOAT32, 0.01),
        ),
        width=0, height=1, point_step=16,
        encoding_opt=EncodingOptions.LOSSY, compression_opt=compression,
    )


def _rows(n, seed=0):
    rng = np.random.default_rng(seed)
    pts = np.cumsum(rng.normal(0, 0.05, (n, 4)), axis=0).astype(np.float32)
    return np.ascontiguousarray(pts).view(np.uint8).reshape(n, 16)


def test_fused_pipeline_roundtrip():
    """device_stage2=True: stage-1 + LZ4 in one device program; the stream
    decodes with the framework decoder (host liblz4 stage 2). Uses the wire
    format's fixed 32Ki chunking (the decoder derives points per chunk)."""
    n = 32768 + 177  # two chunks, ragged tail
    rows = _rows(n, seed=3)
    info = _xyzi_info().with_(width=n)
    enc = PointcloudEncoder(info, device_stage2=True)
    assert enc.backend == "device" and enc._device_stage2
    stream = enc.encode(rows, write_header=False)
    decoded = PointcloudDecoder(backend="host").decode(info, stream)
    host_stream = PointcloudEncoder(info, backend="host").encode(
        rows, write_header=False
    )
    want = PointcloudDecoder(backend="host").decode(info, host_stream)
    assert np.array_equal(decoded, want)
    # and it must not exceed the preallocation bound semantics (smaller than raw)
    assert len(stream) < n * 16


def test_fused_pipeline_v5_adaptive():
    n = 4000
    rows4 = _rows(n, seed=7)
    ring = (np.arange(n) % 16).astype(np.uint16)
    rows = np.zeros((n, 18), np.uint8)
    rows[:, :16] = rows4
    rows[:, 16:18] = ring.view(np.uint8).reshape(n, 2)
    info = EncodingInfo(
        fields=_xyzi_info().fields + (PointField("ring", 16, FieldType.UINT16),),
        width=n, height=1, point_step=18,
        encoding_opt=EncodingOptions.LOSSY, compression_opt=CompressionOption.LZ4,
        version=5,
    )
    enc = PointcloudEncoder(info, device_stage2=True)
    stream = enc.encode(rows, write_header=False)
    decoded = PointcloudDecoder(backend="host").decode(info, stream)
    host_stream = PointcloudEncoder(info, backend="host").encode(
        rows, write_header=False
    )
    want = PointcloudDecoder(backend="host").decode(info, host_stream)
    assert np.array_equal(decoded, want)


def test_fused_stream_decodes_via_reference(oracle, tmp_path):
    """The strongest gate: a device-LZ4 stream consumed by the reference C++."""
    n = 20000
    rows = _rows(n, seed=11)
    info = _xyzi_info().with_(width=n)
    enc = PointcloudEncoder(info, device_stage2=True)
    stream = enc.encode(rows)  # with header
    out = oracle.decode(stream)
    want = PointcloudDecoder(backend="host").decode_full(stream)[1]
    assert out == want.tobytes()


def test_device_stage2_requires_lz4_or_zstd():
    with pytest.raises(ValueError):
        PointcloudEncoder(_xyzi_info(CompressionOption.NONE), device_stage2=True)


def test_block_beyond_2mb():
    """Regression: orbit depth must scale with the block size — a fixed cap
    lost all matches past 2^21 greedy-parse steps."""
    rng = np.random.default_rng(6)
    n = (1 << 21) + 200000
    arr = np.concatenate(
        [rng.integers(0, 256, n - 150000, dtype=np.uint8), np.zeros(150000, np.uint8)]
    )
    blob = _device_lz4(arr)
    assert _lz4_roundtrip(blob, n) == arr.tobytes()
    assert len(blob) < n  # the zero tail must compress
