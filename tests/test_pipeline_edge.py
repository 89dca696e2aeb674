"""Pipeline edge cases found by adversarial review.

Each test is a regression lock for a confirmed failure:
  * stage-1 EXPANSION under LZ4/ZSTD (random data -> 5-byte varints) used to
    overflow the decompression bound n_total*point_step
  * all-adaptive-int plans (zero regular units) used to crash both backends
  * non-default chunk_points round trip (decoder must be told the size)
  * INT64_MIN delta wraps to the single NaN-marker byte 0x00 on BOTH backends
    (the reference's uint64 wraparound, encoding_utils.hpp:55-67)
"""

import pathlib

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

XYZ = (
    PointField("x", 0, FieldType.FLOAT32, 0.001),
    PointField("y", 4, FieldType.FLOAT32, 0.001),
    PointField("z", 8, FieldType.FLOAT32, 0.001),
)


def _info(fields, n, step, compression, version=5, encoding=EncodingOptions.LOSSY):
    return EncodingInfo(
        fields=tuple(fields), width=n, height=1, point_step=step,
        encoding_opt=encoding, compression_opt=compression, version=version,
    )


@pytest.mark.parametrize("comp", [CompressionOption.LZ4, CompressionOption.ZSTD])
def test_stage1_expansion_decodes(comp):
    """Uniform-random xyz makes stage 1 EXPAND (~15 B/point > 12 B raw)."""
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1e6, 1e6, (1000, 3)).astype(np.float32)
    rows = np.ascontiguousarray(pts).view(np.uint8).reshape(-1, 12)
    stage1 = PointcloudEncoder(
        _info(XYZ, 1000, 12, CompressionOption.NONE), backend="host"
    ).encode(rows, write_header=False)
    assert len(stage1) > rows.nbytes  # stage 1 really did expand
    info = _info(XYZ, 1000, 12, comp)
    data = PointcloudEncoder(info, backend="host").encode(rows, write_header=False)
    out = PointcloudDecoder(backend="host").decode(info, data)
    err = np.abs(out.view(np.float32).reshape(-1, 3) - pts).max()
    # at |x|~1e6 the quantized value ~1e9 exceeds float32's 24-bit mantissa,
    # so the dominant error is the f32 ULP (64 quant units = 0.064), exactly
    # as in the reference's float math — not the resolution
    assert err <= 0.1


@pytest.mark.parametrize("backend", ["host", "device"])
def test_all_adaptive_plan(backend):
    """V5 plan whose every field is an adaptive int: empty regular stream."""
    fields = (
        PointField("ring", 0, FieldType.UINT16, None),
        PointField("count", 2, FieldType.INT32, None),
    )
    info = _info(fields, 500, 6, CompressionOption.NONE)
    rows = np.random.default_rng(1).integers(0, 16, (500, 6), dtype=np.uint8)
    data = PointcloudEncoder(info, backend=backend).encode(rows, write_header=False)
    out = PointcloudDecoder(backend="auto").decode(info, data)
    assert np.array_equal(out, rows)


def test_all_adaptive_host_device_identical():
    fields = (PointField("ring", 0, FieldType.UINT16, None),)
    info = _info(fields, 300, 2, CompressionOption.NONE)
    rows = np.random.default_rng(2).integers(0, 8, (300, 2), dtype=np.uint8)
    host = PointcloudEncoder(info, backend="host").encode(rows, write_header=False)
    dev = PointcloudEncoder(info, backend="device").encode(rows, write_header=False)
    assert host == dev


def test_custom_chunk_points_round_trip():
    rng = np.random.default_rng(3)
    pts = np.cumsum(rng.normal(0, 0.05, (20000, 3)), axis=0).astype(np.float32)
    rows = np.ascontiguousarray(pts).view(np.uint8).reshape(-1, 12)
    info = _info(XYZ, 20000, 12, CompressionOption.NONE)
    data = PointcloudEncoder(info, backend="host", chunk_points=8192).encode(
        rows, write_header=False
    )
    out = PointcloudDecoder(backend="host", chunk_points=8192).decode(info, data)
    err = np.abs(out.view(np.float32).reshape(-1, 3) - pts).max()
    assert err <= 0.001 * 1.0001


def test_nan_marker_in_int_lane_rejected_on_device():
    """0x00 tokens are only legal in lossy-float lanes; the host decoder
    raises for integer lanes and the device must flag the chunk too."""
    import struct

    fields = (
        PointField("x", 0, FieldType.FLOAT32, 0.001),
        PointField("y", 4, FieldType.FLOAT32, 0.001),
        PointField("z", 8, FieldType.FLOAT32, 0.001),
        PointField("seq", 12, FieldType.UINT32, None),
    )
    info = _info(fields, 2, 16, CompressionOption.NONE, version=4)
    rows = np.zeros((2, 16), np.uint8)
    data = PointcloudEncoder(info, backend="host").encode(rows, write_header=False)
    payload = bytearray(data[4:])
    # point layout: x y z seq tokens; zero values -> each token is 1 byte.
    # corrupt point 0's seq token (4th byte) into the NaN marker
    assert payload[3] != 0
    payload[3] = 0
    bad = struct.pack("<I", len(payload)) + bytes(payload)
    with pytest.raises(ValueError):
        PointcloudDecoder(backend="host").decode(info, bad)
    with pytest.raises(ValueError):
        PointcloudDecoder(backend="device").decode(info, bad)


def test_int64_min_delta_host_device_identical():
    """+inf quantizes to an extreme int64; host and device must emit the same
    wire bytes (the old device path patched the wrap to a 10-byte varint)."""
    fields = (PointField("x", 0, FieldType.FLOAT32, 0.001),)
    info = _info(fields, 4, 4, CompressionOption.NONE, version=4)
    x = np.array([np.inf, 1.0, 1.0, 1.0], dtype=np.float32)
    rows = x.view(np.uint8).reshape(-1, 4)
    host = PointcloudEncoder(info, backend="host").encode(rows, write_header=False)
    dev = PointcloudEncoder(info, backend="device").encode(rows, write_header=False)
    assert host == dev


def test_encode_many_v5_groups_by_committed_modes():
    """encode_many on a V5 adaptive plan batches clouds by their per-cloud
    committed modes; streams must equal per-cloud encode() byte-for-byte even
    when clouds in one call commit different modes."""
    import numpy as np

    from cloudini_tpu.codec.pipeline import PointcloudEncoder
    from cloudini_tpu.core.types import (
        CompressionOption,
        EncodingInfo,
        EncodingOptions,
        FieldType,
        PointField,
    )

    rng = np.random.default_rng(7)
    fields = (
        PointField("x", 0, FieldType.FLOAT32, 0.001),
        PointField("ring", 4, FieldType.UINT32, None),
    )
    info = EncodingInfo(
        fields=fields, width=0, height=1, point_step=8,
        encoding_opt=EncodingOptions.LOSSY, compression_opt=CompressionOption.NONE,
        version=5,
    )

    def cloud(n, mode):
        x = np.cumsum(rng.normal(0, 0.05, n)).astype(np.float32)
        if mode == "rle":
            ring = np.repeat(np.arange(n // 50 + 1, dtype=np.uint32), 50)[:n]
        else:
            ring = rng.integers(0, 2**20, n, dtype=np.uint32)
        rows = np.zeros((n, 8), np.uint8)
        rows[:, :4] = x.view(np.uint8).reshape(n, 4)
        rows[:, 4:] = ring.view(np.uint8).reshape(n, 4)
        return rows

    clouds = [cloud(700, "rle"), cloud(650, "rand"), cloud(800, "rle")]
    enc = PointcloudEncoder(info, backend="device")
    batched = enc.encode_many([c.tobytes() for c in clouds])
    for c, stream in zip(clouds, batched):
        solo = PointcloudEncoder(
            info.with_(width=c.shape[0]), backend="device"
        ).encode(c.tobytes())
        assert stream == solo


def test_review_edge_cases():
    """Regression lock for review findings: empty-cloud structured decode,
    empty cloud inside a V5 encode_many batch, truncated PCD header, and
    big-endian CDR encapsulation honored on write."""
    import struct

    import numpy as np
    import pytest

    from cloudini_tpu.codec.pipeline import PointcloudEncoder
    from cloudini_tpu.core.types import (
        CompressionOption,
        EncodingInfo,
        EncodingOptions,
        FieldType,
        PointField,
    )
    from cloudini_tpu.io.decoder_api import CloudiniDecoder

    # empty cloud -> structured array decode must not crash
    info = EncodingInfo(
        fields=(PointField("x", 0, FieldType.FLOAT32, 0.001),),
        width=0, height=1, point_step=4,
        encoding_opt=EncodingOptions.LOSSY, compression_opt=CompressionOption.NONE,
    )
    stream = PointcloudEncoder(info, backend="host").encode(b"")
    dinfo, cloud = CloudiniDecoder(backend="host").decode_data(stream)
    assert cloud.shape == (0,) and cloud.dtype.names == ("x",)

    # V5 batch containing an empty cloud: header-only stream, no probe crash
    v5 = EncodingInfo(
        fields=(
            PointField("x", 0, FieldType.FLOAT32, 0.001),
            PointField("ring", 4, FieldType.UINT16, None),
        ),
        width=0, height=1, point_step=6,
        encoding_opt=EncodingOptions.LOSSY, compression_opt=CompressionOption.NONE,
        version=5,
    )
    rng = np.random.default_rng(0)
    full = np.zeros((300, 6), np.uint8)
    full[:, :4] = rng.normal(0, 1, 300).astype(np.float32).view(np.uint8).reshape(300, 4)
    enc = PointcloudEncoder(v5, backend="device")
    streams = enc.encode_many([full.tobytes(), b"", full.tobytes()])
    assert streams[1] == PointcloudEncoder(
        v5.with_(width=0), backend="host"
    ).encode(b"")

    # truncated PCD header raises instead of looping forever
    import tempfile

    from cloudini_tpu.io.pcd import read_pcd

    with tempfile.TemporaryDirectory() as d:
        path = str(pathlib.Path(d) / "trunc.pcd")
        pathlib.Path(path).write_bytes(b"VERSION 0.7\nFIELDS x")  # no DATA line
        with pytest.raises(ValueError, match="DATA"):
            read_pcd(path)

    # big-endian encapsulation flag -> big-endian primitives on write
    from cloudini_tpu.io.cdr import BIG, CdrEncoder, CdrHeader

    enc_be = CdrEncoder(CdrHeader(endianness=BIG))
    enc_be.u32(0x01020304)
    assert enc_be.tobytes()[4:8] == struct.pack(">I", 0x01020304)


def test_pcd_ascii_roundtrip():
    """ascii PCD write -> read -> encode/decode round trip (the reference
    reads ascii PCDs through PCL, pcl_conversion.cpp; our reader/writer must
    preserve values exactly: %.9g/%.17g round-trip binary32/64)."""
    import pathlib
    import tempfile

    from cloudini_tpu.io.pcd import read_pcd, write_pcd

    n = 500
    rng = np.random.default_rng(11)
    xyz = rng.normal(0, 10, (n, 3)).astype(np.float32)
    inten = rng.uniform(0, 255, n).astype(np.float32)
    ring = (np.arange(n) % 16).astype(np.uint16)
    ts = (1.7e9 + np.cumsum(rng.uniform(0, 1e-4, n))).astype(np.float64)
    step = 12 + 4 + 2 + 8
    rows = np.zeros((n, step), np.uint8)
    rows[:, 0:12] = xyz.view(np.uint8).reshape(n, 12)
    rows[:, 12:16] = inten.reshape(-1, 1).view(np.uint8)
    rows[:, 16:18] = ring.reshape(-1, 1).view(np.uint8)
    rows[:, 18:26] = ts.reshape(-1, 1).view(np.uint8)
    info = EncodingInfo(
        fields=(
            PointField("x", 0, FieldType.FLOAT32),
            PointField("y", 4, FieldType.FLOAT32),
            PointField("z", 8, FieldType.FLOAT32),
            PointField("intensity", 12, FieldType.FLOAT32),
            PointField("ring", 16, FieldType.UINT16),
            PointField("t", 18, FieldType.FLOAT64),
        ),
        width=n, height=1, point_step=step,
    )
    with tempfile.TemporaryDirectory() as d:
        path = str(pathlib.Path(d) / "cloud.pcd")
        write_pcd(path, info, rows, binary=False)
        schema2, rows2 = read_pcd(path)
    assert [f.name for f in schema2.fields] == [f.name for f in info.fields]
    assert [f.type for f in schema2.fields] == [f.type for f in info.fields]
    assert rows2.tobytes() == rows.tobytes()

    # and through the codec: lossy floats + v5-adaptive ring + gorilla ts
    enc_info = schema2.with_(
        fields=tuple(
            PointField(f.name, f.offset, f.type,
                       0.001 if f.type == FieldType.FLOAT32 else None)
            for f in schema2.fields
        ),
        encoding_opt=EncodingOptions.LOSSY,
        compression_opt=CompressionOption.NONE,
        version=5,
    )
    stream = PointcloudEncoder(enc_info, backend="host").encode(rows2.tobytes())
    out_info, out = PointcloudDecoder().decode_full(stream)
    got_xyz = out[:, 0:12].copy().view(np.float32).reshape(n, 3)
    assert np.allclose(got_xyz, xyz, atol=0.001 * 1.0001)
    assert out[:, 16:18].tobytes() == ring.tobytes()
    assert out[:, 18:26].tobytes() == ts.tobytes()  # gorilla lossless


def test_pcd_binary_compressed_roundtrip():
    """DATA binary_compressed: PCL's SOA + LZF layout. The LZF decoder is
    locked by a hand-computed liblzf vector; files round-trip on the real
    fixture and on a padded synthetic schema."""
    import pathlib
    import tempfile

    import numpy as np

    from cloudini_tpu.io.pcd import (
        _lzf_compress,
        _lzf_decompress,
        read_pcd,
        write_pcd,
    )

    # liblzf: 10 x 'a' -> literal('a') + saturated back-reference
    vec = bytes([0x00, 0x61, 0xE0, 0x00, 0x00])
    assert _lzf_decompress(vec, 10) == b"a" * 10
    assert _lzf_compress(b"a" * 10) == vec

    src = pathlib.Path("/root/reference/cloudini_lib/samples/lidar.pcd")
    if not src.exists():
        import pytest

        pytest.skip("fixture unavailable")
    info, rows = read_pcd(str(src))
    with tempfile.TemporaryDirectory() as d:
        p = str(pathlib.Path(d) / "c.pcd")
        write_pcd(p, info, rows, binary=True, compressed=True)
        assert pathlib.Path(p).stat().st_size < rows.nbytes  # SOA+LZF wins
        info2, rows2 = read_pcd(p)
        assert np.array_equal(rows, rows2)
        assert [f.name for f in info2.fields] == [f.name for f in info.fields]
