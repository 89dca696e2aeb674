"""max_compressed_size parity with the reference C++ MaxCompressedSize
(cloudini.cpp:249-292) and as an actual upper bound on encoded streams."""

import numpy as np
import pytest

from cloudini_tpu import max_compressed_size
from cloudini_tpu.codec.pipeline import PointcloudEncoder
from cloudini_tpu.core.types import (
    CompressionOption,
    EncodingInfo,
    EncodingOptions,
    FieldType,
    PointField,
)
from tests.oracle_utils import Oracle


def _infos():
    xyz = (
        PointField("x", 0, FieldType.FLOAT32, 0.001),
        PointField("y", 4, FieldType.FLOAT32, 0.001),
        PointField("z", 8, FieldType.FLOAT32, 0.001),
    )
    mixed = xyz + (
        PointField("intensity", 12, FieldType.FLOAT32, 0.1),
        PointField("ring", 16, FieldType.UINT16, None),
        PointField("t", 18, FieldType.FLOAT64, None),
    )
    for comp in (CompressionOption.NONE, CompressionOption.LZ4, CompressionOption.ZSTD):
        yield EncodingInfo(fields=xyz, width=0, height=1, point_step=12,
                           encoding_opt=EncodingOptions.LOSSY,
                           compression_opt=comp, version=4)
        yield EncodingInfo(fields=mixed, width=0, height=1, point_step=26,
                           encoding_opt=EncodingOptions.LOSSY,
                           compression_opt=comp, version=5)
    yield EncodingInfo(fields=xyz[:1] + (PointField("y", 4, FieldType.FLOAT32, None),),
                       width=0, height=1, point_step=8,
                       encoding_opt=EncodingOptions.LOSSLESS,
                       compression_opt=CompressionOption.NONE, version=4)


@pytest.mark.parametrize("pts", [0, 1, 4097, 32768, 70001])
def test_bound_matches_reference(oracle: Oracle, pts):
    for info in _infos():
        info = info.with_(width=pts)
        want = oracle.bound(info, pts, include_header=True)
        got = max_compressed_size(info, pts, include_header=True)
        assert got == want, (info.compression_opt, info.version, pts, got, want)
        want_nh = oracle.bound(info, pts, include_header=False)
        got_nh = max_compressed_size(info, pts, include_header=False)
        assert got_nh == want_nh


def test_bound_is_an_upper_bound():
    rng = np.random.default_rng(0)
    n = 5000
    # worst-case-ish data: uniform random -> near-max varints
    pts = rng.uniform(-1e6, 1e6, (n, 3)).astype(np.float32)
    rows = np.ascontiguousarray(pts).view(np.uint8).reshape(n, 12)
    for comp in (CompressionOption.NONE, CompressionOption.LZ4, CompressionOption.ZSTD):
        info = EncodingInfo(
            fields=(PointField("x", 0, FieldType.FLOAT32, 0.001),
                    PointField("y", 4, FieldType.FLOAT32, 0.001),
                    PointField("z", 8, FieldType.FLOAT32, 0.001)),
            width=n, height=1, point_step=12,
            encoding_opt=EncodingOptions.LOSSY, compression_opt=comp, version=5,
        )
        stream = PointcloudEncoder(info, backend="host").encode(rows)
        assert len(stream) <= max_compressed_size(info, n)
