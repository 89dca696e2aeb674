"""Decode-but-skip-store / layout remap tests (PCL conversion equivalent)."""

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
from cloudini_tpu.io.pcl import decode_into_layout, remap_decode_layout


def _stream(n=3000, seed=0, extra_gorilla=False):
    rng = np.random.default_rng(seed)
    xyz = (np.cumsum(rng.normal(0, 0.05, (n, 3)), axis=0)).astype(np.float32)
    intensity = rng.uniform(0, 100, n).astype(np.float32)
    step = 16 + (8 if extra_gorilla else 0)
    rows = np.zeros((n, step), dtype=np.uint8)
    rows[:, :12] = xyz.view(np.uint8).reshape(n, 12)
    rows[:, 12:16] = intensity.reshape(-1, 1).view(np.uint8).reshape(n, 4)
    fields = [
        PointField("x", 0, FieldType.FLOAT32, 0.001),
        PointField("y", 4, FieldType.FLOAT32, 0.001),
        PointField("z", 8, FieldType.FLOAT32, 0.001),
        PointField("intensity", 12, FieldType.FLOAT32, 0.1),
    ]
    if extra_gorilla:
        ts = (1.6e9 + np.cumsum(rng.uniform(0, 1e-3, n))).astype(np.float64)
        rows[:, 16:24] = ts.reshape(-1, 1).view(np.uint8).reshape(n, 8)
        fields.append(PointField("t", 16, FieldType.FLOAT64))
    info = EncodingInfo(
        fields=tuple(fields), width=n, height=1, point_step=step,
        encoding_opt=EncodingOptions.LOSSY, compression_opt=CompressionOption.ZSTD,
    )
    return info, rows, PointcloudEncoder(info).encode(rows.tobytes())


@pytest.mark.parametrize("extra_gorilla", [False, True])
def test_decode_subset_layout(extra_gorilla):
    """Target layout keeps only XYZ: intensity (and timestamp) decode-but-skip."""
    info, rows, stream = _stream(extra_gorilla=extra_gorilla)
    target = [
        PointField("x", 0, FieldType.FLOAT32),
        PointField("y", 4, FieldType.FLOAT32),
        PointField("z", 8, FieldType.FLOAT32),
    ]
    _, out = decode_into_layout(stream, target, 12)
    assert out.shape == (rows.shape[0], 12)
    a = np.ascontiguousarray(rows[:, :12]).view(np.float32)
    b = np.ascontiguousarray(out).view(np.float32)
    assert np.abs(a - b).max() <= 0.001 * 0.501


def test_decode_reordered_padded_layout():
    """Target reorders fields and pads the stride (PointXYZI-style 32B)."""
    info, rows, stream = _stream()
    target = [
        PointField("intensity", 16, FieldType.FLOAT32),
        PointField("x", 0, FieldType.FLOAT32),
        PointField("y", 4, FieldType.FLOAT32),
        PointField("z", 8, FieldType.FLOAT32),
    ]
    _, out = decode_into_layout(stream, target, 32)
    assert out.shape == (rows.shape[0], 32)
    src_i = np.ascontiguousarray(rows[:, 12:16]).view(np.float32).ravel()
    dst_i = np.ascontiguousarray(out[:, 16:20]).view(np.float32).ravel()
    assert np.abs(src_i - dst_i).max() <= 0.1 * 0.501
    # padding stays zero
    assert not out[:, 20:].any()


def test_type_mismatch_raises():
    info, rows, stream = _stream()
    target = [PointField("x", 0, FieldType.FLOAT64)]
    with pytest.raises(ValueError, match="type mismatch"):
        remap_decode_layout(info, target, 8)
