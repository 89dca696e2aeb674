"""Device viz preprocessing (ops/viz.py) vs the numpy kernel of truth
(cloudini_tpu/preprocess.py), and the fused preprocess+encode program."""

import numpy as np
import pytest

from cloudini_tpu.codec.pipeline import PointcloudEncoder
from cloudini_tpu.core.plan import build_plan
from cloudini_tpu.core.types import (
    CompressionOption,
    EncodingInfo,
    EncodingOptions,
    FieldType,
    PointField,
)
from cloudini_tpu.preprocess import _detect_triple, apply_viz_lossy_preprocessing

CHUNK = 512
RES = 0.01


def _fields(step=16):
    return [
        PointField("x", 0, FieldType.FLOAT32, RES),
        PointField("y", 4, FieldType.FLOAT32, RES),
        PointField("z", 8, FieldType.FLOAT32, RES),
        PointField("intensity", 12, FieldType.FLOAT32, 0.1),
    ]


def _cloud(n, seed, nan_frac=0.03, dup_frac=0.4):
    """LiDAR-ish cloud with duplicates-within-voxel and NaN/inf points."""
    rng = np.random.default_rng(seed)
    # coarse grid so many points share a voxel at RES
    pts = (rng.integers(-50, 50, (n, 3)) * RES).astype(np.float32)
    pts += rng.uniform(-RES / 4, RES / 4, (n, 3)).astype(np.float32)
    bad = rng.random(n) < nan_frac
    pts[bad, 0] = np.nan
    inf = rng.random(n) < nan_frac
    pts[inf, 2] = np.inf
    inten = rng.uniform(0, 100, (n, 1)).astype(np.float32)
    rows = np.concatenate([pts, inten], axis=1).view(np.uint8).reshape(n, 16)
    return np.ascontiguousarray(rows)


@pytest.mark.parametrize("n", [1, 100, CHUNK, 3 * CHUNK + 77])
def test_viz_compact_matches_host(n):
    import jax.numpy as jnp

    from cloudini_tpu.ops.viz import viz_compact

    fields = _fields()
    rows = _cloud(n, seed=n)
    host_fields, host_rows = apply_viz_lossy_preprocessing(fields, rows)

    base, res = _detect_triple(fields)
    pad = -(-max(n, 1) // CHUNK) * CHUNK
    padded = np.zeros((pad, 16), np.uint8)
    padded[:n] = rows
    out, n_kept = viz_compact(jnp.asarray(padded), jnp.int32(n), base, res)
    out, n_kept = np.asarray(out), int(n_kept)
    assert n_kept == host_rows.shape[0]
    assert np.array_equal(out[:n_kept], host_rows)
    assert not out[n_kept:].any()


def test_fused_viz_encode_matches_host_pipeline():
    """Device preprocess+encode in one program == host preprocess + encode."""
    from cloudini_tpu.ops.device_codec import DeviceStage1Encoder

    import jax.numpy as jnp

    fields = _fields()
    n = 2 * CHUNK + 319
    rows = _cloud(n, seed=7)
    host_fields, host_rows = apply_viz_lossy_preprocessing(fields, rows)
    info = EncodingInfo(
        fields=tuple(host_fields), width=host_rows.shape[0], height=1, point_step=16,
        encoding_opt=EncodingOptions.LOSSY, compression_opt=CompressionOption.NONE,
        version=4,
    )
    host_stream = PointcloudEncoder(info, backend="host", chunk_points=CHUNK).encode(
        host_rows, write_header=False
    )

    plan = build_plan(info, for_decode=False)
    enc = DeviceStage1Encoder(plan, 16, chunk_points=CHUNK)
    base, res = _detect_triple(fields)
    fn = enc.viz_program(base, res)
    pad = -(-n // CHUNK) * CHUNK
    padded = np.zeros((pad, 16), np.uint8)
    padded[:n] = rows
    payloads, sizes, n_kept = fn(jnp.asarray(padded), jnp.int32(n))
    payloads, sizes, n_kept = np.asarray(payloads), np.asarray(sizes), int(n_kept)
    assert n_kept == host_rows.shape[0]

    import struct

    n_chunks = -(-n_kept // CHUNK)
    dev_stream = b"".join(
        struct.pack("<I", int(sizes[i])) + payloads[i, : sizes[i]].tobytes()
        for i in range(n_chunks)
    )
    assert dev_stream == host_stream


@pytest.mark.parametrize("version", [4, 5])
def test_pipeline_viz_roundtrip(version):
    """PointcloudEncoder(viz=True): fused device program for V4 plans, host
    fallback for V5-adaptive; stream header carries the post-dedup width."""
    from cloudini_tpu.codec.pipeline import PointcloudDecoder
    from cloudini_tpu.core.header import decode_header

    fields = _fields() + [PointField("ring", 16, FieldType.UINT16, None)]
    n = 2 * CHUNK + 100
    rows16 = _cloud(n, seed=11)
    rng = np.random.default_rng(12)
    rows = np.zeros((n, 18), np.uint8)
    rows[:, :16] = rows16
    rows[:, 16:] = rng.integers(0, 4, (n, 2), dtype=np.uint8)
    info = EncodingInfo(
        fields=tuple(fields), width=n, height=1, point_step=18,
        encoding_opt=EncodingOptions.LOSSY, compression_opt=CompressionOption.NONE,
        version=version,
    )
    host_fields, host_rows = apply_viz_lossy_preprocessing(fields, rows)
    stream = PointcloudEncoder(info, chunk_points=CHUNK, viz=True).encode(rows)
    ref_stream = PointcloudEncoder(
        info.with_(width=host_rows.shape[0]), backend="host", chunk_points=CHUNK
    ).encode(host_rows)
    assert stream == ref_stream

    dinfo, hlen = decode_header(stream)
    assert dinfo.width == host_rows.shape[0]
    out = PointcloudDecoder(chunk_points=CHUNK).decode(dinfo, stream[hlen:])
    assert np.array_equal(out[:, 16:], host_rows[:, 16:])
