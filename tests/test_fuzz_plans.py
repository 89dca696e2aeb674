"""Property fuzz: random schemas x random clouds, host encode/decode as the
arbiter, device backends must agree bit-for-bit wherever they claim support."""

import numpy as np
import pytest

from cloudini_tpu.codec.pipeline import PointcloudDecoder, PointcloudEncoder
from cloudini_tpu.core.plan import build_plan
from cloudini_tpu.core.types import (
    CompressionOption,
    EncodingInfo,
    EncodingOptions,
    FieldType,
    PointField,
)
from cloudini_tpu.ops.device_codec import decoder_supports_plan

CHUNK = 256  # small chunks exercise multi-chunk framing cheaply

_NUMERIC = [
    FieldType.FLOAT32, FieldType.FLOAT64,
    FieldType.INT8, FieldType.UINT8, FieldType.INT16, FieldType.UINT16,
    FieldType.INT32, FieldType.UINT32, FieldType.INT64, FieldType.UINT64,
]
_SIZES = {FieldType.FLOAT32: 4, FieldType.FLOAT64: 8, FieldType.INT8: 1,
          FieldType.UINT8: 1, FieldType.INT16: 2, FieldType.UINT16: 2,
          FieldType.INT32: 4, FieldType.UINT32: 4, FieldType.INT64: 8,
          FieldType.UINT64: 8}


def _random_info(rng: np.random.Generator):
    n_fields = int(rng.integers(1, 6))
    fields = []
    off = 0
    for i in range(n_fields):
        t = _NUMERIC[int(rng.integers(0, len(_NUMERIC)))]
        res = None
        if t == FieldType.FLOAT32 and rng.random() < 0.8:
            res = float(rng.choice([0.001, 0.01, 0.1]))
        if t == FieldType.FLOAT64 and rng.random() < 0.5:
            res = 1e-6
        fields.append(PointField(f"f{i}", off, t, res))
        off += _SIZES[t]
    encoding = EncodingOptions.LOSSY if rng.random() < 0.8 else (
        EncodingOptions.LOSSLESS if rng.random() < 0.5 else EncodingOptions.NONE)
    version = int(rng.choice([3, 4, 5]))
    comp = CompressionOption(int(rng.choice([0, 1, 2])))
    n = int(rng.integers(1, 3 * CHUNK))
    return EncodingInfo(fields=tuple(fields), width=n, height=1, point_step=off,
                        encoding_opt=encoding, compression_opt=comp,
                        version=version), n


def _random_rows(rng, info, n):
    rows = np.zeros((n, info.point_step), np.uint8)
    for f in info.fields:
        w = _SIZES[f.type]
        if f.type == FieldType.FLOAT32:
            col = np.cumsum(rng.normal(0, 0.05, n)).astype(np.float32)
            col[rng.random(n) < 0.03] = np.nan
        elif f.type == FieldType.FLOAT64:
            # exercise every Gorilla token class: monotonic (reuse-heavy),
            # constant (same-heavy), steppy (mixed), random (new-window-heavy)
            kind = int(rng.integers(0, 4))
            if kind == 0:
                col = (1.7e9 + np.cumsum(rng.uniform(0, 1e-4, n))).astype(np.float64)
            elif kind == 1:
                col = np.full(n, float(rng.uniform(0, 1e9)), np.float64)
            elif kind == 2:
                col = np.repeat(rng.uniform(0, 1e6, max(n // 5, 1)), 5)[:n]
                col = np.resize(col, n).astype(np.float64)
            else:
                col = rng.uniform(-1e9, 1e9, n).astype(np.float64)
        else:
            lo, hi = (0, 50) if "U" in f.type.name else (-25, 25)
            col = np.cumsum(rng.integers(lo, hi, n)).astype(
                {1: np.int8, 2: np.int16, 4: np.int32, 8: np.int64}[w]
                if "U" not in f.type.name
                else {1: np.uint8, 2: np.uint16, 4: np.uint32, 8: np.uint64}[w]
            )
        rows[:, f.offset : f.offset + w] = col.reshape(-1, 1).view(np.uint8).reshape(n, w)
    return rows


@pytest.mark.parametrize("seed", range(24))
def test_random_plan_roundtrip_and_backend_parity(seed):
    rng = np.random.default_rng(seed)
    info, n = _random_info(rng)
    rows = _random_rows(rng, info, n)

    host_enc = PointcloudEncoder(info, backend="host", chunk_points=CHUNK)
    stream = host_enc.encode(rows, write_header=False)
    host_rows = PointcloudDecoder(backend="host", chunk_points=CHUNK).decode(info, stream)

    # device encode must produce identical wire bytes
    dev_stream = PointcloudEncoder(info, backend="device", chunk_points=CHUNK).encode(
        rows, write_header=False
    )
    assert dev_stream == stream, f"seed {seed}: device wire bytes differ"

    # device decode (where supported) must produce identical rows
    if decoder_supports_plan(build_plan(info, for_decode=True)):
        dev_rows = PointcloudDecoder(backend="device", chunk_points=CHUNK).decode(
            info, stream
        )
        assert np.array_equal(dev_rows, host_rows), f"seed {seed}: device rows differ"

    # lossy tolerance on finite float32 lanes
    for f in info.fields:
        if f.type == FieldType.FLOAT32 and f.resolution is not None and (
            info.encoding_opt == EncodingOptions.LOSSY
        ):
            orig = rows[:, f.offset : f.offset + 4].copy().view(np.float32).ravel()
            got = host_rows[:, f.offset : f.offset + 4].copy().view(np.float32).ravel()
            m = np.isfinite(orig)
            assert np.array_equal(np.isnan(got), ~m)
            assert np.abs(np.where(m, got - orig, 0)).max() <= f.resolution * 1.0001


@pytest.mark.parametrize("seed", range(8))
def test_random_plan_encode_many_parity(seed):
    """encode_many on random schemas: batched streams (device, one dispatch
    where the plan allows) must equal per-cloud encode()."""
    rng = np.random.default_rng(1000 + seed)
    info, _ = _random_info(rng)
    sizes = [int(rng.integers(1, 2 * CHUNK)) for _ in range(3)]
    clouds = [_random_rows(rng, info, n) for n in sizes]
    enc = PointcloudEncoder(info.with_(width=0), backend="device", chunk_points=CHUNK)
    batched = enc.encode_many([c.tobytes() for c in clouds])
    for c, stream, n in zip(clouds, batched, sizes):
        solo = PointcloudEncoder(
            info.with_(width=n), backend="device", chunk_points=CHUNK
        ).encode(c.tobytes())
        assert stream == solo, f"seed {seed}: batched stream differs at n={n}"
