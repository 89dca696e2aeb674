"""Device V5 adaptive-section parity: device emission must be byte-identical
to the numpy section encoder (which is oracle-locked by test_golden.py)."""

import numpy as np
import pytest

from cloudini_tpu.core.plan import build_plan
from cloudini_tpu.core.types import (
    CompressionOption,
    EncodingInfo,
    EncodingOptions,
    FieldType,
    PointField,
)
from cloudini_tpu.ref import v5 as np_v5

CHUNK = 1024


def _rows(n, int_vals, seed=0):
    rng = np.random.default_rng(seed)
    xyz = (np.cumsum(rng.normal(0, 0.05, (n, 3)), axis=0)).astype(np.float32)
    w = int_vals.dtype.itemsize
    rows = np.zeros((n, 12 + w), dtype=np.uint8)
    rows[:, :12] = xyz.view(np.uint8).reshape(n, 12)
    rows[:, 12:] = int_vals.reshape(-1, 1).view(np.uint8).reshape(n, w)
    return rows


def _info(n, ftype, w):
    return EncodingInfo(
        fields=(
            PointField("x", 0, FieldType.FLOAT32, 0.001),
            PointField("y", 4, FieldType.FLOAT32, 0.001),
            PointField("z", 8, FieldType.FLOAT32, 0.001),
            PointField("v", 12, ftype),
        ),
        width=n, height=1, point_step=12 + w,
        encoding_opt=EncodingOptions.LOSSY, compression_opt=CompressionOption.NONE,
    )


def _device_section(field, mode, rows, n):
    import jax

    from cloudini_tpu.ops import adaptive as adaptive_ops

    smax = adaptive_ops.section_max_bytes(field, CHUNK)
    chunks = np.zeros((2, CHUNK, rows.shape[1]), dtype=np.uint8)
    chunks[0, :n] = rows[:n]
    chunks[1, : max(1, n // 2)] = rows[: max(1, n // 2)]  # ragged second chunk
    valid = np.zeros((2, CHUNK), dtype=bool)
    valid[0, :n] = True
    valid[1, : max(1, n // 2)] = True
    fn = jax.jit(lambda r, v: adaptive_ops.encode_section_device(field, mode, r, v, smax))
    out, sizes = fn(chunks, valid)
    return np.asarray(out), np.asarray(sizes), chunks, [n, max(1, n // 2)]


MODE_CASES = [
    # (mode, value generator)
    (np_v5.MODE_DELTA_VARINT, lambda n, rng: rng.integers(-(10**5), 10**5, n).astype(np.int32)),
    (np_v5.MODE_RLE, lambda n, rng: np.repeat(rng.integers(0, 2**62, 17, dtype=np.int64), -(-n // 17))[:n]),
    (np_v5.MODE_DELTA_RLE, lambda n, rng: (np.arange(n, dtype=np.int64) * 977).astype(np.int64)),
    (np_v5.MODE_PALETTE, lambda n, rng: rng.choice(
        rng.integers(0, 2**31, 11, dtype=np.uint32).astype(np.uint32), n).astype(np.uint32)),
]


@pytest.mark.parametrize("mode,gen", MODE_CASES)
@pytest.mark.parametrize("n", [5, 500, CHUNK])
def test_device_section_matches_numpy(mode, gen, n):
    rng = np.random.default_rng(mode * 100 + n)
    vals = gen(n, rng)
    rows = _rows(n, vals, seed=n)
    ft = {np.dtype(np.int32): FieldType.INT32, np.dtype(np.uint32): FieldType.UINT32,
          np.dtype(np.int64): FieldType.INT64, np.dtype(np.uint16): FieldType.UINT16}[vals.dtype]
    info = _info(n, ft, vals.dtype.itemsize)
    plan = build_plan(info)
    field = plan.adaptive[0]

    out, sizes, chunks, valids = _device_section(field, mode, rows, n)
    for c, nv in enumerate(valids):
        signed, unsigned = np_v5.extract_adaptive_values(field, rows[:nv])
        want = np_v5.encode_section(field, mode, signed, unsigned)
        got = out[c, : sizes[c]]
        assert sizes[c] == len(want), f"chunk {c}: {sizes[c]} vs {len(want)}"
        assert np.array_equal(got, want), f"chunk {c}: section bytes differ"


def test_full_pipeline_device_v5_matches_oracle(oracle):
    """End-to-end: device-V5 public encode must stay bit-exact vs reference."""
    from cloudini_tpu import PointcloudDecoder, PointcloudEncoder

    n = 70000  # multi-chunk with probe
    rng = np.random.default_rng(7)
    ring = (np.arange(n) % 16).astype(np.uint16)
    rows = _rows(n, ring, seed=3)
    info = _info(n, FieldType.UINT16, 2)
    enc = PointcloudEncoder(info)
    mine = enc.encode(rows.tobytes())
    golden = oracle.encode(info, rows.tobytes())
    assert mine == golden
    assert PointcloudDecoder().decode_full(mine)[1].tobytes() == oracle.decode(golden)
