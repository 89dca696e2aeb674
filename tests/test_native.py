"""Native C++ runtime parity vs the numpy wire kernel (which is oracle-locked)."""

import numpy as np
import pytest

from cloudini_tpu import native
from cloudini_tpu.core.plan import build_plan
from cloudini_tpu.core.types import (
    CompressionOption,
    EncodingInfo,
    EncodingOptions,
    FieldType,
    PointField,
)
from cloudini_tpu.ref import gorilla as py_gorilla
from cloudini_tpu.ref import stage1 as np_stage1
from cloudini_tpu.ref.seqdecode import decode_chunk_sequential

pytestmark = pytest.mark.skipif(not native.available(), reason="no native toolchain")


def _mixed_rows(n, seed=0, nan_frac=0.0):
    rng = np.random.default_rng(seed)
    xyz = (np.cumsum(rng.normal(0, 0.05, (n, 3)), axis=0) + 2).astype(np.float32)
    if nan_frac:
        xyz[rng.random((n, 3)) < nan_frac] = np.nan
    intensity = rng.uniform(0, 100, n).astype(np.float32)
    ring = rng.integers(0, 64, n, dtype=np.uint16)
    ts = (1.6e9 + np.cumsum(rng.uniform(0, 1e-3, n))).astype(np.float64)
    flag = rng.integers(0, 256, n, dtype=np.uint8)
    step = 12 + 4 + 2 + 8 + 1
    rows = np.zeros((n, step), dtype=np.uint8)
    rows[:, 0:12] = xyz.view(np.uint8).reshape(n, 12)
    rows[:, 12:16] = intensity.reshape(-1, 1).view(np.uint8).reshape(n, 4)
    rows[:, 16:18] = ring.reshape(-1, 1).view(np.uint8).reshape(n, 2)
    rows[:, 18:26] = ts.reshape(-1, 1).view(np.uint8).reshape(n, 8)
    rows[:, 26:27] = flag.reshape(-1, 1)
    fields = (
        PointField("x", 0, FieldType.FLOAT32, 0.001),
        PointField("y", 4, FieldType.FLOAT32, 0.001),
        PointField("z", 8, FieldType.FLOAT32, 0.001),
        PointField("intensity", 12, FieldType.FLOAT32, 0.01),
        PointField("ring", 16, FieldType.UINT16),
        PointField("t", 18, FieldType.FLOAT64),  # no res -> Gorilla
        PointField("flag", 26, FieldType.UINT8),
    )
    info = EncodingInfo(
        fields=fields, width=n, height=1, point_step=step,
        encoding_opt=EncodingOptions.LOSSY, compression_opt=CompressionOption.NONE,
        version=4,  # ints interleaved
    )
    return info, rows


@pytest.mark.parametrize("nan_frac", [0.0, 0.1])
def test_native_encode_matches_numpy(nan_frac):
    info, rows = _mixed_rows(4000, seed=1, nan_frac=nan_frac)
    plan = build_plan(info)
    want = np_stage1.encode_chunk(plan, rows)
    got = native.encode_chunk(plan, rows, plan.max_encoded_point_bytes)
    assert np.array_equal(got, np.asarray(want))


def test_native_decode_matches_python_walk():
    info, rows = _mixed_rows(3000, seed=2, nan_frac=0.05)
    plan = build_plan(info)
    data = np_stage1.encode_chunk(plan, rows)
    out_native = np.zeros_like(rows)
    consumed_n = native.decode_chunk(build_plan(info, for_decode=True), data, out_native, rows.shape[0])
    out_py = np.zeros_like(rows)
    consumed_p = decode_chunk_sequential(build_plan(info, for_decode=True), data, out_py, rows.shape[0])
    assert consumed_n == consumed_p
    assert np.array_equal(out_native, out_py)


def test_native_gorilla_column_roundtrip():
    rng = np.random.default_rng(3)
    ts = 1.6e9 + np.cumsum(rng.uniform(0, 1e-3, 5000))
    ts[10:20] = ts[9]
    bits = ts.view(np.uint64)
    payload, lengths = native.gorilla_encode_column(bits, 64)
    py_payload, py_lengths = py_gorilla.encode_column(bits, 64)
    assert payload.tobytes() == py_payload
    assert np.array_equal(lengths, py_lengths)
    decoded, consumed = native.gorilla_decode_column(payload, len(bits), 64)
    assert consumed == len(payload)
    assert np.array_equal(decoded, bits)


def test_native_truncated_raises():
    info, rows = _mixed_rows(100, seed=4)
    plan = build_plan(info)
    data = np.asarray(np_stage1.encode_chunk(plan, rows))
    with pytest.raises(ValueError):
        native.decode_chunk(build_plan(info, for_decode=True), data[: len(data) // 3],
                            np.zeros_like(rows), rows.shape[0])


def test_native_v5_analyze_matches_numpy():
    """cldn_v5_analyze_modes must pick the same committed mode as the numpy
    oracle on sequences engineered toward each of the four wire modes, plus
    randomized mixes (the reference's own mode-forcing test pattern,
    test_field_encoders.cpp:590-693)."""
    import numpy as np

    from cloudini_tpu import native
    from cloudini_tpu.core.plan import AdaptiveField
    from cloudini_tpu.core.types import FieldType
    from cloudini_tpu.ref import v5 as np_v5

    if not native.available():
        import pytest

        pytest.skip("native runtime unavailable")
    rng = np.random.default_rng(42)
    n = 4096
    cases = [
        rng.integers(-2**40, 2**40, n),                    # wide -> DeltaVarint
        rng.integers(0, 7, n),                             # few values -> Palette
        np.repeat(rng.integers(0, 2**20, 64), n // 64),    # runs -> Rle
        np.cumsum(np.repeat(rng.integers(1, 5, 64), n // 64)),  # DeltaRle
        np.zeros(n, np.int64),
        np.arange(n),
        rng.integers(-5, 5, n),
    ]
    for t, bpv in ((FieldType.INT16, 2), (FieldType.INT32, 4), (FieldType.INT64, 8)):
        field = AdaptiveField(field_index=0, name="f", type=t, offset=0)
        for k, vals in enumerate(cases):
            lim = 2 ** (8 * bpv - 1)
            v = np.clip(vals, -lim, lim - 1).astype(np.int64)
            raw = v.astype(np.uint64) & np.uint64((1 << (8 * bpv)) - 1)
            want = np_v5.analyze_modes(v, raw, bpv)
            got = native.v5_analyze_modes(field, v, raw)
            assert got == want, f"case {k} bpv {bpv}: native {got} != numpy {want}"
