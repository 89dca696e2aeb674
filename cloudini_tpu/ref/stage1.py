"""Columnar stage-1 codec (numpy) — the wire kernel of truth.

The reference encodes point-at-a-time with stateful per-field streamers
(v4_codec.cpp:66-117). This implementation is column-at-a-time and branch-free:
every predictor is an elementwise shift (delta) or a segmented cumulative sum
(un-delta with NaN resets), which is exactly the shape that lifts onto the TPU
VPU. The wire bytes are identical: columnar token matrices are interleaved back
into the reference's per-point layout with one prefix-sum scatter.

Chunks (32768 points, codec_common.hpp:28) reset all predictor state, making
them the data-parallel unit.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from ..core.plan import CodecPlan, CodecUnit, UnitKind
from ..core.types import EncodingInfo, FieldType, numpy_dtype, size_of
from . import fpmath, gorilla
from .varint import (
    pack_varints,
    unpack_varints,
    varint_byte_matrix,
    varint_lengths,
    zigzag_decode,
    zigzag_encode,
)

# ------------------------------------------------------------------ column access


def _col(points: np.ndarray, offset: int, dtype) -> np.ndarray:
    """Extract a contiguous copy of one column (handles unaligned offsets)."""
    dtype = np.dtype(dtype)
    raw = points[:, offset : offset + dtype.itemsize]
    return np.ascontiguousarray(raw).view(dtype).ravel()


def _store_col(out: np.ndarray, offset: int, values: np.ndarray) -> None:
    """Write a typed column back into (n, point_step) uint8 rows. The
    DECODE_BUT_SKIP_STORE sentinel consumes the stream but stores nothing
    (reference: basic_types.hpp:71)."""
    from ..core.types import DECODE_BUT_SKIP_STORE

    if offset == DECODE_BUT_SKIP_STORE:
        return
    b = values.reshape(-1, 1).view(np.uint8)
    out[:, offset : offset + values.dtype.itemsize] = b.reshape(len(values), values.dtype.itemsize)


# ------------------------------------------------------------------ delta helpers


def delta_encode(q: np.ndarray, nan_mask: Optional[np.ndarray] = None) -> np.ndarray:
    """delta[i] = q[i] - prev, where prev resets to 0 after a NaN and at chunk
    start (reference: field_encoder.hpp:343-357). Elementwise — no scan."""
    prev = np.empty_like(q)
    prev[0] = 0
    prev[1:] = q[:-1]
    if nan_mask is not None and nan_mask.any():
        prev[1:] = np.where(nan_mask[:-1], 0, prev[1:])
    return q - prev  # wraps in the column dtype


def delta_decode(deltas: np.ndarray, nan_mask: Optional[np.ndarray] = None) -> np.ndarray:
    """Inverse of delta_encode: cumulative sum with resets at NaN markers —
    a segmented scan (value at a NaN position is 0)."""
    if nan_mask is None or not nan_mask.any():
        return np.cumsum(deltas, dtype=deltas.dtype)
    d = np.where(nan_mask, 0, deltas)
    total = np.cumsum(d, dtype=deltas.dtype)
    idx = np.arange(len(deltas))
    last_nan = np.maximum.accumulate(np.where(nan_mask, idx, -1))
    base = np.where(last_nan >= 0, total[np.maximum(last_nan, 0)], 0).astype(deltas.dtype)
    values = total - base
    values[nan_mask] = 0
    return values


# ------------------------------------------------------------------ token streams

TokenStream = Tuple[np.ndarray, np.ndarray]  # (byte matrix (n, L), lengths (n,))


def _varint_stream(values_i64: np.ndarray, nan_mask: Optional[np.ndarray]) -> TokenStream:
    u = zigzag_encode(values_i64)
    lengths = varint_lengths(u)
    if nan_mask is not None:
        u = np.where(nan_mask, np.uint64(0), u)
        lengths = np.where(nan_mask, np.int32(1), lengths)
    bytes_mat, _ = varint_byte_matrix(u, lengths)
    return bytes_mat, lengths


def encode_unit(unit: CodecUnit, points: np.ndarray) -> List[TokenStream]:
    """Columnar encode of one codec unit -> ordered per-point token streams."""
    n = points.shape[0]
    if unit.kind == UnitKind.FLOATN_LOSSY:
        lanes = []
        mult = fpmath.floatn_multipliers(unit.resolutions)
        cols = np.stack([_col(points, off, np.float32) for off in unit.offsets], axis=1)
        nan = np.isnan(cols)
        q = fpmath.quantize_floatn(cols, mult[None, :])  # int32, SSE semantics
        for lane in range(unit.num_lanes):
            d = delta_encode(q[:, lane], nan[:, lane])  # int32 wrap
            lanes.append(_varint_stream(d.astype(np.int64), nan[:, lane]))
        return lanes
    if unit.kind == UnitKind.FLOAT_LOSSY:
        is_f64 = unit.types[0] == FieldType.FLOAT64
        x = _col(points, unit.offsets[0], np.float64 if is_f64 else np.float32)
        m = fpmath.scalar_multiplier(unit.resolutions[0], is_f64)
        nan = np.isnan(x)
        q = fpmath.quantize_scalar(np.where(nan, 0, x), m)  # int64, ties-away
        d = delta_encode(q, nan)
        return [_varint_stream(d, nan)]
    if unit.kind == UnitKind.INT_DELTA:
        v = _col(points, unit.offsets[0], numpy_dtype(unit.types[0])).astype(np.int64)
        return [_varint_stream(delta_encode(v), None)]
    if unit.kind == UnitKind.FLOAT_XOR:
        width = size_of(unit.types[0])
        bits_dtype = np.uint64 if width == 8 else np.uint32
        b = _col(points, unit.offsets[0], bits_dtype)
        prev = np.empty_like(b)
        prev[0] = 0
        prev[1:] = b[:-1]
        residual = b ^ prev
        mat = residual.reshape(-1, 1).view(np.uint8).reshape(n, width)
        return [(mat, np.full(n, width, dtype=np.int32))]
    if unit.kind == UnitKind.GORILLA:
        width = size_of(unit.types[0])
        bits_dtype = np.uint64 if width == 8 else np.uint32
        b = _col(points, unit.offsets[0], bits_dtype)
        from .. import native

        if native.available():
            payload_arr, lengths = native.gorilla_encode_column(b, width * 8)
            payload = payload_arr.tobytes()
        else:
            payload, lengths = gorilla.encode_column(b, width * 8)
        max_len = int(lengths.max()) if n else 0
        mat = np.zeros((n, max_len), dtype=np.uint8)
        flat = np.frombuffer(payload, dtype=np.uint8)
        starts = np.concatenate([[0], np.cumsum(lengths)[:-1]])
        k = np.arange(max_len)
        valid = k[None, :] < lengths[:, None]
        idx = np.where(valid, starts[:, None] + k[None, :], 0)
        mat[valid] = flat[idx[valid]]
        return [(mat, lengths)]
    if unit.kind == UnitKind.COPY:
        width = size_of(unit.types[0])
        mat = np.ascontiguousarray(points[:, unit.offsets[0] : unit.offsets[0] + width])
        return [(mat, np.full(n, width, dtype=np.int32))]
    raise ValueError(f"unknown unit kind {unit.kind}")


def interleave(streams: List[TokenStream], n: int) -> np.ndarray:
    """Columnar token matrices -> the reference's interleaved per-point byte
    layout, via prefix sums + one scatter per stream (SURVEY §7 hard part 4)."""
    if not streams:
        return np.zeros(0, dtype=np.uint8)
    lengths = np.stack([s[1] for s in streams], axis=1)  # (n, S)
    point_sizes = lengths.sum(axis=1, dtype=np.int64)
    point_off = np.concatenate([[0], np.cumsum(point_sizes)[:-1]])
    intra = np.cumsum(lengths, axis=1, dtype=np.int64) - lengths
    out = np.empty(int(point_sizes.sum()), dtype=np.uint8)
    for s, (mat, ln) in enumerate(streams):
        max_len = mat.shape[1]
        k = np.arange(max_len)
        valid = k[None, :] < ln[:, None]
        pos = point_off[:, None] + intra[:, s : s + 1] + k[None, :]
        out[pos[valid]] = mat[valid]
    return out


def encode_chunk(plan: CodecPlan, points: np.ndarray) -> np.ndarray:
    """Stage-1 encode of one chunk's interleaved regular stream (V4 layout;
    V5 adds adaptive sections after this — see ref/v5.py)."""
    streams: List[TokenStream] = []
    for unit in plan.units:
        streams.extend(encode_unit(unit, points))
    return interleave(streams, points.shape[0])


# ------------------------------------------------------------------ decode


def _unit_token_lanes(unit: CodecUnit) -> int:
    return unit.num_lanes if unit.kind == UnitKind.FLOATN_LOSSY else 1


def decode_chunk(
    plan: CodecPlan, data: np.ndarray, out: np.ndarray, n_points: int
) -> int:
    """Decode one chunk's regular interleaved stream into ``out`` rows.
    Returns bytes consumed. Dispatches to the parallel path when every unit is
    varint-class; otherwise falls back to the sequential reference walk."""
    if plan.all_varint_class:
        return _decode_chunk_parallel(plan, data, out, n_points)
    return _decode_chunk_sequential(plan, data, out, n_points)


def _decode_chunk_parallel(plan, data, out, n_points) -> int:
    lanes_per_unit = [_unit_token_lanes(u) for u in plan.units]
    k_total = sum(lanes_per_unit)
    values, nan_mask, consumed = unpack_varints(data, k_total * n_points)
    values = values.reshape(n_points, k_total)
    nan_mask = nan_mask.reshape(n_points, k_total)
    lane0 = 0
    for unit, lanes in zip(plan.units, lanes_per_unit):
        v = values[:, lane0 : lane0 + lanes]
        nm = nan_mask[:, lane0 : lane0 + lanes]
        _decode_unit_columnar(unit, v, nm, out)
        lane0 += lanes
    return consumed


def _decode_unit_columnar(unit: CodecUnit, deltas_i64, nan_mask, out) -> None:
    if unit.kind == UnitKind.FLOATN_LOSSY:
        for lane in range(unit.num_lanes):
            d32 = deltas_i64[:, lane].astype(np.int32)  # static_cast<int32_t>(diff)
            q = delta_decode(d32, nan_mask[:, lane])
            vals = q.astype(np.float32) * np.float32(unit.resolutions[lane])
            vals[nan_mask[:, lane]] = np.nan
            _store_col(out, unit.offsets[lane], vals)
        return
    if unit.kind == UnitKind.FLOAT_LOSSY:
        is_f64 = unit.types[0] == FieldType.FLOAT64
        q = delta_decode(deltas_i64[:, 0], nan_mask[:, 0])
        ftype = np.float64 if is_f64 else np.float32
        mult = ftype(np.float32(unit.resolutions[0]))
        vals = q.astype(ftype) * mult
        vals[nan_mask[:, 0]] = np.nan
        _store_col(out, unit.offsets[0], vals)
        return
    if unit.kind == UnitKind.INT_DELTA:
        if nan_mask[:, 0].any():
            raise ValueError("decodeVarint: unexpected NaN marker")
        v = delta_decode(deltas_i64[:, 0], None)
        _store_col(out, unit.offsets[0], v.astype(numpy_dtype(unit.types[0])))
        return
    raise ValueError(f"unit {unit.kind} is not varint-class")


def _decode_chunk_sequential(plan, data, out, n_points) -> int:
    """Sequential walk for streams that mix self-delimiting varints with
    fixed-size or Gorilla tokens. The native C++ runtime owns this path;
    the Python walk (seqdecode) is the fallback oracle."""
    from .. import native

    if native.available():
        return native.decode_chunk(plan, data, out, n_points)
    from .seqdecode import decode_chunk_sequential

    return decode_chunk_sequential(plan, data, out, n_points)
