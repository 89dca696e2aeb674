"""Sequential decode fallback for interleaved streams that are not fully
self-delimiting (COPY / XOR / Gorilla tokens mixed between varints).

This is the faithful reference walk (v4_codec.cpp:85-117) in Python. It is the
correctness oracle for mixed streams; the hot equivalents live in the native
runtime and the device kernels. Vectorized fast paths still decode whole columns
at once whenever the *prefix* structure allows it.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from ..core.plan import CodecPlan, CodecUnit, UnitKind
from ..core.types import FieldType, numpy_dtype, size_of
from . import fpmath
from .varint import decode_varint_scalar

_LEADING_SENTINEL = 255


class _GorillaState:
    __slots__ = ("prev_bits", "prev_leading", "prev_trailing", "first", "type_bits")

    def __init__(self, type_bits: int):
        self.type_bits = type_bits
        self.reset()

    def reset(self):
        self.prev_bits = 0
        self.prev_leading = _LEADING_SENTINEL
        self.prev_trailing = 0
        self.first = True


def _gorilla_step(st: _GorillaState, buf: memoryview, pos: int) -> Tuple[int, int]:
    """Decode one byte-aligned Gorilla value; returns (bits, new_pos).
    Truncation and corrupt-window guards mirror ref/gorilla.decode_column so
    the sequential walk errors identically instead of reading short slices."""
    tb = st.type_bits
    n = len(buf)
    if st.first:
        st.first = False
        nbytes = tb // 8
        if pos + nbytes > n:
            raise ValueError("Gorilla: truncated input")
        value = int.from_bytes(buf[pos : pos + nbytes], "little")
        st.prev_bits = value
        return value, pos + nbytes
    if pos >= n:
        raise ValueError("Gorilla: truncated input")
    b0 = buf[pos]
    if (b0 & 1) == 0:
        return st.prev_bits, pos + 1
    if (b0 & 2) == 0:
        meaningful = tb - st.prev_leading - st.prev_trailing
        if st.prev_leading == _LEADING_SENTINEL or not 1 <= meaningful <= tb:
            raise ValueError("Gorilla: corrupt window parameters")
        nbytes = (2 + meaningful + 7) // 8
        if pos + nbytes > n:
            raise ValueError("Gorilla: truncated input")
        acc = int.from_bytes(buf[pos : pos + nbytes], "little")
        xor_val = ((acc >> 2) & ((1 << meaningful) - 1)) << st.prev_trailing
    else:
        if pos + 2 > n:
            raise ValueError("Gorilla: truncated input")
        head = int.from_bytes(buf[pos : pos + 2], "little")
        stored_leading = (head >> 2) & 0x1F
        meaningful = ((head >> 7) & 0x3F) + 1
        if stored_leading + meaningful > tb:
            raise ValueError("Gorilla: corrupt window parameters")
        nbytes = (13 + meaningful + 7) // 8
        if pos + nbytes > n:
            raise ValueError("Gorilla: truncated input")
        acc = int.from_bytes(buf[pos : pos + nbytes], "little")
        trailing = tb - stored_leading - meaningful
        xor_val = ((acc >> 13) & ((1 << meaningful) - 1)) << trailing
        st.prev_leading = stored_leading
        st.prev_trailing = trailing
    value = xor_val ^ st.prev_bits
    st.prev_bits = value
    return value, pos + nbytes


def decode_chunk_sequential(plan: CodecPlan, data: np.ndarray, out: np.ndarray, n_points: int) -> int:
    buf = memoryview(data.tobytes())
    pos = 0
    n_units = len(plan.units)

    # per-unit predictor state
    prev_i = [None] * n_units  # int predictors (lists for FloatN lanes)
    gstate = [None] * n_units
    columns = []  # (unit_idx, lane, list) accumulation
    acc = []
    for ui, unit in enumerate(plan.units):
        if unit.kind == UnitKind.FLOATN_LOSSY:
            prev_i[ui] = [0] * unit.num_lanes
        elif unit.kind in (UnitKind.FLOAT_LOSSY, UnitKind.INT_DELTA, UnitKind.FLOAT_XOR):
            prev_i[ui] = 0
        elif unit.kind == UnitKind.GORILLA:
            gstate[ui] = _GorillaState(size_of(unit.types[0]) * 8)
        acc.append([[] for _ in range(unit.num_lanes)] if unit.kind == UnitKind.FLOATN_LOSSY else [])

    min_bytes = plan.min_encoded_point_bytes
    for _p in range(n_points):
        if len(buf) - pos < min_bytes:
            raise ValueError("Truncated encoded data: not enough bytes for a complete point")
        for ui, unit in enumerate(plan.units):
            if unit.kind == UnitKind.FLOATN_LOSSY:
                for lane in range(unit.num_lanes):
                    if buf[pos] == 0:
                        prev_i[ui][lane] = 0
                        acc[ui][lane].append(None)
                        pos += 1
                    else:
                        diff, cnt = decode_varint_scalar(buf, pos)
                        pos += cnt
                        d32 = ((diff & 0xFFFFFFFF) ^ 0x80000000) - 0x80000000  # static_cast<int32_t>
                        v = (d32 + prev_i[ui][lane] + 2**31) % 2**32 - 2**31
                        prev_i[ui][lane] = v
                        acc[ui][lane].append(v)
            elif unit.kind == UnitKind.FLOAT_LOSSY:
                if buf[pos] == 0:
                    prev_i[ui] = 0
                    acc[ui].append(None)
                    pos += 1
                else:
                    diff, cnt = decode_varint_scalar(buf, pos)
                    pos += cnt
                    v = (prev_i[ui] + diff + 2**63) % 2**64 - 2**63
                    prev_i[ui] = v
                    acc[ui].append(v)
            elif unit.kind == UnitKind.INT_DELTA:
                diff, cnt = decode_varint_scalar(buf, pos)
                pos += cnt
                v = (prev_i[ui] + diff + 2**63) % 2**64 - 2**63
                prev_i[ui] = v
                acc[ui].append(v)
            elif unit.kind == UnitKind.FLOAT_XOR:
                width = size_of(unit.types[0])
                residual = int.from_bytes(buf[pos : pos + width], "little")
                pos += width
                v = residual ^ prev_i[ui]
                prev_i[ui] = v
                acc[ui].append(v)
            elif unit.kind == UnitKind.GORILLA:
                v, pos = _gorilla_step(gstate[ui], buf, pos)
                acc[ui].append(v)
            elif unit.kind == UnitKind.COPY:
                width = size_of(unit.types[0])
                acc[ui].append(bytes(buf[pos : pos + width]))
                pos += width

    # materialize columns
    for ui, unit in enumerate(plan.units):
        if unit.kind == UnitKind.FLOATN_LOSSY:
            for lane in range(unit.num_lanes):
                vals = np.array([0 if v is None else v for v in acc[ui][lane]], dtype=np.int64).astype(np.int32)
                f = vals.astype(np.float32) * np.float32(unit.resolutions[lane])
                nanm = np.array([v is None for v in acc[ui][lane]])
                f[nanm] = np.nan
                _store(out, unit.offsets[lane], f)
        elif unit.kind == UnitKind.FLOAT_LOSSY:
            is_f64 = unit.types[0] == FieldType.FLOAT64
            ftype = np.float64 if is_f64 else np.float32
            vals = np.array([0 if v is None else v for v in acc[ui]], dtype=np.int64)
            mult = ftype(np.float32(unit.resolutions[0]))
            f = vals.astype(ftype) * mult
            nanm = np.array([v is None for v in acc[ui]])
            f[nanm] = np.nan
            _store(out, unit.offsets[0], f)
        elif unit.kind == UnitKind.INT_DELTA:
            vals = np.array(acc[ui], dtype=np.int64).astype(numpy_dtype(unit.types[0]))
            _store(out, unit.offsets[0], vals)
        elif unit.kind in (UnitKind.FLOAT_XOR, UnitKind.GORILLA):
            width = size_of(unit.types[0])
            udtype = np.uint64 if width == 8 else np.uint32
            vals = np.array(acc[ui], dtype=np.uint64).astype(udtype)
            _store(out, unit.offsets[0], vals)
        elif unit.kind == UnitKind.COPY:
            from ..core.types import DECODE_BUT_SKIP_STORE

            if unit.offsets[0] == DECODE_BUT_SKIP_STORE:
                continue
            width = size_of(unit.types[0])
            mat = np.frombuffer(b"".join(acc[ui]), dtype=np.uint8).reshape(n_points, width)
            out[:, unit.offsets[0] : unit.offsets[0] + width] = mat
    return pos


def _store(out: np.ndarray, offset: int, values: np.ndarray) -> None:
    from ..core.types import DECODE_BUT_SKIP_STORE

    if offset == DECODE_BUT_SKIP_STORE:
        return
    b = values.reshape(-1, 1).view(np.uint8)
    out[:, offset : offset + values.dtype.itemsize] = b.reshape(len(values), values.dtype.itemsize)
