"""V5 adaptive integer sections — columnar by construction.

Wire format per field per chunk (reference: v5_codec.cpp:33-38, 423-491):
  mode byte (0=DeltaVarint, 1=Palette, 2=Rle, 3=DeltaRle) + payload
    DeltaVarint: zigzag varints of consecutive diffs (prev starts at 0)
    Palette:     u16 count + raw values (first-occurrence order) + LSB-first
                 bit-packed indexes (ceil(log2(count)) bits each)
    Rle:         u32 run count + (raw value bytes + uvarint run length)*
    DeltaRle:    u32 run count + (zigzag varint diff + uvarint run length)*

Mode selection: the first chunk probes 4096 points (v5_codec.cpp:76, 939-946) —
or the whole chunk when it has <= 4096 points — sizes all four candidates and
commits the smallest (strict-less priority Delta < Palette < Rle < DeltaRle,
v5_codec.cpp:387-402). The committed mode then streams for every later chunk.

All four cost functions here are vectorized reductions (run-boundary masks +
segment sums), the form that maps directly onto TPU (SURVEY §2 table row V5).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ..core.plan import AdaptiveField
from ..core.types import numpy_dtype
from .varint import (
    unpack_varints,
    varint_byte_matrix,
    varint_lengths,
    zigzag_encode,
)

MODE_DELTA_VARINT = 0
MODE_PALETTE = 1
MODE_RLE = 2
MODE_DELTA_RLE = 3


def _uvarint_lengths(u: np.ndarray) -> np.ndarray:
    """Byte count of the unsigned (no zigzag, no bias) varints used for run
    lengths (v5_codec.cpp:160-174)."""
    u = u.astype(np.uint64, copy=False)
    lengths = np.ones(u.shape, dtype=np.int64)
    for k in range(1, 10):
        lengths += (u >= np.uint64(1 << (7 * k))).astype(np.int64)
    return lengths


def _pack_uvarints(u: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    u = u.astype(np.uint64, copy=False)
    lengths = _uvarint_lengths(u).astype(np.int32)
    k = np.arange(10, dtype=np.uint64)
    groups = (u[:, None] >> (np.uint64(7) * k[None, :])) & np.uint64(0x7F)
    cont = k[None, :] < (lengths[:, None].astype(np.uint64) - np.uint64(1))
    mat = (groups | np.where(cont, np.uint64(0x80), np.uint64(0))).astype(np.uint8)
    valid = k[None, :] < lengths[:, None].astype(np.uint64)
    return np.where(valid, mat, 0), lengths


def extract_adaptive_values(field: AdaptiveField, points: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (signed int64 values, zero-extended uint64 raw bits) — the two
    views the reference keeps (v5_codec.cpp:680-688)."""
    dt = numpy_dtype(field.type)
    raw = np.ascontiguousarray(points[:, field.offset : field.offset + dt.itemsize]).view(dt).ravel()
    signed = raw.astype(np.int64)  # sign-extends signed, wraps uint64
    unsigned = raw.astype(np.uint64)  # zero-extends
    return signed, unsigned


# ------------------------------------------------------------------ run discovery


def _runs(values: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(run start indices, run lengths) of equal consecutive values."""
    n = len(values)
    if n == 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
    boundary = np.empty(n, dtype=bool)
    boundary[0] = True
    boundary[1:] = values[1:] != values[:-1]
    starts = np.flatnonzero(boundary)
    lengths = np.diff(np.append(starts, n))
    return starts, lengths


def _diffs(values_i64: np.ndarray) -> np.ndarray:
    d = np.empty_like(values_i64)
    d[0] = values_i64[0]
    d[1:] = values_i64[1:] - values_i64[:-1]
    return d


# ------------------------------------------------------------------ mode costing


def _palette_first_occurrence(raw: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Palette in first-occurrence order + per-element indexes, matching the
    reference's insertion-order hash table (v5_codec.cpp:326-379)."""
    _, first_idx, inv = np.unique(raw, return_index=True, return_inverse=True)
    order = np.argsort(first_idx, kind="stable")
    palette = raw[np.sort(first_idx)]
    rank = np.empty(len(order), dtype=np.int64)
    rank[order] = np.arange(len(order))
    return palette, rank[inv]


def _bits_for_palette(count: int) -> int:
    if count <= 1:
        return 0
    return int(count - 1).bit_length()


def analyze_modes(signed: np.ndarray, unsigned: np.ndarray, bytes_per_value: int) -> int:
    """Size all four modes over the probe window; return the committed mode
    (reference: analyzeAdaptiveIntField + selectBestAdaptiveIntMode)."""
    diffs = _diffs(signed)
    delta_bytes = 1 + int(varint_lengths(zigzag_encode(diffs)).sum())

    palette, indexes = _palette_first_occurrence(unsigned)
    bits = _bits_for_palette(len(palette))
    palette_bytes = 1 + 2 + len(palette) * bytes_per_value + (bits * len(unsigned) + 7) // 8

    _, run_lens = _runs(unsigned)
    rle_bytes = 1 + 4 + len(run_lens) * bytes_per_value + int(_uvarint_lengths(run_lens).sum())

    dstarts, drun_lens = _runs(diffs)
    drle_bytes = (
        1 + 4 + int(varint_lengths(zigzag_encode(diffs[dstarts])).sum()) + int(_uvarint_lengths(drun_lens).sum())
    )

    best_mode, best = MODE_DELTA_VARINT, delta_bytes
    if palette_bytes < best:
        best_mode, best = MODE_PALETTE, palette_bytes
    if rle_bytes < best:
        best_mode, best = MODE_RLE, rle_bytes
    if drle_bytes < best:
        best_mode = MODE_DELTA_RLE
    return best_mode


# ------------------------------------------------------------------ section emit


def _concat_tokens(mats_lens) -> np.ndarray:
    """Concatenate (byte-matrix, lengths) token streams into contiguous bytes."""
    parts = []
    for mat, lens in mats_lens:
        k = np.arange(mat.shape[1])
        valid = k[None, :] < lens[:, None]
        parts.append(mat[valid])
    return np.concatenate(parts) if parts else np.zeros(0, dtype=np.uint8)


def _interleave_pairs(a: Tuple[np.ndarray, np.ndarray], b: Tuple[np.ndarray, np.ndarray]) -> np.ndarray:
    """Per-run (value_bytes, runlen_bytes) pairs -> contiguous section payload."""
    mat_a, len_a = a
    mat_b, len_b = b
    n = len(len_a)
    sizes = len_a.astype(np.int64) + len_b.astype(np.int64)
    off = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    out = np.empty(int(sizes.sum()), dtype=np.uint8)
    ka = np.arange(mat_a.shape[1])
    va = ka[None, :] < len_a[:, None]
    pos_a = off[:, None] + ka[None, :]
    out[pos_a[va]] = mat_a[va]
    kb = np.arange(mat_b.shape[1])
    vb = kb[None, :] < len_b[:, None]
    pos_b = off[:, None] + len_a[:, None] + kb[None, :]
    out[pos_b[vb]] = mat_b[vb]
    return out


def _raw_bytes_matrix(values_u64: np.ndarray, bytes_per_value: int) -> Tuple[np.ndarray, np.ndarray]:
    k = np.arange(bytes_per_value, dtype=np.uint64)
    mat = ((values_u64[:, None] >> (np.uint64(8) * k[None, :])) & np.uint64(0xFF)).astype(np.uint8)
    return mat, np.full(len(values_u64), bytes_per_value, dtype=np.int32)


def encode_section(
    field: AdaptiveField, mode: int, signed: np.ndarray, unsigned: np.ndarray
) -> np.ndarray:
    """Emit one field's committed-mode section for one chunk."""
    bpv = field.bytes_per_value
    head = np.array([mode], dtype=np.uint8)
    if mode == MODE_DELTA_VARINT:
        diffs = _diffs(signed)
        u = zigzag_encode(diffs)
        mat, _ = varint_byte_matrix(u, varint_lengths(u))
        payload = _concat_tokens([(mat, varint_lengths(u))])
        return np.concatenate([head, payload])
    if mode == MODE_PALETTE:
        palette, indexes = _palette_first_occurrence(unsigned)
        bits = _bits_for_palette(len(palette))
        out = [head, np.array([len(palette) & 0xFF, (len(palette) >> 8) & 0xFF], dtype=np.uint8)]
        pal_mat, pal_len = _raw_bytes_matrix(palette.astype(np.uint64), bpv)
        out.append(_concat_tokens([(pal_mat, pal_len)]))
        out.append(_bitpack_indexes(indexes, bits))
        return np.concatenate(out)
    if mode == MODE_RLE:
        starts, run_lens = _runs(unsigned)
        vals = unsigned[starts]
        head_rc = np.concatenate([head, np.frombuffer(np.uint32(len(starts)).tobytes(), dtype=np.uint8)])
        payload = _interleave_pairs(_raw_bytes_matrix(vals.astype(np.uint64), bpv), _pack_uvarints(run_lens))
        return np.concatenate([head_rc, payload])
    if mode == MODE_DELTA_RLE:
        diffs = _diffs(signed)
        starts, run_lens = _runs(diffs)
        u = zigzag_encode(diffs[starts])
        diff_mat, _ = varint_byte_matrix(u, varint_lengths(u))
        head_rc = np.concatenate([head, np.frombuffer(np.uint32(len(starts)).tobytes(), dtype=np.uint8)])
        payload = _interleave_pairs((diff_mat, varint_lengths(u)), _pack_uvarints(run_lens))
        return np.concatenate([head_rc, payload])
    raise ValueError(f"unknown adaptive mode {mode}")


def _bitpack_indexes(indexes: np.ndarray, bits: int) -> np.ndarray:
    """LSB-first bit packing of palette indexes (v5_codec.cpp:209-227)."""
    if bits == 0:
        return np.zeros(0, dtype=np.uint8)
    n = len(indexes)
    total_bits = n * bits
    nbytes = (total_bits + 7) // 8
    bit_view = np.zeros(nbytes * 8, dtype=np.uint8)
    bit_pos = (np.arange(n, dtype=np.int64) * bits)[:, None] + np.arange(bits)[None, :]
    bit_val = (indexes[:, None].astype(np.uint64) >> np.arange(bits)[None, :].astype(np.uint64)) & np.uint64(1)
    bit_view[bit_pos.ravel()] = bit_val.ravel().astype(np.uint8)
    return np.packbits(bit_view.reshape(nbytes, 8), axis=1, bitorder="little").ravel()


def _bitunpack_indexes(data: np.ndarray, count: int, bits: int) -> np.ndarray:
    if bits == 0:
        return np.zeros(count, dtype=np.int64)
    bit_view = np.unpackbits(data, bitorder="little").astype(np.uint64)
    bit_pos = (np.arange(count, dtype=np.int64) * bits)[:, None] + np.arange(bits)[None, :]
    vals = (bit_view[bit_pos] << np.arange(bits)[None, :].astype(np.uint64)).sum(axis=1)
    return vals.astype(np.int64)


# ------------------------------------------------------------------ decode


def decode_section(
    field: AdaptiveField, data: np.ndarray, pos: int, out: np.ndarray, expected_points: int
) -> int:
    """Decode one adaptive section into the output rows; returns new position
    (reference: decodeV5AdaptiveIntSection, v5_codec.cpp:764-879)."""
    if pos >= len(data):
        raise ValueError("V5 adaptive int: missing mode byte")
    mode = int(data[pos])
    pos += 1
    if mode > MODE_DELTA_RLE:
        raise ValueError(f"V5 adaptive int: unknown mode byte {mode}")
    bpv = field.bytes_per_value
    dt = numpy_dtype(field.type)

    if mode == MODE_DELTA_VARINT:
        diffs, nan_mask, consumed = unpack_varints(data, expected_points, pos)
        if nan_mask.any():
            raise ValueError("decodeVarint: unexpected NaN marker")
        values = np.cumsum(diffs, dtype=np.int64)
        pos += consumed
    elif mode == MODE_PALETTE:
        count = int(data[pos]) | (int(data[pos + 1]) << 8)
        pos += 2
        if count == 0:
            raise ValueError("V5 adaptive int: empty palette")
        pal_bytes = data[pos : pos + count * bpv]
        if len(pal_bytes) < count * bpv:
            raise ValueError("V5 adaptive int: truncated palette")
        palette = _bytes_to_u64(pal_bytes, bpv)
        pos += count * bpv
        bits = _bits_for_palette(count)
        index_bytes = (bits * expected_points + 7) // 8
        if len(data) - pos < index_bytes:
            raise ValueError("V5 adaptive int: truncated palette indexes")
        idx = _bitunpack_indexes(data[pos : pos + index_bytes], expected_points, bits)
        if (idx >= count).any():
            raise ValueError("V5 adaptive int: palette index out of range")
        values = palette[idx].astype(np.int64)
        pos += index_bytes
    else:  # RLE / DeltaRle share the run structure
        run_count = int(np.frombuffer(data[pos : pos + 4].tobytes(), dtype=np.uint32)[0])
        pos += 4
        if mode == MODE_RLE:
            # (raw value bytes + uvarint length) pairs: raw bytes can carry
            # any MSB, so terminator counting alone cannot find boundaries —
            # instead the per-run successor (skip bpv, then to the next
            # terminator) is evaluated for ALL starts at once by binary
            # lifting, like the device mixed-stream decoder
            run_vals, run_lens, pos = _decode_rle_runs(data, pos, run_count, bpv)
            if run_lens.sum() != expected_points:
                raise ValueError("V5 adaptive int: RLE run count does not fill chunk")
            values = np.repeat(run_vals, run_lens).astype(np.int64)
        else:
            # the Delta-RLE payload is ALL varints (zigzag diff, uvarint run
            # length, alternating) — one vectorized boundary pass over
            # 2*run_count tokens instead of a per-run python loop
            from .varint import find_varint_boundaries, gather_varints, zigzag_decode

            starts, lengths = find_varint_boundaries(data, 2 * run_count, pos)
            u, nan_mask = gather_varints(data, starts, lengths)
            if nan_mask[0::2].any():
                raise ValueError("decodeVarint: unexpected NaN marker")
            run_diffs = zigzag_decode(u[0::2] - np.uint64(1))
            run_lens = u[1::2].astype(np.int64)  # raw uvarints: no bias
            if run_count:
                pos = int(starts[-1] + lengths[-1])
            if run_lens.sum() != expected_points:
                raise ValueError("V5 adaptive int: Delta-RLE run count does not fill chunk")
            diffs = np.repeat(run_diffs, run_lens)
            values = np.cumsum(diffs, dtype=np.int64)

    from ..core.types import DECODE_BUT_SKIP_STORE

    if field.offset != DECODE_BUT_SKIP_STORE:
        vals = values.astype(dt)
        b = vals.reshape(-1, 1).view(np.uint8)
        out[:, field.offset : field.offset + dt.itemsize] = b.reshape(expected_points, dt.itemsize)
    return pos


def _decode_rle_runs(data: np.ndarray, pos: int, run_count: int, bpv: int):
    """Vectorized parse of run_count (raw value + uvarint length) pairs.
    Returns (values u64, lengths i64, new pos)."""
    if run_count == 0:
        return np.zeros(0, np.uint64), np.zeros(0, np.int64), pos
    n = len(data)
    idx = np.arange(n - pos, dtype=np.int64)
    view = data[pos:]
    # nt[b] = offset (from pos) of the first terminator byte at-or-after b
    term_at = np.where((view & np.uint8(0x80)) == 0, idx, n - pos)
    nt = np.minimum.accumulate(term_at[::-1])[::-1]
    # successor of a run start = skip bpv value bytes, consume one uvarint
    lim = n - pos
    probe = np.minimum(idx + bpv, lim - 1) if lim else idx
    succ = np.where(idx + bpv >= lim, lim, np.minimum(nt[probe] + 1, lim))
    succ = np.append(succ, lim)  # fixpoint at lim
    # run starts = succ^k(0) for all k, by binary lifting
    ks = np.arange(run_count)
    fk = succ
    cur = np.zeros(run_count, dtype=np.int64)
    bit = 1
    while bit <= run_count:
        take = (ks & bit) != 0
        if take.any():
            cur = np.where(take, fk[cur], cur)
        fk = fk[np.minimum(fk, lim)]
        bit <<= 1
    starts = cur
    uv_starts = starts + bpv
    if np.any(uv_starts >= lim):
        raise ValueError("V5 adaptive int: truncated RLE value")
    uv_ends = nt[uv_starts]
    if np.any(uv_ends >= lim):
        raise ValueError("V5 adaptive int: truncated RLE value")
    uv_lens = uv_ends - uv_starts + 1
    if np.any(uv_lens > 10):
        raise ValueError("varint too long (overflow)")
    vals = _bytes_to_u64(
        view[(starts[:, None] + np.arange(bpv)[None, :]).ravel()], bpv
    )
    from .varint import gather_varints

    u, _ = gather_varints(data, (uv_starts + pos), uv_lens.astype(np.int32))
    new_pos = pos + int(uv_starts[-1] + uv_lens[-1])
    return vals, u.astype(np.int64), new_pos


def _bytes_to_u64(data: np.ndarray, bpv: int) -> np.ndarray:
    mat = np.asarray(data, dtype=np.uint8).reshape(-1, bpv).astype(np.uint64)
    shifts = (np.uint64(8) * np.arange(bpv, dtype=np.uint64))[None, :]
    return (mat << shifts).sum(axis=1, dtype=np.uint64)


def _read_uvarint(data: np.ndarray, pos: int) -> Tuple[int, int]:
    value = 0
    shift = 0
    while True:
        if pos >= len(data):
            raise ValueError("V5 adaptive int: truncated unsigned varint")
        b = int(data[pos])
        pos += 1
        value |= (b & 0x7F) << shift
        if (b & 0x80) == 0:
            return value, pos
        shift += 7
        if shift >= 64:
            raise ValueError("V5 adaptive int: unsigned varint overflow")
