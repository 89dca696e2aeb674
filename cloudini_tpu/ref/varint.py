"""Vectorized zigzag-varint codec (numpy) — the wire kernel of truth.

Wire rules (reference: encoding_utils.hpp:55-67, 98-148):
  * signed value -> zigzag ``(v << 1) ^ (v >> 63)`` -> ``+1`` (raw 0 is reserved
    as the NaN marker byte for lossy float fields)
  * little-endian base-128 groups, MSB = continuation

Everything here is columnar and branch-free so the same algorithm lifts directly
onto the TPU VPU (see cloudini_tpu/ops/varint_pack.py). The parallel decode uses
the terminator-mask prefix-sum trick: a varint ends at any byte with MSB==0, so
boundaries of a pure-varint stream are discoverable without a sequential scan.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

MAX_VARINT_BYTES = 10

# thresholds[k] = 2**(7*(k+1)); a value u needs k+1 bytes iff u >= thresholds[k-1]
_THRESHOLDS = np.array([1 << (7 * k) for k in range(1, 10)], dtype=np.uint64)


def zigzag_encode(values: np.ndarray) -> np.ndarray:
    """int64 -> uint64 zigzag, plus one (0 reserved for NaN)."""
    v = values.astype(np.int64, copy=False)
    u = (v.astype(np.uint64) << np.uint64(1)) ^ (v >> np.int64(63)).astype(np.uint64)
    return u + np.uint64(1)


def zigzag_decode(u: np.ndarray) -> np.ndarray:
    """uint64 (already minus the NaN reservation) -> int64."""
    u = u.astype(np.uint64, copy=False)
    return ((u >> np.uint64(1)) ^ (-(u & np.uint64(1)).astype(np.int64)).astype(np.uint64)).astype(np.int64)


def varint_lengths(u: np.ndarray) -> np.ndarray:
    """Encoded byte count per value (u is the biased zigzag value, >= 1)."""
    u = u.astype(np.uint64, copy=False)
    # length = 1 + number of thresholds <= u  (u >= 2**(7k) needs more than k bytes)
    lengths = np.ones(u.shape, dtype=np.int32)
    for t in _THRESHOLDS:
        lengths += (u >= t).astype(np.int32)
    return lengths


def varint_byte_matrix(u: np.ndarray, lengths: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Expand each biased value into its (N, 10) byte matrix plus validity mask.

    byte[k] = (u >> 7k) & 0x7F, with the continuation bit set for k < len-1.
    """
    u = u.astype(np.uint64, copy=False)
    n = u.shape[0]
    k = np.arange(MAX_VARINT_BYTES, dtype=np.uint64)
    groups = (u[:, None] >> (np.uint64(7) * k[None, :])) & np.uint64(0x7F)
    valid = k[None, :] < lengths[:, None].astype(np.uint64)
    cont = k[None, :] < (lengths[:, None].astype(np.uint64) - np.uint64(1))
    bytes_mat = (groups | np.where(cont, np.uint64(0x80), np.uint64(0))).astype(np.uint8)
    return np.where(valid, bytes_mat, np.uint8(0)), valid


def pack_varints(values: np.ndarray, nan_mask: np.ndarray | None = None) -> np.ndarray:
    """Encode a flat array of signed int64 values to a contiguous byte stream.

    ``nan_mask`` marks entries emitted as the single NaN marker byte 0
    (reference: field_encoder.hpp:343-357).
    """
    u = zigzag_encode(values)
    lengths = varint_lengths(u)
    if nan_mask is not None:
        u = np.where(nan_mask, np.uint64(0), u)
        lengths = np.where(nan_mask, np.int32(1), lengths)
    bytes_mat, valid = varint_byte_matrix(u, lengths)
    if nan_mask is not None:
        # NaN marker: single 0 byte (valid stays 1 slot because length==1)
        bytes_mat[:, 0] = np.where(nan_mask, np.uint8(0), bytes_mat[:, 0])
    return bytes_mat[valid]


def scatter_pack(bytes_mat: np.ndarray, valid: np.ndarray, out: np.ndarray, out_offset: int = 0) -> int:
    """Compact the (N, 10) byte matrix into ``out`` starting at ``out_offset``.
    Returns number of bytes written."""
    flat = bytes_mat[valid]
    out[out_offset : out_offset + flat.size] = flat
    return int(flat.size)


def find_varint_boundaries(stream: np.ndarray, count: int, start: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Locate the first ``count`` varints in a pure-varint byte stream.

    Returns (starts, lengths). Fully parallel: terminator bytes (MSB==0) mark
    ends; starts follow from an exclusive scan of the terminator mask.
    """
    if count == 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int32)
    view = stream[start:]
    terminator = (view & np.uint8(0x80)) == 0
    ends = np.flatnonzero(terminator)
    if ends.size < count:
        raise ValueError("truncated varint stream")
    ends = ends[:count]
    starts = np.empty(count, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    if np.any(lengths > MAX_VARINT_BYTES):
        raise ValueError("varint too long (overflow)")
    return starts + start, lengths.astype(np.int32)


def gather_varints(stream: np.ndarray, starts: np.ndarray, lengths: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Assemble biased uint64 values from boundary info. Returns (u, nan_mask)
    where nan_mask marks the reserved raw-0 marker."""
    n = starts.shape[0]
    u = np.zeros(n, dtype=np.uint64)
    max_len = int(lengths.max()) if n else 0
    for k in range(max_len):
        in_range = k < lengths
        idx = np.where(in_range, starts + k, 0)
        b = stream[idx].astype(np.uint64)
        u |= np.where(in_range, (b & np.uint64(0x7F)) << np.uint64(7 * k), np.uint64(0))
    nan_mask = u == 0
    return u, nan_mask


def unpack_varints(stream: np.ndarray, count: int, start: int = 0) -> Tuple[np.ndarray, np.ndarray, int]:
    """Decode ``count`` varints; returns (int64 values, nan_mask, bytes_consumed).
    NaN-marker entries decode to value 0 with nan_mask set."""
    starts, lengths = find_varint_boundaries(stream, count, start)
    u, nan_mask = gather_varints(stream, starts, lengths)
    values = zigzag_decode(np.where(nan_mask, np.uint64(1), u) - np.uint64(1))
    values = np.where(nan_mask, np.int64(0), values)
    consumed = int(starts[-1] + lengths[-1] - start) if count else 0
    return values, nan_mask, consumed


# --- scalar helpers (used by tests and cold paths) ---------------------------------


def encode_varint64_scalar(value: int) -> bytes:
    """Reference-equivalent scalar encoder (encoding_utils.hpp:55-67).
    Note INT64_MIN zigzags to 2**64-1 and the +1 bias wraps to 0, emitting the
    NaN-marker byte — faithfully matching the reference's wraparound."""
    u = (((value << 1) ^ (value >> 63)) + 1) & 0xFFFFFFFFFFFFFFFF
    out = bytearray()
    while u > 0x7F:
        out.append((u & 0x7F) | 0x80)
        u >>= 7
    out.append(u)
    return bytes(out)


def decode_varint_scalar(buf: bytes, pos: int = 0) -> Tuple[int, int]:
    """Returns (value, bytes_consumed); raises on NaN marker like the reference."""
    u = 0
    shift = 0
    count = 0
    while True:
        if pos + count >= len(buf):
            raise ValueError("decodeVarint: truncated input")
        b = buf[pos + count]
        count += 1
        u |= (b & 0x7F) << shift
        if (b & 0x80) == 0:
            break
        shift += 7
        if shift >= 64:
            raise ValueError("decodeVarint: value overflow")
    if u == 0:
        raise ValueError("decodeVarint: unexpected NaN marker")
    u -= 1
    val = (u >> 1) ^ (-(u & 1))
    return val, count
