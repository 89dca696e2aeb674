"""V5 adaptive-int sections on device.

The committed mode is per-(cloud, field) scalar state decided once from the
first chunk's 4096-point probe (host, cheap) and then *static* for the jitted
program — each (plan, committed-modes) pair compiles its own emission kernels.
Sections are columnar by construction (appended after the interleaved regular
stream), so everything here is plain batched vector work:

  * DeltaVarint: diff pairs -> zigzag varint tokens -> prefix-sum compaction
  * Rle / DeltaRle: run boundaries -> run-id scatter compaction -> interleaved
    (value|diff, uvarint run-length) token pairs
  * Palette: lexicographic u32-pair sort + first-occurrence ranking (the
    vectorized equivalent of the reference's insertion-order hash table,
    v5_codec.cpp:326-379) + dynamic-width LSB-first bit packing

All shapes are static; run counts / palette sizes are runtime scalars carried
in the section bytes.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.plan import AdaptiveField
from ..core.types import FieldType
from . import u64
from .device_codec import _zigzag64_tokens

MODE_DELTA_VARINT = 0
MODE_PALETTE = 1
MODE_RLE = 2
MODE_DELTA_RLE = 3


def _extract_pair(field: AdaptiveField, rows: jnp.ndarray) -> Tuple[u64.U64, u64.U64]:
    """(signed pair, zero-extended raw pair) like the reference's dual views."""
    width = field.bytes_per_value
    signed_types = (FieldType.INT16, FieldType.INT32, FieldType.INT64)
    b = rows[..., field.offset : field.offset + width]
    signed = u64.from_bytes(b, width, FieldType(field.type) in signed_types)
    raw = u64.from_bytes(b, width, False)
    return signed, raw


def _diff_pair(v: u64.U64, valid: jnp.ndarray) -> u64.U64:
    """d[i] = v[i] - v[i-1], d[0] = v[0]; invalid lanes zeroed."""
    prev = u64.roll_prev(v)
    d = u64.sub(v, prev)
    zero = u64.const(0, valid.shape)
    return u64.select(valid, d, zero)


def _uvarint_tokens(v: u64.U64, valid: jnp.ndarray):
    """Unsigned varint tokens (no zigzag/bias) for run lengths
    (v5_codec.cpp:160-174)."""
    lengths = jnp.where(valid, u64.varint_lengths(v), 0)
    lanes = [
        u64.varint_group(v, k).astype(jnp.uint32)
        | jnp.where(k < lengths - 1, np.uint32(0x80), np.uint32(0))
        for k in range(10)
    ]
    return lanes, lengths


def _raw_tokens(v: u64.U64, width: int, valid: jnp.ndarray):
    lanes = [u64.byte_lane(v, k) for k in range(width)]
    lengths = jnp.where(valid, width, 0).astype(jnp.int32)
    return lanes, lengths


def _compact_streams(streams, base: int, max_bytes: int):
    """Token streams (per element, in element order) -> contiguous bytes
    starting at offset ``base`` of a (C, max_bytes) buffer + total size.

    ONE single-word sort: each valid token byte keys on its destination
    offset with the byte value packed in the key's low 8 bits; invalid lanes
    key to 2^32-1 and fall off the tail (see
    device_codec._interleave_scatter for the movement-cost rationale)."""
    # streams hold per-lane 2D (C, N) byte arrays (see device_codec's
    # _zigzag32_tokens for why 3D (C, N, L) tensors are banned on TPU)
    elem_sizes = streams[0][1]
    for _, ln in streams[1:]:
        elem_sizes = elem_sizes + ln
    elem_off = jnp.cumsum(elem_sizes, axis=-1) - elem_sizes
    c = elem_sizes.shape[0]
    # byte-in-key packing needs positions < 2^24 (same guard as
    # device_codec._interleave_scatter); two-word fallback otherwise
    packed = max_bytes < (1 << 24)
    keys = []
    vals = []
    intra = None
    for lanes, ln in streams:
        tok_start = base + elem_off if intra is None else base + elem_off + intra
        intra = ln if intra is None else intra + ln
        for k, lane in enumerate(lanes):
            pos = tok_start + k
            if packed:
                key_l = (pos.astype(jnp.uint32) << 8) | lane.astype(jnp.uint32)
            else:
                key_l = pos.astype(jnp.uint32)
                vals.append(lane.astype(jnp.uint8))
            keys.append(jnp.where(k < ln, key_l, np.uint32(0xFFFFFFFF)))
    key = jnp.concatenate(keys, axis=-1)
    if packed:
        stream = (jax.lax.sort(key, dimension=1, is_stable=False) & np.uint32(0xFF)).astype(jnp.uint8)
    else:
        _, stream = jax.lax.sort(
            (key, jnp.concatenate(vals, axis=-1)), dimension=1, num_keys=1,
            is_stable=False,
        )
    # sorted lane j holds the byte for position base+j: shift right by base
    # (static) and pad/trim to the section buffer width
    stream = jnp.concatenate([jnp.zeros((c, base), jnp.uint8), stream], axis=-1)
    slots = stream.shape[1]
    if slots < max_bytes:
        stream = jnp.concatenate(
            [stream, jnp.zeros((c, max_bytes - slots), jnp.uint8)], axis=-1
        )
    out = stream[:, :max_bytes]
    total = base + elem_sizes.sum(axis=-1).astype(jnp.int32)
    # zero the tail (incl. the header area [0, base) rewritten by _with_header)
    idx = jnp.arange(max_bytes, dtype=np.int32)[None, :]
    out = jnp.where(idx < total[:, None], out, 0)
    return out, total


def _with_header(section: jnp.ndarray, mode: int, run_count: jnp.ndarray | None):
    """Write the mode byte (and u32 run count) into the section head."""
    section = section.at[:, 0].set(np.uint8(mode))
    if run_count is not None:
        for k in range(4):
            section = section.at[:, 1 + k].set(
                ((run_count >> (8 * k)) & 0xFF).astype(jnp.uint8)
            )
    return section


def encode_delta_varint(field: AdaptiveField, rows, valid, max_bytes: int):
    signed, _ = _extract_pair(field, rows)
    d = _diff_pair(signed, valid)
    mat, ln = _zigzag64_tokens(d, None, valid)
    out, size = _compact_streams([(mat, ln)], 1, max_bytes)
    return _with_header(out, MODE_DELTA_VARINT, None), size


def _run_structure(key_lo, key_hi, valid):
    """Boundary mask / run ids / run count over the valid prefix."""
    prev_lo = jnp.roll(key_lo, 1, axis=-1)
    prev_hi = jnp.roll(key_hi, 1, axis=-1)
    boundary = (key_lo != prev_lo) | (key_hi != prev_hi)
    boundary = boundary.at[..., 0].set(True) & valid
    run_id = jnp.cumsum(boundary.astype(jnp.int32), axis=-1) - 1
    run_count = boundary.sum(axis=-1).astype(jnp.int32)
    return boundary, run_id, run_count


def _compact_runs(values: u64.U64, boundary, run_id, valid, n_points: int):
    """Scatter run representatives (value at boundary) and run lengths into
    run-id-indexed compact arrays (padded to n_points)."""
    c = boundary.shape[0]
    c_idx = jnp.arange(c, dtype=np.int32)[:, None]
    idx = jnp.broadcast_to(jnp.arange(n_points, dtype=jnp.int32), boundary.shape)
    # non-boundary lanes park at unique scratch slots (see _compact_streams)
    slot = jnp.where(boundary, run_id, n_points + idx)
    run_lo = jnp.zeros((c, 2 * n_points), jnp.uint32).at[c_idx, slot].set(values[0])[:, :n_points]
    run_hi = jnp.zeros((c, 2 * n_points), jnp.uint32).at[c_idx, slot].set(values[1])[:, :n_points]
    run_start = jnp.zeros((c, 2 * n_points), jnp.int32).at[c_idx, slot].set(idx)[:, :n_points]
    n_valid = valid.sum(axis=-1).astype(jnp.int32)
    run_count = boundary.sum(axis=-1).astype(jnp.int32)
    run_ids = jnp.arange(n_points, dtype=jnp.int32)
    next_start = jnp.where(
        run_ids[None, :] + 1 < run_count[:, None],
        jnp.roll(run_start, -1, axis=-1),
        n_valid[:, None],
    )
    run_len = jnp.where(run_ids[None, :] < run_count[:, None], next_start - run_start, 0)
    return (run_lo, run_hi), run_len, run_count


def encode_rle(field: AdaptiveField, rows, valid, max_bytes: int):
    """mode byte + u32 run count + (raw value bytes + uvarint run length)*."""
    _, raw = _extract_pair(field, rows)
    n = rows.shape[-2]
    boundary, run_id, _ = _run_structure(raw[0], raw[1], valid)
    run_vals, run_len, run_count = _compact_runs(raw, boundary, run_id, valid, n)
    run_valid = jnp.arange(n, dtype=jnp.int32)[None, :] < run_count[:, None]
    val_tokens = _raw_tokens(run_vals, field.bytes_per_value, run_valid)
    len_tokens = _uvarint_tokens((run_len.astype(jnp.uint32), jnp.zeros_like(run_len, jnp.uint32)), run_valid)
    out, size = _compact_streams([val_tokens, len_tokens], 5, max_bytes)
    return _with_header(out, MODE_RLE, run_count), size


def encode_delta_rle(field: AdaptiveField, rows, valid, max_bytes: int):
    """Runs of equal consecutive diffs (v5_codec.cpp:269-298)."""
    signed, _ = _extract_pair(field, rows)
    d = _diff_pair(signed, valid)
    n = rows.shape[-2]
    boundary, run_id, _ = _run_structure(d[0], d[1], valid)
    run_diffs, run_len, run_count = _compact_runs(d, boundary, run_id, valid, n)
    run_valid = jnp.arange(n, dtype=jnp.int32)[None, :] < run_count[:, None]
    diff_tokens = _zigzag64_tokens(run_diffs, None, run_valid)
    len_tokens = _uvarint_tokens((run_len.astype(jnp.uint32), jnp.zeros_like(run_len, jnp.uint32)), run_valid)
    out, size = _compact_streams([diff_tokens, len_tokens], 5, max_bytes)
    return _with_header(out, MODE_DELTA_RLE, run_count), size


def encode_palette(field: AdaptiveField, rows, valid, max_bytes: int):
    """mode byte + u16 count + palette values (first-occurrence order) +
    LSB-first bit-packed indexes with runtime bit width."""
    _, raw = _extract_pair(field, rows)
    c, n = valid.shape
    c_idx = jnp.arange(c, dtype=np.int32)[:, None]
    idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (c, n))
    # invalid entries sort to the end (max key)
    lo = jnp.where(valid, raw[0], np.uint32(0xFFFFFFFF))
    hi = jnp.where(valid, raw[1], np.uint32(0xFFFFFFFF))
    s_hi, s_lo, s_idx = jax.lax.sort((hi, lo, idx), dimension=-1, num_keys=3, is_stable=False)
    s_valid = jnp.take_along_axis(valid, s_idx, axis=-1)
    prev_lo = jnp.roll(s_lo, 1, axis=-1)
    prev_hi = jnp.roll(s_hi, 1, axis=-1)
    boundary = ((s_lo != prev_lo) | (s_hi != prev_hi)).at[..., 0].set(True) & s_valid
    group_id = jnp.cumsum(boundary.astype(jnp.int32), axis=-1) - 1  # sorted-group rank
    count = boundary.sum(axis=-1).astype(jnp.int32)
    # group's first-occurrence original index = s_idx at the boundary (num_keys=3
    # sorts by idx within equal values). Non-boundary lanes park at unique
    # scratch slots [n, 2n) to keep the TPU scatter collision-free.
    slot = jnp.where(boundary, group_id, n + idx)
    grp_first = (
        jnp.full((c, 2 * n), 2**30, jnp.int32).at[c_idx, slot].set(s_idx)[:, :n]
    )
    grp_lo = jnp.zeros((c, 2 * n), jnp.uint32).at[c_idx, slot].set(s_lo)[:, :n]
    grp_hi = jnp.zeros((c, 2 * n), jnp.uint32).at[c_idx, slot].set(s_hi)[:, :n]
    # palette order = groups sorted by first occurrence
    p_first, p_lo, p_hi, p_gid = jax.lax.sort(
        (grp_first, grp_lo, grp_hi, jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (c, n))),
        dimension=-1, num_keys=1, is_stable=False,
    )
    # rank of each sorted-group in palette order (unique scratch parking)
    rank = jnp.zeros((c, 2 * n), jnp.int32).at[
        c_idx, jnp.where(jnp.arange(n)[None, :] < count[:, None], p_gid, n + idx)
    ].set(jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (c, n)))[:, :n]
    # per-element palette index, back in original order
    elem_rank_sorted = jnp.take_along_axis(rank, jnp.maximum(group_id, 0), axis=-1)
    indexes = jnp.zeros((c, 2 * n), jnp.int32).at[
        c_idx, jnp.where(s_valid, s_idx, n + idx)
    ].set(elem_rank_sorted)[:, :n]

    # bits per index (0 when count <= 1)
    count_m1 = jnp.maximum(count - 1, 0)
    bits = 32 - jax.lax.clz(jnp.maximum(count_m1, 1).astype(jnp.int32))
    bits = jnp.where(count_m1 > 0, bits, 0).astype(jnp.int32)

    width = field.bytes_per_value
    n_valid = valid.sum(axis=-1).astype(jnp.int32)
    max_ib = 16  # palette count <= 32768 -> bits <= 15

    # header: mode byte + u16 count. Inactive scatter lanes park at unique
    # scratch slots past max_bytes (see _compact_streams); sliced off below.
    scratch = n * max(width, max_ib)
    out = jnp.zeros((c, max_bytes + scratch), jnp.uint8)
    out = out.at[:, 0].set(np.uint8(MODE_PALETTE))
    out = out.at[:, 1].set((count & 0xFF).astype(jnp.uint8))
    out = out.at[:, 2].set(((count >> 8) & 0xFF).astype(jnp.uint8))

    # palette values at fixed stride after the header
    pal_valid = jnp.arange(n, dtype=jnp.int32)[None, :] < count[:, None]
    pal_bytes = u64.to_bytes((p_lo, p_hi), width)  # (c, n, width)
    ks = np.arange(width, dtype=np.int32)
    pos = 3 + jnp.arange(n, dtype=jnp.int32)[None, :, None] * width + ks
    park_val = max_bytes + jnp.arange(n * width, dtype=np.int32).reshape(n, width)
    pos = jnp.where(pal_valid[..., None], pos, park_val)
    out = out.at[c_idx, pos.reshape(c, -1)].set(pal_bytes.reshape(c, -1), mode="drop")

    # bit-packed indexes: bit b of element i lands at bit (i*bits + b) of the
    # index area starting at 3 + count*width
    index_base = 3 + count * width  # (c,)
    ib = np.arange(max_ib, dtype=np.int32)
    elem_bit = (indexes[..., None] >> ib) & 1  # (c, n, 16)
    bitpos = jnp.arange(n, dtype=jnp.int32)[None, :, None] * bits[:, None, None] + ib
    bit_valid = (ib[None, None, :] < bits[:, None, None]) & valid[..., None]
    byte_pos = index_base[:, None, None] + (bitpos >> 3)
    park_bit = max_bytes + jnp.arange(n * max_ib, dtype=np.int32).reshape(n, max_ib)
    byte_pos = jnp.where(bit_valid, byte_pos, park_bit)
    # OR bits into bytes: scatter-add works because each (byte,bitslot) is unique
    contrib = jnp.where(bit_valid, elem_bit << (bitpos & 7), 0).astype(jnp.uint8)
    out = out.at[c_idx, byte_pos.reshape(c, -1)].add(contrib.reshape(c, -1), mode="drop")

    index_bytes = (bits * n_valid + 7) // 8
    size = index_base + index_bytes
    return out[:, :max_bytes], size.astype(jnp.int32)


def encode_section_device(field: AdaptiveField, mode: int, rows, valid, max_bytes: int):
    if mode == MODE_DELTA_VARINT:
        return encode_delta_varint(field, rows, valid, max_bytes)
    if mode == MODE_RLE:
        return encode_rle(field, rows, valid, max_bytes)
    if mode == MODE_DELTA_RLE:
        return encode_delta_rle(field, rows, valid, max_bytes)
    if mode == MODE_PALETTE:
        return encode_palette(field, rows, valid, max_bytes)
    raise ValueError(f"unknown adaptive mode {mode}")


def section_max_bytes(field: AdaptiveField, chunk_points: int) -> int:
    """Static worst-case section size — single source of truth is the field
    itself (core/plan.py AdaptiveField.section_max_bytes), shared with the
    host decompression bound so device scratch and host limits never drift."""
    return field.section_max_bytes(chunk_points)
