"""Device decode of V5 adaptive-int sections (reference:
decodeV5AdaptiveIntSection, v5_codec.cpp:764-879; numpy kernel of truth
ref/v5.py:decode_section).

Sections follow the interleaved regular stream inside the same stage-1
buffer, so their start offsets are RUNTIME values (the regular decoder's
``consumed``); each section also ends at a data-dependent offset, so fields
chain on device. Per wire mode:

  * DeltaVarint (0): one varint stream of n_valid zigzag diffs — the
    terminator scan+sort compaction generalized to a dynamic start offset,
    then an un-delta prefix sum.
  * Rle (2): (raw value bytes + uvarint run length) pairs — a fixed+varint
    token chain, solved by the same enumerative FSM as the regular mixed
    streams (ops/fsm.py, dynamic-start variant); runs expand to elements by
    scatter-at-run-start + hold-last.
  * DeltaRle (3): all-varint (zigzag diff, uvarint length) pairs — the
    dynamic-start varint scan with alternating token roles, run expansion,
    then the un-delta prefix sum.
  * Palette (1): u16 count + raw palette + LSB-first bit-packed indexes with
    runtime bit width — arithmetic positions; the index-bit and palette-value
    fetches are the one place this file gathers (sections are far smaller
    than the regular stream; revisit if profiles say otherwise).

The mode byte is per chunk on the wire. Conformant streams commit one mode
per (cloud, field) (v5_codec.cpp:934-948), so the device dispatches one
lax.switch on chunk 0's mode and flags any chunk whose mode differs with the
RETRY sentinel — the pipeline re-decodes those chunks host-side instead of
failing (adversarial streams stay decodable, just not fast).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.plan import AdaptiveField
from ..core.types import DECODE_BUT_SKIP_STORE, FieldType
from . import columns as C
from . import u64

_U32 = jnp.uint32
_INF = np.uint32(0xFFFFFFFF)

MODE_DELTA_VARINT = 0
MODE_PALETTE = 1
MODE_RLE = 2
MODE_DELTA_RLE = 3

# consumed-sentinel: decode must be retried on the host (valid-but-unusual
# stream shapes, e.g. per-chunk mode divergence); distinct from the
# corrupt-stream sentinel 2^31-1
RETRY = np.int32(2**31 - 2)


def _byte_at(payloads: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
    """payloads (C, B); pos (C,) -> (C,) i32 (clamped gather of one byte)."""
    p = jnp.clip(pos, 0, payloads.shape[1] - 1)
    return jnp.take_along_axis(payloads, p[:, None], axis=1)[:, 0].astype(jnp.int32)


def _u32_at(payloads: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
    v = jnp.zeros(pos.shape, jnp.int32)
    for k in range(4):
        v = v | (_byte_at(payloads, pos + k) << (8 * k))
    return v


def _varint_stream(payloads, sizes, tstart, n_tokens, max_tokens: int):
    """Zigzag-agnostic varint stream at a dynamic start: returns
    (biased (C, max_tokens) u64 pair in token order, consumed-from-tstart
    (C,), bad (C,)). ``biased`` is the raw assembled group value (mod 2^64);
    callers apply bias/zigzag per their wire role."""
    Cn, B = payloads.shape
    idx = jnp.arange(B, dtype=jnp.int32)[None, :]
    in_window = (idx >= tstart[:, None]) & (idx < sizes[:, None])
    term = ((payloads & 0x80) == 0) & in_window
    csum_term = jnp.cumsum(term.astype(jnp.int32), axis=-1)
    tok_id = csum_term - term.astype(jnp.int32)
    pt = jax.lax.cummax(jnp.where(term, idx, -1), axis=1)
    pt_excl = jnp.concatenate([jnp.full((Cn, 1), -1, jnp.int32), pt[:, :-1]], axis=-1)
    pos = idx - jnp.maximum(pt_excl, tstart[:, None] - 1) - 1
    over = jnp.any(in_window & (pos >= 10), axis=-1)
    g = (payloads & np.uint8(0x7F)).astype(_U32)
    posc = jnp.clip(pos, 0, 9)
    sh = posc * 7
    lo = jnp.where(sh < 32, g << jnp.clip(sh, 0, 31).astype(_U32), 0)
    hi = jnp.where(sh >= 32, g << jnp.clip(sh - 32, 0, 31).astype(_U32),
                   jnp.where(sh > 25, g >> jnp.clip(32 - sh, 0, 31).astype(_U32), 0))
    mask = in_window
    run = u64.cumsum((jnp.where(mask, lo, 0), jnp.where(mask, hi, 0)))
    needed = term & (tok_id < n_tokens[:, None])
    key = jnp.where(needed, tok_id.astype(_U32), _INF)
    ops = [key, run[0], run[1]]
    if B < max_tokens:
        ops = [jnp.concatenate([o, jnp.full((Cn, max_tokens - B),
                                            _INF if i == 0 else 0, o.dtype)], axis=-1)
               for i, o in enumerate(ops)]
    s_key, s_lo, s_hi = jax.lax.sort(tuple(ops), dimension=1, num_keys=1,
                                     is_stable=False)
    s_lo, s_hi = s_lo[:, :max_tokens], s_hi[:, :max_tokens]
    p_lo = jnp.roll(s_lo, 1, axis=-1).at[:, 0].set(0)
    p_hi = jnp.roll(s_hi, 1, axis=-1).at[:, 0].set(0)
    biased = u64.sub((s_lo, s_hi), (p_lo, p_hi))
    found = jnp.sum(needed.astype(jnp.int32), axis=-1)
    bad = over | (found < n_tokens)
    consumed = jnp.sum((in_window & (tok_id < n_tokens[:, None])).astype(jnp.int32),
                       axis=-1)
    return biased, consumed, bad


def _unzig(biased: u64.U64) -> Tuple[u64.U64, jnp.ndarray]:
    """Wire zigzag+1-bias decode: (value, nan_marker)."""
    nan = u64.is_zero(biased)
    uu = u64.sub(biased, u64.select(nan, u64.const(0, nan.shape), u64.const(1, nan.shape)))
    v = u64.unzigzag(uu)
    return u64.select(nan, u64.const(0, nan.shape), v), nan


def _expand_runs(run_vals: u64.U64, run_lens: jnp.ndarray, run_count: jnp.ndarray,
                 n_points: int):
    """Repeat run_vals[r] run_lens[r] times into (C, n_points): scatter each
    run's value at its start position, then hold-last fill. Inactive lanes
    park at unique scratch slots (TPU scatter collision rule)."""
    Cn, N = run_lens.shape
    starts = jnp.cumsum(run_lens, axis=-1) - run_lens  # exclusive
    run_ids = jnp.arange(N, dtype=jnp.int32)[None, :]
    rvalid = run_ids < run_count[:, None]
    c_idx = jnp.arange(Cn, dtype=jnp.int32)[:, None]
    slot = jnp.where(rvalid & (run_lens > 0), starts, n_points + run_ids)
    lo = jnp.zeros((Cn, n_points + N), _U32).at[c_idx, slot].set(run_vals[0])[:, :n_points]
    hi = jnp.zeros((Cn, n_points + N), _U32).at[c_idx, slot].set(run_vals[1])[:, :n_points]
    mark = jnp.zeros((Cn, n_points + N), bool).at[c_idx, slot].set(True)[:, :n_points]
    # hold-last fill along points
    idx = jnp.arange(n_points, dtype=jnp.int32)
    seen = mark
    k = 1
    while k < n_points:
        p_seen = jnp.roll(seen, k, axis=-1) & (idx >= k)
        lo = jnp.where(seen, lo, jnp.where(idx >= k, jnp.roll(lo, k, axis=-1), 0))
        hi = jnp.where(seen, hi, jnp.where(idx >= k, jnp.roll(hi, k, axis=-1), 0))
        seen = seen | p_seen
        k *= 2
    return lo, hi


class SectionDecoder:
    """Per-field device section decoder; ``decode`` chains fields at runtime
    offsets and stores columns into the row buffer."""

    def __init__(self, field: AdaptiveField, chunk_points: int):
        self.field = field
        self.chunk_points = chunk_points
        self.bpv = field.bytes_per_value

    def decode(self, payloads, sizes, start, n_valid, out):
        """-> (out, consumed (C,) bytes from ``start``, bad (C,), retry (C,))"""
        N = self.chunk_points
        mode_c = _byte_at(payloads, start)
        mode0 = jnp.clip(mode_c[0], 0, 3)
        retry = mode_c != mode_c[0]
        bad = (mode_c > MODE_DELTA_RLE) | (start >= sizes)

        vals, consumed, b = jax.lax.switch(
            mode0,
            [self._delta_varint, self._palette, self._rle, self._delta_rle],
            payloads, sizes, start, n_valid,
        )
        bad = bad | b
        out = self._store(vals, out)
        return out, consumed, bad, retry

    # ------------------------------------------------------------- modes

    def _delta_varint(self, payloads, sizes, start, n_valid):
        N = self.chunk_points
        biased, consumed, bad = _varint_stream(payloads, sizes, start + 1, n_valid, N)
        v, nan = _unzig(biased)
        pts = jnp.arange(N, dtype=jnp.int32)[None, :] < n_valid[:, None]
        bad = bad | jnp.any(nan & pts, axis=-1)  # NaN marker illegal here
        vals = u64.cumsum(v)
        return vals, consumed + 1, bad

    def _delta_rle(self, payloads, sizes, start, n_valid):
        N = self.chunk_points
        run_count = _u32_at(payloads, start + 1)
        rc = jnp.clip(run_count, 0, N)
        biased, consumed, bad = _varint_stream(payloads, sizes, start + 5, 2 * rc, 2 * N)
        bad = bad | (run_count > N)
        v, nan = _unzig((biased[0][:, 0::2], biased[1][:, 0::2]))  # diffs
        lens = biased[0][:, 1::2].astype(jnp.int32)  # raw uvarints
        pts = jnp.arange(N, dtype=jnp.int32)[None, :] < rc[:, None]
        bad = bad | jnp.any(nan & pts, axis=-1)
        lens = jnp.where(pts, lens, 0)
        bad = bad | (jnp.sum(lens, axis=-1) != n_valid)
        d_lo, d_hi = _expand_runs(v, lens, rc, N)
        vals = u64.cumsum((d_lo, d_hi))
        return vals, consumed + 5, bad

    def _rle(self, payloads, sizes, start, n_valid):
        from ..core.plan import CodecPlan, CodecUnit, UnitKind
        from .fsm import FsmLayout, run_fsm

        N = self.chunk_points
        bpv = self.bpv
        run_count = _u32_at(payloads, start + 1)
        rc = jnp.clip(run_count, 0, N)
        width_type = {2: FieldType.UINT16, 4: FieldType.UINT32, 8: FieldType.UINT64}[bpv]
        plan = CodecPlan(
            units=(CodecUnit(UnitKind.COPY, (0,), (width_type,)),
                   CodecUnit(UnitKind.INT_DELTA, (0,), (FieldType.UINT64,))),
            adaptive=(), uses_v5=False,
        )
        lay = FsmLayout(plan, dynamic_start=True)
        tstart = start + 5
        p_bytes, _corrupt, p_final, _ovf = run_fsm(lay, payloads, sizes, start=tstart)
        Cn, B = payloads.shape
        idx = jnp.arange(B, dtype=jnp.int32)[None, :]
        active = (idx < sizes[:, None]) & (p_bytes >= 0)
        ts_raw, ts_at_b = lay.token_starts(p_bytes, p_final)
        ts = ts_raw & active
        tok_id = jnp.cumsum(ts.astype(jnp.int32), axis=-1) - 1
        n_tokens = 2 * rc
        ts_next = jnp.concatenate([ts_raw[:, 1:], ts_at_b[:, None]], axis=-1)
        needed_end = ts_next & active & (tok_id < n_tokens[:, None])
        last_start = jax.lax.cummax(jnp.where(ts, idx, -1), axis=1)
        pos = jnp.clip(idx - last_start, 0, 11)
        is_vbyte = jnp.zeros(p_bytes.shape, bool)
        for lo_r, hi_r in lay.v_ranges:
            is_vbyte = is_vbyte | ((p_bytes >= lo_r) & (p_bytes < hi_r))
        over = jnp.any(active & is_vbyte & (pos >= 10), axis=-1)
        b32 = payloads.astype(_U32)
        v = jnp.where(is_vbyte, b32 & np.uint32(0x7F), b32)
        sh = jnp.where(is_vbyte, 7, 8) * pos
        lo = jnp.where(sh < 32, v << jnp.clip(sh, 0, 31).astype(_U32), 0)
        hi = jnp.where(sh >= 32, v << jnp.clip(sh - 32, 0, 31).astype(_U32),
                       jnp.where(sh > 24, v >> jnp.clip(32 - sh, 0, 31).astype(_U32), 0))
        run = u64.cumsum((jnp.where(active, lo, 0), jnp.where(active, hi, 0)))
        key = jnp.where(needed_end, tok_id.astype(_U32), _INF)
        ops = [key, run[0], run[1]]
        K = 2 * N
        if B < K:
            ops = [jnp.concatenate([o, jnp.full((Cn, K - B), _INF if i == 0 else 0,
                                                o.dtype)], axis=-1)
                   for i, o in enumerate(ops)]
        _, s_lo, s_hi = jax.lax.sort(tuple(ops), dimension=1, num_keys=1, is_stable=False)
        s_lo, s_hi = s_lo[:, :K], s_hi[:, :K]
        p_lo = jnp.roll(s_lo, 1, axis=-1).at[:, 0].set(0)
        p_hi = jnp.roll(s_hi, 1, axis=-1).at[:, 0].set(0)
        acc = u64.sub((s_lo, s_hi), (p_lo, p_hi))
        vals_r = (acc[0][:, 0::2], acc[1][:, 0::2])  # raw run values
        lens = acc[0][:, 1::2].astype(jnp.int32)
        pts = jnp.arange(N, dtype=jnp.int32)[None, :] < rc[:, None]
        lens = jnp.where(pts, lens, 0)
        found = jnp.sum(needed_end.astype(jnp.int32), axis=-1)
        bad = over | (found < n_tokens) | (run_count > N)
        bad = bad | (jnp.sum(lens, axis=-1) != n_valid)
        vals = _expand_runs(vals_r, lens, rc, N)
        consumed = jnp.sum((active & (tok_id < n_tokens[:, None])).astype(jnp.int32),
                           axis=-1)
        return vals, consumed + 5, bad

    def _palette(self, payloads, sizes, start, n_valid):
        N = self.chunk_points
        bpv = self.bpv
        Cn, B = payloads.shape
        count = _byte_at(payloads, start + 1) | (_byte_at(payloads, start + 2) << 8)
        bad = count == 0
        cm1 = jnp.maximum(count - 1, 0)
        bits = jnp.where(cm1 > 0, 32 - jax.lax.clz(jnp.maximum(cm1, 1)), 0)
        pal_base = start + 3
        idx_base = pal_base + count * bpv
        e = jnp.arange(N, dtype=jnp.int32)[None, :]
        bitpos = e * bits[:, None]
        c_idx = jnp.arange(Cn, dtype=jnp.int32)[:, None]
        word = jnp.zeros((Cn, N), jnp.int32)
        for k in range(3):
            bp = jnp.clip(idx_base[:, None] + (bitpos >> 3) + k, 0, B - 1)
            word = word | (payloads[c_idx, bp].astype(jnp.int32) << (8 * k))
        index = (word >> (bitpos & 7)) & ((1 << jnp.clip(bits[:, None], 0, 15)) - 1)
        index = jnp.where(bits[:, None] > 0, index, 0)
        pts = e < n_valid[:, None]
        bad = bad | jnp.any(pts & (index >= count[:, None]), axis=-1)
        lo = jnp.zeros((Cn, N), _U32)
        hi = jnp.zeros((Cn, N), _U32)
        for k in range(bpv):
            pb = jnp.clip(pal_base[:, None] + index * bpv + k, 0, B - 1)
            byte = payloads[c_idx, pb].astype(_U32)
            if k < 4:
                lo = lo | (byte << np.uint32(8 * k))
            else:
                hi = hi | (byte << np.uint32(8 * (k - 4)))
        index_bytes = (bits * n_valid + 7) // 8
        consumed = 3 + count * bpv + index_bytes
        bad = bad | (start + consumed > sizes)
        return (lo, hi), consumed, bad

    # ------------------------------------------------------------- store

    def _store(self, vals: u64.U64, out):
        if self.field.offset == DECODE_BUT_SKIP_STORE:
            return out
        return C.store_bytes(out, self.field.offset, u64.to_bytes(vals, self.bpv))
