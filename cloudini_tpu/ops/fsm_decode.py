"""Value assembly for the FSM-decoded mixed-token streams (ops/fsm.py).

With per-byte FSM states known, every byte contributes ``group << 7*pos``
(varint bytes) or ``byte << 8*pos`` (fixed/Gorilla bytes); the token value
is the SAME-TOKEN sum of those contributions at the token's end byte,
computed from an 8-byte local window (tokens on the device path are <= 8
bytes; longer ones escape to host RETRY), and ONE stream compaction packs
the end-byte values to dense token order. Slot kind then decodes
elementwise: varints un-zigzag (+NaN marker = biased 0, matching
decodeVarint's u==0 semantics), fixed tokens are the raw bytes, and Gorilla
tokens recover the XOR chain with window propagation as hold-last scans and
the value chain as an XOR prefix scan (field_decoder.hpp:155-300; numpy
kernel of truth ref/gorilla.py).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.plan import CodecPlan, UnitKind
from ..core.types import DECODE_BUT_SKIP_STORE, size_of
from . import columns as C
from . import u64
from .compact_kernel import masked_compact
from .fsm import FsmLayout, run_fsm

_U32 = jnp.uint32
_INF = np.uint32(0xFFFFFFFF)


# ------------------------------------------------------------------ 96-bit ops


def _shr96_const(a, c: int) -> u64.U64:
    """(a >> c) truncated to a u64 pair, 0 < c < 32."""
    a0, a1, a2 = a
    lo = (a0 >> np.uint32(c)) | (a1 << np.uint32(32 - c))
    hi = (a1 >> np.uint32(c)) | (a2 << np.uint32(32 - c))
    return lo, hi


def _hold_last_excl(mask: jnp.ndarray, *vals):
    """Exclusive hold-last: for each position, the values at the most recent
    masked position STRICTLY before it (and whether one exists)."""
    z = jnp.zeros_like(mask[:, :1])
    mask = jnp.concatenate([z, mask[:, :-1]], axis=-1)
    vs = [jnp.concatenate([jnp.zeros_like(v[:, :1]), v[:, :-1]], axis=-1) for v in vals]
    n = mask.shape[-1]
    idx = jnp.arange(n, dtype=jnp.int32)
    seen = mask
    vs = [jnp.where(mask, v, 0) for v in vs]
    k = 1
    while k < n:
        p_seen = jnp.roll(seen, k, axis=-1) & (idx >= k)
        p_vs = [jnp.roll(v, k, axis=-1) for v in vs]
        vs = [jnp.where(seen, v, jnp.where(idx >= k, pv, 0)) for v, pv in zip(vs, p_vs)]
        seen = seen | p_seen
        k *= 2
    return (*vs, seen)


def _xor_scan_pair(v: u64.U64) -> u64.U64:
    lo = jax.lax.associative_scan(jnp.bitwise_xor, v[0], axis=-1)
    hi = jax.lax.associative_scan(jnp.bitwise_xor, v[1], axis=-1)
    return lo, hi


# ------------------------------------------------------------------ decoder


class FsmStage1Decoder:
    """Chunk-batched decoder for mixed varint/fixed/Gorilla plans.

    decode(payloads (C, B) u8, sizes (C,), n_valid (C,))
        -> (rows (C, N, point_step) u8, consumed (C,) — INT32_MAX on error),
    matching DeviceStage1Decoder's contract (device_codec.py)."""

    def __init__(self, plan: CodecPlan, point_step: int, chunk_points: int,
                 block: int = 512):
        self.plan = plan
        self.point_step = point_step
        self.chunk_points = chunk_points
        self.layout = FsmLayout(plan)
        # a block must fully contain record 0 (its Gorilla token is the raw
        # value and uses dedicated state codes; see FsmLayout docstring)
        self.block = max(block, 2 * plan.max_encoded_point_bytes)

    def decode(self, payloads: jnp.ndarray, sizes: jnp.ndarray, n_valid: jnp.ndarray):
        lay = self.layout
        Cn, B = payloads.shape
        N, T = self.chunk_points, lay.T
        K = N * T
        p_bytes, g_corrupt, p_final, tier_ovf = run_fsm(lay, payloads, sizes,
                                                        block=self.block)

        idx = jnp.arange(B, dtype=jnp.int32)[None, :]
        active = idx < sizes[:, None]
        ts_raw, ts_at_b = lay.token_starts(p_bytes, p_final)
        ts = ts_raw & active
        # id of the token OWNING byte j = (#starts at or before j) - 1
        tok_id = jnp.cumsum(ts.astype(jnp.int32), axis=-1) - 1
        K_valid = (n_valid * T).astype(jnp.int32)
        ts_next = jnp.concatenate([ts_raw[:, 1:], ts_at_b[:, None]], axis=-1)
        needed_end = ts_next & active & (tok_id < K_valid[:, None])

        # byte position within its token AND the token value at its end byte
        # from an 8-byte LOCAL window (r4): every token on the 2-limb device
        # path is <= 8 bytes (pos >= 8 escapes to host RETRY below), so both
        # are local properties of the previous start flags — the cummax
        # scan, the 96-bit running sum, and the adjacent-diff step all
        # disappear. same_j: byte p-j belongs to p's token <=> no token
        # start in (p-j, p] (bytes before the buffer count as starts).
        nts = ~ts
        same, accm = [], None
        for j in range(1, 9):
            t_im1 = jnp.roll(nts, j - 1, axis=-1).at[:, : j - 1].set(False)
            accm = t_im1 if accm is None else accm & t_im1
            same.append(accm)
        pos = same[0].astype(jnp.int32)
        for m in same[1:]:
            pos = pos + m.astype(jnp.int32)   # == min(true pos, 8)

        is_vbyte = jnp.zeros(p_bytes.shape, bool)
        for lo, hi in lay.v_ranges:
            is_vbyte = is_vbyte | ((p_bytes >= lo) & (p_bytes < hi))

        b32 = payloads.astype(_U32)
        v = jnp.where(is_vbyte, b32 & np.uint32(0x7F), b32)
        sh = jnp.where(is_vbyte, 7, 8) * pos
        limbs = []
        for kk in range(2):
            d = sh - 32 * kk
            left = v << (jnp.clip(d, 0, 31).astype(_U32))
            right = v >> (jnp.clip(-d, 0, 31).astype(_U32))
            ck = jnp.where((d >= 0) & (d < 32), left,
                           jnp.where((d < 0) & (d > -8), right, 0))
            limbs.append(jnp.where(active, ck, 0))
        Kpad = -(-K // 128) * 128

        # A third accumulator limb only matters when some token reaches 9+
        # bytes (value bits >= 64): never on real LiDAR streams (a 9-byte
        # Gorilla new-window needs m >= 52 meaningful bits; the dds
        # fixture's largest token is 6 bytes). Such chunks take the
        # host-RETRY escape (exact semantics preserved by the pipeline;
        # pos >= 8 also covers the corrupt >10-byte-varint case — the host
        # re-decode raises for those). On-device the token value is the
        # same-token local sum of limb contributions at the END byte:
        # V = sum_{j=0..7} same_j ? limb[p-j], a 2-limb add chain.
        w2_retry = jnp.any(active & (pos >= 8), axis=-1)  # (C,)
        v_lo, v_hi = limbs[0], limbs[1]
        for j, m in enumerate(same, start=1):
            r_lo = jnp.roll(limbs[0], j, axis=-1).at[:, :j].set(0)
            r_hi = jnp.roll(limbs[1], j, axis=-1).at[:, :j].set(0)
            add_lo = jnp.where(m, r_lo, 0)
            n_lo = v_lo + add_lo
            carry = (n_lo < add_lo).astype(_U32)
            v_lo = n_lo
            v_hi = v_hi + jnp.where(m, r_hi, 0) + carry
        s0, s1 = masked_compact(needed_end, (v_lo, v_hi), Kpad)
        acc = (s0[:, :K], s1[:, :K], jnp.zeros_like(s0[:, :K]))
        acc = tuple(x.reshape(Cn, N, T) for x in acc)

        found = jnp.sum(needed_end.astype(jnp.int32), axis=-1)
        truncated = found < K_valid
        consumed = jnp.sum((active & (tok_id < K_valid[:, None])).astype(jnp.int32),
                           axis=-1)

        out = jnp.zeros((Cn, N, self.point_step), jnp.uint8)
        # >10-byte varints (the old device-side overflow flag) imply
        # pos >= 8 and are covered by the w2_retry host escape
        bad = truncated | g_corrupt
        pts_valid = jnp.arange(N, dtype=jnp.int32)[None, :] < n_valid[:, None]
        for t, slot in enumerate(lay.slots):
            unit = self.plan.units[slot.unit_index]
            a = (acc[0][..., t], acc[1][..., t], acc[2][..., t])
            if slot.kind == "V":
                from .device_codec import (
                    _dequant_store_float_lossy,
                    _dequant_store_floatn_lane,
                    _undelta_store_int,
                )

                biased = (a[0], a[1])  # u64 wrap, like the host assembly
                nan = u64.is_zero(biased)
                uu = u64.sub(
                    biased,
                    u64.select(nan, u64.const(0, nan.shape), u64.const(1, nan.shape)),
                )
                val = u64.unzigzag(uu)
                val = u64.select(nan, u64.const(0, nan.shape), val)
                if unit.kind == UnitKind.FLOATN_LOSSY:
                    out = _dequant_store_floatn_lane(
                        unit, slot.lane, val[0].astype(jnp.int32), nan, out
                    )
                elif unit.kind == UnitKind.FLOAT_LOSSY:
                    out = _dequant_store_float_lossy(unit, val, nan, out)
                else:  # INT_DELTA: the NaN marker is illegal (host raises)
                    bad = bad | jnp.any(nan & pts_valid, axis=-1)
                    out = _undelta_store_int(unit, val, out)
            elif slot.kind == "F":
                width = slot.width
                value = (a[0], a[1])
                if unit.kind == UnitKind.FLOAT_XOR:
                    value = _xor_scan_pair(value)
                if unit.offsets[0] != DECODE_BUT_SKIP_STORE:
                    out = C.store_bytes(out, unit.offsets[0], u64.to_bytes(value, width))
            else:  # GORILLA
                bits, gbad = _gorilla_values(a, n_valid, slot.width)
                bad = bad | gbad
                if unit.offsets[0] != DECODE_BUT_SKIP_STORE:
                    out = C.store_bytes(out, unit.offsets[0], u64.to_bytes(bits, slot.width))

        consumed = jnp.where(n_valid > 0, consumed, 0)
        consumed = jnp.where(bad, np.int32(2**31 - 1), consumed)
        # mis-speculated window length (tier_ovf) or a 9+-byte token whose
        # third accumulator limb this path drops (w2_retry): outside the
        # compiled tier — the pipeline re-decodes host-side (RETRY),
        # preserving exact semantics
        from .adaptive_decode import RETRY

        return out, jnp.where(tier_ovf | w2_retry, RETRY, consumed)


def _gorilla_values(a, n_valid: jnp.ndarray, width: int) -> Tuple[u64.U64, jnp.ndarray]:
    """Per-token 96-bit accumulators of one Gorilla column -> raw value bit
    patterns (u64 pair) + per-chunk corrupt flag. Wire rules: ref/gorilla.py
    (reference field_decoder.hpp:155-300)."""
    a0, a1, a2 = a
    Cn, N = a0.shape
    bitsw = width * 8
    idx = jnp.arange(N, dtype=jnp.int32)[None, :]
    validp = idx < n_valid[:, None]
    first = idx == 0
    low = a0.astype(jnp.int32)
    same = validp & ~first & ((low & 1) == 0)
    neww = validp & ~first & ((low & 3) == 3)
    reuse = validp & ~first & ((low & 3) == 1)
    del same  # xor = 0 there; nothing to compute
    lead = (low >> 2) & 31
    m_new = ((low >> 7) & 63) + 1
    trail_new = bitsw - lead - m_new
    bad_new = neww & (trail_new < 0)

    wm, wtr, wseen = _hold_last_excl(neww, m_new, trail_new)
    bad_reuse = reuse & ~wseen

    a13 = _shr96_const(a, 13)
    a2v = _shr96_const(a, 2)
    xor_new = u64.shl_var(
        u64.bit_and(a13, u64.mask_bits(m_new)), jnp.clip(trail_new, 0, 63)
    )
    xor_re = u64.shl_var(
        u64.bit_and(a2v, u64.mask_bits(jnp.clip(wm, 0, 64))), jnp.clip(wtr, 0, 63)
    )
    zero = u64.const(0, a0.shape)
    xor = u64.select(neww, xor_new, u64.select(reuse, xor_re, zero))
    w0 = u64.select(first, (a0, a1) if width == 8 else (a0, jnp.zeros_like(a1)), xor)
    w0 = u64.select(validp, w0, zero)
    vals = _xor_scan_pair(w0)
    corrupt = jnp.any(bad_new | bad_reuse, axis=-1)
    return vals, corrupt
