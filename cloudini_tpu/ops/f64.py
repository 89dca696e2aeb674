"""Software IEEE-754 binary64 on u32-pair lanes — exact f64 for TPU.

TPU has no f64 datapath; XLA's emulated f64 multiply is observed ~1 ulp off
IEEE, which breaks bit-exactness for the scalar FLOAT64 lossy codec path
(quantize ``std::round(x * (1.0/res))`` — field_encoder.hpp:98-118 — and
reconstruct ``double(q) * res`` — field_decoder.hpp:110-130). This module
implements exactly the three operations that path needs, correctly rounded
per IEEE-754 (round-to-nearest-even for multiply/convert), entirely in
uint32 vector arithmetic:

  * ``mul_const(bits, c)``      — f64 x compile-time f64 constant
  * ``round_away_to_i64(bits)`` — std::round (ties away) + int64 cast
                                  (out-of-range/inf/nan -> INT64_MIN, as
                                  x86 cvttsd2si and numpy astype produce)
  * ``i64_to_f64(v)``           — exact int64 -> f64 (RNE)

The 53x53-bit mantissa product runs in 16-bit limbs (16 u32 multiplies);
normalization/rounding is a single dynamic 128-bit shift with guard+sticky.
Subnormals, signed zeros, infinities are handled on both ends; NaN inputs
propagate quietly (the codec masks NaNs before quantization anyway).
"""

from __future__ import annotations

import math
from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

from . import u64

_U32 = jnp.uint32
_ZERO = np.uint32(0)
_MANT_MASK_HI = np.uint32(0x000FFFFF)
_EXP_MASK = np.uint32(0x7FF)
_QNAN_BIT = np.uint32(0x00080000)

U64 = u64.U64
U128 = Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]  # lo..hi u32 limbs


def decompose(bits: U64):
    """f64 bits -> (sign u32 0/1, raw exponent i32, 52-bit mantissa pair)."""
    lo, hi = bits
    sign = hi >> np.uint32(31)
    exp = ((hi >> np.uint32(20)) & _EXP_MASK).astype(jnp.int32)
    return sign, exp, (lo, hi & _MANT_MASK_HI)


def _normalize(exp_raw: jnp.ndarray, mant: U64):
    """(raw exp, 52-bit mantissa) -> (unbiased exp of a 53-bit normalized
    mantissa m53 in [2^52, 2^53), m53). Subnormals are shifted up; zero lanes
    are left as m53 == 0 (callers mask them)."""
    is_sub = exp_raw == 0
    # normal: m53 = 2^52 | mant, e = exp_raw - 1023
    m_norm = (mant[0], mant[1] | np.uint32(0x00100000))
    e_norm = exp_raw - 1023
    # subnormal: shift mant so bit 52 is set
    lz = u64.clz64(mant)  # >= 11 for a 52-bit value
    sh = (lz - 11).astype(jnp.int32)
    m_sub = _shl_var64(mant, jnp.clip(sh, 0, 63))
    e_sub = -1022 - sh
    m53 = u64.select(is_sub, m_sub, m_norm)
    e = jnp.where(is_sub, e_sub, e_norm)
    return e, m53


def _shl_var64(v: U64, s: jnp.ndarray) -> U64:
    """Left shift by per-lane s in [0, 63]."""
    lo, hi = v
    s = s.astype(_U32)
    big = s >= np.uint32(32)
    sh = jnp.where(big, s - np.uint32(32), s) & np.uint32(31)
    cross = jnp.where(sh == 0, _ZERO, lo >> ((np.uint32(32) - sh) & np.uint32(31)))
    hi_small = (hi << sh) | cross
    return jnp.where(big, _ZERO, lo << sh), jnp.where(big, lo << sh, hi_small)


def _mul_53x53(m53: U64, mb: int) -> U128:
    """53-bit mantissa pair x static 53-bit integer -> 128-bit product.

    16-bit-limb schoolbook: partial products are < 2^32, column accumulators
    hold <= 8 sub-terms of < 2^16 each, then one static carry sweep."""
    a = [
        m53[0] & np.uint32(0xFFFF),
        m53[0] >> np.uint32(16),
        m53[1] & np.uint32(0xFFFF),
        m53[1] >> np.uint32(16),
    ]
    b = [(mb >> (16 * j)) & 0xFFFF for j in range(4)]
    cols: List = [None] * 8
    for i in range(4):
        for j in range(4):
            if b[j] == 0:
                continue
            p = a[i] * np.uint32(b[j])
            lo16, hi16 = p & np.uint32(0xFFFF), p >> np.uint32(16)
            k = i + j
            cols[k] = lo16 if cols[k] is None else cols[k] + lo16
            cols[k + 1] = hi16 if cols[k + 1] is None else cols[k + 1] + hi16
    zero = jnp.zeros_like(m53[0])
    out16 = []
    carry = zero
    for k in range(8):
        t = carry + (cols[k] if cols[k] is not None else zero)
        out16.append(t & np.uint32(0xFFFF))
        carry = t >> np.uint32(16)
    return (
        out16[0] | (out16[1] << np.uint32(16)),
        out16[2] | (out16[3] << np.uint32(16)),
        out16[4] | (out16[5] << np.uint32(16)),
        out16[6] | (out16[7] << np.uint32(16)),
    )


def _bit128(p: U128, pos: jnp.ndarray) -> jnp.ndarray:
    """Bit at dynamic position (0..127) as u32 0/1 (pos < 0 -> 0)."""
    pc = jnp.clip(pos, 0, 127)
    word = pc >> 5
    sh = (pc & 31).astype(_U32)
    v = jnp.where(word == 0, p[0], jnp.where(word == 1, p[1], jnp.where(word == 2, p[2], p[3])))
    return jnp.where(pos < 0, _ZERO, (v >> sh) & np.uint32(1))


def _low_nonzero128(p: U128, n: jnp.ndarray) -> jnp.ndarray:
    """True when any bit strictly below position n (0..128) is set."""
    out = jnp.zeros_like(p[0], dtype=bool)
    for w in range(4):
        m = jnp.clip(n - 32 * w, 0, 32).astype(_U32)
        mask = jnp.where(
            m >= np.uint32(32),
            np.uint32(0xFFFFFFFF),
            jnp.where(m == 0, _ZERO, ~(np.uint32(0xFFFFFFFF) << jnp.minimum(m, np.uint32(31)))),
        )
        out = out | ((p[w] & mask) != 0)
    return out


def _shr128_to64(p: U128, s: jnp.ndarray) -> U64:
    """(p >> s) truncated to 64 bits, s in [0, 127]: conditional word shifts
    by 64 then 32, then one intra-word shift."""
    big64 = s >= 64
    l0 = jnp.where(big64, p[2], p[0])
    l1 = jnp.where(big64, p[3], p[1])
    l2 = jnp.where(big64, _ZERO, p[2])
    l3 = jnp.where(big64, _ZERO, p[3])
    s1 = s - jnp.where(big64, 64, 0)
    big32 = s1 >= 32
    m0 = jnp.where(big32, l1, l0)
    m1 = jnp.where(big32, l2, l1)
    m2 = jnp.where(big32, l3, l2)
    s2 = (s1 - jnp.where(big32, 32, 0)).astype(_U32) & np.uint32(31)
    inv = (np.uint32(32) - s2) & np.uint32(31)
    r0 = (m0 >> s2) | jnp.where(s2 == 0, _ZERO, m1 << inv)
    r1 = (m1 >> s2) | jnp.where(s2 == 0, _ZERO, m2 << inv)
    return r0, r1


def mul_const(bits: U64, c: float) -> U64:
    """IEEE-754 f64 multiply by a compile-time constant, RNE, exact."""
    c = float(c)
    if c == 0.0 or math.isnan(c) or math.isinf(c):
        raise ValueError("mul_const expects a finite nonzero constant")
    sb = 1 if math.copysign(1.0, c) < 0 else 0
    frac, eb2 = math.frexp(abs(c))  # frac in [0.5, 1)
    mb = int(frac * (1 << 53))  # 53-bit integer mantissa
    eb = eb2 - 1  # value = mb * 2^(eb - 52)

    sign_a, exp_a, mant_a = decompose(bits)
    sign_r = sign_a ^ np.uint32(sb)
    ea, m53 = _normalize(exp_a, mant_a)

    p = _mul_53x53(m53, mb)
    top = _bit128(p, jnp.full(exp_a.shape, 105, jnp.int32)).astype(jnp.int32)
    e_r = ea + eb + top  # value = p * 2^(ea+eb-104); mant53 needs shift 52+top
    biased = e_r + 1023
    shift = jnp.clip(52 + top + jnp.maximum(0, 1 - biased), 0, 120)

    m = _shr128_to64(p, shift)
    guard = _bit128(p, shift - 1)
    sticky = _low_nonzero128(p, shift - 1)
    round_up = (guard == 1) & (sticky | ((m[0] & np.uint32(1)) == 1))
    m = u64.add(m, (round_up.astype(_U32), _ZERO))

    exp_field = jnp.maximum(biased - 1, 0).astype(_U32)
    # bits = (exp_field << 52) + m : the implicit-bit "magic add" folds the
    # round-carry (m == 2^53) and subnormal-promotion cases automatically
    out_lo = m[0]
    out_hi = (exp_field << np.uint32(20)) + m[1]

    # special cases
    is_zero_a = (exp_a == 0) & u64.is_zero(mant_a)
    is_inf_a = (exp_a == 2047) & u64.is_zero(mant_a)
    is_nan_a = (exp_a == 2047) & ~u64.is_zero(mant_a)
    overflow = biased > 2046
    out_lo = jnp.where(overflow, _ZERO, out_lo)
    out_hi = jnp.where(overflow, np.uint32(0x7FF00000), out_hi)
    out_lo = jnp.where(is_zero_a, _ZERO, out_lo)
    out_hi = jnp.where(is_zero_a, _ZERO, out_hi)
    out_lo = jnp.where(is_inf_a, _ZERO, out_lo)
    out_hi = jnp.where(is_inf_a, np.uint32(0x7FF00000), out_hi)
    out_lo = jnp.where(is_nan_a, bits[0], out_lo)
    out_hi = jnp.where(is_nan_a, (bits[1] & np.uint32(0x7FFFFFFF)) | _QNAN_BIT, out_hi)
    out_hi = out_hi | (sign_r << np.uint32(31))
    return out_lo, out_hi


def round_away_to_i64(bits: U64) -> U64:
    """std::round (ties away from zero) then int64 cast; inf/nan/out-of-range
    -> INT64_MIN (x86 cvttsd2si / numpy astype semantics)."""
    sign, exp_raw, mant = decompose(bits)
    e = exp_raw - 1023
    m53 = (mant[0], mant[1] | np.uint32(0x00100000))  # subnormals round to 0 anyway

    # 0 <= e <= 51: integer = m53 >> (52 - e), round up when bit (51 - e) set
    sh = jnp.clip(52 - e, 0, 63)
    ipart = u64.shr_var(m53, sh)
    half = u64.shr_var(m53, jnp.clip(51 - e, 0, 63))[0] & np.uint32(1)
    ipart = u64.add(ipart, (half, _ZERO))
    # 52 <= e <= 62: integer = m53 << (e - 52), exact
    big = u64.select(e >= 52, _shl_var64(m53, jnp.clip(e - 52, 0, 63)), ipart)

    v = big
    v = u64.select(e < -1, u64.const(0, e.shape), v)
    v = u64.select(e == -1, u64.const(1, e.shape), v)
    v = u64.select((exp_raw == 0) & u64.is_zero(mant), u64.const(0, e.shape), v)
    v = u64.select(sign == 1, u64.neg(v), v)
    bad = (e >= 63) | (exp_raw == 2047)
    return u64.select(bad, u64.const(1 << 63, e.shape), v)


def i64_to_f64(v: U64) -> U64:
    """Exact int64 -> f64 (RNE on the |v| > 2^53 tail)."""
    negm = u64.asr63_mask(v)
    a = u64.select(negm != 0, u64.neg(v), v)
    # INT64_MIN negates to itself; its magnitude 2^63 is handled below (k=63)
    k = 63 - u64.clz64(a)  # msb index; -1 for zero
    up = jnp.clip(52 - k, 0, 63)
    m_exact = _shl_var64(a, up)
    down = jnp.clip(k - 52, 0, 63)
    m_shift = u64.shr_var(a, down)
    guard = u64.shr_var(a, jnp.clip(down - 1, 0, 63))[0] & np.uint32(1)
    guard = jnp.where(down >= 1, guard, _ZERO)
    sticky = u64._low_mask_nonzero(a, down - 1)
    round_up = (guard == 1) & (sticky | ((m_shift[0] & np.uint32(1)) == 1))
    m_shift = u64.add(m_shift, (round_up.astype(_U32), _ZERO))
    m = u64.select(k <= 52, m_exact, m_shift)
    exp_field = jnp.maximum(k + 1022, 0).astype(_U32)
    lo = m[0]
    hi = (exp_field << np.uint32(20)) + m[1]
    zero = u64.is_zero(a)
    lo = jnp.where(zero, _ZERO, lo)
    hi = jnp.where(zero, _ZERO, hi)
    hi = hi | (negm & np.uint32(0x80000000))
    return lo, hi
