"""64-bit integer lanes as (lo, hi) uint32 pairs — TPU-native wide arithmetic.

TPU's VPU has no 64-bit integer datapath; XLA's x64 mode emulates it
pessimistically and (worse) the global flag widens every index computation in
the program. This module implements exactly the 64-bit ops the codec needs as
explicit u32-pair arithmetic, keeping the whole hot path on native 32-bit
vector ops:

  * field extraction with sign/zero extension (ToInt64<T> semantics)
  * subtraction (delta), addition scan (un-delta cumsum)
  * zigzag encode/decode with the +1 NaN-reservation bias
  * varint byte-group slicing / length computation (10 groups across limbs)
  * exact float32 <-> int64 conversions matching x86 cvttss2si / cvtsi2ss
    (truncate / round-to-nearest-even), for the scalar lossy-float path

All functions are elementwise over arbitrary leading batch dims.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

U64 = Tuple[jnp.ndarray, jnp.ndarray]  # (lo: u32, hi: u32)

_U32 = jnp.uint32
_ZERO = np.uint32(0)
_ONES = np.uint32(0xFFFFFFFF)


def const(value: int, shape=()) -> U64:
    value &= (1 << 64) - 1
    lo = jnp.full(shape, np.uint32(value & 0xFFFFFFFF), _U32)
    hi = jnp.full(shape, np.uint32(value >> 32), _U32)
    return lo, hi


def from_i32(x: jnp.ndarray) -> U64:
    """Sign-extend int32 lanes to a pair."""
    lo = x.astype(_U32)
    hi = (x >> 31).astype(_U32)
    return lo, hi


def from_bytes(b: jnp.ndarray, width: int, signed: bool) -> U64:
    """(..., width) LE uint8 -> sign/zero-extended pair (ToInt64<T>,
    encoding_utils.hpp:69-73)."""
    lo = jnp.zeros(b.shape[:-1], _U32)
    hi = jnp.zeros(b.shape[:-1], _U32)
    for k in range(min(width, 4)):
        lo = lo | (b[..., k].astype(_U32) << np.uint32(8 * k))
    for k in range(4, width):
        hi = hi | (b[..., k].astype(_U32) << np.uint32(8 * (k - 4)))
    if signed and width <= 4:
        neg = (lo & np.uint32(1 << (8 * width - 1))) != 0
        if width < 4:
            lo = lo | jnp.where(neg, _ONES << np.uint32(8 * width), _ZERO)
        hi = jnp.where(neg, _ONES, _ZERO)
    return lo, hi


def to_bytes(v: U64, width: int) -> jnp.ndarray:
    """pair -> (..., width) LE uint8 (truncating store)."""
    lo, hi = v
    parts = []
    for k in range(min(width, 4)):
        parts.append(((lo >> np.uint32(8 * k)) & np.uint32(0xFF)).astype(jnp.uint8))
    for k in range(4, width):
        parts.append(((hi >> np.uint32(8 * (k - 4))) & np.uint32(0xFF)).astype(jnp.uint8))
    return jnp.stack(parts, axis=-1)


def byte_lane(v: U64, k: int) -> jnp.ndarray:
    """LE byte k of the pair as a same-shape u32 lane (no trailing byte dim)."""
    lo, hi = v
    if k < 4:
        return (lo >> np.uint32(8 * k)) & np.uint32(0xFF)
    return (hi >> np.uint32(8 * (k - 4))) & np.uint32(0xFF)


def add(a: U64, b: U64) -> U64:
    lo = a[0] + b[0]
    carry = (lo < a[0]).astype(_U32)
    hi = a[1] + b[1] + carry
    return lo, hi


def sub(a: U64, b: U64) -> U64:
    lo = a[0] - b[0]
    borrow = (a[0] < b[0]).astype(_U32)
    hi = a[1] - b[1] - borrow
    return lo, hi


def neg(a: U64) -> U64:
    return add((~a[0], ~a[1]), const(1))


def eq(a: U64, b: U64) -> jnp.ndarray:
    return (a[0] == b[0]) & (a[1] == b[1])


def is_zero(a: U64) -> jnp.ndarray:
    return (a[0] == 0) & (a[1] == 0)


def select(pred: jnp.ndarray, a: U64, b: U64) -> U64:
    return jnp.where(pred, a[0], b[0]), jnp.where(pred, a[1], b[1])


def shl1(a: U64) -> U64:
    return a[0] << np.uint32(1), (a[1] << np.uint32(1)) | (a[0] >> np.uint32(31))


def shr1(a: U64) -> U64:
    return (a[0] >> np.uint32(1)) | (a[1] << np.uint32(31)), a[1] >> np.uint32(1)


def asr63_mask(a: U64) -> jnp.ndarray:
    """All-ones u32 where the pair is negative (arithmetic >> 63 broadcast)."""
    return (a[1].astype(jnp.int32) >> 31).astype(_U32)


def zigzag_biased(v: U64) -> U64:
    """(v << 1) ^ (v >> 63), then +1 (0 reserved for NaN). The INT64_MIN
    delta wraps to 0 and is emitted as the single byte 0x00, exactly like the
    reference's uint64 wraparound (encoding_utils.hpp:55-67) — the reference
    decoder then treats it as the NaN marker for floats and rejects it for
    ints (encoding_utils.hpp:141-143)."""
    m = asr63_mask(v)
    s = shl1(v)
    u = (s[0] ^ m, s[1] ^ m)
    return add(u, const(1))


def unzigzag(u: U64) -> U64:
    """Inverse (input already has the +1 bias removed)."""
    m = (_ZERO - (u[0] & np.uint32(1))).astype(_U32)
    h = shr1(u)
    return h[0] ^ m, h[1] ^ m


def varint_lengths(biased: U64) -> jnp.ndarray:
    """Encoded byte count (1..10) of the biased value (value 0 -> 1 byte)."""
    lo, hi = biased
    n = jnp.ones(lo.shape, jnp.int32)
    for k in range(1, 5):  # thresholds 2**7k below 2**32
        n += ((hi > 0) | (lo >= np.uint32(1 << (7 * k)))).astype(jnp.int32)
    for k in range(5, 10):  # thresholds 2**(7k) = 2**(7k-32) * 2**32
        n += (hi >= np.uint32(1 << (7 * k - 32))).astype(jnp.int32)
    return n


def varint_group(biased: U64, k: int) -> jnp.ndarray:
    """7-bit group k (bits 7k..7k+6) of the biased value as u32."""
    lo, hi = biased
    sh = 7 * k
    if sh + 7 <= 32:
        return (lo >> np.uint32(sh)) & np.uint32(0x7F)
    if sh < 32:
        return ((lo >> np.uint32(sh)) | (hi << np.uint32(32 - sh))) & np.uint32(0x7F)
    return (hi >> np.uint32(sh - 32)) & np.uint32(0x7F)


def assemble_group(u: U64, g: jnp.ndarray, k: int) -> U64:
    """OR 7-bit group k (u32) into the pair (decode direction)."""
    lo, hi = u
    sh = 7 * k
    if sh + 7 <= 32:
        lo = lo | (g << np.uint32(sh))
    elif sh < 32:
        lo = lo | (g << np.uint32(sh))  # low bits (shift wraps high bits out)
        hi = hi | (g >> np.uint32(32 - sh))
    else:
        hi = hi | (g << np.uint32(sh - 32))
    return lo, hi


def cumsum(v: U64, axis: int = -1) -> U64:
    """Inclusive 64-bit prefix sum along ``axis`` (the un-delta scan).

    Two plain u32 prefix sums instead of a tuple associative_scan (which
    compiles pathologically on TPU): the low limb wraps mod 2^32, and a wrap
    happened at step i iff the running low sum DECREASED (each addend is
    < 2^32), so the carry stream is just that comparison, prefix-summed into
    the high limb."""
    lo_run = jnp.cumsum(v[0], axis=axis, dtype=jnp.uint32)
    prev = jnp.roll(lo_run, 1, axis=axis)
    idx = [slice(None)] * lo_run.ndim
    idx[axis] = 0
    prev = prev.at[tuple(idx)].set(0)
    wrap = (lo_run < prev).astype(jnp.uint32)
    hi_run = jnp.cumsum(v[1] + wrap, axis=axis, dtype=jnp.uint32)
    return lo_run, hi_run


def roll_prev(v: U64) -> U64:
    """prev[i] = v[i-1] along the last axis, first element 0 (chunk-start
    predictor reset)."""
    lo = jnp.roll(v[0], 1, axis=-1).at[..., 0].set(0)
    hi = jnp.roll(v[1], 1, axis=-1).at[..., 0].set(0)
    return lo, hi


# ----------------------------------------------------------------- f32 <-> i64


def f32_to_i64(r: jnp.ndarray) -> U64:
    """Exact float32 -> int64 with x86 cvttss2si semantics (truncate toward
    zero; NaN/overflow -> INT64_MIN). Input is already integral (rounded)."""
    a = jnp.abs(r)
    ok = jnp.isfinite(r) & (a < np.float32(2**63))
    a = jnp.where(ok, a, 0.0)
    hi_f = jnp.floor(a * np.float32(2**-32))
    lo_f = a - hi_f * np.float32(2**32)  # exact: low bit-slice of the mantissa
    lo = lo_f.astype(_U32)
    hi = hi_f.astype(_U32)
    v = (lo, hi)
    v = select(r < 0, neg(v), v)
    return select(ok, v, const(1 << 63))


def clz32(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.clz(x.astype(jnp.int32)).astype(jnp.int32)


def ctz32(x: jnp.ndarray) -> jnp.ndarray:
    """Trailing zero count of u32 lanes (x == 0 -> 32)."""
    u = x.astype(_U32)
    return jax.lax.population_count(~u & (u - np.uint32(1))).astype(jnp.int32)


def clz64(v: U64) -> jnp.ndarray:
    """Leading zero count of the pair (0 -> 64)."""
    lo, hi = v
    return jnp.where(hi != 0, clz32(hi), 32 + clz32(lo))


def ctz64(v: U64) -> jnp.ndarray:
    """Trailing zero count of the pair (0 -> 64)."""
    lo, hi = v
    return jnp.where(lo != 0, ctz32(lo), 32 + ctz32(hi))


def shr_var(v: U64, s: jnp.ndarray) -> U64:
    """Logical right shift by a per-lane dynamic amount s in [0, 63]."""
    lo, hi = v
    s = s.astype(_U32)
    big = s >= np.uint32(32)
    sh = jnp.where(big, s - np.uint32(32), s) & np.uint32(31)
    # (hi << (32-sh)) is UB at sh == 0; select the unshifted lane instead
    cross = jnp.where(sh == 0, _ZERO, hi << ((np.uint32(32) - sh) & np.uint32(31)))
    lo_small = (lo >> sh) | cross
    return jnp.where(big, hi >> sh, lo_small), jnp.where(big, _ZERO, hi >> sh)


def i64_to_f32(v: U64) -> jnp.ndarray:
    """Correctly-rounded int64 -> float32 (round to nearest even), matching
    x86 cvtsi2ss — needed for the scalar lossy decode's
    ``static_cast<float>(int64)`` (field_decoder.hpp:346)."""
    negm = asr63_mask(v)
    a = select(negm != 0, neg(v), v)
    lo, hi = a
    # MSB position k (0-based); a == 0 handled at the end
    k = jnp.where(hi != 0, 31 - clz32(hi) + 32, 31 - clz32(jnp.maximum(lo, 1)))
    shift = jnp.maximum(k - 23, 0)

    # mantissa = a >> shift (24 bits incl. leading), computed per-limb;
    # shift amounts are clamped to [0, 31] to avoid out-of-range shift UB —
    # lanes where the clamped value is wrong are overridden by the wheres
    s = shift.astype(_U32)
    use_hi = shift >= 32
    sh = jnp.where(use_hi, s - np.uint32(32), s) & np.uint32(31)
    carry_sh = (np.uint32(32) - sh) & np.uint32(31)
    m_low = jnp.where(sh == 0, lo, (lo >> sh) | (hi << carry_sh))
    m = jnp.where(use_hi, hi >> sh, m_low)

    # round to nearest even on the bits shifted out
    half_pos = shift - 1
    half_bit = _get_bit(a, half_pos)
    below = _low_mask_nonzero(a, half_pos)
    round_up = (shift > 0) & (half_bit == 1) & ((below) | ((m & 1) == 1))
    m = m + round_up.astype(_U32)
    carry = m >> np.uint32(24) != 0  # rounding overflowed to 2**24
    m = jnp.where(carry, m >> np.uint32(1), m)
    k = k + carry.astype(jnp.int32)

    # value = m * 2**(k-23) when shifted, else an exact small integer
    small = k <= 23
    exact_small = lo.astype(jnp.float32)  # lo < 2**24 here, conversion exact
    bits = ((k.astype(_U32) + np.uint32(127)) << np.uint32(23)) | (m & np.uint32(0x7FFFFF))
    f_big = jax.lax.bitcast_convert_type(bits, jnp.float32)
    f = jnp.where(small, exact_small, f_big)
    f = jnp.where(is_zero(a), 0.0, f)
    return jnp.where(negm != 0, -f, f)


def _get_bit(a: U64, pos: jnp.ndarray) -> jnp.ndarray:
    """Bit at dynamic position pos (pos < 0 -> 0)."""
    lo, hi = a
    p = jnp.maximum(pos, 0).astype(_U32)
    from_lo = (lo >> jnp.where(p < 32, p, 0)) & 1
    from_hi = (hi >> jnp.where(p >= 32, p - 32, 0)) & 1
    bit = jnp.where(pos < 32, from_lo, from_hi)
    return jnp.where(pos < 0, 0, bit)


def _low_mask_nonzero(a: U64, below_pos: jnp.ndarray) -> jnp.ndarray:
    """True when any bit strictly below ``below_pos`` is set (sticky bits)."""
    lo, hi = a
    n = jnp.clip(below_pos, 0, 64).astype(_U32)
    lo_mask = jnp.where(
        n >= 32, _ONES, jnp.where(n == 0, _ZERO, ~(_ONES << jnp.minimum(n, 31)))
    )
    nh = jnp.where(n >= 32, n - 32, 0)
    hi_mask = jnp.where(nh == 0, _ZERO, ~(_ONES << jnp.minimum(nh, 31)))
    hi_mask = jnp.where(nh >= 32, _ONES, hi_mask)
    return ((lo & lo_mask) != 0) | ((hi & hi_mask) != 0)


def shl_var(v: U64, s: jnp.ndarray) -> U64:
    """Logical left shift by a per-lane dynamic amount s in [0, 63]."""
    lo, hi = v
    s = s.astype(_U32)
    big = s >= np.uint32(32)
    sh = jnp.where(big, s - np.uint32(32), s) & np.uint32(31)
    cross = jnp.where(sh == 0, _ZERO, lo >> ((np.uint32(32) - sh) & np.uint32(31)))
    hi_small = (hi << sh) | cross
    return jnp.where(big, _ZERO, lo << sh), jnp.where(big, lo << sh, hi_small)


def mask_bits(m: jnp.ndarray) -> U64:
    """(2^m - 1) as a pair, m in [0, 64] per lane."""
    m = m.astype(jnp.int32)
    lo = jnp.where(m >= 32, np.uint32(0xFFFFFFFF),
                   (np.uint32(1) << (m.astype(_U32) & np.uint32(31))) - np.uint32(1))
    hm = jnp.clip(m - 32, 0, 32)
    hi = jnp.where(hm >= 32, np.uint32(0xFFFFFFFF),
                   (np.uint32(1) << (hm.astype(_U32) & np.uint32(31))) - np.uint32(1))
    return lo, jnp.where(m > 32, hi, _ZERO)


def bit_and(a: U64, b: U64) -> U64:
    return a[0] & b[0], a[1] & b[1]


def bit_xor(a: U64, b: U64) -> U64:
    return a[0] ^ b[0], a[1] ^ b[1]
