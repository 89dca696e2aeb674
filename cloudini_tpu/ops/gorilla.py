"""Device (JAX) Gorilla/Chimp bit-packed XOR encode — chunk-parallel, no
sequential point loop.

Wire rules are the reference's FieldEncoderFloat_Gorilla
(field_encoder.hpp:142-312; numpy kernel of truth: ref/gorilla.py):
  * first value of a chunk: raw type_bits
  * XOR == 0: 1 bit '0'
  * else '1', then '0' + meaningful bits if the XOR fits the previous
    (leading, trailing) window, or '1' + leading(5b, clamped 31) +
    (meaningful-1)(6b) + meaningful bits, which also replaces the window
  * every value is byte-aligned (zero padding bits), LSB-first per byte

The only sequential state is the window, a *conditional-reset chain*: the
window is replaced exactly at points whose XOR does not fit it. The chain is
ONE unrolled lax.scan over the point axis carrying the packed window
(lead << 8 | trail) per chunk lane — N/U steps of elementwise ops on (C,)
lanes, the same step-latency-bound shape as the FSM decode scans (ops/fsm).
The r1 construction (binary descent over log2(N) range-min sparse tables +
orbit pointer-doubling) moved whole-array gathers for ~15 rounds and
measured ~10x slower than the host codec (device_codec.py:46-50) — gathers
cost ~10 ns/element here while scan steps on narrow lanes are ~0.5 us
regardless of C (see PROFILE.md). Each point's effective window is then the
(lead, trail) of the last reset at or before it (cummax + gather).

Token bit assembly is then fully elementwise: payload = xor >> trail with a
static header shift per token class (2 or 13 bits), packed into three u32
limbs and sliced to little-endian bytes. Output feeds the same
prefix-sum + scatter interleave as the varint streams (device_codec).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import u64

_U32 = jnp.uint32


def _window_resets(lead_c: jnp.ndarray, trail_c: jnp.ndarray) -> jnp.ndarray:
    """Reset mask (C, N): one unrolled scan over the point axis carrying the
    active window packed as (stored_lead << 8 | trail) per chunk lane. A
    position resets iff its (lead, trail) escapes the window below it;
    non-candidates carry lead/trail = 64 so they never escape (windows store
    lead <= 31, trail <= 63), and the initial (64, 64) sentinel makes the
    first candidate reset unconditionally. Reset flags are recomputed in
    parallel from the stacked before-states (the scan carries state only —
    step latency dominates, see ops/fsm.py)."""
    from .fsm import _scan_unrolled

    c, n = lead_c.shape
    x = (lead_c << 8) | trail_c  # both <= 64

    def step(carry, xi):
        ld, tr = xi >> 8, xi & 0xFF
        reset = (ld < (carry >> 8)) | (tr < (carry & 0xFF))
        new = (jnp.minimum(ld, 31) << 8) | tr
        return jnp.where(reset, new, carry)

    init = jnp.full((c,), (64 << 8) | 64, jnp.int32)
    _final, before = _scan_unrolled(step, init, (x.T,), 8)
    w = before.T  # (C, N): window state before each position
    return (lead_c < (w >> 8)) | (trail_c < (w & 0xFF))


def gorilla_tokens(
    bits: u64.U64 | jnp.ndarray, type_bits: int, valid: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Chunk-batched Gorilla encode.

    bits: (C, N) u32 array (type_bits == 32) or (lo, hi) u32 pair (64);
    valid: (C, N) bool. Returns (byte matrix (C, N, L), lengths (C, N)) in the
    token layout device_codec's interleave consumes. Bit-exact vs
    ref/gorilla.encode_column (locked in tests/test_device_gorilla.py).
    """
    pair = type_bits == 64
    if pair:
        lo, hi = bits
        shape = lo.shape
    else:
        lo, hi = bits.astype(_U32), None
        shape = lo.shape
    c, n = shape
    idx = jnp.arange(n, dtype=jnp.int32)
    first = idx == 0

    if pair:
        prev = u64.roll_prev((lo, hi))
        xor = (lo ^ prev[0], hi ^ prev[1])
        xz = u64.is_zero(xor)
        lead = u64.clz64(xor)
        trail = u64.ctz64(xor)
    else:
        prev = jnp.roll(lo, 1, axis=-1).at[..., 0].set(0)
        xor = lo ^ prev
        xz = xor == 0
        lead = u64.clz32(xor)
        trail = u64.ctz32(xor)

    cand = valid & ~first & ~xz
    lead_c = jnp.where(cand, lead, 64).astype(jnp.int32)
    trail_c = jnp.where(cand, trail, 64).astype(jnp.int32)

    resets = _window_resets(lead_c, trail_c)

    # window in effect when encoding each token = the (lead, trail) of the
    # last reset strictly before it (reset tokens replace it themselves).
    # Fill-forward WITHOUT gathers: pack (idx << 11 | lead5 | trail6) at reset
    # positions, cummax carries the latest packed record (idx is monotone so
    # the index bits dominate the comparison), shift one step, unpack.
    # Gathers cost ~10 ns/element here; this is two elementwise passes.
    stored_lead = jnp.minimum(lead, 31)
    packed_w = jnp.where(
        resets,
        (idx << 11) | (jnp.minimum(lead_c, 31) << 6) | trail_c,
        -1,
    )
    last_w = jax.lax.cummax(packed_w, axis=packed_w.ndim - 1)
    prev_w = jnp.roll(last_w, 1, axis=-1).at[..., 0].set(-1)
    prev_w = jnp.maximum(prev_w, 0)  # before the first reset: dummy (0, 0)
    win_lead = (prev_w >> 6) & 0x1F
    win_trail = prev_w & 0x3F

    # ---- token classes ------------------------------------------------------
    is_first = first & valid
    is_same = valid & ~first & xz
    is_new = cand & resets
    is_reuse = cand & ~resets

    mb_new = type_bits - stored_lead - trail
    mb_win = type_bits - win_lead - win_trail
    nbits = jnp.where(is_first, type_bits, 0)
    nbits = jnp.where(is_same, 1, nbits)
    nbits = jnp.where(is_new, 13 + mb_new, nbits)
    nbits = jnp.where(is_reuse, 2 + mb_win, nbits)
    lengths = jnp.where(valid, (nbits + 7) // 8, 0).astype(jnp.int32)

    # ---- bit assembly: acc as u32 limbs, all header shifts static -----------
    if pair:
        pay_new = u64.shr_var(xor, trail)
        pay_reuse = u64.shr_var(xor, win_trail)
        n_limbs = 3  # 13 + 64 = 77 bits
    else:
        sh_n = trail.astype(_U32) & np.uint32(31)
        sh_r = win_trail.astype(_U32) & np.uint32(31)
        pay_new = (xor >> sh_n, jnp.zeros_like(xor))
        pay_reuse = (jnp.where(win_trail >= 32, 0, xor >> sh_r), jnp.zeros_like(xor))
        n_limbs = 2  # 13 + 32 = 45 bits

    header = (
        np.uint32(0x3)
        | (stored_lead.astype(_U32) << np.uint32(2))
        | ((mb_new - 1).astype(_U32) << np.uint32(7))
    )
    acc_new = [
        header | (pay_new[0] << np.uint32(13)),
        (pay_new[0] >> np.uint32(19)) | (pay_new[1] << np.uint32(13)),
        pay_new[1] >> np.uint32(19),
    ]
    acc_reuse = [
        np.uint32(0x1) | (pay_reuse[0] << np.uint32(2)),
        (pay_reuse[0] >> np.uint32(30)) | (pay_reuse[1] << np.uint32(2)),
        pay_reuse[1] >> np.uint32(30),
    ]
    acc_first = [lo, hi if pair else jnp.zeros_like(lo), jnp.zeros_like(lo)]
    zero = jnp.zeros_like(lo)
    limbs = []
    for t in range(n_limbs):
        v = jnp.where(is_new, acc_new[t], zero)
        v = jnp.where(is_reuse, acc_reuse[t], v)
        v = jnp.where(is_first, acc_first[t], v)
        limbs.append(v)

    max_bytes = (13 + type_bits + 7) // 8
    # per-lane LIST of (C, N) byte planes — never a stacked (C, N, L) tensor:
    # a tiny trailing dim tiles to (8, 128) and the stack/unstack pair costs
    # more layout copies than the downstream interleave sort (SKILL.md r2)
    byte_lanes = [
        ((limbs[k // 4] >> np.uint32(8 * (k % 4))) & np.uint32(0xFF)).astype(jnp.uint8)
        for k in range(max_bytes)
    ]
    return byte_lanes, lengths
