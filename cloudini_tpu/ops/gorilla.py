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
window is replaced exactly at points whose XOR does not fit it. That chain is
computed in parallel in three passes over the chunk:

  1. next-violation search: for every candidate point r (as a hypothetical
     window (lead_r, trail_r)), find the first later candidate q whose
     lead_q < lead_r or trail_q < trail_r — a binary descent over
     log2(N) range-min sparse tables (all-nearest-smaller-values, vectorized)
  2. orbit marking: the true reset set is the orbit of the first candidate
     under that successor function — pointer doubling, log2(N) scatter steps
  3. window gather: each point's window is the (lead, trail) of the last
     reset at or before it (cummax + gather)

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
from .orbit import mark_orbit

_U32 = jnp.uint32


def _range_min_tables(x: jnp.ndarray, levels: int):
    """Sparse min tables: tables[k][..., i] = min(x[..., i : i + 2**k]),
    positions past the end padded with the running minimum's identity (64)."""
    tables = [x]
    cur = x
    for k in range(levels - 1):
        w = 1 << k
        shifted = jnp.concatenate(
            [cur[..., w:], jnp.full(cur.shape[:-1] + (w,), 64, cur.dtype)], axis=-1
        )
        cur = jnp.minimum(cur, shifted)
        tables.append(cur)
    return tables


def _next_violation(lead_c: jnp.ndarray, trail_c: jnp.ndarray, levels: int) -> jnp.ndarray:
    """J[..., r] = first q > r with lead_c[q] < lead_c[r] (clamped to 31) or
    trail_c[q] < trail_c[r]; N when none. Non-candidate positions carry
    lead/trail = 64 so they never violate any threshold (<= 63)."""
    n = lead_c.shape[-1]
    ml = _range_min_tables(lead_c, levels)
    mt = _range_min_tables(trail_c, levels)
    tl = jnp.minimum(lead_c, 31)
    tt = trail_c
    idx = jnp.arange(n, dtype=jnp.int32)
    pos = jnp.broadcast_to(idx + 1, lead_c.shape)
    batch = jnp.arange(lead_c.shape[0], dtype=jnp.int32)[:, None]
    for k in range(levels - 1, -1, -1):
        w = 1 << k
        p = jnp.minimum(pos, n - 1)
        block_l = ml[k][batch, p]
        block_t = mt[k][batch, p]
        ok = (pos + w <= n) & (block_l >= tl) & (block_t >= tt)
        pos = pos + jnp.where(ok, w, 0)
        pos = jax.lax.optimization_barrier(pos)
    return jnp.minimum(pos, n)


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
    levels = max(1, int(n - 1).bit_length())
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

    j = _next_violation(lead_c, trail_c, levels)
    start = jnp.min(jnp.where(cand, idx, n), axis=-1)
    resets = mark_orbit(j, start, n)

    # window in effect when encoding each token = last reset strictly before it
    # for reuse tokens (reset tokens replace it themselves)
    stored_lead = jnp.minimum(lead, 31)
    reset_idx = jnp.where(resets, idx, -1)
    last_reset = jax.lax.cummax(reset_idx, axis=reset_idx.ndim - 1)
    prev_reset = jnp.roll(last_reset, 1, axis=-1).at[..., 0].set(-1)
    batch = jnp.arange(c, dtype=jnp.int32)[:, None]
    g = jnp.maximum(prev_reset, 0)
    win_lead = jnp.minimum(lead_c, 31)[batch, g]
    win_trail = trail_c[batch, g]

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
    bytes_mat = jnp.stack(
        [
            ((limbs[k // 4] >> np.uint32(8 * (k % 4))) & np.uint32(0xFF)).astype(jnp.uint8)
            for k in range(max_bytes)
        ],
        axis=-1,
    )
    return bytes_mat, lengths
