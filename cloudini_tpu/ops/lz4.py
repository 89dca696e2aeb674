"""Device (JAX) LZ4 block-format compressor — stage 2 on TPU.

The reference runs stage-2 LZ4/ZSTD on the host (codec_common.cpp:220-299,
LZ4_compress_default), which caps the pipeline at CPU speed (~0.5 GB/s/core)
while device stage-1 runs near HBM bandwidth. This kernel emits a *valid LZ4
block stream* (decodable by LZ4_decompress_safe and therefore by the reference
decoder) entirely on device:

  * match finding is FIXED-DISTANCE: for a small set of offsets D (1..64,
    biased toward point-stride periods) the match length at every position is
    a run-length of the elementwise equality mask data[i] == data[i-d] —
    computed for all positions at once with a reverse cummin (no hash table,
    no sort; stage-1 streams repeat at short periods, which is exactly what
    fixed offsets catch; offset 1 doubles as RLE)
  * the greedy parse (LZ4's sequential cursor walk) becomes the orbit of
    position 0 under next[i] = i + (match ? mlen : 1), marked by pointer
    doubling — the same construction as the Gorilla window chain
    (ops/gorilla.py)
  * serialization (tokens, 255-run length extensions, literal copies) is
    prefix sums + region-fill masks + one scatter per component

Measured vs liblz4 (scripts/lz4_ratio.py, artifact LZ4_RATIO.json): -1.6% on
lidar XYZI, +0.9% on the mixed DDS stream (was +99.5% before the sorted-gram
tier, +15% before same-offset chain merging); the host liblz4 path
(codec/stage2.py) remains the default where byte-parity with the reference
encoder matters.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .orbit import mark_orbit

# offsets searched: runs + typical LiDAR point strides and small periods
DISTANCES = (1, 2, 3, 4, 5, 6, 7, 8, 10, 12, 14, 16, 18, 20, 22, 24, 26, 28, 32, 40, 48, 64)

_MINMATCH = 4
_MFLIMIT = 12  # last match must start >= 12 B before end
_LASTLITERALS = 5  # last 5 bytes are always literals


def compress_bound(n: int) -> int:
    return n + n // 255 + 16


def _run_lengths(eq: jnp.ndarray) -> jnp.ndarray:
    """Length of the run of True starting at each position (0 when False):
    next-zero index via reverse cummin, minus own index."""
    n = eq.shape[-1]
    idx = jnp.arange(n, dtype=jnp.int32)
    nz = jnp.where(eq, n, idx)  # position of this zero, else sentinel
    # reverse cummin -> index of first zero at or after i
    rev = jax.lax.cummin(nz[..., ::-1], axis=eq.ndim - 1)[..., ::-1]
    return rev - idx




def _ext_count(n: jnp.ndarray) -> jnp.ndarray:
    """LZ4 length-extension byte count for a length field value n (the part
    above 14 in the token nibble): 0 when n < 15, else (n-15)//255 + 1."""
    return jnp.where(n >= 15, (n - 15) // 255 + 1, 0)


def _fill_regions(starts, counts, total_out: int, batch):
    """Boolean mask of the union of [start, start+count) regions (per row).

    Inactive lanes park at UNIQUE scratch slots past total_out: routing them
    all to one shared drop index makes TPU scatter serialize the colliding
    updates (observed ~1000x, data-dependent)."""
    c, n = starts.shape
    lane = jnp.arange(n, dtype=jnp.int32)
    park = total_out + lane
    bump = jnp.zeros((c, total_out + n), jnp.int32)
    bump = bump.at[batch, jnp.where(counts > 0, starts, park)].add(1, mode="drop")
    bump = bump.at[batch, jnp.where(counts > 0, starts + counts, park)].add(-1, mode="drop")
    return jnp.cumsum(bump[:, :total_out], axis=-1) > 0


_GRAM_BYTES = 16  # sort-matcher window: matches found at lengths 4..16


def _sorted_gram_matches(data: jnp.ndarray, sizes: jnp.ndarray,
                         n_words: int = 4):
    """Nearest-previous-occurrence match finder via ONE lexicographic sort —
    the TPU stand-in for liblz4's hash chains (LZ4_compress_default,
    reference codec_common.cpp:233). Every position keys on its
    4*n_words-byte gram with the position as the tiebreaker; after sorting,
    a position's best candidate is its left neighbor: equal leading words
    give the match length (from the XOR of the first differing word) and
    the position difference gives the offset. Long matches are capped at
    the gram width — the fixed-distance tier already catches long periodic
    runs, and same-offset chains re-merge in the zstd kernel — and the
    arbitrary-distance shortish matches this finds are exactly what the
    fixed-distance matcher missed (measured +99.5% vs liblz4 on the mixed
    DDS stream, LZ4_RATIO.json)."""
    c, b = data.shape
    gram_bytes = 4 * n_words
    idx = jnp.arange(b, dtype=jnp.int32)
    d32 = data.astype(jnp.uint32)

    def word(off):
        w = jnp.zeros((c, b), jnp.uint32)
        for k in range(4):
            sh = off + k
            col = jnp.concatenate(
                [d32[:, sh:], jnp.zeros((c, sh), jnp.uint32)], axis=-1
            ) if sh else d32
            # byte-REVERSED within the word so u32 ordering == lexicographic
            w = w | (col << np.uint32(8 * (3 - k)))
        return w
    ws = [word(4 * j) for j in range(n_words)]
    # positions whose gram would cross the stream end can't anchor a match
    # anyway (MFLIMIT); flag them in the position's bit 31 so a spurious
    # content match against one is rejected (their trailing gram bytes are
    # garbage). They are always the SUFFIX of the position range, so the
    # final sort-by-position still restores exact stream order.
    invalid = idx[None, :] + gram_bytes > sizes[:, None]
    pos = jnp.broadcast_to(idx[None, :], (c, b)).astype(jnp.uint32)
    pos = pos | (invalid.astype(jnp.uint32) << np.uint32(31))
    sorted_ops = jax.lax.sort(tuple(ws) + (pos,), dimension=1,
                              num_keys=n_words + 1, is_stable=False)
    ss, spos = sorted_ops[:-1], sorted_ops[-1]
    ppos = jnp.roll(spos, 1, axis=-1).at[:, 0].set(np.uint32(1 << 30))
    # match length from the first differing byte (byte-reversed words: the
    # leading-zero BYTES of the xor are the equal prefix)
    from ..ops import u64 as _u

    def eqb(x):
        return jnp.minimum(_u.clz32(x) >> 3, 4)
    mlen = eqb(ss[0] ^ jnp.roll(ss[0], 1, axis=-1))
    for j in range(1, n_words):
        mlen = mlen + jnp.where(
            mlen == 4 * j, eqb(ss[j] ^ jnp.roll(ss[j], 1, axis=-1)), 0)
    both_valid = ((spos | ppos) >> np.uint32(31)) == 0
    dist = (spos & np.uint32(0x7FFFFFFF)).astype(jnp.int32) - (
        ppos & np.uint32(0x7FFFFFFF)
    ).astype(jnp.int32)
    ok = both_valid & (mlen >= _MINMATCH) & (dist >= 1) & (dist <= 65535)
    # scatter (len, dist) back to stream order: one packed word, sorted by pos
    packed = jnp.where(ok, (mlen.astype(jnp.uint32) << 16)
                       | dist.astype(jnp.uint32), 0)
    _, r = jax.lax.sort((spos, packed), dimension=1, num_keys=1, is_stable=False)
    return (r >> 16).astype(jnp.int32), (r & np.uint32(0xFFFF)).astype(jnp.int32)


def merge_same_offset_chains(is_match: jnp.ndarray, mlen: jnp.ndarray,
                             off: jnp.ndarray):
    """Fold zero-literal same-offset chains into their head sequence.

    The sorted-gram tier truncates matches at the gram width, so one long
    arbitrary-offset match parses as a chain of zero-literal links with the
    same offset; each link costs a full sequence (3 B in LZ4: token +
    offset) where liblz4 pays ~1 B per 255 matched. Shared by the LZ4 and
    ZSTD kernels. Returns (head, merged_ml): head marks surviving sequence
    starts, merged_ml their folded match lengths (0 elsewhere)."""
    c, b = is_match.shape
    idx = jnp.arange(b, dtype=jnp.int32)
    ri = jnp.arange(c, dtype=jnp.int32)[:, None]
    pm_all = jax.lax.cummax(jnp.where(is_match, idx, -1), axis=1)
    pm_aprev = jnp.roll(pm_all, 1, axis=1).at[:, 0].set(-1)
    pm_aprev = jnp.where(is_match, pm_aprev, pm_all)
    ga = jnp.maximum(pm_aprev, 0)
    prev_end_all = jnp.where(pm_aprev >= 0, ga + mlen[ri, ga], 0)
    chained = is_match & (idx == prev_end_all) & (off == off[ri, ga]) & (
        pm_aprev >= 0)
    head = is_match & ~chained
    # chain extent: up to the next head or the end of contiguous coverage
    bump = jnp.zeros((c, 2 * b), jnp.int32)
    bump = bump.at[ri, jnp.where(is_match, idx, b + idx)].add(1, mode="drop")
    bump = bump.at[ri, jnp.where(is_match, idx + mlen, b + idx)].add(
        -1, mode="drop")
    cov = jnp.cumsum(bump[:, :b], axis=1) > 0
    covrun = _run_lengths(cov)
    nh = jnp.roll(
        jax.lax.cummin(jnp.where(head, idx, b)[:, ::-1], axis=1)[:, ::-1],
        -1, axis=1,
    ).at[:, -1].set(b)  # next head strictly after i
    merged_ml = jnp.where(head, jnp.minimum(nh, idx + covrun) - idx, 0)
    return head, merged_ml


def two_tier_matches(data: jnp.ndarray, sizes: jnp.ndarray, deep: bool = True,
                     gram_words: int = 4):
    """Both match-finder tiers (fixed stride-period distances + sorted-gram
    arbitrary-distance), shared by the LZ4 and ZSTD kernels. Returns
    (best_len, best_off) per position (no end-of-block rules applied)."""
    c, b = data.shape
    idx = jnp.arange(b, dtype=jnp.int32)
    size_col = sizes[:, None]
    d32 = data.astype(jnp.int32)

    best_len = jnp.zeros((c, b), jnp.int32)
    best_off = jnp.zeros((c, b), jnp.int32)
    for d in DISTANCES:
        if d >= b:
            continue
        eq = jnp.concatenate(
            [jnp.zeros((c, d), bool), d32[:, d:] == d32[:, :-d]], axis=-1
        ) & (idx < size_col)
        rl = _run_lengths(eq)
        better = rl > best_len
        best_len = jnp.where(better, rl, best_len)
        best_off = jnp.where(better, d, best_off)
        best_len, best_off = jax.lax.optimization_barrier((best_len, best_off))

    if deep and b > 4 * gram_words:
        g_len, g_off = _sorted_gram_matches(data, sizes, gram_words)
        better = g_len > best_len
        best_len = jnp.where(better, g_len, best_len)
        best_off = jnp.where(better, g_off, best_off)
    return best_len, best_off


@partial(jax.jit, static_argnums=(2, 3))
def lz4_compress_chunks(data: jnp.ndarray, sizes: jnp.ndarray, max_out: int,
                        deep: bool = True):
    """data (C, B) uint8, sizes (C,) int32 -> (out (C, max_out) uint8,
    out_sizes (C,) int32). Each row is an independent LZ4 block.
    ``deep`` adds the sorted-gram arbitrary-distance match finder."""
    c, b = data.shape
    idx = jnp.arange(b, dtype=jnp.int32)
    batch = jnp.arange(c, dtype=jnp.int32)[:, None]
    size_col = sizes[:, None]

    best_len, best_off = two_tier_matches(data, sizes, deep)

    # LZ4 block rules: match starts >= MFLIMIT before end; last 5 B literal
    best_len = jnp.minimum(best_len, size_col - _LASTLITERALS - idx)
    valid = (best_len >= _MINMATCH) & (idx <= size_col - _MFLIMIT) & (idx < size_col)
    mlen = jnp.where(valid, best_len, 0)

    # ---- greedy parse: orbit of 0 under i + (match ? mlen : 1) ------------
    nxt = jnp.minimum(idx + jnp.where(valid, mlen, 1), b)
    orbit = mark_orbit(nxt, jnp.zeros((c,), jnp.int32), b)
    is_match = orbit & valid
    # fold zero-literal same-offset link chains (gram-width truncation)
    is_match, mlen = merge_same_offset_chains(is_match, mlen, best_off)

    # ---- per-sequence geometry (computed in place at match positions) -----
    pm = jax.lax.cummax(jnp.where(is_match, idx, -1), axis=1)  # last match <= i
    pm_prev = jnp.roll(pm, 1, axis=1).at[:, 0].set(-1)  # last match < i
    pm_prev = jnp.where(is_match, pm_prev, pm)  # at a match: the previous one
    g = jnp.maximum(pm_prev, 0)
    prev_end = jnp.where(pm_prev >= 0, g + mlen[batch, g], 0)
    lit_len = jnp.where(is_match, idx - prev_end, 0)

    m_field = mlen - _MINMATCH
    lit_ext = jnp.where(is_match, _ext_count(lit_len), 0)
    mat_ext = jnp.where(is_match, _ext_count(m_field), 0)
    seq_size = jnp.where(is_match, 1 + lit_ext + lit_len + 2 + mat_ext, 0)

    out_start = jnp.cumsum(seq_size, axis=1) - seq_size  # exclusive, at matches
    match_total = jnp.sum(seq_size, axis=1)

    # ---- tail sequence (token + ext + trailing literals, no match) --------
    last_end = jnp.max(jnp.where(is_match, idx + mlen, 0), axis=1)
    tail_lit = jnp.maximum(sizes - last_end, 0)
    tail_ext = _ext_count(tail_lit)
    tail_dest = match_total
    out_sizes = match_total + 1 + tail_ext + tail_lit

    # output carries a b-wide scratch region: every masked scatter lane parks
    # at a UNIQUE in-bounds slot past max_out instead of one shared drop
    # index (colliding drops serialize TPU scatter, ~1000x data-dependent)
    out = jnp.zeros((c, max_out + b), jnp.uint8)
    park = max_out + idx

    # ---- tokens ------------------------------------------------------------
    tok = (jnp.minimum(lit_len, 15) << 4 | jnp.minimum(m_field, 15)).astype(jnp.uint8)
    out = out.at[batch, jnp.where(is_match, out_start, park)].set(tok, mode="drop")
    tail_tok = (jnp.minimum(tail_lit, 15) << 4).astype(jnp.uint8)
    out = out.at[batch, tail_dest[:, None]].set(tail_tok[:, None], mode="drop")

    # ---- length extensions: fill 255 runs, patch the last byte ------------
    ext_starts = jnp.concatenate([out_start + 1, (tail_dest + 1)[:, None]], axis=1)
    ext_counts = jnp.concatenate([lit_ext, tail_ext[:, None]], axis=1)
    ext_mask = _fill_regions(ext_starts, ext_counts, max_out, batch)
    # match extensions live after the offset
    moff_pos = out_start + 1 + lit_ext + lit_len
    mext_mask = _fill_regions(moff_pos + 2, mat_ext, max_out, batch)
    filler = jnp.concatenate([ext_mask | mext_mask, jnp.zeros((c, b), bool)], axis=1)
    out = jnp.where(filler, jnp.uint8(255), out)

    lit_rem = ((lit_len - 15) % 255).astype(jnp.uint8)
    pos = jnp.where(is_match & (lit_ext > 0), out_start + lit_ext, park)
    out = out.at[batch, pos].set(lit_rem, mode="drop")
    tail_rem = ((tail_lit - 15) % 255).astype(jnp.uint8)
    pos = jnp.where(tail_ext > 0, tail_dest + tail_ext, max_out)
    out = out.at[batch, pos[:, None]].set(tail_rem[:, None], mode="drop")
    mat_rem = ((m_field - 15) % 255).astype(jnp.uint8)
    pos = jnp.where(is_match & (mat_ext > 0), moff_pos + 1 + mat_ext, park)
    out = out.at[batch, pos].set(mat_rem, mode="drop")

    # ---- offsets (2 B little-endian) ---------------------------------------
    off = jnp.where(is_match, best_off, 0)
    pos = jnp.where(is_match, moff_pos, park)
    out = out.at[batch, pos].set((off & 0xFF).astype(jnp.uint8), mode="drop")
    out = out.at[batch, jnp.where(is_match, moff_pos + 1, park)].set(
        (off >> 8).astype(jnp.uint8), mode="drop"
    )

    # ---- literal copies: per-byte destination mapping ----------------------
    # covered = inside a selected match extent
    bump = jnp.zeros((c, 2 * b), jnp.int32)
    bump = bump.at[batch, jnp.where(is_match, idx, b + idx)].add(1, mode="drop")
    bump = bump.at[batch, jnp.where(is_match, idx + mlen, b + idx)].add(-1, mode="drop")
    covered = jnp.cumsum(bump[:, :b], axis=1) > 0
    is_lit = (~covered) & (idx < size_col)
    # next match at or after i (sentinel b -> tail literal)
    nm = jax.lax.cummin(jnp.where(is_match, idx, b)[:, ::-1], axis=1)[:, ::-1]
    in_tail = nm >= b
    seq_dest = out_start[batch, jnp.minimum(nm, b - 1)] + 1 + lit_ext[batch, jnp.minimum(nm, b - 1)]
    seq_prev_end = prev_end[batch, jnp.minimum(nm, b - 1)]
    dest = jnp.where(
        in_tail,
        (tail_dest + 1 + tail_ext)[:, None] + (idx - last_end[:, None]),
        seq_dest + (idx - seq_prev_end),
    )
    out = out.at[batch, jnp.where(is_lit, dest, park)].set(data, mode="drop")

    return out[:, :max_out], out_sizes.astype(jnp.int32)
