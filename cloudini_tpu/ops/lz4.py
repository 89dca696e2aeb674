"""Device (JAX) LZ4 block-format compressor — stage 2 on TPU.

The reference runs stage-2 LZ4/ZSTD on the host (codec_common.cpp:220-299,
LZ4_compress_default), which caps the pipeline at CPU speed (~0.5 GB/s/core)
while device stage-1 runs near HBM bandwidth. This kernel emits a *valid LZ4
block stream* (decodable by LZ4_decompress_safe and therefore by the reference
decoder) entirely on device:

  * match finding is FIXED-DISTANCE: for a small set of offsets D (1..32,
    biased toward point-stride periods) the match length at every position is
    a run-length of the elementwise equality mask data[i] == data[i-d] —
    computed for all positions at once with a reverse cummin (no hash table,
    no sort; stage-1 streams repeat at short periods, which is exactly what
    fixed offsets catch; offset 1 doubles as RLE)
  * the greedy parse (LZ4's sequential cursor walk) is restarted at every
    1024-byte boundary and run as ONE device-resident lax.scan over
    (C, n_blocks) cursor lanes (greedy_parse_blocked; the r2 whole-stream
    pointer-doubling orbit was gather-bound — seconds per batch)
  * serialization is gather/scatter-free (r3): per-sequence geometry comes
    from monotone cummax fills, every wire byte (token, offsets, remainders,
    255-run bytes, literals) is multiplexed onto an input position as a
    packed (dest << 8 | byte) key, and ONE 1-word sort builds the block —
    the same primitive as the stage-1 interleave (device_codec)

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



# offsets searched: runs + typical LiDAR point strides and small periods
DISTANCES = (1, 2, 3, 4, 5, 6, 7, 8, 16, 32)

_MINMATCH = 4
_MFLIMIT = 12  # last match must start >= 12 B before end
_LASTLITERALS = 5  # last 5 bytes are always literals


def compress_bound(n: int) -> int:
    return n + n // 255 + 16


def _run_lengths(eq: jnp.ndarray) -> jnp.ndarray:
    """Length of the run of True starting at each position (0 when False):
    next-zero index via reverse-direction cummin, minus own index."""
    n = eq.shape[-1]
    idx = jnp.arange(n, dtype=jnp.int32)
    nz = jnp.where(eq, n, idx)  # position of this zero, else sentinel
    # reverse-direction cummin -> index of first zero at or after i (the
    # kwarg form avoids two explicit reverse passes per call)
    rev = jax.lax.cummin(nz, axis=eq.ndim - 1, reverse=True)
    return rev - idx




def _ext_count(n: jnp.ndarray) -> jnp.ndarray:
    """LZ4 length-extension byte count for a length field value n (the part
    above 14 in the token nibble): 0 when n < 15, else (n-15)//255 + 1."""
    return jnp.where(n >= 15, (n - 15) // 255 + 1, 0)


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


_PARSE_BLOCK = 1024


def greedy_parse_blocked(valid: jnp.ndarray, mlen: jnp.ndarray,
                         block: int = _PARSE_BLOCK):
    """Greedy parse (the sequential cursor walk of LZ4_compress_default),
    restarted at every ``block`` bytes. Returns (is_match, mlen_eff).

    The r1/r2 form — binary lifting over the whole stream (ops/orbit.py) —
    is ~40 gather rounds over (C, B) at ~10 ns/element: ~4 s per 16-chunk
    batch on the real chip, the root cause of the 0.0015 GB/s fused-LZ4
    bench row (BENCH_r02, reproduced clean r3). Restarting the parse at
    block boundaries turns the walk into ONE ``block``-step lax.scan over
    (C, n_blocks) cursor lanes (device-resident, ~us/step, xs-fed so no
    gathers): matches truncate at the boundary (a truncated match shorter
    than MINMATCH decays to literals), and the ratio cost is mostly
    recovered downstream by merge_same_offset_chains — a match that
    continues across the restart re-merges into its head sequence.
    """
    c, b = valid.shape
    pad = (-b) % block
    if pad:
        valid = jnp.concatenate([valid, jnp.zeros((c, pad), bool)], axis=-1)
        mlen = jnp.concatenate([mlen, jnp.zeros((c, pad), jnp.int32)], axis=-1)
    bp = b + pad
    nb = bp // block
    rel_end = block - (jnp.arange(bp, dtype=jnp.int32) % block)
    ml_t = jnp.minimum(mlen, rel_end)
    ok = valid & (ml_t >= _MINMATCH)
    step = jnp.minimum(jnp.where(ok, ml_t, 1), rel_end)
    xs = step.reshape(c, nb, block).transpose(2, 0, 1)  # (block, C, nb)

    def body(cur, x):
        x_j, j = x
        member = cur == j
        return jnp.where(member, j + x_j, cur), member

    _, members = jax.lax.scan(
        body,
        jnp.zeros((c, nb), jnp.int32),
        (xs, jnp.arange(block, dtype=jnp.int32)),
    )
    is_match = members.transpose(1, 2, 0).reshape(c, bp) & ok
    return is_match[:, :b], jnp.where(is_match, ml_t, 0)[:, :b]


def merge_same_offset_chains(is_match: jnp.ndarray, mlen: jnp.ndarray,
                             off: jnp.ndarray):
    """Fold zero-literal same-offset chains into their head sequence.

    The sorted-gram tier truncates matches at the gram width (and the
    blocked parse at parse-block boundaries), so one long arbitrary-offset
    match parses as a chain of zero-literal links with the same offset;
    each link costs a full sequence (3 B in LZ4: token + offset) where
    liblz4 pays ~1 B per 255 matched. Shared by the LZ4 and ZSTD kernels.
    Returns (head, merged_ml): head marks surviving sequence starts,
    merged_ml their folded match lengths (0 elsewhere).

    Gather-free (r3): the previous-match attributes each match needs (its
    end; its offset) come from monotone cummax FILLS instead of the old
    ``x[ri, prev_match_index]`` gathers (~10 ns/element on this chip —
    fills are ~0.3 ns/element scans). Match ends are monotone, so the end
    fill is direct; offsets ride a (idx>>2 << 16 | off) pack (selected
    match starts are >= MINMATCH apart, so idx>>2 is unique and monotone;
    requires b <= 2**18 so the tag fits 16 bits — callers with wider
    buffers use the tight-width tier first). r4: the gate was ``b < 2**18``
    while the tight tier is EXACTLY 2**18 wide (8 B/pt x 32Ki), so the
    bench shape silently took the wide-fallback branch below whose two
    (C, B) ``x[ri, ga]`` gathers were 83% of the fused-LZ4 program
    (240 of 292 ms/iter, fusion.2/fusion.3 in the r4 HLO dump)."""
    c, b = is_match.shape
    idx = jnp.arange(b, dtype=jnp.int32)
    if b <= (1 << 18):
        end_fill = jax.lax.cummax(jnp.where(is_match, idx + mlen, -1), axis=1)
        prev_end_all = jnp.maximum(jnp.roll(end_fill, 1, axis=1).at[:, 0].set(-1), 0)
        offp = jnp.where(
            is_match,
            ((idx >> 2).astype(jnp.uint32) << 16) | off.astype(jnp.uint32),
            0,
        )
        off_fill = jax.lax.cummax(offp, axis=1)
        prev_off = (jnp.roll(off_fill, 1, axis=1).at[:, 0].set(0)
                    & np.uint32(0xFFFF)).astype(jnp.int32)
        chained = is_match & (idx == prev_end_all) & (off == prev_off)
    else:  # wide fallback: the pack above would overflow its 16-bit tag
        ri = jnp.arange(c, dtype=jnp.int32)[:, None]
        pm_all = jax.lax.cummax(jnp.where(is_match, idx, -1), axis=1)
        pm_aprev = jnp.roll(pm_all, 1, axis=1).at[:, 0].set(-1)
        pm_aprev = jnp.where(is_match, pm_aprev, pm_all)
        ga = jnp.maximum(pm_aprev, 0)
        prev_end_all = jnp.where(pm_aprev >= 0, ga + mlen[ri, ga], 0)
        chained = is_match & (idx == prev_end_all) & (off == off[ri, ga]) & (
            pm_aprev >= 0)
    head = is_match & ~chained
    # chain extent: up to the next head or the end of contiguous coverage;
    # covered = some match starting at or before i extends past i (selected
    # matches never overlap, so the end fill decides — no scatter bump)
    end_incl = jax.lax.cummax(jnp.where(is_match, idx + mlen, -1), axis=1)
    cov = idx < end_incl
    covrun = _run_lengths(cov)
    nh = jnp.roll(
        jax.lax.cummin(jnp.where(head, idx, b), axis=1, reverse=True),
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
    size_col = sizes[:, None]

    best_len, best_off = two_tier_matches(data, sizes, deep)

    # LZ4 block rules: match starts >= MFLIMIT before end; last 5 B literal
    best_len = jnp.minimum(best_len, size_col - _LASTLITERALS - idx)
    valid = (best_len >= _MINMATCH) & (idx <= size_col - _MFLIMIT) & (idx < size_col)
    mlen = jnp.where(valid, best_len, 0)

    # ---- greedy parse: block-restarted scan (see greedy_parse_blocked) ----
    is_match, mlen = greedy_parse_blocked(valid, mlen)
    # fold zero-literal same-offset link chains (gram-width + parse-block
    # truncation)
    is_match, mlen = merge_same_offset_chains(is_match, mlen, best_off)

    # ---- per-sequence geometry — ALL gather/scatter-free (r3) -------------
    # Every "attribute of my owning/previous match" comes from a monotone
    # cummax fill (~0.3 ns/element) instead of an x[batch, index] gather
    # (~10 ns/element); selected matches never overlap, so ends and output
    # starts are monotone along the stream.
    ends = jnp.where(is_match, idx + mlen, -1)
    end_incl = jax.lax.cummax(ends, axis=1)           # own/last end at <= i
    prev_end_f = jnp.maximum(                          # last end strictly < i
        jnp.roll(end_incl, 1, axis=1).at[:, 0].set(-1), 0
    )
    lit_len = jnp.where(is_match, idx - prev_end_f, 0)

    m_field = mlen - _MINMATCH
    lit_ext = jnp.where(is_match, _ext_count(lit_len), 0)
    mat_ext = jnp.where(is_match, _ext_count(m_field), 0)
    seq_size = jnp.where(is_match, 1 + lit_ext + lit_len + 2 + mat_ext, 0)

    s_incl = jnp.cumsum(seq_size, axis=1)              # (C, B) inclusive
    out_start = s_incl - seq_size                      # exclusive, at matches
    match_total = s_incl[:, -1]

    # ---- tail sequence (token + ext + trailing literals, no match) --------
    last_end = jnp.max(jnp.where(is_match, idx + mlen, 0), axis=1)
    tail_lit = jnp.maximum(sizes - last_end, 0)
    tail_ext = _ext_count(tail_lit)
    tail_dest = match_total
    out_sizes = match_total + 1 + tail_ext + tail_lit

    INVALID = np.uint32(0xFFFFFFFF)

    def key_at(dest, byte, ok):
        return jnp.where(
            ok, (dest.astype(jnp.uint32) << 8) | byte.astype(jnp.uint32), INVALID
        )

    # ---- main lane: one u32 key per input position --------------------------
    # Wire bytes multiplex onto input positions: a match's token rides its own
    # position; its offset/remainder bytes ride positions i+1..i+4, which its
    # extent covers (off bytes need mlen >= 4 = MINMATCH; the matrem byte
    # exists only when m_field >= 15, i.e. mlen >= 19 >> 4); literals ride
    # their own (uncovered) positions. Matches start >= MINMATCH apart, so
    # every position receives at most one valid key.
    covered = idx < end_incl
    is_lit = (~covered) & (~is_match) & (idx < size_col)
    # literal destinations, elementwise: its sequence is the NEXT match's;
    # that sequence's bytes-before-literals = inclusive seq_size cumsum at i
    # (no matches sit between i and its owning match), +1 token, +E ext bytes
    nm = jax.lax.cummin(jnp.where(is_match, idx, b), axis=1, reverse=True)
    in_tail = nm >= b
    pe = jnp.maximum(end_incl, 0)  # gap start for literal i
    gap_len = jnp.where(in_tail, tail_lit[:, None], nm - pe)
    gap_ext = _ext_count(gap_len)
    l_in_gap = idx - pe
    dest_lit = jnp.where(
        in_tail,
        (tail_dest + 1 + tail_ext)[:, None] + (idx - last_end[:, None]),
        s_incl + 1 + gap_ext + l_in_gap,
    )

    off = jnp.where(is_match, best_off, 0)
    tok = (jnp.minimum(lit_len, 15) << 4) | jnp.minimum(m_field, 15)
    moff = out_start + 1 + lit_ext + lit_len
    lit_rem = (lit_len - 15) % 255
    mat_rem = (m_field - 15) % 255

    def roll1(key, k):
        r = jnp.roll(key, k, axis=1)
        return r.at[:, :k].set(INVALID)

    lane = key_at(dest_lit, data.astype(jnp.uint32), is_lit)
    lane = jnp.minimum(lane, key_at(out_start, tok, is_match))
    lane = jnp.minimum(lane, roll1(key_at(moff, off & 0xFF, is_match), 1))
    lane = jnp.minimum(lane, roll1(key_at(moff + 1, off >> 8, is_match), 2))
    lane = jnp.minimum(
        lane, roll1(key_at(out_start + lit_ext, lit_rem, is_match & (lit_ext > 0)), 3)
    )
    lane = jnp.minimum(
        lane,
        roll1(key_at(moff + 1 + mat_ext, mat_rem, is_match & (mat_ext > 0)), 4),
    )

    # ---- ext lane: the 255 run bytes ----------------------------------------
    # A gap's k-th 255 byte (k < gap_ext - 1) rides the literal whose in-gap
    # index is 15 + 255k; a match's k-th 255 byte (k < mat_ext - 1) rides the
    # covered position with in-match index 5 + 255k (mlen >= 19 + 255k there,
    # so the position exists and is covered). Emitters are literal or covered
    # positions respectively — disjoint, at most one key per position.
    k_lit = (l_in_gap - 15) // 255
    lit255 = (
        is_lit & (l_in_gap >= 15) & ((l_in_gap - 15) % 255 == 0)
        & (k_lit < gap_ext - 1)
    )
    dest_l255 = jnp.where(
        in_tail, (tail_dest + 1)[:, None] + k_lit, s_incl + 1 + k_lit
    )
    hs = jax.lax.cummax(jnp.where(is_match, idx, -1), axis=1)  # own head <= i
    m_in = idx - jnp.maximum(hs, 0)
    own_mlen = end_incl - jnp.maximum(hs, 0)
    own_mext = _ext_count(own_mlen - _MINMATCH)
    moff_f = jax.lax.cummax(jnp.where(is_match, moff, -1), axis=1)  # monotone
    k_mat = (m_in - 5) // 255
    mat255 = (
        covered & (m_in >= 5) & ((m_in - 5) % 255 == 0) & (k_mat < own_mext - 1)
    )
    lane2 = key_at(dest_l255, jnp.uint32(255), lit255)
    lane2 = jnp.minimum(lane2, key_at(moff_f + 2 + k_mat, jnp.uint32(255), mat255))

    # ---- tail token + tail remainder: two per-row slots ---------------------
    tail_tok = (jnp.minimum(tail_lit, 15) << 4).astype(jnp.uint32)
    tail_cols = jnp.stack(
        [
            (tail_dest.astype(jnp.uint32) << 8) | tail_tok,
            jnp.where(
                tail_ext > 0,
                ((tail_dest + tail_ext).astype(jnp.uint32) << 8)
                | ((tail_lit - 15) % 255).astype(jnp.uint32),
                INVALID,
            ),
        ],
        axis=-1,
    )

    # ---- ONE 1-word sort builds the block -----------------------------------
    keys = jnp.concatenate([lane, lane2, tail_cols], axis=-1)
    stream = (jax.lax.sort(keys, dimension=1, is_stable=False) & np.uint32(0xFF)).astype(jnp.uint8)
    slots = keys.shape[1]
    if slots < max_out:
        stream = jnp.concatenate(
            [stream, jnp.zeros((c, max_out - slots), jnp.uint8)], axis=-1
        )
    out = stream[:, :max_out]
    out = jnp.where(
        jnp.arange(max_out, dtype=np.int32)[None, :] < out_sizes[:, None], out, 0
    )
    return out, out_sizes.astype(jnp.int32)
