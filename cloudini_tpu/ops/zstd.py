"""Device (JAX) ZSTD frame compressor — stage 2 on TPU.

The reference's headline stage-2 is ZSTD level 1 on the host
(/root/reference/cloudini_lib/src/codec_common.cpp:242), capping the pipeline
at CPU speed while device stage-1 runs near HBM bandwidth. This kernel emits
*valid ZSTD frames* (RFC 8878, decodable by libzstd and therefore by the
reference decoder) entirely on device:

  * match finding reuses the LZ4 kernel's two tiers (ops/lz4.py): fixed
    stride-period distances via reverse-cummin run lengths, plus the
    sorted-gram arbitrary-distance finder; the greedy parse is the orbit of
    position 0 under ``i + (match ? mlen : 1)`` (ops/orbit.py)
  * rows are segmented into independent 126 KiB blocks (a static reshape —
    ZSTD caps compressed blocks at 128 KiB); each block keeps at most
    ``max_seqs`` matches (a PREFIX of the parse, so the kept sequences'
    literal runs are unchanged; dropped tails decay to literals)
  * sequence coding uses the spec's PREDEFINED FSE distributions
    (ref/zstd_frame.py is the wire oracle): the three interleaved states
    (LL/ML/OF) advance in one short lax.scan over the (reversed) sequence
    axis — every other field width/value is computed in parallel, and the
    backward bitstream is assembled as cumsum bit positions + scatter-add
    of bit-disjoint u32 word contributions
  * literals are RAW in this tier (the Huffman literal stage is built on the
    same machinery separately); per block the kernel falls back to a
    Raw_Block when sequences do not pay

Wire-format parity is locked differentially: frames must decode bit-exactly
through BOTH libzstd (tests) and the numpy mini-decoder
(ref/zstd_frame.decode_frame).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ref import zstd_frame as ZF
from .lz4 import _run_lengths, _sorted_gram_matches, DISTANCES
from .orbit import mark_orbit

BLOCK_CAP = ZF.BLOCK_CAP  # 126 KiB: LL/ML/#seq stay in predefined-code range
_MINMATCH = 4  # sorted-gram tier keys 4-byte grams; zstd allows 3
_MAX_SEQS = 8192
_MAX_FIELD_BITS = 66  # per sequence: 17 update + 16+16+17 extra bits

# ---- predefined-table constants (single source of truth: ref/zstd_frame) ---

_LL_ENC, _, _LL_NB, _LL_BASE_T, _LL_FIRST = ZF.LL_TABLE
_ML_ENC, _, _ML_NB, _ML_BASE_T, _ML_FIRST = ZF.ML_TABLE
_OF_ENC, _, _OF_NB, _OF_BASE_T, _OF_FIRST = ZF.OF_TABLE

_LL_CODE64 = ZF.ll_code(np.arange(64)).astype(np.int32)  # ll < 64
_ML_CODE128 = ZF.ml_code(np.arange(128) + 3).astype(np.int32)  # mlf < 128
_LL_BASES = ZF.LL_BASE.astype(np.int32)
_LL_XBITS = ZF.LL_BITS.astype(np.int32)
_ML_BASES = ZF.ML_BASE.astype(np.int32)
_ML_XBITS = ZF.ML_BITS.astype(np.int32)


def compress_bound(n: int) -> int:
    nb = max(-(-n // BLOCK_CAP), 1)
    return n + 3 * nb + 16


def _ilog2(v: jnp.ndarray) -> jnp.ndarray:
    """floor(log2(v)) for v >= 1 (i32)."""
    return 31 - jax.lax.clz(v.astype(jnp.int32))


def _ll_code(ll: jnp.ndarray) -> jnp.ndarray:
    small = jnp.take(jnp.asarray(_LL_CODE64), jnp.clip(ll, 0, 63))
    return jnp.where(ll < 64, small, 19 + _ilog2(jnp.maximum(ll, 1)))


def _ml_code(mlf: jnp.ndarray) -> jnp.ndarray:
    """Code for the match-length field mlf = ml - MINMATCH(3)."""
    small = jnp.take(jnp.asarray(_ML_CODE128), jnp.clip(mlf, 0, 127))
    return jnp.where(mlf < 128, small, 36 + _ilog2(jnp.maximum(mlf, 1)))


def _match_parse(data: jnp.ndarray, sizes: jnp.ndarray):
    """LZ4-kernel match finding + greedy parse, zstd flavor: no LZ4 end-of-
    block rules, matches may run to the row end. Returns (is_match, mlen,
    off)."""
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

    if b > 16:
        g_len, g_off = _sorted_gram_matches(data, sizes)
        better = g_len > best_len
        best_len = jnp.where(better, g_len, best_len)
        best_off = jnp.where(better, g_off, best_off)

    best_len = jnp.minimum(best_len, size_col - idx)
    valid = (best_len >= _MINMATCH) & (idx < size_col)
    mlen = jnp.where(valid, best_len, 0)

    nxt = jnp.minimum(idx + jnp.where(valid, mlen, 1), b)
    orbit = mark_orbit(nxt, jnp.zeros((c,), jnp.int32), b)
    return orbit & valid, mlen, best_off


@partial(jax.jit, static_argnums=(2, 3))
def zstd_compress_chunks(data: jnp.ndarray, sizes: jnp.ndarray, max_out: int,
                         max_seqs: int = _MAX_SEQS):
    """data (C, B) uint8, sizes (C,) int32 -> (out (C, max_out) uint8,
    out_sizes (C,) int32). Each row becomes one ZSTD frame."""
    c, b = data.shape
    nb_blocks = max(-(-b // BLOCK_CAP), 1)
    cap = min(b, BLOCK_CAP)
    pad = nb_blocks * cap - b
    if pad:
        data = jnp.concatenate([data, jnp.zeros((c, pad), jnp.uint8)], axis=-1)

    # ---- independent 126 KiB blocks: (C, B) -> (C*NB, cap) -----------------
    sub = data.reshape(c * nb_blocks, cap)
    blk = jnp.arange(nb_blocks, dtype=jnp.int32)
    sub_sizes = jnp.clip(
        sizes[:, None] - blk[None, :] * cap, 0, cap
    ).reshape(c * nb_blocks)

    body, body_sizes = _encode_blocks(sub, sub_sizes, max_seqs)

    # ---- frame assembly ----------------------------------------------------
    # per row: magic(4) + FHD(1) + window 2^17 (1) + NB blocks
    body_sizes = body_sizes.reshape(c, nb_blocks)
    blk_start = 6 + jnp.cumsum(body_sizes, axis=1) - body_sizes  # (C, NB)
    out_sizes = 6 + jnp.sum(body_sizes, axis=1)

    bw = body.shape[1]
    out = jnp.zeros((c, max_out + bw), jnp.uint8)
    ci = jnp.arange(c, dtype=jnp.int32)[:, None]
    hdr = jnp.asarray(
        [0x28, 0xB5, 0x2F, 0xFD, 0x00, (17 - 10) << 3], jnp.uint8
    )
    out = out.at[ci, jnp.arange(6, dtype=jnp.int32)[None, :]].set(hdr[None, :])

    # scatter each block body to its frame offset
    k = jnp.arange(bw, dtype=jnp.int32)
    body = body.reshape(c, nb_blocks, bw)
    for j in range(nb_blocks):
        pos = jnp.where(
            k[None, :] < body_sizes[:, j: j + 1],
            blk_start[:, j: j + 1] + k[None, :],
            max_out + k[None, :],
        )
        out = out.at[ci, pos].set(body[:, j], mode="drop")
    # the final block carries the ``last`` flag (bit 0 of its header byte 0)
    out = out.at[jnp.arange(c), blk_start[:, -1]].add(1)
    return out[:, :max_out], out_sizes.astype(jnp.int32)


def _encode_blocks(data: jnp.ndarray, sizes: jnp.ndarray, max_seqs: int):
    """Rows (R, cap) -> (block bytes (R, cap+16) incl. the 3-byte block
    header with ``last``=0, per-row total sizes)."""
    r, cap = data.shape
    s = max(min(max_seqs, cap // _MINMATCH + 2), 2)
    idx = jnp.arange(cap, dtype=jnp.int32)
    ri = jnp.arange(r, dtype=jnp.int32)[:, None]
    size_col = sizes[:, None]

    is_match, mlen, off = _match_parse(data, sizes)

    # ---- merge same-offset chains (stream domain, BEFORE the cap) ---------
    # the sorted-gram tier truncates matches at 16 B, so one long match
    # parses as a chain of zero-literal same-offset links; fold each chain
    # into its head so the cap counts real sequences, not links
    pm_all = jax.lax.cummax(jnp.where(is_match, idx, -1), axis=1)
    pm_aprev = jnp.roll(pm_all, 1, axis=1).at[:, 0].set(-1)
    pm_aprev = jnp.where(is_match, pm_aprev, pm_all)
    ga = jnp.maximum(pm_aprev, 0)
    prev_end_all = jnp.where(pm_aprev >= 0, ga + mlen[ri, ga], 0)
    chained = is_match & (idx == prev_end_all) & (off == off[ri, ga]) & (
        pm_aprev >= 0)
    head = is_match & ~chained
    # chain extent: up to the next head or the end of contiguous coverage
    bump_a = jnp.zeros((r, 2 * cap), jnp.int32)
    bump_a = bump_a.at[ri, jnp.where(is_match, idx, cap + idx)].add(1, mode="drop")
    bump_a = bump_a.at[ri, jnp.where(is_match, idx + mlen, cap + idx)].add(
        -1, mode="drop")
    cov_all = jnp.cumsum(bump_a[:, :cap], axis=1) > 0
    covrun = _run_lengths(cov_all)
    nh = jnp.roll(
        jax.lax.cummin(jnp.where(head, idx, cap)[:, ::-1], axis=1)[:, ::-1],
        -1, axis=1,
    ).at[:, -1].set(cap)  # next head strictly after i
    merged_ml = jnp.where(head, jnp.minimum(nh, idx + covrun) - idx, 0)

    # keep a prefix of s merged sequences; the rest decay to literals
    head_rank = jnp.cumsum(head.astype(jnp.int32), axis=1) - 1
    keep = head & (head_rank < s)
    n_seq = jnp.minimum(jnp.sum(head.astype(jnp.int32), axis=1), s)
    mlen = jnp.where(keep, merged_ml, 0)

    # literal-run length before each kept sequence (same construction as LZ4)
    pm = jax.lax.cummax(jnp.where(keep, idx, -1), axis=1)
    pm_prev = jnp.roll(pm, 1, axis=1).at[:, 0].set(-1)
    pm_prev = jnp.where(keep, pm_prev, pm)
    g = jnp.maximum(pm_prev, 0)
    prev_end = jnp.where(pm_prev >= 0, g + mlen[ri, g], 0)
    lit_len = jnp.where(keep, idx - prev_end, 0)

    # ---- compact kept sequences to (R, S): one sort by stream position ----
    key = jnp.where(keep, idx, cap).astype(jnp.int32)
    _, c_ll, c_ml, c_of = jax.lax.sort(
        (key, lit_len, mlen, jnp.where(keep, off, 0)),
        dimension=1, num_keys=1, is_stable=False,
    )
    c_ll, c_ml, c_of = c_ll[:, :s], c_ml[:, :s], c_of[:, :s]
    sj = jnp.arange(s, dtype=jnp.int32)
    live = sj[None, :] < n_seq[:, None]

    # ---- codes + extra-bit fields (parallel) ------------------------------
    llc = _ll_code(c_ll)
    mlf = c_ml - 3
    mlc = _ml_code(jnp.maximum(mlf, 0))
    ofv = c_of + 3
    ofc = jnp.where(live, _ilog2(jnp.maximum(ofv, 1)), 0)
    llx = c_ll - jnp.take(jnp.asarray(_LL_BASES), llc)
    llxw = jnp.where(live, jnp.take(jnp.asarray(_LL_XBITS), llc), 0)
    mlx = mlf - (jnp.take(jnp.asarray(_ML_BASES), mlc) - 3)
    mlxw = jnp.where(live, jnp.take(jnp.asarray(_ML_XBITS), mlc), 0)
    ofx = ofv - (1 << ofc)
    ofxw = jnp.where(live, ofc, 0)

    # ---- reversed order: j = 0 is the LAST live sequence ------------------
    rev = jnp.maximum(n_seq[:, None] - 1 - sj[None, :], 0)
    r_llc = jnp.take_along_axis(llc, rev, axis=1)
    r_mlc = jnp.take_along_axis(mlc, rev, axis=1)
    r_ofc = jnp.take_along_axis(ofc, rev, axis=1)

    # ---- FSE state chains: one scan over the reversed sequence axis -------
    enc_ll = jnp.asarray(_LL_ENC.reshape(-1))
    enc_ml = jnp.asarray(_ML_ENC.reshape(-1))
    enc_of = jnp.asarray(_OF_ENC.reshape(-1))
    nb_ll, base_ll = jnp.asarray(_LL_NB), jnp.asarray(_LL_BASE_T)
    nb_ml, base_ml = jnp.asarray(_ML_NB), jnp.asarray(_ML_BASE_T)
    nb_of, base_of = jnp.asarray(_OF_NB), jnp.asarray(_OF_BASE_T)

    p0_ll = jnp.take(jnp.asarray(_LL_FIRST), r_llc[:, 0])
    p0_ml = jnp.take(jnp.asarray(_ML_FIRST), r_mlc[:, 0])
    p0_of = jnp.take(jnp.asarray(_OF_FIRST), r_ofc[:, 0])

    # states packed into one i32 lane (6+6+5 bits); the scan carries states
    # only — update fields are recomputed in parallel from the stacked
    # before-states afterwards (scan-step latency dominates, see ops/fsm.py)
    from .fsm import _scan_unrolled

    packed0 = p0_ll | (p0_ml << 6) | (p0_of << 12)
    sym_pack = r_llc | (r_mlc << 6) | (r_ofc << 12)

    def fstep(carry, sym, lv):
        pll, pml, pof = carry & 63, (carry >> 6) & 63, carry >> 12
        sll, sml, sof = sym & 63, (sym >> 6) & 63, sym >> 12
        u_ll = jnp.take(enc_ll, sll * 64 + pll)
        u_ml = jnp.take(enc_ml, sml * 64 + pml)
        u_of = jnp.take(enc_of, sof * 32 + pof)
        return jnp.where(lv, u_ll | (u_ml << 6) | (u_of << 12), carry)

    lv = jnp.arange(1, s, dtype=jnp.int32)[:, None] < n_seq[None, :]
    f_pack, before = _scan_unrolled(
        fstep, packed0, (sym_pack[:, 1:].T, lv), 8)
    f_ll, f_ml, f_of = f_pack & 63, (f_pack >> 6) & 63, f_pack >> 12
    # before[j-1] = states before step j -> prev states for update fields j
    prev = jnp.concatenate([packed0[:, None], before.T], axis=1)  # (R, S)
    pll, pml, pof = prev & 63, (prev >> 6) & 63, prev >> 12
    uu_ll = jnp.take(enc_ll, (r_llc * 64 + pll).reshape(-1)).reshape(r, s)
    uu_ml = jnp.take(enc_ml, (r_mlc * 64 + pml).reshape(-1)).reshape(r, s)
    uu_of = jnp.take(enc_of, (r_ofc * 32 + pof).reshape(-1)).reshape(r, s)
    nz = sj[None, :] > 0  # no update field precedes sequence j=0
    u_llv = pll - jnp.take(base_ll, uu_ll)
    u_llw = jnp.where(live & nz, jnp.take(nb_ll, uu_ll), 0)
    u_mlv = pml - jnp.take(base_ml, uu_ml)
    u_mlw = jnp.where(live & nz, jnp.take(nb_ml, uu_ml), 0)
    u_ofv = pof - jnp.take(base_of, uu_of)
    u_ofw = jnp.where(live & nz, jnp.take(nb_of, uu_of), 0)

    # extra-bit fields in reversed order
    r_llx = jnp.take_along_axis(llx, rev, axis=1)
    r_llxw = jnp.where(live, jnp.take_along_axis(llxw, rev, axis=1), 0)
    r_mlx = jnp.take_along_axis(mlx, rev, axis=1)
    r_mlxw = jnp.where(live, jnp.take_along_axis(mlxw, rev, axis=1), 0)
    r_ofx = jnp.take_along_axis(ofx, rev, axis=1)
    r_ofxw = jnp.where(live, jnp.take_along_axis(ofxw, rev, axis=1), 0)

    # ---- bit layout (forward writer, decoder reads backward) --------------
    # group j: [of_upd, ml_upd, ll_upd, llx, mlx, ofx]  (updates empty at j=0)
    t = u_ofw + u_mlw + u_llw + r_llxw + r_mlxw + r_ofxw
    gstart = jnp.cumsum(t, axis=1) - t
    p_ofu = gstart
    p_mlu = p_ofu + u_ofw
    p_llu = p_mlu + u_mlw
    p_llx = p_llu + u_llw
    p_mlx = p_llx + r_llxw
    p_ofx = p_mlx + r_mlxw
    total = jnp.sum(t, axis=1)  # (R,)

    # final states (6/5/6 bits) + marker
    seq_bytes = jnp.where(n_seq > 0, (total + 17 + 1 + 7) >> 3, 0)

    # ---- section geometry -------------------------------------------------
    match_total = jnp.sum(jnp.where(keep, mlen, 0), axis=1)
    n_lits = sizes - match_total
    seq_hdr = jnp.where(n_seq == 0, 1, jnp.where(n_seq < 128, 2, 3))
    content = 3 + n_lits + seq_hdr + seq_bytes
    use_raw = (content >= sizes) | (sizes == 0)
    body_size = 3 + jnp.where(use_raw, sizes, content)
    live_row = (n_seq > 0) & ~use_raw

    # ---- emit -------------------------------------------------------------
    nw = (s * _MAX_FIELD_BITS + 18 + 63) // 32 + 2
    ww = cap + 16
    scratch = max(cap, 4 * nw) + 48
    out = jnp.zeros((r, ww + scratch), jnp.uint8)
    park_b = ww + idx  # unique per-byte scratch

    # block header (3 B): size<<3 | type<<1 | last(0, patched upstream)
    btype = jnp.where(use_raw, 0, 2)
    bh = (jnp.where(use_raw, sizes, content) << 3) | (btype << 1)
    for k in range(3):
        out = out.at[ri, jnp.full((r, 1), k, jnp.int32)].set(
            ((bh >> (8 * k)) & 0xFF).astype(jnp.uint8)[:, None])

    # literals header (3 B): raw literals, size_format 3 (20-bit size)
    lh = jnp.stack(
        [(0 | (3 << 2) | ((n_lits & 0xF) << 4)),
         (n_lits >> 4) & 0xFF,
         n_lits >> 12], axis=1,
    ).astype(jnp.uint8)
    lpos = jnp.where(use_raw[:, None], park_b[None, :3] * jnp.ones((r, 1), jnp.int32),
                     3 + jnp.arange(3, dtype=jnp.int32)[None, :])
    out = out.at[ri, lpos].set(lh, mode="drop")

    # literal copies: bytes not covered by a kept match (raw rows copy all)
    bump = jnp.zeros((r, 2 * cap), jnp.int32)
    bump = bump.at[ri, jnp.where(keep, idx, cap + idx)].add(1, mode="drop")
    bump = bump.at[ri, jnp.where(keep, idx + mlen, cap + idx)].add(-1, mode="drop")
    covered = jnp.cumsum(bump[:, :cap], axis=1) > 0
    is_lit = (~covered) & (idx < size_col)
    lit_rank = jnp.cumsum(is_lit.astype(jnp.int32), axis=1) - 1
    dest = jnp.where(use_raw[:, None], 3 + idx, 6 + lit_rank)
    emit = jnp.where(use_raw[:, None], idx < size_col, is_lit)
    out = out.at[ri, jnp.where(emit, dest, park_b)].set(data, mode="drop")

    # sequences header: count byte(s) + predefined-mode byte
    sq0 = 3 + 3 + n_lits  # section offset within the block body
    h0 = jnp.where(n_seq < 128, n_seq, 128 + (n_seq >> 8)).astype(jnp.uint8)
    out = out.at[ri, jnp.where(~use_raw, sq0, ww)[:, None]].set(
        h0[:, None], mode="drop")
    # byte 1: low count byte (n>=128) or the predefined-mode byte (1<=n<128)
    h1 = jnp.where(n_seq < 128, jnp.uint8(0), (n_seq & 0xFF).astype(jnp.uint8))
    out = out.at[ri, jnp.where(live_row, sq0 + 1, ww + 1)[:, None]].set(
        h1[:, None], mode="drop")
    h2pos = jnp.where(live_row & (n_seq >= 128), sq0 + 2, ww + 2)
    out = out.at[ri, h2pos[:, None]].set(jnp.zeros((r, 1), jnp.uint8),
                                         mode="drop")

    # ---- FSE bitstream: scatter-add u32 word contributions ----------------
    words = jnp.zeros((r, nw + s + 1), jnp.uint32)

    def put(words, pos, val, width, mask):
        lanes = pos.shape[1]
        park = nw + sj[None, :lanes]
        v = val.astype(jnp.uint32)
        sh = (pos & 31).astype(jnp.uint32)
        w0 = pos >> 5
        lo = v << sh
        hi = jnp.where(sh > 0, v >> (jnp.uint32(32) - jnp.maximum(sh, 1)), 0)
        m = mask & (width > 0)
        words = words.at[ri, jnp.where(m, w0, park)].add(lo, mode="drop")
        words = words.at[ri, jnp.where(m, w0 + 1, park)].add(hi, mode="drop")
        return words

    words = put(words, p_ofu, u_ofv, u_ofw, live)
    words = put(words, p_mlu, u_mlv, u_mlw, live)
    words = put(words, p_llu, u_llv, u_llw, live)
    words = put(words, p_llx, r_llx, r_llxw, live)
    words = put(words, p_mlx, r_mlx, r_mlxw, live)
    words = put(words, p_ofx, r_ofx, r_ofxw, live)
    # final states + marker (single lane per row)
    fs = (f_ml.astype(jnp.uint32)
          | (f_of.astype(jnp.uint32) << 6)
          | (f_ll.astype(jnp.uint32) << 11)
          | (jnp.uint32(1) << 17))
    words = put(words, total[:, None], fs[:, None],
                jnp.full((r, 1), 18, jnp.int32), live_row[:, None])
    words = words[:, :nw]

    # words -> bytes (little-endian), scatter the stream into the section
    wb = jnp.repeat(words, 4, axis=1) >> jnp.tile(
        jnp.arange(4, dtype=jnp.uint32) * 8, nw)[None, :]
    wb = (wb & jnp.uint32(0xFF)).astype(jnp.uint8)
    bidx = jnp.arange(nw * 4, dtype=jnp.int32)
    bpos = jnp.where(
        (bidx[None, :] < seq_bytes[:, None]) & live_row[:, None],
        (sq0 + seq_hdr)[:, None] + bidx[None, :],
        ww + 32 + bidx[None, :],
    )
    out = out.at[ri, bpos].set(wb, mode="drop")

    return out[:, :ww], body_size
