"""Numpy kernel of truth: ZSTD frame writer (raw literals + predefined-FSE
sequences), RFC 8878 conformant.

The reference's headline stage-2 is ZSTD level 1 on the host
(/root/reference/cloudini_lib/src/codec_common.cpp:242). This module is the
wire-format oracle for the DEVICE zstd stage 2 (ops/zstd.py): it serializes
(literals, sequences) into frames that any conforming zstd decoder accepts —
every test round-trips through the ``zstandard`` C library.

Scope (deliberate):
  * LZ sequences are FSE-coded with the spec's PREDEFINED distributions
    (RFC 8878 3.1.1.3.2.2) — no sequence table headers on the wire.
  * literals are Huffman-coded (4 streams, package-merge length-limited
    codes, direct or FSE-compressed weights) whenever that is smaller than
    the raw form; match acceptance is entropy-gated so low-entropy streams
    keep their literals for the Huffman stage.
  * offsets always use Offset_Value = offset + 3 (no repeat-offset codes).
  * blocks are capped at BLOCK_CAP bytes so Literals_Length / Match_Length /
    Number_of_Sequences can never overflow their predefined-code ranges.

FSE here is formulated by INVERTING the decode table: the decoder's states
for a symbol partition [0, table_size) into dyadic intervals, so the encoder
transition is a dense (n_symbols, table_size) lookup — the same formulation
the device kernel vectorizes.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

MAGIC = b"\x28\xb5\x2f\xfd"
# Block_Maximum_Size = min(window 2^17, 128 KiB) = 128 KiB exactly (RFC 8878
# 3.1.1.2.3). At this cap the max literal run with >= 1 sequence is
# 131068 -> LL code 35 (<= 131071) and the max mlf < 2^17 -> ML code 52 —
# still inside the predefined code ranges. 128 KiB (vs the old 126 KiB
# safety margin) makes a 256 KiB device row exactly 2 blocks, not 3.
BLOCK_CAP = 128 * 1024
MINMATCH = 3

# ---- predefined FSE distributions (RFC 8878 3.1.1.3.2.2) -------------------

LL_DEFAULT = np.array(
    [4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 2, 2, 2, 2, 2, 2, 2, 2,
     2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1], np.int32)
LL_LOG = 6
ML_DEFAULT = np.array(
    [1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, -1,
     -1, -1, -1, -1, -1, -1], np.int32)
ML_LOG = 6
OF_DEFAULT = np.array(
    [1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     -1, -1, -1, -1, -1], np.int32)
OF_LOG = 5

# ---- literals-length / match-length code tables (RFC 8878 3.1.1.3.2.1.1) ---
# code -> (baseline, number_of_extra_bits); codes 0..15 are LL 0..15 direct,
# codes 0..31 are ML 3..34 direct.

_LL_EXTRA = [(16, 1), (18, 1), (20, 1), (22, 1), (24, 2), (28, 2), (32, 3),
             (40, 3), (48, 4), (64, 6), (128, 7), (256, 8), (512, 9),
             (1024, 10), (2048, 11), (4096, 12), (8192, 13), (16384, 14),
             (32768, 15), (65536, 16)]
LL_BASE = np.array([i for i in range(16)] + [b for b, _ in _LL_EXTRA], np.int64)
LL_BITS = np.array([0] * 16 + [n for _, n in _LL_EXTRA], np.int32)

_ML_EXTRA = [(35, 1), (37, 1), (39, 1), (41, 1), (43, 2), (47, 2), (51, 3),
             (59, 3), (67, 4), (83, 4), (99, 5), (131, 7), (259, 8), (515, 9),
             (1027, 10), (2051, 11), (4099, 12), (8195, 13), (16387, 14),
             (32771, 15), (65539, 16)]
ML_BASE = np.array([i + 3 for i in range(32)] + [b for b, _ in _ML_EXTRA], np.int64)
ML_BITS = np.array([0] * 32 + [n for _, n in _ML_EXTRA], np.int32)


def ll_code(v: np.ndarray) -> np.ndarray:
    """Literals_Length_Code for length v (vectorized)."""
    v = np.asarray(v, np.int64)
    return np.searchsorted(LL_BASE, v, side="right").astype(np.int32) - 1


def ml_code(v: np.ndarray) -> np.ndarray:
    v = np.asarray(v, np.int64)
    return np.searchsorted(ML_BASE, v, side="right").astype(np.int32) - 1


# ---- FSE tables ------------------------------------------------------------


def fse_spread(norm: np.ndarray, table_log: int) -> np.ndarray:
    """Symbol spread over table positions (RFC 8878 4.1.1): low-probability
    (-1) symbols take the highest positions; the rest spread with the
    standard step, skipping positions above high_threshold."""
    size = 1 << table_log
    spread = np.full(size, -1, np.int32)
    high = size - 1
    for s, c in enumerate(norm):
        if c == -1:
            spread[high] = s
            high -= 1
    step = (size >> 1) + (size >> 3) + 3
    mask = size - 1
    pos = 0
    for s, c in enumerate(norm):
        for _ in range(max(int(c), 0)):
            spread[pos] = s
            pos = (pos + step) & mask
            while pos > high:
                pos = (pos + step) & mask
    assert pos == 0 and np.all(spread >= 0)
    return spread


def fse_decode_table(norm: np.ndarray, table_log: int):
    """(symbol, nb_bits, baseline) per table position. Decoding at position u
    reads nb_bits[u] bits b and moves to position baseline[u] + b."""
    size = 1 << table_log
    spread = fse_spread(norm, table_log)
    next_count = np.where(norm == -1, 1, norm).astype(np.int64)
    nb_bits = np.zeros(size, np.int32)
    base = np.zeros(size, np.int32)
    for u in range(size):
        s = spread[u]
        x = next_count[s]
        next_count[s] += 1
        nb = table_log - int(x).bit_length() + 1
        nb_bits[u] = nb
        base[u] = (int(x) << nb) - size
    return spread, nb_bits, base


def fse_encode_table(norm: np.ndarray, table_log: int):
    """Dense inverse: enc[s, p] = the unique position u with symbol u == s and
    baseline[u] <= p < baseline[u] + 2^nb_bits[u] (the intervals of a
    symbol's states partition [0, size)). Also returns the per-position
    (symbol, nb_bits, baseline) decode arrays and the first position of each
    symbol (the canonical initial encoder state)."""
    size = 1 << table_log
    spread, nb_bits, base = fse_decode_table(norm, table_log)
    enc = np.full((len(norm), size), -1, np.int32)
    first = np.full(len(norm), -1, np.int32)
    for u in range(size):
        s = spread[u]
        enc[s, base[u]: base[u] + (1 << nb_bits[u])] = u
        if first[s] < 0:
            first[s] = u
    for s, c in enumerate(norm):
        if c != 0:
            assert np.all(enc[s] >= 0), f"symbol {s} does not cover the table"
    return enc, spread, nb_bits, base, first


LL_TABLE = fse_encode_table(LL_DEFAULT, LL_LOG)
ML_TABLE = fse_encode_table(ML_DEFAULT, ML_LOG)
OF_TABLE = fse_encode_table(OF_DEFAULT, OF_LOG)


# ---- bit writer (forward little-endian; decoder reads it backward) ---------


class _BitWriter:
    def __init__(self):
        self.acc = 0
        self.n = 0

    def add(self, value: int, nbits: int):
        assert 0 <= value < (1 << nbits) if nbits else value == 0
        self.acc |= value << self.n
        self.n += nbits

    def close(self) -> bytes:
        self.add(1, 1)  # end-of-stream marker bit
        nbytes = (self.n + 7) // 8
        return self.acc.to_bytes(nbytes, "little")


# ---- sequences section -----------------------------------------------------


def encode_sequences(seqs: Sequence[Tuple[int, int, int]]) -> bytes:
    """(literals_length, match_length, offset) triples -> the
    Sequences_Section bytes (predefined mode, backward FSE bitstream)."""
    n = len(seqs)
    if n == 0:
        return b"\x00"
    assert n <= 32511, "block too many sequences for the 2-byte header"
    if n < 128:
        head = bytes([n])
    else:
        head = bytes([128 + (n >> 8), n & 0xFF])
    head += b"\x00"  # all three symbols in Predefined_Mode

    ll = np.array([s[0] for s in seqs], np.int64)
    mlv = np.array([s[1] for s in seqs], np.int64)
    off = np.array([s[2] for s in seqs], np.int64)
    assert mlv.min() >= MINMATCH and off.min() >= 1
    ofv = off + 3  # no repeat-offset codes
    llc = ll_code(ll)
    mlc = ml_code(mlv)
    ofc = np.floor(np.log2(ofv)).astype(np.int32)
    ll_extra = (ll - LL_BASE[llc]).astype(np.int64)
    ml_extra = (mlv - ML_BASE[mlc]).astype(np.int64)
    of_extra = (ofv - (np.int64(1) << ofc.astype(np.int64))).astype(np.int64)
    llb = LL_BITS[llc]
    mlb = ML_BITS[mlc]

    enc_ll, _, nb_ll, base_ll, first_ll = LL_TABLE
    enc_ml, _, nb_ml, base_ml, first_ml = ML_TABLE
    enc_of, _, nb_of, base_of, first_of = OF_TABLE

    w = _BitWriter()
    # encoder walks sequences LAST -> FIRST; init states carry no bits
    p_ll = int(first_ll[llc[n - 1]])
    p_ml = int(first_ml[mlc[n - 1]])
    p_of = int(first_of[ofc[n - 1]])
    w.add(int(ll_extra[n - 1]), int(llb[n - 1]))
    w.add(int(ml_extra[n - 1]), int(mlb[n - 1]))
    w.add(int(of_extra[n - 1]), int(ofc[n - 1]))
    for i in range(n - 2, -1, -1):
        u = int(enc_of[ofc[i], p_of])
        w.add(p_of - int(base_of[u]), int(nb_of[u]))
        p_of = u
        u = int(enc_ml[mlc[i], p_ml])
        w.add(p_ml - int(base_ml[u]), int(nb_ml[u]))
        p_ml = u
        u = int(enc_ll[llc[i], p_ll])
        w.add(p_ll - int(base_ll[u]), int(nb_ll[u]))
        p_ll = u
        w.add(int(ll_extra[i]), int(llb[i]))
        w.add(int(ml_extra[i]), int(mlb[i]))
        w.add(int(of_extra[i]), int(ofc[i]))
    # final (= decoder-initial) states, then the close marker
    w.add(p_ml, ML_LOG)
    w.add(p_of, OF_LOG)
    w.add(p_ll, LL_LOG)
    return head + w.close()


def fse_normalize(hist: np.ndarray, table_log: int):
    """Symbol counts -> normalized distribution summing to 2^table_log with
    every present symbol >= 1 (largest-remainder on the dominant symbol), or
    None when unrepresentable (< 2 present symbols, or the dominant symbol
    cannot absorb the rounding deficit)."""
    size = 1 << table_log
    total = int(hist.sum())
    present = hist > 0
    if int(present.sum()) < 2 or total == 0:
        return None
    norm = (hist.astype(np.int64) * size) // total
    norm[present & (norm == 0)] = 1
    big = int(np.argmax(norm))
    norm[big] += size - int(norm.sum())
    if norm[big] < 1:
        return None
    return norm.astype(np.int32)


# dynamic accuracy logs (spec maxima: LL 9, OF 8, ML 9 — RFC 8878 3.1.1.3.2.1.1)
DYN_LL_LOG, DYN_OF_LOG, DYN_ML_LOG = 9, 8, 9


def _field_tables(codes: np.ndarray, nsym: int, dyn_log: int,
                  default: np.ndarray, def_log: int):
    """Pick the cheapest wire mode for one field: Predefined_Mode (0), RLE (1)
    when a single code is present, or FSE_Compressed (2) with a per-block
    normalized table. Returns (mode, desc bytes, enc table 5-tuple, log)."""
    hist = np.bincount(codes, minlength=nsym)
    present = np.flatnonzero(hist)
    if len(present) == 1:
        return 1, bytes([int(present[0])]), None, 0
    pre_tab = fse_encode_table(default, def_log)
    norm = fse_normalize(hist, dyn_log)
    if norm is None:
        return 0, b"", pre_tab, def_log
    desc = _ncount_write([int(v) for v in norm[: int(present[-1]) + 1]],
                         dyn_log)
    # estimated state bits: log - floor(log2(norm)) per occurrence
    eff_def = np.where(default[:nsym] != 0, np.abs(default[:nsym]), 1)
    est_pre = int(np.sum(hist * (def_log - np.floor(np.log2(eff_def)))))
    est_dyn = 8 * len(desc) + int(
        np.sum(hist[present] * (dyn_log - np.floor(np.log2(norm[present])))))
    if est_dyn >= est_pre:
        return 0, b"", pre_tab, def_log
    return 2, desc, fse_encode_table(norm, dyn_log), dyn_log


def encode_sequences_dynamic(seqs: Sequence[Tuple[int, int, int]]) -> bytes:
    """Sequences_Section with per-field mode selection (Predefined / RLE /
    per-block dynamic FSE_Compressed) — the wire oracle for the device
    kernel's dynamic sequence tier. Same input as ``encode_sequences``:
    (literals_length, match_length, offset) with offset >= 1."""
    n = len(seqs)
    if n == 0:
        return b"\x00"
    assert n <= 32511
    head = bytes([n]) if n < 128 else bytes([128 + (n >> 8), n & 0xFF])

    ll = np.array([s[0] for s in seqs], np.int64)
    mlv = np.array([s[1] for s in seqs], np.int64)
    ofv = np.array([s[2] for s in seqs], np.int64) + 3
    llc = ll_code(ll)
    mlc = ml_code(mlv)
    ofc = np.floor(np.log2(ofv)).astype(np.int32)
    ll_extra = (ll - LL_BASE[llc]).astype(np.int64)
    ml_extra = (mlv - ML_BASE[mlc]).astype(np.int64)
    of_extra = (ofv - (np.int64(1) << ofc.astype(np.int64))).astype(np.int64)
    llb = LL_BITS[llc]
    mlb = ML_BITS[mlc]

    m_ll, d_ll, t_ll, lg_ll = _field_tables(llc, 36, DYN_LL_LOG, LL_DEFAULT, LL_LOG)
    m_of, d_of, t_of, lg_of = _field_tables(ofc, 29, DYN_OF_LOG, OF_DEFAULT, OF_LOG)
    m_ml, d_ml, t_ml, lg_ml = _field_tables(mlc, 53, DYN_ML_LOG, ML_DEFAULT, ML_LOG)
    head += bytes([(m_ll << 6) | (m_of << 4) | (m_ml << 2)])
    head += d_ll + d_of + d_ml  # description order: LL, OF, ML

    def chain(tab):
        if tab is None:  # RLE: single state, 0 bits everywhere
            z = np.zeros(1, np.int32)
            return (np.zeros((64, 1), np.int32), None, z, z, z)
        enc, _, nb, base, first = tab
        return (enc, None, nb, base, first)

    enc_ll, _, nb_ll, base_ll, first_ll = chain(t_ll)
    enc_ml, _, nb_ml, base_ml, first_ml = chain(t_ml)
    enc_of, _, nb_of, base_of, first_of = chain(t_of)

    w = _BitWriter()
    p_ll = int(first_ll[llc[n - 1] if t_ll is not None else 0])
    p_ml = int(first_ml[mlc[n - 1] if t_ml is not None else 0])
    p_of = int(first_of[ofc[n - 1] if t_of is not None else 0])
    w.add(int(ll_extra[n - 1]), int(llb[n - 1]))
    w.add(int(ml_extra[n - 1]), int(mlb[n - 1]))
    w.add(int(of_extra[n - 1]), int(ofc[n - 1]))
    for i in range(n - 2, -1, -1):
        if t_of is not None:
            u = int(enc_of[ofc[i], p_of])
            w.add(p_of - int(base_of[u]), int(nb_of[u]))
            p_of = u
        if t_ml is not None:
            u = int(enc_ml[mlc[i], p_ml])
            w.add(p_ml - int(base_ml[u]), int(nb_ml[u]))
            p_ml = u
        if t_ll is not None:
            u = int(enc_ll[llc[i], p_ll])
            w.add(p_ll - int(base_ll[u]), int(nb_ll[u]))
            p_ll = u
        w.add(int(ll_extra[i]), int(llb[i]))
        w.add(int(ml_extra[i]), int(mlb[i]))
        w.add(int(of_extra[i]), int(ofc[i]))
    w.add(p_ml, lg_ml)
    w.add(p_of, lg_of)
    w.add(p_ll, lg_ll)
    return head + w.close()


# ---- block / frame assembly ------------------------------------------------


def _raw_literals_header(size: int) -> bytes:
    # Raw_Literals_Block, Size_Format 3 (3-byte header, 20-bit size)
    assert size < (1 << 20)
    b0 = 0 | (3 << 2) | ((size & 0xF) << 4)
    return bytes([b0, (size >> 4) & 0xFF, size >> 12])


def encode_block(data: bytes, seqs: Sequence[Tuple[int, int, int]],
                 last: bool) -> bytes:
    """One block: compressed (raw literals + FSE sequences) when that is
    smaller than the raw copy, else a Raw_Block."""
    n = len(data)
    lit_total = sum(s[0] for s in seqs) + (
        n - sum(s[0] + s[1] for s in seqs)
    )
    # literals = all bytes not covered by a match, in order
    lits = bytearray()
    pos = 0
    for (l, m, _o) in seqs:
        lits += data[pos: pos + l]
        pos += l + m
    lits += data[pos:]
    assert len(lits) == lit_total
    lit_section = _raw_literals_header(len(lits)) + bytes(lits)
    huf = encode_huffman_literals(bytes(lits))
    if huf is not None:
        lit_section = huf
    seq_sec = encode_sequences(seqs)
    dyn_sec = encode_sequences_dynamic(seqs)
    content = lit_section + (dyn_sec if len(dyn_sec) < len(seq_sec)
                             else seq_sec)
    if len(content) < n:
        hdr = (len(content) << 3) | (2 << 1) | int(last)
        return hdr.to_bytes(3, "little") + content
    hdr = (n << 3) | (0 << 1) | int(last)
    return hdr.to_bytes(3, "little") + data


def encode_frame(blocks: Sequence[Tuple[bytes, Sequence[Tuple[int, int, int]]]]) -> bytes:
    """[(block_data, sequences)] -> one ZSTD frame. The frame header pins a
    128 KiB window (>= BLOCK_CAP, so any in-block offset is legal)."""
    out = bytearray(MAGIC)
    out.append(0x00)  # FHD: no FCS, no checksum, no dict
    out.append((17 - 10) << 3)  # window descriptor: 2^17
    for i, (data, seqs) in enumerate(blocks):
        out += encode_block(data, seqs, last=(i == len(blocks) - 1))
    return bytes(out)


# ---- Huffman literals ------------------------------------------------------
# RFC 8878 3.1.1.1.1 (literals section) + 4.2 (Huffman) + 4.1.1 (FSE table
# description, used for the compressed weight stream). Max code length for
# literals is 11 bits; the last present symbol's weight is implicit (it
# completes the Kraft sum to a power of two).

HUF_MAX_BITS = 11


def huf_lengths(counts: np.ndarray, max_bits: int = HUF_MAX_BITS) -> np.ndarray:
    """Optimal length-limited prefix-code lengths (package-merge / coin
    collector), Kraft-exact: sum(2^-len) == 1 over present symbols. Needs at
    least two present symbols."""
    items = sorted((int(c), int(s)) for s, c in enumerate(counts) if c)
    n = len(items)
    assert n >= 2, "Huffman needs >= 2 symbols"
    assert n <= (1 << max_bits), "alphabet exceeds depth limit"
    level: List[Tuple[int, Tuple[int, ...]]] = [(c, (s,)) for c, s in items]
    for _ in range(max_bits - 1):
        packages = [
            (level[i][0] + level[i + 1][0], level[i][1] + level[i + 1][1])
            for i in range(0, len(level) - 1, 2)
        ]
        level = sorted([(c, (s,)) for c, s in items] + packages)
    lengths = np.zeros(len(counts), np.int32)
    for _c, syms in level[: 2 * n - 2]:
        for s in syms:
            lengths[s] += 1
    assert sum(1 << (max_bits - l) for l in lengths[lengths > 0]) == 1 << max_bits
    return lengths


def _weights_from_lengths(lengths: np.ndarray):
    """Per-symbol weights 0..max_bits for symbols 0..last_present (inclusive).
    Returns (weights list, max_bits)."""
    max_bits = int(lengths.max())
    last = int(np.nonzero(lengths)[0][-1])
    ws = [0 if lengths[s] == 0 else max_bits + 1 - int(lengths[s])
          for s in range(last + 1)]
    return ws, max_bits


def _fse_normalize(hist: np.ndarray, log: int,
                   cap_half: bool = False) -> np.ndarray:
    """Normalize a histogram to sum 2^log with every present symbol >= 1.
    ``cap_half`` additionally caps every count at 2^log / 2 (water-filling
    the excess over the other present symbols) so no state is 0-bit — the
    weight bitstream's implicit-length termination needs every transition
    to consume at least one bit. Feasible whenever >= 2 symbols are
    present."""
    size = 1 << log
    total = int(hist.sum())
    assert total > 0
    norm = (hist.astype(np.int64) * size) // total
    norm = np.where((hist > 0) & (norm == 0), 1, norm).astype(np.int32)
    # fix the sum by adjusting the most frequent symbol
    big = int(np.argmax(norm))
    norm[big] += size - int(norm.sum())
    if cap_half:
        half = size // 2
        norm = np.minimum(norm, half)
        delta = size - int(norm.sum())
        for s in np.argsort(-hist):
            if delta <= 0:
                break
            if hist[s] > 0:
                give = min(delta, half - int(norm[s]))
                norm[s] += give
                delta -= give
        assert delta <= 0, "cap_half water-fill needs >= 2 present symbols"
    assert norm[big] >= 1, "normalization collapsed the dominant symbol"
    return norm


def _huf_weights_fse_encode(ws: Sequence[int]):
    """Explicit weights -> FSE-compressed weight stream (table description +
    backward bitstream with two interleaved states), or None when the stream
    would not terminate correctly (0-bit transitions). Self-checked by
    decoding with _huf_weights_fse_decode."""
    m = len(ws)
    if m < 2:
        return None
    hist = np.bincount(np.asarray(ws, np.int64), minlength=max(ws) + 1)
    n_present = int((hist > 0).sum())
    if n_present < 2:
        return None  # FSE needs a real distribution
    # weight-table accuracy log: wire field encodes log-5; spec max is 6
    log = 5 if m < 32 else 6
    norm = _fse_normalize(hist, log, cap_half=True)
    enc, spread, nb, base, first = fse_encode_table(norm, log)
    evens, odds = list(ws[0::2]), list(ws[1::2])

    def chain(xs):
        sigma = int(first[xs[-1]])
        ups = []
        for x in xs[-2::-1]:
            u = int(enc[x, sigma])
            ups.append((sigma - int(base[u]), int(nb[u])))
            sigma = u
        ups.reverse()  # decode order
        return sigma, ups

    s1_init, u1 = chain(evens)
    s2_init, u2 = chain(odds)
    # interleave updates in decode order: u1_0, u2_0, u1_1, ...
    inter = []
    for i in range(max(len(u1), len(u2))):
        if i < len(u1):
            inter.append(u1[i])
        if i < len(u2):
            inter.append(u2[i])
    w = _BitWriter()
    for val, nbits in reversed(inter):
        w.add(val, nbits)
    w.add(s2_init, log)
    w.add(s1_init, log)
    payload = _ncount_write(norm, log) + w.close()
    if len(payload) >= 128:
        return None  # headerByte must stay < 128
    try:
        got = _huf_weights_fse_decode(payload)
    except (AssertionError, IndexError):
        return None
    if got != list(ws):
        return None  # implicit-length termination failed for this table
    return bytes([len(payload)]) + payload


def _huf_weights_direct(ws: Sequence[int]):
    """Direct 4-bit weight representation (headerByte >= 128), or None when
    there are more than 128 explicit weights."""
    m = len(ws)
    if not 1 <= m <= 128:
        return None
    out = bytearray([127 + m])
    for i in range(0, m - 1, 2):
        out.append((ws[i] << 4) | ws[i + 1])
    if m & 1:
        out.append(ws[m - 1] << 4)
    return bytes(out)


def _huf_tree_description(ws: Sequence[int]):
    """Smaller of the two weight representations, or None when neither fits
    (e.g. >128 equal weights: single-symbol FSE is unrepresentable — such
    near-uniform literals would not compress anyway)."""
    fse = _huf_weights_fse_encode(ws)
    direct = _huf_weights_direct(ws)
    cands = [c for c in (fse, direct) if c is not None]
    return min(cands, key=len) if cands else None


def _huf_decode_table(ws: Sequence[int], max_bits: int):
    """Full weights (incl. the implicit last) -> (symbol, length) arrays of
    size 2^max_bits for the peek decoder."""
    size = 1 << max_bits
    sym = np.zeros(size, np.int32)
    ln = np.zeros(size, np.int32)
    start = 0
    for wgt in range(1, max_bits + 1):
        for s, sw in enumerate(ws):
            if sw == wgt:
                span = 1 << (wgt - 1)
                sym[start: start + span] = s
                ln[start: start + span] = max_bits + 1 - wgt
                start += span
    assert start == size, "weights do not complete the table"
    return sym, ln


def _huf_encode_stream(chunk: bytes, codes) -> bytes:
    """One backward Huffman stream: first literal decoded = last bits
    written."""
    w = _BitWriter()
    for b in reversed(chunk):
        c, ln = codes[b]
        w.add(c, ln)
    return w.close()


def encode_huffman_literals(lits: bytes):
    """Literals -> a Compressed_Literals_Block section (4 Huffman streams),
    or None when Huffman is impossible (degenerate alphabet) or larger than
    the raw form."""
    n = len(lits)
    if n < 16:
        return None
    counts = np.bincount(np.frombuffer(lits, np.uint8), minlength=256)
    if int((counts > 0).sum()) < 2:
        return None
    lengths = huf_lengths(counts)
    ws, max_bits = _weights_from_lengths(lengths)
    tree = _huf_tree_description(ws[:-1])
    if tree is None:
        return None
    codes = _huf_codes(ws, max_bits)
    s13 = (n + 3) // 4
    chunks = [lits[0:s13], lits[s13: 2 * s13], lits[2 * s13: 3 * s13],
              lits[3 * s13:]]
    assert all(chunks), "stream split produced an empty stream"
    streams = [_huf_encode_stream(c, codes) for c in chunks]
    jump = b"".join(len(s).to_bytes(2, "little") for s in streams[:3])
    comp = len(tree) + len(jump) + sum(len(s) for s in streams)
    # pick the smallest 4-stream size format that fits
    if n < (1 << 10) and comp < (1 << 10):
        fmt, hbits = 1, 10
    elif n < (1 << 14) and comp < (1 << 14):
        fmt, hbits = 2, 14
    else:
        assert n < (1 << 18) and comp < (1 << 18)
        fmt, hbits = 3, 18
    hdr_val = 2 | (fmt << 2) | (n << 4) | (comp << (4 + hbits))
    hdr = hdr_val.to_bytes((4 + 2 * hbits) // 8, "little")
    section = hdr + tree + jump + b"".join(streams)
    if len(section) >= 3 + n:  # not smaller than the raw-literals form
        return None
    return section


def _ncount_read(data: bytes):
    """FSE table description decoder (RFC 8878 4.1.1). Returns
    (norm list with -1 entries, accuracy_log, bytes consumed)."""
    bits = int.from_bytes(data, "little")
    pos = 0
    total_bits = 8 * len(data)

    def take(n):
        nonlocal pos
        assert pos + n <= total_bits
        v = (bits >> pos) & ((1 << n) - 1)
        pos += n
        return v

    log = take(4) + 5
    size = 1 << log
    remaining = size + 1
    threshold = size
    nb = log + 1
    norm = []
    while remaining > 1:
        mx = (2 * threshold - 1) - remaining
        low = (bits >> pos) & ((1 << (nb - 1)) - 1)  # peek nb-1
        if low < mx:  # phase-in: the mx smallest low-fields are short
            value = low
            pos += nb - 1
        else:
            value = take(nb)
            if value >= threshold:
                value -= mx
        count = value - 1  # -1 encodes "less than 1"
        norm.append(count)
        remaining -= -count if count < 0 else count
        if count == 0:
            while True:
                rep = take(2)
                norm += [0] * rep
                if rep != 3:
                    break
        while remaining > 1 and remaining < threshold:
            threshold >>= 1
            nb -= 1
    return norm, log, (pos + 7) // 8


def _ncount_write(norm, log: int) -> bytes:
    """Inverse of _ncount_read (forward bitstream)."""
    size = 1 << log
    acc = 0
    pos = 0

    def put(v, n):
        nonlocal acc, pos
        assert 0 <= v < (1 << n)
        acc |= v << pos
        pos += n

    put(log - 5, 4)
    remaining = size + 1
    threshold = size
    nb = log + 1
    i = 0
    while remaining > 1:
        assert i < len(norm), "normalized counts do not fill the table"
        count = int(norm[i])
        i += 1
        mx = (2 * threshold - 1) - remaining
        value = count + 1
        if value < mx:  # phase-in: the mx smallest values are short
            put(value, nb - 1)
        else:
            put(value if value < threshold else value + mx, nb)
        remaining -= -count if count < 0 else count
        if count == 0:
            # zero-repeat flags cover the following zeros
            j = 0
            while i + j < len(norm) and norm[i + j] == 0:
                j += 1
            while True:
                rep = min(j, 3)
                put(rep, 2)
                i += rep
                j -= rep
                if rep != 3:
                    break
        while remaining > 1 and remaining < threshold:
            threshold >>= 1
            nb -= 1
    return acc.to_bytes((pos + 7) // 8, "little")


def _huf_table_from_weights(weights):
    """Explicit weights (last symbol implicit) -> (lengths per symbol 0..N-1,
    max_bits). Weight w>0 -> code length max_bits+1-w."""
    total = sum((1 << (w - 1)) for w in weights if w > 0)
    # implicit last weight completes to the next power of two
    nxt = 1 << (total - 1).bit_length() if total else 1
    if nxt < total + 1:
        nxt <<= 1
    rest = nxt - total
    assert rest & (rest - 1) == 0 and rest > 0, "corrupt weights"
    w_last = rest.bit_length()
    max_bits = (nxt).bit_length() - 1
    ws = list(weights) + [w_last]
    lengths = [0 if w == 0 else max_bits + 1 - w for w in ws]
    return ws, lengths, max_bits


def _huf_codes(ws, max_bits):
    """Canonical code per symbol: the decode table is filled in (weight asc,
    symbol asc) order, each weight-w symbol occupying 2^(w-1) slots; a
    symbol's code is its slot start >> (w-1), length max_bits+1-w."""
    start = 0
    codes = {}
    for w in range(1, max_bits + 1):
        for s, sw in enumerate(ws):
            if sw == w:
                codes[s] = (start >> (w - 1), max_bits + 1 - w)
                start += 1 << (w - 1)
    assert start == 1 << max_bits
    return codes


def _huf_decode_stream(data: bytes, table, max_bits: int, n_out: int) -> bytes:
    """One backward Huffman stream -> exactly n_out symbols."""
    r = _BitReader(data)
    out = bytearray()
    sym, ln = table
    for _ in range(n_out):
        # peek max_bits (pad with zeros when near the end, per spec)
        avail = min(r.n, max_bits)
        v = (r.val >> (r.n - avail)) & ((1 << avail) - 1)
        v <<= max_bits - avail
        s = int(sym[v])
        used = int(ln[v])
        assert used <= r.n + (max_bits - avail), "stream exhausted"
        r.n -= min(used, r.n)
        out.append(s)
    assert r.n == 0, f"{r.n} unconsumed literal-stream bits"
    return bytes(out)


def _huf_weights_fse_decode(data: bytes):
    """FSE-compressed Huffman weights: table description + backward bitstream
    with two interleaved states; symbol count implicit (read to exhaustion)."""
    norm, log, used = _ncount_read(data)
    norm = norm + [0] * (256 - len(norm))
    spread, nb_bits, base = fse_decode_table(np.asarray(norm[:64], np.int32), log)
    r = _BitReader(data[used:])
    s1 = r.read(log)
    s2 = r.read(log)
    weights = []
    while True:
        weights.append(int(spread[s1]))
        if r.n < int(nb_bits[s1]):
            # final symbols come from the states without updates
            weights.append(int(spread[s2]))
            break
        s1 = int(base[s1]) + r.read(int(nb_bits[s1]))
        weights.append(int(spread[s2]))
        if r.n < int(nb_bits[s2]):
            weights.append(int(spread[s1]))
            break
        s2 = int(base[s2]) + r.read(int(nb_bits[s2]))
    return weights


# ---- mini-decoder (predefined mode only) -----------------------------------
# Parses frames whose compressed blocks use raw/RLE literals and
# Predefined_Mode sequences — enough to decode libzstd level-1 output on
# small inputs, which is how these tables are conformance-locked in
# tests/test_zstd_frame.py (decode real libzstd frames, compare content).


class _BitReader:
    """Backward bitstream reader (RFC 8878 3.1.1.3.2.1.x)."""

    def __init__(self, data: bytes):
        self.val = int.from_bytes(data, "little")
        top = self.val.bit_length()
        assert top and (self.val >> (top - 1)) == 1, "missing marker bit"
        self.n = top - 1  # bits available below the marker

    def read(self, nbits: int) -> int:
        assert self.n >= nbits, "bitstream exhausted"
        self.n -= nbits
        return (self.val >> self.n) & ((1 << nbits) - 1)


def _decode_compressed_literals(blk: bytes):
    """Compressed_Literals_Block -> (literal bytes, offset of the sequences
    section within blk). RFC 8878 3.1.1.1.1 + 4.2."""
    lb = blk[0]
    size_fmt = (lb >> 2) & 3
    if size_fmt in (0, 1):
        v = int.from_bytes(blk[:3], "little") >> 4
        regen, comp = v & 0x3FF, v >> 10
        hlen = 3
    elif size_fmt == 2:
        v = int.from_bytes(blk[:4], "little") >> 4
        regen, comp = v & 0x3FFF, v >> 14
        hlen = 4
    else:
        v = int.from_bytes(blk[:5], "little") >> 4
        regen, comp = v & 0x3FFFF, v >> 18
        hlen = 5
    body = blk[hlen: hlen + comp]
    hb = body[0]
    if hb < 128:
        ws = _huf_weights_fse_decode(body[1: 1 + hb])
        tlen = 1 + hb
    else:
        m = hb - 127
        ws = []
        for i in range(m):
            nib = body[1 + i // 2]
            ws.append((nib >> 4) if i % 2 == 0 else (nib & 0xF))
        tlen = 1 + (m + 1) // 2
    ws_full, _lengths, max_bits = _huf_table_from_weights(ws)
    table = _huf_decode_table(ws_full, max_bits)
    sdata = body[tlen:]
    if size_fmt == 0:  # single stream
        return _huf_decode_stream(sdata, table, max_bits, regen), hlen + comp
    sz = [int.from_bytes(sdata[2 * i: 2 * i + 2], "little") for i in range(3)]
    starts = [6, 6 + sz[0], 6 + sz[0] + sz[1], 6 + sz[0] + sz[1] + sz[2]]
    ends = starts[1:] + [len(sdata)]
    s13 = (regen + 3) // 4
    outs = []
    for i in range(4):
        n_i = s13 if i < 3 else regen - 3 * s13
        outs.append(_huf_decode_stream(sdata[starts[i]: ends[i]], table,
                                       max_bits, n_i))
    return b"".join(outs), hlen + comp


def decode_sequences_section(raw: bytes):
    """Sequences_Section bytes -> list of (ll, ml, offset_value).
    Predefined_Mode, RLE_Mode, and FSE_Compressed_Mode are supported
    (Repeat_Mode is not — it needs cross-block table state)."""
    b0 = raw[0]
    if b0 == 0:
        return []
    if b0 < 128:
        n, pos = b0, 1
    elif b0 < 255:
        n, pos = ((b0 - 128) << 8) + raw[1], 2
    else:
        n, pos = raw[1] + (raw[2] << 8) + 0x7F00, 3
    modes = raw[pos]
    pos += 1

    def field(shift, table, def_log, nsym):
        nonlocal pos
        mode = (modes >> shift) & 3
        if mode == 0:
            _, sym, nb, base, _ = table
            return sym, nb, base, def_log
        if mode == 1:  # RLE: one symbol byte, accuracy log 0
            s = raw[pos]
            pos += 1
            z = np.zeros(1, np.int32)
            return np.array([s], np.int32), z, z, 0
        assert mode == 2, "Repeat_Mode unsupported"
        norm, log, used = _ncount_read(raw[pos:])
        pos += used
        norm = np.asarray(norm + [0] * (nsym - len(norm)), np.int32)
        sym, nb, base = fse_decode_table(norm, log)
        return sym, nb, base, log

    # description order on the wire: LL, OF, ML
    sym_ll, nb_ll, base_ll, log_ll = field(6, LL_TABLE, LL_LOG, 36)
    sym_of, nb_of, base_of, log_of = field(4, OF_TABLE, OF_LOG, 29)
    sym_ml, nb_ml, base_ml, log_ml = field(2, ML_TABLE, ML_LOG, 53)
    r = _BitReader(raw[pos:])
    p_ll = r.read(log_ll)
    p_of = r.read(log_of)
    p_ml = r.read(log_ml)
    out = []
    for i in range(n):
        ofc = int(sym_of[p_of])
        ofv = (1 << ofc) + (r.read(ofc) if ofc else 0)
        mlc = int(sym_ml[p_ml])
        ml = int(ML_BASE[mlc]) + (r.read(int(ML_BITS[mlc])) if ML_BITS[mlc] else 0)
        llc = int(sym_ll[p_ll])
        ll = int(LL_BASE[llc]) + (r.read(int(LL_BITS[llc])) if LL_BITS[llc] else 0)
        out.append((ll, ml, ofv))
        if i + 1 < n:
            p_ll = int(base_ll[p_ll]) + r.read(int(nb_ll[p_ll]))
            p_ml = int(base_ml[p_ml]) + r.read(int(nb_ml[p_ml]))
            p_of = int(base_of[p_of]) + r.read(int(nb_of[p_of]))
    assert r.n == 0, f"{r.n} unconsumed bits"
    return out


def decode_frame(frame: bytes) -> bytes:
    """Predefined-mode frame parser (raw/RLE literals). Repeat-offset codes
    (Offset_Value 1-3) are resolved with the standard 3-slot history."""
    assert frame[:4] == MAGIC
    fhd = frame[4]
    pos = 5
    single_seg = (fhd >> 5) & 1
    if not single_seg:
        pos += 1  # window descriptor
    pos += [0, 1, 2, 4][fhd & 3]
    fcs_flag = fhd >> 6
    pos += [1 if single_seg else 0, 2, 4, 8][fcs_flag]
    out = bytearray()
    rep = [1, 4, 8]  # repeat-offset history (spec initial values)
    while True:
        bh = int.from_bytes(frame[pos: pos + 3], "little")
        pos += 3
        last, btype, bsize = bh & 1, (bh >> 1) & 3, bh >> 3
        if btype == 0:
            out += frame[pos: pos + bsize]
            pos += bsize
        elif btype == 1:
            out += frame[pos: pos + 1] * bsize
            pos += 1
        else:
            assert btype == 2
            blk = frame[pos: pos + bsize]
            pos += bsize
            lb = blk[0]
            lit_type = lb & 3
            size_fmt = (lb >> 2) & 3
            assert lit_type != 3, "treeless literals unsupported"
            if lit_type in (0, 1):
                if size_fmt in (0, 2):
                    lit_size, lpos = lb >> 3, 1
                elif size_fmt == 1:
                    lit_size, lpos = (lb >> 4) | (blk[1] << 4), 2
                else:
                    lit_size, lpos = (lb >> 4) | (blk[1] << 4) | (blk[2] << 12), 3
                if lit_type == 0:
                    lits = blk[lpos: lpos + lit_size]
                    spos = lpos + lit_size
                else:
                    lits = blk[lpos: lpos + 1] * lit_size
                    spos = lpos + 1
            else:
                lits, spos = _decode_compressed_literals(blk)
            seqs = decode_sequences_section(blk[spos:])
            lpos2 = 0
            for (ll, ml, ofv) in seqs:
                out += lits[lpos2: lpos2 + ll]
                lpos2 += ll
                if ofv > 3:
                    off = ofv - 3
                    rep = [off, rep[0], rep[1]]
                else:
                    idx = ofv - 1
                    if ll == 0:
                        if idx == 2:
                            off = rep[0] - 1
                        else:
                            off = rep[idx + 1]
                        # promote
                        if idx == 0:
                            rep = [rep[1], rep[0], rep[2]]
                        else:
                            rep = [off, rep[0], rep[1]]
                    else:
                        off = rep[idx]
                        if idx:
                            rep = [off, rep[0], rep[2] if idx == 1 else rep[1]]
                for _ in range(ml):
                    out.append(out[-off])
            out += lits[lpos2:]
        if last:
            break
    return bytes(out)


# ---- simple host matcher (tests / ratio probes) ----------------------------


def greedy_matches(data: bytes, min_match: int = 4) -> List[Tuple[int, int, int]]:
    """Greedy hash-4 nearest-previous-occurrence matcher, numpy-assisted.
    Produces (ll, ml, offset) triples valid within one block.

    A match is only accepted when it beats entropy-coded literals: with
    literal entropy H bits/byte, replacing ml literals saves ml*H bits and
    spends ~10 bits of FSE state/code plus the offset's extra bits — on
    low-entropy data short spurious matches otherwise INFLATE the frame
    (the same economics that makes libzstd level 1 hash 6-grams)."""
    n = len(data)
    if n < min_match + 1:
        return []
    a = np.frombuffer(data, np.uint8)
    counts = np.bincount(a, minlength=256)
    p = counts[counts > 0] / n
    # Huffman spends >= 1 bit per literal, so 1.0 is the true cost floor
    # (and keeps degenerate single-symbol blocks on the match path)
    ent = max(float(-(p * np.log2(p)).sum()), 1.0)
    h = (a[:-3].astype(np.uint32)
         | (a[1:-2].astype(np.uint32) << 8)
         | (a[2:-1].astype(np.uint32) << 16)
         | (a[3:].astype(np.uint32) << 24))
    h = (h * np.uint32(2654435761)) >> np.uint32(16)
    table = {}
    seqs = []
    anchor = 0
    i = 0
    limit = n - min_match
    while i <= limit:
        key = int(h[i])
        cand = table.get(key, -1)
        table[key] = i
        if cand >= 0 and a[cand] == a[i]:
            # verify + extend (elementwise compare is correct for
            # overlapping matches: LZ copies resolve byte-by-byte)
            span = n - i
            neq = a[cand: cand + span] != a[i: i + span]
            first = int(np.argmax(neq))
            ml = first if neq[first] else span
            off = i - cand
            if ml >= min_match and ml * ent >= 10.0 + off.bit_length():
                seqs.append((i - anchor, ml, off))
                i += ml
                anchor = i
                continue
        i += 1
    return seqs


def compress(data: bytes) -> bytes:
    """data -> a multi-block ZSTD frame (greedy matcher, raw literals)."""
    blocks = []
    for s in range(0, max(len(data), 1), BLOCK_CAP):
        blk = data[s: s + BLOCK_CAP]
        blocks.append((blk, greedy_matches(blk)))
    return encode_frame(blocks)
