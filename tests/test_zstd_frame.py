"""Conformance tests for the ZSTD frame writer (ref/zstd_frame.py).

Two directions, both against the real libzstd (the ``zstandard`` wheel):
  * every frame we emit must decompress to the original bytes;
  * real libzstd level-1 frames (predefined sequence mode, raw literals)
    must parse with our mini-decoder — this locks the predefined FSE tables
    (RFC 8878 3.1.1.3.2.2) empirically, the same differential-oracle pattern
    as tests/test_varint.py.
"""

import numpy as np
import pytest
import zstandard

from cloudini_tpu.ref import zstd_frame as Z

dctx = zstandard.ZstdDecompressor()


def _rt(data: bytes):
    frame = Z.compress(data)
    got = dctx.decompress(frame, max_output_size=max(len(data), 1) + 16)
    assert got == data
    return len(frame)


@pytest.mark.parametrize(
    "data",
    [
        b"",
        b"a",
        b"ab",
        b"abcabcabcabcabcabcabcabcabc",
        bytes(range(256)) * 10,
        b"\x00" * 200000,
    ],
    ids=["empty", "one", "two", "tiny-repeat", "cycle", "zeros-200k"],
)
def test_roundtrip_basic(data):
    _rt(data)


def test_roundtrip_random_and_low_entropy():
    rng = np.random.default_rng(0)
    _rt(rng.integers(0, 256, 5000, dtype=np.uint8).tobytes())
    # multi-block (>126 KiB)
    n = _rt(rng.integers(0, 4, 300000, dtype=np.uint8).tobytes())
    assert n < 300000  # actually compresses


@pytest.mark.parametrize("stride", [26, 113, 1021, 16384])
def test_roundtrip_periodic_offsets(stride):
    rng = np.random.default_rng(stride)
    base = rng.integers(0, 256, stride, dtype=np.uint8).tobytes()
    data = base * 9 + base[: stride // 2]
    n = _rt(data)
    assert n < len(data) // 2


def test_fse_tables_normalized():
    for norm, log in ((Z.LL_DEFAULT, Z.LL_LOG), (Z.ML_DEFAULT, Z.ML_LOG),
                      (Z.OF_DEFAULT, Z.OF_LOG)):
        assert int(np.where(norm == -1, 1, norm).sum()) == 1 << log


def test_decode_real_libzstd_frames():
    """Our mini-decoder must decode real libzstd level-1 output bit-exactly
    (predefined mode): locks the FSE spread + state tables to libzstd's."""
    cctx = zstandard.ZstdCompressor(level=1, write_content_size=False,
                                    write_checksum=False)
    rng = np.random.default_rng(7)
    cases = [
        (b"hello world, " * 40) + rng.integers(0, 256, 100, dtype=np.uint8).tobytes(),
        b"abcabcabcabcabcabcabcabcabc" + b"XYZ",
        b"the quick brown fox jumps over the lazy dog. " * 30,
    ]
    # varied match lengths / literal runs exercise many FSE states
    for k in (5, 9, 17, 33, 65, 129):
        lead = bytes(rng.integers(1, 255, k, dtype=np.uint8))
        cases.append(lead + b"A" * (k + 4) + lead)
    checked = 0
    for data in cases:
        frame = cctx.compress(data)
        try:
            got = Z.decode_frame(frame)
        except AssertionError as exc:
            if "unsupported" in str(exc):
                continue  # libzstd chose entropy literals / custom tables
            raise
        assert got == data
        checked += 1
    assert checked >= 5  # the corpus must actually exercise the decoder


def test_sequences_section_forms():
    """0, <128, and >=128 sequence-count headers all round-trip."""
    rng = np.random.default_rng(3)
    # ~n sequences: n short records with a repeating 8-byte token each
    def mk(n):
        tok = bytes(range(8))
        out = bytearray()
        for i in range(n):
            out += bytes(rng.integers(1, 255, 3, dtype=np.uint8)) + tok
        return bytes(out)

    _rt(mk(0) if False else b"nosequencehere")  # no matches -> 0 sequences
    _rt(mk(50))
    _rt(mk(400))  # > 128 sequences


def test_huffman_literals_roundtrip():
    """Huffman-literal blocks (direct and FSE weight headers) round-trip
    through libzstd AND the mini-decoder."""
    rng = np.random.default_rng(0)
    skew = rng.choice(
        256, 80000,
        p=(lambda w: w / w.sum())(np.exp(-np.arange(256) / 20.0)),
    ).astype(np.uint8).tobytes()  # 240-symbol alphabet -> FSE weights
    low = rng.integers(0, 8, 100000, dtype=np.uint8).tobytes()  # direct
    for data in (skew, low, b"aabbbbccdddddd" * 40):
        frame = Z.compress(data)
        assert dctx.decompress(frame, max_output_size=len(data) + 16) == data
        assert Z.decode_frame(frame) == data
    # entropy-gated matcher: low-entropy random must compress near H=3 bits
    assert len(Z.compress(low)) < 0.40 * len(low)


def test_decode_real_libzstd_huffman_frames():
    """Real libzstd frames with Huffman literals + FSE-compressed weights
    must decode bit-exactly: conformance-locks _ncount_read, the weight
    FSE stream, and the 4-stream Huffman decoder."""
    cctx = zstandard.ZstdCompressor(level=1, write_content_size=False,
                                    write_checksum=False)
    rng = np.random.default_rng(42)
    w = np.exp(-np.arange(256) / 25.0)
    w /= w.sum()
    for trial in range(6):
        data = rng.choice(256, 30000 + 1000 * trial, p=w).astype(np.uint8).tobytes()
        assert Z.decode_frame(cctx.compress(data)) == data


def test_ncount_fuzz_roundtrip():
    """FSE table-description writer/reader are exact inverses over random
    normalized distributions."""
    rng = np.random.default_rng(1)
    done = 0
    for _ in range(200):
        log = int(rng.integers(5, 7))
        size = 1 << log
        n_sym = int(rng.integers(2, 13))
        cuts = np.sort(rng.integers(0, size + 1, n_sym - 1))
        parts = np.diff(np.concatenate([[0], cuts, [size]])).astype(np.int64)
        norm = parts.copy()
        ones = np.where(norm == 1)[0]
        for i in ones[: int(rng.integers(0, len(ones) + 1))]:
            norm[i] = -1
        if (norm != 0).sum() < 2:
            continue
        b = Z._ncount_write(norm.astype(np.int32), log)
        got, glog, used = Z._ncount_read(b)
        got = got + [0] * (len(norm) - len(got))
        assert glog == log and used == len(b)
        assert got[: len(norm)] == list(norm)
        done += 1
    assert done > 150


def test_fixture_ratio_beats_lz4_on_mixed():
    """On the dds mixed stage-1 stream the sequences-only frame must beat
    liblz4 (measured r2: 0.445 vs 0.479)."""
    import pathlib

    import jax

    from cloudini_tpu import native
    from cloudini_tpu.codec import stage2
    from cloudini_tpu.core.plan import build_plan
    from cloudini_tpu.core.types import (
        CompressionOption,
        EncodingInfo,
        EncodingOptions,
    )
    from cloudini_tpu.io.ros_msgs import (
        apply_resolution_profile,
        get_deserialized_point_cloud_message,
    )

    dds = pathlib.Path("/root/reference/cloudini_lib/samples/dds_message.bin")
    if not dds.exists() or not native.available():
        pytest.skip("fixture or native runtime unavailable")
    pc = get_deserialized_point_cloud_message(dds.read_bytes())
    pc.fields = apply_resolution_profile({}, pc.fields, 0.001)
    rows = np.frombuffer(pc.data, np.uint8).reshape(-1, pc.point_step)
    info = EncodingInfo(fields=tuple(pc.fields), width=rows.shape[0], height=1,
                        point_step=pc.point_step,
                        encoding_opt=EncodingOptions.LOSSY,
                        compression_opt=CompressionOption.NONE)
    plan = build_plan(info)
    blob = np.asarray(
        native.encode_chunk(plan, rows[:32768], plan.max_encoded_point_bytes)
    ).tobytes()
    mine = Z.compress(blob)
    assert dctx.decompress(mine, max_output_size=len(blob) + 16) == blob
    lz4 = stage2.compress_chunk(CompressionOption.LZ4, blob)
    assert len(mine) < len(lz4)
    # with Huffman literals the writer sits within 5% of real zstd level 1
    z1 = zstandard.ZstdCompressor(level=1, write_content_size=False,
                                  write_checksum=False).compress(blob)
    assert len(mine) < 1.05 * len(z1)


# ---- dynamic (per-block) FSE sequence tables --------------------------------


def test_dynamic_sequences_section_roundtrip():
    """Per-field mode selection: all-RLE, mixed FSE, and tiny-n fallback all
    decode through the extended mini-decoder parser."""
    rle = [(5, 10, 26)] * 200
    sec = Z.encode_sequences_dynamic(rle)
    assert Z.decode_sequences_section(sec) == [(5, 10, 29)] * 200
    assert len(sec) < len(Z.encode_sequences(rle)) // 3

    rng = np.random.default_rng(7)
    seqs = [(int(rng.integers(0, 300)), int(rng.integers(3, 80)),
             int(rng.integers(1, 5000))) for _ in range(3000)]
    sec = Z.encode_sequences_dynamic(seqs)
    assert Z.decode_sequences_section(sec) == [(l, m, o + 3)
                                               for (l, m, o) in seqs]
    assert len(sec) < len(Z.encode_sequences(seqs))

    tiny = [(3, 4, 9), (0, 5, 2)]
    sec = Z.encode_sequences_dynamic(tiny)
    assert Z.decode_sequences_section(sec) == [(3, 4, 12), (0, 5, 5)]


def test_dynamic_sequences_libzstd_conformance():
    """Frames whose blocks carry dynamic/RLE sequence tables must decode
    bit-exactly through the real libzstd."""
    rng = np.random.default_rng(11)
    for trial in range(20):
        n = int(rng.integers(500, 70000))
        period = int(rng.integers(4, 48))
        base = rng.integers(0, 256, period, dtype=np.uint8)
        data = np.tile(base, n // period + 1)[:n].copy()
        noise = rng.random(n) < rng.random() * 0.3
        data[noise] = rng.integers(0, 256, int(noise.sum()), dtype=np.uint8)
        blob = data.tobytes()
        frame = Z.encode_frame([(blob, Z.greedy_matches(blob))])
        assert dctx.decompress(frame, max_output_size=n + 64) == blob
        assert Z.decode_frame(frame) == blob


def test_fse_normalize_properties():
    rng = np.random.default_rng(3)
    for _ in range(200):
        nsym = int(rng.integers(2, 53))
        hist = rng.integers(0, 1000, nsym)
        hist[rng.integers(0, nsym)] += int(rng.integers(0, 100000))
        log = int(rng.integers(5, 10))
        norm = Z.fse_normalize(hist, log)
        if (hist > 0).sum() < 2:
            assert norm is None
            continue
        if norm is None:
            continue  # dominant symbol could not absorb the deficit
        assert int(norm.sum()) == 1 << log
        assert np.all(norm[hist > 0] >= 1)
        assert np.all(norm[hist == 0] == 0)
        # the normalized table must build a valid FSE pair
        enc, spread, nb, base, first = Z.fse_encode_table(norm, log)


def test_decode_real_libzstd_dynamic_table_frames():
    """Inverse-direction conformance: real libzstd level-1 frames at sizes
    that force dynamic FSE sequence tables and Huffman literals must decode
    through the mini-decoder (locks the NCount reader + table build against
    libzstd's writer, not just our own)."""
    rng = np.random.default_rng(0)
    zc = zstandard.ZstdCompressor(level=1, write_content_size=False,
                                  write_checksum=False)
    for trial in range(8):
        n = int(rng.integers(20000, 120000))
        period = int(rng.integers(4, 60))
        base = rng.integers(0, 256, period, dtype=np.uint8)
        d = np.tile(base, n // period + 1)[:n].copy()
        noise = rng.random(n) < rng.random() * 0.3
        d[noise] = rng.integers(0, 256, int(noise.sum()), dtype=np.uint8)
        frame = zc.compress(d.tobytes())
        assert Z.decode_frame(frame) == d.tobytes(), trial
