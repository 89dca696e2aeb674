"""ops/compact_kernel.py — the Pallas stream-compaction primitive.

The TPU Mosaic path is exercised in interpret mode here (tests run on
CPU); the XLA sort fallback (what non-TPU backends use in production
paths) is checked against the same reference. Chip-side correctness is
additionally gated by scripts/compact_kernel_probe.py and bench.py's
fingerprint gate (the decode path routes through this kernel on TPU).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from cloudini_tpu.ops.compact_kernel import _xla_fallback, masked_compact


def _ref(mask, val, K):
    out = np.zeros(K, np.uint32)
    kept = val[mask != 0][:K]
    out[: len(kept)] = kept
    return kept


@pytest.mark.parametrize(
    "C,B,dens,tile",
    [
        (2, 1024, 0.5, 4),
        (3, 2048, 0.93, 8),
        (2, 4096, 0.07, 16),
        (1, 1024, 0.0, 8),
        (2, 1024, 1.0, 2),
        (2, 1664, 0.5, 4),   # B/128=13 rows: forces the tile pad path
    ],
)
def test_kernel_interpret_matches_reference(C, B, dens, tile):
    rng = np.random.default_rng(C * B)
    mask = (rng.random((C, B)) < dens).astype(np.int32)
    val = rng.integers(0, 2**31, (C, B), dtype=np.int64).astype(np.uint32)
    val2 = rng.integers(0, 2**31, (C, B), dtype=np.int64).astype(np.uint32)
    K = ((B // 2) // 128 + 2) * 128

    out = np.asarray(masked_compact(mask, val, K, tile_rows=tile,
                                    interpret=True))
    o1, o2 = masked_compact(mask, (val, val2), K, tile_rows=tile,
                            interpret=True)
    o1, o2 = np.asarray(o1), np.asarray(o2)
    for c in range(C):
        ref1 = _ref(mask[c], val[c], K)
        ref2 = _ref(mask[c], val2[c], K)
        np.testing.assert_array_equal(out[c][: len(ref1)], ref1)
        np.testing.assert_array_equal(o1[c][: len(ref1)], ref1)
        np.testing.assert_array_equal(o2[c][: len(ref2)], ref2)


def test_fallback_matches_reference_and_pads():
    rng = np.random.default_rng(7)
    C, B, K = 3, 1024, 2048  # K > B exercises the zero pad
    mask = (rng.random((C, B)) < 0.4).astype(np.int32)
    val = rng.integers(0, 2**31, (C, B), dtype=np.int64).astype(np.uint32)
    (out,) = _xla_fallback(jnp.asarray(mask), (jnp.asarray(val),), K)
    out = np.asarray(out)
    assert out.shape == (C, K)
    for c in range(C):
        ref = _ref(mask[c], val[c], K)
        np.testing.assert_array_equal(out[c][: len(ref)], ref)
        np.testing.assert_array_equal(out[c][B:], 0)


def test_auto_backend_selection_is_fallback_on_cpu():
    # tests force the CPU backend -> interpret=None must route to the
    # sort fallback (bit-identical result, no Pallas involved)
    rng = np.random.default_rng(11)
    C, B, K = 2, 512, 512
    mask = (rng.random((C, B)) < 0.6).astype(np.int32)
    val = rng.integers(0, 2**31, (C, B), dtype=np.int64).astype(np.uint32)
    out = np.asarray(masked_compact(mask, val, K))
    for c in range(C):
        ref = _ref(mask[c], val[c], K)
        np.testing.assert_array_equal(out[c][: len(ref)], ref)


def test_cross_backend_contract_full_chunk_shape():
    """VERDICT r3 item 6c: the TPU kernel (interpret mode) and the XLA sort
    fallback must agree at FULL-CHUNK shapes — multi-tile grids with carry
    crossing tile boundaries and a partial last output row. The r3
    regression shipped because kernel-vs-fallback equivalence was only
    ever asserted on toy shapes."""
    rng = np.random.default_rng(0xC0FFEE)
    C, B, tile = 2, 65536, 256          # 2 tiles of (256, 128) per chunk row
    K = 32768                           # full 32Ki-token output
    # density chosen so valid counts straddle K (one row under, one over)
    mask = np.zeros((C, B), np.int32)
    mask[0] = rng.random(B) < 0.3       # ~19.6k valid < K
    mask[1] = rng.random(B) < 0.7       # ~45.9k valid > K (truncated at K)
    val = rng.integers(0, 2**32, (C, B), dtype=np.int64).astype(np.uint32)
    val2 = rng.integers(0, 2**32, (C, B), dtype=np.int64).astype(np.uint32)

    k1, k2 = masked_compact(mask, (val, val2), K, tile_rows=tile,
                            interpret=True)
    f1, f2 = _xla_fallback(jnp.asarray(mask),
                           (jnp.asarray(val), jnp.asarray(val2)), K)
    k1, k2, f1, f2 = map(np.asarray, (k1, k2, f1, f2))
    for c in range(C):
        n = min(int(mask[c].sum()), K)
        ref1 = _ref(mask[c], val[c], K)[:n]
        ref2 = _ref(mask[c], val2[c], K)[:n]
        np.testing.assert_array_equal(k1[c][:n], ref1)
        np.testing.assert_array_equal(f1[c][:n], ref1)
        np.testing.assert_array_equal(k2[c][:n], ref2)
        np.testing.assert_array_equal(f2[c][:n], ref2)


@pytest.mark.parametrize("C,B,dens,tile", [(2, 2048, 0.25, 8), (2, 65536, 0.6, 256)])
def test_fused_single_word_path(C, B, dens, tile):
    """fuse_bits: the encode interleave's byte|0x100 lanes (< 2**9, nonzero
    on every masked lane) ride the one-rolled-word fast path; must match the
    generic kernel and the reference exactly."""
    rng = np.random.default_rng(B + C)
    mask = (rng.random((C, B)) < dens).astype(np.int32)
    val = (rng.integers(0, 256, (C, B), dtype=np.int64).astype(np.uint32)
           | np.uint32(0x100)) * mask.astype(np.uint32)
    K = ((B // 2) // 128 + 2) * 128
    fused = np.asarray(masked_compact(mask, val, K, tile_rows=tile,
                                      fuse_bits=9, interpret=True))
    generic = np.asarray(masked_compact(mask, val, K, tile_rows=tile,
                                        interpret=True))
    for c in range(C):
        ref = _ref(mask[c], val[c], K)
        np.testing.assert_array_equal(fused[c][: len(ref)], ref)
        np.testing.assert_array_equal(generic[c][: len(ref)], ref)


@pytest.mark.parametrize("guard_from", [0, 3, 7])
def test_guarded_move_rounds(guard_from, monkeypatch):
    """ADVICE r4: the scalar max-residual guard (rounds >= _GUARD_FROM run
    under a lax.cond) ships disabled by default (env '99'); if the knob is
    ever set it must still be bit-exact. Exercised in interpret mode at
    several guard thresholds, both kernel flavors."""
    import cloudini_tpu.ops.compact_kernel as ck

    monkeypatch.setattr(ck, "_GUARD_FROM", guard_from)
    rng = np.random.default_rng(31 + guard_from)
    C, B, tile = 2, 2048, 8
    mask = (rng.random((C, B)) < 0.45).astype(np.int32)
    val = rng.integers(0, 2**31, (C, B), dtype=np.int64).astype(np.uint32)
    val9 = (rng.integers(0, 256, (C, B), dtype=np.int64).astype(np.uint32)
            | np.uint32(0x100)) * mask.astype(np.uint32)
    K = ((B // 2) // 128 + 2) * 128
    out = np.asarray(ck.masked_compact(mask, val, K, tile_rows=tile,
                                       interpret=True))
    fused = np.asarray(ck.masked_compact(mask, val9, K, tile_rows=tile,
                                         fuse_bits=9, interpret=True))
    for c in range(C):
        ref = _ref(mask[c], val[c], K)
        ref9 = _ref(mask[c], val9[c], K)
        np.testing.assert_array_equal(out[c][: len(ref)], ref)
        np.testing.assert_array_equal(fused[c][: len(ref9)], ref9)


@pytest.mark.parametrize(
    "C,B,dens,tile,counts",
    [
        (3, 2048, 0.4, 8, (41, 0, 127)),     # mixed head sizes incl. empty/max
        (2, 65536, 0.55, 256, (17, 99)),     # full-chunk multi-tile
        (2, 1024, 0.0, 4, (41, 3)),          # empty main stream: head only
    ],
)
def test_init_row_seeding(C, B, dens, tile, counts):
    """init_row/init_count: pre-packed head bytes (encode's out-of-band
    point 0) seed the running output before the stream's own lanes — the
    kernel result must equal compacting [head | stream] as one stream.
    Covers the pend-flush path (a chunk whose main stream is empty must
    still land its head bytes)."""
    rng = np.random.default_rng(B * 7 + C)
    mask = (rng.random((C, B)) < dens).astype(np.int32)
    val = (rng.integers(0, 256, (C, B), dtype=np.int64).astype(np.uint32)
           | np.uint32(0x100)) * mask.astype(np.uint32)
    init_count = np.asarray(counts, np.int32)
    lanes = np.arange(128)[None, :]
    init_row = ((rng.integers(0, 256, (C, 128), dtype=np.int64)
                 .astype(np.uint32) | np.uint32(0x100))
                * (lanes < init_count[:, None]))
    K = ((B // 2) // 128 + 3) * 128
    out = np.asarray(masked_compact(
        mask, val, K, tile_rows=tile, fuse_bits=9,
        init_row=jnp.asarray(init_row), init_count=jnp.asarray(init_count),
        interpret=True))
    fb = np.asarray(masked_compact(
        mask, val, K, fuse_bits=9,
        init_row=jnp.asarray(init_row), init_count=jnp.asarray(init_count),
        interpret=None))  # CPU -> the widened-stream sort fallback
    for c in range(C):
        full_mask = np.concatenate(
            [(lanes[0] < init_count[c]).astype(np.int32), mask[c]])
        full_val = np.concatenate([init_row[c], val[c]])
        ref = _ref(full_mask, full_val, K)
        np.testing.assert_array_equal(out[c][: len(ref)], ref)
        np.testing.assert_array_equal(fb[c][: len(ref)], ref)
