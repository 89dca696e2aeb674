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
