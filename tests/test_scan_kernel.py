"""Differential test of the fused Pallas decode front-end (interpret mode)
against a direct numpy evaluation of the same quantities."""

import numpy as np
import pytest

from cloudini_tpu.ops import scan_kernel as sk


def _numpy_frontend(payloads, sizes, k_valid):
    C, B = payloads.shape
    key = np.full((C, B), 0xFFFFFFFF, np.uint32)
    run = np.zeros((C, B), np.uint32)
    stats = np.zeros((C, sk.ST_N), np.int32)
    for c in range(C):
        p = payloads[c].astype(np.int64)
        size = sizes[c]
        idx = np.arange(B)
        in_range = idx < size
        g = p & 0x7F
        term = ((p & 0x80) == 0) & in_range
        m = np.where(term, idx, -1)
        m_incl = np.maximum.accumulate(m)
        m_excl = np.concatenate([[-1], m_incl[:-1]])
        pos = idx - m_excl - 1
        a = np.where(in_range & (pos < 4), g << (np.minimum(pos, 3) * 7), 0)
        run[c] = np.cumsum(a.astype(np.uint32), dtype=np.uint32)
        csum = np.cumsum(term.astype(np.int64))
        tok_id = csum - term
        needed = term & (tok_id < k_valid[c])
        tok_len = idx - m_excl
        key[c] = np.where(needed, (tok_id.astype(np.uint32) << 10), 0xFFFFFFFF)
        stats[c, sk.ST_TERMS] = term.sum()
        stats[c, sk.ST_ANY_B] = int(np.any(in_range & (pos == 4) & (g != 0)))
        stats[c, sk.ST_OVERFLOW] = int(np.any(needed & (tok_len > 5)))
        stats[c, sk.ST_CONSUMED] = int((in_range & (tok_id < k_valid[c])).sum())
    return key, run, stats


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_frontend_matches_numpy(seed):
    rng = np.random.default_rng(seed)
    C, B = 3, 2 * sk.TILE
    payloads = rng.integers(0, 256, (C, B), dtype=np.uint8)
    # sprinkle longer runs of continuation bytes to exercise pos > 4
    payloads[0, 100:140] |= 0x80
    sizes = np.array([B, B - 777, 5], np.int32)
    k_valid = np.array([10**9, 4000, 1], np.int32)
    key, run, stats = sk.decode_frontend(payloads, sizes, k_valid, interpret=True)
    key, run, stats = np.asarray(key), np.asarray(run), np.asarray(stats)
    kref, rref, sref = _numpy_frontend(payloads, sizes, k_valid)
    np.testing.assert_array_equal(stats[:, :4], sref[:, :4])
    np.testing.assert_array_equal(key, kref)
    np.testing.assert_array_equal(run, rref)
