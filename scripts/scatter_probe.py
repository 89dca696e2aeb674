#!/usr/bin/env python3
"""Probe: scatter-add emission variants at the fused-ZSTD trace shapes.

The r5 profile of the fused device-ZSTD program (jit__encode 1.06 s/iter at
C=16) shows ~10 scatter rounds of ~54 ms each on the words/out/bump buffers.
Oddity to explain: a 2.36M-update round (seq put) costs the SAME 54 ms as a
6.2M-update round (literal put) — suggesting the cost is bound by the scatter
OPERAND size, not the update count. All three buffers carry park regions for
masked lanes that inflate the operand 2-5x over the real payload
(words: 161306 words vs 32282 real; out: 258112 bytes vs 129040 real;
bump: 2*cap vs cap).

Variants:
  park_big   — current: updates parked at unique in-bounds scratch (operand 5x)
  drop_oob   — masked lanes sent to a far OOB index, mode="drop" (operand 1x)
  drop_small — drop_oob with the seq put's 49153-lane updates
  park_small — current seq put (49153 lanes into the 161306-word buffer)
  merged     — one scatter of cap+49153 lanes (literal+seq puts fused),
               drop_oob operand
  bump_cov   — coverage mask via two scatter-adds + cumsum (current)
  cummax_cov — coverage mask via one cummax + compare (candidate)

Honest-timing rules per .claude/skills/verify/SKILL.md: chained
content-unique iterations, D2H sync after warmup, no transfers timed.
"""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

R, CAP = 48, 129024
NW = ((CAP + 64) * 8) // 32 + 8          # 32280 real words
W_PARK = NW + CAP + 2                     # 161306 (current buffer)
W_REAL = NW + 2
S_SEQ = 49153                             # the seq put's lane count
ITERS = 6
MULT = np.int32(-1640531535)


def _chain(fn, val0, iters=ITERS):
    iota = jnp.arange(val0.shape[-1], dtype=jnp.int32)[None, :]

    @jax.jit
    def mix(v, out, k):
        st = (out.astype(jnp.int32) * MULT).sum() + k * np.int32(40503)
        pert = (((st + iota * MULT) >> 9) & 0x3).astype(v.dtype)
        return v + pert

    f = jax.jit(fn)
    out = jax.block_until_ready(f(val0))
    first = out[0] if isinstance(out, tuple) else out
    v = jax.block_until_ready(mix(val0, first, jnp.int32(0)))
    _ = np.asarray(first[:1, :1])  # D2H sync (block_until_ready no-op before)
    t0 = time.perf_counter()
    for i in range(iters):
        out = f(v)
        first = out[0] if isinstance(out, tuple) else out
        v = mix(v, first, jnp.int32(i + 1))
    jax.block_until_ready((out, v))
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    ri = jnp.arange(R, dtype=jnp.int32)[:, None]
    # bit positions like the literal put: monotone-ish within each row
    pos_big = jnp.asarray(
        np.sort(rng.integers(0, NW * 32 - 64, (R, CAP)), axis=1).astype(np.int32))
    m_big = jnp.asarray((rng.random((R, CAP)) < 0.7))
    pos_small = jnp.asarray(
        np.sort(rng.integers(0, NW * 32 - 64, (R, S_SEQ)), axis=1).astype(np.int32))
    m_small = jnp.asarray((rng.random((R, S_SEQ)) < 0.9))
    val_big0 = jnp.asarray(rng.integers(0, 2**16, (R, CAP)).astype(np.uint32))
    val_small0 = jnp.asarray(rng.integers(0, 2**16, (R, S_SEQ)).astype(np.uint32))

    def scatter2(width, pos, m, park_oob):
        lanes = pos.shape[1]
        park = (jnp.int32(1 << 30) + jnp.zeros((1, lanes), jnp.int32)
                if park_oob else NW + jnp.arange(lanes, dtype=jnp.int32)[None, :])

        def f(v):
            words = jnp.zeros((R, width), jnp.uint32)
            sh = (pos & 31).astype(jnp.uint32)
            w0 = pos >> 5
            lo = v << sh
            hi = jnp.where(sh > 0, v >> (jnp.uint32(32) - jnp.maximum(sh, 1)), 0)
            words = words.at[ri, jnp.where(m, w0, park)].add(lo, mode="drop")
            words = words.at[ri, jnp.where(m, w0 + 1, park)].add(hi, mode="drop")
            return words

        return f

    t = _chain(scatter2(W_PARK, pos_big, m_big, False), val_big0)
    print(f"park_big   (cap lanes -> {W_PARK}w): {t*1e3:8.2f} ms")
    t = _chain(scatter2(W_REAL, pos_big, m_big, True), val_big0)
    print(f"drop_oob   (cap lanes -> {W_REAL}w): {t*1e3:8.2f} ms")
    t = _chain(scatter2(W_PARK, pos_small, m_small, False), val_small0)
    print(f"park_small ({S_SEQ} lanes -> {W_PARK}w): {t*1e3:8.2f} ms")
    t = _chain(scatter2(W_REAL, pos_small, m_small, True), val_small0)
    print(f"drop_small ({S_SEQ} lanes -> {W_REAL}w): {t*1e3:8.2f} ms")

    pos_m = jnp.concatenate([pos_big, pos_small], axis=1)
    m_m = jnp.concatenate([m_big, m_small], axis=1)
    val_m0 = jnp.concatenate([val_big0, val_small0], axis=1)
    t = _chain(scatter2(W_REAL, pos_m, m_m, True), val_m0)
    print(f"merged     ({CAP + S_SEQ} lanes -> {W_REAL}w): {t*1e3:8.2f} ms")

    # ---- coverage-mask construction ------------------------------------
    idx = jnp.arange(CAP, dtype=jnp.int32)[None, :]
    keep = jnp.asarray(rng.random((R, CAP)) < 0.05)
    mlen0 = jnp.asarray(rng.integers(4, 20, (R, CAP)).astype(np.int32))

    def bump_cov(mlen):
        bump = jnp.zeros((R, 2 * CAP), jnp.int32)
        bump = bump.at[ri, jnp.where(keep, idx, CAP + idx)].add(1, mode="drop")
        bump = bump.at[ri, jnp.where(keep, idx + mlen, CAP + idx)].add(
            -1, mode="drop")
        return jnp.cumsum(bump[:, :CAP], axis=1) > 0

    def cummax_cov(mlen):
        end = jax.lax.cummax(jnp.where(keep, idx + mlen, -1), axis=1)
        return idx < end

    t = _chain(lambda v: bump_cov(v).astype(jnp.int32), mlen0)
    print(f"bump_cov   (2 scatters + cumsum): {t*1e3:8.2f} ms")
    t = _chain(lambda v: cummax_cov(v).astype(jnp.int32), mlen0)
    print(f"cummax_cov (cummax + compare):    {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
