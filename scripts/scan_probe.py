#!/usr/bin/env python3
"""Micro-probe: XLA native cumsum/cummax vs log-round Hillis-Steele vs
blocked two-level scans at the decode path's shapes. Chained, content-unique
(axon memoizer rules). Informs which scan implementation the pure-varint
decoder should use.

Usage: python scripts/scan_probe.py [C] [B]
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

C = int(sys.argv[1]) if len(sys.argv) > 1 else 64
B = int(sys.argv[2]) if len(sys.argv) > 2 else 262144
MULT = np.int32(-1640531535)


def hillis(x):
    n = x.shape[-1]
    idx = jnp.arange(n, dtype=jnp.int32)
    k = 1
    while k < n:
        x = x + jnp.where(idx >= k, jnp.roll(x, k, axis=-1), 0)
        k *= 2
    return x


def blocked(x, bs=512):
    c, n = x.shape
    nb = n // bs
    xb = x.reshape(c, nb, bs)
    idx = jnp.arange(bs, dtype=jnp.int32)
    k = 1
    intra = xb
    while k < bs:
        intra = intra + jnp.where(idx >= k, jnp.roll(intra, k, axis=-1), 0)
        k *= 2
    totals = intra[:, :, -1]
    idx2 = jnp.arange(nb, dtype=jnp.int32)
    off = totals
    k = 1
    while k < nb:
        off = off + jnp.where(idx2 >= k, jnp.roll(off, k, axis=-1), 0)
        k *= 2
    off = off - totals  # exclusive
    return (intra + off[:, :, None]).reshape(c, n)


def bench(name, fn, x0):
    f = jax.jit(fn)
    y = jax.block_until_ready(f(x0))
    # verify
    want = np.cumsum(np.asarray(x0, dtype=np.int64), axis=-1).astype(np.uint32)
    got = np.asarray(y).astype(np.uint32)
    assert np.array_equal(got, want), f"{name} wrong"
    best = float("inf")
    mixer = jax.jit(lambda x, y, k: ((x * MULT + k) ^ (y >> 3)).astype(jnp.uint32) & 0xFF)
    xx = x0
    for trial in range(3):
        xx = jax.block_until_ready(mixer(xx, y, jnp.int32(trial)))
        t0 = time.perf_counter()
        for i in range(8):
            y = f(xx)
            xx = mixer(xx, y, jnp.int32(trial * 100 + i))
        jax.block_until_ready((y, xx))
        best = min(best, (time.perf_counter() - t0) / 8)
    print(f"{name:12s} {best*1e3:8.3f} ms  ({C*B/best/1e9:.1f} Gel/s)")
    return best


def main():
    rng = np.random.default_rng(0)
    x0 = jax.device_put(rng.integers(0, 200, (C, B), dtype=np.int64).astype(np.uint32))
    print(f"# shapes: ({C}, {B}) u32")
    bench("xla_cumsum", lambda x: jnp.cumsum(x, axis=-1, dtype=jnp.uint32), x0)
    bench("hillis", hillis, x0)
    bench("blocked512", lambda x: blocked(x, 512), x0)
    bench("blocked2048", lambda x: blocked(x, 2048), x0)


if __name__ == "__main__":
    main()
