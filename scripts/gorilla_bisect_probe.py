#!/usr/bin/env python3
"""Bisect WHY the device Gorilla encode program dispatches its scan
per-step (~4 ms/step wall) while standalone scan probes stay resident.

Stages, each jitted alone and honestly chained:
  win      — ops/gorilla._window_resets alone on (C, 32768) lanes
  tokens   — full gorilla_tokens (window chain + bit assembly)
  encode   — the full DeviceStage1Encoder program on the dds mixed schema

Run: python scripts/gorilla_bisect_probe.py [C] [iters]
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from cloudini_tpu.ops import u64
from cloudini_tpu.ops.gorilla import _window_resets, gorilla_tokens

C = int(sys.argv[1]) if len(sys.argv) > 1 else 8
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
N = 32768


def timed(name, f, arg0, fold):
    y = jax.block_until_ready(f(arg0))
    a = arg0
    per = []
    for k in range(ITERS):
        a = fold(a, y, k)
        t0 = time.perf_counter()
        y = jax.block_until_ready(f(a))
        per.append((time.perf_counter() - t0) * 1e3)
    print(f"{name:8s}: " + " ".join(f"{p:10.2f}" for p in per) + " ms/iter", flush=True)


def main():
    print(f"device: {jax.devices()[0]}, C={C}, N={N}")
    rng = np.random.default_rng(0)
    lead0 = jnp.asarray(rng.integers(0, 33, (C, N), dtype=np.int32))
    trail0 = jnp.asarray(rng.integers(0, 33, (C, N), dtype=np.int32))

    @jax.jit
    def win(args):
        lead, trail = args
        return _window_resets(lead, trail)

    def fold_win(a, y, k):
        h = (y[:, :1].astype(jnp.int32) & 1) + np.int32(k)
        return (jnp.abs(a[0] ^ h) % 33, jnp.abs(a[1] ^ h) % 33)

    timed("win", win, (lead0, trail0), fold_win)

    lo0 = jnp.asarray(rng.integers(0, 1 << 31, (C, N), dtype=np.int64).astype(np.uint32))
    hi0 = jnp.asarray(rng.integers(0, 1 << 31, (C, N), dtype=np.int64).astype(np.uint32))
    valid = jnp.ones((C, N), bool)

    @jax.jit
    def tokens(args):
        lo, hi = args
        bm, ln = gorilla_tokens((lo, hi), 64, valid)
        return bm.astype(jnp.int32).sum() + ln.sum()

    def fold_tok(a, y, k):
        h = (y.astype(jnp.uint32) & np.uint32(0xFFFF)) + np.uint32(k)
        return (a[0] ^ h, a[1] ^ h)

    timed("tokens", tokens, (lo0, hi0), fold_tok)


if __name__ == "__main__":
    main()
