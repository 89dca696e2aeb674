#!/usr/bin/env python3
"""Minimal probe: do long sequential loops stay device-resident on this
runtime, or do they dispatch per step through the tunnel?

Context (PROFILE.md "Pending TPU measurements" item 4): the Gorilla
window-chain scan measured 18.4 s/iter WALL vs 59 ms/iter device-busy —
~4.5 ms/step of host/tunnel overhead for a 4096-step lax.scan — while the
FSM decode's while loops sustain 0.406 GB/s, which implies THEY are
device-resident. This probe times three loop forms at several trip counts
to separate "runtime property" from "program-shape property":

  scan_ys   — lax.scan CARRYING stacked outputs (dynamic-update-slice per
              step), the Gorilla chain's shape
  scan_c    — lax.scan with carry only, no ys
  fori      — lax.fori_loop updating a preallocated buffer

Each body does a small elementwise update on a (8, 4096) f32 block so the
device work per step is negligible; wall/step >> device/step means
per-step dispatch. Run on the real chip: python scripts/scan_dispatch_probe.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

C, W = 8, 4096
MULT = np.float32(1.000003)


def scan_ys(x, n):
    def body(c, _):
        c = c * MULT + np.float32(1.0)
        return c, c[:, 0]

    _, ys = lax.scan(body, x, None, length=n)
    return ys


def scan_c(x, n):
    def body(c, _):
        return c * MULT + np.float32(1.0), None

    c, _ = lax.scan(body, x, None, length=n)
    return c


def fori(x, n):
    out = jnp.zeros((n, C), x.dtype)

    def body(i, s):
        c, o = s
        c = c * MULT + np.float32(1.0)
        return c, lax.dynamic_update_slice(o, c[None, :, 0], (i, 0))

    _, out = lax.fori_loop(0, n, body, (x, out))
    return out


def main():
    print(f"device: {jax.devices()[0]}")
    x0 = jnp.asarray(np.random.default_rng(0).normal(size=(C, W)).astype(np.float32))
    for name, fn in (("scan_ys", scan_ys), ("scan_c", scan_c), ("fori", fori)):
        for n in (64, 512, 4096):
            f = jax.jit(fn, static_argnums=1)
            y = jax.block_until_ready(f(x0, n))  # compile + warm
            iters = 3
            x1 = jax.block_until_ready(x0 * np.float32(1.0 + 1e-7))
            t0 = time.perf_counter()
            for _ in range(iters):
                y = jax.block_until_ready(f(x1, n))
            dt = (time.perf_counter() - t0) / iters
            print(f"{name:8s} n={n:5d}: {dt*1e3:9.2f} ms/iter  "
                  f"({dt/n*1e6:8.1f} us/step)", flush=True)
        del y


if __name__ == "__main__":
    main()
