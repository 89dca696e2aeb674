#!/usr/bin/env python3
"""r3 probe: cost of reverse-direction scans at fused-LZ4 shapes.

The fused-LZ4 profile shows ~1 s 'fusion' ops whose bodies look like scan
lowerings at (64, 655360) — 24 ns/el where a forward cumsum measures
0.29 ns/el. Candidates: explicit [::-1] reverse + cummin vs the reverse=
True kwarg vs forward cumsum vs forward cummax.

Run: python scripts/revscan_probe.py [C] [B]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

C = int(sys.argv[1]) if len(sys.argv) > 1 else 64
B = int(sys.argv[2]) if len(sys.argv) > 2 else 655360


def rev_slice(x):
    return jax.lax.cummin(x[:, ::-1], axis=1)[:, ::-1]


def rev_kwarg(x):
    return jax.lax.cummin(x, axis=1, reverse=True)


def fwd_sum(x):
    return jnp.cumsum(x, axis=1)


def fwd_max(x):
    return jax.lax.cummax(x, axis=1)


def main():
    print(f"device: {jax.devices()[0]}, ({C}, {B})")
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.integers(0, 1 << 20, (C, B), dtype=np.int32))
    for name, fn in (("rev_slice", rev_slice), ("rev_kwarg", rev_kwarg),
                     ("fwd_sum", fwd_sum), ("fwd_max", fwd_max)):
        f = jax.jit(fn)
        y = jax.block_until_ready(f(x0))
        np.asarray(y[:1, :1])  # SYNC (SKILL.md r3)
        per = []
        for trial in range(2):
            t0 = time.perf_counter()
            yy = y
            for i in range(4):
                yy = f(yy ^ (i + 1))
            jax.block_until_ready(yy)
            per.append((time.perf_counter() - t0) / 4 * 1e3)
        print(f"{name:10s}: " + " ".join(f"{p:8.2f}" for p in per)
              + f" ms  ({min(per)*1e6/(C*B):6.3f} ns/el)", flush=True)
        y.delete()


if __name__ == "__main__":
    main()
