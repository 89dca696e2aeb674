#!/usr/bin/env python3
"""Keystone r3 probe: does a Pallas kernel whose BODY owns the loop stay
device-resident on this runtime, where a long `lax.scan` dispatches
per-step (~4.5 ms/step measured r2, DECISIONS.md)?

Times three loop forms at several trip counts:

  scan_c  — lax.scan carry-only (the r2 pathology shape)
  while_c — lax.while_loop with the same body
  pallas  — pl.pallas_call whose kernel runs jax.lax.fori_loop internally

Each body is a small elementwise update on a (8, 4096) f32 block. Honest
timing per the axon-memoization rule: each iteration folds the previous
output into the next input, so argument contents never repeat.

Run on the real chip: python scripts/pallas_loop_probe.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C, W = 8, 4096
MULT = np.float32(1.000003)


def scan_c(x, n):
    def body(c, _):
        return c * MULT + np.float32(1.0), None

    c, _ = lax.scan(body, x, None, length=n)
    return c


def while_c(x, n):
    def cond(s):
        return s[0] < n

    def body(s):
        i, c = s
        return i + 1, c * MULT + np.float32(1.0)

    _, c = lax.while_loop(cond, body, (jnp.int32(0), x))
    return c


def pallas_loop(x, n):
    def kernel(x_ref, o_ref):
        def body(i, c):
            return c * MULT + np.float32(1.0)

        o_ref[:] = lax.fori_loop(0, n, body, x_ref[:])

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


def time_fn(fn, x0, n, iters=3):
    f = jax.jit(fn, static_argnums=1)
    y = jax.block_until_ready(f(x0, n))  # compile + warm
    x = x0
    t0 = time.perf_counter()
    for _ in range(iters):
        # fold previous output into next input: contents never repeat
        x = jax.block_until_ready(f(x * np.float32(0.5) + y[:1, :1] * np.float32(1e-6), n))
    dt = (time.perf_counter() - t0) / iters
    y.delete()
    return dt


def main():
    print(f"device: {jax.devices()[0]}")
    x0 = jnp.asarray(np.random.default_rng(0).normal(size=(C, W)).astype(np.float32))
    for name, fn in (("pallas", pallas_loop), ("while_c", while_c), ("scan_c", scan_c)):
        for n in (64, 512, 4096):
            try:
                dt = time_fn(fn, x0, n)
            except Exception as e:  # noqa: BLE001
                print(f"{name:8s} n={n:5d}: FAILED {type(e).__name__}: {e}", flush=True)
                break
            print(
                f"{name:8s} n={n:5d}: {dt*1e3:9.2f} ms/iter  ({dt/n*1e6:8.1f} us/step)",
                flush=True,
            )


if __name__ == "__main__":
    main()
