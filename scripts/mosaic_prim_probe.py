#!/usr/bin/env python3
"""r3 probe: Mosaic lowering cost of the primitives a Pallas compaction
kernel would need, measured per element on the real chip.

The compaction (valid elements -> dense prefix, order kept) is the one
data movement both codec directions pay (the XLA sort: 11.9 ms for
(64, 262144) x 2 words, 63% of decode). Candidate kernel primitives:

  roll_scan   — log-round pltpu.roll prefix sum over a (512, 128) tile
                (r1 measured this ~5x slower than XLA native cumsum)
  mxu_scan    — prefix sum along 128 lanes as int8 matmul vs upper-tri ones
                (x @ U), the MXU formulation of the same scan
  copy        — pure VMEM in->out copy of the tile (roofline floor)

Each kernel loops its body REPS times in-kernel over fresh data slices so
per-call dispatch amortizes out; honest chaining across calls.

Run: python scripts/mosaic_prim_probe.py [rows]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 4096  # (ROWS, 128) i32 input
LANES = 128


def _copy_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] + 1


def _roll_scan_kernel(x_ref, o_ref):
    x = x_ref[:]
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    k = 1
    while k < LANES:
        x = x + jnp.where(col >= k, pltpu.roll(x, k, 1), 0)
        k *= 2
    o_ref[:] = x


def _mxu_scan_kernel(x_ref, u_ref, o_ref):
    # inclusive prefix sum along lanes: x (R, 128) @ U (128, 128) lower-tri^T
    o_ref[:] = jax.lax.dot_general(
        x_ref[:].astype(jnp.float32), u_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)


def _mk(kernel, n_in, rows=ROWS, extra=()):
    def fn(*args):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(*args)

    return jax.jit(fn)


def timed(name, f, args, fold_idx=0, iters=8):
    try:
        y = jax.block_until_ready(f(*args))
    except Exception as e:  # noqa: BLE001
        print(f"{name:12s}: FAILED {type(e).__name__}: {str(e)[:110]}", flush=True)
        return
    np.asarray(y[:1, :1])  # SYNC: un-synced blocks are no-ops (SKILL.md r3)
    args = list(args)
    per = []
    for trial in range(2):
        # queue iters un-awaited calls, block once (pipelines ~30ms/call RTT)
        t0 = time.perf_counter()
        for i in range(iters):
            args[fold_idx] = (args[fold_idx] + y + np.int32(i)) & np.int32(0x7FFF)
            y = f(*args)
        jax.block_until_ready(y)
        per.append((time.perf_counter() - t0) / iters * 1e3)
    n = ROWS * LANES
    print(
        f"{name:12s}: " + " ".join(f"{p:7.3f}" for p in per)
        + f" ms  ({min(per)*1e6/n:7.3f} ns/el)",
        flush=True,
    )


def main():
    print(f"device: {jax.devices()[0]}, tile=({ROWS}, {LANES})")
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.integers(0, 1 << 14, (ROWS, LANES), dtype=np.int32))
    m0 = jnp.asarray(rng.integers(0, 2, (ROWS, LANES), dtype=np.int32))
    u = jnp.asarray(np.tril(np.ones((LANES, LANES), np.float32)).T)  # x@U = incl cumsum

    timed("copy", _mk(_copy_kernel, 1), (x0,))
    timed("roll_scan", _mk(_roll_scan_kernel, 1), (x0,))
    timed("mxu_scan", _mk(_mxu_scan_kernel, 2), (x0, u))


if __name__ == "__main__":
    main()
