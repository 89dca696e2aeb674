#!/usr/bin/env python3
"""Probe: Mosaic lowering cost of the compaction kernel's inner ops.

The candidate Pallas compaction kernel does ~15-25 rounds of
(lane-roll + select) per tile plus a lane-axis cumsum. r1 measured
log-round pltpu.roll lowering poorly in a different kernel shape
(ops/scan_kernel.py); this probe isolates JUST the roll+select rounds
at the tile shape the compaction kernel would use, so the kernel
go/no-go is decided by measurement, not the stale r1 belief.

Measures, per element:
  roll20: 20 rounds of static lane-roll + select on a (S,128) u32 tile
  cumsum: jnp.cumsum along lanes inside the kernel
  passthrough: tile copy (framework floor)
All at grid (C*B/TILE,) over the decode-shaped (64, 262144) input.
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C, B = 64, 262144
S = int(__import__('os').environ.get('PROBE_S', '256'))


def _kernel_pass(x_ref, o_ref):
    o_ref[:] = x_ref[:]


def _kernel_roll(x_ref, o_ref, rounds: int):
    x = x_ref[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, (S, 128), 1)
    for b in range(rounds):
        sh = 1 << (b % 7)
        y = pltpu.roll(x, 128 - sh, 1)  # lane roll left by sh
        x = jnp.where((lane + sh) % 128 > lane, y, x + 1)
    o_ref[:] = x


def _kernel_cumsum(x_ref, o_ref):
    o_ref[:] = jnp.cumsum(x_ref[:], axis=1, dtype=jnp.uint32)


def _run(kernel, x, label):
    n_tiles = (C * B) // (S * 128)
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((C * B // 128, 128), jnp.uint32),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((S, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((S, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    f = jax.jit(f)
    out = jax.block_until_ready(f(x))
    _ = np.asarray(out[:1, :1])  # D2H sync so later blocks are honest
    mult = np.int32(-1640531535)

    @jax.jit
    def mix(a, o, k):
        st = (o.astype(jnp.int32) * mult).sum() + k * np.int32(40503)
        return a + (st & 0x3).astype(jnp.uint32)

    a = jax.block_until_ready(mix(x, out, jnp.int32(0)))
    t0 = time.perf_counter()
    ITERS = 6
    for i in range(ITERS):
        out = f(a)
        a = mix(a, out, jnp.int32(i + 1))
    jax.block_until_ready((out, a))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{label}: {dt*1e3:.2f} ms ({dt*1e9/(C*B):.3f} ns/el)", flush=True)
    out.delete(), a.delete()


def main():
    rng = np.random.default_rng(0)
    x = jax.device_put(
        rng.integers(0, 2**31, (C * B // 128, 128), dtype=np.int64).astype(np.uint32)
    )
    _run(_kernel_pass, x, "passthrough")
    _run(functools.partial(_kernel_roll, rounds=20), x, "roll20+select")
    _run(_kernel_cumsum, x, "cumsum_lanes")


if __name__ == "__main__":
    main()
