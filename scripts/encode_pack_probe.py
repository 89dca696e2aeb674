#!/usr/bin/env python3
"""Probe: encode interleave via compaction kernel vs the position sort.

The encode wire is the masked compaction of slot bytes in (point, slot)
order; the open question is how to BUILD that point-major packed input
from the T per-lane (C, N) byte arrays without the known tiny-trailing-
dim layout trap ((C,N,T) tiles pad ~25x — .claude/skills/verify/SKILL.md).

Variants:
  a) stack:   jnp.stack(lanes, -1).reshape(C, N*T)   (the trap, measured)
  b) phase:   broadcast-expand each lane by T and phase-select (fusible,
              no materialized (C,N,T))
Each feeds masked_compact; baseline is the current 1-word position sort.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from cloudini_tpu.ops.compact_kernel import masked_compact  # noqa: E402

C, N, T = 64, 32768, 10
B = N * T
K = 163840  # ~5 B/point wire
ITERS = 6


def _time(fn, x0, label):
    mult = np.int32(-1640531535)
    f = jax.jit(fn)
    out = jax.block_until_ready(f(x0))
    _ = np.asarray(out[:1, :1])

    @jax.jit
    def mix(x, o, k):
        st = (o.astype(jnp.int32) * mult).sum() + k * np.int32(40503)
        return x ^ (st & 0x7).astype(x.dtype)

    x = jax.block_until_ready(mix(x0, out, jnp.int32(0)))
    t0 = time.perf_counter()
    for i in range(ITERS):
        out = f(x)
        x = mix(x, out, jnp.int32(i + 1))
    jax.block_until_ready((out, x))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{label}: {dt*1e3:.2f} ms", flush=True)
    x.delete()


def main():
    rng = np.random.default_rng(0)
    # synthetic: lane k valid iff k < len[p], len in [1,5] like real tokens
    lens = rng.integers(1, 6, (C, N)).astype(np.int32)
    lanes = rng.integers(0, 256, (C, N, T)).astype(np.uint32)
    d_lens = jax.device_put(lens)
    d_lanes = jax.device_put(np.ascontiguousarray(lanes.transpose(2, 0, 1)))

    def packed_cols(ls):
        # ls: (T, C, N) u32; valid lanes carry byte|0x100
        return [jnp.where(k * 2 < d_lens * 2, ls[k] | np.uint32(0x100),
                          np.uint32(0)).astype(jnp.uint32)
                for k in range(T)]

    def via_stack(ls):
        cols = packed_cols(ls)
        pk = jnp.stack(cols, axis=-1).reshape(C, B)
        return masked_compact(pk, pk, K)

    def via_phase(ls):
        cols = packed_cols(ls)
        phase = (jnp.arange(B, dtype=jnp.int32) % T)[None, :]
        pk = jnp.zeros((C, B), jnp.uint32)
        for k in range(T):
            ex = jnp.broadcast_to(cols[k][:, :, None], (C, N, T)).reshape(C, B)
            pk = jnp.where(phase == k, ex, pk)
        return masked_compact(pk, pk, K)

    def via_sort(ls):
        cols = packed_cols(ls)
        # current formulation: pos<<8|byte keys, one-word sort
        sizes = jnp.minimum(d_lens, T)
        off = jnp.cumsum(sizes, axis=-1) - sizes
        keys = []
        for k in range(T):
            valid = k < sizes
            keyk = ((off + k).astype(jnp.uint32) << 8) | (ls[k] & 0xFF)
            keys.append(jnp.where(valid, keyk, np.uint32(0xFFFFFFFF)))
        key = jnp.concatenate(keys, axis=-1)
        s = jax.lax.sort(key, dimension=1, is_stable=False)
        return (s[:, :K] & 0xFF).astype(jnp.uint8)

    _time(via_sort, d_lanes, "a_sort_baseline")
    _time(via_phase, d_lanes, "b_phase_select_kernel")
    _time(via_stack, d_lanes, "c_stack_kernel")


if __name__ == "__main__":
    main()
