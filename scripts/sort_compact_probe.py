#!/usr/bin/env python3
"""Probe: compaction-as-sort variants on the real chip.

The decode token compaction (device_codec.py _decode) sorts (C, B) u32
keys (tok_id<<10 | run_b bits, invalid=0xFFFFFFFF) carrying one u32
payload. The INPUT IS ALREADY KEY-ORDERED — the sort is only used as a
stream compaction. Variants measured here:

  a) current: unstable 2-word sort (u32 key + u32 payload)
  b) stable sort on a u8 valid-flag key (0=valid, 1=invalid) + u32 payload
  c) stable sort on a u16 key (valid flag << 9 | run_b bits) + u32 payload
  d) encode shape: unstable 1-word u32 packed sort (pos<<8 | byte)
  e) encode shape: stable u8 flag + u8 byte payload

Honest-timing rules per .claude/skills/verify/SKILL.md: chained
content-unique iterations, D2H sync after warmup, no transfers in the
timed region.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

C, B = 64, 262144
EB = 64, 327680  # encode shape: 10 slots x 32768 points
ITERS = 6


def _chain(fn, x0, iters=ITERS):
    mult = np.int32(-1640531535)
    iota = jnp.arange(x0.shape[-1], dtype=jnp.int32)[None, :]

    @jax.jit
    def mix(x, out, k):
        st = (out.astype(jnp.int32) * mult).sum() + k * np.int32(40503)
        pert = (((st + iota * mult) >> 9) & 0x3).astype(x.dtype)
        return x + pert

    f = jax.jit(fn)
    out = jax.block_until_ready(f(x0))
    x = jax.block_until_ready(mix(x0, out if out.ndim == 2 else out[0], jnp.int32(0)))
    _ = np.asarray((out if out.ndim == 2 else out[0])[:1, :1])  # D2H sync
    t0 = time.perf_counter()
    for i in range(iters):
        out = f(x)
        x = mix(x, out if out.ndim == 2 else out[0], jnp.int32(i + 1))
    jax.block_until_ready((out, x))
    dt = (time.perf_counter() - t0) / iters
    return dt


def main():
    rng = np.random.default_rng(0)
    # half-density valid mask like real decode streams
    valid = rng.random((C, B)) < 0.5
    val = rng.integers(0, 2**31, (C, B), dtype=np.int64).astype(np.uint32)
    tok = np.cumsum(valid, axis=1).astype(np.uint32)
    key32 = np.where(valid, tok << 10, np.uint32(0xFFFFFFFF)).astype(np.uint32)
    key8 = np.where(valid, 0, 1).astype(np.uint8)
    key16 = np.where(valid, rng.integers(0, 512, (C, B)), 1 << 9).astype(np.uint16)

    d_val = jax.device_put(val)
    d_key32 = jax.device_put(key32)
    d_key8 = jax.device_put(key8)
    d_key16 = jax.device_put(key16)

    def a(v):
        k, p = jax.lax.sort((d_key32, v), dimension=1, num_keys=1, is_stable=False)
        return p

    def b(v):
        k, p = jax.lax.sort((d_key8, v), dimension=1, num_keys=1, is_stable=True)
        return p

    def c(v):
        k, p = jax.lax.sort((d_key16, v), dimension=1, num_keys=1, is_stable=True)
        return p

    for name, fn in [("a_unstable_u32key", a), ("b_stable_u8key", b),
                     ("c_stable_u16key", c)]:
        dt = _chain(fn, d_val)
        print(f"{name}: {dt*1e3:.2f} ms  ({C*B/dt/1e9:.2f} Gel/s)", flush=True)

    # encode shapes
    Ce, Be = EB
    validE = rng.random((Ce, Be)) < 0.5
    pos = np.cumsum(validE, axis=1).astype(np.uint32)
    byte = rng.integers(0, 256, (Ce, Be)).astype(np.uint32)
    keyE = np.where(validE, (pos << 8) | byte, np.uint32(0xFFFFFFFF)).astype(np.uint32)
    keyE8 = np.where(validE, 0, 1).astype(np.uint8)
    d_keyE = jax.device_put(keyE)
    d_keyE8 = jax.device_put(keyE8)
    d_byteE = jax.device_put(byte.astype(np.uint8))

    def d(v):
        return jax.lax.sort(v, dimension=1, is_stable=False)

    def e(v):
        k, p = jax.lax.sort((d_keyE8, v), dimension=1, num_keys=1, is_stable=True)
        return p

    for name, fn, x0 in [("d_encode_unstable_u32packed", d, d_keyE),
                         ("e_encode_stable_u8key_u8val", e, d_byteE)]:
        dt = _chain(fn, x0)
        print(f"{name}: {dt*1e3:.2f} ms  ({Ce*Be/dt/1e9:.2f} Gel/s)", flush=True)


if __name__ == "__main__":
    main()
