#!/usr/bin/env python3
"""r3 probe: cost of XLA sort variants for the compaction primitive.

The decode compaction currently sorts (u32 key, u32 payload) over
(C, B) with unique keys, is_stable=False (device_codec._decode). Encode
sorts a single packed u32. This probe measures alternatives on the chip:

  base2w    — (u32 key, u32 val), unstable            [decode today]
  base1w    — u32 packed key only, unstable           [encode today]
  stable8   — (u8 1-bit key, u32 val), STABLE sort    [compaction-as-stable-sort]
  stable8x2 — (u8 key, u32 val, u16 val2), STABLE
  short2w   — base2w reshaped to 2048-long rows       [two-level decomposition]
  u16k      — (u16 key, u32 val), unstable

All honestly chained (outputs folded into next inputs). Times are
ms/iter over (C, B) = (64, 262144) by default.

Run: python scripts/sort_variants_probe.py [C] [B] [iters]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

C = int(sys.argv[1]) if len(sys.argv) > 1 else 64
B = int(sys.argv[2]) if len(sys.argv) > 2 else 262144
ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 4


def base2w(k, v):
    sk, sv = jax.lax.sort((k, v), dimension=1, num_keys=1, is_stable=False)
    return sk, sv


def base1w(k, v):
    return jax.lax.sort(k, dimension=1, is_stable=False), v


def stable8(k, v):
    k8 = (k >> 31).astype(jnp.uint8)  # 1-bit validity key
    sk, sv = jax.lax.sort((k8, v), dimension=1, num_keys=1, is_stable=True)
    return sk.astype(jnp.uint32), sv


def stable8x2(k, v):
    k8 = (k >> 31).astype(jnp.uint8)
    v2 = (v & np.uint32(0xFFFF)).astype(jnp.uint16)
    sk, sv, s2 = jax.lax.sort((k8, v, v2), dimension=1, num_keys=1, is_stable=True)
    return sk.astype(jnp.uint32) + s2.astype(jnp.uint32), sv


def short2w(k, v):
    kr = k.reshape(C * (B // 2048), 2048)
    vr = v.reshape(C * (B // 2048), 2048)
    sk, sv = jax.lax.sort((kr, vr), dimension=1, num_keys=1, is_stable=False)
    return sk.reshape(C, B), sv.reshape(C, B)


def u16k(k, v):
    k16 = (k >> 16).astype(jnp.uint16)
    sk, sv = jax.lax.sort((k16, v), dimension=1, num_keys=1, is_stable=False)
    return sk.astype(jnp.uint32), sv


def main():
    print(f"device: {jax.devices()[0]}, C={C}, B={B}")
    rng = np.random.default_rng(0)
    k0 = jnp.asarray(rng.integers(0, 1 << 31, (C, B), dtype=np.int64).astype(np.uint32))
    v0 = jnp.asarray(rng.integers(0, 1 << 31, (C, B), dtype=np.int64).astype(np.uint32))

    for name, fn in (
        ("base2w", base2w),
        ("base1w", base1w),
        ("stable8", stable8),
        ("stable8x2", stable8x2),
        ("short2w", short2w),
        ("u16k", u16k),
    ):
        f = jax.jit(fn)
        try:
            k, v = jax.block_until_ready(f(k0, v0))
        except Exception as e:  # noqa: BLE001
            print(f"{name:10s}: FAILED {type(e).__name__}: {str(e)[:100]}", flush=True)
            continue
        np.asarray(v[:1, :1])  # SYNC: un-synced blocks are no-ops (SKILL.md r3)
        per = []
        for trial in range(2):
            # bench-style chain: queue ITERS un-awaited iterations then block
            # once — pipelines the ~30 ms/call tunnel RTT away (SKILL.md r3)
            t0 = time.perf_counter()
            for i in range(ITERS):
                k = k ^ (v + np.uint32(0x9E3779B9 + i))  # fresh contents
                v = v ^ (k >> 7)
                k, v = f(k, v)
            jax.block_until_ready((k, v))
            per.append((time.perf_counter() - t0) / ITERS * 1e3)
        ns_el = min(per) * 1e6 / (C * B)
        print(
            f"{name:10s}: " + " ".join(f"{p:8.2f}" for p in per)
            + f" ms/iter  ({ns_el:.3f} ns/el)",
            flush=True,
        )
        k.delete()
        v.delete()


if __name__ == "__main__":
    main()
