#!/usr/bin/env python3
"""Correctness + throughput of ops/compact_kernel.py on the real chip,
vs the sort formulation it replaces (decode shape: (64, 262144), ~50%
density, 1- and 2-word payloads)."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from cloudini_tpu.ops.compact_kernel import masked_compact  # noqa: E402

C, B = 64, 262144
K = 131072
ITERS = 6


def _time(fn, x0, label):
    mult = np.int32(-1640531535)
    f = jax.jit(fn)
    out = jax.block_until_ready(f(x0))
    o0 = out[0] if isinstance(out, tuple) else out
    _ = np.asarray(o0[:1, :1])

    @jax.jit
    def mix(x, o, k):
        st = (o.astype(jnp.int32) * mult).sum() + k * np.int32(40503)
        return x ^ (st & 0x7).astype(x.dtype)

    x = jax.block_until_ready(mix(x0, o0, jnp.int32(0)))
    t0 = time.perf_counter()
    for i in range(ITERS):
        out = f(x)
        o0 = out[0] if isinstance(out, tuple) else out
        x = mix(x, o0, jnp.int32(i + 1))
    jax.block_until_ready((out, x))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{label}: {dt*1e3:.2f} ms ({C*B/dt/1e9:.2f} Gel/s)", flush=True)
    x.delete()
    return dt


def main():
    rng = np.random.default_rng(0)
    mask = (rng.random((C, B)) < 0.5).astype(np.int32)
    val = rng.integers(0, 2**31, (C, B), dtype=np.int64).astype(np.uint32)
    val2 = rng.integers(0, 2**31, (C, B), dtype=np.int64).astype(np.uint32)
    tok = np.cumsum(mask, axis=1).astype(np.uint32)
    key32 = np.where(mask != 0, tok << 10, np.uint32(0xFFFFFFFF)).astype(np.uint32)

    d_mask = jax.device_put(mask)
    d_val = jax.device_put(val)
    d_val2 = jax.device_put(val2)
    d_key = jax.device_put(key32)

    val9 = ((val & np.uint32(0xFF)) | np.uint32(0x100)) * mask.astype(np.uint32)
    d_val9 = jax.device_put(val9)

    # init-seeded head row (encode's out-of-band point 0)
    icnt = rng.integers(1, 128, (C,)).astype(np.int32)
    irow = ((rng.integers(0, 256, (C, 128), dtype=np.int64).astype(np.uint32)
             | np.uint32(0x100))
            * (np.arange(128)[None, :] < icnt[:, None]))
    d_irow = jax.device_put(jnp.asarray(irow))
    d_icnt = jax.device_put(jnp.asarray(icnt))

    prod_only = "--prod" in sys.argv
    if not prod_only:
        for tr in (128, 512):
            _time(lambda v, tr=tr: masked_compact(d_mask, v, K, tile_rows=tr),
                  d_val, f"kernel_1word_S{tr}")
    _time(lambda v: masked_compact(d_mask, v, K, tile_rows=256),
          d_val, "kernel_1word_S256")
    _time(lambda v: masked_compact(d_mask, (v, d_val2), K, tile_rows=256)[0],
          d_val, "kernel_2word_S256")
    _time(lambda v: masked_compact(d_mask, v, K, tile_rows=256, fuse_bits=9),
          d_val9, "kernel_fused9_S256")
    _time(lambda v: masked_compact(d_mask, v, K, tile_rows=256, fuse_bits=9,
                                   init_row=d_irow, init_count=d_icnt),
          d_val9, "kernel_fused9_init_S256")

    if not prod_only:
        def sort2(v):
            _, p = jax.lax.sort((d_key, v), dimension=1, num_keys=1,
                                is_stable=False)
            return p

        _time(sort2, d_val, "sort_2word_baseline")

    # correctness on chip: pull 3 single rows (the tunnel D2H is slow;
    # never pull the whole output)
    out = jax.jit(lambda m, v: masked_compact(m, v, K))(d_mask, d_val)
    for c in (0, C // 2, C - 1):
        ref = val[c][mask[c] != 0][:K]
        got = np.asarray(out[c])[: len(ref)]
        assert np.array_equal(got, ref), f"row {c} mismatch"
    o1, o2 = jax.jit(
        lambda m, a, b: masked_compact(m, (a, b), K))(d_mask, d_val, d_val2)
    for c in (1, C - 2):
        ref1 = val[c][mask[c] != 0][:K]
        ref2 = val2[c][mask[c] != 0][:K]
        assert np.array_equal(np.asarray(o1[c])[: len(ref1)], ref1), c
        assert np.array_equal(np.asarray(o2[c])[: len(ref2)], ref2), c
    outf = jax.jit(
        lambda m, v: masked_compact(m, v, K, fuse_bits=9))(d_mask, d_val9)
    for c in (0, C - 1):
        ref = val9[c][mask[c] != 0][:K]
        assert np.array_equal(np.asarray(outf[c])[: len(ref)], ref), f"fused {c}"
    outi = jax.jit(
        lambda m, v: masked_compact(m, v, K, fuse_bits=9, init_row=d_irow,
                                    init_count=d_icnt))(d_mask, d_val9)
    for c in (0, C // 2, C - 1):
        full = np.concatenate([irow[c][: icnt[c]], val9[c][mask[c] != 0]])[:K]
        got = np.asarray(outi[c])[: len(full)]
        assert np.array_equal(got, full), f"init {c}"
    print("# correctness OK (chip)", flush=True)


if __name__ == "__main__":
    main()
