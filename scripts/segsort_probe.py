#!/usr/bin/env python3
"""Probe: XLA sort cost vs segment length (the hybrid-compaction phase 1).

Sorting (C, B) rows costs ~log^2(B) rounds/element; reshaping to
(C*B/G, G) and sorting G-length segments should cost ~log^2(G). If real,
a Pallas merge kernel (phase 2) only has to combine pre-packed segments.
Also measures the 2-word variant (key + payload) at each G.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

C, B = 64, 262144
ITERS = 6


def _chain(fn, x0, extra, label, nel):
    mult = np.int32(-1640531535)
    iota = jnp.arange(x0.shape[-1], dtype=jnp.int32)[None, :]

    @jax.jit
    def mix(x, out, k):
        st = (out.astype(jnp.int32) * mult).sum() + k * np.int32(40503)
        return x + (((st + iota * mult) >> 9) & 0x3).astype(x.dtype)

    f = jax.jit(fn)
    out = jax.block_until_ready(f(x0))
    o0 = out if isinstance(out, jax.Array) else out[0]
    _ = np.asarray(o0[:1, :1])
    x = jax.block_until_ready(mix(x0, o0, jnp.int32(0)))
    t0 = time.perf_counter()
    for i in range(ITERS):
        out = f(x)
        o0 = out if isinstance(out, jax.Array) else out[0]
        x = mix(x, o0, jnp.int32(i + 1))
    jax.block_until_ready((out, x))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{label}: {dt*1e3:.2f} ms ({nel/dt/1e9:.2f} Gel/s)", flush=True)
    x.delete()


def main():
    rng = np.random.default_rng(0)
    key = rng.integers(0, 2**31, (C, B), dtype=np.int64).astype(np.uint32)
    val = rng.integers(0, 2**31, (C, B), dtype=np.int64).astype(np.uint32)
    d_key = jax.device_put(key)
    d_val = jax.device_put(val)

    for G in (262144, 8192, 1024, 512, 128):
        R = C * B // G

        def one(k):
            return jax.lax.sort(k.reshape(R, G), dimension=1, is_stable=False)

        _chain(one, d_key, None, f"1word_G{G}", C * B)

    for G in (262144, 1024, 128):
        R = C * B // G

        def two(k):
            s, p = jax.lax.sort(
                (k.reshape(R, G), d_val.reshape(R, G)),
                dimension=1, num_keys=1, is_stable=False)
            return s

        _chain(two, d_key, None, f"2word_G{G}", C * B)


if __name__ == "__main__":
    main()
