#!/usr/bin/env python3
"""Where do the ~4.6 ms/iter between encode device-busy (7.1 ms, profiler
module event) and bench wall (~11.7 ms/iter) go?

Candidates measured here, one change at a time on the headline XYZI config:
  A. bench r3 form: enc_fn + separately-jitted mix, a fresh ``jnp.int32(i)``
     device scalar created INSIDE the timed loop (a per-iter H2D on this
     tunnel);
  B. same two dispatches, but the per-iter counter scalars are device-put
     BEFORE the timed region;
  C. ONE fused jit (encode + mix in a single program) per iteration, staged
     scalars — halves the dispatch count;
  D. C plus donate_argnums on the row buffer (in-place update, no copy).
"""
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import bench  # noqa: E402  (sets the compilation-cache env)
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cloudini_tpu.core.plan import build_plan  # noqa: E402
from cloudini_tpu.core.types import (  # noqa: E402
    CompressionOption, EncodingInfo, EncodingOptions, FieldType, PointField,
)
from cloudini_tpu.ops.device_codec import DeviceStage1Encoder  # noqa: E402

MULT = np.int32(-1640531535)
ITERS = 16


def main():
    rows = bench._load_rows()
    CH, C = bench.CHUNK, bench.N_CHUNKS
    reps = -(-C * CH // rows.shape[0])
    big = np.tile(rows, (reps, 1))[: C * CH]
    chunks = big.reshape(C, CH, 16)
    nv = np.full(C, CH, np.int32)
    info = EncodingInfo(
        fields=tuple(PointField(n, 4 * i, FieldType.FLOAT32, 0.001)
                     for i, n in enumerate("xyzi")),
        width=big.shape[0], height=1, point_step=16,
        encoding_opt=EncodingOptions.LOSSY,
        compression_opt=CompressionOption.NONE)
    plan = build_plan(info)
    enc = DeviceStage1Encoder(plan, 16, chunk_points=CH)
    d_rows = jax.device_put(chunks)
    d_nv = jax.device_put(nv)
    iota = jnp.arange(CH, dtype=jnp.int32)[None, :]

    p0, s0 = jax.block_until_ready(enc.encode_chunks(d_rows, d_nv))
    np.asarray(s0[:1])  # sync (block_until_ready is a no-op before one pull)

    @jax.jit
    def mix(r, p, k):
        st = (p.astype(jnp.int32) * MULT).sum() + k * np.int32(40503)
        v = (((st + iota * MULT) >> 7) & 0x7F).astype(jnp.uint8)
        return r.at[:, :, 12].set(v)

    ks = [jax.device_put(np.int32(i + 1)) for i in range(ITERS + 1)]
    jax.block_until_ready(ks)

    # ---- A: bench r3 form (fresh jnp scalar inside the loop) ---------------
    rr = jax.block_until_ready(mix(d_rows, p0, jnp.int32(0)))
    t0 = time.perf_counter()
    for i in range(ITERS):
        p_i, s_i = enc.encode_chunks(rr, d_nv)
        rr = mix(rr, p_i, jnp.int32(i + 1))
    jax.block_until_ready((p_i, rr))
    tA = (time.perf_counter() - t0) / ITERS
    print(f"A (bench form, fresh scalar):  {tA*1e3:6.2f} ms/iter "
          f"({big.nbytes/tA/1e9:.2f} GB/s)", flush=True)
    p_i.delete(), rr.delete()

    # ---- B: staged scalars -------------------------------------------------
    rr = jax.block_until_ready(mix(d_rows, p0, ks[0]))
    t0 = time.perf_counter()
    for i in range(ITERS):
        p_i, s_i = enc.encode_chunks(rr, d_nv)
        rr = mix(rr, p_i, ks[i])
    jax.block_until_ready((p_i, rr))
    tB = (time.perf_counter() - t0) / ITERS
    print(f"B (staged scalars):            {tB*1e3:6.2f} ms/iter "
          f"({big.nbytes/tB/1e9:.2f} GB/s)", flush=True)
    p_i.delete(), rr.delete()

    # ---- C: one fused dispatch per iter ------------------------------------
    @jax.jit
    def step(r, k):
        p, s = enc._encode(r, d_nv)
        st = (p.astype(jnp.int32) * MULT).sum() + k * np.int32(40503)
        v = (((st + iota * MULT) >> 7) & 0x7F).astype(jnp.uint8)
        return r.at[:, :, 12].set(v), p, s

    rr, p_i, s_i = jax.block_until_ready(step(d_rows, ks[0]))
    t0 = time.perf_counter()
    for i in range(ITERS):
        rr, p_i, s_i = step(rr, ks[i])
    jax.block_until_ready((rr, p_i))
    tC = (time.perf_counter() - t0) / ITERS
    print(f"C (fused single dispatch):     {tC*1e3:6.2f} ms/iter "
          f"({big.nbytes/tC/1e9:.2f} GB/s)", flush=True)
    p_i.delete(), rr.delete()

    # ---- D: fused + donated row buffer -------------------------------------
    def _step_d(r, k):
        p, s = enc._encode(r, d_nv)
        st = (p.astype(jnp.int32) * MULT).sum() + k * np.int32(40503)
        v = (((st + iota * MULT) >> 7) & 0x7F).astype(jnp.uint8)
        return r.at[:, :, 12].set(v), p, s
    step_d = jax.jit(_step_d, donate_argnums=(0,))

    rr, p_i, s_i = jax.block_until_ready(step_d(jnp.asarray(d_rows), ks[0]))
    t0 = time.perf_counter()
    for i in range(ITERS):
        rr, p_i, s_i = step_d(rr, ks[i])
    jax.block_until_ready((rr, p_i))
    tD = (time.perf_counter() - t0) / ITERS
    print(f"D (fused + donated rows):      {tD*1e3:6.2f} ms/iter "
          f"({big.nbytes/tD/1e9:.2f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
