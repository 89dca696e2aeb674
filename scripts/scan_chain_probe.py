#!/usr/bin/env python3
"""Is the bench per-iteration wall dominated by per-dispatch tunnel RTT?

Runs the SAME content-unique dependency chain as bench._chain_encode two
ways on the headline XYZI config:
  * dispatched: one encode_chunks + mix call pair per iteration (bench r3
    methodology) — wall includes a tunnel round trip per iteration;
  * scanned: the whole chain inside ONE jitted lax.scan — a single
    dispatch, device-resident; per-iter wall is pure device time.
The difference is the dispatch overhead the chip never sees. Decode gets
the same treatment.
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
from cloudini_tpu.ops.device_codec import (  # noqa: E402
    DeviceStage1Decoder, DeviceStage1Encoder,
)

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
    np.asarray(s0[:1])  # sync the stream (block_until_ready no-op before)

    # ---- encode: dispatched chain (bench r3 form) --------------------------
    @jax.jit
    def mix_r(r, p, k):
        st = (p.astype(jnp.int32) * MULT).sum() + k * np.int32(40503)
        v = (((st + iota * MULT) >> 7) & 0x7F).astype(jnp.uint8)
        return r.at[:, :, 12].set(v)

    rr = jax.block_until_ready(mix_r(d_rows, p0, jnp.int32(0)))
    t0 = time.perf_counter()
    for i in range(ITERS):
        p_i, s_i = enc.encode_chunks(rr, d_nv)
        rr = mix_r(rr, p_i, jnp.int32(i + 1))
    jax.block_until_ready((p_i, rr))
    disp = (time.perf_counter() - t0) / ITERS
    print(f"encode dispatched: {disp*1e3:.2f} ms/iter "
          f"({big.nbytes/disp/1e9:.2f} GB/s)", flush=True)
    p_i.delete(), rr.delete()

    # ---- encode: ONE-dispatch scanned chain --------------------------------
    @jax.jit
    def chain_enc(r, base):
        def body(rc, k):
            p, s = enc._encode(rc, d_nv)
            st = (p.astype(jnp.int32) * MULT).sum() + base + k * np.int32(40503)
            v = (((st + iota * MULT) >> 7) & 0x7F).astype(jnp.uint8)
            return rc.at[:, :, 12].set(v), s[0]
        rN, s0s = jax.lax.scan(body, r, jnp.arange(ITERS, dtype=jnp.int32))
        return rN, s0s

    rN, ss = jax.block_until_ready(chain_enc(d_rows, jnp.int32(7)))  # compile
    t0 = time.perf_counter()
    rN2, ss2 = chain_enc(d_rows, jnp.int32(1007))
    jax.block_until_ready((rN2, ss2))
    scan_t = (time.perf_counter() - t0) / ITERS
    print(f"encode scanned:    {scan_t*1e3:.2f} ms/iter "
          f"({big.nbytes/scan_t/1e9:.2f} GB/s)  [dispatch overhead "
          f"{max(disp-scan_t,0)*1e3:.1f} ms/iter]", flush=True)
    rN.delete(), rN2.delete()

    # ---- decode: both forms -------------------------------------------------
    s_h = np.asarray(s0)
    b_act = int(-(-(int(s_h.max()) + 1) // 1024) * 1024)
    pt = jax.block_until_ready(jax.jit(lambda p: p[:, :b_act])(p0))
    dec = DeviceStage1Decoder(plan, 16, chunk_points=CH, max_bytes=b_act,
                              raw_words_out=True)
    o0, c0 = jax.block_until_ready(dec.decode_chunks(pt, s0, d_nv))

    @jax.jit
    def mix_p(p, o, k):
        st = (o.astype(jnp.int32) * MULT).sum() + k * np.int32(40503)
        v = (((st + jnp.arange(C, dtype=jnp.int32) * MULT) >> 7) & 0x7F).astype(jnp.uint8)
        return p.at[:, -1].set(v)

    pp = jax.block_until_ready(mix_p(pt, o0, jnp.int32(0)))
    t0 = time.perf_counter()
    for i in range(ITERS):
        o_i, c_i = dec.decode_chunks(pp, s0, d_nv)
        pp = mix_p(pp, o_i, jnp.int32(i + 1))
    jax.block_until_ready((o_i, pp))
    disp_d = (time.perf_counter() - t0) / ITERS
    print(f"decode dispatched: {disp_d*1e3:.2f} ms/iter "
          f"({big.nbytes/disp_d/1e9:.2f} GB/s)", flush=True)
    o_i.delete(), pp.delete()

    body_fn = dec._fn if hasattr(dec, "_fn") else dec.decode_chunks

    @jax.jit
    def chain_dec(p, base):
        def body(pc, k):
            o, cns = body_fn(pc, s0, d_nv)
            st = (o.astype(jnp.int32) * MULT).sum() + base + k * np.int32(40503)
            v = (((st + jnp.arange(C, dtype=jnp.int32) * MULT) >> 7) & 0x7F).astype(jnp.uint8)
            return pc.at[:, -1].set(v), cns[0]
        pN, cs = jax.lax.scan(body, p, jnp.arange(ITERS, dtype=jnp.int32))
        return pN, cs

    pN, cs = jax.block_until_ready(chain_dec(pt, jnp.int32(7)))
    t0 = time.perf_counter()
    pN2, cs2 = chain_dec(pt, jnp.int32(1007))
    jax.block_until_ready((pN2, cs2))
    scan_d = (time.perf_counter() - t0) / ITERS
    print(f"decode scanned:    {scan_d*1e3:.2f} ms/iter "
          f"({big.nbytes/scan_d/1e9:.2f} GB/s)  [dispatch overhead "
          f"{max(disp_d-scan_d,0)*1e3:.1f} ms/iter]", flush=True)
    rt = big.nbytes / (scan_t + scan_d) / 1e9
    print(f"round-trip (scanned): {rt:.3f} GB/s", flush=True)


if __name__ == "__main__":
    main()
