#!/usr/bin/env python3
"""Memoization-proof TPU timing of the stage-1 codec (see bench.py for the
methodology: wide-entropy dependency chains; the remote runtime caches
executions by argument contents and under-reports batched dispatches).

Usage: python scripts/perf_probe.py [n_chunks] [iters]
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cloudini_tpu.core.plan import build_plan  # noqa: E402
from cloudini_tpu.core.types import (  # noqa: E402
    CompressionOption,
    EncodingInfo,
    EncodingOptions,
    FieldType,
    PointField,
)
from cloudini_tpu.ops.device_codec import (  # noqa: E402
    DeviceStage1Decoder,
    DeviceStage1Encoder,
)
from cloudini_tpu.ref import stage1 as np_stage1  # noqa: E402

MULT = np.int32(-1640531535)


def main():
    C = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n_it = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    CH = 32 * 1024
    n = C * CH
    rng = np.random.default_rng(0)
    fields = tuple(
        PointField(nm, 4 * i, FieldType.FLOAT32, 0.001) for i, nm in enumerate("xyzi")
    )
    info = EncodingInfo(
        fields=fields, width=n, height=1, point_step=16,
        encoding_opt=EncodingOptions.LOSSY, compression_opt=CompressionOption.NONE,
        version=4,
    )
    plan = build_plan(info)
    pts = np.cumsum(rng.normal(0, 0.05, (n, 4)), axis=1).astype(np.float32)
    rows_h = np.ascontiguousarray(pts).view(np.uint8).reshape(C, CH, 16)
    rows = jax.device_put(jnp.asarray(rows_h))
    nv = jnp.full(C, CH, jnp.int32)

    t_start = time.perf_counter()

    def stamp(msg):
        print(f"[{time.perf_counter()-t_start:7.1f}s] {msg}", flush=True)

    enc = DeviceStage1Encoder(plan, 16, chunk_points=CH)
    stamp("compiling encode...")
    p, s = jax.block_until_ready(enc.encode_chunks(rows, nv))
    stamp("encode ready")
    # size the decoder like the pipeline: actual max chunk size (1 KiB buckets)
    s_h = np.asarray(s)
    b_act = int(-(-(int(s_h.max()) + 1) // 1024) * 1024)
    dec = DeviceStage1Decoder(plan, 16, chunk_points=CH, max_bytes=b_act)
    trim = jax.jit(lambda p: p[:, :b_act])
    pt = jax.block_until_ready(trim(p))
    stamp("compiling decode...")
    o, c = jax.block_until_ready(dec.decode_chunks(pt, s, nv))
    stamp("decode ready")

    # correctness gate via device-side wrapping fingerprints (pulling whole
    # buffers is prohibitive: D2H here is ~40 KB/s)
    np.seterr(over="ignore")
    want = np_stage1.encode_chunk(plan, rows_h[0])
    assert int(s_h[0]) == len(want), "encode size mismatch"

    def fp_dev(a):  # int32 wrapping weighted sum, computed on device
        flat = a.reshape(-1).astype(jnp.int32)
        w = (jnp.arange(flat.shape[0], dtype=jnp.int32) % 251 + 1)
        return int(jnp.sum(flat * w, dtype=jnp.int32))

    def fp_host(a):
        flat = a.reshape(-1).astype(np.int32)
        w = (np.arange(flat.shape[0], dtype=np.int32) % 251 + 1)
        return int(np.sum(flat * w, dtype=np.int32))

    assert fp_dev(p[0, : len(want)]) == fp_host(want), "encode wire mismatch"
    ref = np.zeros_like(rows_h[0])
    np_stage1.decode_chunk(build_plan(info, for_decode=True), want, ref, CH)
    assert fp_dev(o[0]) == fp_host(ref), "decode mismatch"
    stamp("correctness ok")

    iota = jnp.arange(CH, dtype=jnp.int32)[None, :]

    @jax.jit
    def mix_r(r, big, k):
        st = (big.astype(jnp.int32) * MULT).sum() + k * np.int32(40503)
        v = (((st + iota * MULT) >> 7) & 0x7F).astype(jnp.uint8)
        return r.at[:, :, 12].set(v)

    @jax.jit
    def mix_p(p, big, k):
        st = (big.astype(jnp.int32) * MULT).sum() + k * np.int32(40503)
        v = (((st + jnp.arange(C, dtype=jnp.int32) * MULT) >> 7) & 0x7F).astype(jnp.uint8)
        return p.at[:, -1].set(v)  # padding column: content-unique yet stream-valid

    stamp("timing encode chain...")
    rr = jax.block_until_ready(mix_r(rows, p, jnp.int32(0)))
    t0 = time.perf_counter()
    for i in range(n_it):
        p_i, s_i = enc.encode_chunks(rr, nv)
        rr = mix_r(rr, p_i, jnp.int32(i + 1))
    jax.block_until_ready((p_i, s_i, rr))
    te = (time.perf_counter() - t0) / n_it

    stamp("timing decode chain...")
    pp = jax.block_until_ready(mix_p(pt, o, jnp.int32(0)))
    t0 = time.perf_counter()
    for i in range(n_it):
        o_i, c_i = dec.decode_chunks(pp, s, nv)
        pp = mix_p(pp, o_i, jnp.int32(i + 1))
    jax.block_until_ready((o_i, c_i, pp))
    td = (time.perf_counter() - t0) / n_it

    nbytes = rows_h.nbytes
    print(
        f"C={C} raw={nbytes/2**20:.1f}MiB B_act={b_act} | "
        f"enc {te*1e3:.2f} ms ({nbytes/te/1e9:.3f} GB/s) | "
        f"dec {td*1e3:.2f} ms ({nbytes/td/1e9:.3f} GB/s)"
    )


if __name__ == "__main__":
    main()
