#!/usr/bin/env python3
"""Measure FSM device decode (mixed FloatN + Gorilla DDS schema) on the TPU.

Same honesty rules as bench.py: memoization-proof dependency chain (the
padding column of each iteration's input folds the previous output through a
wide-entropy hash), best-of-3 trials, no D2H in the timed loop. Correctness
gate: per-chunk device fingerprints vs the numpy kernel of truth.

Usage: python scripts/fsm_probe.py [--chunks 16] [--iters 6] [--v5]
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

CHUNK = 32 * 1024


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", type=int, default=16)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from cloudini_tpu.core.plan import build_plan
    from cloudini_tpu.core.types import (
        CompressionOption,
        EncodingInfo,
        EncodingOptions,
        FieldType,
        PointField,
    )
    from cloudini_tpu.ops.device_codec import DeviceStage1Decoder
    from cloudini_tpu.ref import stage1 as np_stage1

    C = args.chunks
    rng = np.random.default_rng(0)
    n = C * CHUNK
    pts = np.cumsum(rng.normal(0, 0.05, (n, 4)), axis=0).astype(np.float32)
    ts = (1.7e9 + np.cumsum(rng.uniform(0, 1e-4, n))).astype(np.float64)
    rows = np.zeros((n, 26), np.uint8)
    rows[:, :16] = pts.view(np.uint8).reshape(n, 16)
    rows[:, 16:18] = (np.arange(n) % 16).astype(np.uint16).reshape(-1, 1).view(np.uint8)
    rows[:, 18:26] = ts.reshape(-1, 1).view(np.uint8)

    fields = (
        PointField("x", 0, FieldType.FLOAT32, 0.001),
        PointField("y", 4, FieldType.FLOAT32, 0.001),
        PointField("z", 8, FieldType.FLOAT32, 0.001),
        PointField("intensity", 12, FieldType.FLOAT32, 0.001),
        PointField("ring", 16, FieldType.UINT16, None),
        PointField("timestamp", 18, FieldType.FLOAT64, None),
    )
    info = EncodingInfo(fields=fields, width=n, height=1, point_step=26,
                        encoding_opt=EncodingOptions.LOSSY,
                        compression_opt=CompressionOption.NONE, version=4)
    plan = build_plan(info, for_decode=True)
    eplan = build_plan(info, for_decode=False)

    chunks = rows.reshape(C, CHUNK, 26)
    from cloudini_tpu import native

    if native.available():
        mpb = eplan.max_encoded_point_bytes
        payload_list = [np.asarray(native.encode_chunk(eplan, chunks[i], mpb))
                        for i in range(C)]
    else:
        payload_list = [np_stage1.encode_chunk(eplan, chunks[i]) for i in range(C)]
    b = max(len(p) for p in payload_list) + 1
    b = -(-b // 1024) * 1024
    payloads = np.zeros((C, b), np.uint8)
    sizes = np.zeros(C, np.int32)
    for i, p in enumerate(payload_list):
        payloads[i, : len(p)] = p
        sizes[i] = len(p)
    n_valid = np.full(C, CHUNK, np.int32)
    print(f"# C={C} B={b} ({sizes.mean()/CHUNK:.2f} B/pt) raw={rows.nbytes/1e6:.1f} MB",
          file=sys.stderr)

    dec = DeviceStage1Decoder(plan, 26, chunk_points=CHUNK, max_bytes=b)
    d_pay = jax.device_put(payloads)
    d_sizes = jax.device_put(sizes)
    d_valid = jax.device_put(n_valid)
    t0 = time.perf_counter()
    out, consumed = jax.block_until_ready(dec.decode_chunks(d_pay, d_sizes, d_valid))
    print(f"# compile+first run {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    assert int(np.asarray(consumed).max()) < 2**31 - 1, "decode flagged an error"

    # correctness gate: per-chunk device fingerprints vs numpy truth
    ref_rows = np.zeros_like(chunks)
    for i in range(C):
        np_stage1.decode_chunk(plan, payload_list[i], ref_rows[i], CHUNK)

    @jax.jit
    def _fp_rows(x):
        flat = x.reshape(x.shape[0], -1).astype(jnp.int32)
        w = jnp.arange(flat.shape[1], dtype=jnp.int32) % 251 + 1
        return jnp.sum(flat * w, axis=1, dtype=jnp.int32)

    fps = np.asarray(_fp_rows(out))
    np.seterr(over="ignore")
    for i in range(C):
        flat = ref_rows[i].reshape(-1).astype(np.int32)
        w = np.arange(flat.shape[0], dtype=np.int32) % 251 + 1
        assert fps[i] == int(np.sum(flat * w, dtype=np.int32)), f"chunk {i} mismatch"
    print("# fingerprints OK", file=sys.stderr)

    _MULT = np.int32(-1640531535)

    @jax.jit
    def _mix(p, o, k):
        st = (o.reshape(o.shape[0], -1).astype(jnp.int32) * _MULT).sum() + k * np.int32(40503)
        v = (((st + jnp.arange(C, dtype=jnp.int32) * _MULT) >> 7) & 0x7F).astype(jnp.uint8)
        return p.at[:, -1].set(v)

    best = float("inf")
    for trial in range(3):
        base = jnp.int32(1000 * trial)
        pp = jax.block_until_ready(_mix(d_pay, out, base))
        t0 = time.perf_counter()
        for i in range(args.iters):
            o_i, c_i = dec.decode_chunks(pp, d_sizes, d_valid)
            pp = _mix(pp, o_i, base + jnp.int32(i + 1))
        jax.block_until_ready((o_i, c_i, pp))
        best = min(best, (time.perf_counter() - t0) / args.iters)
        o_i.delete(), pp.delete()
    gbps = rows.nbytes / best / 1e9
    print(f"# decode {best*1e3:.2f} ms/iter -> {gbps:.3f} GB/s "
          f"(host native bar: 0.640 GB/s)", file=sys.stderr)
    print(f'{{"metric": "FSM device decode (dds schema, C={C})", '
          f'"value": {gbps:.4f}, "unit": "GB/s"}}')
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
