#!/usr/bin/env python3
"""Per-op attribution of the stage-1 device encode (and optionally decode) on
the real TPU, using jax.profiler + the memoization-proof dependency chain from
bench.py. Parses the dumped trace and prints the top ops by device time.

Usage: python scripts/profile_encode.py [encode|decode|fsm|gorilla|zstd|lz4] [n_chunks] [iters]
"""

import glob
import gzip
import json
import pathlib
import sys
import time
from collections import defaultdict

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

MULT = np.int32(-1640531535)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "encode"
    C = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    n_it = int(sys.argv[3]) if len(sys.argv) > 3 else 6
    CH = 32 * 1024
    n = C * CH
    rng = np.random.default_rng(0)
    if which in ("fsm", "gorilla"):
        # the DDS mixed schema (FloatN + ring INT_DELTA + f64 Gorilla):
        # "fsm" profiles the FSM decode path, "gorilla" the device ENCODE
        # (scan-based window chain — the pending auto-flip measurement)
        step = 26
        fields = tuple(
            PointField(nm, 4 * i, FieldType.FLOAT32, 0.001) for i, nm in enumerate("xyzi")
        ) + (
            PointField("ring", 16, FieldType.UINT16, None),
            PointField("timestamp", 18, FieldType.FLOAT64, None),
        )
        pts = np.cumsum(rng.normal(0, 0.05, (n, 4)), axis=0).astype(np.float32)
        ts = (1.7e9 + np.cumsum(rng.uniform(0, 1e-4, n))).astype(np.float64)
        rows_h = np.zeros((n, step), np.uint8)
        rows_h[:, :16] = pts.view(np.uint8).reshape(n, 16)
        rows_h[:, 16:18] = (np.arange(n) % 16).astype(np.uint16).reshape(-1, 1).view(np.uint8)
        rows_h[:, 18:26] = ts.reshape(-1, 1).view(np.uint8)
        rows_h = rows_h.reshape(C, CH, step)
    else:
        step = 16
        fields = tuple(
            PointField(nm, 4 * i, FieldType.FLOAT32, 0.001) for i, nm in enumerate("xyzi")
        )
        pts = np.cumsum(rng.normal(0, 0.05, (n, 4)), axis=1).astype(np.float32)
        rows_h = np.ascontiguousarray(pts).view(np.uint8).reshape(C, CH, step)
    info = EncodingInfo(
        fields=fields, width=n, height=1, point_step=step,
        encoding_opt=EncodingOptions.LOSSY, compression_opt=CompressionOption.NONE,
        version=4,
    )
    plan = build_plan(info)
    rows = jax.device_put(jnp.asarray(rows_h))
    nv = jnp.full(C, CH, jnp.int32)

    if which == "fsm":
        # host-encode (device Gorilla encode is not the target here)
        from cloudini_tpu.ref import stage1 as np_stage1

        eplan = build_plan(info, for_decode=False)
        plist = [np_stage1.encode_chunk(eplan, rows_h[i]) for i in range(C)]
        b_act = int(-(-(max(len(x) for x in plist) + 1) // 1024) * 1024)
        p_h = np.zeros((C, b_act), np.uint8)
        s_h = np.zeros(C, np.int32)
        for i, x in enumerate(plist):
            p_h[i, : len(x)] = x
            s_h[i] = len(x)
        p = jax.device_put(p_h)
        s = jax.device_put(s_h)
        dplan = build_plan(info, for_decode=True)
        dec = DeviceStage1Decoder(dplan, step, chunk_points=CH, max_bytes=b_act)
        pt = p
        o, _c = jax.block_until_ready(dec.decode_chunks(pt, s, nv))
        which = "decode"
        enc = None
    elif which in ("zstd", "lz4", "gorilla"):
        # fused stage-1 (+ device stage-2 for zstd/lz4): ENCODE chain only
        s2 = "none" if which == "gorilla" else which
        enc = DeviceStage1Encoder(plan, step, chunk_points=CH, stage2=s2)
        p, s = jax.block_until_ready(enc.encode_chunks(rows, nv))
        o = p
        which = "encode"
        dec = None
    else:
        enc = DeviceStage1Encoder(plan, step, chunk_points=CH)
        p, s = jax.block_until_ready(enc.encode_chunks(rows, nv))
        s_h = np.asarray(s)
        b_act = int(-(-(int(s_h.max()) + 1) // 1024) * 1024)
        dec = DeviceStage1Decoder(plan, step, chunk_points=CH, max_bytes=b_act)
    if enc is not None and dec is not None:
        pt = jax.block_until_ready(jax.jit(lambda p: p[:, :b_act])(p))
        o, _c = jax.block_until_ready(dec.decode_chunks(pt, s, nv))

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
        # perturb only the PADDING column (max_bytes exceeds every real
        # size): contents change every iteration — the memoizer must
        # re-execute — but the streams stay VALID, so the timed decode is
        # the hot no-NaN path, not the corrupt-stream reset path
        return p.at[:, -1].set(v)

    tdir = "/tmp/cldn_trace"
    import contextlib
    import os
    import shutil

    shutil.rmtree(tdir, ignore_errors=True)
    no_trace = bool(os.environ.get("CLDN_NO_TRACE"))
    t0 = time.perf_counter()
    with contextlib.nullcontext() if no_trace else jax.profiler.trace(tdir):
        if which == "encode":
            t_m = time.perf_counter()
            rr = jax.block_until_ready(mix_r(rows, p, jnp.int32(0)))
            print(f"  mix_r first call (compile): {time.perf_counter()-t_m:.2f} s", flush=True)
            for i in range(n_it):
                t_i = time.perf_counter()
                p_i, s_i = enc.encode_chunks(rr, nv)
                rr = mix_r(rr, p_i, jnp.int32(i + 1))
                jax.block_until_ready((p_i, s_i, rr))
                print(f"  iter {i}: {time.perf_counter()-t_i:.3f} s", flush=True)
        else:
            pp = jax.block_until_ready(mix_p(pt, o, jnp.int32(0)))
            for i in range(n_it):
                o_i, c_i = dec.decode_chunks(pp, s, nv)
                pp = mix_p(pp, o_i, jnp.int32(i + 1))
            jax.block_until_ready((o_i, c_i, pp))
    wall = time.perf_counter() - t0
    print(f"{which} chain: {wall/n_it*1e3:.2f} ms/iter ({rows_h.nbytes/(wall/n_it)/1e9:.3f} GB/s)")

    if no_trace:
        return
    # ---- parse trace: aggregate device-track event durations by op name
    files = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
    assert files, f"no trace files under {tdir}"
    agg = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for f in files:
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        ev = data.get("traceEvents", [])
        # find TPU device pids (track names containing 'TPU' / 'XLA Ops')
        dev_pids = set()
        for e in ev:
            if e.get("ph") == "M" and e.get("name") == "process_name":
                nm = e.get("args", {}).get("name", "")
                if "TPU" in nm or "/device:" in nm:
                    dev_pids.add(e["pid"])
        for e in ev:
            if e.get("ph") == "X" and e.get("pid") in dev_pids:
                name = e.get("name", "?")
                dur = float(e.get("dur", 0))
                agg[name] += dur
                cnt[name] += 1
                total += dur
    print(f"device total: {total/1e3/n_it:.2f} ms/iter across {len(agg)} op names")
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:70]:
        print(f"  {dur/1e3/n_it:9.3f} ms  x{cnt[name]:<4d} {name[:90]}")


if __name__ == "__main__":
    main()
