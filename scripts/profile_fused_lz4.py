#!/usr/bin/env python3
"""Per-op device attribution of the fused stage1+LZ4 program on the EXACT
bench padded-XYZI config (compile-cache warm after a bench/run_one_cfg run).

Run: python scripts/profile_fused_lz4.py [iters]
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

import bench  # noqa: E402
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
from cloudini_tpu.ops.device_codec import DeviceStage1Encoder  # noqa: E402


def main():
    n_it = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    rows = bench._load_rows()
    CH, C = bench.CHUNK, bench.N_CHUNKS
    reps = -(-C * CH // rows.shape[0])
    big = np.tile(rows, (reps, 1))[: C * CH]
    chunks = big.reshape(C, CH, 16)
    padded = np.zeros((C, CH, 32), np.uint8)
    padded[:, :, :16] = chunks
    info = EncodingInfo(
        fields=tuple(PointField(n, 4 * i, FieldType.FLOAT32, 0.001)
                     for i, n in enumerate("xyzi")),
        width=0, height=1, point_step=32,
        encoding_opt=EncodingOptions.LOSSY, compression_opt=CompressionOption.LZ4,
    )
    eplan = build_plan(info)
    enc = DeviceStage1Encoder(eplan, 32, chunk_points=CH, stage2="lz4")
    d_rows = jax.device_put(padded)
    d_valid = jax.device_put(np.full(C, CH, np.int32))
    p0 = jax.block_until_ready(enc.encode_chunks(d_rows, d_valid))
    np.asarray(p0[1][:1])  # SYNC (SKILL.md r3)

    iota = jnp.arange(CH, dtype=jnp.int32)[None, :]
    MULT = np.int32(-1640531535)

    @jax.jit
    def mix(r, p, k):
        st = (p.astype(jnp.int32) * MULT).sum() + k * np.int32(40503)
        v = (((st + iota * MULT) >> 7) & 0x7F).astype(jnp.uint8)
        return r.at[:, :, 12].set(v)

    rr = jax.block_until_ready(mix(d_rows, p0[0], jnp.int32(0)))
    tdir = "/tmp/cldn_lz4_trace"
    import shutil

    shutil.rmtree(tdir, ignore_errors=True)
    t0 = time.perf_counter()
    with jax.profiler.trace(tdir):
        for i in range(n_it):
            p_i = enc.encode_chunks(rr, d_valid)
            rr = mix(rr, p_i[0], jnp.int32(i + 1))
        jax.block_until_ready((p_i, rr))
    wall = time.perf_counter() - t0
    print(f"fused lz4 chain: {wall/n_it*1e3:.1f} ms/iter "
          f"({padded.nbytes/(wall/n_it)/1e9:.4f} GB/s)", flush=True)

    files = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
    agg = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for f in files:
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        ev = data.get("traceEvents", [])
        dev_pids = set()
        for e in ev:
            if e.get("ph") == "M" and e.get("name") == "process_name":
                nm = e.get("args", {}).get("name", "")
                if "TPU" in nm or "/device:" in nm:
                    dev_pids.add(e["pid"])
        for e in ev:
            if e.get("ph") == "X" and e.get("pid") in dev_pids:
                agg[e.get("name", "?")] += float(e.get("dur", 0))
                cnt[e.get("name", "?")] += 1
                total += float(e.get("dur", 0))
    print(f"device total: {total/1e3/n_it:.1f} ms/iter across {len(agg)} op names")
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:30]:
        print(f"  {dur/1e3/n_it:9.2f} ms  x{cnt[name]:<6d} {name[:90]}")


if __name__ == "__main__":
    main()
