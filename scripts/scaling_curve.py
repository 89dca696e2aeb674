#!/usr/bin/env python3
"""One-chip scaling-shape artifact (VERDICT r2 item 10).

Measures stage-1 encode GB/s vs chunk count C in {1,2,4,8,16,32,64} on
the real chip — the dispatch-amortization / chip-saturation curve that
stands in for multi-chip scaling efficiency until real multi-chip
hardware exists. Reference target: BASELINE >=80% scaling efficiency;
the analogue here is "how early does one chip saturate as the batch
grows" (perfect scaling = flat GB/s once past dispatch overhead).

Writes SCALING_r05.json. Honest-timing rules per
.claude/skills/verify/SKILL.md (chained content-unique iterations, D2H
sync post-warmup).
"""
import json
import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

CHUNK = 32 * 1024


def main():
    import jax
    import jax.numpy as jnp

    from cloudini_tpu.core.plan import build_plan
    from cloudini_tpu.core.types import (
        CompressionOption, EncodingInfo, EncodingOptions, FieldType, PointField,
    )
    from cloudini_tpu.io.pcd import read_pcd
    from cloudini_tpu.ops.device_codec import DeviceStage1Encoder

    _, rows = read_pcd("/root/reference/cloudini_lib/samples/lidar.pcd")
    info = EncodingInfo(
        fields=(
            PointField("x", 0, FieldType.FLOAT32, 0.001),
            PointField("y", 4, FieldType.FLOAT32, 0.001),
            PointField("z", 8, FieldType.FLOAT32, 0.001),
            PointField("intensity", 12, FieldType.FLOAT32, 0.001),
        ),
        width=rows.shape[0], height=1, point_step=16,
        encoding_opt=EncodingOptions.LOSSY, compression_opt=CompressionOption.NONE,
    )
    plan = build_plan(info)

    mult = np.int32(-1640531535)
    iota = jnp.arange(CHUNK, dtype=jnp.int32)[None, :]

    points = []
    for C in (1, 2, 4, 8, 16, 32, 64, 128):
        reps = -(-C * CHUNK // rows.shape[0])
        big = np.tile(rows, (reps, 1))[: C * CHUNK]
        chunks = big.reshape(C, CHUNK, 16)
        n_valid = np.full(C, CHUNK, dtype=np.int32)
        enc = DeviceStage1Encoder(plan, 16, chunk_points=CHUNK)
        d_rows = jax.device_put(chunks)
        d_valid = jax.device_put(n_valid)

        @jax.jit
        def mix(r, p, k):
            st = (p.astype(jnp.int32) * mult).sum() + k * np.int32(40503)
            v = (((st + iota * mult) >> 7) & 0x7F).astype(jnp.uint8)
            return r.at[:, :, 12].set(v)

        p, s = jax.block_until_ready(enc.encode_chunks(d_rows, d_valid))
        _ = np.asarray(s[:1])  # D2H sync
        rr = jax.block_until_ready(mix(d_rows, p, jnp.int32(0)))
        iters = max(6, min(48, 384 // C))
        best = float("inf")
        for trial in range(2):
            t0 = time.perf_counter()
            for i in range(iters):
                p_i, s_i = enc.encode_chunks(rr, d_valid)
                rr = mix(rr, p_i, jnp.int32(1000 * trial + i + 1))
            jax.block_until_ready((p_i, s_i, rr))
            best = min(best, (time.perf_counter() - t0) / iters)
        gbps = big.nbytes / best / 1e9
        points.append({"chunks": C, "points": C * CHUNK, "ms_per_iter":
                       round(best * 1e3, 3), "encode_gbps": round(gbps, 4)})
        print(f"# C={C}: {best*1e3:.2f} ms -> {gbps:.3f} GB/s", file=sys.stderr,
              flush=True)
        rr.delete(), p.delete()

    peak = max(pt["encode_gbps"] for pt in points)
    sat = next(pt["chunks"] for pt in points
               if pt["encode_gbps"] >= 0.8 * peak)
    out = {
        "metric": "stage1 encode GB/s vs chunk count (one chip, lidar XYZI)",
        "points": points,
        "peak_gbps": peak,
        "chunks_to_reach_80pct_of_peak": sat,
        "note": ("dispatch-amortization curve standing in for multi-chip "
                 "scaling efficiency on 1 available chip (VERDICT r2 item 10); "
                 "per-dispatch overhead = extrapolate ms_per_iter at C=1"),
    }
    (REPO / "SCALING_r05.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
