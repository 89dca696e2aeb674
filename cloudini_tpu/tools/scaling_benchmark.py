"""scaling_benchmark — data-parallel scaling efficiency of the sharded chunk
codec over a jax.sharding.Mesh (BASELINE config 4: >= 80% efficiency at
N >= 2). Weak scaling: each device gets the same number of 32Ki-point chunks;
efficiency(d) = throughput(d) / (d * throughput(1)).

On a real pod slice this measures ICI/DCN scaling; under
XLA_FLAGS=--xla_force_host_platform_device_count=N it validates the mechanism
(virtual devices share the host's cores, so efficiency numbers there reflect
CPU contention, not interconnect).

Usage:
  python -m cloudini_tpu.tools.scaling_benchmark [--chunks-per-device 4]
         [--iters 10] [--devices 1,2,4,8] [--json PATH] [--force-cpu]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def run(chunks_per_device: int, iters: int, device_counts,
        json_path: str | None = None) -> None:
    import jax

    from ..core.plan import build_plan
    from ..core.types import (
        CompressionOption,
        EncodingInfo,
        EncodingOptions,
        FieldType,
        PointField,
    )
    from ..parallel.mesh import ShardedChunkCodec, make_mesh

    chunk_points = 32 * 1024
    info = EncodingInfo(
        fields=(
            PointField("x", 0, FieldType.FLOAT32, 0.001),
            PointField("y", 4, FieldType.FLOAT32, 0.001),
            PointField("z", 8, FieldType.FLOAT32, 0.001),
            PointField("intensity", 12, FieldType.FLOAT32, 0.001),
        ),
        width=0, height=1, point_step=16,
        encoding_opt=EncodingOptions.LOSSY, compression_opt=CompressionOption.NONE,
    )
    plan = build_plan(info)
    n_avail = len(jax.devices())
    counts = [d for d in device_counts if d <= n_avail]
    rng = np.random.default_rng(0)
    base = None
    records = []
    print(f"{'devices':>8s} {'chunks':>7s} {'ms/step':>9s} {'GB/s':>8s} {'efficiency':>11s}")
    for d in counts:
        mesh = make_mesh(d)
        codec = ShardedChunkCodec(plan, 16, mesh, chunk_points=chunk_points)
        c = chunks_per_device * d
        pts = np.cumsum(rng.normal(0, 0.05, (c, chunk_points, 4)), axis=1).astype(np.float32)
        rows = np.ascontiguousarray(pts).view(np.uint8).reshape(c, chunk_points, 16)
        n_valid = np.full(c, chunk_points, np.int32)
        from jax.sharding import NamedSharding, PartitionSpec as P

        d_rows = jax.device_put(rows, NamedSharding(mesh, P("data", None, None)))
        d_valid = jax.device_put(n_valid, NamedSharding(mesh, P("data")))
        p0, s0 = jax.block_until_ready(codec.encode(d_rows, d_valid))

        # memoization-proof serialized chain (see bench.py): each iteration's
        # input folds the previous payloads through a wide-entropy hash, so
        # the remote runtime cannot serve cache hits or overlap independent
        # dispatches
        import jax.numpy as jnp

        mult = np.int32(-1640531535)
        iota = jnp.arange(chunk_points, dtype=jnp.int32)[None, :]

        @jax.jit
        def mix(r, p, k):
            st = (p.astype(jnp.int32) * mult).sum() + k * np.int32(40503)
            v = (((st + iota * mult) >> 7) & 0x7F).astype(jnp.uint8)
            return r.at[:, :, 12].set(v)

        best = float("inf")
        for trial in range(3):
            rr = jax.block_until_ready(mix(d_rows, p0, jnp.int32(1000 * trial)))
            t0 = time.perf_counter()
            for i in range(iters):
                p_i, s_i = codec.encode(rr, d_valid)
                rr = mix(rr, p_i, jnp.int32(1000 * trial + i + 1))
            jax.block_until_ready((p_i, s_i, rr))
            best = min(best, (time.perf_counter() - t0) / iters)
            for x in (rr, p_i, s_i):
                x.delete()
        p0.delete(), s0.delete()
        gbps = rows.nbytes / best / 1e9
        if base is None:
            base = gbps
        eff = gbps / (base * d / counts[0])
        print(f"{d:8d} {c:7d} {best*1e3:9.3f} {gbps:8.2f} {100*eff:10.1f}%")
        records.append({"devices": d, "chunks": c, "ms_per_step": round(best * 1e3, 3),
                        "gbps": round(gbps, 3), "efficiency_pct": round(100 * eff, 1)})
    if json_path:
        platform = jax.devices()[0].platform
        with open(json_path, "w") as f:
            json.dump({
                "metric": "weak-scaling encode over jax.sharding.Mesh (data axis)",
                "platform": platform,
                "mechanism_validation_only": platform == "cpu",
                "note": ("virtual CPU devices share host cores: efficiency "
                         "reflects CPU contention, not interconnect; the "
                         "harness emits the >=80% metric unchanged on a real "
                         "multi-chip slice") if platform == "cpu" else "",
                "rows": records,
            }, f, indent=1)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="scaling_benchmark")
    p.add_argument("--chunks-per-device", type=int, default=4)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--devices", default="1,2,4,8")
    p.add_argument("--json", default=None, help="write rows to this JSON file")
    p.add_argument("--force-cpu", action="store_true",
                   help="force the CPU platform (use with "
                        "XLA_FLAGS=--xla_force_host_platform_device_count=N)")
    args = p.parse_args(argv)
    if args.force_cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    run(args.chunks_per_device, args.iters,
        [int(x) for x in args.devices.split(",")], args.json)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
