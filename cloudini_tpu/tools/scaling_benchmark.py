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
         [--iters 10] [--devices 1,2,4,8]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def run(chunks_per_device: int, iters: int, device_counts) -> None:
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
        out = jax.block_until_ready(codec.encode(d_rows, d_valid))
        jax.tree.map(lambda x: x.delete(), out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            results = [codec.encode(d_rows, d_valid) for _ in range(iters)]
            jax.block_until_ready(results)
            best = min(best, (time.perf_counter() - t0) / iters)
            for r in results:
                jax.tree.map(lambda x: x.delete(), r)
        gbps = rows.nbytes / best / 1e9
        if base is None:
            base = gbps
        eff = gbps / (base * d / counts[0])
        print(f"{d:8d} {c:7d} {best*1e3:9.3f} {gbps:8.1f} {100*eff:10.1f}%")


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="scaling_benchmark")
    p.add_argument("--chunks-per-device", type=int, default=4)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--devices", default="1,2,4,8")
    args = p.parse_args(argv)
    run(args.chunks_per_device, args.iters, [int(x) for x in args.devices.split(",")])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
