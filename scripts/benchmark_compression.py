#!/usr/bin/env python3
"""Batch compression benchmark over a directory of MCAP bags — equivalent of
the reference's /benchmark_compression.py (parallel converter runs + JSON
results).

Usage: python scripts/benchmark_compression.py --data DATA/ [--out results.json]
"""

from __future__ import annotations

import argparse
import concurrent.futures
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def convert_one(path: pathlib.Path, out_dir: pathlib.Path, viz: bool) -> dict:
    from cloudini_tpu.tools.mcap_converter import McapConverter

    out = out_dir / (path.stem + "_encoded.mcap")
    conv = McapConverter()
    t0 = time.perf_counter()
    topics = conv.open(str(path))
    stats = conv.encode_point_clouds(str(out), default_resolution=0.001, viz_lossy=viz)
    wall = time.perf_counter() - t0
    return {
        "file": path.name,
        "topics": topics,
        "messages": stats.processed_messages,
        "input_bytes": stats.total_input_bytes,
        "output_bytes": stats.total_output_bytes,
        "ratio": stats.total_output_bytes / max(1, stats.total_input_bytes),
        "seconds": wall,
        "file_in_bytes": path.stat().st_size,
        "file_out_bytes": out.stat().st_size,
    }


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True, help="directory of .mcap files")
    p.add_argument("--out", default="benchmark_results.json")
    p.add_argument("--viz", action="store_true")
    p.add_argument("--workers", type=int, default=4)
    args = p.parse_args()

    data = pathlib.Path(args.data)
    bags = sorted(data.glob("*.mcap"))
    if not bags:
        print(f"no .mcap files in {data}", file=sys.stderr)
        return 1
    out_dir = data / "encoded"
    out_dir.mkdir(exist_ok=True)

    results = []
    with concurrent.futures.ThreadPoolExecutor(max_workers=args.workers) as pool:
        futures = {pool.submit(convert_one, b, out_dir, args.viz): b for b in bags}
        for fut in concurrent.futures.as_completed(futures):
            r = fut.result()
            results.append(r)
            print(f"{r['file']}: ratio {r['ratio']:.3f}, {r['messages']} msgs, {r['seconds']:.1f}s")

    summary = {
        "results": sorted(results, key=lambda r: r["file"]),
        "total_input_bytes": sum(r["input_bytes"] for r in results),
        "total_output_bytes": sum(r["output_bytes"] for r in results),
    }
    pathlib.Path(args.out).write_text(json.dumps(summary, indent=2))
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
