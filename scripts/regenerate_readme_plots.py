#!/usr/bin/env python3
"""Regenerate the README comparison charts — equivalent of the reference's
scripts/regenerate_readme_plots.py (ZSTD-3-only baseline vs cloudini V5+ZSTD,
<=50 msgs per topic, one bar pair per bag).

Usage: python scripts/regenerate_readme_plots.py --data DATA/ [--out docs/]

Outputs compression_ratio.png and compression_time.png.
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

MAX_MSGS_PER_TOPIC = 50


def measure_bag(path: pathlib.Path) -> dict:
    import zstandard

    from cloudini_tpu.core.types import CompressionOption
    from cloudini_tpu.io.mcap import McapReader
    from cloudini_tpu.io import ros_definitions as defs
    from cloudini_tpu.io.ros_msgs import (
        apply_resolution_profile,
        convert_point_cloud2_to_compressed,
        get_deserialized_point_cloud_message,
        to_encoding_info,
    )

    reader = McapReader(str(path))
    counts: dict = {}
    baseline_bytes = cloudini_bytes = raw_bytes = 0
    baseline_s = cloudini_s = 0.0
    zc = zstandard.ZstdCompressor(level=3)
    for ch, schema, msg in reader.messages():
        if schema is None or schema.name != defs.POINTCLOUD_SCHEMA_NAME:
            continue
        counts[ch.topic] = counts.get(ch.topic, 0) + 1
        if counts[ch.topic] > MAX_MSGS_PER_TOPIC:
            continue
        raw_bytes += len(msg.data)
        t0 = time.perf_counter()
        baseline_bytes += len(zc.compress(msg.data))
        baseline_s += time.perf_counter() - t0
        t0 = time.perf_counter()
        pc = get_deserialized_point_cloud_message(msg.data)
        pc.fields = apply_resolution_profile({}, pc.fields, 0.001)
        info = to_encoding_info(pc).with_(compression_opt=CompressionOption.ZSTD)
        cloudini_bytes += len(convert_point_cloud2_to_compressed(pc, info))
        cloudini_s += time.perf_counter() - t0
    return {
        "bag": path.stem,
        "raw": raw_bytes,
        "zstd3": baseline_bytes,
        "cloudini": cloudini_bytes,
        "zstd3_s": baseline_s,
        "cloudini_s": cloudini_s,
    }


def plot(results, out_dir: pathlib.Path) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    names = [r["bag"] for r in results]
    x = np.arange(len(names))
    w = 0.38

    fig, ax = plt.subplots(figsize=(1.6 + 1.4 * len(names), 4))
    ax.bar(x - w / 2, [100.0 * r["zstd3"] / max(1, r["raw"]) for r in results], w,
           label="ZSTD-3 alone", color="#8da0cb")
    ax.bar(x + w / 2, [100.0 * r["cloudini"] / max(1, r["raw"]) for r in results], w,
           label="cloudini_tpu V5 + ZSTD", color="#66c2a5")
    ax.set_ylabel("compressed size (% of raw)")
    ax.set_xticks(x, names, rotation=20, ha="right")
    ax.legend()
    ax.set_title("Compression ratio (lower is better)")
    fig.tight_layout()
    fig.savefig(out_dir / "compression_ratio.png", dpi=120)

    fig, ax = plt.subplots(figsize=(1.6 + 1.4 * len(names), 4))
    ax.bar(x - w / 2, [r["zstd3_s"] for r in results], w,
           label="ZSTD-3 alone", color="#8da0cb")
    ax.bar(x + w / 2, [r["cloudini_s"] for r in results], w,
           label="cloudini_tpu V5 + ZSTD", color="#66c2a5")
    ax.set_ylabel("encode wall time (s)")
    ax.set_xticks(x, names, rotation=20, ha="right")
    ax.legend()
    ax.set_title("Compression time (lower is better)")
    fig.tight_layout()
    fig.savefig(out_dir / "compression_time.png", dpi=120)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True, help="directory of .mcap bags")
    ap.add_argument("--out", default=".", help="output directory for the PNGs")
    args = ap.parse_args()
    bags = sorted(pathlib.Path(args.data).glob("*.mcap"))
    if not bags:
        print(f"no .mcap files under {args.data}", file=sys.stderr)
        return 1
    results = [measure_bag(p) for p in bags]
    out_dir = pathlib.Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    plot(results, out_dir)
    for r in results:
        print(
            f"{r['bag']}: raw {r['raw']} B, zstd3 {r['zstd3']} B "
            f"({r['zstd3_s']:.2f}s), cloudini {r['cloudini']} B ({r['cloudini_s']:.2f}s)"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
