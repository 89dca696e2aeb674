"""cloudini_rosbag_converter — encode/decode PointCloud2 messages in MCAP files
(CLI equivalent of tools/src/cloudini_rosbag_converter.cpp).

Usage:
  python -m cloudini_tpu.tools.rosbag_converter -f in.mcap -c            # compress
  python -m cloudini_tpu.tools.rosbag_converter -f in.mcap -d            # decompress
  python -m cloudini_tpu.tools.rosbag_converter -f bag_dir -c --viz -s
"""

from __future__ import annotations

import argparse
import pathlib
import sys

from ..core.types import CompressionOption
from ..io.ros_msgs import parse_profile_string
from .mcap_converter import McapConverter


def _resolve_input(path: pathlib.Path):
    """Accept a .mcap file or a ROS 2 bag directory (with metadata.yaml)."""
    if path.is_dir():
        mcaps = sorted(path.glob("*.mcap"))
        if not mcaps:
            raise SystemExit(f"no .mcap file found in bag directory {path}")
        return mcaps[0], path / "metadata.yaml"
    meta = path.parent / "metadata.yaml"
    return path, (meta if meta.exists() else None)


def _rewrite_metadata(meta_in: pathlib.Path, meta_out: pathlib.Path,
                      old_name: str, new_name: str, encode: bool) -> None:
    """Swap the bag filename and message type in metadata.yaml
    (reference: cloudini_rosbag_converter.cpp:37-74)."""
    text = meta_in.read_text()
    text = text.replace(old_name, new_name)
    if encode:
        text = text.replace(
            "sensor_msgs/msg/PointCloud2", "point_cloud_interfaces/msg/CompressedPointCloud2"
        )
    else:
        text = text.replace(
            "point_cloud_interfaces/msg/CompressedPointCloud2", "sensor_msgs/msg/PointCloud2"
        )
    meta_out.write_text(text)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="cloudini_rosbag_converter",
        description="Encode/Decode PointCloud2 messages in MCAP files",
    )
    p.add_argument("-f", "--filename", required=True, help="Input .mcap file or ROS2 bag directory")
    p.add_argument("-o", "--output", help="Output file name (default: auto-generated)")
    p.add_argument("-r", "--resolution", type=float, default=0.001,
                   help="Resolution applied to floating point fields")
    p.add_argument("--profile", help='Profile string or file, e.g. "xyz:0.001; intensity:0.1; t:remove"')
    p.add_argument("-c", "--compress", action="store_true", help="PointCloud2 -> CompressedPointCloud2")
    p.add_argument("-d", "--decode", action="store_true", help="CompressedPointCloud2 -> PointCloud2")
    p.add_argument("-s", "--stats", action="store_true", help="Print compression statistics")
    p.add_argument("--viz", action="store_true",
                   help="Visualization-oriented lossy preprocessing (NaN drop, voxel dedup, 1us FLOAT64)")
    p.add_argument("-m", "--method", default="zstd", choices=["zstd", "lz4", "none"],
                   help="MCAP writer chunk compression")
    p.add_argument("-y", "--yes", action="store_true", help="Auto-confirm overwrite of files")
    p.add_argument("--device-stage2", action="store_true",
                   help="fuse stage-2 (LZ4/ZSTD per --method) into the device "
                        "encode program instead of host lib compression")
    p.add_argument("--skip-errors", action="store_true", help="Pass through messages that fail to convert")
    p.add_argument("--backend", default="auto", choices=["auto", "host", "device"],
                   help="codec backend for encoding")
    p.add_argument("--batch", type=int, default=0, metavar="N",
                   help="batch N point-cloud messages per device dispatch "
                        "(data-parallel stream encode; 0 = stream one at a time)")
    args = p.parse_args(argv)

    if args.compress == args.decode:
        p.error("exactly one of -c/--compress or -d/--decode is required")

    in_path = pathlib.Path(args.filename)
    mcap_in, meta_in = _resolve_input(in_path)
    suffix = "_encoded" if args.compress else "_decoded"
    if args.output:
        out_path = pathlib.Path(args.output)
    elif in_path.is_dir():
        out_dir = in_path.parent / (in_path.name + suffix)
        out_dir.mkdir(exist_ok=True)
        out_path = out_dir / mcap_in.name
    else:
        out_path = mcap_in.with_name(mcap_in.stem + suffix + ".mcap")
    if out_path.exists() and not args.yes:
        resp = input(f"{out_path} exists; overwrite? [y/N] ")
        if resp.strip().lower() not in ("y", "yes"):
            return 1

    conv = McapConverter()
    topics = conv.open(str(mcap_in))
    if not topics:
        print("warning: no PointCloud2/CompressedPointCloud2 topics found", file=sys.stderr)
    if args.profile:
        prof_path = pathlib.Path(args.profile)
        text = prof_path.read_text() if prof_path.exists() else args.profile
        conv.add_profile(parse_profile_string(text))

    comp = {"zstd": CompressionOption.ZSTD, "lz4": CompressionOption.LZ4,
            "none": CompressionOption.NONE}[args.method]
    if args.compress:
        stats = conv.encode_point_clouds(
            str(out_path), default_resolution=args.resolution,
            mcap_writer_compression=comp, viz_lossy=args.viz,
            on_error="skip" if args.skip_errors else "raise",
            backend=args.backend, batch_window=args.batch,
            device_stage2=args.device_stage2,
        )
    else:
        stats = conv.decode_point_clouds(str(out_path), mcap_writer_compression=comp)

    if meta_in is not None and meta_in.exists():
        _rewrite_metadata(meta_in, out_path.parent / "metadata.yaml",
                          mcap_in.name, out_path.name, args.compress)
    if args.stats:
        stats.print()
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
