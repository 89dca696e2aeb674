"""pcd_to_cloudini_converter — PCD file(s) -> .cldn streams (equivalent of
tools/src/pcd_to_cloudini_converter.cpp) and back.

Usage:
  python -m cloudini_tpu.tools.pcd_converter -f cloud.pcd [-o out.cldn]
         [-r 0.001] [--encoding LOSSY] [--compression ZSTD]
  python -m cloudini_tpu.tools.pcd_converter -d -f cloud.cldn -o out.pcd
"""

from __future__ import annotations

import argparse
import pathlib

from ..codec.pipeline import PointcloudDecoder, PointcloudEncoder
from ..core.header import decode_header
from ..core.types import CompressionOption, EncodingOptions, FieldType, PointField
from ..io.pcd import read_pcd, write_pcd


def encode_file(path: pathlib.Path, out: pathlib.Path, resolution: float,
                encoding: str, compression: str, backend: str) -> None:
    schema, rows = read_pcd(str(path))
    fields = tuple(
        PointField(f.name, f.offset, f.type,
                   resolution if f.type == FieldType.FLOAT32 else None)
        for f in schema.fields
    )
    info = schema.with_(
        fields=fields,
        encoding_opt=EncodingOptions[encoding],
        compression_opt=CompressionOption[compression],
    )
    stream = PointcloudEncoder(info, backend=backend).encode(rows)
    out.write_bytes(stream)
    print(f"{path} -> {out}: {rows.nbytes} -> {len(stream)} bytes "
          f"(ratio {rows.nbytes/len(stream):.2f})")


def decode_file(path: pathlib.Path, out: pathlib.Path, backend: str,
                pcd_compressed: bool = False) -> None:
    stream = path.read_bytes()
    info, hlen = decode_header(stream)
    rows = PointcloudDecoder(backend=backend).decode(info, stream[hlen:])
    write_pcd(str(out), info, rows, compressed=pcd_compressed)
    print(f"{path} -> {out}: {len(stream)} -> {rows.nbytes} bytes")


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="pcd_to_cloudini_converter")
    p.add_argument("-f", "--filename", required=True, help="input .pcd/.cldn file or directory")
    p.add_argument("-o", "--output", help="output path (default: swap extension)")
    p.add_argument("-d", "--decode", action="store_true", help=".cldn -> .pcd")
    p.add_argument("-r", "--resolution", type=float, default=0.001)
    p.add_argument("--encoding", choices=["LOSSY", "LOSSLESS", "NONE"], default="LOSSY")
    p.add_argument("--compression", choices=["ZSTD", "LZ4", "NONE"], default="ZSTD")
    p.add_argument("--backend", choices=["auto", "host", "device"], default="auto")
    p.add_argument("--pcd-compressed", action="store_true",
                   help="write decoded PCDs as DATA binary_compressed (PCL SOA+LZF)")
    args = p.parse_args(argv)

    src = pathlib.Path(args.filename)
    files = sorted(src.glob("*.pcd" if not args.decode else "*.cldn")) if src.is_dir() else [src]
    suffix = ".pcd" if args.decode else ".cldn"
    out_arg = pathlib.Path(args.output) if args.output else None
    for f in files:
        if out_arg is None:
            out = f.with_suffix(suffix)
        elif src.is_dir():
            # --output names a DIRECTORY in batch mode: one output per input
            # (a single file path would silently overwrite all but the last)
            out_arg.mkdir(parents=True, exist_ok=True)
            out = out_arg / f.with_suffix(suffix).name
        else:
            out = out_arg
        if args.decode:
            decode_file(f, out, args.backend, args.pcd_compressed)
        else:
            encode_file(f, out, args.resolution, args.encoding, args.compression, args.backend)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
