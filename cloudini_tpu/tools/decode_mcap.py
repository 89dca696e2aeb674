"""decode_mcap — example: decode every Cloudini-compressed point cloud in an
MCAP bag to structured numpy arrays, with per-message stats.

The framework's equivalent of the reference's Python example
(cloudini_py/decode_mcap.py:1-135), with the codec running natively instead
of under a WASM VM.

Usage:
  python -m cloudini_tpu.tools.decode_mcap bag.mcap [--max-messages N]
         [--backend auto|host|device] [--quiet]
"""

from __future__ import annotations

import argparse
import pathlib

from ..io.decoder_api import CloudiniDecoder
from ..io.mcap import McapReader


def decode_mcap_file(mcap_path: str, max_messages: int | None = None,
                     backend: str = "auto", quiet: bool = False) -> int:
    decoder = CloudiniDecoder(backend=backend)
    reader = McapReader(mcap_path)

    print(f"Reading MCAP file: {mcap_path}")
    msg_count = 0
    failed = 0
    raw_bytes = 0
    compressed_bytes = 0
    for channel, schema, message in reader.messages():
        if schema is None or "CompressedPointCloud2" not in schema.name:
            continue
        try:
            info, cloud = decoder.decode_message(message.data)
        except Exception as e:  # mirror the reference example: warn, continue
            print(f"Failed to decode message on {channel.topic}: {e}")
            failed += 1
        else:
            msg_count += 1
            raw_bytes += cloud.nbytes
            compressed_bytes += len(message.data)
            if not quiet:
                print(f"--- Message {msg_count} ---")
                print(f"Topic: {channel.topic}")
                print(f"Timestamp: {message.log_time / 1e9:.3f}s")
                print(f"  Fields: {', '.join(cloud.dtype.names)}")
                if len(cloud):
                    print(f"  First point: {cloud[0]}")
                print(f"  Compression ratio: {cloud.nbytes / len(message.data):.2f}x")
        if max_messages is not None and msg_count + failed >= max_messages:
            print(f"Reached max messages limit ({max_messages})")
            break

    print("=== Summary ===")
    print(f"Messages decoded: {msg_count}" + (f" (failed: {failed})" if failed else ""))
    if compressed_bytes:
        print(f"Overall ratio: {raw_bytes / compressed_bytes:.2f}x "
              f"({raw_bytes} raw / {compressed_bytes} compressed)")
    return msg_count


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="decode_mcap",
        description="Decode Cloudini-compressed point clouds from MCAP files",
    )
    p.add_argument("mcap_file")
    p.add_argument("--max-messages", type=int, default=-1,
                   help="max messages to decode (-1 = all)")
    p.add_argument("--backend", choices=["auto", "host", "device"], default="auto")
    p.add_argument("--quiet", action="store_true", help="summary only")
    args = p.parse_args(argv)
    if not pathlib.Path(args.mcap_file).exists():
        print(f"Error: MCAP file not found at {args.mcap_file}")
        return 1
    max_msgs = None if args.max_messages < 0 else args.max_messages
    decode_mcap_file(args.mcap_file, max_msgs, args.backend, args.quiet)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
