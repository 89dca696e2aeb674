"""mcap_header_inspector — dump the Cloudini headers found inside a bag's
CompressedPointCloud2 messages (equivalent of tools/src/mcap_header_inspector.cpp).

Usage: python -m cloudini_tpu.tools.mcap_header_inspector -f bag.mcap [-n 5]
"""

from __future__ import annotations

import argparse

from ..core.header import decode_header, encoding_info_to_yaml
from ..io import ros_definitions as defs
from ..io.mcap import McapReader
from ..io.ros_msgs import get_deserialized_point_cloud_message


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="mcap_header_inspector")
    p.add_argument("-f", "--filename", required=True)
    p.add_argument("-n", "--max-per-topic", type=int, default=1)
    args = p.parse_args(argv)

    reader = McapReader(args.filename)
    seen = {}
    for ch, schema, msg in reader.messages():
        if schema is None or schema.name != defs.COMPRESSED_SCHEMA_NAME:
            continue
        if seen.get(ch.topic, 0) >= args.max_per_topic:
            continue
        seen[ch.topic] = seen.get(ch.topic, 0) + 1
        pc = get_deserialized_point_cloud_message(msg.data)
        info, _ = decode_header(pc.data)
        print(f"=== topic {ch.topic} (log_time {msg.log_time}) ===")
        print(encoding_info_to_yaml(info))
    if not seen:
        print("no CompressedPointCloud2 messages found")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
