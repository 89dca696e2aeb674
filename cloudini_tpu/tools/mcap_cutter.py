"""mcap_cutter — truncate a bag to at most N messages per channel
(equivalent of tools/src/mcap_cutter.cpp).

Usage: python -m cloudini_tpu.tools.mcap_cutter -f in.mcap -o out.mcap -n 50
"""

from __future__ import annotations

import argparse
from collections import defaultdict

from ..io.mcap import McapReader, McapWriter


def cut(file_in: str, file_out: str, max_per_channel: int) -> int:
    reader = McapReader(file_in)
    writer = McapWriter(file_out, profile=reader.profile, compression="zstd")
    schema_map = {}
    for sid in sorted(reader.schemas):
        s = reader.schemas[sid]
        schema_map[sid] = writer.add_schema(s.name, s.encoding, s.data)
    schema_map[0] = 0  # schema-less channels stay schema-less
    chan_map = {}
    for cid in sorted(reader.channels):
        c = reader.channels[cid]
        chan_map[cid] = writer.add_channel(c.topic, c.message_encoding, schema_map[c.schema_id], c.metadata)
    for md in reader.metadata:
        writer.write_metadata(md.name, md.metadata)

    counts = defaultdict(int)
    written = 0
    for ch, _schema, msg in reader.messages():
        if counts[msg.channel_id] >= max_per_channel:
            continue
        counts[msg.channel_id] += 1
        writer.write_message(chan_map[msg.channel_id], msg.log_time, msg.data,
                             msg.publish_time, msg.sequence)
        written += 1
    writer.close()
    return written


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="mcap_cutter")
    p.add_argument("-f", "--filename", required=True)
    p.add_argument("-o", "--output", required=True)
    p.add_argument("-n", "--max-messages", type=int, default=50)
    args = p.parse_args(argv)
    n = cut(args.filename, args.output, args.max_messages)
    print(f"wrote {n} messages to {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
