"""Minimal MCAP container reader/writer (public spec: mcap.dev/spec).

Host IO for rosbag-style streams — the framework's equivalent of the
reference's vendored mcap C++ library usage (tools/src/mcap_converter.cpp).
Supports:
  * reading chunked (zstd / lz4 / uncompressed) and unchunked files,
    with CRC validation of chunk payloads
  * writing chunked files (2 MiB chunks by default) with schemas, channels,
    statistics, chunk indexes, summary offsets and a spec-compliant footer

This is deliberately a small, dependency-light implementation: enough for the
batch converter, benchmark, cutter and inspector tools; not a general MCAP
SDK.
"""

from __future__ import annotations

import io
import struct
import zlib
from dataclasses import dataclass, field
from typing import Dict, Iterator, List, Optional, Tuple

MAGIC = b"\x89MCAP0\r\n"

OP_HEADER = 0x01
OP_FOOTER = 0x02
OP_SCHEMA = 0x03
OP_CHANNEL = 0x04
OP_MESSAGE = 0x05
OP_CHUNK = 0x06
OP_MESSAGE_INDEX = 0x07
OP_CHUNK_INDEX = 0x08
OP_ATTACHMENT = 0x09
OP_ATTACHMENT_INDEX = 0x0A
OP_STATISTICS = 0x0B
OP_METADATA = 0x0C
OP_METADATA_INDEX = 0x0D
OP_SUMMARY_OFFSET = 0x0E
OP_DATA_END = 0x0F


@dataclass
class Schema:
    id: int
    name: str
    encoding: str
    data: bytes


@dataclass
class Channel:
    id: int
    schema_id: int
    topic: str
    message_encoding: str
    metadata: Dict[str, str] = field(default_factory=dict)


@dataclass
class Message:
    channel_id: int
    sequence: int
    log_time: int
    publish_time: int
    data: bytes


@dataclass
class Metadata:
    name: str
    metadata: Dict[str, str]


# ----------------------------------------------------------------- primitives


def _read_str(buf: memoryview, pos: int) -> Tuple[str, int]:
    (n,) = struct.unpack_from("<I", buf, pos)
    return bytes(buf[pos + 4 : pos + 4 + n]).decode("utf-8"), pos + 4 + n


def _read_map(buf: memoryview, pos: int) -> Tuple[Dict[str, str], int]:
    (total,) = struct.unpack_from("<I", buf, pos)
    pos += 4
    end = pos + total
    out = {}
    while pos < end:
        k, pos = _read_str(buf, pos)
        v, pos = _read_str(buf, pos)
        out[k] = v
    return out, pos


def _pack_str(s: str) -> bytes:
    raw = s.encode("utf-8")
    return struct.pack("<I", len(raw)) + raw


def _pack_map(m: Dict[str, str]) -> bytes:
    body = b"".join(_pack_str(k) + _pack_str(v) for k, v in m.items())
    return struct.pack("<I", len(body)) + body


def _record(op: int, content: bytes) -> bytes:
    return struct.pack("<BQ", op, len(content)) + content


# ----------------------------------------------------------------- reader


class McapReader:
    """Loads schemas/channels and iterates messages in file order."""

    def __init__(self, path_or_bytes):
        if isinstance(path_or_bytes, (bytes, bytearray, memoryview)):
            self._data = memoryview(bytes(path_or_bytes))
        else:
            with open(path_or_bytes, "rb") as f:
                self._data = memoryview(f.read())
        if self._data[: len(MAGIC)] != MAGIC:
            raise ValueError("not an MCAP file (bad magic)")
        self.profile = ""
        self.library = ""
        self.schemas: Dict[int, Schema] = {}
        self.channels: Dict[int, Channel] = {}
        self.metadata: List[Metadata] = []
        self._message_locs: List[Tuple[int, int, bool]] = []  # (offset, length, in_chunk)
        self._scan()

    # -- record iteration -----------------------------------------------------

    def _iter_records(self, buf: memoryview, pos: int, end: int):
        while pos + 9 <= end:
            op = buf[pos]
            (length,) = struct.unpack_from("<Q", buf, pos + 1)
            content_start = pos + 9
            yield op, content_start, content_start + length
            pos = content_start + length

    def _scan(self) -> None:
        buf = self._data
        end = len(buf)
        # First pass never decompresses chunks: schema/channel records written
        # by conformant writers (including McapWriter) are repeated
        # uncompressed in the summary section, which this top-level walk
        # reaches anyway. Decompressing every chunk here doubled the dominant
        # cost of reading a compressed bag (messages() decompresses again).
        chunks_seen = False
        for op, s, e in self._iter_records(buf, len(MAGIC), end):
            if op == OP_CHUNK:
                chunks_seen = True
            else:
                self._handle_record(buf, op, s, e, top_level=False)
            if op == OP_FOOTER:
                break
        if chunks_seen and not self.channels:
            # summaryless bag whose schema/channel records live inside chunks
            for op, s, e in self._iter_records(buf, len(MAGIC), end):
                if op == OP_CHUNK:
                    self._handle_record(buf, op, s, e, top_level=True)
                elif op == OP_FOOTER:
                    break

    def _handle_record(self, buf, op, s, e, top_level: bool) -> None:
        if op == OP_HEADER:
            self.profile, pos = _read_str(buf, s)
            self.library, _ = _read_str(buf, pos)
        elif op == OP_SCHEMA:
            (sid,) = struct.unpack_from("<H", buf, s)
            name, pos = _read_str(buf, s + 2)
            encoding, pos = _read_str(buf, pos)
            (dlen,) = struct.unpack_from("<I", buf, pos)
            data = bytes(buf[pos + 4 : pos + 4 + dlen])
            self.schemas.setdefault(sid, Schema(sid, name, encoding, data))
        elif op == OP_CHANNEL:
            (cid, sid) = struct.unpack_from("<HH", buf, s)
            topic, pos = _read_str(buf, s + 4)
            message_encoding, pos = _read_str(buf, pos)
            metadata, _ = _read_map(buf, pos)
            self.channels.setdefault(cid, Channel(cid, sid, topic, message_encoding, metadata))
        elif op == OP_MESSAGE:
            self._message_locs.append((s, e - s, False))
        elif op == OP_METADATA:
            name, pos = _read_str(buf, s)
            md, _ = _read_map(buf, pos)
            self.metadata.append(Metadata(name, md))
        elif op == OP_CHUNK and top_level:
            # scan pass only collects schemas/channels; messages() re-walks
            inner = memoryview(self._decompress_chunk(buf, s, e))
            for iop, is_, ie in self._iter_records(inner, 0, len(inner)):
                if iop != OP_MESSAGE:
                    self._handle_record(inner, iop, is_, ie, top_level=False)

    def _decompress_chunk(self, buf, s, e) -> bytes:
        (msg_start, msg_end, usize) = struct.unpack_from("<QQQ", buf, s)
        (ucrc,) = struct.unpack_from("<I", buf, s + 24)
        compression, pos = _read_str(buf, s + 28)
        (rsize,) = struct.unpack_from("<Q", buf, pos)
        records = bytes(buf[pos + 8 : pos + 8 + rsize])
        if compression == "zstd":
            import zstandard

            records = zstandard.ZstdDecompressor().decompress(records, max_output_size=usize or len(records) * 64)
        elif compression == "lz4":
            from ..codec.stage2 import decompress_chunk
            from ..core.types import CompressionOption

            records = decompress_chunk(CompressionOption.LZ4, records, usize)
        elif compression not in ("", "none"):
            raise ValueError(f"unsupported MCAP chunk compression: {compression!r}")
        if ucrc and zlib.crc32(records) != ucrc:
            raise ValueError("MCAP chunk CRC mismatch")
        return records

    def messages(self) -> Iterator[Tuple[Channel, Optional[Schema], Message]]:
        """Iterate all messages in file order (re-walks chunks lazily)."""
        buf = self._data
        for op, s, e in self._iter_records(buf, len(MAGIC), len(buf)):
            if op == OP_MESSAGE:
                yield self._parse_message(buf, s, e)
            elif op == OP_CHUNK:
                inner = memoryview(self._decompress_chunk(buf, s, e))
                for iop, is_, ie in self._iter_records(inner, 0, len(inner)):
                    if iop == OP_MESSAGE:
                        yield self._parse_message(inner, is_, ie)
            elif op == OP_DATA_END:
                break

    def _parse_message(self, buf, s, e):
        (cid, seq, log_time, pub_time) = struct.unpack_from("<HIQQ", buf, s)
        data = bytes(buf[s + 22 : e])
        msg = Message(cid, seq, log_time, pub_time, data)
        ch = self.channels.get(cid)
        schema = self.schemas.get(ch.schema_id) if ch else None
        return ch, schema, msg


# ----------------------------------------------------------------- writer


class McapWriter:
    """Chunked MCAP writer with summary section (schemas, channels, statistics,
    chunk indexes, summary offsets)."""

    def __init__(self, path_or_file, profile: str = "", library: str = "cloudini_tpu",
                 chunk_size: int = 2 * 1024 * 1024, compression: str = "zstd"):
        self._f = open(path_or_file, "wb") if isinstance(path_or_file, str) else path_or_file
        self._chunk_size = chunk_size
        self._compression = compression if compression in ("zstd", "lz4") else ""
        self._schemas: List[Schema] = []
        self._channels: List[Channel] = []
        self._chunk_buf = io.BytesIO()
        self._chunk_msg_start = None
        self._chunk_msg_end = None
        self._chunk_indexes: List[bytes] = []
        self._stats = {"messages": 0, "schemas": 0, "channels": 0, "chunks": 0,
                       "msg_start": None, "msg_end": None}
        self._channel_counts: Dict[int, int] = {}
        self._f.write(MAGIC)
        self._f.write(_record(OP_HEADER, _pack_str(profile) + _pack_str(library)))

    # -- registration ----------------------------------------------------------

    def add_schema(self, name: str, encoding: str, data: bytes) -> int:
        sid = len(self._schemas) + 1
        self._schemas.append(Schema(sid, name, encoding, bytes(data)))
        self._stats["schemas"] += 1
        self._chunk_buf.write(
            _record(OP_SCHEMA, struct.pack("<H", sid) + _pack_str(name) + _pack_str(encoding)
                    + struct.pack("<I", len(data)) + bytes(data))
        )
        return sid

    def add_channel(self, topic: str, message_encoding: str, schema_id: int,
                    metadata: Optional[Dict[str, str]] = None) -> int:
        cid = len(self._channels)
        ch = Channel(cid, schema_id, topic, message_encoding, metadata or {})
        self._channels.append(ch)
        self._stats["channels"] += 1
        self._chunk_buf.write(
            _record(OP_CHANNEL, struct.pack("<HH", cid, schema_id) + _pack_str(topic)
                    + _pack_str(message_encoding) + _pack_map(ch.metadata))
        )
        return cid

    def write_metadata(self, name: str, metadata: Dict[str, str]) -> None:
        self._flush_chunk()
        self._f.write(_record(OP_METADATA, _pack_str(name) + _pack_map(metadata)))

    def write_message(self, channel_id: int, log_time: int, data: bytes,
                      publish_time: Optional[int] = None, sequence: int = 0) -> None:
        publish_time = log_time if publish_time is None else publish_time
        self._chunk_buf.write(
            _record(OP_MESSAGE, struct.pack("<HIQQ", channel_id, sequence, log_time, publish_time) + bytes(data))
        )
        self._stats["messages"] += 1
        self._channel_counts[channel_id] = self._channel_counts.get(channel_id, 0) + 1
        for key, t in (("msg_start", log_time), ("msg_end", log_time)):
            cur = self._stats[key]
            better = t if cur is None else (min(cur, t) if key == "msg_start" else max(cur, t))
            self._stats[key] = better
        if self._chunk_msg_start is None:
            self._chunk_msg_start = self._chunk_msg_end = log_time
        else:
            self._chunk_msg_start = min(self._chunk_msg_start, log_time)
            self._chunk_msg_end = max(self._chunk_msg_end, log_time)
        if self._chunk_buf.tell() >= self._chunk_size:
            self._flush_chunk()

    # -- chunk / summary -------------------------------------------------------

    def _flush_chunk(self) -> None:
        records = self._chunk_buf.getvalue()
        if not records:
            return
        self._chunk_buf = io.BytesIO()
        ucrc = zlib.crc32(records)
        if self._compression == "zstd":
            import zstandard

            payload = zstandard.ZstdCompressor(level=1).compress(records)
        elif self._compression == "lz4":
            from ..codec.stage2 import compress_chunk
            from ..core.types import CompressionOption

            payload = compress_chunk(CompressionOption.LZ4, records)
        else:
            payload = records
        msg_start = self._chunk_msg_start or 0
        msg_end = self._chunk_msg_end or 0
        content = (
            struct.pack("<QQQI", msg_start, msg_end, len(records), ucrc)
            + _pack_str(self._compression)
            + struct.pack("<Q", len(payload))
            + payload
        )
        chunk_offset = self._f.tell()
        rec = _record(OP_CHUNK, content)
        self._f.write(rec)
        # ChunkIndex for the summary (empty message-index map)
        self._chunk_indexes.append(
            struct.pack("<QQQQ", msg_start, msg_end, chunk_offset, len(rec))
            + struct.pack("<I", 0)  # message_index_offsets: empty map
            + struct.pack("<Q", 0)  # message_index_length
            + _pack_str(self._compression)
            + struct.pack("<QQ", len(payload), len(records))
        )
        self._chunk_msg_start = self._chunk_msg_end = None
        self._stats["chunks"] += 1

    def close(self) -> None:
        self._flush_chunk()
        self._f.write(_record(OP_DATA_END, struct.pack("<I", 0)))
        summary_start = self._f.tell()

        groups: List[Tuple[int, int, int]] = []  # (opcode, offset, length)

        def _write_group(op: int, records: List[bytes]) -> None:
            if not records:
                return
            start = self._f.tell()
            for r in records:
                self._f.write(r)
            groups.append((op, start, self._f.tell() - start))

        _write_group(OP_SCHEMA, [
            _record(OP_SCHEMA, struct.pack("<H", s.id) + _pack_str(s.name) + _pack_str(s.encoding)
                    + struct.pack("<I", len(s.data)) + s.data)
            for s in self._schemas
        ])
        _write_group(OP_CHANNEL, [
            _record(OP_CHANNEL, struct.pack("<HH", c.id, c.schema_id) + _pack_str(c.topic)
                    + _pack_str(c.message_encoding) + _pack_map(c.metadata))
            for c in self._channels
        ])
        counts = b"".join(struct.pack("<HQ", cid, n) for cid, n in sorted(self._channel_counts.items()))
        stats = struct.pack(
            "<QHIIIIQQ",
            self._stats["messages"], self._stats["schemas"], self._stats["channels"],
            0, 0, self._stats["chunks"],
            self._stats["msg_start"] or 0, self._stats["msg_end"] or 0,
        ) + struct.pack("<I", len(counts)) + counts
        _write_group(OP_STATISTICS, [_record(OP_STATISTICS, stats)])
        _write_group(OP_CHUNK_INDEX, [_record(OP_CHUNK_INDEX, ci) for ci in self._chunk_indexes])

        summary_offset_start = self._f.tell()
        for op, off, length in groups:
            self._f.write(_record(OP_SUMMARY_OFFSET, struct.pack("<BQQ", op, off, length)))

        self._f.write(_record(OP_FOOTER, struct.pack("<QQI", summary_start, summary_offset_start, 0)))
        self._f.write(MAGIC)
        self._f.flush()
        if hasattr(self._f, "close"):
            self._f.close()
