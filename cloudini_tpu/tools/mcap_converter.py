"""MCAP/rosbag batch converter library — equivalent of the reference's
McapConverter (tools/src/mcap_converter.cpp:30-375).

Streams messages through the codec with a per-schema encoder cache (the
"mixed-topic workload" dispatch: each distinct point layout compiles its own
device program once and reuses it for every message on that topic)."""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Dict, Optional, Tuple

import numpy as np

from ..codec.pipeline import PointcloudDecoder, PointcloudEncoder
from ..core.types import CompressionOption, EncodingInfo
from ..io import ros_definitions as defs
from ..io.mcap import McapReader, McapWriter
from ..io.ros_msgs import (
    ResolutionProfile,
    apply_resolution_profile,
    convert_compressed_to_point_cloud2,
    convert_point_cloud2_to_compressed,
    get_deserialized_point_cloud_message,
    to_encoding_info,
)
from ..preprocess import apply_viz_lossy_preprocessing


@dataclass
class ConverterStats:
    processed_messages: int = 0
    total_input_bytes: int = 0
    total_output_bytes: int = 0
    total_processing_s: float = 0.0

    def print(self) -> None:
        if self.processed_messages == 0:
            return
        ratio = self.total_output_bytes / max(1, self.total_input_bytes)
        avg_ms = 1e3 * self.total_processing_s / self.processed_messages
        print(f"Processed {self.processed_messages} point cloud messages")
        print(f"Avg Compression ratio: {ratio:.6g}")
        print(f"Average processing time per message: {avg_ms:.6g} milliseconds")


class McapConverter:
    """open() -> {topic: schema_name}; then encode_point_clouds() or
    decode_point_clouds()."""

    def __init__(self):
        self.reader: Optional[McapReader] = None
        self.profile: ResolutionProfile = {}
        self.stats = ConverterStats()
        self._encoder_cache: Dict[EncodingInfo, PointcloudEncoder] = {}
        self._decoder = PointcloudDecoder()

    def open(self, file_in: str) -> Dict[str, str]:
        self.reader = McapReader(file_in)
        topics = {}
        for ch in self.reader.channels.values():
            schema = self.reader.schemas.get(ch.schema_id)
            if schema and schema.name in (defs.POINTCLOUD_SCHEMA_NAME, defs.COMPRESSED_SCHEMA_NAME):
                topics[ch.topic] = schema.name
        return topics

    def add_profile(self, profile: ResolutionProfile) -> None:
        self.profile = dict(profile)

    # ------------------------------------------------------------------ encode

    def _duplicate(self, writer: McapWriter, encoding: bool) -> Dict[int, int]:
        """Schema-name/definition swap + channel duplication
        (reference: mcap_converter.cpp:57-125)."""
        old_to_new_schema: Dict[int, int] = {}
        for sid in sorted(self.reader.schemas):
            s = self.reader.schemas[sid]
            name, data = s.name, s.data
            if encoding and name == defs.POINTCLOUD_SCHEMA_NAME:
                name, data = defs.COMPRESSED_SCHEMA_NAME, defs.COMPRESSED_SCHEMA_DATA.encode()
            if not encoding and name == defs.COMPRESSED_SCHEMA_NAME:
                name, data = defs.POINTCLOUD_SCHEMA_NAME, defs.POINTCLOUD_SCHEMA_DATA.encode()
            old_to_new_schema[sid] = writer.add_schema(name, s.encoding, data)
        old_to_new_schema[0] = 0  # schema-less channels stay schema-less
        old_to_new_channel: Dict[int, int] = {}
        for cid in sorted(self.reader.channels):
            c = self.reader.channels[cid]
            old_to_new_channel[cid] = writer.add_channel(
                c.topic, c.message_encoding, old_to_new_schema[c.schema_id],
                c.metadata,
            )
        for md in self.reader.metadata:
            writer.write_metadata(md.name, md.metadata)
        return old_to_new_channel

    def _encoder_for(self, info: EncodingInfo, backend: str = "auto",
                     device_stage2: bool = False) -> PointcloudEncoder:
        # keyed by the width-independent schema so per-message point counts
        # share one encoder (and its compiled programs)
        key = (info.with_(width=0, height=1), backend, device_stage2)
        enc = self._encoder_cache.get(key)
        if enc is None:
            enc = PointcloudEncoder(key[0], backend=backend,
                                    device_stage2=device_stage2)
            self._encoder_cache[key] = enc
        return enc

    def encode_point_clouds(
        self,
        file_out: str,
        default_resolution: Optional[float] = 0.001,
        mcap_writer_compression: CompressionOption = CompressionOption.ZSTD,
        viz_lossy: bool = False,
        on_error: str = "raise",
        backend: str = "auto",
        batch_window: int = 0,
        device_stage2: bool = False,
    ) -> ConverterStats:
        """``batch_window`` > 0 buffers up to that many point-cloud messages
        and encodes each same-schema group with ONE device dispatch
        (PointcloudEncoder.encode_many) — the data-parallel "rosbag stream"
        workload. Message order in the output bag is preserved: non-cloud
        messages buffer in the same window. 0 = stream one message at a time
        (the reference's behavior, mcap_converter.cpp:174-220)."""
        if self.reader is None:
            raise RuntimeError("McapReader is not initialized. Call open() first.")
        self.stats = ConverterStats()
        comp_name = {
            CompressionOption.ZSTD: "zstd",
            CompressionOption.LZ4: "lz4",
            CompressionOption.NONE: "",
        }[mcap_writer_compression]
        if device_stage2:
            # the stream carries device stage-2; skip MCAP-chunk compression
            # instead of the stream's (the same no-double-compression rule,
            # with the device doing the work)
            comp_name = ""
        writer = McapWriter(file_out, profile=self.reader.profile, compression=comp_name)
        chan_map = self._duplicate(writer, encoding=True)

        pending: list = []  # ("raw", cid, msg) | ("pc", cid, msg, pc, info)
        n_pending_pc = 0

        def prepare(msg):
            pc = get_deserialized_point_cloud_message(msg.data)
            pc.fields = apply_resolution_profile(self.profile, pc.fields, default_resolution)
            if viz_lossy:
                rows = np.frombuffer(pc.data, np.uint8).reshape(-1, pc.point_step)
                pc.fields, new_rows = apply_viz_lossy_preprocessing(pc.fields, rows)
                pc.data = new_rows.tobytes()
                pc.width, pc.height = new_rows.shape[0], 1
                pc.row_step = pc.point_step * pc.width
            info = to_encoding_info(pc)
            if mcap_writer_compression == CompressionOption.ZSTD and not device_stage2:
                # no need to do ZSTD compression twice (mcap_converter.cpp:201-203)
                info = info.with_(compression_opt=CompressionOption.NONE)
            elif device_stage2:
                info = info.with_(compression_opt=mcap_writer_compression)
            return pc, info

        def flush():
            nonlocal pending, n_pending_pc
            t0 = time.perf_counter()
            # group clouds by schema (width-independent), encode each group
            # in one batched call, keep per-message payloads
            groups: dict = {}
            for i, item in enumerate(pending):
                if item[0] == "pc":
                    key = item[4].with_(width=0, height=1)
                    groups.setdefault(key, []).append(i)
            payloads: dict = {}
            for key, idxs in groups.items():
                try:
                    enc = self._encoder_for(key, backend, device_stage2)
                    clouds = []
                    infos = []
                    for i in idxs:
                        _, _, msg, pc, info = pending[i]
                        n = len(pc.data) // info.point_step if info.point_step else 0
                        clouds.append(np.frombuffer(pc.data, np.uint8)[: n * info.point_step])
                        infos.append(info.with_(width=n, height=1))
                    for i, stream in zip(idxs, enc.encode_many(clouds, infos)):
                        payloads[i] = stream
                except Exception:
                    if on_error == "raise":
                        raise
                    # skip-and-warn like the streaming path: the whole group
                    # failed to batch-encode; its messages pass through
                    print("warning: batched encode failed for a schema group; passing through")
                    for i in idxs:
                        payloads.pop(i, None)
            self.stats.total_processing_s += time.perf_counter() - t0
            for i, item in enumerate(pending):
                if item[0] == "raw":
                    _, cid, msg = item
                    writer.write_message(cid, msg.log_time, msg.data, msg.publish_time, msg.sequence)
                elif i not in payloads:
                    _, cid, msg, pc, info = item
                    writer.write_message(cid, msg.log_time, msg.data, msg.publish_time, msg.sequence)
                else:
                    _, cid, msg, pc, info = item
                    wrapped = convert_point_cloud2_to_compressed(pc, info, payload=payloads[i])
                    self.stats.processed_messages += 1
                    self.stats.total_input_bytes += len(msg.data)
                    self.stats.total_output_bytes += len(wrapped)
                    writer.write_message(cid, msg.log_time, wrapped, msg.publish_time, msg.sequence)
            pending = []
            n_pending_pc = 0

        for ch, schema, msg in self.reader.messages():
            new_cid = chan_map[msg.channel_id]
            if schema is None or schema.name != defs.POINTCLOUD_SCHEMA_NAME:
                if batch_window > 0 and pending:
                    pending.append(("raw", new_cid, msg))
                else:
                    writer.write_message(new_cid, msg.log_time, msg.data, msg.publish_time, msg.sequence)
                continue
            if batch_window > 0:
                try:
                    pc, info = prepare(msg)
                except Exception:
                    if on_error == "raise":
                        raise
                    print(f"warning: failed to convert a message on {ch.topic}; passing through")
                    pending.append(("raw", new_cid, msg))
                    continue
                pending.append(("pc", new_cid, msg, pc, info))
                n_pending_pc += 1
                if n_pending_pc >= batch_window:
                    flush()
                continue
            t0 = time.perf_counter()
            try:
                pc, info = prepare(msg)
                enc = self._encoder_for(info, backend, device_stage2)
                n_pts = len(pc.data) // info.point_step if info.point_step else 0
                stream = (
                    enc.encode_with_info(pc.data[: n_pts * info.point_step], info)
                    if pc.data
                    else None
                )
                payload = convert_point_cloud2_to_compressed(pc, info, payload=stream)
            except Exception:
                if on_error == "raise":
                    raise
                # skip-and-warn like the reference tools (mcap_codec_benchmark.cpp:400-404)
                print(f"warning: failed to convert a message on {ch.topic}; passing through")
                writer.write_message(new_cid, msg.log_time, msg.data, msg.publish_time, msg.sequence)
                continue
            self.stats.processed_messages += 1
            self.stats.total_processing_s += time.perf_counter() - t0
            self.stats.total_input_bytes += len(msg.data)
            self.stats.total_output_bytes += len(payload)
            writer.write_message(new_cid, msg.log_time, payload, msg.publish_time, msg.sequence)
        if pending:
            flush()
        writer.close()
        return self.stats

    # ------------------------------------------------------------------ decode

    def decode_point_clouds(
        self,
        file_out: str,
        mcap_writer_compression: CompressionOption = CompressionOption.ZSTD,
    ) -> ConverterStats:
        if self.reader is None:
            raise RuntimeError("McapReader is not initialized. Call open() first.")
        self.stats = ConverterStats()
        comp_name = {
            CompressionOption.ZSTD: "zstd",
            CompressionOption.LZ4: "lz4",
            CompressionOption.NONE: "",
        }[mcap_writer_compression]
        writer = McapWriter(file_out, profile=self.reader.profile, compression=comp_name)
        chan_map = self._duplicate(writer, encoding=False)

        for ch, schema, msg in self.reader.messages():
            new_cid = chan_map[msg.channel_id]
            if schema is None or schema.name != defs.COMPRESSED_SCHEMA_NAME:
                writer.write_message(new_cid, msg.log_time, msg.data, msg.publish_time, msg.sequence)
                continue
            t0 = time.perf_counter()
            pc = get_deserialized_point_cloud_message(msg.data)
            payload = convert_compressed_to_point_cloud2(pc, self._decoder)
            self.stats.processed_messages += 1
            self.stats.total_processing_s += time.perf_counter() - t0
            self.stats.total_input_bytes += len(msg.data)
            self.stats.total_output_bytes += len(payload)
            writer.write_message(new_cid, msg.log_time, payload, msg.publish_time, msg.sequence)
        writer.close()
        return self.stats
