"""Multi-host scaling: jax.distributed wiring + striped bag conversion.

The reference is single-process (SURVEY §2.3); this module is the framework's
pod-slice story (BASELINE config 4):

  * ``initialize()`` joins the jax.distributed job (coordinator from env)
  * ``global_mesh()`` builds a 1-D ``data`` mesh over every device in the job;
    the data-parallel chunk codec (parallel/mesh.py) runs unchanged on it —
    XLA routes the sharded arrays over ICI within a slice and DCN across hosts
  * ``HostShardedConverter`` stripes a bag's point-cloud messages across hosts
    (message index mod host count), each host encodes its stripe with its
    local devices, and host 0 merges the ordered part manifests — the
    "compressed frames gathered back in original order" contract without
    moving raw clouds over DCN
  * per-stripe part files double as the checkpoint/resume unit: a completed
    part is never re-encoded (the reference restarts bags from scratch,
    SURVEY §5 'checkpoint/resume: none')
"""

from __future__ import annotations

import json
import os
import pathlib
from typing import Dict, List, Optional, Tuple

import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Join the multi-host JAX job. No-op when single-process (the default
    env has no coordinator)."""
    import jax

    if num_processes is None:
        num_processes = int(os.environ.get("CLOUDINI_NUM_PROCESSES", "1"))
    if num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address or os.environ["CLOUDINI_COORDINATOR"],
        num_processes=num_processes,
        process_id=process_id if process_id is not None else int(os.environ["CLOUDINI_PROCESS_ID"]),
    )


def global_mesh(axis: str = "data"):
    """1-D mesh over every device in the job (all hosts)."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()), (axis,))


def process_info() -> Tuple[int, int]:
    import jax

    return jax.process_index(), jax.process_count()


class HostShardedConverter:
    """Multi-host MCAP encode: stripe point-cloud messages across hosts,
    each host writes an ordered part file, host 0 merges.

    Parts are the resume unit: a part whose manifest exists is skipped.
    """

    def __init__(self, file_in: str, out_dir: str,
                 process_id: Optional[int] = None, num_processes: Optional[int] = None):
        self.file_in = file_in
        self.out_dir = pathlib.Path(out_dir)
        self.out_dir.mkdir(parents=True, exist_ok=True)
        if process_id is None or num_processes is None:
            try:
                process_id, num_processes = process_info()
            except Exception:
                process_id, num_processes = 0, 1
        self.process_id = process_id
        self.num_processes = num_processes

    def _part_paths(self, pid: int) -> Tuple[pathlib.Path, pathlib.Path]:
        base = self.out_dir / f"part-{pid:04d}"
        return base.with_suffix(".jsonl"), base.with_suffix(".bin")

    def encode_stripe(self, default_resolution: float = 0.001, viz_lossy: bool = False,
                      mcap_writer_compression=None) -> int:
        """Encode this host's stripe. Returns number of messages encoded.
        Skips work when the part manifest already exists (resume)."""
        manifest_path, payload_path = self._part_paths(self.process_id)
        done_path = manifest_path.with_suffix(".done")
        if done_path.exists():
            return sum(1 for _ in open(manifest_path))

        from ..io import ros_definitions as defs
        from ..io.mcap import McapReader
        from ..io.ros_msgs import (
            apply_resolution_profile,
            convert_point_cloud2_to_compressed,
            get_deserialized_point_cloud_message,
            to_encoding_info,
        )
        from ..codec.pipeline import PointcloudEncoder
        from ..preprocess import apply_viz_lossy_preprocessing

        reader = McapReader(self.file_in)
        encoders: Dict = {}
        count = 0
        with open(manifest_path, "w") as mf, open(payload_path, "wb") as pf:
            pc_index = -1
            for ch, schema, msg in reader.messages():
                if schema is None or schema.name != defs.POINTCLOUD_SCHEMA_NAME:
                    continue
                pc_index += 1
                if pc_index % self.num_processes != self.process_id:
                    continue
                pc = get_deserialized_point_cloud_message(msg.data)
                pc.fields = apply_resolution_profile({}, pc.fields, default_resolution)
                if viz_lossy:
                    rows = np.frombuffer(pc.data, np.uint8).reshape(-1, pc.point_step)
                    pc.fields, new_rows = apply_viz_lossy_preprocessing(pc.fields, rows)
                    pc.data = new_rows.tobytes()
                    pc.width, pc.height = new_rows.shape[0], 1
                info = to_encoding_info(pc)
                from ..core.types import CompressionOption

                if mcap_writer_compression is None or mcap_writer_compression == CompressionOption.ZSTD:
                    # same double-ZSTD skip as the single-host converter
                    info = info.with_(compression_opt=CompressionOption.NONE)
                key = info.with_(width=0, height=1)
                enc = encoders.get(key)
                if enc is None:
                    enc = encoders[key] = PointcloudEncoder(key)
                n_pts = len(pc.data) // info.point_step if info.point_step else 0
                stream = enc.encode_with_info(pc.data[: n_pts * info.point_step], info)
                payload = convert_point_cloud2_to_compressed(pc, info, payload=stream)
                offset = pf.tell()
                pf.write(payload)
                mf.write(json.dumps({
                    "pc_index": pc_index, "channel_id": msg.channel_id,
                    "log_time": msg.log_time, "publish_time": msg.publish_time,
                    "sequence": msg.sequence, "offset": offset, "size": len(payload),
                }) + "\n")
                count += 1
        done_path.write_text("ok")
        return count

    def merge(self, file_out: str,
              mcap_writer_compression=None) -> int:
        """Host 0: merge all part files into the output bag in original
        message order (the ordered gather)."""
        from ..core.types import CompressionOption
        from ..io import ros_definitions as defs
        from ..io.mcap import McapReader, McapWriter
        from ..tools.mcap_converter import McapConverter

        if mcap_writer_compression is None:
            mcap_writer_compression = CompressionOption.ZSTD
        comp_name = {CompressionOption.ZSTD: "zstd", CompressionOption.LZ4: "lz4",
                     CompressionOption.NONE: ""}[mcap_writer_compression]

        # index all parts
        entries = []
        payloads = {}
        for pid in range(self.num_processes):
            manifest_path, payload_path = self._part_paths(pid)
            if not manifest_path.with_suffix(".done").exists():
                raise RuntimeError(f"part {pid} incomplete; cannot merge")
            payloads[pid] = payload_path.read_bytes()
            for line in open(manifest_path):
                e = json.loads(line)
                e["pid"] = pid
                entries.append(e)
        entries.sort(key=lambda e: e["pc_index"])
        by_index = {e["pc_index"]: e for e in entries}

        reader = McapReader(self.file_in)
        conv = McapConverter()
        conv.reader = reader
        writer = McapWriter(file_out, profile=reader.profile, compression=comp_name)
        chan_map = conv._duplicate(writer, encoding=True)

        pc_index = -1
        written = 0
        for ch, schema, msg in reader.messages():
            new_cid = chan_map[msg.channel_id]
            if schema is None or schema.name != defs.POINTCLOUD_SCHEMA_NAME:
                writer.write_message(new_cid, msg.log_time, msg.data, msg.publish_time, msg.sequence)
                continue
            pc_index += 1
            e = by_index[pc_index]
            blob = payloads[e["pid"]][e["offset"] : e["offset"] + e["size"]]
            writer.write_message(new_cid, e["log_time"], blob, e["publish_time"], e["sequence"])
            written += 1
        writer.close()
        return written
