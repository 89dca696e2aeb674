#!/usr/bin/env python3
"""Quantify the device-ZSTD ratio vs host zstd level 1 (VERDICT r1 item 4).

The device ZSTD compressor (cloudini_tpu/ops/zstd.py) emits RFC 8878 frames
with predefined-FSE sequences and Huffman literals; the reference's headline
mode is host zstd level 1 (codec_common.cpp:242). This script measures the
compressed-size gap on the real fixtures' stage-1 streams, per chunk, and
asserts every device-produced frame decodes bit-exact with libzstd.

Ratio only — runs on CPU JAX (the matcher is deterministic; sizes do not
depend on the backend). Emits one JSON line; artifact: ZSTD_RATIO.json.

Usage: python scripts/zstd_ratio.py
"""

from __future__ import annotations

import json
import pathlib
import sys

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax

jax.config.update("jax_platforms", "cpu")

SAMPLES = pathlib.Path("/root/reference/cloudini_lib/samples")


def stage1_chunks(info, rows):
    from cloudini_tpu.codec.pipeline import PointcloudEncoder
    from cloudini_tpu.core.header import decode_header

    enc = PointcloudEncoder(info, backend="host")
    stream = enc.encode(rows)
    _, hlen = decode_header(stream)
    payload = memoryview(stream)[hlen:]
    chunks, pos = [], 0
    while pos < len(payload):
        size = int.from_bytes(payload[pos: pos + 4], "little")
        pos += 4
        chunks.append(bytes(payload[pos: pos + size]))
        pos += size
    return chunks


def device_zstd_sizes(chunks):
    from cloudini_tpu.codec import stage2
    from cloudini_tpu.core.types import CompressionOption
    from cloudini_tpu.ops.zstd import compress_bound, zstd_compress_chunks

    b = max(len(c) for c in chunks)
    b = -(-b // 1024) * 1024
    data = np.zeros((len(chunks), b), np.uint8)
    sizes = np.zeros(len(chunks), np.int32)
    for i, c in enumerate(chunks):
        data[i, : len(c)] = np.frombuffer(c, np.uint8)
        sizes[i] = len(c)
    out, out_sizes = zstd_compress_chunks(data, sizes, compress_bound(b))
    out, out_sizes = np.asarray(out), np.asarray(out_sizes)
    total = 0
    for i, c in enumerate(chunks):
        frame = out[i, : out_sizes[i]].tobytes()
        rt = stage2.decompress_chunk(CompressionOption.ZSTD, frame, len(c) + 1)
        assert rt == c, f"device ZSTD frame {i} does not round-trip via libzstd"
        total += out_sizes[i]
    return int(total)


def host_zstd_size(chunks):
    import zstandard

    cctx = zstandard.ZstdCompressor(level=1, write_content_size=False,
                                    write_checksum=False)
    return sum(len(cctx.compress(c)) for c in chunks)


def main() -> int:
    from cloudini_tpu.core.types import (
        CompressionOption,
        EncodingInfo,
        EncodingOptions,
        FieldType,
        PointField,
    )
    from cloudini_tpu.io.pcd import read_pcd
    from cloudini_tpu.io.ros_msgs import (
        apply_resolution_profile,
        get_deserialized_point_cloud_message,
    )

    results = {}
    _, rows = read_pcd(str(SAMPLES / "lidar.pcd"))
    info = EncodingInfo(
        fields=tuple(PointField(n, 4 * i, FieldType.FLOAT32, 0.001)
                     for i, n in enumerate("xyzi")),
        width=rows.shape[0], height=1, point_step=16,
        encoding_opt=EncodingOptions.LOSSY, compression_opt=CompressionOption.NONE,
    )
    fixtures = [("lidar_xyzi", info, rows)]

    raw = (SAMPLES / "dds_message.bin").read_bytes()
    pc = get_deserialized_point_cloud_message(raw)
    fields = apply_resolution_profile({}, pc.fields, default_resolution=0.001)
    drows = np.frombuffer(pc.data, np.uint8).reshape(-1, pc.point_step)
    dinfo = EncodingInfo(
        fields=tuple(fields), width=drows.shape[0], height=1,
        point_step=pc.point_step,
        encoding_opt=EncodingOptions.LOSSY, compression_opt=CompressionOption.NONE,
    )
    fixtures.append(("dds_mixed", dinfo, drows))

    for name, inf, r in fixtures:
        chunks = stage1_chunks(inf, r)
        stage1_total = sum(len(c) for c in chunks)
        host = host_zstd_size(chunks)
        dev = device_zstd_sizes(chunks)
        from cloudini_tpu.codec import stage2 as s2
        from cloudini_tpu.core.types import CompressionOption as CO

        lz4 = sum(len(s2.compress_chunk(CO.LZ4, c)) for c in chunks)
        results[name] = {
            "raw_bytes": int(r.nbytes),
            "stage1_bytes": stage1_total,
            "zstd1_bytes": host,
            "device_zstd_bytes": dev,
            "liblz4_bytes": lz4,
            "device_vs_zstd1_pct": round(100.0 * (dev - host) / host, 2),
            "end_ratio_zstd1": round(r.nbytes / host, 3),
            "end_ratio_device": round(r.nbytes / dev, 3),
        }

    line = {"metric": "device-ZSTD size vs host zstd-1", "fixtures": results}
    print(json.dumps(line))
    (REPO / "ZSTD_RATIO.json").write_text(json.dumps(line) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
