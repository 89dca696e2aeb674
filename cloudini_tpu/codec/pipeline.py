"""Public encoder/decoder — the framework's equivalent of PointcloudEncoder /
PointcloudDecoder (reference: cloudini.hpp:154-244).

Numpy backend: the wire kernel of truth. The device (JAX) backend plugs in at
the stage-1 boundary via the same chunk interface. Where the reference overlaps
its stage-2 worker thread with stage-1 of the next chunk (cloudini.cpp:453-499),
this design overlaps host stage-2 with *device* stage-1 dispatch — the
double-buffering is inherent in JAX's async dispatch model.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional

import numpy as np

from ..core.header import decode_header, encode_header
from ..core.plan import CodecPlan, build_plan
from ..core.types import (
    ADAPTIVE_MODE_PROBE_POINTS,
    POINTS_PER_CHUNK,
    CompressionOption,
    EncodingInfo,
    EncodingOptions,
)
from ..ref import stage1 as np_stage1
from ..ref import v5 as np_v5
from . import stage2


def _as_point_rows(cloud_data, point_step: int) -> np.ndarray:
    buf = np.frombuffer(cloud_data, dtype=np.uint8) if not isinstance(cloud_data, np.ndarray) else cloud_data
    buf = buf.reshape(-1) if buf.ndim != 1 else buf
    if point_step == 0:
        raise ValueError("point_step cannot be 0")
    if buf.size % point_step != 0:
        raise ValueError("Input cloud_data size is not a multiple of point_step")
    return buf.reshape(-1, point_step)


class PointcloudEncoder:
    """Two-stage encoder. Stage 1: columnar predictive coding per 32Ki-point
    chunk. Stage 2: LZ4/ZSTD per chunk with u32 framing."""

    def __init__(self, info: EncodingInfo, stage1_backend: Optional[object] = None):
        self.info = info
        self.header = encode_header(info)
        self.plan = build_plan(info, for_decode=False)
        # stage1_backend: object with encode_chunk(plan, points)->np.uint8[...]
        # (defaults to the numpy wire kernel; the JAX device backend is drop-in)
        self._backend = stage1_backend

    def encode(self, cloud_data, write_header: bool = True) -> bytes:
        points = _as_point_rows(cloud_data, self.info.point_step)
        n_points = points.shape[0]
        out: List[bytes] = [self.header] if write_header else []

        committed_modes: Optional[Dict[int, int]] = None
        pos = 0
        while pos < n_points or (n_points == 0 and pos == 0):
            chunk = points[pos : pos + POINTS_PER_CHUNK]
            if chunk.shape[0] == 0:
                break
            stage1_bytes, committed_modes = self._encode_stage1_chunk(chunk, committed_modes)
            out.append(stage2.write_stage1_chunk(self.info.compression_opt, stage1_bytes))
            pos += chunk.shape[0]
        return b"".join(out)

    def _encode_stage1_chunk(self, chunk: np.ndarray, committed_modes):
        if self._backend is not None:
            regular = self._backend.encode_chunk(self.plan, chunk)
        else:
            regular = np_stage1.encode_chunk(self.plan, chunk)
        parts = [np.asarray(regular, dtype=np.uint8)]
        if self.plan.adaptive:
            if committed_modes is None:
                committed_modes = {}
                # V5 probe: first 4096 points of the first chunk, or the whole
                # chunk when smaller (v5_codec.cpp:934-948)
                probe_n = (
                    ADAPTIVE_MODE_PROBE_POINTS
                    if chunk.shape[0] > ADAPTIVE_MODE_PROBE_POINTS
                    else chunk.shape[0]
                )
                for field in self.plan.adaptive:
                    signed, unsigned = np_v5.extract_adaptive_values(field, chunk[:probe_n])
                    committed_modes[field.field_index] = np_v5.analyze_modes(
                        signed, unsigned, field.bytes_per_value
                    )
            for field in self.plan.adaptive:
                signed, unsigned = np_v5.extract_adaptive_values(field, chunk)
                parts.append(
                    np_v5.encode_section(field, committed_modes[field.field_index], signed, unsigned)
                )
        return np.concatenate(parts).tobytes(), committed_modes


class PointcloudDecoder:
    """Chunked decoder; validates framing like the reference (cloudini.cpp:635-668)."""

    def decode(self, info: EncodingInfo, compressed_data: bytes) -> np.ndarray:
        from ..core.types import MAGIC_HEADER

        if compressed_data[: len(MAGIC_HEADER)] == MAGIC_HEADER:
            raise ValueError("compressed_data contains the header. Use decode_header first")
        plan = build_plan(info, for_decode=True)
        n_total = info.num_points
        out = np.zeros((n_total, info.point_step), dtype=np.uint8)

        if info.version >= 3:
            pos = 0
            row = 0
            points_remaining = n_total
            data = memoryview(compressed_data)
            while pos < len(data):
                if points_remaining == 0:
                    raise ValueError("Encoded data contains more chunks than declared points")
                if pos + 4 > len(data):
                    raise ValueError("Invalid chunk size found while decoding")
                (chunk_size,) = struct.unpack_from("<I", data, pos)
                pos += 4
                if chunk_size > len(data) - pos:
                    raise ValueError("Invalid chunk size found while decoding")
                points_in_chunk = min(points_remaining, POINTS_PER_CHUNK)
                self._decode_chunk(
                    info, plan, bytes(data[pos : pos + chunk_size]), out[row : row + points_in_chunk]
                )
                pos += chunk_size
                row += points_in_chunk
                points_remaining -= points_in_chunk
            if points_remaining != 0:
                raise ValueError("Encoded data ended before all declared points were decoded")
        else:
            self._decode_chunk(info, plan, compressed_data, out)
        return out

    def decode_full(self, stream: bytes) -> (EncodingInfo, np.ndarray):
        """Convenience: header + payload in one buffer."""
        info, header_len = decode_header(stream)
        return info, self.decode(info, stream[header_len:])

    def _decode_chunk(self, info, plan: CodecPlan, chunk_data: bytes, out_rows: np.ndarray):
        expected_points = out_rows.shape[0]
        max_size = info.num_points * info.point_step
        raw = decompress_chunk_bytes(info.compression_opt, chunk_data, max_size)
        data = np.frombuffer(raw, dtype=np.uint8)
        consumed = np_stage1.decode_chunk(plan, data, out_rows, expected_points)
        if plan.adaptive:
            pos = consumed
            for field in plan.adaptive:
                pos = np_v5.decode_section(field, data, pos, out_rows, expected_points)
            if pos != len(data):
                raise ValueError("V5 chunk has trailing bytes after decode")


def decompress_chunk_bytes(compression: CompressionOption, data: bytes, max_size: int) -> bytes:
    return stage2.decompress_chunk(compression, data, max_size)
