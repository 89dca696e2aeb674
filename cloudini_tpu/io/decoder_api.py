"""High-level decode API — the framework's equivalent of cloudini_py's
wasmtime-based ``CloudiniDecoder`` (cloudini_py/cloudini_decoder.py:16-383),
with the codec running natively instead of under a WASM VM.

Returns decoded clouds as numpy structured arrays whose dtype carries the
original field names/offsets/itemsize, exactly like the reference's
numpy-dtype construction (cloudini_decoder.py:352-371).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ..codec.pipeline import PointcloudDecoder
from ..core.header import decode_header, encode_header
from ..core.types import EncodingInfo, FieldType
from .ros_msgs import get_deserialized_point_cloud_message


class CloudiniDecoder:
    """Decode cloudini streams / CompressedPointCloud2 DDS messages to
    structured numpy arrays."""

    def __init__(self, backend: str = "auto"):
        self._decoder = PointcloudDecoder(backend=backend)

    def header_as_yaml(self, compressed_data: bytes) -> str:
        """Equivalent of cldn_GetHeaderAsYAML (wasm_functions.cpp:25-60)."""
        from ..core.header import encoding_info_to_yaml

        info, _ = decode_header(compressed_data)
        return encoding_info_to_yaml(info)

    def decompressed_size(self, compressed_data: bytes) -> int:
        """Equivalent of cldn_GetDecompressedSize."""
        info, _ = decode_header(compressed_data)
        return info.num_points * info.point_step

    def decode_data(self, compressed_data: bytes) -> Tuple[EncodingInfo, np.ndarray]:
        """Cloudini stream (with header) -> structured array.
        Equivalent of cldn_DecodeCompressedData (wasm_functions.cpp:143+)."""
        info, header_len = decode_header(compressed_data)
        rows = self._decoder.decode(info, compressed_data[header_len:])
        return info, self._structured(info, rows)

    def decode_message(self, dds_msg: bytes) -> Tuple[EncodingInfo, np.ndarray]:
        """Raw DDS CompressedPointCloud2 -> structured array.
        Equivalent of cldn_DecodeCompressedMessage (wasm_functions.cpp:122+)."""
        pc = get_deserialized_point_cloud_message(dds_msg)
        return self.decode_data(pc.data)

    def convert_to_point_cloud2_msg(self, dds_msg: bytes) -> bytes:
        """Raw DDS CompressedPointCloud2 -> serialized PointCloud2 DDS message.
        Equivalent of cldn_ConvertCompressedMsgToPointCloud2Msg
        (wasm_functions.cpp:104-117)."""
        from .ros_msgs import convert_compressed_to_point_cloud2

        pc = get_deserialized_point_cloud_message(dds_msg)
        return convert_compressed_to_point_cloud2(pc, self._decoder)

    @staticmethod
    def _structured(info: EncodingInfo, rows: np.ndarray) -> np.ndarray:
        dtype = info.point_dtype()
        if rows.shape[0] == 0:  # reshape(0, -1) is ambiguous in numpy
            return np.zeros(0, dtype=dtype)
        return rows.reshape(-1).view(np.uint8).reshape(rows.shape[0], -1).view(dtype).reshape(-1)


class CloudiniEncoder:
    """Encode-side convenience API — the framework's equivalents of the
    reference's WASM encode exports (wasm_functions.cpp:56-248). Returns
    cloudini streams as bytes instead of writing through caller pointers."""

    def __init__(self, backend: str = "auto"):
        self._backend = backend
        self._cache: dict = {}

    def _encoder(self, info: EncodingInfo):
        from ..codec.pipeline import PointcloudEncoder

        # cache by the width-independent schema: a live topic's per-message
        # point count varies, and a per-width cache would grow without bound
        key = info.with_(width=0, height=1)
        enc = self._cache.get(key)
        if enc is None:
            enc = self._cache[key] = PointcloudEncoder(key, backend=self._backend)
        return enc

    @staticmethod
    def _info_from_dds(dds_msg: bytes, resolution: float):
        """toEncodingInfo + FLOAT32 resolution override, the shared preamble
        of cldn_ComputeCompressedSize / cldn_EncodePointcloudMessage
        (wasm_functions.cpp:60-70, 173-184)."""
        from dataclasses import replace

        from .ros_msgs import to_encoding_info

        pc = get_deserialized_point_cloud_message(dds_msg)
        info = to_encoding_info(pc)
        fields = tuple(
            replace(f, resolution=resolution) if f.type == FieldType.FLOAT32 else f
            for f in info.fields
        )
        return replace(info, fields=fields), pc

    def header_as_yaml_from_dds(self, dds_msg: bytes) -> str:
        """Equivalent of cldn_GetHeaderAsYAMLFromDDS (wasm_functions.cpp:45-52)."""
        from ..core.header import encoding_info_to_yaml

        pc = get_deserialized_point_cloud_message(dds_msg)
        info, _ = decode_header(pc.data)
        return encoding_info_to_yaml(info)

    def compute_compressed_size(self, dds_msg: bytes, resolution: float = 0.001) -> int:
        """Encode a raw DDS PointCloud2 and report the compressed size
        (the web app's per-topic estimate; wasm_functions.cpp:56-90)."""
        return len(self.encode_pointcloud_message(dds_msg, resolution))

    def encode_pointcloud_message(self, dds_msg: bytes, resolution: float = 0.001) -> bytes:
        """Raw DDS PointCloud2 -> cloudini stream (header + chunks).
        Equivalent of cldn_EncodePointcloudMessage (wasm_functions.cpp:169-213),
        including its data-size validation (the reference returns 0 on a
        width*height*point_step mismatch; a silent truncation here would emit
        a header declaring more points than the stream carries)."""
        info, pc = self._info_from_dds(dds_msg, resolution)
        expected = info.width * info.height * info.point_step
        if len(pc.data) != expected:
            raise ValueError(
                f"data size mismatch: expected {expected}, got {len(pc.data)}"
            )
        return self._encoder(info).encode_with_info(pc.data, info)

    def encode_pointcloud_data(self, header_as_yaml: str, pc_data: bytes) -> bytes:
        """(YAML header, raw interleaved rows) -> cloudini stream.
        Equivalent of cldn_EncodePointcloudData (wasm_functions.cpp:217-248)."""
        from ..core.header import encoding_info_from_yaml

        info = encoding_info_from_yaml(header_as_yaml)
        expected = info.width * info.height * info.point_step
        if len(pc_data) != expected:
            raise ValueError(
                f"data size mismatch: expected {expected}, got {len(pc_data)}"
            )
        return self._encoder(info).encode_with_info(pc_data, info)
