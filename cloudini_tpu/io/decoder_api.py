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
from ..core.header import decode_header
from ..core.types import EncodingInfo
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

    @staticmethod
    def _structured(info: EncodingInfo, rows: np.ndarray) -> np.ndarray:
        dtype = info.point_dtype()
        return rows.reshape(-1).view(np.uint8).reshape(rows.shape[0], -1).view(dtype).reshape(-1)
