"""cloudini_tpu — a TPU-native point-cloud compression framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
facontidavide/cloudini: two-stage lossless/lossy compression of
PointCloud2-style point clouds (per-field predictive coding + LZ4/ZSTD),
engineered for TPU hardware — columnar chunk-parallel kernels, SPMD scaling
over device meshes, and a host runtime for streams/bags.
"""

from .core.header import decode_header, encode_header, encoding_info_from_yaml, encoding_info_to_yaml
from .core.plan import build_plan
from .core.types import (
    CompressionOption,
    EncodingInfo,
    EncodingOptions,
    FieldType,
    PointField,
    POINTS_PER_CHUNK,
)
from .codec.pipeline import (
    PointcloudDecoder,
    PointcloudEncoder,
    max_compressed_size,
    max_serialized_point_size,
)

__version__ = "0.1.0"

__all__ = [
    "CompressionOption",
    "EncodingInfo",
    "EncodingOptions",
    "FieldType",
    "PointField",
    "PointcloudDecoder",
    "PointcloudEncoder",
    "POINTS_PER_CHUNK",
    "build_plan",
    "decode_header",
    "encode_header",
    "encoding_info_from_yaml",
    "encoding_info_to_yaml",
    "max_compressed_size",
    "max_serialized_point_size",
]
