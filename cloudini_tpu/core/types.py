"""Core schema types for the TPU-native point-cloud codec.

These mirror the *capabilities* of the reference wire format
(``cloudini_lib/include/cloudini_lib/basic_types.hpp:28-67`` and
``cloudini.hpp:65-111``) with a functional, pytree-friendly design: schemas are
immutable hashable dataclasses so they can key jitted-program caches.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field, replace
from typing import Optional, Tuple

import numpy as np


class FieldType(enum.IntEnum):
    """Field data types; values 1..8 match sensor_msgs/PointField.msg
    (reference: basic_types.hpp:28-45)."""

    UNKNOWN = 0
    INT8 = 1
    UINT8 = 2
    INT16 = 3
    UINT16 = 4
    INT32 = 5
    UINT32 = 6
    FLOAT32 = 7
    FLOAT64 = 8
    INT64 = 9
    UINT64 = 10


_FIELD_SIZE = {
    FieldType.INT8: 1,
    FieldType.UINT8: 1,
    FieldType.INT16: 2,
    FieldType.UINT16: 2,
    FieldType.INT32: 4,
    FieldType.UINT32: 4,
    FieldType.FLOAT32: 4,
    FieldType.FLOAT64: 8,
    FieldType.INT64: 8,
    FieldType.UINT64: 8,
}

_NUMPY_DTYPE = {
    FieldType.INT8: np.int8,
    FieldType.UINT8: np.uint8,
    FieldType.INT16: np.int16,
    FieldType.UINT16: np.uint16,
    FieldType.INT32: np.int32,
    FieldType.UINT32: np.uint32,
    FieldType.FLOAT32: np.float32,
    FieldType.FLOAT64: np.float64,
    FieldType.INT64: np.int64,
    FieldType.UINT64: np.uint64,
}

_INTEGER_TYPES = frozenset(
    {
        FieldType.INT8,
        FieldType.UINT8,
        FieldType.INT16,
        FieldType.UINT16,
        FieldType.INT32,
        FieldType.UINT32,
        FieldType.INT64,
        FieldType.UINT64,
    }
)

# Integer types eligible for V5 adaptive sections (reference: v5_codec.cpp:83-95;
# INT8/UINT8 stay on the copy path).
V5_ADAPTIVE_INT_TYPES = frozenset(
    {
        FieldType.INT16,
        FieldType.UINT16,
        FieldType.INT32,
        FieldType.UINT32,
        FieldType.INT64,
        FieldType.UINT64,
    }
)


def size_of(ftype: FieldType) -> int:
    """Byte width of a field type (reference: basic_types.hpp:73-95)."""
    return _FIELD_SIZE.get(FieldType(ftype), 0)


def numpy_dtype(ftype: FieldType):
    return np.dtype(_NUMPY_DTYPE[FieldType(ftype)])


def is_integer(ftype: FieldType) -> bool:
    return FieldType(ftype) in _INTEGER_TYPES


class EncodingOptions(enum.IntEnum):
    """Stage-1 predictive-encoding mode (reference: cloudini.hpp:33-43)."""

    NONE = 0
    LOSSY = 1
    LOSSLESS = 2


class CompressionOption(enum.IntEnum):
    """Stage-2 general-purpose compression backend (reference: cloudini.hpp:46-53)."""

    NONE = 0
    LZ4 = 1
    ZSTD = 2


KENCODING_VERSION = 5  # current wire version (reference: cloudini.hpp:63)
MAGIC_HEADER = b"CLOUDINI_V"  # reference: cloudini.hpp:113
POINTS_PER_CHUNK = 32 * 1024  # unit of predictor independence (codec_common.hpp:28)
ADAPTIVE_MODE_PROBE_POINTS = 4096  # V5 probe window (v5_codec.cpp:76)

# Sentinel offset: field is decoded (stream consumed) but not stored
# (reference: basic_types.hpp:71).
DECODE_BUT_SKIP_STORE = 0xFFFFFFFF


@dataclass(frozen=True)
class PointField:
    """One field of a point layout (reference: basic_types.hpp:47-67)."""

    name: str
    offset: int
    type: FieldType
    resolution: Optional[float] = None

    def __post_init__(self):
        object.__setattr__(self, "type", FieldType(self.type))
        if self.resolution is not None:
            # store with float32 precision, matching the reference's `float` member
            object.__setattr__(self, "resolution", float(np.float32(self.resolution)))

    @property
    def size(self) -> int:
        return size_of(self.type)


@dataclass(frozen=True)
class EncodingInfo:
    """Self-describing codec configuration; serialized into every stream so the
    decoder needs no out-of-band config (reference: cloudini.hpp:65-111)."""

    fields: Tuple[PointField, ...]
    width: int = 0
    height: int = 1
    point_step: int = 0
    encoding_opt: EncodingOptions = EncodingOptions.LOSSY
    encoding_config: str = ""
    compression_opt: CompressionOption = CompressionOption.ZSTD
    version: int = KENCODING_VERSION

    def __post_init__(self):
        object.__setattr__(self, "fields", tuple(self.fields))
        object.__setattr__(self, "encoding_opt", EncodingOptions(self.encoding_opt))
        object.__setattr__(self, "compression_opt", CompressionOption(self.compression_opt))

    @property
    def num_points(self) -> int:
        return int(self.width) * int(self.height)

    def with_(self, **kwargs) -> "EncodingInfo":
        return replace(self, **kwargs)

    def point_dtype(self) -> np.dtype:
        """Structured numpy dtype matching the (possibly padded) point layout."""
        return np.dtype(
            {
                "names": [f.name for f in self.fields],
                "formats": [numpy_dtype(f.type) for f in self.fields],
                "offsets": [f.offset for f in self.fields],
                "itemsize": self.point_step,
            }
        )


def leading_lossy_float_count(info: EncodingInfo) -> int:
    """Number of leading FLOAT32-with-resolution fields fused into the vectorized
    FloatN path — exactly 3 or 4, else 0 (reference: codec_common.cpp:69-83)."""
    if info.encoding_opt != EncodingOptions.LOSSY:
        return 0
    n = 0
    for f in info.fields:
        if f.type != FieldType.FLOAT32 or f.resolution is None:
            break
        n += 1
    return n if n in (3, 4) else 0


def uses_v5_codec(info: EncodingInfo) -> bool:
    """V5 gate: version>=5, LOSSY, and at least one adaptive-int field after the
    fused float block (reference: v5_codec.cpp:883-892)."""
    if info.version < 5 or info.encoding_opt != EncodingOptions.LOSSY:
        return False
    start = leading_lossy_float_count(info)
    return any(f.type in V5_ADAPTIVE_INT_TYPES for f in info.fields[start:])
