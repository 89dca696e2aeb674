"""Schema -> codec plan.

The reference maps each field to a stateful streaming encoder object
(``codec_common.cpp:116-198``). The TPU-native design instead compiles the schema
once into an immutable *plan*: a list of columnar codec units that the numpy
reference backend and the JAX device backend both consume. Plans are hashable so
they can key per-schema jitted-program caches (the "mixed-topic" dispatch of
BASELINE config 5).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass
from typing import Optional, Tuple

from .types import (
    V5_ADAPTIVE_INT_TYPES,
    EncodingInfo,
    EncodingOptions,
    FieldType,
    leading_lossy_float_count,
    size_of,
    uses_v5_codec,
)


class UnitKind(enum.Enum):
    FLOATN_LOSSY = "floatn_lossy"  # fused 3-4 leading FLOAT32 lanes (SIMD path)
    FLOAT_LOSSY = "float_lossy"  # scalar quantize+delta+varint (f32 or f64)
    INT_DELTA = "int_delta"  # delta + zigzag varint
    FLOAT_XOR = "float_xor"  # raw XOR residual, fixed 4/8 bytes
    GORILLA = "gorilla"  # bit-packed XOR, byte-aligned per value
    COPY = "copy"  # passthrough bytes


@dataclass(frozen=True)
class CodecUnit:
    """One streaming unit of the interleaved per-point wire layout."""

    kind: UnitKind
    offsets: Tuple[int, ...]  # byte offsets within the point
    types: Tuple[FieldType, ...]
    resolutions: Tuple[Optional[float], ...] = (None,)

    @property
    def num_lanes(self) -> int:
        return len(self.offsets)

    @property
    def fixed_size(self) -> Optional[int]:
        """Encoded byte width when constant (COPY/XOR), else None."""
        if self.kind == UnitKind.COPY:
            return size_of(self.types[0])
        if self.kind == UnitKind.FLOAT_XOR:
            return size_of(self.types[0])
        return None

    @property
    def is_varint_class(self) -> bool:
        """True when every emitted token is a self-delimiting varint/NaN-marker —
        the property that enables fully parallel decode boundary discovery."""
        return self.kind in (UnitKind.FLOATN_LOSSY, UnitKind.FLOAT_LOSSY, UnitKind.INT_DELTA)

    @property
    def min_input_bytes(self) -> int:
        """Per-point lower bound used for truncation checks
        (reference: field_decoder.hpp minInputBytes; Gorilla returns 0)."""
        if self.kind == UnitKind.FLOATN_LOSSY:
            return self.num_lanes
        if self.kind in (UnitKind.FLOAT_LOSSY, UnitKind.INT_DELTA):
            return 1
        if self.kind in (UnitKind.COPY, UnitKind.FLOAT_XOR):
            return int(self.fixed_size)
        return 0  # GORILLA


@dataclass(frozen=True)
class AdaptiveField:
    """V5 adaptive-int field: encoded as a columnar per-chunk section appended
    after the interleaved regular stream (reference: v5_codec.cpp:40-65)."""

    field_index: int
    name: str
    type: FieldType
    offset: int

    @property
    def bytes_per_value(self) -> int:
        return size_of(self.type)

    def section_max_bytes(self, pts: int) -> int:
        """Worst-case section size: mode byte + run-count placeholder + per
        value a raw copy plus a 10-byte varint (v5_codec.cpp:40-65)."""
        return 8 + pts * (self.bytes_per_value + 10)


@dataclass(frozen=True)
class CodecPlan:
    units: Tuple[CodecUnit, ...]
    adaptive: Tuple[AdaptiveField, ...]  # empty unless V5 path
    uses_v5: bool

    @property
    def all_varint_class(self) -> bool:
        return all(u.is_varint_class for u in self.units)

    @property
    def min_encoded_point_bytes(self) -> int:
        return sum(u.min_input_bytes for u in self.units)

    @property
    def max_encoded_point_bytes(self) -> int:
        """Worst-case serialized bytes per point for the regular stream
        (reference: MaxSerializedFieldSize, codec_common.cpp:29-67)."""
        total = 0
        for u in self.units:
            if u.kind in (UnitKind.FLOATN_LOSSY, UnitKind.FLOAT_LOSSY, UnitKind.INT_DELTA):
                total += 10 * u.num_lanes
            elif u.kind == UnitKind.GORILLA:
                total += 11 if size_of(u.types[0]) == 8 else 7
            else:
                total += int(u.fixed_size)
        return total

    def max_stage1_chunk_bytes(self, pts: int) -> int:
        """Worst-case stage-1 payload of a ``pts``-point chunk (regular stream
        plus V5 adaptive sections) — the safe decompression bound; stage 1 can
        EXPAND random data (up to 10 B/varint), so ``pts * point_step`` is not
        a valid bound (reference sizes via MaxSerializedPointSize,
        codec_common.cpp:29-67)."""
        return pts * self.max_encoded_point_bytes + sum(
            f.section_max_bytes(pts) for f in self.adaptive
        )


def _unit_for_field(info: EncodingInfo, f, for_decode: bool) -> CodecUnit:
    """Single-field dispatch (reference: CreateCompatibleEncoder/Decoder,
    codec_common.cpp:116-198), including legacy decode fallbacks."""
    one = (f.offset,), (f.type,), (f.resolution,)
    if f.type == FieldType.FLOAT32:
        if info.encoding_opt == EncodingOptions.LOSSY and f.resolution is not None:
            return CodecUnit(UnitKind.FLOAT_LOSSY, *one)
        if info.encoding_opt == EncodingOptions.LOSSLESS:
            return CodecUnit(UnitKind.FLOAT_XOR, *one)
        if for_decode and f.resolution is not None:
            # Legacy: resolution set but encoding_opt not LOSSY (codec_common.cpp:166-169)
            return CodecUnit(UnitKind.FLOAT_LOSSY, *one)
        return CodecUnit(UnitKind.COPY, *one)
    if f.type == FieldType.FLOAT64:
        if info.encoding_opt == EncodingOptions.LOSSY and f.resolution is not None:
            return CodecUnit(UnitKind.FLOAT_LOSSY, *one)
        if for_decode and f.resolution is not None and info.encoding_opt != EncodingOptions.LOSSLESS:
            return CodecUnit(UnitKind.FLOAT_LOSSY, *one)
        if f.resolution is None and info.version >= 4:
            return CodecUnit(UnitKind.GORILLA, *one)
        return CodecUnit(UnitKind.FLOAT_XOR, *one)
    if f.type in (FieldType.INT8, FieldType.UINT8):
        return CodecUnit(UnitKind.COPY, *one)
    if f.type in (
        FieldType.INT16,
        FieldType.UINT16,
        FieldType.INT32,
        FieldType.UINT32,
        FieldType.INT64,
        FieldType.UINT64,
    ):
        return CodecUnit(UnitKind.INT_DELTA, *one)
    raise ValueError(f"Unsupported field type: {f.type}")


def build_plan(info: EncodingInfo, for_decode: bool = False) -> CodecPlan:
    """Build the codec plan for a schema.

    Mirrors BuildV4Encoders/Decoders (v4_codec.cpp:26-64) and buildV5Plan /
    BuildV5Decoders (v5_codec.cpp:719-740, 965-982).
    """
    if info.encoding_opt == EncodingOptions.NONE:
        units = tuple(
            CodecUnit(UnitKind.COPY, (f.offset,), (f.type,), (f.resolution,)) for f in info.fields
        )
        return CodecPlan(units=units, adaptive=(), uses_v5=False)

    v5 = uses_v5_codec(info)
    units = []
    adaptive = []
    start = leading_lossy_float_count(info)
    if start:
        lead = info.fields[:start]
        units.append(
            CodecUnit(
                UnitKind.FLOATN_LOSSY,
                tuple(f.offset for f in lead),
                tuple(f.type for f in lead),
                tuple(f.resolution for f in lead),
            )
        )
    for i in range(start, len(info.fields)):
        f = info.fields[i]
        if v5 and info.encoding_opt == EncodingOptions.LOSSY and f.type in V5_ADAPTIVE_INT_TYPES:
            adaptive.append(AdaptiveField(field_index=i, name=f.name, type=f.type, offset=f.offset))
        else:
            units.append(_unit_for_field(info, f, for_decode))
    return CodecPlan(units=tuple(units), adaptive=tuple(adaptive), uses_v5=v5)
