"""ROS 2 message layer: PointCloud2 / CompressedPointCloud2 over raw DDS bytes.

Host ingestion equivalent of the reference's ``ros_msg_utils.{hpp,cpp}``:
zero-copy(ish) parse of a serialized ``sensor_msgs/msg/PointCloud2``,
conversion to/from ``point_cloud_interfaces/msg/CompressedPointCloud2``, and
resolution profiles. The codec itself is the framework's
PointcloudEncoder/Decoder (device or host backend).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dfield
from typing import Dict, List, Optional

import numpy as np

from ..codec.pipeline import PointcloudDecoder, PointcloudEncoder
from ..core.header import decode_header
from ..core.types import (
    CompressionOption,
    EncodingInfo,
    EncodingOptions,
    FieldType,
    PointField,
)
from .cdr import CdrDecoder, CdrEncoder, CdrHeader

# A resolution profile maps field name -> resolution; 0 removes the field
# (reference: ros_msg_utils.hpp:165-177).
ResolutionProfile = Dict[str, float]


@dataclass
class RosHeader:
    stamp_sec: int = 0
    stamp_nsec: int = 0
    frame_id: str = ""


@dataclass
class RosPointCloud2:
    """Mirror of sensor_msgs/msg/PointCloud2 (reference: ros_msg_utils.hpp:57-161)."""

    cdr_header: CdrHeader = dfield(default_factory=CdrHeader)
    ros_header: RosHeader = dfield(default_factory=RosHeader)
    height: int = 1
    width: int = 0
    fields: List[PointField] = dfield(default_factory=list)
    point_step: int = 0
    row_step: int = 0
    is_bigendian: bool = False
    data: bytes = b""
    is_dense: bool = True


def get_deserialized_point_cloud_message(dds_msg: bytes) -> RosPointCloud2:
    """Parse a raw DDS PointCloud2 or CompressedPointCloud2 payload
    (reference: ros_msg_utils.cpp:54-97)."""
    cdr = CdrDecoder(bytes(dds_msg))
    out = RosPointCloud2(cdr_header=cdr.header)
    out.ros_header.stamp_sec = cdr.i32()
    out.ros_header.stamp_nsec = cdr.u32()
    out.ros_header.frame_id = cdr.string()
    out.height = cdr.u32()
    out.width = cdr.u32()
    num_fields = cdr.u32()
    for _ in range(num_fields):
        name = cdr.string()
        offset = cdr.u32()
        ftype = cdr.u8()
        # like the reference, PointField.count is read and ignored
        # (ros_msg_utils.cpp:77-78; elements past the first are not encoded)
        _count = cdr.u32()  # not used
        out.fields.append(PointField(name, offset, FieldType(ftype)))
    out.is_bigendian = cdr.bool_()
    out.point_step = cdr.u32()
    out.row_step = cdr.u32()
    out.data = bytes(cdr.byte_seq())
    out.is_dense = cdr.bool_()
    return out


def _write_point_cloud_header(enc: CdrEncoder, pc: RosPointCloud2) -> None:
    """reference: ros_msg_utils.cpp:99-121"""
    enc.i32(pc.ros_header.stamp_sec)
    enc.u32(pc.ros_header.stamp_nsec)
    enc.string(pc.ros_header.frame_id)
    enc.u32(pc.height)
    enc.u32(pc.width)
    enc.u32(len(pc.fields))
    for f in pc.fields:
        enc.string(f.name)
        enc.u32(f.offset)
        enc.u8(int(f.type))
        enc.u32(1)  # count, not used
    enc.bool_(False)  # is_bigendian, not used
    enc.u32(pc.point_step)
    enc.u32(pc.point_step * pc.width)


def to_encoding_info(pc: RosPointCloud2) -> EncodingInfo:
    """Defaults: LOSSY + ZSTD (reference: ros_msg_utils.cpp:123-132)."""
    return EncodingInfo(
        fields=tuple(pc.fields),
        width=pc.width,
        height=pc.height,
        point_step=pc.point_step,
        encoding_opt=EncodingOptions.LOSSY,
        compression_opt=CompressionOption.ZSTD,
    )


def apply_resolution_profile(
    profile: ResolutionProfile,
    fields: List[PointField],
    default_resolution: Optional[float] = None,
) -> List[PointField]:
    """Remove fields with resolution 0; set/override the rest; optionally apply
    a default to FLOAT32 fields not in the profile
    (reference: ros_msg_utils.cpp:217-238)."""
    out = []
    for f in fields:
        res = profile.get(f.name)
        if res is not None and res == 0:
            continue
        if res is not None:
            out.append(PointField(f.name, f.offset, f.type, res))
        elif default_resolution is not None and f.type == FieldType.FLOAT32:
            out.append(PointField(f.name, f.offset, f.type, default_resolution))
        else:
            out.append(f)
    return out


def parse_profile_string(text: str) -> ResolutionProfile:
    """Parse the ``--profile`` mini-language: "xyz:0.001; intensity:0.1;
    timestamp:remove" — 'xyz' expands to x,y,z; 'remove' means 0
    (reference: mcap_converter.cpp:325-353)."""
    profile: ResolutionProfile = {}
    for part in text.split(";"):
        part = part.strip()
        if not part:
            continue
        name, _, value = part.partition(":")
        name = name.strip()
        value = value.strip()
        res = 0.0 if value.lower() in ("remove", "drop") else float(value)
        if name == "xyz":
            profile["x"] = profile["y"] = profile["z"] = res
        else:
            profile[name] = res
    return profile


def convert_point_cloud2_to_compressed(
    pc: RosPointCloud2,
    encoding_info: EncodingInfo,
    encoder: Optional[PointcloudEncoder] = None,
    payload: Optional[bytes] = None,
) -> bytes:
    """Serialized PointCloud2 content -> serialized CompressedPointCloud2 DDS
    message (reference: ros_msg_utils.cpp:167-213). ``payload`` supplies a
    precomputed cloudini stream (batched encode paths)."""
    enc = CdrEncoder(pc.cdr_header)
    _write_point_cloud_header(enc, pc)
    size_offset = enc.position
    enc.u32(0)  # placeholder patched below

    if len(pc.data) == 0:
        enc.bool_(pc.is_dense)
        enc.string("cloudini")
        return enc.tobytes()

    if encoding_info.point_step == 0:
        raise ValueError("convertPointCloud2ToCompressedCloud: point_step cannot be 0")
    if payload is None:
        # Derive point count from actual data size, never attacker-controlled
        # width*height (reference: ros_msg_utils.cpp:193-194)
        codec = encoder if encoder is not None else PointcloudEncoder(encoding_info)
        n_points = len(pc.data) // encoding_info.point_step
        payload = codec.encode(pc.data[: n_points * encoding_info.point_step])
    enc.patch_u32(size_offset, len(payload))
    enc.raw(payload)
    enc.bool_(pc.is_dense)
    enc.string("cloudini")
    return enc.tobytes()


def convert_compressed_to_point_cloud2(
    pc: RosPointCloud2, decoder: Optional[PointcloudDecoder] = None
) -> bytes:
    """CompressedPointCloud2 content (pc.data = cloudini stream) -> serialized
    PointCloud2 DDS message (reference: ros_msg_utils.cpp:135-165)."""
    enc = CdrEncoder(pc.cdr_header)
    _write_point_cloud_header(enc, pc)
    cloud_size = pc.width * pc.height * pc.point_step
    enc.u32(cloud_size)
    if cloud_size == 0:
        enc.bool_(pc.is_dense)
        return enc.tobytes()
    info, header_len = decode_header(pc.data)
    codec = decoder if decoder is not None else PointcloudDecoder()
    rows = codec.decode(info, pc.data[header_len:])
    payload = rows.tobytes()[:cloud_size]
    if len(payload) < cloud_size:
        # the message-level width*height may exceed the embedded stream's
        # point count; the declared CDR sequence length must still be met
        # (the reference decodes into a pre-sized cloud_size buffer)
        payload += b"\0" * (cloud_size - len(payload))
    enc.raw(payload)
    enc.bool_(pc.is_dense)
    return enc.tobytes()


def serialize_point_cloud2(pc: RosPointCloud2) -> bytes:
    """Plain PointCloud2 serialization (for tests / synthetic bags)."""
    enc = CdrEncoder(pc.cdr_header)
    _write_point_cloud_header(enc, pc)
    enc.byte_seq(pc.data)
    enc.bool_(pc.is_dense)
    return enc.tobytes()
