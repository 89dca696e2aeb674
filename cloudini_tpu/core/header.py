"""Container header codec — byte-identical to the reference wire format.

Layout (reference: cloudini.cpp:294-428):
  magic ``CLOUDINI_V`` + two ASCII version digits, then either
  - YAML header: ``\\n`` + YAML text + ``\\0``  (default), or
  - legacy binary header (fixed-width fields + length-prefixed names).

The magic version digits are authoritative over the YAML ``version:`` field
(reference: cloudini.cpp:388-392). This is cold-path host code: it runs once per
stream, never on device.
"""

from __future__ import annotations

import struct
from typing import Tuple

from .types import (
    KENCODING_VERSION,
    MAGIC_HEADER,
    CompressionOption,
    EncodingInfo,
    EncodingOptions,
    FieldType,
    PointField,
)


def _format_resolution(value: float) -> str:
    """C++ ``ostream << float`` default formatting == printf %g with 6 significant
    digits (reference: cloudini.cpp:184 writes the raw float member)."""
    return "%g" % value


def encoding_info_to_yaml(info: EncodingInfo) -> str:
    """Bit-exact equivalent of EncodingInfoToYAML (reference: cloudini.cpp:165-190)."""
    lines = [
        f"version: {int(info.version)}",
        f"width: {int(info.width)}",
        f"height: {int(info.height)}",
        f"point_step: {int(info.point_step)}",
        f"encoding_opt: {info.encoding_opt.name}",
        f"compression_opt: {info.compression_opt.name}",
    ]
    if info.encoding_config:
        lines.append(f"encoding_config: {info.encoding_config}")
    lines.append("fields:")
    for f in info.fields:
        lines.append(f"  - name: {f.name}")
        lines.append(f"    offset: {int(f.offset)}")
        lines.append(f"    type: {f.type.name}")
        if f.resolution is not None:
            lines.append(f"    resolution: {_format_resolution(f.resolution)}")
        else:
            lines.append("    resolution: null")
    return "\n".join(lines) + "\n"


def encoding_info_from_yaml(yaml_text: str) -> EncodingInfo:
    """Parser for self-generated YAML only, mirroring the reference's mini-parser
    guarantees (reference: cloudini.hpp:140-142, yaml_parser.hpp)."""
    top = {}
    fields = []
    cur = None
    for raw_line in yaml_text.split("\n"):
        line = raw_line.rstrip()
        if not line.strip():
            continue
        stripped = line.strip()
        if line.startswith("  - "):
            cur = {}
            fields.append(cur)
            stripped = stripped[2:].strip()
        if ":" not in stripped:
            continue
        key, _, val = stripped.partition(":")
        key = key.strip()
        val = val.strip()
        if line.startswith("    ") or (line.startswith("  - ") and cur is not None):
            if cur is not None:
                cur[key] = val
        elif line.startswith("  ") and cur is not None and key in ("name", "offset", "type", "resolution"):
            cur[key] = val
        else:
            top[key] = val

    def _enum_from(val: str, enum_cls):
        try:
            return enum_cls[val]
        except KeyError:
            return enum_cls(int(val))

    pfields = []
    for fd in fields:
        res = fd.get("resolution", "null")
        pfields.append(
            PointField(
                name=fd.get("name", ""),
                offset=int(fd["offset"]),
                type=_enum_from(fd["type"], FieldType),
                resolution=None if res == "null" else float(res),
            )
        )
    return EncodingInfo(
        fields=tuple(pfields),
        width=int(top.get("width", 0)),
        height=int(top.get("height", 1)),
        point_step=int(top.get("point_step", 0)),
        encoding_opt=_enum_from(top.get("encoding_opt", "LOSSY"), EncodingOptions),
        compression_opt=_enum_from(top.get("compression_opt", "ZSTD"), CompressionOption),
        encoding_config=top.get("encoding_config", ""),
        version=int(top.get("version", KENCODING_VERSION)),
    )


def _magic_bytes(version: int) -> bytes:
    return MAGIC_HEADER + bytes([ord("0") + version // 10, ord("0") + version % 10])


def encode_header(info: EncodingInfo, binary: bool = False) -> bytes:
    """EncodeHeader equivalent (reference: cloudini.cpp:294-344)."""
    out = bytearray(_magic_bytes(int(info.version)))
    if not binary:
        out += b"\n"
        out += encoding_info_to_yaml(info).encode("utf-8")
        out += b"\0"
        return bytes(out)
    out += struct.pack("<III", int(info.width), int(info.height), int(info.point_step))
    out += struct.pack("<BBH", int(info.encoding_opt), int(info.compression_opt), len(info.fields))
    for f in info.fields:
        name = f.name.encode("utf-8")
        out += struct.pack("<H", len(name)) + name
        out += struct.pack("<IBf", int(f.offset), int(f.type), -1.0 if f.resolution is None else f.resolution)
    return bytes(out)


def decode_header(data: bytes) -> Tuple[EncodingInfo, int]:
    """DecodeHeader equivalent; returns (info, header_byte_count)
    (reference: cloudini.cpp:353-428)."""
    if len(data) < len(MAGIC_HEADER) + 2:
        raise ValueError("Input too small to contain Cloudini header")
    if data[: len(MAGIC_HEADER)] != MAGIC_HEADER:
        raise ValueError(f"Invalid magic header. Expected 'CLOUDINI_V', got: {data[:10]!r}")
    pos = len(MAGIC_HEADER)

    def _digit(c: int) -> int:
        return c - ord("0") if ord("0") <= c <= ord("9") else 0

    version = _digit(data[pos]) * 10 + _digit(data[pos + 1])
    pos += 2
    if version < 2 or version > KENCODING_VERSION:
        raise ValueError(f"Unsupported encoding version: {version}")

    # YAML payload starts with newline followed by a non-brace; legacy binary
    # payload starts with the brace of an inline schema (cloudini.cpp:377-393).
    # Inherited quirk, kept for interop: a BINARY header whose width's low
    # byte is 0x0A also matches this detector and misroutes — exactly as the
    # reference's own detector does on the same bytes.
    if len(data) >= pos + 2 and data[pos] == ord("\n") and data[pos + 1] != ord("{"):
        pos += 1
        null_pos = data.find(b"\0", pos)
        if null_pos < 0:
            raise ValueError("Malformed YAML header: missing null terminator")
        info = encoding_info_from_yaml(data[pos:null_pos].decode("utf-8"))
        info = info.with_(version=version)  # magic version is authoritative
        return info, null_pos + 1

    # Binary header
    width, height, point_step = struct.unpack_from("<III", data, pos)
    pos += 12
    enc, comp, nfields = struct.unpack_from("<BBH", data, pos)
    pos += 4
    pfields = []
    for _ in range(nfields):
        (name_len,) = struct.unpack_from("<H", data, pos)
        pos += 2
        name = data[pos : pos + name_len].decode("utf-8")
        pos += name_len
        offset, ftype, res = struct.unpack_from("<IBf", data, pos)
        pos += 9
        pfields.append(
            PointField(name=name, offset=offset, type=FieldType(ftype), resolution=res if res > 0 else None)
        )
    info = EncodingInfo(
        fields=tuple(pfields),
        width=width,
        height=height,
        point_step=point_step,
        encoding_opt=EncodingOptions(enc),
        compression_opt=CompressionOption(comp),
        version=version,
    )
    return info, pos
