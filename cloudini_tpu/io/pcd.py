"""PCD (Point Cloud Data) file reader/writer.

Host-side ingestion equivalent of the reference's PCL shell
(``cloudini_lib/src/pcl_conversion.cpp``): a PCD file maps to
``(EncodingInfo schema, (n, point_step) uint8 rows)``. Supports all three
DATA modes: ascii, binary, and binary_compressed (PCL's layout: a u32
compressed-size + u32 uncompressed-size header, LZF-compressed field-major
(SOA) data — the LZF codec here is implemented from the public liblzf
format: literal runs of <= 32 bytes and back-references of 3..264 bytes at
distances <= 8192).
"""

from __future__ import annotations

import io as _io
from typing import Optional, Tuple

import numpy as np

from ..core.types import EncodingInfo, FieldType, PointField

_PCD_TYPE = {
    ("F", 4): FieldType.FLOAT32,
    ("F", 8): FieldType.FLOAT64,
    ("I", 1): FieldType.INT8,
    ("I", 2): FieldType.INT16,
    ("I", 4): FieldType.INT32,
    ("I", 8): FieldType.INT64,
    ("U", 1): FieldType.UINT8,
    ("U", 2): FieldType.UINT16,
    ("U", 4): FieldType.UINT32,
    ("U", 8): FieldType.UINT64,
}
_PCD_TYPE_INV = {v: k for k, v in _PCD_TYPE.items()}

_NP_FMT = {
    FieldType.FLOAT32: np.float32,
    FieldType.FLOAT64: np.float64,
    FieldType.INT8: np.int8,
    FieldType.INT16: np.int16,
    FieldType.INT32: np.int32,
    FieldType.INT64: np.int64,
    FieldType.UINT8: np.uint8,
    FieldType.UINT16: np.uint16,
    FieldType.UINT32: np.uint32,
    FieldType.UINT64: np.uint64,
}


def _lzf_decompress(src: bytes, expected: int) -> bytes:
    """liblzf stream decoder: ctrl < 32 -> literal run of ctrl+1 bytes;
    else back-reference of (ctrl >> 5) + 2 bytes (+ an extension byte when
    the 3-bit length field saturates) at distance ((ctrl & 31) << 8) +
    next + 1."""
    out = bytearray()
    i = 0
    n = len(src)
    while i < n:
        ctrl = src[i]
        i += 1
        if ctrl < 32:
            run = ctrl + 1
            if i + run > n:
                raise ValueError("truncated LZF literal run")
            out += src[i: i + run]
            i += run
        else:
            length = ctrl >> 5
            if length == 7:
                if i >= n:
                    raise ValueError("truncated LZF length extension")
                length += src[i]
                i += 1
            if i >= n:
                raise ValueError("truncated LZF back-reference")
            ref = len(out) - ((ctrl & 0x1F) << 8) - src[i] - 1
            i += 1
            if ref < 0:
                raise ValueError("LZF back-reference before stream start")
            for _ in range(length + 2):
                out.append(out[ref])
                ref += 1
    if len(out) != expected:
        raise ValueError(
            f"LZF output size {len(out)} != header size {expected}")
    return bytes(out)


def _lzf_compress(src: bytes) -> bytes:
    """Greedy hash-3 LZF encoder (same format family as liblzf; any
    conforming decoder — including PCL's — accepts the stream)."""
    n = len(src)
    out = bytearray()
    table = {}
    lit_start = 0
    i = 0

    def flush_literals(end):
        j = lit_start
        while j < end:
            run = min(32, end - j)
            out.append(run - 1)
            out.extend(src[j: j + run])
            j += run

    while i + 2 < n:
        key = src[i] | (src[i + 1] << 8) | (src[i + 2] << 16)
        cand = table.get(key, -1)
        table[key] = i
        dist = i - cand - 1
        if cand >= 0 and 0 <= dist < 8192 and src[cand: cand + 3] == src[i: i + 3]:
            ml = 3
            max_ml = min(264, n - i)
            while ml < max_ml and src[cand + ml] == src[i + ml]:
                ml += 1
            flush_literals(i)
            length = ml - 2
            if length < 7:
                out.append((length << 5) | (dist >> 8))
            else:
                out.append((7 << 5) | (dist >> 8))
                out.append(length - 7)
            out.append(dist & 0xFF)
            i += ml
            lit_start = i
        else:
            i += 1
    flush_literals(n)
    return bytes(out)


def read_pcd(path: str) -> Tuple[EncodingInfo, np.ndarray]:
    """Returns (schema with packed offsets, (n, point_step) uint8 rows)."""
    with open(path, "rb") as f:
        data = f.read()
    header_lines = []
    pos = 0
    while True:
        nl = data.find(b"\n", pos)
        if nl < 0:  # truncated header: no newline-terminated DATA line
            raise ValueError("malformed PCD: missing DATA line")
        line = data[pos:nl].decode("ascii", errors="replace")
        pos = nl + 1
        if line.startswith("#"):
            continue
        header_lines.append(line)
        if line.startswith("DATA"):
            break
    hdr = {}
    for line in header_lines:
        parts = line.split()
        if parts:
            hdr[parts[0]] = parts[1:]
    names = hdr["FIELDS"]
    sizes = [int(s) for s in hdr["SIZE"]]
    types = hdr["TYPE"]
    counts = [int(c) for c in hdr.get("COUNT", ["1"] * len(names))]
    width = int(hdr["WIDTH"][0])
    height = int(hdr.get("HEIGHT", ["1"])[0])
    n_points = int(hdr.get("POINTS", [width * height])[0])
    mode = hdr["DATA"][0]

    fields = []
    offset = 0
    for name, size, typ, count in zip(names, sizes, types, counts):
        ftype = _PCD_TYPE[(typ, size)]
        for c in range(count):
            fname = name if count == 1 else f"{name}_{c}"
            fields.append(PointField(fname, offset, ftype))
            offset += size
    point_step = offset

    if mode == "binary":
        body = np.frombuffer(data, dtype=np.uint8, count=n_points * point_step, offset=pos)
        rows = body.reshape(n_points, point_step).copy()
    elif mode == "binary_compressed":
        comp_size = int.from_bytes(data[pos: pos + 4], "little")
        raw_size = int.from_bytes(data[pos + 4: pos + 8], "little")
        soa = _lzf_decompress(data[pos + 8: pos + 8 + comp_size], raw_size)
        # PCL stores field-major (SOA): all values of field 0, then field 1…
        rows = np.zeros((n_points, point_step), dtype=np.uint8)
        off = 0
        arr = np.frombuffer(soa, np.uint8)
        for f in fields:
            span = n_points * f.size
            rows[:, f.offset: f.offset + f.size] = arr[off: off + span].reshape(
                n_points, f.size)
            off += span
    elif mode == "ascii":
        text = data[pos:].decode("ascii")
        cols = np.loadtxt(_io.StringIO(text), ndmin=2)
        rows = np.zeros((n_points, point_step), dtype=np.uint8)
        for i, f in enumerate(fields):
            vals = cols[:, i].astype(_NP_FMT[f.type])
            b = vals.reshape(-1, 1).view(np.uint8)
            rows[:, f.offset : f.offset + vals.dtype.itemsize] = b.reshape(n_points, vals.dtype.itemsize)
    else:
        raise ValueError(f"Unsupported PCD DATA mode: {mode}")

    info = EncodingInfo(fields=tuple(fields), width=width, height=height, point_step=point_step)
    return info, rows


def write_pcd(path: str, info: EncodingInfo, rows: np.ndarray, binary: bool = True,
              compressed: bool = False) -> None:
    """``compressed=True`` (with binary) writes DATA binary_compressed:
    field-major (SOA) reorganization + LZF, the PCL wire layout."""
    names = [f.name for f in info.fields]
    sizes = [f.size for f in info.fields]
    types = [_PCD_TYPE_INV[f.type][0] for f in info.fields]
    n = rows.shape[0]
    header = (
        "# .PCD v0.7 - Point Cloud Data file format\n"
        "VERSION 0.7\n"
        f"FIELDS {' '.join(names)}\n"
        f"SIZE {' '.join(map(str, sizes))}\n"
        f"TYPE {' '.join(types)}\n"
        f"COUNT {' '.join(['1'] * len(names))}\n"
        f"WIDTH {info.width}\n"
        f"HEIGHT {info.height}\n"
        "VIEWPOINT 0 0 0 1 0 0 0\n"
        f"POINTS {n}\n"
    )
    with open(path, "wb") as f:
        if binary and compressed:
            f.write((header + "DATA binary_compressed\n").encode("ascii"))
            soa = bytearray()
            for fld in info.fields:
                soa += rows[:, fld.offset: fld.offset + fld.size].tobytes()
            comp = _lzf_compress(bytes(soa))
            f.write(len(comp).to_bytes(4, "little"))
            f.write(len(soa).to_bytes(4, "little"))
            f.write(comp)
        elif binary:
            f.write((header + "DATA binary\n").encode("ascii"))
            # pack fields contiguously in schema order
            packed_step = sum(sizes)
            if info.point_step == packed_step and all(
                info.fields[i].offset == sum(sizes[:i]) for i in range(len(sizes))
            ):
                f.write(rows.tobytes())
            else:
                out = np.zeros((n, packed_step), dtype=np.uint8)
                off = 0
                for fld in info.fields:
                    out[:, off : off + fld.size] = rows[:, fld.offset : fld.offset + fld.size]
                    off += fld.size
                f.write(out.tobytes())
        else:
            f.write((header + "DATA ascii\n").encode("ascii"))
            cols = []
            for fld in info.fields:
                b = rows[:, fld.offset : fld.offset + fld.size]
                cols.append(b.copy().view(_NP_FMT[fld.type]).reshape(-1))
            # %.9g / %.17g round-trip binary32 / binary64 exactly
            fmt = [
                "%.9g" if fld.type == FieldType.FLOAT32
                else "%.17g" if fld.type == FieldType.FLOAT64
                else "%d"
                for fld in info.fields
            ]
            lines = []
            for i in range(n):
                lines.append(" ".join(f % c[i] for f, c in zip(fmt, cols)))
            f.write(("\n".join(lines) + "\n").encode("ascii"))
