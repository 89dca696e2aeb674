"""DDS/CDR (de)serializer — host ingestion equivalent of the reference's
vendored nanocdr (``cloudini_lib/include/cloudini_lib/contrib/nanocdr.hpp``).

Wire rules replicated:
  * 4-byte encapsulation header: [0, endianness|encoding, 0, 0]
    (nanocdr.hpp:252-291, 373-387)
  * primitive alignment is relative to the byte AFTER the encapsulation
    header; 8-byte primitives align to 8 under DDS_CDR/XCDRv1 and to 4 under
    XCDRv2 (nanocdr.hpp:135-139, 291)
  * string: u32 (len+1) + bytes + NUL; byte sequences: u32 len + raw bytes

Only little-endian payloads are produced (ROS 2 default); big-endian inputs are
byte-swapped on read.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

PLAIN_CDR = 0x0
PL_CDR = 0x2
PLAIN_CDR2 = 0x4

LITTLE = 1
BIG = 0


@dataclass
class CdrHeader:
    endianness: int = LITTLE
    encoding: int = PLAIN_CDR
    # resolved CDR version: 1=DDS_CDR, 2=XCDRv1, 3=XCDRv2
    version: int = 1

    @property
    def align64(self) -> int:
        return 4 if self.version == 3 else 8


class CdrDecoder:
    def __init__(self, data: bytes, default_version: int = 1):
        if len(data) < 4 or data[0] != 0:
            raise ValueError("Invalid CDR header: expected first byte to be 0")
        encapsulation = data[1]
        self.header = CdrHeader(
            endianness=encapsulation & 0x1,
            encoding=encapsulation & ~0x1,
            version=default_version,
        )
        if self.header.encoding == PLAIN_CDR2:
            if self.header.version >= 2:
                self.header.version = 3
            else:
                raise ValueError("Unexpected encoding received.")
        elif self.header.encoding == PL_CDR:
            if self.header.version >= 2:
                self.header.version = 2
            else:
                raise ValueError("Unexpected encoding received.")
        elif self.header.encoding != PLAIN_CDR:
            raise ValueError("Unexpected encoding received.")
        if data[2] != 0 or data[3] != 0:
            raise ValueError("Extended header not supported")
        self._data = data
        self._pos = 4
        self._le = self.header.endianness == LITTLE

    def _align(self, size: int) -> None:
        size = self.header.align64 if size == 8 else size
        rel = self._pos - 4
        pad = (size - (rel % size)) & (size - 1)
        self._pos += pad

    def _prim(self, fmt: str, size: int):
        if size >= 2:
            self._align(size)
        end = "<" if self._le else ">"
        (v,) = struct.unpack_from(end + fmt, self._data, self._pos)
        self._pos += size
        return v

    def u8(self):
        return self._prim("B", 1)

    def i8(self):
        return self._prim("b", 1)

    def bool_(self):
        return bool(self._prim("B", 1))

    def u16(self):
        return self._prim("H", 2)

    def u32(self):
        return self._prim("I", 4)

    def i32(self):
        return self._prim("i", 4)

    def u64(self):
        return self._prim("Q", 8)

    def f32(self):
        return self._prim("f", 4)

    def f64(self):
        return self._prim("d", 8)

    def string(self) -> str:
        n = self.u32()
        raw = self._data[self._pos : self._pos + n]
        self._pos += n
        return raw.split(b"\0", 1)[0].decode("utf-8")

    def byte_seq(self) -> memoryview:
        n = self.u32()
        out = memoryview(self._data)[self._pos : self._pos + n]
        if len(out) != n:
            raise ValueError("CDR: truncated byte sequence")
        self._pos += n
        return out


class CdrEncoder:
    def __init__(self, header: CdrHeader | None = None):
        self.header = header or CdrHeader()
        self._buf = bytearray(4)
        self._buf[0] = 0
        self._buf[1] = self.header.endianness | self.header.encoding
        self._buf[2] = 0
        self._buf[3] = 0

    def _align(self, size: int) -> None:
        size = self.header.align64 if size == 8 else size
        rel = len(self._buf) - 4
        pad = (size - (rel % size)) & (size - 1)
        self._buf += b"\0" * pad

    def _prim(self, fmt: str, size: int, value) -> "CdrEncoder":
        if size >= 2:
            self._align(size)
        # honor the encapsulation's endianness flag like the reference's
        # encoder, which byte-swaps on mismatch (nanocdr.hpp:402-408)
        self._buf += struct.pack(("<" if self.header.endianness == LITTLE else ">") + fmt, value)
        return self

    def u8(self, v):
        return self._prim("B", 1, v)

    def bool_(self, v):
        return self._prim("B", 1, 1 if v else 0)

    def u16(self, v):
        return self._prim("H", 2, v)

    def u32(self, v):
        return self._prim("I", 4, v)

    def i32(self, v):
        return self._prim("i", 4, v)

    def u64(self, v):
        return self._prim("Q", 8, v)

    def f32(self, v):
        return self._prim("f", 4, v)

    def f64(self, v):
        return self._prim("d", 8, v)

    def string(self, s: str) -> "CdrEncoder":
        raw = s.encode("utf-8")
        self.u32(len(raw) + 1)
        self._buf += raw + b"\0"
        return self

    def byte_seq(self, data) -> "CdrEncoder":
        self.u32(len(data))
        self._buf += bytes(data)
        return self

    def raw(self, data) -> "CdrEncoder":
        """Append bytes with no length prefix (for in-place payload patching)."""
        self._buf += bytes(data)
        return self

    @property
    def position(self) -> int:
        return len(self._buf)

    def patch_u32(self, offset: int, value: int) -> None:
        end = "<" if self.header.endianness == LITTLE else ">"
        struct.pack_into(end + "I", self._buf, offset, value)

    def tobytes(self) -> bytes:
        return bytes(self._buf)
