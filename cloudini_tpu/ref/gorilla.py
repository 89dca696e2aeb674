"""Gorilla/Chimp-style bit-packed XOR codec for lossless floats.

Wire rules (reference: field_encoder.hpp:142-312, field_decoder.hpp:155-300):
  * first value: raw 32/64 bits
  * same value: 1 bit '0'
  * else '1', then:
      - '0' + meaningful bits if the XOR window fits the previous window
      - '1' + leading(5b, clamped to 31) + (meaningful-1)(6b) + meaningful bits
  * CRUCIAL: the encoder byte-aligns after EVERY value (field_encoder.hpp:294-303),
    so each value occupies a whole number of bytes, LSB-first within each byte.
    The decoder likewise discards padding bits per value (field_decoder.hpp:296-300).

The per-value byte alignment is what makes block-parallel decode *possible*
(every value starts on a byte boundary); the value-length chain is still
sequential state (prev window), so this codec stays a per-chunk sequential scan
(chunks themselves are data-parallel). Here: a numpy/Python implementation used
as the wire kernel of truth; the device path runs chunks in parallel.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

_LEADING_SENTINEL = 255


def _clz(x: int, bits: int) -> int:
    return bits - x.bit_length() if x else bits


def _ctz(x: int, bits: int) -> int:
    return (x & -x).bit_length() - 1 if x else bits


def encode_column(bits_values: np.ndarray, type_bits: int) -> Tuple[bytes, np.ndarray]:
    """Encode one chunk-column of raw float bit patterns (uint32/uint64 array).

    Returns (payload bytes, per-value byte lengths). Per-value byte alignment
    means each value's bits land in its own `ceil(nbits/8)` bytes.
    """
    out = bytearray()
    lengths = np.zeros(len(bits_values), dtype=np.int32)
    prev_bits = 0
    prev_leading = _LEADING_SENTINEL
    prev_trailing = 0
    first = True
    vals = [int(v) for v in bits_values]
    for i, cur in enumerate(vals):
        acc = 0
        nbits = 0
        if first:
            first = False
            acc = cur
            nbits = type_bits
            prev_bits = cur
        else:
            xor_val = cur ^ prev_bits
            prev_bits = cur
            if xor_val == 0:
                acc = 0
                nbits = 1
            else:
                acc = 1  # '1' flag (LSB-first)
                nbits = 1
                leading = _clz(xor_val, type_bits)
                trailing = _ctz(xor_val, type_bits)
                if prev_leading != _LEADING_SENTINEL and leading >= prev_leading and trailing >= prev_trailing:
                    # control '0' + meaningful bits shifted into prev window
                    nbits += 1  # '0' bit is zero, nothing to OR
                    meaningful = type_bits - prev_leading - prev_trailing
                    acc |= (xor_val >> prev_trailing) << nbits
                    nbits += meaningful
                else:
                    acc |= 1 << nbits  # control '1'
                    nbits += 1
                    stored_leading = min(leading, 31)
                    meaningful = type_bits - stored_leading - trailing
                    acc |= stored_leading << nbits
                    nbits += 5
                    acc |= (meaningful - 1) << nbits
                    nbits += 6
                    acc |= (xor_val >> trailing) << nbits
                    nbits += meaningful
                    prev_leading = stored_leading
                    prev_trailing = trailing
        nbytes = (nbits + 7) // 8
        out += acc.to_bytes(nbytes, "little")
        lengths[i] = nbytes
    return bytes(out), lengths


def decode_column(
    stream: memoryview, count: int, type_bits: int, start: int = 0
) -> Tuple[np.ndarray, int]:
    """Decode ``count`` values from a byte-aligned Gorilla stream.

    Returns (uint32/uint64 bit patterns, bytes consumed). The per-value length is
    computed from the control bits of the first bytes, so the scan advances in
    whole bytes (no global bit cursor).
    """
    dtype = np.uint64 if type_bits == 64 else np.uint32
    out = np.zeros(count, dtype=dtype)
    pos = start
    prev_bits = 0
    prev_leading = _LEADING_SENTINEL
    prev_trailing = 0
    n = len(stream)

    for i in range(count):
        if pos >= n:
            raise ValueError("Gorilla: truncated input")
        if i == 0:
            nbytes = type_bits // 8
            if pos + nbytes > n:
                raise ValueError("Gorilla: truncated input")
            value = int.from_bytes(stream[pos : pos + nbytes], "little")
            pos += nbytes
            prev_bits = value
            out[i] = value
            continue
        b0 = stream[pos]
        if (b0 & 1) == 0:
            out[i] = prev_bits
            pos += 1
            continue
        if (b0 & 2) == 0:
            # window reuse: 2 control bits + meaningful bits. A reuse before
            # any window, or a stale window that no longer fits the type, is
            # corrupt input (a valid encoder cannot emit it)
            meaningful = type_bits - prev_leading - prev_trailing
            if prev_leading == _LEADING_SENTINEL or not 1 <= meaningful <= type_bits:
                raise ValueError("Gorilla: corrupt window parameters")
            nbits = 2 + meaningful
            nbytes = (nbits + 7) // 8
            if pos + nbytes > n:
                raise ValueError("Gorilla: truncated input")
            acc = int.from_bytes(stream[pos : pos + nbytes], "little")
            bits = (acc >> 2) & ((1 << meaningful) - 1)
            xor_val = bits << prev_trailing
        else:
            # new window: 2 + 5 + 6 header bits, then meaningful bits
            if pos + 2 > n:
                raise ValueError("Gorilla: truncated input")
            head = int.from_bytes(stream[pos : pos + 2], "little")
            stored_leading = (head >> 2) & 0x1F
            meaningful = ((head >> 7) & 0x3F) + 1
            nbits = 13 + meaningful
            nbytes = (nbits + 7) // 8
            if pos + nbytes > n:
                raise ValueError("Gorilla: truncated input")
            if stored_leading + meaningful > type_bits:
                raise ValueError("Gorilla: corrupt window parameters")
            acc = int.from_bytes(stream[pos : pos + nbytes], "little")
            bits = (acc >> 13) & ((1 << meaningful) - 1)
            trailing = type_bits - stored_leading - meaningful
            xor_val = bits << trailing
            prev_leading = stored_leading
            prev_trailing = trailing
        value = xor_val ^ prev_bits
        prev_bits = value
        out[i] = value
        pos += nbytes
    return out, pos - start
