"""Stage-2 general-purpose chunk compression (LZ4 block / ZSTD frame / NONE).

Equivalent of CompressChunk/DecompressChunk (reference: codec_common.cpp:220-299):
LZ4 uses the block format via ``LZ4_compress_default``/``LZ4_decompress_safe``
(bound here with ctypes against the system liblz4), ZSTD uses level 1 via the
``zstandard`` package (libzstd 1.5.7 — the same version the reference vendors,
so level-1 output is byte-compatible). Host-side: stage 2 runs on CPU overlapped
with device stage-1 dispatch.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import struct
import threading
from typing import Optional

import numpy as np

from ..core.types import CompressionOption

_LZ4 = None


def _lz4():
    global _LZ4
    if _LZ4 is None:
        path = ctypes.util.find_library("lz4") or "liblz4.so.1"
        lib = ctypes.CDLL(path)
        lib.LZ4_compress_default.restype = ctypes.c_int
        lib.LZ4_compress_default.argtypes = [
            ctypes.c_char_p,
            ctypes.c_void_p,  # dst: a raw numpy buffer (no zero-fill/copy)
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.LZ4_decompress_safe.restype = ctypes.c_int
        lib.LZ4_decompress_safe.argtypes = [
            ctypes.c_char_p,
            ctypes.c_void_p,  # dst: a raw numpy buffer (no zero-fill/copy)
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.LZ4_compressBound.restype = ctypes.c_int
        lib.LZ4_compressBound.argtypes = [ctypes.c_int]
        _LZ4 = lib
    return _LZ4


def lz4_compress_bound(n: int) -> int:
    """LZ4_COMPRESSBOUND macro: n + n/255 + 16."""
    return n + n // 255 + 16


def zstd_compress_bound(n: int) -> int:
    """ZSTD_COMPRESSBOUND macro."""
    margin = ((128 << 10) - n) >> 11 if n < (128 << 10) else 0
    return n + (n >> 8) + margin


def compress_chunk(compression: CompressionOption, data: bytes) -> bytes:
    if compression == CompressionOption.NONE:
        return data
    if compression == CompressionOption.LZ4:
        lib = _lz4()
        bound = lz4_compress_bound(len(data))
        # uninitialized numpy dst: see decompress_chunk (the zero-fill +
        # .raw copy of the worst-case bound buffer is pure overhead)
        out = np.empty(bound, np.uint8)
        n = lib.LZ4_compress_default(data, out.ctypes.data, len(data), bound)
        if n <= 0:
            raise RuntimeError("LZ4 compression failed")
        return out[:n].tobytes()
    if compression == CompressionOption.ZSTD:
        # ZSTD_compress(..., level=1): one-shot frame, content size included.
        # Contexts are cached per thread: rebuilding ZstdCompressor per chunk
        # cost ~0.4 ms/call — 2x the actual compression of a 0.4 MB stage-1
        # stream (r5 latency profile; the reference reuses its context the
        # same way inside ZSTD_compress's internal workspace)
        return _zstd_cctx().compress(data)
    raise ValueError(f"Unsupported compression option {compression}")


_TLS = threading.local()


def _zstd_cctx():
    c = getattr(_TLS, "cctx", None)
    if c is None:
        import zstandard

        c = _TLS.cctx = zstandard.ZstdCompressor(level=1)
    return c


def _zstd_dctx():
    d = getattr(_TLS, "dctx", None)
    if d is None:
        import zstandard

        d = _TLS.dctx = zstandard.ZstdDecompressor()
    return d


def decompress_chunk(compression: CompressionOption, data: bytes, max_size: int) -> bytes:
    if compression == CompressionOption.NONE:
        return data
    if compression == CompressionOption.LZ4:
        lib = _lz4()
        # decompress straight into an uninitialized numpy buffer:
        # create_string_buffer's zero-fill plus the .raw full-size copy cost
        # ~30% of host LZ4 decode (measured 360 vs the reference's 518 MB/s)
        out = np.empty(max_size, np.uint8)
        n = lib.LZ4_decompress_safe(data, out.ctypes.data, len(data), max_size)
        if n < 0:
            raise RuntimeError("LZ4 decompression failed")
        return out[:n].tobytes()
    if compression == CompressionOption.ZSTD:
        return _zstd_dctx().decompress(data, max_output_size=max_size)
    raise ValueError(f"Unsupported compression option {compression}")


def write_stage1_chunk(compression: CompressionOption, stage1: bytes) -> bytes:
    """Chunk framing: u32 LE size prefix + (compressed) payload
    (reference: chunk_writer.cpp:27-48)."""
    payload = compress_chunk(compression, stage1)
    if len(payload) > 0xFFFFFFFF:
        raise ValueError("Chunk too large")
    return struct.pack("<I", len(payload)) + payload


class Stage2Worker:
    """One background compression thread overlapping host stage-2 with device
    dispatch — the TPU-native equivalent of the reference's compressionWorker
    + double buffer (cloudini.cpp:453-499, 572-619). The main thread's device
    waits are tunnel/IO waits that release the GIL, and liblz4/libzstd calls
    release it during compression, so one worker genuinely overlaps even on a
    single host core whenever the main thread is device-bound.

    submit() enqueues (callable returning bytes) -> Future; results() joins in
    submission order. Worker exceptions surface at results(), and the worker
    pool survives them (Executor threads are respawned by the pool), matching
    the reference's capture-and-respawn (cloudini.cpp:536-553)."""

    def __init__(self):
        from concurrent.futures import ThreadPoolExecutor

        self._pool = ThreadPoolExecutor(max_workers=1, thread_name_prefix="cldn-stage2")
        self._pending = []

    def submit_frame(self, compression: CompressionOption, stage1) -> None:
        """stage1: bytes, or a zero-arg callable producing bytes (lets the
        worker also absorb the D2H pull of a device payload)."""
        def job():
            data = stage1() if callable(stage1) else stage1
            return write_stage1_chunk(compression, data)

        self._pending.append(self._pool.submit(job))

    def results(self):
        """Framed chunks in submission order; clears the queue."""
        out = [f.result() for f in self._pending]
        self._pending.clear()
        return out

    def close(self):
        self._pool.shutdown(wait=False)
