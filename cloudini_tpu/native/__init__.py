"""Native host runtime loader: compiles runtime.cpp on first use (g++, cached
by source mtime) and exposes it via ctypes. All sequential host hot paths
(mixed-stream decode, Gorilla coding, host-fallback encode) live here."""

from __future__ import annotations

import ctypes
import hashlib
import os
import pathlib
import subprocess
import threading
from typing import List, Optional

import numpy as np

from ..core.plan import CodecPlan, CodecUnit, UnitKind

_DIR = pathlib.Path(__file__).resolve().parent
_SRC = _DIR / "runtime.cpp"
_BUILD = _DIR / "_build"

_KIND_CODE = {
    UnitKind.FLOATN_LOSSY: 0,
    UnitKind.FLOAT_LOSSY: 1,
    UnitKind.INT_DELTA: 2,
    UnitKind.FLOAT_XOR: 3,
    UnitKind.GORILLA: 4,
    UnitKind.COPY: 5,
}

_ERRORS = {
    -1: "truncated input",
    -2: "varint overflow",
    -3: "decodeVarint: unexpected NaN marker",
    -4: "output buffer full",
    -5: "unsupported unit",
    -6: "Gorilla: corrupt window parameters",
}


class _UnitSpec(ctypes.Structure):
    _fields_ = [
        ("kind", ctypes.c_int32),
        ("lanes", ctypes.c_int32),
        ("type_code", ctypes.c_int32),
        ("_pad", ctypes.c_int32),
        ("offsets", ctypes.c_uint32 * 4),
        ("res", ctypes.c_float * 4),
    ]


_lib = None
_lib_lock = threading.Lock()
_disabled = False


def _compile() -> Optional[pathlib.Path]:
    try:
        _BUILD.mkdir(exist_ok=True)
    except OSError:
        return None  # read-only install: fall back to numpy kernels
    flags = ["-O3", "-march=native", "-funroll-loops"]
    tag = hashlib.sha256(_SRC.read_bytes() + " ".join(flags).encode()).hexdigest()[:16]
    so_path = _BUILD / f"runtime-{tag}.so"
    if so_path.exists():
        return so_path
    # compile to a private temp name and os.replace into place: a killed
    # compiler or a concurrent builder (parallel/distributed.py workers) must
    # never leave a partial .so at the cached path, which would brick every
    # later process at CDLL time
    tmp = _BUILD / f".runtime-{tag}.{os.getpid()}.tmp.so"

    def _try(cmd) -> bool:
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=300)
            return True
        except (subprocess.CalledProcessError, FileNotFoundError,
                subprocess.TimeoutExpired, OSError):
            return False

    ok = _try(["g++", *flags, "-shared", "-fPIC", "-std=c++17", str(_SRC), "-o", str(tmp)])
    if not ok:
        # -march=native can fail on exotic hosts; retry portable
        ok = _try(["g++", "-O3", "-shared", "-fPIC", "-std=c++17", str(_SRC), "-o", str(tmp)])
    if not ok:
        tmp.unlink(missing_ok=True)
        return None
    try:
        os.replace(tmp, so_path)  # atomic on POSIX
    except OSError:
        tmp.unlink(missing_ok=True)
        return so_path if so_path.exists() else None
    return so_path


def get_lib():
    """Returns the loaded runtime or None when unavailable (no toolchain, or
    disabled via CLOUDINI_TPU_NO_NATIVE=1)."""
    global _lib, _disabled
    if os.environ.get("CLOUDINI_TPU_NO_NATIVE", "0") not in ("", "0"):
        return None
    if _lib is not None or _disabled:
        return _lib
    with _lib_lock:
        if _lib is not None or _disabled:
            return _lib
        so = _compile()
        if so is None:
            _disabled = True
            return None
        try:
            lib = ctypes.CDLL(str(so))
        except OSError:
            # corrupt cached artifact (e.g. from an older interrupted build):
            # drop it and disable for this process rather than crash callers
            pathlib.Path(so).unlink(missing_ok=True)
            _disabled = True
            return None
        lib.cldn_decode_chunk.restype = ctypes.c_longlong
        lib.cldn_decode_chunk.argtypes = [
            ctypes.c_void_p, ctypes.c_longlong, ctypes.c_void_p, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_longlong, ctypes.c_longlong,
        ]
        lib.cldn_encode_chunk.restype = ctypes.c_longlong
        lib.cldn_encode_chunk.argtypes = [
            ctypes.c_void_p, ctypes.c_longlong, ctypes.c_longlong,
            ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_longlong,
        ]
        lib.cldn_gorilla_encode_column.restype = ctypes.c_longlong
        lib.cldn_gorilla_encode_column.argtypes = [
            ctypes.c_void_p, ctypes.c_longlong, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_longlong, ctypes.c_void_p,
        ]
        lib.cldn_gorilla_decode_column.restype = ctypes.c_longlong
        lib.cldn_gorilla_decode_column.argtypes = [
            ctypes.c_void_p, ctypes.c_longlong, ctypes.c_longlong, ctypes.c_int, ctypes.c_void_p,
        ]
        lib.cldn_v5_encode_section.restype = ctypes.c_longlong
        lib.cldn_v5_encode_section.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_longlong,
            ctypes.c_int, ctypes.c_int, ctypes.c_void_p, ctypes.c_longlong,
        ]
        lib.cldn_v5_analyze_modes.restype = ctypes.c_longlong
        lib.cldn_v5_analyze_modes.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_longlong, ctypes.c_int,
        ]
        lib.cldn_v5_analyze_modes_rows.restype = ctypes.c_longlong
        lib.cldn_v5_analyze_modes_rows.argtypes = [
            ctypes.c_void_p, ctypes.c_longlong, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
        ]
        lib.cldn_v5_encode_section_rows.restype = ctypes.c_longlong
        lib.cldn_v5_encode_section_rows.argtypes = [
            ctypes.c_void_p, ctypes.c_longlong, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
            ctypes.c_longlong,
        ]
        _lib = lib
        return _lib


def _specs(plan: CodecPlan) -> ctypes.Array:
    arr = (_UnitSpec * len(plan.units))()
    for i, u in enumerate(plan.units):
        arr[i].kind = _KIND_CODE[u.kind]
        arr[i].lanes = u.num_lanes
        arr[i].type_code = int(u.types[0])
        for lane in range(u.num_lanes):
            arr[i].offsets[lane] = u.offsets[lane]
            arr[i].res[lane] = 0.0 if u.resolutions[lane] is None else u.resolutions[lane]
    return arr


def _check(rc: int) -> int:
    if rc < 0:
        raise ValueError(_ERRORS.get(rc, f"native runtime error {rc}"))
    return rc


def _check_offsets(plan: CodecPlan, point_step: int) -> None:
    """The C runtime stores/loads at plan offsets without per-write bounds
    checks; reject any (offset + width) past the row stride up front (a
    malformed header could otherwise corrupt the heap)."""
    from ..core.types import DECODE_BUT_SKIP_STORE, size_of

    for u in plan.units:
        for lane in range(u.num_lanes):
            off = u.offsets[lane]
            if off == DECODE_BUT_SKIP_STORE:
                continue
            width = 4 if u.kind == UnitKind.FLOATN_LOSSY else size_of(u.types[0])
            if off + width > point_step:
                raise ValueError(
                    f"field offset {off}+{width} exceeds point_step {point_step}"
                )


def decode_chunk(plan: CodecPlan, data: np.ndarray, out_rows: np.ndarray, n_points: int) -> int:
    """Native sequential decode of the interleaved regular stream. Returns
    bytes consumed."""
    lib = get_lib()
    assert lib is not None
    if len(plan.units) > 64:
        raise ValueError("too many units for the native runtime")
    _check_offsets(plan, out_rows.shape[1])
    data = np.ascontiguousarray(data)
    assert out_rows.flags["C_CONTIGUOUS"]
    rc = lib.cldn_decode_chunk(
        data.ctypes.data, data.size, _specs(plan), len(plan.units),
        out_rows.ctypes.data, out_rows.shape[1], n_points,
    )
    return _check(rc)


def encode_chunk(plan: CodecPlan, rows: np.ndarray, max_point_bytes: int) -> np.ndarray:
    """Native sequential encode (host fallback for Gorilla / FLOAT64 plans)."""
    lib = get_lib()
    assert lib is not None
    if len(plan.units) > 64:
        raise ValueError("too many units for the native runtime")
    _check_offsets(plan, rows.shape[1])
    rows = np.ascontiguousarray(rows)
    n = rows.shape[0]
    out = np.empty(n * max_point_bytes + 1024, dtype=np.uint8)
    rc = lib.cldn_encode_chunk(
        rows.ctypes.data, rows.shape[1], n, _specs(plan), len(plan.units),
        out.ctypes.data, out.size,
    )
    return out[: _check(rc)]


def v5_encode_section(field, mode: int, signed: np.ndarray, unsigned: np.ndarray) -> np.ndarray:
    """Native emit of one adaptive field's committed-mode section (wire
    oracle: ref/v5.py encode_section)."""
    lib = get_lib()
    assert lib is not None
    signed = np.ascontiguousarray(signed, dtype=np.int64)
    unsigned = np.ascontiguousarray(unsigned, dtype=np.uint64)
    n = signed.shape[0]
    bpv = field.bytes_per_value
    # worst case: mode byte + u32 + per value (10B varint + 10B uvarint)
    cap = 8 + n * (max(bpv, 10) + 10)
    out = np.empty(cap, dtype=np.uint8)
    rc = lib.cldn_v5_encode_section(
        signed.ctypes.data, unsigned.ctypes.data, n, mode, bpv,
        out.ctypes.data, cap,
    )
    return out[: _check(rc)]


def v5_analyze_modes(field, signed: np.ndarray, unsigned: np.ndarray) -> int:
    """Native V5 probe: committed wire mode for one adaptive field (same size
    math as ref/v5.py analyze_modes, differential-tested against it)."""
    lib = get_lib()
    assert lib is not None
    signed = np.ascontiguousarray(signed, dtype=np.int64)
    unsigned = np.ascontiguousarray(unsigned, dtype=np.uint64)
    return int(lib.cldn_v5_analyze_modes(
        signed.ctypes.data, unsigned.ctypes.data, signed.shape[0],
        field.bytes_per_value))


def _is_signed(field) -> bool:
    return field.type.name.startswith("INT")


def v5_analyze_modes_rows(field, chunk_rows: np.ndarray) -> int:
    """Native V5 probe straight from point rows (extraction fused in C)."""
    lib = get_lib()
    assert lib is not None
    rows = np.ascontiguousarray(chunk_rows)
    return int(lib.cldn_v5_analyze_modes_rows(
        rows.ctypes.data, rows.shape[0], rows.shape[1], field.offset,
        field.bytes_per_value, int(_is_signed(field))))


def v5_encode_section_rows(field, mode: int, chunk_rows: np.ndarray) -> np.ndarray:
    """Native section emit straight from point rows (extraction fused in C)."""
    lib = get_lib()
    assert lib is not None
    rows = np.ascontiguousarray(chunk_rows)
    n = rows.shape[0]
    bpv = field.bytes_per_value
    cap = 8 + n * (max(bpv, 10) + 10)
    out = np.empty(cap, dtype=np.uint8)
    rc = lib.cldn_v5_encode_section_rows(
        rows.ctypes.data, n, rows.shape[1], field.offset, bpv,
        int(_is_signed(field)), mode, out.ctypes.data, cap)
    return out[: _check(rc)]


def gorilla_encode_column(bits: np.ndarray, type_bits: int):
    """Returns (payload bytes, per-value lengths)."""
    lib = get_lib()
    assert lib is not None
    bits = np.ascontiguousarray(bits.astype(np.uint64, copy=False))
    n = bits.size
    cap = n * (type_bits // 8 + 3) + 16
    out = np.empty(cap, dtype=np.uint8)
    lengths = np.empty(n, dtype=np.int32)
    rc = lib.cldn_gorilla_encode_column(
        bits.ctypes.data, n, type_bits, out.ctypes.data, cap, lengths.ctypes.data
    )
    return out[: _check(rc)], lengths


def gorilla_decode_column(data: np.ndarray, count: int, type_bits: int):
    """Returns (uint64 bit patterns, bytes consumed)."""
    lib = get_lib()
    assert lib is not None
    data = np.ascontiguousarray(data)
    out = np.empty(count, dtype=np.uint64)
    rc = lib.cldn_gorilla_decode_column(data.ctypes.data, data.size, count, type_bits, out.ctypes.data)
    return out, _check(rc)


def available() -> bool:
    return get_lib() is not None
