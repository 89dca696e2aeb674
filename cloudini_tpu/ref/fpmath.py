"""Exact float semantics of the reference's two quantization paths.

The reference mixes two rounding modes (SURVEY §7 hard part 7):
  * fused FloatN SIMD path: ``_mm_round_ps(_MM_FROUND_TO_NEAREST_INT)`` +
    ``_mm_cvtps_epi32`` -> ties-to-even, float32 arithmetic, int32 wrap, with
    the SSE overflow/NaN sentinel 0x80000000 (intrinsics.hpp:288-300; the
    canonical x86 build enables -msse4.1, cloudini_lib/CMakeLists.txt:131)
  * scalar Float_Lossy path: ``std::round`` -> ties-away-from-zero, int64
    (field_encoder.hpp:343-357)

Multipliers also differ:
  * FloatN: ``1.0f / resolution``      (float division, field_encoder.cpp:34)
  * scalar: ``FloatType(1.0 / resolution)`` (double division then narrowing,
    field_encoder.hpp:101-102)
"""

from __future__ import annotations

import numpy as np

INT32_MIN = np.int32(-(2**31))


def floatn_multipliers(resolutions) -> np.ndarray:
    """float32 lane multipliers: 1.0f / res."""
    res = np.asarray(resolutions, dtype=np.float32)
    return (np.float32(1.0) / res).astype(np.float32)


def scalar_multiplier(resolution: float, ftype_is_f64: bool):
    """FloatType multiplier = FloatType(1.0 / double(float(res)))."""
    m = np.float64(1.0) / np.float64(np.float32(resolution))
    return np.float64(m) if ftype_is_f64 else np.float32(m)


def quantize_floatn(x: np.ndarray, multipliers: np.ndarray) -> np.ndarray:
    """float32 (N, L) -> int32 quantized with SSE round-to-nearest-even semantics.

    Overflow and NaN map to INT32_MIN exactly like ``_mm_cvtps_epi32``.
    """
    normalized = (x.astype(np.float32, copy=False) * multipliers).astype(np.float32)
    r = np.rint(normalized)  # ties-to-even, float32
    ok = np.isfinite(r) & (r >= np.float32(-(2**31))) & (r < np.float32(2**31))
    with np.errstate(invalid="ignore"):
        q = np.where(ok, r, np.float32(0)).astype(np.int32)
    return np.where(ok, q, INT32_MIN)


def round_ties_away(x: np.ndarray) -> np.ndarray:
    """Correctly-rounded std::round emulation (ties away from zero), exact for
    both float32 and float64 inputs (the floor-difference is Sterbenz-exact)."""
    a = np.abs(x)
    f = np.floor(a)
    r = f + (a - f >= 0.5).astype(a.dtype)
    return np.copysign(r, x)


def quantize_scalar(x: np.ndarray, multiplier) -> np.ndarray:
    """FloatType -> int64 via std::round(x * m) (ties away), matching the scalar
    Float_Lossy encoder. NaN entries produce garbage here; callers mask them."""
    prod = (x * multiplier).astype(x.dtype)
    r = round_ties_away(prod)
    with np.errstate(invalid="ignore"):
        return r.astype(np.int64)
