"""Visualization-oriented lossy preprocessing (NaN drop + voxel dedup + f64
quantization) — equivalent of applyVizLossyPreprocessing
(reference: ros_msg_utils.cpp:249-341).

Semantics replicated exactly:
  * geometry triple detected STRUCTURALLY: first 3 FLOAT32 fields with equal
    set resolutions at offsets {b, b+4, b+8}; names never read
  * points with non-finite x/y/z dropped
  * voxel key: per-axis ``int32(lround(v * (1/res)))`` (ties away, int32 wrap),
    biased by 2**20 and packed 21 bits/axis into a 63-bit key
    (packVoxelKey21, ros_msg_utils.cpp:42-49); out-of-range silently truncates
  * order-preserving dedup: first occurrence of each voxel wins
  * FLOAT64 fields without a resolution get resolution=1e-6

Implementation is columnar numpy (sort-based first-occurrence unique) — the
same formulation lifts to the device as a packed-key sort + unique-mask +
stable compaction. The reference's hash set is inherently serial; sorting is
the TPU-native equivalent.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from .core.types import FieldType, PointField
from .ref.fpmath import round_ties_away

_BIAS = np.int64(1 << 20)
_AXIS_MASK = np.uint64((1 << 21) - 1)


def _detect_triple(fields: List[PointField]) -> Optional[Tuple[int, float]]:
    if len(fields) < 3:
        return None
    f0, f1, f2 = fields[0], fields[1], fields[2]
    ok = (
        f0.type == FieldType.FLOAT32
        and f1.type == FieldType.FLOAT32
        and f2.type == FieldType.FLOAT32
        and f0.resolution is not None
        and f1.resolution is not None
        and f2.resolution is not None
        and f0.resolution == f1.resolution
        and f0.resolution == f2.resolution
        and f1.offset == f0.offset + 4
        and f2.offset == f0.offset + 8
    )
    if not ok:
        return None
    res = float(f0.resolution)
    if not (res > 0.0) or not np.isfinite(res):
        return None
    return f0.offset, res


def pack_voxel_keys(q: np.ndarray) -> np.ndarray:
    """(n, 3) int32 quantized coords -> (n,) uint64 packed 63-bit keys."""
    u = ((q.astype(np.int64) + _BIAS).astype(np.uint64)) & _AXIS_MASK
    return u[:, 0] | (u[:, 1] << np.uint64(21)) | (u[:, 2] << np.uint64(42))


def apply_viz_lossy_preprocessing(
    fields: List[PointField], rows: np.ndarray
) -> Tuple[List[PointField], np.ndarray]:
    """Returns (possibly updated fields, filtered rows). ``rows`` is
    (n, point_step) uint8; a no-op returns the inputs unchanged."""
    triple = _detect_triple(list(fields))
    if triple is None or rows.shape[0] == 0:
        return list(fields), rows
    base, res = triple
    inv_res = np.float32(1.0) / np.float32(res)

    xyz = np.stack(
        [
            np.ascontiguousarray(rows[:, base + 4 * i : base + 4 * i + 4]).view(np.float32).ravel()
            for i in range(3)
        ],
        axis=1,
    )
    finite = np.isfinite(xyz).all(axis=1)

    prod = (xyz * inv_res).astype(np.float32)
    with np.errstate(invalid="ignore"):
        q = round_ties_away(np.where(finite[:, None], prod, 0)).astype(np.int64).astype(np.int32)
    keys = pack_voxel_keys(q)

    # order-preserving first-occurrence dedup among finite points:
    # sort-based unique (the vectorized equivalent of the insertion-order hash)
    finite_idx = np.flatnonzero(finite)
    _, first = np.unique(keys[finite_idx], return_index=True)
    kept = np.sort(finite_idx[first])
    out_rows = rows[kept]

    out_fields = [
        PointField(f.name, f.offset, f.type, 1e-6)
        if f.type == FieldType.FLOAT64 and f.resolution is None
        else f
        for f in fields
    ]
    return out_fields, out_rows
