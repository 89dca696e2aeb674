"""Column extraction / store: (points, point_step) uint8 rows <-> typed columns.

TPU-native replacement for the reference's per-point pointer walks: columns are
materialized with static slices + shift/OR assembly so XLA fuses the whole
extract-quantize-delta chain into one VPU pass. Little-endian throughout (the
wire format never byte-swaps; reference encoding_utils.hpp:33).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.types import FieldType


def _bytes_at(rows: jnp.ndarray, offset: int, width: int) -> jnp.ndarray:
    """(..., n, step) uint8 -> (..., n, width) uint8 static slice."""
    return rows[..., offset : offset + width]


def _assemble_uint(b: jnp.ndarray, width: int, out_dtype) -> jnp.ndarray:
    """LE bytes (..., width) -> unsigned integer (...,)."""
    acc = b[..., 0].astype(out_dtype)
    for k in range(1, width):
        acc = acc | (b[..., k].astype(out_dtype) << (8 * k))
    return acc


def extract_u32(rows: jnp.ndarray, offset: int) -> jnp.ndarray:
    return _assemble_uint(_bytes_at(rows, offset, 4), 4, jnp.uint32)


def extract_f32(rows: jnp.ndarray, offset: int) -> jnp.ndarray:
    return jax.lax.bitcast_convert_type(extract_u32(rows, offset), jnp.float32)


def split_bytes(values: jnp.ndarray, width: int) -> jnp.ndarray:
    """unsigned integer (...,) -> LE bytes (..., width) uint8."""
    parts = [((values >> values.dtype.type(8 * k)) & values.dtype.type(0xFF)).astype(jnp.uint8) for k in range(width)]
    return jnp.stack(parts, axis=-1)


def store_bytes(rows: jnp.ndarray, offset: int, byte_cols: jnp.ndarray) -> jnp.ndarray:
    """Write (..., n, width) uint8 into rows at a static column offset."""
    width = byte_cols.shape[-1]
    return rows.at[..., offset : offset + width].set(byte_cols)
