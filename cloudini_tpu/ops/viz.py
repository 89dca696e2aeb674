"""Device-side visualization-oriented lossy preprocessing.

TPU-native equivalent of applyVizLossyPreprocessing's point filtering
(reference: ros_msg_utils.cpp:249-341): drop non-finite xyz points and dedup
voxels (first occurrence wins, order preserved). The reference walks points
through an insertion-order hash set; the device formulation is a 63-bit
packed-key sort + group-boundary mask + stable compaction — all batched VPU
work plus one lax.sort.

Runs INSIDE the encoder's jitted program (DeviceStage1Encoder.encode_viz_cloud)
so preprocessed points never round-trip to the host before encoding. The numpy
implementation in cloudini_tpu/preprocess.py stays the kernel of truth; parity
is locked by tests/test_device_viz.py.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import columns as C

_BIAS = np.uint32(1 << 20)
_AXIS_MASK = np.uint32((1 << 21) - 1)


def _round_ties_away(x: jnp.ndarray) -> jnp.ndarray:
    a = jnp.abs(x)
    f = jnp.floor(a)
    r = f + (a - f >= 0.5).astype(a.dtype)
    return jnp.where(x < 0, -r, r)


def _quant_axis(x: jnp.ndarray, inv_res: np.float32) -> jnp.ndarray:
    """float32 -> biased+masked 21-bit voxel coordinate (uint32), matching
    int32_t(std::lround(v*inv)) then (q + 2^20) & 0x1FFFFF: everything below
    bit 21 survives the int64->int32 wrap, so uint32 arithmetic is exact."""
    from . import u64

    r = _round_ties_away(x * inv_res)
    q_lo, _ = u64.f32_to_i64(r)  # low 32 bits of the int64 quantization
    return (q_lo + _BIAS) & _AXIS_MASK


def viz_compact(
    rows: jnp.ndarray, n_total: jnp.ndarray, base: int, res: float
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop non-finite-xyz points, dedup voxels (first occurrence, stable).

    rows: (P, point_step) uint8 (points beyond ``n_total`` ignored);
    returns (rows_out (P, point_step) with kept points compacted to the front
    and zeroed tails, n_kept scalar int32).
    """
    P, _step = rows.shape
    idx = jnp.arange(P, dtype=np.int32)
    valid = idx < n_total
    xyz = [C.extract_f32(rows, base + 4 * i) for i in range(3)]
    finite = valid
    for x in xyz:
        finite = finite & jnp.isfinite(x)
    inv_res = np.float32(np.float32(1.0) / np.float32(res))
    ax = [_quant_axis(jnp.where(finite, x, 0), inv_res) for x in xyz]
    # 63-bit key packed into a u32 pair; non-finite points get the all-ones
    # sentinel (greater than any real key: real hi < 2^31) so they sort last
    key_lo = ax[0] | (ax[1] << 21)
    key_hi = (ax[1] >> 11) | (ax[2] << 10)
    key_lo = jnp.where(finite, key_lo, np.uint32(0xFFFFFFFF))
    key_hi = jnp.where(finite, key_hi, np.uint32(0xFFFFFFFF))

    s_hi, s_lo, s_idx = jax.lax.sort(
        (key_hi, key_lo, idx), dimension=0, num_keys=3, is_stable=False
    )
    s_finite = finite[s_idx]
    first = (
        (s_lo != jnp.roll(s_lo, 1)) | (s_hi != jnp.roll(s_hi, 1))
    ).at[0].set(True)
    kept_sorted = first & s_finite

    # back to original order (s_idx is a permutation -> collision-free scatter)
    kept = jnp.zeros(P, bool).at[s_idx].set(kept_sorted)
    rank = jnp.cumsum(kept.astype(jnp.int32)) - 1
    n_kept = kept.sum().astype(jnp.int32)
    # stable compaction: source row index per output slot (unique parking past
    # P for dropped lanes, sliced off — see device_codec._interleave_scatter)
    src = jnp.zeros(2 * P, jnp.int32).at[jnp.where(kept, rank, P + idx)].set(idx)[:P]
    rows_out = jnp.where((idx < n_kept)[:, None], rows[src], 0)
    return rows_out, n_kept
