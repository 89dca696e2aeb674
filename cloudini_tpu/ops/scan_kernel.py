"""Fused Pallas front-end for the device varint decoder.

The XLA formulation of decode's boundary discovery runs ~4 separate passes
over the (C, B) payload (terminator cumsum, previous-terminator cummax,
plane-a running sum, key construction), each materializing a (C, B) u32
intermediate in HBM. This kernel computes all of them in ONE pass per tile,
with SMEM carries across tiles, and emits exactly what the compaction sort
consumes: the sort key, the plane-a running sum, and per-row stats.

Scope: the <=4-byte-token tier only (no plane-b group); semantics identical
to DeviceStage1Decoder._decode's planes branch with an empty plane b, locked
by tests/test_scan_kernel.py (differential vs numpy, interpret + compiled).

STATUS — measured NEGATIVE result, kept as documentation: on the v5e this
kernel runs ~6.6 ms/iter for (16, 196608) bytes (honest chained timing)
while the XLA formulation's four separate scan passes cost ~1.4 ms total.
Mosaic lowers the log-round pltpu.roll scans far less efficiently than
XLA:TPU lowers its native cumsum/cummax, and the saved HBM traffic (the
(C, B) intermediates) is small next to that gap. The decoder therefore
keeps the XLA front-end (ops/device_codec.py); do not wire this in without
re-measuring on newer hardware/toolchains.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBLANES = 512  # tile = (SUBLANES, LANES) bytes = 64 KiB
TILE = SUBLANES * LANES

NEG = np.int32(-(2**31))

# stats vector layout (per row)
ST_TERMS = 0      # total terminators in range
ST_ANY_B = 1      # any 5th-byte (plane-b) group != 0  -> caller falls back
ST_OVERFLOW = 2   # any needed token longer than 5 bytes
ST_CONSUMED = 3   # bytes owned by the first K_valid tokens
ST_N = 8          # stats live in row 0 of a (8, 128) tile-aligned block


def _lane_scan_sum(x):
    """Inclusive prefix sum along the lane axis (last, 128)."""
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    k = 1
    while k < LANES:
        x = x + jnp.where(col >= k, pltpu.roll(x, k, 1), 0)
        k *= 2
    return x


def _lane_scan_max(x):
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    k = 1
    while k < LANES:
        x = jnp.maximum(x, jnp.where(col >= k, pltpu.roll(x, k, 1), NEG))
        k *= 2
    return x


def _sublane_scan_sum(x):
    """Inclusive prefix sum along the sublane axis (first) of an (S, 1) col."""
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    k = 1
    while k < x.shape[0]:
        x = x + jnp.where(row >= k, pltpu.roll(x, k, 0), 0)
        k *= 2
    return x


def _sublane_scan_max(x):
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    k = 1
    while k < x.shape[0]:
        x = jnp.maximum(x, jnp.where(row >= k, pltpu.roll(x, k, 0), NEG))
        k *= 2
    return x


def _tile_scan_sum(x):
    """Inclusive prefix sum over the flattened (row-major) tile order."""
    x = _lane_scan_sum(x)
    row_tot = x[:, LANES - 1 :]  # (S, 1) inclusive row totals
    offs = _sublane_scan_sum(row_tot) - row_tot  # exclusive row offsets
    return x + offs


def _tile_scan_max(x):
    x = _lane_scan_max(x)
    row_max = x[:, LANES - 1 :]  # (S, 1) inclusive row maxima
    incl = _sublane_scan_max(row_max)
    prev = pltpu.roll(incl, 1, 0)  # exclusive row prefix max
    row0 = jax.lax.broadcasted_iota(jnp.int32, prev.shape, 0) == 0
    prev = jnp.where(row0, NEG, prev)
    return jnp.maximum(x, prev)


def _kernel(sizes_ref, kvalid_ref, p_ref, key_ref, run_ref, stats_ref, carry):
    """carry (SMEM, 8 x i32): [0]=cummax M, [1]=run_a, [2]=csum_term,
    [3]=any_b, [4]=overflow, [5]=consumed — persisted across the tile axis."""
    r = pl.program_id(0)
    tj = pl.program_id(1)
    n_tiles = pl.num_programs(1)

    @pl.when(tj == 0)
    def _():
        carry[0] = np.int32(-1)
        carry[1] = np.int32(0)
        carry[2] = np.int32(0)
        carry[3] = np.int32(0)
        carry[4] = np.int32(0)
        carry[5] = np.int32(0)

    size = sizes_ref[r]
    k_valid = kvalid_ref[r]

    p = p_ref[0].astype(jnp.int32)  # (S, 128)
    base = tj * TILE
    idx = base + (
        jax.lax.broadcasted_iota(jnp.int32, p.shape, 0) * LANES
        + jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)
    )
    in_range = idx < size
    g = p & 0x7F
    term = ((p & 0x80) == 0) & in_range

    # inclusive cummax of (term ? idx : -1), then shift one element (flat
    # order) for the exclusive previous-terminator position
    m_incl = jnp.maximum(_tile_scan_max(jnp.where(term, idx, -1)), carry[0])
    m_lane = pltpu.roll(m_incl, 1, 1)
    first_lane = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1) == 0
    row_prev = pltpu.roll(m_incl[:, LANES - 1 :], 1, 0)  # (S, 1)
    row0 = jax.lax.broadcasted_iota(jnp.int32, row_prev.shape, 0) == 0
    row_prev = jnp.where(row0, carry[0], row_prev)
    m_excl = jnp.where(first_lane, row_prev, m_lane)

    pos = idx - m_excl - 1  # 0-based group index within token
    a = jnp.where(in_range & (pos < 4), g << (jnp.minimum(pos, 3) * 7), 0)
    b_present = in_range & (pos == 4) & (g != 0)

    run_a = _tile_scan_sum(a) + carry[1]
    csum = _tile_scan_sum(term.astype(jnp.int32)) + carry[2]
    tok_id = csum - term.astype(jnp.int32)
    needed = term & (tok_id < k_valid)
    tok_len = idx - m_excl  # valid at terminators
    key = jnp.where(needed, tok_id.astype(jnp.uint32) << 10, np.uint32(0xFFFFFFFF))

    key_ref[0] = key
    run_ref[0] = run_a.astype(jnp.uint32)

    carry[0] = m_incl[SUBLANES - 1, LANES - 1]
    carry[1] = run_a[SUBLANES - 1, LANES - 1]
    carry[2] = csum[SUBLANES - 1, LANES - 1]
    carry[3] = carry[3] | jnp.any(b_present).astype(jnp.int32)
    carry[4] = carry[4] | jnp.any(needed & (tok_len > 5)).astype(jnp.int32)
    carry[5] = carry[5] + jnp.sum((in_range & (tok_id < k_valid)).astype(jnp.int32))

    @pl.when(tj == n_tiles - 1)
    def _():
        flat = jnp.stack(
            [carry[2], carry[3], carry[4], carry[5]]
            + [np.int32(0)] * (ST_N - 4)
        )
        # write the whole (8, 128) block: stat s rides in row s, lane 0
        stats_ref[0] = jnp.broadcast_to(flat[:, None], (ST_N, LANES))


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_frontend(payloads: jnp.ndarray, sizes: jnp.ndarray, k_valid: jnp.ndarray,
                    interpret: bool = False):
    """payloads (C, B) u8 (B % TILE == 0), sizes (C,) i32, k_valid (C,) i32
    -> (key (C, B) u32, run_a (C, B) u32, stats (C, 8) i32).

    key/run feed the compaction sort exactly like the XLA planes branch with
    an empty plane b; stats carry [terminators, any_b, overflow, consumed].
    """
    C, B = payloads.shape
    assert B % TILE == 0, (B, TILE)
    n_tiles = B // TILE
    p3 = payloads.reshape(C, B // LANES, LANES)
    key, run, stats = pl.pallas_call(
        _kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(C, n_tiles),
            in_specs=[
                pl.BlockSpec((1, SUBLANES, LANES), lambda r, t, *_: (r, t, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, SUBLANES, LANES), lambda r, t, *_: (r, t, 0)),
                pl.BlockSpec((1, SUBLANES, LANES), lambda r, t, *_: (r, t, 0)),
                pl.BlockSpec((1, ST_N, LANES), lambda r, t, *_: (r, 0, 0)),
            ],
            scratch_shapes=[pltpu.SMEM((8,), jnp.int32)],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((C, B // LANES, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((C, B // LANES, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((C, ST_N, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(sizes.astype(jnp.int32), k_valid.astype(jnp.int32), p3)
    return key.reshape(C, B), run.reshape(C, B), stats[:, :, 0]
