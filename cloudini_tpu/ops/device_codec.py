"""Device (JAX/XLA) stage-1 codec: chunk-batched columnar encode/decode.

Design (TPU-first, not a port):
  * chunks are the data-parallel axis: every array carries a leading chunk dim
    ``C`` and a static per-chunk point capacity ``N`` (= 32768); ragged clouds
    are padded and carry an ``n_valid`` scalar per chunk
  * predictors are elementwise shifts (encode) and segmented scans (decode) —
    no sequential point loop anywhere
  * varint packing is prefix-sum + one scatter per chunk; decode is the
    terminator-mask boundary scan (fully parallel)
  * everything is native 32-bit vector arithmetic: the fused FloatN XYZ[I]
    path runs in pure int32/uint32 lanes; 64-bit wire lanes (INT64, scalar
    lossy floats) use explicit (lo, hi) uint32 pairs (ops/u64.py) — never
    JAX's global x64 emulation

Wire-format equivalences are asserted against the numpy kernel of truth and the
reference C++ oracle in tests/test_device_codec.py.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.plan import CodecPlan, CodecUnit, UnitKind
from ..core.types import DECODE_BUT_SKIP_STORE, FieldType, size_of
from . import columns as C
from . import u64
from .compact_kernel import masked_compact

INT32_MIN = np.int32(-(2**31))
_F32_NAN_BITS = np.uint32(0x7FC00000)  # std::numeric_limits<float>::quiet_NaN()


def encoder_supports_plan(plan: CodecPlan) -> bool:
    """Every unit kind is device-exact: Gorilla via the parallel window-chain
    construction (ops/gorilla.py), FLOAT64 lossy via software IEEE binary64 on
    u32 pairs (ops/f64.py — TPU's emulated f64 is ~1 ulp off, so the exact
    multiply is done in integer lanes)."""
    return True


def encoder_prefers_device(plan: CodecPlan) -> bool:
    """Whether the ``auto`` backend should pick the device encoder.

    r4, driver-verified (BENCH_r04 ``dds_mixed_fsm_decode.encode_gbps``):
    device mixed/Gorilla ENCODE measures 1.734 GB/s on chip vs 0.887
    host-native on the real tiled dds fixture (encode_vs_host_native
    1.955) AFTER the r4 compaction-kernel rewrite (residual-carrying
    move words + head-row seeding); the early-r4 rollback figure of
    ~0.25 GB/s predates that kernel. All plans route encode to the
    device under ``auto``. Small clouds still route to the host via
    AUTO_DEVICE_MIN_CHUNKS; explicit backend='device' always dispatches."""
    return True


def decoder_prefers_device(plan: CodecPlan) -> bool:
    """Whether the ``auto`` backend should pick the device decoder — yes for
    every supported plan since r4. The pure-varint scan+sort path clearly
    wins on device; the enumerative-FSM path (mixed fixed/varint/Gorilla)
    crossed the host bar once the speculative single-window tier became
    sound (two-round L observation, ops/fsm.py): BENCH_r04
    ``dds_mixed_fsm_decode`` measures 1.00 GB/s on chip vs 0.672 host-native
    on the real tiled dds fixture (vs_host_native 1.49). Mis-speculating
    chunks escape to the host via RETRY, so exactness is preserved for any
    stream. Small clouds still route to the host via AUTO_DEVICE_MIN_CHUNKS.

    Plans with >= 2 Gorilla units decode on device (r5) but measure ~parity
    with the sequential host decoder (scripts/multi_gorilla_probe.py: 0.42
    GB/s device vs 0.40-0.65 host on a 3xFLOAT64 cloud, C=16 — the three
    per-slot value-assembly passes dominate), so ``auto`` keeps them on the
    host; backend='device' still dispatches them."""
    n_gorilla = sum(1 for u in plan.units if u.kind == UnitKind.GORILLA)
    return decoder_supports_plan(plan) and n_gorilla <= 1


def decoder_supports_plan(plan: CodecPlan) -> bool:
    """Device decode covers every unit kind: pure-varint plans via the
    terminator scan+sort path, all-fixed plans arithmetically, and everything
    else (mixed fixed/varint, Gorilla) via the enumerative-FSM block decoder
    (ops/fsm.py). ANY number of Gorilla units is supported (r5): the
    speculative window tier pins one L scalar per slot instead of carrying a
    product state (run_fsm), matching the reference factories' arbitrary
    field multisets (codec_common.cpp:116-198). Plans with no regular units
    (all V5-adaptive) have nothing to decode on device."""
    return bool(plan.units) and encoder_supports_plan(plan)


# ===================================================================== encode


def _zigzag32_tokens(delta_i32: jnp.ndarray, nan: jnp.ndarray | None, valid: jnp.ndarray):
    """int32 deltas -> (per-lane byte list [5 x (C, N) u32], lengths). Pure
    32-bit lanes; the single wrap case (delta == INT32_MIN -> biased 2**32) is
    patched explicitly.

    Token bytes are a LIST of 2D (C, N) lanes, never a (C, N, 5) tensor: a
    tiny trailing dim tiles to (8, 128) on TPU and every downstream reshape
    materializes ~25x-padded copies (measured ~7 ms/iter of pure layout
    copies at 16 chunks)."""
    d = delta_i32
    u = (d.astype(jnp.uint32) << 1) ^ (d >> 31).astype(jnp.uint32)
    ovf = u == np.uint32(0xFFFFFFFF)
    b = u + np.uint32(1)  # wraps to 0 on ovf
    lengths = jnp.ones(d.shape, jnp.int32)
    for k in range(1, 5):
        lengths += (ovf | (b >= np.uint32(1 << (7 * k)))).astype(jnp.int32)
    if nan is not None:
        b = jnp.where(nan, np.uint32(0), b)
        lengths = jnp.where(nan, 1, lengths)
        ovf = ovf & ~nan
    lengths = jnp.where(valid, lengths, 0)
    lanes = []
    for k in range(5):
        g = (b >> np.uint32(7 * k)) & np.uint32(0x7F)
        if k == 4:
            g = jnp.where(ovf, np.uint32(0x10), g)
        lanes.append(g | jnp.where(k < lengths - 1, np.uint32(0x80), np.uint32(0)))
    return lanes, lengths


def _zigzag64_tokens(delta: u64.U64, nan: jnp.ndarray | None, valid: jnp.ndarray):
    """64-bit deltas (u32 pair) -> (per-lane byte list [10 x (C, N) u32],
    lengths). See _zigzag32_tokens for the 2D-lanes rationale."""
    biased = u64.zigzag_biased(delta)
    if nan is not None:
        biased = u64.select(nan, u64.const(0, nan.shape), biased)
    lengths = u64.varint_lengths(biased)
    lengths = jnp.where(valid, lengths, 0)
    lanes = []
    for k in range(10):
        g = u64.varint_group(biased, k).astype(jnp.uint32)
        lanes.append(g | jnp.where(k < lengths - 1, np.uint32(0x80), np.uint32(0)))
    return lanes, lengths


def _shift_prev_i32(q: jnp.ndarray, nan: jnp.ndarray | None) -> jnp.ndarray:
    """prev[i] = q[i-1] with chunk-start 0 and reset-after-NaN
    (field_encoder.hpp:343-357). Elementwise along the point axis (-1)."""
    prev = jnp.roll(q, 1, axis=-1).at[..., 0].set(0)
    if nan is not None:
        prev_nan = jnp.roll(nan, 1, axis=-1).at[..., 0].set(False)
        prev = jnp.where(prev_nan, 0, prev)
    return prev


def _quantize_floatn(x: jnp.ndarray, mult: np.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """SSE _mm_round_ps + _mm_cvtps_epi32 semantics: ties-to-even in float32,
    overflow/NaN -> INT32_MIN (intrinsics.hpp:288-300)."""
    normalized = x * jnp.asarray(mult, jnp.float32)
    r = jnp.rint(normalized)
    ok = jnp.isfinite(r) & (r >= np.float32(-(2**31))) & (r < np.float32(2**31))
    q = jnp.where(ok, r, 0.0).astype(jnp.int32)
    return jnp.where(ok, q, INT32_MIN), jnp.isnan(x)


def _round_ties_away(x: jnp.ndarray) -> jnp.ndarray:
    a = jnp.abs(x)
    f = jnp.floor(a)
    r = f + (a - f >= 0.5).astype(a.dtype)
    # x < 0 (not signbit): the sign of a zero result is erased by the integer
    # conversion that always follows
    return jnp.where(x < 0, -r, r)


def _encode_unit_tokens(unit: CodecUnit, rows: jnp.ndarray, valid: jnp.ndarray):
    """One codec unit -> ordered list of (byte-matrix (..., L), lengths)."""
    out = []
    if unit.kind == UnitKind.FLOATN_LOSSY:
        mult = (np.float32(1.0) / np.asarray(unit.resolutions, np.float32)).astype(np.float32)
        for lane in range(unit.num_lanes):
            x = C.extract_f32(rows, unit.offsets[lane])
            q, nan = _quantize_floatn(x, mult[lane])
            delta = q - _shift_prev_i32(q, nan)  # int32 wrap
            out.append(_zigzag32_tokens(delta, nan, valid))
        return out
    if unit.kind == UnitKind.FLOAT_LOSSY:
        if unit.types[0] == FieldType.FLOAT64:
            from . import f64 as sf

            bits = u64.from_bytes(rows[..., unit.offsets[0] : unit.offsets[0] + 8], 8, False)
            _, exp_raw, mant = sf.decompose(bits)
            nan = (exp_raw == 2047) & ~u64.is_zero(mant)
            a = u64.select(nan, u64.const(0, nan.shape), bits)
            mult = float(np.float64(1.0) / np.float64(np.float32(unit.resolutions[0])))
            q = sf.round_away_to_i64(sf.mul_const(a, mult))
            prev = u64.roll_prev(q)
            prev = u64.select(
                jnp.roll(nan, 1, axis=-1).at[..., 0].set(False), u64.const(0, nan.shape), prev
            )
            out.append(_zigzag64_tokens(u64.sub(q, prev), nan, valid))
            return out
        x = C.extract_f32(rows, unit.offsets[0])
        m = np.float32(np.float64(1.0) / np.float64(np.float32(unit.resolutions[0])))
        nan = jnp.isnan(x)
        q = u64.f32_to_i64(_round_ties_away(jnp.where(nan, 0, x) * m))
        q = u64.select(nan, u64.const(0, nan.shape), q)
        prev = u64.roll_prev(q)
        prev = u64.select(
            jnp.roll(nan, 1, axis=-1).at[..., 0].set(False), u64.const(0, nan.shape), prev
        )
        delta = u64.sub(q, prev)
        out.append(_zigzag64_tokens(delta, nan, valid))
        return out
    if unit.kind == UnitKind.INT_DELTA:
        width = size_of(unit.types[0])
        signed = unit.types[0] in (FieldType.INT16, FieldType.INT32, FieldType.INT64)
        b = rows[..., unit.offsets[0] : unit.offsets[0] + width]
        v = u64.from_bytes(b, width, signed)
        delta = u64.sub(v, u64.roll_prev(v))
        out.append(_zigzag64_tokens(delta, None, valid))
        return out
    if unit.kind == UnitKind.FLOAT_XOR:
        width = size_of(unit.types[0])
        if width == 8:
            v = u64.from_bytes(rows[..., unit.offsets[0] : unit.offsets[0] + 8], 8, False)
            residual = (v[0] ^ u64.roll_prev(v)[0], v[1] ^ u64.roll_prev(v)[1])
            lanes = [u64.byte_lane(residual, k) for k in range(8)]
        else:
            v = C.extract_u32(rows, unit.offsets[0])
            residual = v ^ jnp.roll(v, 1, axis=-1).at[..., 0].set(0)
            lanes = [(residual >> np.uint32(8 * k)) & np.uint32(0xFF) for k in range(4)]
        lengths = jnp.where(valid, width, 0).astype(jnp.int32)
        out.append((lanes, lengths))
        return out
    if unit.kind == UnitKind.COPY:
        width = size_of(unit.types[0])
        lanes = [rows[..., unit.offsets[0] + k].astype(jnp.uint32) for k in range(width)]
        lengths = jnp.where(valid, width, 0).astype(jnp.int32)
        out.append((lanes, lengths))
        return out
    if unit.kind == UnitKind.GORILLA:
        from . import gorilla

        width = size_of(unit.types[0])
        if width == 8:
            bits = u64.from_bytes(rows[..., unit.offsets[0] : unit.offsets[0] + 8], 8, False)
        else:
            bits = C.extract_u32(rows, unit.offsets[0])
        out.append(gorilla.gorilla_tokens(bits, width * 8, valid))
        return out
    raise NotImplementedError(f"device encode does not support {unit.kind} yet (host fallback)")


def _fast_cumsum_i32(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix sum along the last axis via Hillis-Steele (log2(n)
    rounds of shift+add). XLA's native cumsum lowers to a sequential SMEM
    scan on this TPU (measured 5.35 ms for (16, 32768) int32 — 4 full passes);
    the log-round form is pure VPU elementwise work."""
    n = x.shape[-1]
    idx = jnp.arange(n, dtype=np.int32)
    k = 1
    while k < n:
        shifted = jnp.roll(x, k, axis=-1)
        x = x + jnp.where(idx >= k, shifted, 0)
        k *= 2
    return x


def _interleave_scatter(token_streams, n_points: int, max_bytes: int,
                        stream_kinds=None):
    """Columnar token lanes -> interleaved per-point layout.

    Data movement is ONE stable sort by destination byte position: valid
    token-byte lanes key on their output offset (each offset occurs exactly
    once, so the sorted payload IS the stream); invalid lanes key on 2^32-1
    and fall off the tail. On this TPU, sort moves bytes ~5x cheaper than
    scatter and ~10x cheaper than gather (see .claude/skills/verify/SKILL.md),
    and it carries every stream in a single pass.

    Every intermediate is a 2D (C, N) array — token bytes arrive as per-lane
    lists, never (C, N, L) tensors (tiny trailing dims tile to (8, 128) and
    cost ~7 ms/iter of layout copies; see _zigzag32_tokens). The only
    materialized buffers are the concatenated sort input and the sort output.

    POINT 0 RIDES OUT OF BAND (r3): each chunk's first tokens are the longest
    of their streams (predictors start at 0, so the first varint carries the
    whole first value; Gorilla's first token is the raw 8-byte value), and the
    tier check is a batch-global max — so point 0 used to force EVERY chunk of
    real mixed clouds to the full-width sort (41 slots/point on the dds plan).
    Point 0's bytes now occupy sum(full_s) dedicated per-CHUNK slots built
    outside the tier ladder, and the cap check sees points >= 1 only
    (measured on dds_message.bin: gorilla tokens past point 0 are <= 6 B,
    varint lanes <= 3 B — see PROFILE.md r3).

    ``stream_kinds``: per-stream ("floatn", lane) / ("varint",) / ("gorilla",)
    / ("fixed",) tags driving the plan-aware tier ladder; None falls back to
    uniform ladders.
    """
    # normalize: each stream is (lanes list [(C, N) u32/u8], lengths (C, N));
    # ndarray byte matrices are unstacked here
    streams = []
    for mat, ln in token_streams:
        if isinstance(mat, (list, tuple)):
            streams.append(([m.astype(jnp.uint32) for m in mat], ln))
        else:
            streams.append(
                ([mat[..., k].astype(jnp.uint32) for k in range(mat.shape[-1])], ln)
            )
    point_sizes = streams[0][1]
    for _, ln in streams[1:]:
        point_sizes = point_sizes + ln
    point_off = _fast_cumsum_i32(point_sizes) - point_sizes  # exclusive
    total = point_sizes.sum(axis=-1)  # (C,)
    c = point_sizes.shape[0]
    n_cols = point_sizes.shape[1]

    # ---- point-0 slots: (C, sum(full_s)) packed lanes, full width ----------
    # the wire starts with point 0's interleaved tokens; valid lanes carry
    # byte|0x100 so one array is both compaction mask and value
    FLAG = np.uint32(0x100)
    p0_cols = []
    for lanes, ln in streams:
        l0 = ln[:, 0]
        for k, byte_lane in enumerate(lanes):
            p0_cols.append(jnp.where(k < l0, byte_lane[:, 0] | FLAG, 0))
    p0_pack = jnp.stack(p0_cols, axis=-1).astype(jnp.uint32)  # (C, S_p0)
    not_p0 = (jnp.arange(n_cols, dtype=np.int32) > 0)[None, :]
    # pre-pack point 0 once (a tiny (C, S_p0) sort — invalid lanes are 0 and
    # sort to the tail as zeros) and seed it into the compaction kernel's
    # running output (init_row): the main stream no longer pays a full-width
    # concatenate per tier rung, and point 0's bytes skip the move loop
    S_p0 = len(p0_cols)
    use_init = S_p0 <= 127   # the kernel's head row must stay PARTIAL
    if use_init:
        pos0 = jnp.arange(S_p0, dtype=np.uint32)[None, :]
        key0 = jnp.broadcast_to(
            jnp.where(p0_pack != 0, pos0, np.uint32(0xFFFFFFFF)),
            p0_pack.shape)
        _, p0_sorted = jax.lax.sort(
            (key0, p0_pack), dimension=1, num_keys=1, is_stable=False)
        init_row = jnp.pad(p0_sorted, ((0, 0), (0, 128 - S_p0)))
        init_count = point_sizes[:, 0].astype(jnp.int32)

    def pack_with_cap(caps):
        """Compact with stream ``i`` trimmed to its first ``caps[i]`` lanes.
        Legal whenever no token of stream i at points >= 1 is longer than
        caps[i]; the compaction is the whole cost of encode, and real clouds
        never emit the worst-case 5- or 10-byte varints past point 0 (a
        4-byte token means |quantized delta| >= 2^20), so the common tiers
        move 40-70% fewer slots.

        The wire stream IS the masked compaction of slot bytes in
        (point, stream, lane) order — r3 replaced the position sort with
        ops/compact_kernel.py (the sort paid full bitonic cost on
        already-ordered keys); slot bytes stack point-major with a
        byte|0x100 valid flag so one array is both mask and value."""
        cols = []  # (C, N) packed lanes in per-point wire order
        for (lanes, ln), cap_i in zip(streams, caps):
            for k, byte_lane in enumerate(lanes[:cap_i]):
                cols.append(jnp.where((k < ln) & not_p0, byte_lane | FLAG, 0))
        main = jnp.stack(cols, axis=-1).reshape(c, n_cols * len(cols))
        out_cols = -(-max_bytes // 128) * 128
        # fuse_bits=9: every valid lane is byte|0x100 (nonzero, < 2**9), so
        # the kernel carries the move residual in the same word — one rolled
        # word per shift round (r4, ~2x on the interleave kernel)
        if use_init:
            stream = masked_compact(main, main, out_cols, fuse_bits=9,
                                    init_row=init_row, init_count=init_count)
        else:
            pk = jnp.concatenate([p0_pack, main], axis=-1)
            stream = masked_compact(pk, pk, out_cols, fuse_bits=9)
        out = (stream[:, :max_bytes] & np.uint32(0xFF)).astype(jnp.uint8)
        # lanes past each chunk's total are unspecified (kernel) or zero
        # (fallback): zero them
        out = jnp.where(
            jnp.arange(max_bytes, dtype=np.int32)[None, :] < total[:, None], out, 0
        )
        return out, total.astype(jnp.int32)

    full_caps = tuple(len(lanes) for lanes, _ in streams)
    if stream_kinds is None:
        # generic fallback: varint-shaped ladder; fixed-width streams still
        # end at their full rung via the per-stream fit check
        stream_kinds = tuple(("varint",) for _ in streams)
    assert len(stream_kinds) == len(streams)

    def rung(fl, vi, go):
        caps = []
        for kind, full_s in zip(stream_kinds, full_caps):
            if kind[0] == "floatn":
                cc = fl(kind[1])
            elif kind[0] == "varint":
                cc = vi
            elif kind[0] == "gorilla":
                cc = go
            else:  # fixed width: always full
                cc = full_s
            caps.append(min(cc, full_s))
        return tuple(caps)

    # plan-aware ladder (tightest first); duplicates collapse below. The
    # asymmetric LiDAR rung keeps r2's measured win (planar x/y deltas exceed
    # z/intensity on ground-vehicle clouds); the gorilla rungs come from the
    # dds fixture's measured reuse-token widths.
    ladder = [
        rung(lambda lane: 2, 2, 2),
        rung(lambda lane: 3 if lane < 2 else 2, 2, 2),
        rung(lambda lane: 3, 3, 6),
        rung(lambda lane: 5, 5, 9),
        full_caps,
    ]
    tiers = []
    for t in ladder:
        if (not tiers or t != tiers[-1]) and all(a <= b for a, b in zip(t, full_caps)):
            tiers.append(t)
    if len(tiers) == 1:
        return pack_with_cap(full_caps)
    # longest token per stream at points >= 1 (fixed-width streams have
    # constant lengths, so they just raise their rung to their width)
    if n_cols > 1:
        per_stream = jnp.stack([ln[:, 1:].max() for _, ln in streams])
    else:
        per_stream = jnp.zeros((len(streams),), jnp.int32)

    def build(i):
        if i == len(tiers) - 1:
            return lambda: pack_with_cap(tiers[i])
        nxt = build(i + 1)
        caps = tiers[i]
        fits = jnp.all(per_stream <= jnp.asarray(caps))

        def tier():
            return jax.lax.cond(fits, lambda: pack_with_cap(caps), nxt)

        return tier

    return build(0)()


class DeviceStage1Encoder:
    """Per-plan compiled chunk encoder.

    encode_chunks(rows (C, N, step) uint8, n_valid (C,) int32)
        -> (payloads (C, max_bytes) uint8, sizes (C,) int32)
    """

    def __init__(self, plan: CodecPlan, point_step: int, chunk_points: int = 32 * 1024,
                 adaptive_modes: dict | None = None, stage2: str = "none"):
        """``adaptive_modes``: {field_index: committed V5 mode} — when given
        (and covering every adaptive field), sections are emitted on device and
        encode_chunks returns the COMPLETE stage-1 payload; otherwise only the
        regular interleaved stream (host appends sections).

        ``stage2="lz4"`` fuses the device LZ4 block compressor (ops/lz4.py)
        into the same jitted program, so the stage-1 payload never leaves the
        device (and never crosses a layout boundary — relayout of a host-fed
        uint8 array round-trips through the host, which is catastrophic over
        a remote-device tunnel)."""
        if not encoder_supports_plan(plan):  # currently always true
            raise NotImplementedError("plan is not device-encodable")
        if stage2 not in ("none", "lz4", "zstd"):
            raise ValueError(f"unknown stage2 {stage2!r}")
        self.plan = plan
        self.point_step = point_step
        self.chunk_points = chunk_points
        self.stage2 = stage2
        self.adaptive_modes = dict(adaptive_modes) if adaptive_modes else None
        if self.adaptive_modes is not None:
            assert all(f.field_index in self.adaptive_modes for f in plan.adaptive)
        # worst-case bytes/point (MaxSerializedPointSize, codec_common.cpp:29-67)
        self.max_point_bytes = 0
        for u in plan.units:
            if u.kind == UnitKind.FLOATN_LOSSY:
                self.max_point_bytes += 5 * u.num_lanes
            elif u.kind in (UnitKind.FLOAT_LOSSY, UnitKind.INT_DELTA):
                self.max_point_bytes += 10
            elif u.kind == UnitKind.GORILLA:
                # MaxSerializedFieldSize: 11B f64 / 7B f32 (codec_common.cpp:29-67)
                self.max_point_bytes += 11 if size_of(u.types[0]) == 8 else 7
            else:
                self.max_point_bytes += int(u.fixed_size)
        self.regular_max_bytes = chunk_points * self.max_point_bytes
        self.max_bytes = self.regular_max_bytes
        if self.adaptive_modes is not None:
            from . import adaptive as adaptive_ops

            for f in plan.adaptive:
                self.max_bytes += adaptive_ops.section_max_bytes(f, chunk_points)
        # lane-align every device buffer width: transferring a tiled uint8
        # array whose minor dim is not a multiple of 128 falls off the fast
        # DMA path (observed ~1000x slower D2H)
        self.max_bytes = -(-self.max_bytes // 1024) * 1024
        self.raw_fn = self._encode  # traceable entry for caller-side scan chains
        self._fn = jax.jit(self._encode)
        self._viz_programs: dict = {}

    def _encode(self, rows: jnp.ndarray, n_valid: jnp.ndarray):
        out, sizes = self._stage1(rows, n_valid)
        if self.stage2 == "none":
            return out, sizes
        if self.stage2 == "lz4":
            from .lz4 import compress_bound, lz4_compress_chunks as compress
        else:
            from .zstd import compress_bound, zstd_compress_chunks as compress

        max_out = -(-compress_bound(self.max_bytes) // 1024) * 1024  # lane-align

        # tight-width tier (r3): the stage-2 kernels pay ~30 full passes over
        # their STATIC input width; the worst-case stage-1 bound (20-41 B/pt)
        # is 3-5x the real output of any actual cloud (4-7 B/pt measured on
        # both fixtures), so the common case runs the whole matcher/parse/
        # serialization at 8 B/pt and only worst-case batches take the
        # full-width branch. ZSTD runs a tighter 5.5 B/pt tier (r5): its
        # per-element cost is ~4x LZ4's, the real streams are 4-6 B/pt, and
        # with equal-split blocks 5.5 B/pt lands 2 x ~89 KiB blocks/row vs
        # 2 x 128 KiB at 8 B/pt — a 1.45x cut of every downstream pass.
        bpp8 = -(-(self.chunk_points * 8) // 1024) * 1024
        if self.stage2 == "zstd":
            w_tight = min(self.max_bytes, (self.chunk_points * 11 // 2 + 1023)
                          // 1024 * 1024)
        else:
            w_tight = min(self.max_bytes, bpp8)
        if w_tight >= self.max_bytes:
            return compress(out, sizes, max_out)

        def tight():
            return compress(out[:, :w_tight], sizes, max_out)

        def full():
            return compress(out, sizes, max_out)

        if w_tight < bpp8 < self.max_bytes:
            # middle tier: streams between the tight and 8 B/pt widths (rare
            # but legal) should not pay the full worst-case width
            def mid():
                return compress(out[:, :bpp8], sizes, max_out)

            return jax.lax.cond(
                jnp.max(sizes) <= w_tight, tight,
                lambda: jax.lax.cond(jnp.max(sizes) <= bpp8, mid, full))

        return jax.lax.cond(jnp.max(sizes) <= w_tight, tight, full)

    def _stage1(self, rows: jnp.ndarray, n_valid: jnp.ndarray):
        valid = jnp.arange(self.chunk_points, dtype=np.int32)[None, :] < n_valid[:, None]
        streams = []
        kinds = []
        for unit in self.plan.units:
            unit_streams = _encode_unit_tokens(unit, rows, valid)
            streams.extend(unit_streams)
            if unit.kind == UnitKind.FLOATN_LOSSY:
                kinds.extend(("floatn", lane) for lane in range(len(unit_streams)))
            elif unit.kind in (UnitKind.FLOAT_LOSSY, UnitKind.INT_DELTA):
                kinds.extend(("varint",) for _ in unit_streams)
            elif unit.kind == UnitKind.GORILLA:
                kinds.extend(("gorilla",) for _ in unit_streams)
            else:
                kinds.extend(("fixed",) for _ in unit_streams)
        if streams:
            out, sizes = _interleave_scatter(streams, self.chunk_points, self.max_bytes,
                                             stream_kinds=tuple(kinds))
        else:
            # all-adaptive plan (every field a V5 int): empty regular stream
            out = jnp.zeros((rows.shape[0], self.max_bytes), jnp.uint8)
            sizes = jnp.zeros((rows.shape[0],), jnp.int32)
        if self.adaptive_modes is None:
            return out, sizes
        from . import adaptive as adaptive_ops

        c_idx = jnp.arange(out.shape[0], dtype=np.int32)[:, None]
        for field in self.plan.adaptive:
            mode = self.adaptive_modes[field.field_index]
            smax = adaptive_ops.section_max_bytes(field, self.chunk_points)
            sec, sec_size = adaptive_ops.encode_section_device(field, mode, rows, valid, smax)
            ks = jnp.arange(smax, dtype=np.int32)
            # inactive lanes park at unique scratch slots (see _interleave_scatter)
            out = jnp.concatenate([out, jnp.zeros((out.shape[0], smax), jnp.uint8)], axis=-1)
            pos = jnp.where(
                ks[None, :] < sec_size[:, None],
                sizes[:, None] + ks[None, :],
                out.shape[1] - smax + ks[None, :],
            )
            out = out.at[c_idx, pos].set(sec, mode="drop")[:, : out.shape[1] - smax]
            sizes = sizes + sec_size
        return out, sizes

    def encode_chunks(self, rows, n_valid):
        return self._fn(rows, n_valid)

    # ------------------------------------------------------------- viz fusion

    def viz_program(self, base: int, res: float):
        """Fused viz-preprocess + encode as ONE jitted program (points never
        leave the device between preprocessing and stage 1; see
        applyVizLossyPreprocessing, ros_msg_utils.cpp:249-341).

        Returns fn(rows_flat (C*N, step) uint8, n_total ()) ->
        (payloads (C, max_bytes), sizes (C,), n_kept ()). The caller builds
        the plan from the viz-adjusted fields (FLOAT64 res 1e-6)."""
        cached = self._viz_programs.get((base, float(res)))
        if cached is not None:
            return cached
        from .viz import viz_compact

        N = self.chunk_points

        def _encode_viz(rows_flat: jnp.ndarray, n_total: jnp.ndarray):
            rows_flat, n_kept = viz_compact(rows_flat, n_total, base, res)
            c = rows_flat.shape[0] // N
            rows = rows_flat.reshape(c, N, self.point_step)
            n_valid = jnp.clip(n_kept - jnp.arange(c, dtype=np.int32) * N, 0, N)
            out, sizes = self._encode(rows, n_valid)
            return out, sizes, n_kept

        fn = jax.jit(_encode_viz)
        self._viz_programs[(base, float(res))] = fn
        return fn


# ---------------------------------------------------------------- program cache

from collections import OrderedDict

# LRU: jaxlib's CPU client becomes unstable once a few hundred compiled
# executables accumulate in one process, and long streaming runs over many
# schemas/size-buckets would otherwise grow without bound. Evicting the
# encoder/decoder object drops its jitted program (jax caches are keyed by
# the bound function object).
_PROGRAM_CACHE: "OrderedDict" = OrderedDict()
_PROGRAM_CACHE_MAX = 64


def _cache_put(key, value):
    _PROGRAM_CACHE[key] = value
    _PROGRAM_CACHE.move_to_end(key)
    while len(_PROGRAM_CACHE) > _PROGRAM_CACHE_MAX:
        _PROGRAM_CACHE.popitem(last=False)


def _cache_get(key):
    v = _PROGRAM_CACHE.get(key)
    if v is not None:
        _PROGRAM_CACHE.move_to_end(key)
    return v


def cached_encoder(plan: CodecPlan, point_step: int, chunk_points: int = 32 * 1024,
                   adaptive_modes: dict | None = None,
                   stage2: str = "none") -> "DeviceStage1Encoder":
    """Compiled-program cache keyed by plan VALUE (CodecPlan is frozen), so
    streaming workloads with per-message EncodingInfo (varying width) reuse one
    jitted program per schema instead of re-tracing per message."""
    key = (
        "enc", plan, point_step, chunk_points,
        tuple(sorted(adaptive_modes.items())) if adaptive_modes else None,
        stage2,
    )
    enc = _cache_get(key)
    if enc is None:
        enc = DeviceStage1Encoder(plan, point_step, chunk_points, adaptive_modes, stage2)
        _cache_put(key, enc)
    return enc


def cached_decoder(plan: CodecPlan, point_step: int, chunk_points: int = 32 * 1024,
                   max_bytes: int | None = None,
                   raw_words_out: bool = False,
                   with_sections: bool = False) -> "DeviceStage1Decoder":
    key = ("dec", plan, point_step, chunk_points, max_bytes, raw_words_out,
           with_sections)
    dec = _cache_get(key)
    if dec is None:
        dec = DeviceStage1Decoder(plan, point_step, chunk_points, max_bytes,
                                  raw_words_out, with_sections)
        _cache_put(key, dec)
    return dec


# ===================================================================== decode


def _fast_cummax_i32(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix max along the last axis, log-round form (cummax lowers
    to the same sequential SMEM scan as cumsum on this TPU)."""
    n = x.shape[-1]
    idx = jnp.arange(n, dtype=np.int32)
    k = 1
    while k < n:
        shifted = jnp.roll(x, k, axis=-1)
        x = jnp.maximum(x, jnp.where(idx >= k, shifted, np.int32(-(2**31))))
        k *= 2
    return x


def _strided_cumsum_i32(x: jnp.ndarray, stride: int) -> jnp.ndarray:
    """Per-lane inclusive prefix sum over a FLAT lane-interleaved array:
    element i sums all j <= i with j = i (mod stride). One log-round chain
    serves every lane at once — no (C, N, T) tensor with a tiny minor dim
    (see _zigzag32_tokens for why those are banned)."""
    n = x.shape[-1]
    idx = jnp.arange(n, dtype=np.int32)
    k = stride
    while k < n:
        x = x + jnp.where(idx >= k, jnp.roll(x, k, axis=-1), 0)
        k *= 2
    return x


def _strided_cummax_i32(x: jnp.ndarray, stride: int) -> jnp.ndarray:
    n = x.shape[-1]
    idx = jnp.arange(n, dtype=np.int32)
    k = stride
    while k < n:
        x = jnp.maximum(x, jnp.where(idx >= k, jnp.roll(x, k, axis=-1), np.int32(-(2**31))))
        k *= 2
    return x


def _undelta_flat_i32(d: jnp.ndarray, nan: jnp.ndarray, stride: int) -> jnp.ndarray:
    """Inverse predictor for ALL lanes at once on the flat token-order array
    (point-major, lane-minor): strided segmented cumsum with reset-to-0 at NaN
    markers. The reset machinery only runs when a marker exists (lax.cond),
    and is gather-free: the per-lane base (running sum at the most recent
    marker) propagates through a log-round hold-last-marked scan instead of
    a cummax + take_along_axis (gathers cost ~10 ns/element here)."""
    dz = jnp.where(nan, 0, d)
    total = _strided_cumsum_i32(dz, stride)

    def with_resets(args):
        total, nan = args
        n = total.shape[-1]
        idx = jnp.arange(n, dtype=np.int32)
        base = jnp.where(nan, total, 0)
        seen = nan
        k = stride
        while k < n:
            pb = jnp.roll(base, k, axis=-1)
            ps = jnp.roll(seen, k, axis=-1) & (idx >= k)
            base = jnp.where(seen, base, pb)
            seen = seen | ps
            k *= 2
        values = total - jnp.where(seen, base, 0)
        return jnp.where(nan, 0, values)

    return jax.lax.cond(jnp.any(nan), with_resets, lambda a: a[0], (total, nan))


def _segmented_undelta_i32(deltas: jnp.ndarray, nan: jnp.ndarray | None) -> jnp.ndarray:
    """Inverse predictor in int32: cumulative sum along points with reset-to-0
    at NaN markers — total-minus-base segmented scan. NaN markers are rare on
    real clouds, so the reset machinery (prefix max + gather) only runs when
    one is present (lax.cond: one branch executes at runtime)."""
    if nan is None:
        return _fast_cumsum_i32(deltas)
    d = jnp.where(nan, 0, deltas)
    total = _fast_cumsum_i32(d)

    def with_resets(args):
        total, nan = args
        idx = jnp.arange(total.shape[-1], dtype=jnp.int32)
        last_nan = _fast_cummax_i32(jnp.where(nan, idx, -1))
        base_idx = jnp.maximum(last_nan, 0)
        base = jnp.take_along_axis(total, base_idx, axis=-1)
        values = total - jnp.where(last_nan >= 0, base, 0).astype(total.dtype)
        return jnp.where(nan, 0, values)

    return jax.lax.cond(jnp.any(nan), with_resets, lambda a: a[0], (total, nan))


def _segmented_undelta_u64(deltas: u64.U64, nan: jnp.ndarray | None) -> u64.U64:
    """64-bit pair version of the segmented un-delta scan (see the i32 variant
    for the rare-NaN lax.cond rationale)."""
    if nan is not None:
        deltas = u64.select(nan, u64.const(0, nan.shape), deltas)
    total = u64.cumsum(deltas)
    if nan is None:
        return total

    def with_resets(args):
        total, nan = args
        idx = jnp.arange(nan.shape[-1], dtype=jnp.int32)
        last_nan = _fast_cummax_i32(jnp.where(nan, idx, -1))
        base_idx = jnp.maximum(last_nan, 0)
        base_lo = jnp.take_along_axis(total[0], base_idx, axis=-1)
        base_hi = jnp.take_along_axis(total[1], base_idx, axis=-1)
        zero = u64.const(0, nan.shape)
        base = u64.select(last_nan >= 0, (base_lo, base_hi), zero)
        v = u64.select(nan, zero, u64.sub(total, base))
        return v[0], v[1]

    return jax.lax.cond(
        jnp.any(nan), with_resets, lambda a: (a[0][0], a[0][1]), (total, nan)
    )


def _dequant_store_floatn_lane(unit: CodecUnit, lane: int, d32, nan_l, out):
    """int32 deltas (C, N) of one fused-FloatN lane -> dequantized f32 column."""
    q = _segmented_undelta_i32(d32, nan_l)
    f = q.astype(jnp.float32) * np.float32(unit.resolutions[lane])
    bits = jax.lax.bitcast_convert_type(f, jnp.uint32)
    bits = jnp.where(nan_l, _F32_NAN_BITS, bits)
    if unit.offsets[lane] == DECODE_BUT_SKIP_STORE:
        return out
    return C.store_bytes(out, unit.offsets[lane], C.split_bytes(bits, 4))


def _dequant_store_float_lossy(unit: CodecUnit, d: u64.U64, nm, out):
    """u64-pair deltas (C, N) of a scalar lossy float -> f32/f64 column."""
    q = _segmented_undelta_u64(d, nm)
    if unit.types[0] == FieldType.FLOAT64:
        from . import f64 as sf

        # double(q) * double(float(res))  (field_decoder.hpp:110-130)
        res_c = float(np.float64(np.float32(unit.resolutions[0])))
        fb = sf.mul_const(sf.i64_to_f64(q), res_c)
        fb = u64.select(nm, u64.const(0x7FF8000000000000, nm.shape), fb)
        if unit.offsets[0] == DECODE_BUT_SKIP_STORE:
            return out
        return C.store_bytes(out, unit.offsets[0], u64.to_bytes(fb, 8))
    f = u64.i64_to_f32(q) * np.float32(unit.resolutions[0])
    bits = jax.lax.bitcast_convert_type(f, jnp.uint32)
    bits = jnp.where(nm, _F32_NAN_BITS, bits)
    if unit.offsets[0] == DECODE_BUT_SKIP_STORE:
        return out
    return C.store_bytes(out, unit.offsets[0], C.split_bytes(bits, 4))


def _undelta_store_int(unit: CodecUnit, d: u64.U64, out):
    q = _segmented_undelta_u64(d, None)
    if unit.offsets[0] == DECODE_BUT_SKIP_STORE:
        return out
    width = size_of(unit.types[0])
    return C.store_bytes(out, unit.offsets[0], u64.to_bytes(q, width))


class DeviceStage1Decoder:
    """Per-plan compiled chunk decoder for fully varint-class plans (the hot
    LiDAR schemas). Mixed fixed-size/Gorilla streams use the host path.

    decode_chunks(payloads (C, max_bytes) uint8, sizes (C,), n_valid (C,))
        -> rows (C, N, point_step) uint8
    """

    def __init__(self, plan: CodecPlan, point_step: int, chunk_points: int = 32 * 1024,
                 max_bytes: int | None = None, raw_words_out: bool = False,
                 with_sections: bool = False):
        """``raw_words_out``: for identity-layout all-FloatN plans (offsets
        0,4,..,4(T-1), point_step == 4T), return rows as the flat (C, N*T)
        u32 little-endian array instead of (C, N, point_step) u8 — the bytes
        are the same; the caller reinterprets for free on the host, and the
        device skips ~1 ms/iter of byte-materialization layout ops."""
        if not decoder_supports_plan(plan):
            raise NotImplementedError(
                "device decode requires varint/fixed-width units (no Gorilla)"
            )
        self.plan = plan
        self.point_step = point_step
        self.chunk_points = chunk_points
        self.raw_words_out = raw_words_out and self._identity_floatn(plan, point_step)
        # routing: pure-varint plans -> terminator scan+sort; all-fixed plans
        # -> arithmetic stride walk (_decode_general's no-varint branch);
        # everything else (mixed fixed/varint, Gorilla) -> the FSM decoder
        has_varint = any(u.is_varint_class for u in plan.units)
        has_gorilla = any(u.kind == UnitKind.GORILLA for u in plan.units)
        self.general = not plan.all_varint_class
        self.fsm = has_gorilla or (self.general and has_varint)
        self.tokens_per_point = sum(
            u.num_lanes if u.kind == UnitKind.FLOATN_LOSSY else 1 for u in plan.units
        )
        # pure-FloatN plans never emit tokens over 5 bytes -> single-u32 lane
        self.max_token_bytes = max(
            5 if u.kind == UnitKind.FLOATN_LOSSY else 10 for u in plan.units
        )
        if max_bytes is None:
            max_bytes = chunk_points * plan.max_encoded_point_bytes + 1
        self.max_bytes = max_bytes
        if self.fsm:
            from .fsm_decode import FsmStage1Decoder

            self._fsm_dec = FsmStage1Decoder(plan, point_step, chunk_points)
            regular = self._fsm_dec.decode
        else:
            regular = self._decode_general if self.general else self._decode
        self.with_sections = with_sections and bool(plan.adaptive)
        if self.with_sections:
            if raw_words_out and self.raw_words_out:
                raise ValueError("raw_words_out is incompatible with sections")
            self._regular = regular
            self.raw_fn = self._decode_with_sections
            self._fn = jax.jit(self._decode_with_sections)
        else:
            self.raw_fn = regular  # traceable entry for caller-side scan chains
            self._fn = jax.jit(regular)

    def _decode_with_sections(self, payloads, sizes, n_valid):
        """Regular stream + every V5 adaptive section decoded in ONE program;
        ``consumed`` covers the whole chunk (the caller's trailing-bytes check
        needs no host section pass). Sentinels: 2^31-1 corrupt, 2^31-2 retry
        host-side (per-chunk wire modes diverging from chunk 0's — legal but
        never produced by a conformant encoder)."""
        from .adaptive_decode import RETRY, SectionDecoder

        out, consumed = self._regular(payloads, sizes, n_valid)
        bad = consumed == np.int32(2**31 - 1)
        retry = consumed == RETRY  # regular decoder may itself defer to host
        pos = jnp.where(bad | retry, 0, consumed)
        for field in self.plan.adaptive:
            sd = SectionDecoder(field, self.chunk_points)
            out, c_f, b_f, r_f = sd.decode(payloads, sizes, pos, n_valid, out)
            pos = pos + c_f
            bad = bad | b_f
            retry = retry | r_f
        # retry wins over bad: a mode-divergent chunk was decoded by the WRONG
        # branch, so its corrupt flag is meaningless — the host retry decides
        consumed = jnp.where(retry, RETRY, jnp.where(bad, np.int32(2**31 - 1), pos))
        return out, consumed

    @staticmethod
    def _identity_floatn(plan: CodecPlan, point_step: int) -> bool:
        if not all(u.kind == UnitKind.FLOATN_LOSSY for u in plan.units):
            return False
        offs = [o for u in plan.units for o in u.offsets]
        return offs == [4 * t for t in range(len(offs))] and point_step == 4 * len(offs)

    def _decode(self, payloads: jnp.ndarray, sizes: jnp.ndarray, n_valid: jnp.ndarray):
        """Pure-varint plans, gather-free.

        Every byte computes its token-local contribution (group << 7*pos, all
        elementwise). In the hot <=5-byte "planes" tier (r4) each terminator
        byte reconstructs its token VALUE directly from an 8-byte local
        window (static rolls of the contribution plane), and the Pallas
        stream compaction moves those values themselves from terminator byte
        positions to dense token order. The 6..10-byte generic tier instead
        compacts u64-pair stream running sums and recovers values as
        adjacent differences. No searchsorted (log-B rounds of
        10ns/element gathers dominated the old path), no byte gathers.
        """
        Cn, B = payloads.shape
        N, T = self.chunk_points, self.tokens_per_point
        K = N * T
        idxb = jnp.arange(B, dtype=np.int32)[None, :]
        in_range = idxb < sizes[:, None]
        term = ((payloads & 0x80) == 0) & in_range
        # token id OWNING each byte = count of terminators strictly before it
        csum_term = jnp.cumsum(term.astype(jnp.int32), axis=-1)
        tok_id = csum_term - term.astype(jnp.int32)
        g = (payloads & np.uint8(0x7F)).astype(jnp.uint32)
        needed = term & (tok_id < (n_valid * T)[:, None])
        # the NaN marker is biased == 0 (the +1 bias reserves it), matching
        # the numpy oracle and the reference's decodeVarint u==0 check — it
        # is derived from the reconstructed pair AFTER the sort, so the key
        # carries no NaN bit (bit 0 stays zero for layout compatibility)
        max_len = 10

        # <=5-byte plans (fused FloatN, the LiDAR hot path): the biased value
        # is < 2^35 and splits into plane a (groups 0-3, <2^28) and plane b
        # (group 4, <2^7). Both planes are LOCAL-WINDOW values (r4): each
        # terminator assembles V from rolls of its own token's bytes, and the
        # compaction moves (V, b) — one word when plane b is empty — with no
        # stream running sums and no post-compaction adjacent diffs.
        planes = self.max_token_bytes <= 5 and self.max_bytes <= (1 << 21)
        if planes:
            max_len = 5  # 6..10-byte tokens only exist in corrupt streams
            # clamped in-token position from a 5-byte LOCAL window instead of
            # the cummax scan (r4: the scan was ~1 ms of the 8.8 ms decode):
            # pos_in_tok >= k iff the k previous bytes are all continuation
            # bytes (positions before the buffer count as terminators), and
            # the planes tier only ever needs min(pos, 3), pos == 4, and the
            # pos >= 5 overflow flag — all local properties.
            acc, ge = None, []
            for k in range(1, 6):
                tk = jnp.roll(term, k, axis=-1).at[:, :k].set(True)
                acc = ~tk if acc is None else acc & ~tk
                ge.append(acc)
            ge1, ge2, ge3, ge4, ge5 = ge
            pos3 = (ge1.astype(jnp.uint32) + ge2.astype(jnp.uint32)
                    + ge3.astype(jnp.uint32))       # min(pos_in_tok, 3)
            a = jnp.where(in_range & ~ge4, g << (pos3 * np.uint32(7)), 0)
            b = jnp.where(in_range & ge4 & ~ge5, g, 0)
            # token longer than max_len: its terminator sits at pos >= 5
            overflow = jnp.any(needed & ge5, axis=-1)

            # token value AT ITS TERMINATOR from the same 5-byte local
            # window (r4): V = a + sum_{k=1..4} ge_k ? roll(a, k) < 2^28 —
            # the full-stream running sums (two jnp.cumsum scans) and the
            # post-compaction adjacent-diff machinery both disappear; the
            # compaction now moves the values themselves.
            V = a
            for k, gek in ((1, ge1), (2, ge2), (3, ge3), (4, ge4)):
                V = V + jnp.where(
                    gek, jnp.roll(a, k, axis=-1).at[:, :k].set(0), 0)

            Kpad = -(-K // 128) * 128

            def compact_vb():
                s_v, s_b = masked_compact(needed, (V, b), Kpad)
                return s_v[:, :K], s_b[:, :K]

            def compact_v():
                s_v = masked_compact(needed, V, Kpad)
                return s_v[:, :K], jnp.zeros((Cn, K), jnp.uint32)

            # a 5-byte token forces a nonzero plane-b group (biased >= 2^28),
            # so when plane b is empty — every real cloud: a 4-byte token
            # already means |quantized delta| >= 2^20 — its compaction word
            # is skipped entirely
            v_a, v_b = jax.lax.cond(jnp.any(b != 0), compact_vb, compact_v)
            # biased = V + b*2^28 (< 2^35) as a u32 pair
            b_lo = v_a | ((v_b & np.uint32(0xF)) << 28)
            b_hi = v_b >> 4
            biased = (b_lo, b_hi)
            nan = u64.is_zero(biased)
        else:
            # position within token: previous terminator via exclusive cummax
            # (the 6..10-byte tier; the hot planes tier above uses the local
            # window instead)
            prev_term = jax.lax.cummax(jnp.where(term, idxb, -1), axis=1)
            prev_term_excl = jnp.roll(prev_term, 1, axis=-1).at[:, 0].set(-1)
            pos_in_tok = idxb - prev_term_excl - 1  # 0-based group index
            tok_len = (idxb - prev_term_excl).astype(jnp.uint32)  # at terms
            overflow = jnp.any(needed & (tok_len > max_len), axis=-1)
            # u64-pair contribution of each byte; groups past 9 are overflow
            sh = jnp.minimum(pos_in_tok, 9) * 7
            lo = jnp.where(sh < 32, g << sh.astype(jnp.uint32), 0)
            hi = jnp.where(
                sh >= 32,
                g << jnp.clip(sh - 32, 0, 31).astype(jnp.uint32),
                jnp.where(sh > 25, g >> jnp.clip(32 - sh, 0, 31).astype(jnp.uint32), 0),
            )
            mask = in_range & (pos_in_tok < 10)
            run = u64.cumsum((jnp.where(mask, lo, 0), jnp.where(mask, hi, 0)))
            run_lo, run_hi = run
            Kpad = -(-K // 128) * 128
            s_lo, s_hi = masked_compact(needed, (run_lo, run_hi), Kpad)
            s_lo, s_hi = s_lo[:, :K], s_hi[:, :K]
            # token value = this terminator's running sum minus the previous one
            p_lo = jnp.roll(s_lo, 1, axis=-1).at[:, 0].set(0)
            p_hi = jnp.roll(s_hi, 1, axis=-1).at[:, 0].set(0)
            biased = u64.sub((s_lo, s_hi), (p_lo, p_hi))
            nan = u64.is_zero(biased)
        uu = u64.sub(biased, u64.select(nan, u64.const(0, nan.shape), u64.const(1, nan.shape)))
        v = u64.unzigzag(uu)
        v = u64.select(nan, u64.const(0, nan.shape), v)

        all_floatn = all(u.kind == UnitKind.FLOATN_LOSSY for u in self.plan.units)
        if all_floatn:
            # flat fast path: undelta every lane in ONE strided scan on the
            # token-order array, dequantize with a tiled resolution vector,
            # and (for identity layouts like XYZ/XYZI) emit the row bytes as
            # a single bitcast — no per-lane (C, N) extract/store chains
            offs = [o for u in self.plan.units for o in u.offsets]
            ress = np.array(
                [r for u in self.plan.units for r in u.resolutions], np.float32
            )
            d32 = v[0].astype(jnp.int32)  # (C, K) token order
            q = _undelta_flat_i32(d32, nan, T)
            f = q.astype(jnp.float32) * jnp.asarray(np.tile(ress, N))[None, :]
            bits = jax.lax.bitcast_convert_type(f, jnp.uint32)
            bits = jnp.where(nan, _F32_NAN_BITS, bits)
            if (
                offs == [4 * t for t in range(T)]
                and self.point_step == 4 * T
            ):
                if self.raw_words_out:
                    out = bits  # (C, K) u32 == the row bytes, LE
                else:
                    out = jax.lax.bitcast_convert_type(bits, jnp.uint8).reshape(
                        Cn, N, self.point_step
                    )
            else:
                out = jnp.zeros((Cn, N, self.point_step), jnp.uint8)
                for t, off in enumerate(offs):
                    if off == DECODE_BUT_SKIP_STORE:
                        continue
                    out = C.store_bytes(out, off, C.split_bytes(bits[:, t::T], 4))
            nan = nan.reshape(Cn, N, T)
        else:
            svals = ((v[0].reshape(Cn, N, T), v[1].reshape(Cn, N, T)), None)
            nan = nan.reshape(Cn, N, T)

            out = jnp.zeros((Cn, N, self.point_step), jnp.uint8)
            t0 = 0
            for unit in self.plan.units:
                lanes = unit.num_lanes if unit.kind == UnitKind.FLOATN_LOSSY else 1
                out = self._store_unit(unit, svals[0], nan, t0, lanes, out)
                t0 += lanes
        # bytes consumed by the regular stream per chunk = bytes owned by the
        # first n_valid*T tokens; V5 adaptive sections start right after
        # (decoded host-side)
        K_valid = n_valid * T
        consumed = jnp.sum(
            (in_range & (tok_id < K_valid[:, None])).astype(jnp.int32), axis=-1
        )
        # validity, matching the host decoder's errors (find_varint_boundaries
        # raises 'truncated varint stream' / 'varint too long'): flag by
        # forcing consumed past the buffer so the caller's bound check rejects
        # the chunk instead of returning garbage rows
        total_terms = csum_term[:, -1]
        truncated = total_terms < K_valid
        # ``overflow`` computed per-tier above (local window / cummax)
        # the NaN-marker byte 0x00 is only legal in lossy-FLOAT lanes; the
        # host/reference decoder raises for integer lanes
        # (ref/varint.py decode_varint_scalar 'unexpected NaN marker')
        int_lanes = []
        t = 0
        for unit in self.plan.units:
            lanes = unit.num_lanes if unit.kind == UnitKind.FLOATN_LOSSY else 1
            if unit.kind == UnitKind.INT_DELTA:
                int_lanes.extend(range(t, t + lanes))
            t += lanes
        bad = truncated | overflow
        if int_lanes:
            pts_valid = (
                jnp.arange(N, dtype=np.int32)[None, :] < n_valid[:, None]
            )  # (C, N)
            illegal = jnp.zeros((Cn,), bool)
            for lane in int_lanes:
                illegal = illegal | jnp.any(nan[..., lane] & pts_valid, axis=-1)
            bad = bad | illegal
        consumed = jnp.where(n_valid > 0, consumed, 0).astype(jnp.int32)
        return out, jnp.where(bad, np.int32(2**31 - 1), consumed)

    def _decode_general(self, payloads: jnp.ndarray, sizes: jnp.ndarray, n_valid: jnp.ndarray):
        """All-fixed-width plans (COPY/XOR only): point starts are a static
        stride, decode is pure arithmetic. (Plans mixing varints or Gorilla
        route to the enumerative-FSM decoder — ops/fsm_decode.py — which
        replaced the old binary-lifting successor walk.)"""
        Cn, B = payloads.shape
        N = self.chunk_points
        batch = jnp.arange(Cn, dtype=np.int32)[:, None]
        units = self.plan.units
        assert not any(u.is_varint_class for u in units)

        stride = sum(int(u.fixed_size) for u in units)
        starts = jnp.broadcast_to(
            (jnp.arange(N, dtype=np.int32) * stride)[None, :], (Cn, N)
        )
        out, _ = self._extract_store_general(payloads, batch, starts, None, n_valid)
        return out, (n_valid * stride).astype(jnp.int32)

    def _extract_store_general(self, payloads, batch, starts, nt, n_valid):
        """Decode + store the fixed-width columns at static point starts."""
        Cn, B = payloads.shape
        N = self.chunk_points
        out = jnp.zeros((Cn, N, self.point_step), jnp.uint8)
        overflow = jnp.zeros((Cn,), bool)
        cur = starts
        for unit in self.plan.units:
            width = int(unit.fixed_size)
            cols = jnp.stack(
                [payloads[batch, jnp.clip(cur + k, 0, B - 1)] for k in range(width)],
                axis=-1,
            )  # (C, N, width)
            if unit.kind == UnitKind.COPY:
                if unit.offsets[0] != DECODE_BUT_SKIP_STORE:
                    out = C.store_bytes(out, unit.offsets[0], cols)
            else:  # FLOAT_XOR: value = XOR-prefix-scan of residuals
                limbs = []
                for limb in range(width // 4):
                    r = cols[..., 4 * limb].astype(jnp.uint32)
                    for k in range(1, 4):
                        r = r | (cols[..., 4 * limb + k].astype(jnp.uint32) << (8 * k))
                    limbs.append(jax.lax.associative_scan(jnp.bitwise_xor, r, axis=-1))
                if unit.offsets[0] != DECODE_BUT_SKIP_STORE:
                    if width == 8:
                        out = C.store_bytes(
                            out, unit.offsets[0], u64.to_bytes((limbs[0], limbs[1]), 8)
                        )
                    else:
                        out = C.store_bytes(out, unit.offsets[0], C.split_bytes(limbs[0], 4))
            cur = cur + width
        return out, overflow

    def _store_unit(self, unit: CodecUnit, svals, nan, t0: int, lanes: int, out):
        pair_mode = isinstance(svals, tuple)
        if unit.kind == UnitKind.FLOATN_LOSSY:
            for lane in range(lanes):
                t = t0 + lane
                d32 = (svals[0][..., t] if pair_mode else svals[..., t]).astype(jnp.int32)
                out = _dequant_store_floatn_lane(unit, lane, d32, nan[..., t], out)
            return out
        if unit.kind == UnitKind.FLOAT_LOSSY:
            assert pair_mode
            d = (svals[0][..., t0], svals[1][..., t0])
            return _dequant_store_float_lossy(unit, d, nan[..., t0], out)
        if unit.kind == UnitKind.INT_DELTA:
            assert pair_mode
            d = (svals[0][..., t0], svals[1][..., t0])
            return _undelta_store_int(unit, d, out)
        raise NotImplementedError(unit.kind)

    def decode_chunks(self, payloads, sizes, n_valid):
        return self._fn(payloads, sizes, n_valid)
