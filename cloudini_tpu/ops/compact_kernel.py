"""Pallas stream-compaction kernel — the shared data-movement primitive.

Both directions of the codec move bytes with ONE masked stream compaction
per chunk row (reference behaviour: the per-point interleave loop,
``/root/reference/cloudini_lib/src/v4_codec.cpp:73-79``, and the
byte-serial varint walk, ``field_decoder.hpp:110-130``):

* encode: valid slot bytes in (point, slot) order -> the wire stream;
* decode: per-token running sums at terminator byte positions -> dense
  token order.

Until r3 both were expressed as ``jax.lax.sort`` by destination position —
the fastest XLA permutation primitive on this chip, but a full bitonic
sort of ALREADY-ORDERED keys (~63% of decode, most of encode device
time). This kernel does the linear work the problem actually needs.

Algorithm (per (S, 128) VMEM tile, flattened row-major):

1. exclusive rank of every lane: 7 Hillis-Steele lane rounds + a sublane
   prefix over row totals (Mosaic has no cumsum lowering);
2. move every valid lane LEFT to ``dest = rank + carry%128`` inside an
   (S+1, 128) working tile (row 0 holds the previous tile's partial
   output row) by LSB-first conditional shift rounds: at bit b, lanes
   whose residual distance ``pos - dest`` has bit b set move left by
   ``2**b`` (static rolls + selects; rolls are ~1-cycle VREG shuffles,
   scripts/pallas_roll_probe.py).

   Collision-freedom: ranks are unit-step monotone, so if two valid
   lanes co-located at position j after bits 0..b, both residuals would
   be ≡ 0 (mod 2^(b+1)) while their source positions differ by less
   than 2^(b+1) — forcing equal destinations, impossible for distinct
   ranks. Every slot therefore holds at most one valid lane in every
   round.
3. DMA the working tile to the output at dynamic row offset
   ``carry//128``; the partial last row is re-written (same content,
   more lanes) by the next tile via the ``pending`` scratch row.

~15 shift rounds of linear work vs the bitonic sort's ~log^2(B) compare
rounds; measurements in PROFILE.md (r3) / scripts/segsort_probe.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["masked_compact"]


def _roll_left_lane(x, k: int, interpret: bool):
    """Roll lanes left by k (element i takes from lane i+k, cyclic)."""
    k %= 128
    if k == 0:
        return x
    if interpret:
        return jnp.roll(x, -k, axis=1)
    return pltpu.roll(x, 128 - k, 1)


def _roll_right_lane(x, k: int, interpret: bool):
    k %= 128
    if k == 0:
        return x
    if interpret:
        return jnp.roll(x, k, axis=1)
    return pltpu.roll(x, k, 1)


def _roll_up_sub(x, k: int, interpret: bool):
    """Roll sublanes up by k (row j takes from row j+k, cyclic)."""
    rows = x.shape[0]
    k %= rows
    if k == 0:
        return x
    if interpret:
        return jnp.roll(x, -k, axis=0)
    return pltpu.roll(x, rows - k, 0)


def _roll_down_sub(x, k: int, interpret: bool):
    rows = x.shape[0]
    k %= rows
    if k == 0:
        return x
    if interpret:
        return jnp.roll(x, k, axis=0)
    return pltpu.roll(x, k, 0)


def _roll_flat_left(x, k: int, lane_iota, interpret: bool):
    """Roll the row-major flattened tile left by k (0 < k < rows*128)."""
    kr, kl = divmod(k, 128)
    if kl == 0:
        return _roll_up_sub(x, kr, interpret)
    a = _roll_left_lane(_roll_up_sub(x, kr, interpret), kl, interpret)
    b = _roll_left_lane(_roll_up_sub(x, kr + 1, interpret), kl, interpret)
    # flat element f reads f+k: lanes < 128-kl stay in row-block a, the
    # tail wraps into the next row (b)
    return jnp.where(lane_iota < 128 - kl, a, b)


def _kernel(mask_ref, *refs, S: int, out_rows_per_chunk: int, n_words: int,
            fuse_bits, interpret: bool):
    val_refs = refs[:n_words]
    out_refs = refs[n_words:2 * n_words]
    carry = refs[2 * n_words]           # SMEM (1,)   running valid count
    pend = refs[2 * n_words + 1]        # VMEM (n_words, 1, 128) partial row
    work = refs[2 * n_words + 2]        # VMEM (n_words, S+1, 128) scratch
    sems = refs[2 * n_words + 3]        # DMA sems (n_words,)

    c = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        carry[0] = 0
        pend[...] = jnp.zeros_like(pend)

    m = mask_ref[:] != 0
    mi = m.astype(jnp.int32)

    # ---- exclusive rank within tile (row-major flattened) -----------------
    lane = jax.lax.broadcasted_iota(jnp.int32, (S, 128), 1)
    cs = mi
    for b in range(7):
        sh = 1 << b
        cs = cs + jnp.where(lane >= sh, _roll_right_lane(cs, sh, interpret), 0)
    row_tot = cs[:, 127:128]                          # (S,1) inclusive sums
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
    row_pre = row_tot
    b = 1
    while b < S:
        row_pre = row_pre + jnp.where(
            row_idx >= b, _roll_down_sub(row_pre, b, interpret), 0)
        b *= 2
    row_excl = row_pre - row_tot                      # (S,1) exclusive
    rank = cs - mi + row_excl                         # (S,128) exclusive
    cnt = row_pre[S - 1, 0]

    off = carry[0]
    p = jax.lax.rem(off, 128)
    row0 = jax.lax.div(off, 128)

    # ---- working tiles: row 0 reserved for the pending partial row; the
    # bottom pads to a multiple of 8 rows so every move-loop op runs on
    # (8,128)-aligned vregs (257 rows = 32.125 row-tiles otherwise). Dead
    # rows carry zeros; movers can never wrap into them (a round-b mover's
    # residual is >= 2**b, so its position is >= the shift). -------------
    WR = -(-(S + 1) // 8) * 8
    lane_w = jax.lax.broadcasted_iota(jnp.int32, (WR, 128), 1)
    sub_w = jax.lax.broadcasted_iota(jnp.int32, (WR, 128), 0)
    pos_w = sub_w * 128 + lane_w

    zrow_i = jnp.zeros((1, 128), jnp.int32)
    zpad_i = jnp.zeros((WR - S - 1, 128), jnp.int32)
    v_w = jnp.concatenate([zrow_i, mi, zpad_i], axis=0)  # int32 0/1 (Mosaic
    # cannot roll i1 vectors, so every shifted mask stays int32)
    zrow_u = jnp.zeros((1, 128), jnp.uint32)
    zpad_u = jnp.zeros((WR - S - 1, 128), jnp.uint32)
    ws = [jnp.concatenate([zrow_u, vr[:], zpad_u], axis=0) for vr in val_refs]

    # Move rounds (r4 reformulation): the per-lane residual distance
    # ``pos - dest`` rides IN a moved word instead of a separate rolled
    # ``dest`` plus a rolled mover mask — the residual's untraversed low
    # bits are exactly the bits not yet processed, so bit b can be read
    # off the carried word and subtracted as the lane moves.
    #   * fuse_bits=k (single value word, caller promises nonzero values
    #     < 2**k on masked lanes): residual packs into bits k.. of the
    #     VALUE word itself -> ONE rolled word per round (was three).
    #     After the last round every residual is zero, so the word IS the
    #     value again.
    #   * generic: a meta word ``residual<<1 | valid`` replaces the dest
    #     and mover-mask rolls -> 1+n_words rolled words (was 2+n_words).
    n_bits = int(np.ceil(np.log2((S + 1) * 128)))
    dest_w = jnp.concatenate([zrow_i, rank + p, zpad_i], axis=0)
    resid = (pos_w - dest_w) * v_w

    def _move(m, others, base_bit):
        """LSB-first conditional shifts of [m]+others; m carries the
        residual at bits base_bit.. and is nonzero exactly on live lanes."""
        for b in range(n_bits):
            sh = 1 << b
            condi = (m >> jnp.uint32(base_bit + b)) & jnp.uint32(1)
            mov = m * condi
            stay = m - mov
            rmov = _roll_flat_left(mov, sh, lane_w, interpret)
            take = rmov != 0
            keep = stay != 0
            m = stay + rmov - (take.astype(jnp.uint32) << jnp.uint32(base_bit + b))
            others = [jnp.where(take, _roll_flat_left(w, sh, lane_w, interpret),
                                jnp.where(keep, w, jnp.zeros_like(w)))
                      for w in others]
        return m, others

    if fuse_bits is not None:
        assert n_words == 1
        # mask in-kernel: unmasked lanes must be dead even if the caller's
        # value word is nonzero there
        m0 = (ws[0] | (resid.astype(jnp.uint32) << jnp.uint32(fuse_bits))) \
            * v_w.astype(jnp.uint32)
        m0, _ = _move(m0, [], fuse_bits)
        ws = [m0]  # residuals are all zero: the word is the value again
    else:
        meta = ((resid << 1) | v_w).astype(jnp.uint32)
        _, ws = _move(meta, ws, 1)

    # ---- stitch previous partial row, save the new one, write out ---------
    row0_mask = sub_w == 0
    for i, w in enumerate(ws):
        pend_b = jnp.broadcast_to(pend[i, 0:1, :], (WR, 128))
        work[i, :, :] = w | jnp.where(row0_mask, pend_b, jnp.uint32(0))
    q = jax.lax.div(p + cnt, 128)      # partial-row index within work
    for i in range(n_words):
        pend[i, :, :] = work[i, pl.ds(q, 1), :]

    out_base = c * out_rows_per_chunk + row0
    copies = [
        pltpu.make_async_copy(
            work.at[i, pl.ds(0, S + 1)],
            out_refs[i].at[pl.ds(out_base, S + 1), :], sems.at[i]
        )
        for i in range(n_words)
    ]
    for cp in copies:
        cp.start()
    for cp in copies:
        cp.wait()

    carry[0] = off + cnt


def _xla_fallback(mask, vals, out_cols: int):
    """Sort-based compaction for non-TPU backends (tests run the device
    codec on CPU meshes; interpret-mode Pallas is orders of magnitude too
    slow there). Unstable sort with unique position keys == stable
    compaction."""
    C, B = mask.shape
    pos = jnp.arange(B, dtype=jnp.uint32)[None, :]
    key = jnp.where(mask != 0, pos, np.uint32(0xFFFFFFFF))
    key = jnp.broadcast_to(key, (C, B))
    sorted_ = jax.lax.sort(
        (key,) + tuple(v.astype(jnp.uint32) for v in vals),
        dimension=1, num_keys=1, is_stable=False)
    outs = []
    for s in sorted_[1:]:
        if B < out_cols:
            s = jnp.concatenate(
                [s, jnp.zeros((C, out_cols - B), jnp.uint32)], axis=-1)
        outs.append(s[:, :out_cols])
    return tuple(outs)


def masked_compact(mask, vals, out_cols: int, *, tile_rows: int = 256,
                   fuse_bits: int | None = None,
                   interpret: bool | None = None):
    """Per-chunk-row stream compaction: pack ``vals`` lanes where ``mask``
    is nonzero to the front, preserving order.

    Args:
      mask: (C, B) int/bool array; nonzero = keep (any B).
      vals: one (C, B) uint32 array or a tuple of them (shared mask).
      out_cols: output columns K (multiple of 128).
      tile_rows: sublane rows per kernel tile (auto-shrunk to fit B).
      fuse_bits: single-word fast path — caller promises every masked
        lane's value is NONZERO and < 2**fuse_bits, letting the kernel
        carry the move residual in the value word's high bits (one rolled
        word per shift round instead of three; needs
        fuse_bits + ceil(log2((tile_rows+1)*128)) <= 32).
      interpret: force Pallas interpret mode (tests); None = auto — the
        Mosaic kernel on TPU, the XLA sort fallback elsewhere.
    Returns:
      (C, K) uint32 per input word. Lanes at/after each row's valid
      count are UNSPECIFIED — callers mask by count, as they did for
      the sort formulation's 0xFFFFFFFF tail.
    """
    single = not isinstance(vals, (tuple, list))
    vals = (vals,) if single else tuple(vals)
    assert fuse_bits is None or len(vals) == 1
    if interpret is None:
        if jax.default_backend() != "tpu":
            outs = _xla_fallback(mask, vals, out_cols)
            return outs[0] if single else outs
        interpret = False
    C, B = mask.shape
    S = tile_rows
    while S > -(-B // 128):
        S //= 2
    assert S >= 1, (B, tile_rows)
    # pad the stream axis to a whole number of (S,128) tiles — a shrunken
    # tile would multiply the per-grid-step overhead (~2.3 us) instead
    # (zero mask lanes contribute nothing)
    Bp = -(-B // (128 * S)) * (128 * S)
    if Bp != B:
        zpad = jnp.zeros((C, Bp - B), jnp.int32)
        mask = jnp.concatenate([mask.astype(jnp.int32), zpad], axis=-1)
        vals = tuple(
            jnp.concatenate(
                [v.astype(jnp.uint32), zpad.astype(jnp.uint32)], axis=-1)
            for v in vals)
        B = Bp
    n_tiles = B // (128 * S)
    K = out_cols
    assert K % 128 == 0, K
    n_words = len(vals)
    out_rows = K // 128 + (S + 1)   # slack: the last tile's DMA stays in
    mask2 = mask.astype(jnp.int32).reshape(C * (B // 128), 128)
    vals2 = tuple(v.astype(jnp.uint32).reshape(C * (B // 128), 128)
                  for v in vals)

    def idx(c, t):
        return (c * n_tiles + t, 0)

    in_specs = [pl.BlockSpec((S, 128), idx, memory_space=pltpu.VMEM)]
    in_specs += [pl.BlockSpec((S, 128), idx, memory_space=pltpu.VMEM)
                 for _ in range(n_words)]
    out_specs = tuple(
        pl.BlockSpec(memory_space=pltpu.ANY) for _ in range(n_words))
    out_shape = tuple(
        jax.ShapeDtypeStruct((C * out_rows, 128), jnp.uint32)
        for _ in range(n_words))
    if fuse_bits is not None:
        assert fuse_bits + int(np.ceil(np.log2((S + 1) * 128))) <= 32, (
            fuse_bits, S)
    kernel = functools.partial(
        _kernel, S=S, out_rows_per_chunk=out_rows, n_words=n_words,
        fuse_bits=fuse_bits, interpret=interpret,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(C, n_tiles),
        in_specs=in_specs,
        out_specs=out_specs if n_words > 1 else out_specs[0],
        out_shape=out_shape if n_words > 1 else out_shape[0],
        scratch_shapes=[
            pltpu.SMEM((1,), jnp.int32),
            pltpu.VMEM((n_words, 1, 128), jnp.uint32),
            pltpu.VMEM((n_words, -(-(S + 1) // 8) * 8, 128), jnp.uint32),
            pltpu.SemaphoreType.DMA((n_words,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(mask2, *vals2)
    outs = (outs,) if n_words == 1 else outs
    outs = tuple(o.reshape(C, out_rows * 128)[:, :K] for o in outs)
    return outs[0] if single else outs
