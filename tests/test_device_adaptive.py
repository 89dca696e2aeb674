"""Device V5 adaptive-section parity: device emission must be byte-identical
to the numpy section encoder (which is oracle-locked by test_golden.py)."""

import numpy as np
import pytest

from cloudini_tpu.core.plan import build_plan
from cloudini_tpu.core.types import (
    CompressionOption,
    EncodingInfo,
    EncodingOptions,
    FieldType,
    PointField,
)
from cloudini_tpu.ref import v5 as np_v5

CHUNK = 1024


def _rows(n, int_vals, seed=0):
    rng = np.random.default_rng(seed)
    xyz = (np.cumsum(rng.normal(0, 0.05, (n, 3)), axis=0)).astype(np.float32)
    w = int_vals.dtype.itemsize
    rows = np.zeros((n, 12 + w), dtype=np.uint8)
    rows[:, :12] = xyz.view(np.uint8).reshape(n, 12)
    rows[:, 12:] = int_vals.reshape(-1, 1).view(np.uint8).reshape(n, w)
    return rows


def _info(n, ftype, w):
    return EncodingInfo(
        fields=(
            PointField("x", 0, FieldType.FLOAT32, 0.001),
            PointField("y", 4, FieldType.FLOAT32, 0.001),
            PointField("z", 8, FieldType.FLOAT32, 0.001),
            PointField("v", 12, ftype),
        ),
        width=n, height=1, point_step=12 + w,
        encoding_opt=EncodingOptions.LOSSY, compression_opt=CompressionOption.NONE,
    )


def _device_section(field, mode, rows, n):
    import jax

    from cloudini_tpu.ops import adaptive as adaptive_ops

    smax = adaptive_ops.section_max_bytes(field, CHUNK)
    chunks = np.zeros((2, CHUNK, rows.shape[1]), dtype=np.uint8)
    chunks[0, :n] = rows[:n]
    chunks[1, : max(1, n // 2)] = rows[: max(1, n // 2)]  # ragged second chunk
    valid = np.zeros((2, CHUNK), dtype=bool)
    valid[0, :n] = True
    valid[1, : max(1, n // 2)] = True
    fn = jax.jit(lambda r, v: adaptive_ops.encode_section_device(field, mode, r, v, smax))
    out, sizes = fn(chunks, valid)
    return np.asarray(out), np.asarray(sizes), chunks, [n, max(1, n // 2)]


MODE_CASES = [
    # (mode, value generator)
    (np_v5.MODE_DELTA_VARINT, lambda n, rng: rng.integers(-(10**5), 10**5, n).astype(np.int32)),
    (np_v5.MODE_RLE, lambda n, rng: np.repeat(rng.integers(0, 2**62, 17, dtype=np.int64), -(-n // 17))[:n]),
    (np_v5.MODE_DELTA_RLE, lambda n, rng: (np.arange(n, dtype=np.int64) * 977).astype(np.int64)),
    (np_v5.MODE_PALETTE, lambda n, rng: rng.choice(
        rng.integers(0, 2**31, 11, dtype=np.uint32).astype(np.uint32), n).astype(np.uint32)),
]


@pytest.mark.parametrize("mode,gen", MODE_CASES)
@pytest.mark.parametrize("n", [5, 500, CHUNK])
def test_device_section_matches_numpy(mode, gen, n):
    rng = np.random.default_rng(mode * 100 + n)
    vals = gen(n, rng)
    rows = _rows(n, vals, seed=n)
    ft = {np.dtype(np.int32): FieldType.INT32, np.dtype(np.uint32): FieldType.UINT32,
          np.dtype(np.int64): FieldType.INT64, np.dtype(np.uint16): FieldType.UINT16}[vals.dtype]
    info = _info(n, ft, vals.dtype.itemsize)
    plan = build_plan(info)
    field = plan.adaptive[0]

    out, sizes, chunks, valids = _device_section(field, mode, rows, n)
    for c, nv in enumerate(valids):
        signed, unsigned = np_v5.extract_adaptive_values(field, rows[:nv])
        want = np_v5.encode_section(field, mode, signed, unsigned)
        got = out[c, : sizes[c]]
        assert sizes[c] == len(want), f"chunk {c}: {sizes[c]} vs {len(want)}"
        assert np.array_equal(got, want), f"chunk {c}: section bytes differ"


def test_full_pipeline_device_v5_matches_oracle(oracle):
    """End-to-end: device-V5 public encode must stay bit-exact vs reference."""
    from cloudini_tpu import PointcloudDecoder, PointcloudEncoder

    n = 70000  # multi-chunk with probe
    rng = np.random.default_rng(7)
    ring = (np.arange(n) % 16).astype(np.uint16)
    rows = _rows(n, ring, seed=3)
    info = _info(n, FieldType.UINT16, 2)
    enc = PointcloudEncoder(info)
    mine = enc.encode(rows.tobytes())
    golden = oracle.encode(info, rows.tobytes())
    assert mine == golden
    assert PointcloudDecoder().decode_full(mine)[1].tobytes() == oracle.decode(golden)


@pytest.mark.parametrize("mode,gen", MODE_CASES)
@pytest.mark.parametrize("n", [5, 500, CHUNK])
def test_device_section_decode_matches_numpy(mode, gen, n):
    """Device section DECODE parity for all four wire modes (VERDICT r1 item
    6): sections emitted by the numpy encoder (oracle-locked) are decoded by
    SectionDecoder at a nonzero runtime offset and must reproduce the numpy
    decode bit-exactly, including the consumed-size chain."""
    import jax
    import jax.numpy as jnp

    from cloudini_tpu.ops.adaptive_decode import SectionDecoder

    rng = np.random.default_rng(mode * 100 + n)
    vals = gen(n, rng)
    rows = _rows(n, vals, seed=n)
    ft = {np.dtype(np.int32): FieldType.INT32, np.dtype(np.uint32): FieldType.UINT32,
          np.dtype(np.int64): FieldType.INT64, np.dtype(np.uint16): FieldType.UINT16}[vals.dtype]
    info = _info(n, ft, vals.dtype.itemsize)
    plan = build_plan(info)
    field = plan.adaptive[0]

    offset = 37  # sections start at runtime offsets after the regular stream
    signed, unsigned = np_v5.extract_adaptive_values(field, rows[:n])
    section = np_v5.encode_section(field, mode, signed, unsigned)
    b = -(-(offset + len(section) + 8) // 1024) * 1024
    payloads = np.zeros((2, b), np.uint8)
    payloads[0, offset : offset + len(section)] = section
    half = max(1, n // 2)
    s2, u2 = np_v5.extract_adaptive_values(field, rows[:half])
    sec2 = np_v5.encode_section(field, mode, s2, u2)
    payloads[1, offset : offset + len(sec2)] = sec2
    sizes = np.array([offset + len(section), offset + len(sec2)], np.int32)
    start = np.array([offset, offset], np.int32)
    n_valid = np.array([n, half], np.int32)

    sd = SectionDecoder(field, CHUNK)
    step = rows.shape[1]
    out0 = jnp.zeros((2, CHUNK, step), jnp.uint8)
    fn = jax.jit(lambda p, s, st, nv, o: sd.decode(p, s, st, nv, o))
    out, consumed, bad, retry = fn(payloads, sizes, start, n_valid, out0)
    out, consumed = np.asarray(out), np.asarray(consumed)
    assert not np.asarray(bad).any()
    assert not np.asarray(retry).any()
    assert consumed[0] == len(section) and consumed[1] == len(sec2)

    for c, nv in ((0, n), (1, half)):
        want = np.zeros((nv, step), np.uint8)
        data = payloads[c, : sizes[c]]
        pos = np_v5.decode_section(field, data, offset, want, nv)
        assert pos == sizes[c]
        got = out[c, :nv, field.offset : field.offset + field.bytes_per_value]
        assert np.array_equal(
            got, want[:, field.offset : field.offset + field.bytes_per_value]
        ), f"chunk {c} mode {mode}: decoded column differs"


def test_device_section_decode_corrupt_flags():
    """Corrupt sections must flag, not return garbage: bad mode byte, palette
    index out of range, RLE runs not filling the chunk."""
    import jax
    import jax.numpy as jnp

    from cloudini_tpu.ops.adaptive_decode import SectionDecoder

    n = 64
    vals = (np.arange(n) % 4).astype(np.uint16)
    rows = _rows(n, vals)
    info = _info(n, FieldType.UINT16, 2)
    plan = build_plan(info)
    field = plan.adaptive[0]
    signed, unsigned = np_v5.extract_adaptive_values(field, rows[:n])
    section = np_v5.encode_section(field, np_v5.MODE_RLE, signed, unsigned)
    b = 1024
    sd = SectionDecoder(field, CHUNK)
    fn = jax.jit(lambda p, s, st, nv, o: sd.decode(p, s, st, nv, o))
    out0 = jnp.zeros((1, CHUNK, rows.shape[1]), jnp.uint8)

    # run counts not filling the chunk: claim more points than the runs cover
    pay = np.zeros((1, b), np.uint8)
    pay[0, : len(section)] = section
    _, _, bad, _ = fn(pay, np.array([len(section)], np.int32),
                      np.array([0], np.int32), np.array([n + 5], np.int32), out0)
    assert np.asarray(bad).all()

    # unknown mode byte
    pay2 = pay.copy()
    pay2[0, 0] = 9
    _, _, bad, _ = fn(pay2, np.array([len(section)], np.int32),
                      np.array([0], np.int32), np.array([n], np.int32), out0)
    assert np.asarray(bad).all()


@pytest.mark.parametrize("mode,gen", MODE_CASES)
def test_pipeline_device_v5_decode_all_modes(mode, gen):
    """Full pipeline: multi-chunk V5 clouds decode entirely on device (regular
    stream + sections in one program) for every committed wire mode."""
    from cloudini_tpu import PointcloudDecoder, PointcloudEncoder
    from cloudini_tpu.core.header import decode_header

    n = 3 * CHUNK + 123
    rng = np.random.default_rng(mode + 40)
    vals = gen(n, rng)
    rows = _rows(n, vals, seed=mode)
    ft = {np.dtype(np.int32): FieldType.INT32, np.dtype(np.uint32): FieldType.UINT32,
          np.dtype(np.int64): FieldType.INT64, np.dtype(np.uint16): FieldType.UINT16}[vals.dtype]
    info = _info(n, ft, vals.dtype.itemsize)
    # verify the probe actually commits the intended mode (else the test is
    # silently weaker)
    plan = build_plan(info)
    signed, unsigned = np_v5.extract_adaptive_values(plan.adaptive[0], rows[:4096])
    assert np_v5.analyze_modes(signed, unsigned, plan.adaptive[0].bytes_per_value) == mode

    stream = PointcloudEncoder(info, backend="host", chunk_points=CHUNK).encode(rows.tobytes())
    dinfo, hlen = decode_header(stream)
    host = PointcloudDecoder(backend="host", chunk_points=CHUNK).decode(dinfo, stream[hlen:])
    dev = PointcloudDecoder(backend="device", chunk_points=CHUNK).decode(dinfo, stream[hlen:])
    assert np.array_equal(host, dev)


def test_pipeline_device_v5_mode_divergence_retries_host():
    """A stream whose chunks committed DIFFERENT wire modes (legal for the
    decoder, never emitted by a conformant encoder) must still decode --
    the device flags RETRY and the pipeline re-decodes those chunks host-side."""
    import struct

    from cloudini_tpu import PointcloudDecoder
    from cloudini_tpu.core.header import encode_header

    n = 2 * CHUNK
    ring = (np.arange(n) % 7).astype(np.uint16)
    rows = _rows(n, ring, seed=9)
    info = _info(n, FieldType.UINT16, 2)
    plan = build_plan(info)
    field = plan.adaptive[0]
    from cloudini_tpu.ref import stage1 as np_stage1

    frames = []
    for c, mode in ((0, np_v5.MODE_PALETTE), (1, np_v5.MODE_DELTA_RLE)):
        chunk_rows = rows[c * CHUNK : (c + 1) * CHUNK]
        regular = np_stage1.encode_chunk(plan, chunk_rows)
        s, u = np_v5.extract_adaptive_values(field, chunk_rows)
        section = np_v5.encode_section(field, mode, s, u)
        payload = np.concatenate([regular, section]).tobytes()
        frames.append(struct.pack("<I", len(payload)) + payload)
    stream = b"".join(frames)
    host = PointcloudDecoder(backend="host", chunk_points=CHUNK).decode(info, stream)
    dev = PointcloudDecoder(backend="device", chunk_points=CHUNK).decode(info, stream)
    assert np.array_equal(host, dev)
