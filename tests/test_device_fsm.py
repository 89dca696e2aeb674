"""Device decode of Gorilla-bearing interleaved streams via the
enumerative-FSM block decoder (ops/fsm.py + ops/fsm_decode.py).

These are the plans the device previously could not decode at all
(VERDICT r1 item 1): the flagship DDS LiDAR schema (x/y/z/intensity
f32-lossy + f64-Gorilla timestamps) and its variants. Every test
cross-checks device rows bit-exactly against the host decoder on streams
produced by the host encoder (itself locked to the reference C++ by
tests/test_golden.py); the real-fixture test additionally decodes the
reference binary's own bytes.
"""

import numpy as np
import pytest

from cloudini_tpu.codec.pipeline import PointcloudDecoder, PointcloudEncoder
from cloudini_tpu.core.types import (
    CompressionOption,
    EncodingInfo,
    EncodingOptions,
    FieldType,
    PointField,
)

CHUNK = 512


def _info(fields, n, step, version=4, comp=CompressionOption.NONE):
    return EncodingInfo(
        fields=tuple(fields), width=n, height=1, point_step=step,
        encoding_opt=EncodingOptions.LOSSY, compression_opt=comp, version=version,
    )


def _roundtrip_both(info, rows):
    enc = PointcloudEncoder(info, backend="host", chunk_points=CHUNK)
    data = enc.encode(rows, write_header=False)
    host = PointcloudDecoder(backend="host", chunk_points=CHUNK).decode(info, data)
    dev = PointcloudDecoder(backend="device", chunk_points=CHUNK).decode(info, data)
    assert np.array_equal(host, dev), "device decode differs from host"
    return host


def _ts_column(rng, n, kind):
    """Timestamp-like f64 columns exercising each Gorilla token class."""
    if kind == "monotonic":
        return (1.7e9 + np.cumsum(rng.uniform(0, 1e-4, n))).astype(np.float64)
    if kind == "constant":
        return np.full(n, 1.7e9, np.float64)
    if kind == "steps":  # long same-value runs + occasional jumps
        v = np.repeat(rng.uniform(0, 1e6, max(n // 7, 1)), 7)[:n]
        return np.resize(v, n).astype(np.float64)
    return rng.uniform(-1e9, 1e9, n).astype(np.float64)  # random: new windows


def _dds_rows(rng, n, kind="monotonic"):
    pts = np.cumsum(rng.normal(0, 0.05, (n, 4)), axis=0).astype(np.float32)
    ts = _ts_column(rng, n, kind)
    rows = np.zeros((n, 26), np.uint8)
    rows[:, :16] = pts.view(np.uint8).reshape(n, 16)
    rows[:, 16:18] = (np.arange(n) % 16).astype(np.uint16).reshape(-1, 1).view(np.uint8)
    rows[:, 18:26] = ts.reshape(-1, 1).view(np.uint8)
    return rows, pts, ts


_DDS_FIELDS = [
    PointField("x", 0, FieldType.FLOAT32, 0.001),
    PointField("y", 4, FieldType.FLOAT32, 0.001),
    PointField("z", 8, FieldType.FLOAT32, 0.001),
    PointField("intensity", 12, FieldType.FLOAT32, 0.001),
    PointField("ring", 16, FieldType.UINT16, None),
    PointField("timestamp", 18, FieldType.FLOAT64, None),
]


@pytest.mark.parametrize("kind", ["monotonic", "constant", "steps", "random"])
def test_dds_schema_v4(kind):
    """FloatN varints + ring INT_DELTA varint + f64 Gorilla, interleaved
    (version 4: ring stays a regular varint unit)."""
    rng = np.random.default_rng(hash(kind) % 2**31)
    n = 2 * CHUNK + 201
    rows, pts, ts = _dds_rows(rng, n, kind)
    out = _roundtrip_both(_info(_DDS_FIELDS, n, 26, version=4), rows)
    assert out[:, 18:26].tobytes() == ts.tobytes()  # gorilla lossless
    assert out[:, 16:18].tobytes() == rows[:, 16:18].tobytes()
    err = np.abs(out[:, :16].copy().view(np.float32).reshape(n, 4) - pts).max()
    assert err <= 0.001 * 1.0001


def test_dds_schema_v5_sections_host():
    """Version 5: ring becomes a V5 adaptive section after the regular
    stream; the FSM's `consumed` must hand the section decoder the exact
    offset."""
    rng = np.random.default_rng(7)
    n = 3 * CHUNK + 33
    rows, pts, ts = _dds_rows(rng, n, "monotonic")
    out = _roundtrip_both(_info(_DDS_FIELDS, n, 26, version=5), rows)
    assert out[:, 18:26].tobytes() == ts.tobytes()
    assert out[:, 16:18].tobytes() == rows[:, 16:18].tobytes()


def test_gorilla_only_plan():
    """A single f64 Gorilla field: T == 1, records are back-to-back Gorilla
    tokens (start states alternate record0 -> steady)."""
    rng = np.random.default_rng(5)
    n = 2 * CHUNK + 77
    ts = _ts_column(rng, n, "monotonic")
    rows = ts.reshape(-1, 1).view(np.uint8).copy()
    fields = [PointField("t", 0, FieldType.FLOAT64, None)]
    out = _roundtrip_both(_info(fields, n, 8, version=4), rows)
    assert out.tobytes() == rows.tobytes()


def test_gorilla_with_xor_and_copy():
    """LOSSLESS cloud: f32 XOR + f64 Gorilla + u8 COPY interleaved (v4 maps
    resolution-free FLOAT64 to Gorilla even in LOSSLESS,
    codec_common.cpp:116-198)."""
    rng = np.random.default_rng(6)
    n = CHUNK + 13
    x = np.cumsum(rng.normal(0, 0.05, n)).astype(np.float32)
    ts = _ts_column(rng, n, "steps")
    flags = rng.integers(0, 256, (n, 1), dtype=np.uint8)
    rows = np.zeros((n, 13), np.uint8)
    rows[:, :4] = x.reshape(-1, 1).view(np.uint8)
    rows[:, 4:12] = ts.reshape(-1, 1).view(np.uint8)
    rows[:, 12:] = flags
    fields = [
        PointField("x", 0, FieldType.FLOAT32, None),
        PointField("t", 4, FieldType.FLOAT64, None),
        PointField("flag", 12, FieldType.UINT8, None),
    ]
    info = EncodingInfo(
        fields=tuple(fields), width=n, height=1, point_step=13,
        encoding_opt=EncodingOptions.LOSSLESS,
        compression_opt=CompressionOption.NONE, version=4,
    )
    out = _roundtrip_both(info, rows)
    assert out.tobytes() == rows.tobytes()


def test_dds_with_nans():
    rng = np.random.default_rng(9)
    n = CHUNK + 250
    rows, pts, ts = _dds_rows(rng, n, "monotonic")
    pts_nan = pts.copy()
    pts_nan[rng.random((n, 4)) < 0.07] = np.nan
    rows[:, :16] = pts_nan.view(np.uint8).reshape(n, 16)
    out = _roundtrip_both(_info(_DDS_FIELDS, n, 26, version=4), rows)
    assert out[:, 18:26].tobytes() == ts.tobytes()


@pytest.mark.parametrize("n", [1, 2, 3, CHUNK - 1, CHUNK, CHUNK + 1])
def test_dds_boundaries(n):
    rng = np.random.default_rng(100 + n)
    rows, pts, ts = _dds_rows(rng, n, "monotonic")
    out = _roundtrip_both(_info(_DDS_FIELDS, n, 26, version=4), rows)
    assert out[:, 18:26].tobytes() == ts.tobytes()


def test_truncated_stream_raises():
    rng = np.random.default_rng(11)
    n = 300
    rows, _, _ = _dds_rows(rng, n, "random")
    info = _info(_DDS_FIELDS, n, 26, version=4)
    enc = PointcloudEncoder(info, backend="host", chunk_points=CHUNK)
    data = enc.encode(rows, write_header=False)
    # cut the stage-1 payload short (keep the u32 frame consistent)
    import struct

    (size,) = struct.unpack_from("<I", data, 0)
    cut = data[4 : 4 + size - 7]
    bad = struct.pack("<I", len(cut)) + cut
    dec = PointcloudDecoder(backend="device", chunk_points=CHUNK)
    with pytest.raises(ValueError):
        dec.decode(info, bad)


def test_corrupt_gorilla_window_raises():
    """A reuse token before any window is corrupt input (the reference's
    decoder throws 'corrupt window parameters')."""
    rng = np.random.default_rng(12)
    n = 8
    ts = _ts_column(rng, n, "constant")
    rows = ts.reshape(-1, 1).view(np.uint8).copy()
    fields = [PointField("t", 0, FieldType.FLOAT64, None)]
    info = _info(fields, n, 8, version=4)
    enc = PointcloudEncoder(info, backend="host", chunk_points=CHUNK)
    data = bytearray(enc.encode(rows, write_header=False))
    # constant column: tokens after the raw first value are single '0' bytes;
    # flip one to a reuse control ('01') with no window established
    data[4 + 8] = 0x01
    dec = PointcloudDecoder(backend="device", chunk_points=CHUNK)
    host = PointcloudDecoder(backend="host", chunk_points=CHUNK)
    with pytest.raises(ValueError):
        host.decode(info, bytes(data))
    with pytest.raises(ValueError):
        dec.decode(info, bytes(data))


def test_dds_fixture_reference_bytes(dds_message_bin, oracle):
    """The real 64000-pt DDS fixture: encode with the oracle (reference C++),
    decode its bytes on device, require bit-equality with the reference's own
    decode. This is the VERDICT r1 'done' criterion for device decode."""
    from cloudini_tpu.core.header import decode_header
    from cloudini_tpu.io.ros_msgs import (
        apply_resolution_profile,
        get_deserialized_point_cloud_message,
    )

    raw = open(dds_message_bin, "rb").read()
    pc = get_deserialized_point_cloud_message(raw)
    fields = apply_resolution_profile({}, pc.fields, default_resolution=0.001)
    rows = np.frombuffer(pc.data, np.uint8).reshape(-1, pc.point_step)
    info = EncodingInfo(
        fields=tuple(fields), width=rows.shape[0], height=1,
        point_step=pc.point_step, encoding_opt=EncodingOptions.LOSSY,
        compression_opt=CompressionOption.NONE, version=5,
    )
    golden = oracle.encode(info, rows.tobytes())
    ref_rows = oracle.decode(golden)
    dinfo, hlen = decode_header(golden)
    dev = PointcloudDecoder(backend="device")
    got = dev.decode(dinfo, golden[hlen:])
    assert got.tobytes() == ref_rows


def test_p_final_exact_on_unaligned_full_buffer():
    """Regression (review finding, scan-unroll round-up): with a buffer
    width that is not a multiple of the unroll factor and sizes == B, the
    zero-feature pad transitions must not advance p_final past the true
    end-of-buffer state."""
    import jax.numpy as jnp

    from cloudini_tpu.core.plan import build_plan
    from cloudini_tpu.ops.fsm import FsmLayout, run_fsm

    fields = (
        PointField("x", 0, FieldType.FLOAT32, 0.001),
        PointField("y", 4, FieldType.FLOAT32, 0.001),
        PointField("z", 8, FieldType.FLOAT32, 0.001),
    )
    info = _info(fields, CHUNK, 12)
    rng = np.random.default_rng(0)
    pts = np.cumsum(rng.normal(0, 0.05, (CHUNK, 3)), 0).astype(np.float32)
    rows = np.ascontiguousarray(pts).view(np.uint8).reshape(CHUNK, 12)
    data = PointcloudEncoder(info, backend="host", chunk_points=CHUNK).encode(
        rows, write_header=False)
    payload = np.frombuffer(data, np.uint8)[4:]  # strip the u32 chunk frame
    b = len(payload)
    if b % 8 == 0:
        payload = payload[: b - 3]  # force an unaligned width
        b = len(payload)
    assert b % 8 != 0
    plan = build_plan(info, for_decode=True)
    layout = FsmLayout(plan)
    exact = run_fsm(layout, jnp.asarray(payload[None, :]),
                    jnp.asarray([b], np.int32))
    padded = np.zeros((1, b + 8), np.uint8)
    padded[0, :b] = payload
    ref = run_fsm(layout, jnp.asarray(padded), jnp.asarray([b], np.int32))
    # truth: the state ENTERING byte b of the padded run (bytes 0..b-1 real)
    assert int(exact[2][0]) == int(np.asarray(ref[0])[0, b])
    assert np.array_equal(np.asarray(exact[0])[0, :b], np.asarray(ref[0])[0, :b])


def _two_window_ts(n):
    """f64 column whose Gorilla stream emits TWO new-window tokens with
    DIFFERENT reuse lengths L (window A: m=20 -> L=3; window B: m=44 ->
    L=6), with reuse tokens inside each window."""
    bits = np.zeros(n, np.uint64)
    bits[0] = np.uint64(0x3FF0000000000000)
    v = bits[0]
    for i in range(1, n):
        if i == 1:
            v ^= np.uint64(0xFFFFF) << np.uint64(20)   # m=20 at trail 20
        elif i < n // 2:
            v ^= np.uint64(0x3) << np.uint64(24)        # reuse (inside A)
        elif i == n // 2:
            v ^= np.uint64((1 << 44) - 1) << np.uint64(8)  # m=44: new window B
        else:
            v ^= np.uint64(0x5) << np.uint64(12)        # reuse (inside B)
        bits[i] = v
    return bits.view(np.float64)


def test_speculative_window_tier_contract():
    """The r3 speculative single-window FSM tier: streams whose Gorilla
    column keeps ONE window length decode on device; a second new-window
    token with a DIFFERENT L flags host RETRY (never garbage), and the
    pipeline output stays bit-exact either way."""
    import jax.numpy as jnp

    from cloudini_tpu.core.plan import build_plan
    from cloudini_tpu.ops.adaptive_decode import RETRY
    from cloudini_tpu.ops.fsm_decode import FsmStage1Decoder

    n = 64
    rng = np.random.default_rng(5)

    def _stream(ts):
        rows, _, _ = _dds_rows(rng, n)
        rows[:, 18:26] = ts.reshape(-1, 1).view(np.uint8)
        info = _info(_DDS_FIELDS, n, 26)
        data = PointcloudEncoder(info, backend="host", chunk_points=CHUNK
                                 ).encode(rows, write_header=False)
        payload = np.frombuffer(data, np.uint8)[4:]
        plan = build_plan(info, for_decode=True)
        dec = FsmStage1Decoder(plan, 26, n)
        buf = np.zeros((1, -(-len(payload) // 128) * 128), np.uint8)
        buf[0, : len(payload)] = payload
        out, consumed = dec.decode(
            jnp.asarray(buf), jnp.asarray([len(payload)], np.int32),
            jnp.asarray([n], np.int32))
        return info, rows, data, np.asarray(consumed)[0]

    # single-L (the real-fixture pattern): stays on device, no retry
    _, _, _, consumed = _stream(_ts_column(rng, n, "monotonic"))
    assert consumed != RETRY and consumed != np.int32(2**31 - 1)

    # two different-L windows: speculation must flag RETRY...
    info, rows, data, consumed = _stream(_two_window_ts(n))
    assert consumed == RETRY
    # ...and the pipeline still decodes bit-exactly (host fallback)
    host = PointcloudDecoder(backend="host", chunk_points=CHUNK).decode(info, data)
    dev = PointcloudDecoder(backend="device", chunk_points=CHUNK).decode(info, data)
    assert np.array_equal(host, dev)


@pytest.mark.parametrize("kinds", [
    ("monotonic", "monotonic", "monotonic"),
    ("monotonic", "constant", "steps"),
    ("steps", "monotonic", "constant"),
    # random columns emit many new windows with varying L: the per-slot
    # speculation mis-predicts, the verify pass flags it, and the chunk
    # escapes to host RETRY — result must still be bit-exact
    ("random", "monotonic", "random"),
])
def test_multi_gorilla_units_device_decode(kinds):
    """r5 (VERDICT r4 item 7): plans with >= 2 Gorilla units decode on
    device via per-slot window speculation — a 3 x FLOAT64-lossless schema
    (e.g. x/y/z as FLOAT64 without resolution), bit-exact vs the host
    decoder. The reference factories accept any field multiset
    (codec_common.cpp:116-198)."""
    rng = np.random.default_rng(777)
    n = 2 * CHUNK + 37
    cols = [_ts_column(rng, n, k) for k in kinds]
    rows = np.zeros((n, 24), np.uint8)
    for i, c in enumerate(cols):
        rows[:, 8 * i: 8 * i + 8] = c.reshape(-1, 1).view(np.uint8)
    fields = tuple(PointField(nm, 8 * i, FieldType.FLOAT64, None)
                   for i, nm in enumerate("xyz"))
    info = _info(fields, n, 24)
    out = _roundtrip_both(info, rows)
    got = np.ascontiguousarray(out).view(np.float64).reshape(n, 3)
    for i, c in enumerate(cols):
        np.testing.assert_array_equal(got[:, i], c)


def test_multi_gorilla_mixed_with_varints_and_fixed():
    """Two Gorilla units interleaved with FloatN varints, a UINT16 INT_DELTA
    and an XOR unit — the worst-case mixed layout, device == host."""
    rng = np.random.default_rng(31337)
    n = CHUNK + 203
    pts = np.cumsum(rng.normal(0, 0.05, (n, 3)), axis=0).astype(np.float32)
    ts1 = _ts_column(rng, n, "monotonic")
    ts2 = _ts_column(rng, n, "steps")
    ring = (np.arange(n) % 16).astype(np.uint16)
    rows = np.zeros((n, 30), np.uint8)
    rows[:, :12] = pts.view(np.uint8).reshape(n, 12)
    rows[:, 12:20] = ts1.reshape(-1, 1).view(np.uint8)
    rows[:, 20:22] = ring.reshape(-1, 1).view(np.uint8)
    rows[:, 22:30] = ts2.reshape(-1, 1).view(np.uint8)
    fields = (
        PointField("x", 0, FieldType.FLOAT32, 0.001),
        PointField("y", 4, FieldType.FLOAT32, 0.001),
        PointField("z", 8, FieldType.FLOAT32, 0.001),
        PointField("t1", 12, FieldType.FLOAT64, None),
        PointField("ring", 20, FieldType.UINT16, None),
        PointField("t2", 22, FieldType.FLOAT64, None),
    )
    info = _info(fields, n, 30)
    out = _roundtrip_both(info, rows)
    np.testing.assert_array_equal(
        np.ascontiguousarray(out[:, 12:20]).view(np.float64).ravel(), ts1)
    np.testing.assert_array_equal(
        np.ascontiguousarray(out[:, 22:30]).view(np.float64).ravel(), ts2)
