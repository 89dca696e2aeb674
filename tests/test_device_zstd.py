"""Device ZSTD frame compressor (ops/zstd.py): every frame must decode with
libzstd (the ``zstandard`` wheel — the same library family the reference
links for its headline mode, codec_common.cpp:242) AND with the numpy
mini-decoder (ref/zstd_frame.decode_frame), which locks the predefined FSE
tables a second way."""

import numpy as np
import pytest
import zstandard

from cloudini_tpu.ops.zstd import compress_bound, zstd_compress_chunks
from cloudini_tpu.ref import zstd_frame as ZF

dctx = zstandard.ZstdDecompressor()


def _device_zstd(arr: np.ndarray, max_seqs: int = 2048) -> bytes:
    import jax.numpy as jnp

    n = len(arr)
    b = -(-max(n, 16) // 16384) * 16384  # bucketed: tests share compiles
    data = np.zeros((1, b), np.uint8)
    data[0, :n] = arr
    out, osz = zstd_compress_chunks(
        jnp.asarray(data), jnp.asarray(np.array([n], np.int32)),
        compress_bound(b), max_seqs,
    )
    return bytes(np.asarray(out)[0, : int(np.asarray(osz)[0])])


def _corpus():
    rng = np.random.default_rng(0)
    return {
        "zeros": np.zeros(50000, np.uint8),
        "random": rng.integers(0, 256, 50000, dtype=np.uint8),
        "period16": np.tile(rng.integers(0, 256, 16, dtype=np.uint8), 3000),
        "period26": np.tile(rng.integers(0, 256, 26, dtype=np.uint8), 2000),
        "runs_and_noise": np.concatenate(
            [np.zeros(997, np.uint8), rng.integers(0, 256, 1003, dtype=np.uint8)]
            * 10
        ),
        "short": np.frombuffer(b"abcabcabcXYZ", np.uint8),
        "empty": np.zeros(0, np.uint8),
    }


@pytest.mark.parametrize("name", list(_corpus()))
def test_frames_decode_with_libzstd_and_mini(name):
    arr = _corpus()[name]
    frame = _device_zstd(arr)
    want = arr.tobytes()
    assert dctx.decompress(frame, max_output_size=len(want) + 16) == want
    assert ZF.decode_frame(frame) == want


def test_multiblock_frame():
    """Rows larger than the 126 KiB block cap segment into multiple
    independent blocks of one frame."""
    rng = np.random.default_rng(1)
    base = rng.integers(0, 256, 113, dtype=np.uint8)
    arr = np.tile(base, 2700)[:300000]
    frame = _device_zstd(arr)
    want = arr.tobytes()
    assert dctx.decompress(frame, max_output_size=len(want) + 16) == want
    assert len(frame) < 30000  # long periodic data compresses hard


def test_sequence_cap_decays_to_literals():
    """With a tiny max_seqs the kept prefix still produces valid frames;
    dropped matches become literals."""
    rng = np.random.default_rng(2)
    arr = rng.integers(0, 4, 40000, dtype=np.uint8)
    frame = _device_zstd(arr, max_seqs=16)
    want = arr.tobytes()
    assert dctx.decompress(frame, max_output_size=len(want) + 16) == want


def test_batched_rows_independent():
    """Each row of a batch becomes its own frame; ragged sizes honored."""
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    b = 4096
    rows = np.zeros((4, b), np.uint8)
    sizes = np.array([4096, 100, 0, 2048], np.int32)
    rows[0] = np.tile(rng.integers(0, 256, 32, dtype=np.uint8), 128)
    rows[1, :100] = rng.integers(0, 256, 100, dtype=np.uint8)
    rows[3, :2048] = np.tile(np.arange(8, dtype=np.uint8), 256)
    out, osz = zstd_compress_chunks(
        jnp.asarray(rows), jnp.asarray(sizes), compress_bound(b)
    )
    out, osz = np.asarray(out), np.asarray(osz)
    for i in range(4):
        want = rows[i, : sizes[i]].tobytes()
        frame = out[i, : osz[i]].tobytes()
        assert dctx.decompress(frame, max_output_size=len(want) + 16) == want


def test_huffman_literal_rows():
    """Rows whose literals benefit from Huffman coding emit
    Compressed_Literals_Blocks (both weight-table forms) that libzstd and
    the mini-decoder accept; low-entropy data must compress near its
    entropy, which raw literals cannot reach."""
    rng = np.random.default_rng(7)
    low = rng.integers(0, 8, 20000, dtype=np.uint8)  # direct weights
    w = np.exp(-np.arange(256) / 20.0)
    skew = rng.choice(256, 20000, p=w / w.sum()).astype(np.uint8)  # FSE wts
    for arr in (low, skew):
        frame = _device_zstd(arr, max_seqs=512)
        want = arr.tobytes()
        assert dctx.decompress(frame, max_output_size=len(want) + 16) == want
        assert ZF.decode_frame(frame) == want
    assert len(_device_zstd(low, max_seqs=512)) < 0.45 * len(low)


def test_fuzz_batch_mixed_content():
    """One batch, one compile: rows mixing entropy levels, periodic
    structure, runs, ragged sizes — every frame must decode through both
    libzstd and the mini-decoder."""
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    b = 16384
    rows = np.zeros((8, b), np.uint8)
    sizes = np.zeros(8, np.int32)
    gens = [
        lambda n: rng.integers(0, 256, n, dtype=np.uint8),
        lambda n: rng.integers(0, 4, n, dtype=np.uint8),
        lambda n: np.tile(rng.integers(0, 256, 37, dtype=np.uint8),
                          n // 37 + 1)[:n],
        lambda n: np.zeros(n, np.uint8),
        lambda n: np.concatenate([
            rng.integers(0, 256, n // 2, dtype=np.uint8),
            np.tile(rng.integers(0, 8, 16, dtype=np.uint8), n)[: n - n // 2],
        ]),
        lambda n: rng.choice(
            256, n, p=(lambda w: w / w.sum())(np.exp(-np.arange(256) / 11.0))
        ).astype(np.uint8),
        lambda n: np.frombuffer((b"the quick brown fox " * (n // 20 + 1))[:n],
                                np.uint8),
        lambda n: rng.integers(250, 256, n, dtype=np.uint8),
    ]
    for i, g in enumerate(gens):
        n = int(rng.integers(0, b + 1)) if i else b
        rows[i, :n] = g(n)
        sizes[i] = n
    out, osz = zstd_compress_chunks(
        jnp.asarray(rows), jnp.asarray(sizes), compress_bound(b))
    out, osz = np.asarray(out), np.asarray(osz)
    for i in range(8):
        want = rows[i, : sizes[i]].tobytes()
        frame = out[i, : osz[i]].tobytes()
        assert dctx.decompress(frame, max_output_size=len(want) + 16) == want, i
        assert ZF.decode_frame(frame) == want, i


def test_fused_pipeline_roundtrip():
    """device_stage2=True with ZSTD: stage-1 + zstd frames in one device
    program; the stream decodes with the framework decoder (host libzstd
    stage 2) bit-identically to the host-path stream's decode."""
    from cloudini_tpu import (
        CompressionOption,
        EncodingInfo,
        EncodingOptions,
        FieldType,
        PointField,
        PointcloudDecoder,
        PointcloudEncoder,
    )

    n = 32768 + 177  # two chunks, ragged tail
    rng = np.random.default_rng(3)
    pts = np.cumsum(rng.normal(0, 0.05, (n, 4)), axis=0).astype(np.float32)
    rows = np.ascontiguousarray(pts).view(np.uint8).reshape(n, 16)
    info = EncodingInfo(
        fields=(
            PointField("x", 0, FieldType.FLOAT32, 0.001),
            PointField("y", 4, FieldType.FLOAT32, 0.001),
            PointField("z", 8, FieldType.FLOAT32, 0.001),
            PointField("intensity", 12, FieldType.FLOAT32, 0.01),
        ),
        width=n, height=1, point_step=16,
        encoding_opt=EncodingOptions.LOSSY,
        compression_opt=CompressionOption.ZSTD,
    )
    enc = PointcloudEncoder(info, device_stage2=True)
    assert enc.backend == "device" and enc._device_stage2
    stream = enc.encode(rows, write_header=False)
    decoded = PointcloudDecoder(backend="host").decode(info, stream)
    host_stream = PointcloudEncoder(info, backend="host").encode(
        rows, write_header=False)
    want = PointcloudDecoder(backend="host").decode(info, host_stream)
    assert np.array_equal(decoded, want)
    assert len(stream) < n * 16

    # strongest cross-validation: the reference C++ (real libzstd) decodes
    # the device-produced stream to the same rows
    import pathlib

    from tests.conftest import ORACLE_BIN
    from tests.oracle_utils import Oracle

    if pathlib.Path(ORACLE_BIN).exists():
        full = enc.encode(rows, write_header=True)
        ref_rows = np.frombuffer(
            Oracle(str(ORACLE_BIN)).decode(full), np.uint8
        ).reshape(-1, 16)
        assert np.array_equal(ref_rows, want)


def test_encode_many_device_zstd():
    """The batched streaming path (encode_many) with fused device ZSTD:
    every stream decodes through the framework decoder."""
    from cloudini_tpu import (
        CompressionOption,
        EncodingInfo,
        EncodingOptions,
        FieldType,
        PointField,
        PointcloudDecoder,
        PointcloudEncoder,
    )

    rng = np.random.default_rng(9)
    info = EncodingInfo(
        fields=(
            PointField("x", 0, FieldType.FLOAT32, 0.001),
            PointField("y", 4, FieldType.FLOAT32, 0.001),
            PointField("z", 8, FieldType.FLOAT32, 0.001),
            PointField("intensity", 12, FieldType.FLOAT32, 0.01),
        ),
        width=0, height=1, point_step=16,
        encoding_opt=EncodingOptions.LOSSY,
        compression_opt=CompressionOption.ZSTD,
    )
    enc = PointcloudEncoder(info, device_stage2=True)
    clouds, infos = [], []
    for n in (1500, 700, 2100):
        pts = np.cumsum(rng.normal(0, 0.05, (n, 4)), 0).astype(np.float32)
        clouds.append(np.ascontiguousarray(pts).view(np.uint8).reshape(n, 16))
        infos.append(info.with_(width=n))
    streams = enc.encode_many(clouds, infos=infos)
    dec = PointcloudDecoder(backend="host")
    for cloud, inf, stream in zip(clouds, infos, streams):
        got = dec.decode_full(stream)[1]
        want_stream = PointcloudEncoder(inf, backend="host").encode(cloud)
        want = dec.decode_full(want_stream)[1]
        assert np.array_equal(got, want)


def test_chain_merge_beats_device_lz4_on_mixed_fixture():
    """On the real dds mixed stage-1 stream the zstd sequence tier must
    out-compress the device-LZ4 kernel (measured r2: 0.48 vs 0.54)."""
    import pathlib

    import jax.numpy as jnp

    from cloudini_tpu import native
    from cloudini_tpu.core.plan import build_plan
    from cloudini_tpu.core.types import (
        CompressionOption,
        EncodingInfo,
        EncodingOptions,
    )
    from cloudini_tpu.io.ros_msgs import (
        apply_resolution_profile,
        get_deserialized_point_cloud_message,
    )
    from cloudini_tpu.ops.lz4 import lz4_compress_chunks
    from cloudini_tpu.ops.lz4 import compress_bound as lz4_bound

    dds = pathlib.Path("/root/reference/cloudini_lib/samples/dds_message.bin")
    if not dds.exists() or not native.available():
        pytest.skip("fixture or native runtime unavailable")
    pc = get_deserialized_point_cloud_message(dds.read_bytes())
    pc.fields = apply_resolution_profile({}, pc.fields, 0.001)
    rows = np.frombuffer(pc.data, np.uint8).reshape(-1, pc.point_step)
    info = EncodingInfo(fields=tuple(pc.fields), width=rows.shape[0], height=1,
                        point_step=pc.point_step,
                        encoding_opt=EncodingOptions.LOSSY,
                        compression_opt=CompressionOption.NONE)
    plan = build_plan(info)
    blob = np.asarray(
        native.encode_chunk(plan, rows[:16384], plan.max_encoded_point_bytes)
    ).tobytes()
    n = len(blob)
    b = -(-n // 1024) * 1024
    data = np.zeros((1, b), np.uint8)
    data[0, :n] = np.frombuffer(blob, np.uint8)
    dj = jnp.asarray(data)
    sz = jnp.asarray(np.array([n], np.int32))
    zout, zsz = zstd_compress_chunks(dj, sz, compress_bound(b))
    lout, lsz = lz4_compress_chunks(dj, sz, lz4_bound(b))
    frame = bytes(np.asarray(zout)[0, : int(zsz[0])])
    assert dctx.decompress(frame, max_output_size=n + 16) == blob
    assert int(zsz[0]) < int(lsz[0])
    # with Huffman literals the device frame sits within 12% of zstd-1
    z1 = zstandard.ZstdCompressor(level=1, write_content_size=False,
                                  write_checksum=False).compress(blob)
    assert int(zsz[0]) < 1.12 * len(z1)


# ---- dynamic sequence tables + weight-cap regressions ------------------------


def _seq_modes(frame: bytes):
    """Compression-modes bytes of every compressed block in a frame."""
    modes = []
    pos = 6
    while pos < len(frame):
        bh = int.from_bytes(frame[pos: pos + 3], "little")
        pos += 3
        last, btype, bsize = bh & 1, (bh >> 1) & 3, bh >> 3
        if btype == 2:
            blk = frame[pos: pos + bsize]
            lb = blk[0]
            lt, sf = lb & 3, (lb >> 2) & 3
            if lt in (0, 1):
                assert sf == 3
                regen = (int.from_bytes(blk[:3], "little") >> 4) & 0xFFFFF
                lsec = (3 + regen) if lt == 0 else 4
            else:
                v = int.from_bytes(blk[:5], "little") >> 4
                lsec = 5 + (v >> 18)
            sq = blk[lsec:]
            b0 = sq[0]
            if b0:
                modes.append(sq[1 if b0 < 128 else 2])
        pos += bsize if btype != 1 else 1
        if last:
            break
    return modes


def test_dynamic_sequence_modes_engage():
    """Periodic data with noise must trip the dynamic tier: at least one
    block carries a non-predefined mode byte, and the frame still decodes
    through libzstd AND the mini-decoder."""
    rng = np.random.default_rng(5)
    base = rng.integers(0, 256, 26, dtype=np.uint8)
    arr = np.tile(base, 3000).copy()
    noise = rng.random(arr.shape[0]) < 0.15
    arr[noise] = rng.integers(0, 256, int(noise.sum()), dtype=np.uint8)
    frame = _device_zstd(arr)
    want = arr.tobytes()
    assert dctx.decompress(frame, max_output_size=len(want) + 16) == want
    assert ZF.decode_frame(frame) == want
    assert any(m != 0 for m in _seq_modes(frame)), _seq_modes(frame)


def test_weight_cap_keeps_huffman_on_wide_alphabets():
    """~255 distinct byte values with a skewed distribution: direct 4-bit
    weights cannot represent >128 symbols and the uncapped weight-FSE table
    used to be rejected (r1 gate), decaying the block to RAW literals.
    With the cap+water-fill the Huffman stage must engage."""
    rng = np.random.default_rng(9)
    # geometric-ish skew over the full byte alphabet (~6.3 b/B), few matches
    vals = np.minimum((rng.exponential(40, 60000)).astype(np.int64), 255)
    arr = vals.astype(np.uint8)
    arr = np.where(rng.random(60000) < 0.15, rng.integers(0, 256, 60000).astype(np.uint8), arr)
    assert len(np.unique(arr)) > 200
    frame = _device_zstd(arr)
    want = arr.tobytes()
    assert dctx.decompress(frame, max_output_size=len(want) + 16) == want
    assert ZF.decode_frame(frame) == want
    assert len(frame) < 0.9 * len(want)  # Huffman engaged, not raw


def test_mode_mixture_batch():
    """One batch whose rows exercise RLE-heavy, dynamic, and predefined-ish
    sequence coding simultaneously (per-row tables must not leak)."""
    import jax.numpy as jnp

    from cloudini_tpu.ops.zstd import compress_bound, zstd_compress_chunks

    rng = np.random.default_rng(13)
    b = 32768
    rows = np.zeros((3, b), np.uint8)
    rows[0] = np.tile(rng.integers(0, 256, 16, dtype=np.uint8), b // 16)
    per = np.tile(rng.integers(0, 256, 26, dtype=np.uint8), b // 26 + 1)[:b]
    noise = rng.random(b) < 0.2
    per[noise] = rng.integers(0, 256, int(noise.sum()), dtype=np.uint8)
    rows[1] = per
    rows[2] = rng.integers(0, 4, b, dtype=np.uint8)
    sizes = np.array([b, b, b - 7], np.int32)
    out, osz = zstd_compress_chunks(
        jnp.asarray(rows), jnp.asarray(sizes), compress_bound(b))
    out = np.asarray(out)
    osz = np.asarray(osz)
    for i in range(3):
        frame = bytes(out[i, : osz[i]])
        want = rows[i, : sizes[i]].tobytes()
        assert dctx.decompress(frame, max_output_size=b + 16) == want, i
        assert ZF.decode_frame(frame) == want, i


def test_rep_offsets_do_not_cross_blocks():
    """Rep history carries across the blocks of one frame; the encoder's
    per-block parse must never emit a rep code that references inherited
    history. Block 1 ends on offset-8 matches; block 2 opens with a literal
    then an offset-1 run — a per-block 'initial rep0 = 1' assumption emits
    Offset_Value 1 there and the decoder copies from distance 8 instead
    (silent corruption, caught by review r2)."""
    rng = np.random.default_rng(17)
    cap = 126 * 1024
    head = np.tile(rng.integers(0, 256, 8, dtype=np.uint8), cap // 8 + 1)[:cap]
    tail = np.concatenate([
        np.frombuffer(b"Z", np.uint8),
        np.full(4000, ord("a"), np.uint8),
        rng.integers(0, 256, 300000 - cap - 4001, dtype=np.uint8),
    ])
    arr = np.concatenate([head, tail])
    frame = _device_zstd(arr)
    want = arr.tobytes()
    assert dctx.decompress(frame, max_output_size=len(want) + 16) == want
    assert ZF.decode_frame(frame) == want


def test_v5_adaptive_with_fused_device_zstd():
    """V5 adaptive-int sections + fused device-ZSTD stage 2 in one program:
    the stream decodes bit-identically through the reference C++ (real
    libzstd + v5 section decoder) and the framework decoder; the adaptive
    int field survives losslessly."""
    import pathlib

    from cloudini_tpu import (
        CompressionOption,
        EncodingInfo,
        EncodingOptions,
        FieldType,
        PointField,
        PointcloudDecoder,
        PointcloudEncoder,
    )
    from cloudini_tpu.core.header import decode_header
    from tests.conftest import ORACLE_BIN
    from tests.oracle_utils import Oracle

    n = 32768 + 4099  # crosses the V5 probe boundary and a chunk boundary
    rng = np.random.default_rng(5)
    pts = np.cumsum(rng.normal(0, 0.05, (n, 3)), axis=0).astype(np.float32)
    ring = (np.arange(n) % 32).astype(np.int32)
    rows = np.zeros((n, 16), np.uint8)
    rows[:, :12] = pts.view(np.uint8).reshape(n, 12)
    rows[:, 12:16] = ring.reshape(-1, 1).view(np.uint8)
    info = EncodingInfo(
        fields=(PointField("x", 0, FieldType.FLOAT32, 0.001),
                PointField("y", 4, FieldType.FLOAT32, 0.001),
                PointField("z", 8, FieldType.FLOAT32, 0.001),
                PointField("ring", 12, FieldType.INT32, 1.0)),
        width=n, height=1, point_step=16,
        encoding_opt=EncodingOptions.LOSSY,
        compression_opt=CompressionOption.ZSTD, version=5)
    enc = PointcloudEncoder(info, device_stage2=True)
    assert enc.backend == "device" and enc._device_stage2
    stream = enc.encode(rows.tobytes())
    hi, hl = decode_header(stream)
    mine = bytes(PointcloudDecoder().decode(hi, stream[hl:]))
    out = np.frombuffer(mine, np.uint8).reshape(n, 16)
    assert np.array_equal(
        out[:, 12:16].copy().view(np.int32).ravel(), ring)
    if pathlib.Path(ORACLE_BIN).exists():
        assert Oracle(str(ORACLE_BIN)).decode(stream) == mine


def test_width_tier_ladder_boundaries():
    """r5: the zstd tight tier is 5.5 B/pt with an 8 B/pt middle tier and the
    worst-case full width above that (device_codec._encode). The r4 fused-LZ4
    perf bug was a gate predicate failing on an EXACT boundary shape — so
    every tier, including streams landing exactly ON a width boundary, must
    emit frames that round-trip. Noise amplitude drives the stage-1 token
    width (tiny deltas -> ~4 B/pt, huge -> up to 20 B/pt)."""
    import jax.numpy as jnp

    from cloudini_tpu.core.plan import build_plan
    from cloudini_tpu.core.types import (
        CompressionOption,
        EncodingInfo,
        EncodingOptions,
        FieldType,
        PointField,
    )
    from cloudini_tpu.ops.device_codec import DeviceStage1Encoder
    from cloudini_tpu.codec import stage2 as s2
    from cloudini_tpu.ref import stage1 as np_stage1

    cp = 1024
    info = EncodingInfo(
        fields=tuple(PointField(n, 4 * i, FieldType.FLOAT32, 0.001)
                     for i, n in enumerate("xyzi")),
        width=0, height=1, point_step=16,
        encoding_opt=EncodingOptions.LOSSY,
        compression_opt=CompressionOption.ZSTD,
    )
    plan = build_plan(info)
    enc = DeviceStage1Encoder(plan, 16, chunk_points=cp, stage2="zstd")
    rng = np.random.default_rng(9)
    for amp in (0.001, 0.3, 3.0, 3000.0):  # tight / tight~mid / mid / full
        pts = np.cumsum(rng.normal(0, amp, (cp, 4)), axis=0).astype(np.float32)
        rows = np.ascontiguousarray(pts).view(np.uint8).reshape(1, cp, 16)
        pay, sz = enc.encode_chunks(jnp.asarray(rows),
                                    jnp.asarray(np.array([cp], np.int32)))
        frame = bytes(np.asarray(pay)[0, : int(np.asarray(sz)[0])])
        want = np_stage1.encode_chunk(plan, rows[0]).tobytes()
        got = s2.decompress_chunk(CompressionOption.ZSTD, frame, len(want) + 1)
        assert got == want, f"amp {amp}: fused-ZSTD frame diverges"
