"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

from cloudini_tpu import (
    CompressionOption,
    EncodingInfo,
    EncodingOptions,
    FieldType,
    PointField,
)
from cloudini_tpu.core.plan import build_plan
from cloudini_tpu.ref import stage1 as np_stage1

CHUNK = 1024


def _info(n):
    return EncodingInfo(
        fields=(
            PointField("x", 0, FieldType.FLOAT32, 0.001),
            PointField("y", 4, FieldType.FLOAT32, 0.001),
            PointField("z", 8, FieldType.FLOAT32, 0.001),
        ),
        width=n, height=1, point_step=12,
        encoding_opt=EncodingOptions.LOSSY, compression_opt=CompressionOption.NONE,
    )


def test_mesh_has_8_devices():
    import jax

    assert len(jax.devices()) == 8


def test_sharded_encode_matches_reference_kernel():
    import jax
    from cloudini_tpu.parallel.mesh import ShardedChunkCodec, make_mesh, shard_rows

    n = 21 * CHUNK + 321  # 22 chunks -> padded to 24 on the 8-device mesh
    rng = np.random.default_rng(0)
    data = (np.cumsum(rng.normal(0, 0.05, (n, 3)), axis=0)).astype(np.float32)
    rows = np.ascontiguousarray(data).view(np.uint8).reshape(n, 12)
    info = _info(n)
    plan = build_plan(info)

    mesh = make_mesh()
    codec = ShardedChunkCodec(plan, 12, mesh, chunk_points=CHUNK)
    d_rows, n_valid = shard_rows(rows, CHUNK, mesh)
    payloads, sizes = codec.encode(d_rows, n_valid)
    payloads, sizes = np.asarray(payloads), np.asarray(sizes)  # ordered gather
    nv = np.asarray(n_valid)

    for i in range((n + CHUNK - 1) // CHUNK):
        want = np_stage1.encode_chunk(plan, rows[i * CHUNK : i * CHUNK + nv[i]])
        assert sizes[i] == len(want)
        assert np.array_equal(payloads[i, : sizes[i]], want)
    # padded tail chunks encode to nothing
    assert all(sizes[(n + CHUNK - 1) // CHUNK :] == 0)

    # sharded decode round-trips
    out, _consumed = codec.decode(payloads, sizes, n_valid)
    out = np.asarray(out)
    for i in range((n + CHUNK - 1) // CHUNK):
        got = out[i, : nv[i]]
        ref = np.zeros_like(got)
        np_stage1.decode_chunk(build_plan(info, for_decode=True),
                               payloads[i, : sizes[i]], ref, nv[i])
        assert np.array_equal(got, ref)


def test_sharded_decode_mixed_plan_uses_general_path():
    """Plans with fixed-width units (COPY/XOR) decode through the general
    successor+lifting path; the sharded codec must dispatch to it (it used to
    re-jit the pure-varint body, which raises at trace time for COPY units)."""
    import jax

    from cloudini_tpu.parallel.mesh import ShardedChunkCodec, make_mesh, shard_rows

    info = EncodingInfo(
        fields=(
            PointField("x", 0, FieldType.FLOAT32, 0.001),
            PointField("flags", 4, FieldType.UINT8, None),  # COPY unit
        ),
        width=0, height=1, point_step=5,
        encoding_opt=EncodingOptions.LOSSY, compression_opt=CompressionOption.NONE,
    )
    plan_e = build_plan(info)
    plan_d = build_plan(info, for_decode=True)
    rng = np.random.default_rng(3)
    n = 3 * CHUNK + 17
    rows = np.zeros((n, 5), np.uint8)
    rows[:, :4] = (
        np.cumsum(rng.normal(0, 0.05, n)).astype(np.float32).view(np.uint8).reshape(n, 4)
    )
    rows[:, 4] = rng.integers(0, 255, n, dtype=np.uint8)

    mesh = make_mesh(8)
    codec = ShardedChunkCodec(plan_e, 5, mesh, chunk_points=CHUNK)
    d_rows, n_valid = shard_rows(rows, CHUNK, mesh)
    payloads, sizes = codec.encode(d_rows, n_valid)
    codec.plan = plan_d  # decode plan carries decode-side offsets
    decoded, _consumed = codec.decode(payloads, sizes, n_valid)
    out = np.asarray(decoded)
    nv = np.asarray(n_valid)
    got = np.concatenate([out[i, : nv[i]] for i in range(len(nv))])
    # byte flags survive exactly; floats within quantization tolerance
    assert np.array_equal(got[:, 4], rows[:, 4])
    x0 = rows[:, :4].copy().view(np.float32).ravel()
    x1 = got[:, :4].copy().view(np.float32).ravel()
    assert np.abs(x1 - x0).max() <= 0.001 * 0.50001


def test_sharded_encode_with_fused_zstd():
    """The fused stage-1 + device-ZSTD program shards over the chunk axis:
    every per-shard frame decodes through libzstd to the reference stage-1
    bytes."""
    import zstandard

    from cloudini_tpu.parallel.mesh import ShardedChunkCodec, make_mesh, shard_rows

    n = 7 * CHUNK + 123  # 8 chunks on the 8-device mesh
    rng = np.random.default_rng(4)
    data = (np.cumsum(rng.normal(0, 0.05, (n, 3)), axis=0)).astype(np.float32)
    rows = np.ascontiguousarray(data).view(np.uint8).reshape(n, 12)
    plan = build_plan(_info(n))

    mesh = make_mesh()
    codec = ShardedChunkCodec(plan, 12, mesh, chunk_points=CHUNK, stage2="zstd")
    d_rows, n_valid = shard_rows(rows, CHUNK, mesh)
    payloads, sizes = codec.encode(d_rows, n_valid)
    payloads, sizes = np.asarray(payloads), np.asarray(sizes)
    nv = np.asarray(n_valid)
    dctx = zstandard.ZstdDecompressor()
    for i in range((n + CHUNK - 1) // CHUNK):
        want = np_stage1.encode_chunk(plan, rows[i * CHUNK: i * CHUNK + nv[i]])
        got = dctx.decompress(payloads[i, : sizes[i]].tobytes(),
                              max_output_size=len(want) + 16)
        assert got == want.tobytes()
