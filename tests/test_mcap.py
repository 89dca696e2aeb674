"""MCAP container + converter tests (self-roundtrip; the DDS payload layer is
oracle-locked separately in test_ros_msgs.py)."""

import numpy as np
import pytest

from cloudini_tpu.core.types import CompressionOption, FieldType, PointField
from cloudini_tpu.io import ros_definitions as defs
from cloudini_tpu.io.mcap import McapReader, McapWriter
from cloudini_tpu.io.ros_msgs import (
    RosPointCloud2,
    get_deserialized_point_cloud_message,
    serialize_point_cloud2,
)


def _make_cloud_msg(n, seed):
    rng = np.random.default_rng(seed)
    pts = np.cumsum(rng.normal(0, 0.05, (n, 4)), axis=0).astype(np.float32)
    pc = RosPointCloud2()
    pc.ros_header.frame_id = "lidar"
    pc.width, pc.height = n, 1
    pc.fields = [
        PointField("x", 0, FieldType.FLOAT32),
        PointField("y", 4, FieldType.FLOAT32),
        PointField("z", 8, FieldType.FLOAT32),
        PointField("intensity", 12, FieldType.FLOAT32),
    ]
    pc.point_step = 16
    pc.row_step = 16 * n
    pc.data = np.ascontiguousarray(pts).tobytes()
    return serialize_point_cloud2(pc)


@pytest.mark.parametrize("compression", ["zstd", "lz4", ""])
def test_mcap_write_read_roundtrip(tmp_path, compression):
    path = str(tmp_path / "t.mcap")
    w = McapWriter(path, profile="ros2", compression=compression, chunk_size=4096)
    sid = w.add_schema(defs.POINTCLOUD_SCHEMA_NAME, "ros2msg", defs.POINTCLOUD_SCHEMA_DATA.encode())
    cid = w.add_channel("/points", "cdr", sid)
    w.write_metadata("bag_info", {"origin": "test"})
    msgs = [_make_cloud_msg(100 + i, i) for i in range(7)]
    for i, m in enumerate(msgs):
        w.write_message(cid, log_time=1000 + i, data=m, sequence=i)
    w.close()

    r = McapReader(path)
    assert r.profile == "ros2"
    assert list(r.schemas.values())[0].name == defs.POINTCLOUD_SCHEMA_NAME
    assert list(r.channels.values())[0].topic == "/points"
    assert any(md.name == "bag_info" for md in r.metadata)
    got = list(r.messages())
    assert len(got) == 7
    for i, (ch, schema, msg) in enumerate(got):
        assert ch.topic == "/points"
        assert schema.name == defs.POINTCLOUD_SCHEMA_NAME
        assert msg.log_time == 1000 + i
        assert msg.data == msgs[i]


def test_converter_encode_decode_roundtrip(tmp_path):
    from cloudini_tpu.tools.mcap_converter import McapConverter

    src = str(tmp_path / "src.mcap")
    w = McapWriter(src, profile="ros2", compression="zstd")
    sid = w.add_schema(defs.POINTCLOUD_SCHEMA_NAME, "ros2msg", defs.POINTCLOUD_SCHEMA_DATA.encode())
    cid = w.add_channel("/points", "cdr", sid)
    other = w.add_channel("/other", "cdr", w.add_schema("std_msgs/msg/String", "ros2msg", b"string data"))
    msgs = [_make_cloud_msg(4000 + 13 * i, i) for i in range(5)]
    for i, m in enumerate(msgs):
        w.write_message(cid, log_time=10 + i, data=m, sequence=i)
        w.write_message(other, log_time=10 + i, data=b"\x00\x01hello", sequence=i)
    w.close()

    conv = McapConverter()
    topics = conv.open(src)
    assert topics == {"/points": defs.POINTCLOUD_SCHEMA_NAME}
    enc_path = str(tmp_path / "enc.mcap")
    stats = conv.encode_point_clouds(enc_path, default_resolution=0.001)
    assert stats.processed_messages == 5
    assert stats.total_output_bytes < stats.total_input_bytes / 2

    # schema swapped, passthrough intact
    r = McapReader(enc_path)
    names = {s.name for s in r.schemas.values()}
    assert defs.COMPRESSED_SCHEMA_NAME in names and defs.POINTCLOUD_SCHEMA_NAME not in names
    passthrough = [m for ch, s, m in r.messages() if ch.topic == "/other"]
    assert len(passthrough) == 5 and passthrough[0].data == b"\x00\x01hello"

    conv2 = McapConverter()
    topics2 = conv2.open(enc_path)
    assert topics2 == {"/points": defs.COMPRESSED_SCHEMA_NAME}
    dec_path = str(tmp_path / "dec.mcap")
    conv2.decode_point_clouds(dec_path)

    r2 = McapReader(dec_path)
    decoded = [m for ch, s, m in r2.messages() if ch.topic == "/points"]
    assert len(decoded) == 5
    for i, msg in enumerate(decoded):
        src_pc = get_deserialized_point_cloud_message(msgs[i])
        out_pc = get_deserialized_point_cloud_message(msg.data)
        a = np.frombuffer(src_pc.data, np.float32)
        b = np.frombuffer(out_pc.data, np.float32)
        assert np.abs(a - b).max() <= 0.001 * 0.501  # 0.5*res + float multiplier slack


def test_converter_viz_reduces_size(tmp_path):
    from cloudini_tpu.tools.mcap_converter import McapConverter

    rng = np.random.default_rng(0)
    # cloud with many duplicate voxels and NaNs
    base = (rng.uniform(-5, 5, (800, 4)) // 0.25 * 0.25).astype(np.float32)
    pts = np.tile(base, (4, 1))
    pts[::31] = np.nan
    pc = RosPointCloud2()
    pc.width, pc.height = pts.shape[0], 1
    pc.fields = [
        PointField("x", 0, FieldType.FLOAT32),
        PointField("y", 4, FieldType.FLOAT32),
        PointField("z", 8, FieldType.FLOAT32),
        PointField("intensity", 12, FieldType.FLOAT32),
    ]
    pc.point_step = 16
    pc.data = np.ascontiguousarray(pts).tobytes()
    msg = serialize_point_cloud2(pc)

    src = str(tmp_path / "src.mcap")
    w = McapWriter(src, compression="zstd")
    cid = w.add_channel(
        "/points", "cdr",
        w.add_schema(defs.POINTCLOUD_SCHEMA_NAME, "ros2msg", defs.POINTCLOUD_SCHEMA_DATA.encode()),
    )
    w.write_message(cid, log_time=1, data=msg)
    w.close()

    conv = McapConverter()
    conv.open(src)
    plain = conv.encode_point_clouds(str(tmp_path / "p.mcap"), default_resolution=0.001)
    conv.open(src)
    viz = conv.encode_point_clouds(str(tmp_path / "v.mcap"), default_resolution=0.001, viz_lossy=True)
    assert viz.total_output_bytes < plain.total_output_bytes


def test_converter_batched_encode_matches_streamed(tmp_path):
    """batch_window buffers a message window and encodes each schema group in
    ONE device dispatch (PointcloudEncoder.encode_many); the output bag must
    be byte-identical to the one-message-at-a-time path, interleaved
    passthrough messages included."""
    from cloudini_tpu.tools.mcap_converter import McapConverter

    src = str(tmp_path / "src.mcap")
    w = McapWriter(src, profile="ros2", compression="zstd")
    sid = w.add_schema(defs.POINTCLOUD_SCHEMA_NAME, "ros2msg", defs.POINTCLOUD_SCHEMA_DATA.encode())
    cid = w.add_channel("/points", "cdr", sid)
    other = w.add_channel("/other", "cdr", w.add_schema("std_msgs/msg/String", "ros2msg", b"str"))
    for i in range(7):
        w.write_message(cid, log_time=10 + i, data=_make_cloud_msg(3000 + 17 * i, i), sequence=i)
        if i % 2:
            w.write_message(other, log_time=10 + i, data=b"\x00\x01x", sequence=i)
    w.close()

    out_stream = str(tmp_path / "stream.mcap")
    conv = McapConverter()
    conv.open(src)
    conv.encode_point_clouds(out_stream, default_resolution=0.001)

    # backend="device" forces the stacked one-dispatch path even for tiny
    # windows (tests run on the CPU jax backend); "auto" exercises the
    # fallback loop on small windows — both must produce identical bags
    for window, backend in ((3, "auto"), (100, "auto"), (3, "device"), (100, "device")):
        out_batch = str(tmp_path / f"batch{window}{backend}.mcap")
        conv2 = McapConverter()
        conv2.open(src)
        stats = conv2.encode_point_clouds(out_batch, default_resolution=0.001,
                                          batch_window=window, backend=backend)
        assert stats.processed_messages == 7
        a = open(out_stream, "rb").read()
        b = open(out_batch, "rb").read()
        assert a == b, f"batched (window={window}, {backend}) bag differs from streamed bag"


def test_converter_device_stage2_zstd(tmp_path):
    """device_stage2=True with the default ZSTD method: the converted bag's
    decoded clouds must match the host-path bag's decode (streams differ in
    bytes — device frames are an independent valid encoding)."""
    from cloudini_tpu.tools.mcap_converter import McapConverter

    src = str(tmp_path / "src.mcap")
    w = McapWriter(src, profile="ros2", compression="zstd")
    sid = w.add_schema(defs.POINTCLOUD_SCHEMA_NAME, "ros2msg",
                       defs.POINTCLOUD_SCHEMA_DATA.encode())
    cid = w.add_channel("/points", "cdr", sid)
    msgs = [_make_cloud_msg(3000 + 7 * i, i) for i in range(3)]
    for i, m in enumerate(msgs):
        w.write_message(cid, log_time=10 + i, data=m, sequence=i)
    w.close()

    conv = McapConverter()
    conv.open(src)
    conv.encode_point_clouds(str(tmp_path / "dev.mcap"),
                             default_resolution=0.001, device_stage2=True)
    conv.open(src)
    conv.encode_point_clouds(str(tmp_path / "host.mcap"),
                             default_resolution=0.001)

    outs = []
    for name in ("dev", "host"):
        c2 = McapConverter()
        c2.open(str(tmp_path / f"{name}.mcap"))
        c2.decode_point_clouds(str(tmp_path / f"{name}_dec.mcap"))
        r = McapReader(str(tmp_path / f"{name}_dec.mcap"))
        outs.append([m.data for _ch, _s, m in r.messages()])
    assert outs[0] == outs[1]
