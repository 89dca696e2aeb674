"""Streaming topic-converter service — the ROS-node-capability equivalent
(reference: cloudini_ros/src/topic_converter.cpp, plugin dynamic
``cloudini_resolution`` parameter)."""

import io
import json
import struct

import numpy as np
import pytest

from cloudini_tpu.io.ros_msgs import get_deserialized_point_cloud_message
from cloudini_tpu.tools.topic_converter import (
    FRAME_CONTROL,
    FRAME_DATA,
    PointcloudConverterService,
    serve_connection,
)

_HDR = struct.Struct("<BI")


@pytest.fixture(scope="module")
def raw_msg(dds_message_bin):
    with open(dds_message_bin, "rb") as f:
        return f.read()


def _xyz(dds_bytes):
    pc = get_deserialized_point_cloud_message(dds_bytes)
    rows = np.frombuffer(pc.data, np.uint8).reshape(-1, pc.point_step)
    off = {f.name: f.offset for f in pc.fields}
    return np.stack(
        [rows[:, off[k] : off[k] + 4].copy().view(np.float32).ravel() for k in "xyz"],
        axis=1,
    )


def test_round_trip(raw_msg):
    comp = PointcloudConverterService(mode="compress", resolution=0.001, backend="host")
    decomp = PointcloudConverterService(mode="decompress", backend="host")
    encoded = comp.convert(raw_msg)
    assert len(encoded) < len(raw_msg) * 0.6
    restored = decomp.convert(encoded)
    got, want = _xyz(restored), _xyz(raw_msg)
    assert np.nanmax(np.abs(got - want)) <= 0.001 * 0.51


def test_dynamic_resolution_param(raw_msg):
    svc = PointcloudConverterService(mode="compress", resolution=0.001, backend="host")
    fine = svc.convert(raw_msg)
    svc.set_param("cloudini_resolution", 0.05)  # coarser -> smaller output
    coarse = svc.convert(raw_msg)
    assert len(coarse) < len(fine)
    restored = PointcloudConverterService(mode="decompress", backend="host").convert(coarse)
    assert np.nanmax(np.abs(_xyz(restored) - _xyz(raw_msg))) <= 0.05 * 0.51


def test_profile_param(raw_msg):
    svc = PointcloudConverterService(
        mode="compress", profile="xyz:0.001; timestamp:remove", backend="host"
    )
    out = svc.convert(raw_msg)
    pc = get_deserialized_point_cloud_message(out)
    names = {f.name for f in pc.fields}
    assert "timestamp" not in names and {"x", "y", "z"} <= names


def test_framed_stream_protocol(raw_msg):
    svc = PointcloudConverterService(mode="compress", resolution=0.001, backend="host",
                                     log=lambda m: None)
    control = json.dumps({"cloudini_resolution": 0.01}).encode()
    rfile = io.BytesIO(
        _HDR.pack(FRAME_DATA, len(raw_msg)) + raw_msg
        + _HDR.pack(FRAME_CONTROL, len(control)) + control
        + _HDR.pack(FRAME_DATA, len(raw_msg)) + raw_msg
    )
    wfile = io.BytesIO()
    served = serve_connection(svc, rfile, wfile)
    assert served == 2
    out = wfile.getvalue()
    ftype, size1 = _HDR.unpack_from(out, 0)
    assert ftype == FRAME_DATA
    second_off = _HDR.size + size1
    _, size2 = _HDR.unpack_from(out, second_off)
    assert size2 < size1  # the control frame coarsened the resolution
    assert svc.resolution == 0.01


def test_bad_message_skip_and_warn():
    logs = []
    svc = PointcloudConverterService(mode="compress", backend="host", log=logs.append)
    rfile = io.BytesIO(_HDR.pack(FRAME_DATA, 5) + b"junk!")
    wfile = io.BytesIO()
    assert serve_connection(svc, rfile, wfile) == 1
    _, size = _HDR.unpack_from(wfile.getvalue(), 0)
    assert size == 0 and any("failed" in m for m in logs)


def test_batch_window_matches_per_message(raw_msg):
    """convert_many (one device dispatch per schema group) must produce the
    SAME bytes as per-message convert, in order, and the framed server must
    flush batches on window-full / control / EOF boundaries."""
    per = PointcloudConverterService(mode="compress", resolution=0.001, backend="host")
    expected = [per.convert(raw_msg) for _ in range(3)]

    svc = PointcloudConverterService(mode="compress", resolution=0.001)
    got = svc.convert_many([raw_msg] * 3)
    assert got == expected
    assert svc.msg_count == 3

    # framed stream: 3 data frames + control + 1 data frame, window 8 -> the
    # control frame forces an early flush; EOF flushes the tail
    svc2 = PointcloudConverterService(mode="compress", resolution=0.001)
    buf = io.BytesIO()
    for _ in range(3):
        buf.write(_HDR.pack(FRAME_DATA, len(raw_msg)) + raw_msg)
    ctl = json.dumps({"cloudini_resolution": 0.05}).encode()
    buf.write(_HDR.pack(FRAME_CONTROL, len(ctl)) + ctl)
    buf.write(_HDR.pack(FRAME_DATA, len(raw_msg)) + raw_msg)
    buf.seek(0)
    out = io.BytesIO()
    served = serve_connection(svc2, buf, out, batch_window=8)
    assert served == 4
    out.seek(0)
    frames = []
    while True:
        hdr = out.read(_HDR.size)
        if not hdr:
            break
        ftype, size = _HDR.unpack(hdr)
        frames.append(out.read(size))
    assert frames[:3] == expected
    assert len(frames) == 4 and frames[3] != expected[0]  # coarser resolution applied

    # a malformed message inside a batch yields b"" without killing the window
    svc3 = PointcloudConverterService(mode="compress", resolution=0.001)
    got3 = svc3.convert_many([raw_msg, b"\x00\x01junk", raw_msg])
    assert got3[0] == expected[0] and got3[2] == expected[0]
    assert got3[1] == b""
