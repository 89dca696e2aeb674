"""ROS/DDS layer differential tests on the real 64000-point fixture
(dds_message.bin: x,y,z,intensity f32 + ring u16 + timestamp f64, point_step 26
— the padded/odd-stride case). Mirrors reference test_ros_msg.cpp."""

import subprocess

import numpy as np
import pytest

from cloudini_tpu.core.types import FieldType
from cloudini_tpu.io.ros_msgs import (
    apply_resolution_profile,
    convert_compressed_to_point_cloud2,
    convert_point_cloud2_to_compressed,
    get_deserialized_point_cloud_message,
    parse_profile_string,
    to_encoding_info,
)
from cloudini_tpu.preprocess import apply_viz_lossy_preprocessing


def _roundtrip_vs_oracle(oracle, dds_message_bin, viz: bool, tmp_path):
    comp_out = tmp_path / "comp.bin"
    dds_out = tmp_path / "dds.bin"
    subprocess.run(
        [
            oracle.binary, "dds-roundtrip", dds_message_bin,
            str(comp_out), str(dds_out), "0.001", "1" if viz else "0",
        ],
        check=True, capture_output=True,
    )
    golden_comp = comp_out.read_bytes()
    golden_dds = dds_out.read_bytes()

    raw = open(dds_message_bin, "rb").read()
    pc = get_deserialized_point_cloud_message(raw)
    pc.fields = apply_resolution_profile({}, pc.fields, default_resolution=0.001)
    if viz:
        rows = np.frombuffer(pc.data, np.uint8).reshape(-1, pc.point_step)
        pc.fields, new_rows = apply_viz_lossy_preprocessing(pc.fields, rows)
        pc.data = new_rows.tobytes()
        pc.width = new_rows.shape[0]
        pc.height = 1
        pc.row_step = pc.point_step * pc.width
    info = to_encoding_info(pc)
    mine_comp = convert_point_cloud2_to_compressed(pc, info)
    assert mine_comp == golden_comp, (
        f"compressed DDS message differs: {len(mine_comp)} vs {len(golden_comp)}"
    )

    cpc = get_deserialized_point_cloud_message(mine_comp)
    mine_dds = convert_compressed_to_point_cloud2(cpc)
    assert mine_dds == golden_dds
    return pc


def test_dds_parse_fixture(dds_message_bin):
    pc = get_deserialized_point_cloud_message(open(dds_message_bin, "rb").read())
    assert pc.width * pc.height == 64000
    assert pc.point_step == 26
    names = [f.name for f in pc.fields]
    assert names[:3] == ["x", "y", "z"]
    assert pc.fields[-1].type in (FieldType.FLOAT64,)
    assert len(pc.data) == 64000 * 26


def test_dds_compress_roundtrip_vs_oracle(oracle, dds_message_bin, tmp_path):
    _roundtrip_vs_oracle(oracle, dds_message_bin, viz=False, tmp_path=tmp_path)


def test_dds_compress_viz_vs_oracle(oracle, dds_message_bin, tmp_path):
    _roundtrip_vs_oracle(oracle, dds_message_bin, viz=True, tmp_path=tmp_path)


def test_dds_decoded_values_within_tolerance(dds_message_bin):
    raw = open(dds_message_bin, "rb").read()
    pc = get_deserialized_point_cloud_message(raw)
    pc.fields = apply_resolution_profile({}, pc.fields, default_resolution=0.001)
    info = to_encoding_info(pc)
    comp = convert_point_cloud2_to_compressed(pc, info)
    cpc = get_deserialized_point_cloud_message(comp)
    out_msg = convert_compressed_to_point_cloud2(cpc)
    out_pc = get_deserialized_point_cloud_message(out_msg)

    src = np.frombuffer(pc.data, np.uint8).reshape(-1, 26)
    dst = np.frombuffer(out_pc.data, np.uint8).reshape(-1, 26)
    for f in pc.fields:
        if f.type == FieldType.FLOAT32:
            a = np.ascontiguousarray(src[:, f.offset : f.offset + 4]).view(np.float32)
            b = np.ascontiguousarray(dst[:, f.offset : f.offset + 4]).view(np.float32)
            assert np.nanmax(np.abs(a - b)) <= f.resolution * 1.0001
        elif f.type == FieldType.UINT16:
            assert np.array_equal(src[:, f.offset : f.offset + 2], dst[:, f.offset : f.offset + 2])
        elif f.type == FieldType.FLOAT64:
            a = np.ascontiguousarray(src[:, f.offset : f.offset + 8]).view(np.float64)
            b = np.ascontiguousarray(dst[:, f.offset : f.offset + 8]).view(np.float64)
            assert np.array_equal(a, b)  # Gorilla path is lossless


def test_profile_string_parsing():
    p = parse_profile_string("xyz:0.001; intensity:0.1; timestamp:remove")
    assert p == {"x": 0.001, "y": 0.001, "z": 0.001, "intensity": 0.1, "timestamp": 0.0}


def test_profile_removes_fields():
    from cloudini_tpu.core.types import PointField

    fields = [
        PointField("x", 0, FieldType.FLOAT32),
        PointField("junk", 4, FieldType.FLOAT32),
    ]
    out = apply_resolution_profile({"junk": 0.0, "x": 0.01}, fields)
    assert [f.name for f in out] == ["x"]
    assert out[0].resolution == np.float32(0.01)


def test_wasm_equivalent_api_surface(dds_message_bin):
    """The 9 reference WASM exports (wasm_functions.cpp:25-248) map onto
    CloudiniDecoder/CloudiniEncoder; encode -> decode round-trips within the
    quantization tolerance."""
    from cloudini_tpu.io.decoder_api import CloudiniDecoder, CloudiniEncoder

    raw = open(dds_message_bin, "rb").read()
    enc = CloudiniEncoder(backend="host")
    dec = CloudiniDecoder(backend="host")

    stream = enc.encode_pointcloud_message(raw, resolution=0.001)
    assert enc.compute_compressed_size(raw, 0.001) == len(stream)
    assert "x" in dec.header_as_yaml(stream)

    info, cloud = dec.decode_data(stream)
    pc = get_deserialized_point_cloud_message(raw)
    src = np.frombuffer(pc.data, np.uint8).reshape(-1, pc.point_step)
    for name, off in (("x", 0), ("y", 4), ("z", 8)):
        want = src[:, off : off + 4].copy().view(np.float32).ravel()
        np.testing.assert_allclose(cloud[name], want, atol=0.001 * 0.50001)
    # lossless lanes survive exactly
    assert np.array_equal(cloud["ring"], src[:, 16:18].copy().view(np.uint16).ravel())

    # raw-data + YAML entry point produces the identical stream
    yaml = dec.header_as_yaml(stream)
    n = info.width * info.height
    stream2 = enc.encode_pointcloud_data(yaml, src[:n].tobytes())
    assert stream2 == stream

    # compressed DDS message -> PointCloud2 DDS message
    from cloudini_tpu.io.ros_msgs import RosPointCloud2, serialize_point_cloud2  # noqa: F401

    comp_msg = convert_point_cloud2_to_compressed(
        _with_profile(pc), to_encoding_info(_with_profile(pc))
    )
    pc2_msg = dec.convert_to_point_cloud2_msg(comp_msg)
    out = get_deserialized_point_cloud_message(pc2_msg)
    assert out.width * out.height == pc.width * pc.height


def _with_profile(pc):
    pc.fields = apply_resolution_profile({}, pc.fields, default_resolution=0.001)
    return pc
