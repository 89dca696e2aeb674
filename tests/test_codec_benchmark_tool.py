"""End-to-end run of the mcap codec benchmark tool (the reference's
mcap_codec_benchmark) over a synthetic bag, all four modes, both backends."""

import numpy as np
import pytest

from cloudini_tpu.core.types import CompressionOption, FieldType, PointField
from cloudini_tpu.io import ros_definitions as defs
from cloudini_tpu.io.mcap import McapWriter
from cloudini_tpu.io.ros_msgs import RosPointCloud2, serialize_point_cloud2
from cloudini_tpu.tools.codec_benchmark import run


def _make_cloud_msg(n, seed):
    """XYZI + a FLOAT64 timestamp so viz's f64->1e-6 rule is exercised, plus
    duplicate/NaN points so viz actually drops something."""
    rng = np.random.default_rng(seed)
    pts = (rng.integers(-40, 40, (n, 3)) * 0.005).astype(np.float32)
    pts += rng.uniform(-0.001, 0.001, (n, 3)).astype(np.float32)
    pts[rng.random(n) < 0.05] = np.nan
    inten = rng.uniform(0, 100, (n, 1)).astype(np.float32)
    ts = (1.7e9 + np.arange(n) * 1e-4).astype(np.float64)
    rows = np.zeros((n, 24), np.uint8)
    rows[:, :12] = pts.view(np.uint8).reshape(n, 12)
    rows[:, 12:16] = inten.view(np.uint8).reshape(n, 4)
    rows[:, 16:24] = ts.view(np.uint8).reshape(n, 8)
    pc = RosPointCloud2()
    pc.ros_header.frame_id = "lidar"
    pc.width, pc.height = n, 1
    pc.fields = [
        PointField("x", 0, FieldType.FLOAT32),
        PointField("y", 4, FieldType.FLOAT32),
        PointField("z", 8, FieldType.FLOAT32),
        PointField("intensity", 12, FieldType.FLOAT32),
        PointField("t", 16, FieldType.FLOAT64),
    ]
    pc.point_step = 24
    pc.row_step = 24 * n
    pc.data = rows.tobytes()
    return serialize_point_cloud2(pc)


@pytest.fixture(scope="module")
def bag(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("bench") / "bag.mcap")
    w = McapWriter(path, profile="ros2", compression="", chunk_size=1 << 16)
    sid = w.add_schema(defs.POINTCLOUD_SCHEMA_NAME, "ros2msg", defs.POINTCLOUD_SCHEMA_DATA.encode())
    cid = w.add_channel("/points", "cdr", sid)
    for i in range(3):
        w.write_message(cid, log_time=i, data=_make_cloud_msg(700 + 13 * i, i), sequence=i)
    w.close()
    return path


@pytest.mark.parametrize("comp", [CompressionOption.NONE, CompressionOption.ZSTD])
def test_all_modes_run_and_agree_across_backends(bag, comp):
    fps = {}
    for backend in ("host", "auto"):
        stats = run(bag, ["V4", "V5", "V4viz", "V5viz"], comp, 0.001,
                    do_hash=True, decode_repeat=1, backend=backend)
        for mode, topics in stats.items():
            st = topics["/points"]
            assert st.msgs == 3, (backend, mode)
            assert st.out_bytes > 0
            assert st.in_bytes == sum((700 + 13 * i) * 24 for i in range(3))
            # viz drops NaN/duplicate points -> strictly smaller output
            key = (mode, "fp")
            if key in fps:
                assert fps[key] == st.fingerprint, f"backend mismatch in {mode}"
            fps[key] = st.fingerprint
    assert fps[("V4viz", "fp")] != fps[("V4", "fp")]  # viz changed the data


def test_viz_reduces_output(bag):
    stats = run(bag, ["V4", "V4viz"], CompressionOption.NONE, 0.001,
                do_hash=False, decode_repeat=1, backend="host")
    plain = stats["V4"]["/points"].out_bytes
    viz = stats["V4viz"]["/points"].out_bytes
    assert viz < plain
