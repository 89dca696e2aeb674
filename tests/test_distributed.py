"""Multi-host striped bag conversion (simulated: N logical processes in one
OS process), incl. the part-manifest resume path."""

import numpy as np
import pytest

from cloudini_tpu.core.types import FieldType, PointField
from cloudini_tpu.io import ros_definitions as defs
from cloudini_tpu.io.mcap import McapReader, McapWriter
from cloudini_tpu.io.ros_msgs import (
    RosPointCloud2,
    serialize_point_cloud2,
)
from cloudini_tpu.parallel.distributed import HostShardedConverter


def _make_bag(path, n_msgs=9):
    rng = np.random.default_rng(0)
    w = McapWriter(str(path), profile="ros2", compression="zstd")
    cid = w.add_channel(
        "/points", "cdr",
        w.add_schema(defs.POINTCLOUD_SCHEMA_NAME, "ros2msg", defs.POINTCLOUD_SCHEMA_DATA.encode()),
    )
    msgs = []
    for i in range(n_msgs):
        n = 500 + 37 * i
        pts = np.cumsum(rng.normal(0, 0.05, (n, 4)), axis=0).astype(np.float32)
        pc = RosPointCloud2()
        pc.width, pc.height, pc.point_step = n, 1, 16
        pc.fields = [
            PointField("x", 0, FieldType.FLOAT32),
            PointField("y", 4, FieldType.FLOAT32),
            PointField("z", 8, FieldType.FLOAT32),
            PointField("intensity", 12, FieldType.FLOAT32),
        ]
        pc.data = np.ascontiguousarray(pts).tobytes()
        m = serialize_point_cloud2(pc)
        msgs.append(m)
        w.write_message(cid, log_time=100 + i, data=m, sequence=i)
    w.close()
    return msgs


def test_striped_multi_host_conversion_matches_single(tmp_path):
    src = tmp_path / "src.mcap"
    msgs = _make_bag(src)

    # simulate a 3-host job: three striped encoders into one part directory
    parts = tmp_path / "parts"
    total = 0
    for pid in range(3):
        conv = HostShardedConverter(str(src), str(parts), process_id=pid, num_processes=3)
        total += conv.encode_stripe()
    assert total == len(msgs)

    merged = tmp_path / "merged.mcap"
    conv0 = HostShardedConverter(str(src), str(parts), process_id=0, num_processes=3)
    written = conv0.merge(str(merged))
    assert written == len(msgs)

    # single-host baseline must produce identical compressed payloads in order
    from cloudini_tpu.tools.mcap_converter import McapConverter

    ref_out = tmp_path / "single.mcap"
    single = McapConverter()
    single.open(str(src))
    single.encode_point_clouds(str(ref_out), default_resolution=0.001)

    got = [m.data for _, s, m in McapReader(str(merged)).messages()]
    want = [m.data for _, s, m in McapReader(str(ref_out)).messages()]
    assert got == want


def test_stripe_resume_skips_completed(tmp_path):
    src = tmp_path / "src.mcap"
    _make_bag(src, n_msgs=4)
    parts = tmp_path / "parts"
    conv = HostShardedConverter(str(src), str(parts), process_id=0, num_processes=1)
    n1 = conv.encode_stripe()
    manifest = (parts / "part-0000.jsonl")
    mtime = manifest.stat().st_mtime_ns
    n2 = conv.encode_stripe()  # resume: must not re-encode
    assert n1 == n2 == 4
    assert manifest.stat().st_mtime_ns == mtime
