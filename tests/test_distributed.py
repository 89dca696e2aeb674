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


_WORKER = r"""
import os, sys
sys.path.insert(0, os.environ["CLOUDINI_REPO"])
import jax
jax.config.update("jax_platforms", "cpu")  # axon plugin ignores env JAX_PLATFORMS

src, parts, out = sys.argv[1], sys.argv[2], sys.argv[3]
pid = int(os.environ["CLOUDINI_PROCESS_ID"])

from cloudini_tpu.parallel.distributed import (
    HostShardedConverter, global_mesh, initialize, process_info,
)

initialize()  # coordinator/num_processes/process_id from CLOUDINI_* env
assert process_info() == (pid, 2), process_info()

# the global mesh spans both processes' devices; prove cross-process
# collectives actually run by allgathering each process's id
from jax.experimental import multihost_utils

mesh = global_mesh()
assert mesh.devices.size == jax.device_count() and jax.device_count() == 2 * jax.local_device_count()
import numpy as np
gathered = multihost_utils.process_allgather(np.array([pid], np.int32))
assert sorted(gathered.ravel().tolist()) == [0, 1], gathered

conv = HostShardedConverter(src, parts)  # pid/count via process_info fallback
n = conv.encode_stripe()
multihost_utils.sync_global_devices("cloudini-stripes-done")
if pid == 0:
    written = conv.merge(out)
    print(f"MERGED {written}", flush=True)
print(f"WORKER_OK {pid} {n}", flush=True)
"""


def test_multiprocess_jax_distributed(tmp_path):
    """REAL multi-process jax.distributed (SURVEY §4 closing requirement):
    two OS processes join a coordinator on CPU, build the global mesh, run a
    cross-process collective, encode their stripes through process_info()
    (no explicit pid), barrier, and host 0 merges — output byte-identical to
    the single-host converter."""
    import os
    import pathlib
    import socket
    import subprocess
    import sys

    src = tmp_path / "src.mcap"
    msgs = _make_bag(src)
    parts, out = tmp_path / "parts", tmp_path / "merged.mcap"
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env_base = {k: v for k, v in os.environ.items() if not k.startswith("CLOUDINI_")}
    env_base.pop("XLA_FLAGS", None)  # workers use 1 local CPU device each
    procs = []
    for pid in range(2):
        env = dict(
            env_base,
            CLOUDINI_COORDINATOR=f"127.0.0.1:{port}",
            CLOUDINI_NUM_PROCESSES="2",
            CLOUDINI_PROCESS_ID=str(pid),
            CLOUDINI_REPO=str(pathlib.Path(__file__).resolve().parent.parent),
        )
        procs.append(subprocess.Popen(
            [sys.executable, str(worker), str(src), str(parts), str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    outs = []
    try:
        for p in procs:
            o, e = p.communicate(timeout=240)
            outs.append((p.returncode, o, e))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("jax.distributed workers timed out")
    for rc, o, e in outs:
        if rc != 0 and ("Failed to connect" in e or "bind" in e.lower()):
            pytest.skip(f"coordinator port unavailable: {e.strip()[-200:]}")
        assert rc == 0, f"worker failed:\n{e[-2000:]}"
    assert "MERGED 9" in outs[0][1]
    assert sum(int(o.split("WORKER_OK")[1].split()[1]) for _, o, _ in outs) == len(msgs)

    # byte-identical to the single-host converter
    from cloudini_tpu.tools.mcap_converter import McapConverter

    ref_out = tmp_path / "single.mcap"
    single = McapConverter()
    single.open(str(src))
    single.encode_point_clouds(str(ref_out), default_resolution=0.001)
    got = [m.data for _, s, m in McapReader(str(out)).messages()]
    want = [m.data for _, s, m in McapReader(str(ref_out)).messages()]
    assert got == want

    # resume: re-running a completed stripe (e.g. after a host restart) must
    # skip the work — the part manifest is untouched
    manifest = parts / "part-0000.jsonl"
    mtime = manifest.stat().st_mtime_ns
    n_again = HostShardedConverter(
        str(src), str(parts), process_id=0, num_processes=2
    ).encode_stripe()
    assert manifest.stat().st_mtime_ns == mtime
    assert n_again == sum(1 for _ in open(manifest))
