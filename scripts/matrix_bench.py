#!/usr/bin/env python3
"""Head-to-head CPU benchmark: reference C++ (oracle_cli bench) vs this
framework's host backend, on the reference's own fixtures, across the main
codec configs. Every row also asserts byte-identical streams — the table
doubles as a conformance sweep.

The device headline (TPU, chunk-batched, honest chained timing) lives in
bench.py; this table isolates the host-runtime story: same machine, same
single core, same data, same wire bytes.

Usage: python scripts/matrix_bench.py [--iters 5]
"""

from __future__ import annotations

import argparse
import pathlib
import subprocess
import sys
import tempfile
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

ORACLE = REPO / "oracle" / "build" / "oracle_cli"
SAMPLES = pathlib.Path("/root/reference/cloudini_lib/samples")


def _spec(info) -> str:
    from cloudini_tpu.core.types import EncodingOptions

    lines = [
        f"width={info.width}", f"height={info.height}",
        f"point_step={info.point_step}", f"version={info.version}",
        f"encoding={'LOSSY' if info.encoding_opt == EncodingOptions.LOSSY else 'LOSSLESS'}",
        f"compression={info.compression_opt.name}",
    ]
    for f in info.fields:
        res = "" if f.resolution is None else f":{float(np.float32(f.resolution)):.6g}"
        lines.append(f"field={f.name}:{f.type.name}:{f.offset}{res}")
    return "\n".join(lines) + "\n"


def _reference(info, rows: np.ndarray, iters: int):
    with tempfile.TemporaryDirectory() as d:
        d = pathlib.Path(d)
        (d / "raw").write_bytes(rows.tobytes())
        (d / "spec").write_text(_spec(info))
        out = subprocess.run(
            [str(ORACLE), "bench", str(d / "spec"), str(d / "raw"), str(iters)],
            capture_output=True, text=True, timeout=600, check=True,
        ).stdout.split()
        enc_ns, dec_ns, nbytes, comp = map(int, out[:4])
        # golden stream for the byte-equality assert
        subprocess.run(
            [str(ORACLE), "encode", str(d / "spec"), str(d / "raw"), str(d / "enc")],
            capture_output=True, text=True, timeout=600, check=True,
        )
        golden = (d / "enc").read_bytes()
    return enc_ns, dec_ns, comp, golden


def _ours(info, rows: np.ndarray, iters: int, golden: bytes):
    from cloudini_tpu.codec.pipeline import PointcloudDecoder, PointcloudEncoder
    from cloudini_tpu.core.header import decode_header

    enc = PointcloudEncoder(info, backend="host")
    stream = enc.encode(rows)
    assert stream == golden, (
        f"wire mismatch vs reference: {len(stream)} vs {len(golden)} bytes"
    )
    t0 = time.perf_counter()
    for _ in range(iters):
        stream = enc.encode(rows)
    enc_ns = (time.perf_counter() - t0) / iters * 1e9

    dinfo, hlen = decode_header(stream)
    dec = PointcloudDecoder(backend="host")
    payload = stream[hlen:]
    dec.decode(dinfo, payload)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = dec.decode(dinfo, payload)
    dec_ns = (time.perf_counter() - t0) / iters * 1e9
    return enc_ns, dec_ns, len(stream)


def configs():
    from cloudini_tpu.core.types import (
        CompressionOption,
        EncodingInfo,
        EncodingOptions,
        FieldType,
        PointField,
    )
    from cloudini_tpu.io.pcd import read_pcd
    from cloudini_tpu.io.ros_msgs import (
        apply_resolution_profile,
        get_deserialized_point_cloud_message,
    )

    _, rows = read_pcd(str(SAMPLES / "lidar.pcd"))
    xyzi = tuple(
        PointField(n, 4 * i, FieldType.FLOAT32, 0.001) for i, n in enumerate("xyzi")
    )
    for comp in (CompressionOption.NONE, CompressionOption.LZ4, CompressionOption.ZSTD):
        info = EncodingInfo(
            fields=xyzi, width=rows.shape[0], height=1, point_step=16,
            encoding_opt=EncodingOptions.LOSSY, compression_opt=comp,
        )
        yield f"lidar XYZI lossy+{comp.name}", info, rows

    lossless = tuple(
        PointField(n, 4 * i, FieldType.FLOAT32, None) for i, n in enumerate("xyzi")
    )
    info = EncodingInfo(
        fields=lossless, width=rows.shape[0], height=1, point_step=16,
        encoding_opt=EncodingOptions.LOSSLESS, compression_opt=CompressionOption.ZSTD,
    )
    yield "lidar XYZI lossless+ZSTD", info, rows

    raw = (SAMPLES / "dds_message.bin").read_bytes()
    pc = get_deserialized_point_cloud_message(raw)
    fields = apply_resolution_profile({}, pc.fields, default_resolution=0.001)
    drows = np.frombuffer(pc.data, np.uint8).reshape(-1, pc.point_step)
    for comp in (CompressionOption.NONE, CompressionOption.ZSTD):
        info = EncodingInfo(
            fields=tuple(fields), width=drows.shape[0], height=1,
            point_step=pc.point_step,
            encoding_opt=EncodingOptions.LOSSY, compression_opt=comp,
        )
        yield f"dds mixed(f32/u16/f64) lossy+{comp.name}", info, drows


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=5)
    args = p.parse_args(argv)
    if not ORACLE.exists():
        print("oracle_cli not built (cd oracle && cmake -B build -G Ninja . && ninja -C build)")
        return 1
    print(f"{'config':36s} {'ref enc':>8s} {'ref dec':>8s} {'our enc':>8s} {'our dec':>8s}   (MB/s, host 1 core; bytes asserted equal)")
    for name, info, rows in configs():
        r_enc, r_dec, r_comp, golden = _reference(info, rows, args.iters)
        o_enc, o_dec, o_comp = _ours(info, rows, args.iters, golden)
        mb = rows.nbytes / 1e6
        print(
            f"{name:36s} {mb / (r_enc / 1e9):8.0f} {mb / (r_dec / 1e9):8.0f} "
            f"{mb / (o_enc / 1e9):8.0f} {mb / (o_dec / 1e9):8.0f}   ratio {rows.nbytes / o_comp:.2f}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
