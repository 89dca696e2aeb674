"""pcd_benchmark — encode/decode microbenchmarks on a PCD cloud, the
equivalent of the reference's Google-benchmark suite
(cloudini_lib/benchmarks/pcd_benchmark.cpp:53-278): lossy/lossless x
NONE/LZ4/ZSTD (+ fused device LZ4), wall time per op and the "Encoded ratio"
counter.

Usage:
  python -m cloudini_tpu.tools.pcd_benchmark [-f lidar.pcd] [-r 0.001]
         [--iters 5] [--backend auto|host|device]
"""

from __future__ import annotations

import argparse
import pathlib
import time

import numpy as np

from ..codec.pipeline import PointcloudDecoder, PointcloudEncoder
from ..core.types import CompressionOption, EncodingInfo, EncodingOptions
from ..io.pcd import read_pcd

DEFAULT_PCD = "/root/reference/cloudini_lib/samples/lidar.pcd"


def _configs(resolution: float):
    for lossy in (True, False):
        for comp in (CompressionOption.NONE, CompressionOption.LZ4, CompressionOption.ZSTD):
            yield lossy, comp, False
    yield True, CompressionOption.LZ4, True  # fused device stage 2


def run(path: str, resolution: float, iters: int, backend: str) -> None:
    from ..core.types import FieldType, PointField

    info, rows = read_pcd(path)
    base_fields = list(info.fields)
    n = rows.shape[0]
    print(f"{path}: {n} points, point_step {info.point_step}")
    hdr = f"{'config':34s} {'enc ms':>8s} {'dec ms':>8s} {'ratio %':>8s}"
    print(hdr)
    decoder = PointcloudDecoder(backend=backend)
    for lossy, comp, dev2 in _configs(resolution):
        res = resolution if lossy else None
        fields = tuple(
            PointField(f.name, f.offset, f.type, res if f.type == FieldType.FLOAT32 else None)
            for f in base_fields
        )
        cfg = EncodingInfo(
            fields=fields, width=n, height=1, point_step=info.point_step,
            encoding_opt=EncodingOptions.LOSSY if lossy else EncodingOptions.LOSSLESS,
            compression_opt=comp,
        )
        try:
            enc = PointcloudEncoder(cfg, backend=backend, device_stage2=dev2)
        except (NotImplementedError, ValueError) as e:
            print(f"{_label(lossy, comp, dev2):34s} skipped ({e})")
            continue
        # The remote-TPU runtime memoizes executions by (program, argument
        # contents): re-timing the SAME cloud measures a cache hit, not the
        # codec. Every timed iteration therefore encodes a content-unique
        # variant (low-order byte of the last field perturbed per iteration;
        # same schema, same shapes, same compiled program).
        variants = []
        last_off = max(f.offset for f in fields)
        for i in range(iters):
            v = rows.copy()
            v[:, last_off] ^= np.uint8((i * 37 + 1) & 0x7F)
            variants.append(v)
        stream = enc.encode(rows)  # warmup/compile
        t0 = time.perf_counter()
        for v in variants:
            enc.encode(v)
        enc_ms = (time.perf_counter() - t0) / iters * 1e3

        from ..core.header import decode_header

        dinfo, hlen = decode_header(stream)
        payloads = [enc.encode(v)[hlen:] for v in variants]  # untimed
        decoder.decode(dinfo, stream[hlen:])  # warmup/compile
        t0 = time.perf_counter()
        for p in payloads:
            decoder.decode(dinfo, p)
        dec_ms = (time.perf_counter() - t0) / iters * 1e3
        ratio = 100.0 * len(stream) / rows.nbytes
        print(f"{_label(lossy, comp, dev2):34s} {enc_ms:8.2f} {dec_ms:8.2f} {ratio:8.2f}")


def _label(lossy: bool, comp: CompressionOption, dev2: bool) -> str:
    s = f"{'lossy' if lossy else 'lossless'} + {comp.name}"
    if dev2:
        s += " (device stage2)"
    return s


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="pcd_benchmark")
    p.add_argument("-f", "--filename", default=DEFAULT_PCD)
    p.add_argument("-r", "--resolution", type=float, default=0.001)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--backend", choices=["auto", "host", "device"], default="auto")
    args = p.parse_args(argv)
    if not pathlib.Path(args.filename).exists():
        print(f"{args.filename} not found")
        return 1
    run(args.filename, args.resolution, args.iters, args.backend)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
