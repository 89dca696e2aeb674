"""mcap_codec_benchmark — per-topic codec benchmark on an MCAP bag (equivalent
of tools/src/mcap_codec_benchmark.cpp: V4/V5 x plain/viz modes, enc/dec MB/s,
ratio, and the FNV-1a decoded-output fingerprint correctness gate).

Usage:
  python -m cloudini_tpu.tools.codec_benchmark -f bag.mcap [--zstd] [--mode V5]
         [--hash] [--decode-repeat N] [--backend auto|host|device]
"""

from __future__ import annotations

import argparse
import time
from collections import defaultdict
from dataclasses import dataclass, field

import numpy as np

from ..codec.pipeline import PointcloudDecoder, PointcloudEncoder
from ..core.header import decode_header
from ..core.types import CompressionOption
from ..io import ros_definitions as defs
from ..io.mcap import McapReader
from ..io.ros_msgs import (
    apply_resolution_profile,
    get_deserialized_point_cloud_message,
    to_encoding_info,
)

FNV_OFFSET = np.uint64(14695981039346656037)
FNV_PRIME = np.uint64(1099511628211)


def fnv1a(data: bytes, state: np.uint64 = FNV_OFFSET) -> np.uint64:
    """FNV-1a over all bytes (the reference's --hash gate,
    mcap_codec_benchmark.cpp:537-560)."""
    h = np.uint64(state)
    arr = np.frombuffer(data, dtype=np.uint8)
    with np.errstate(over="ignore"):
        for b in arr.astype(np.uint64):
            h = (h ^ b) * FNV_PRIME
    return h


def fnv1a_fast(data: bytes) -> int:
    """Vectorized order-sensitive fingerprint (role of the reference's FNV-1a
    gate, but parallelizable; fnv1a() above is the byte-serial original)."""
    arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    with np.errstate(over="ignore"):
        k = np.arange(len(arr), dtype=np.uint64)
        weights = np.left_shift(np.uint64(1), (k * np.uint64(7)) % np.uint64(61))
        return int(((arr + np.uint64(0x9E3779B9)) * weights).sum(dtype=np.uint64))


def chain_fingerprint(state: int, msg_fp: int) -> int:
    """Order- and multiplicity-sensitive combine of per-message fingerprints
    (the reference chains FNV-1a state across messages; a plain XOR would
    cancel out repeated identical messages)."""
    with np.errstate(over="ignore"):
        return int((np.uint64(state) ^ np.uint64(msg_fp)) * FNV_PRIME)


@dataclass
class ModeStats:
    in_bytes: int = 0
    out_bytes: int = 0
    enc_s: float = 0.0
    dec_s: float = 0.0
    msgs: int = 0
    fingerprint: int = 0


def explain(info) -> str:
    """Per-field codec decisions (the reference's --explain,
    mcap_codec_benchmark.cpp)."""
    from ..core.plan import build_plan

    plan = build_plan(info)
    lines = []
    for u in plan.units:
        names = [f.name for f in info.fields if f.offset in u.offsets]
        lines.append(f"    {'+'.join(names) or u.offsets}: {u.kind.value}"
                     + (f" res={u.resolutions}" if any(r for r in u.resolutions) else ""))
    for a in plan.adaptive:
        lines.append(f"    {info.fields[a.field_index].name}: V5 adaptive int section")
    return "\n".join(lines)


def run(path: str, modes, compression: CompressionOption, resolution: float,
        do_hash: bool, decode_repeat: int, backend: str,
        device_stage2: bool = False, do_explain: bool = False):
    reader = McapReader(path)
    comp = compression
    stats = {m: defaultdict(ModeStats) for m in modes}
    encoders = {}
    explained = set()
    decoder = PointcloudDecoder(backend=backend)

    for ch, schema, msg in reader.messages():
        if schema is None or schema.name != defs.POINTCLOUD_SCHEMA_NAME:
            continue
        pc = get_deserialized_point_cloud_message(msg.data)
        for mode in modes:
            version = 4 if mode.startswith("V4") else 5
            viz = mode.endswith("viz")
            fields = apply_resolution_profile({}, pc.fields, default_resolution=resolution)
            rows = np.frombuffer(pc.data, np.uint8).reshape(-1, pc.point_step)
            if viz:
                # the preprocessing itself runs inside the encoder (fused on
                # device); only the static field adjustment happens here
                # (FLOAT64 without resolution -> 1e-6, ros_msg_utils.cpp:335)
                fields = [
                    f.__class__(f.name, f.offset, f.type, 1e-6)
                    if f.type.name == "FLOAT64" and f.resolution is None
                    else f
                    for f in fields
                ]
            info = to_encoding_info(pc).with_(
                fields=tuple(fields), width=rows.shape[0], height=1,
                version=version, compression_opt=comp,
            )
            key = (info.fields, info.point_step, version, comp, viz)
            if key not in encoders:
                encoders[key] = PointcloudEncoder(
                    info.with_(width=0), backend=backend, device_stage2=device_stage2,
                    viz=viz,
                )
                if do_explain and (ch.topic, mode) not in explained:
                    explained.add((ch.topic, mode))
                    print(f"  {ch.topic} [{mode}]:\n{explain(info)}")
            enc = encoders[key]

            st = stats[mode][ch.topic]
            t0 = time.perf_counter()
            payload = enc.encode_with_info(rows, info)
            st.enc_s += time.perf_counter() - t0
            st.in_bytes += rows.nbytes
            st.out_bytes += len(payload)
            st.msgs += 1

            t0 = time.perf_counter()
            for _ in range(max(1, decode_repeat)):
                dinfo, hlen = decode_header(payload)
                decoded = decoder.decode(dinfo, payload[hlen:])
            st.dec_s += (time.perf_counter() - t0) / max(1, decode_repeat)
            if do_hash:
                st.fingerprint = chain_fingerprint(st.fingerprint, fnv1a_fast(decoded.tobytes()))
    if do_explain:
        # RETRY-rate telemetry (VERDICT r4 item 9): chunks the device FSM
        # speculation escaped back to the host decode at host speed — a
        # nonzero rate on a real bag means the one-window-per-chunk premise
        # is being violated and the decode is silently running at host speed
        print(f"  device decode RETRY rate: {decoder.retry_chunks}/"
              f"{decoder.device_chunks} chunks escaped to host")
    return stats


def print_table(stats, do_hash: bool):
    cols = f"{'topic':30s} {'mode':8s} {'Out MiB':>9s} {'ratio %':>8s} {'Enc MB/s':>9s} {'Dec MB/s':>9s}"
    if do_hash:
        cols += f" {'fingerprint':>18s}"
    print(cols)
    for mode, topics in stats.items():
        for topic, st in sorted(topics.items()):
            if st.msgs == 0:
                continue
            line = (
                f"{topic:30s} {mode:8s} {st.out_bytes/2**20:9.2f} "
                f"{100.0*st.out_bytes/max(1,st.in_bytes):8.2f} "
                f"{st.in_bytes/max(1e-12,st.enc_s)/1e6:9.1f} "
                f"{st.in_bytes/max(1e-12,st.dec_s)/1e6:9.1f}"
            )
            if do_hash:
                line += f" {st.fingerprint:#18x}"
            print(line)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="mcap_codec_benchmark")
    p.add_argument("-f", "--filename", required=True)
    p.add_argument("--zstd", action="store_true", help="enable stage-2 ZSTD")
    p.add_argument("--lz4", action="store_true", help="enable stage-2 LZ4")
    p.add_argument("--device-stage2", action="store_true",
                   help="fuse the device stage-2 compressor (LZ4, or full "
                        "ZSTD frames with --zstd) into the encode program")
    p.add_argument("--mode", choices=["V4", "V5", "V4viz", "V5viz", "all"], default="all")
    p.add_argument("-r", "--resolution", type=float, default=0.001)
    p.add_argument("--hash", action="store_true", help="print decoded-output fingerprints")
    p.add_argument("--explain", action="store_true", help="print per-field codec decisions")
    p.add_argument("--decode-repeat", type=int, default=1)
    p.add_argument("--profile-sleep-ms", type=int, default=0,
                   help="sleep before the run so a profiler can attach "
                        "(mcap_codec_benchmark.cpp:561-566)")
    p.add_argument("--backend", choices=["auto", "host", "device"], default="auto")
    p.add_argument("--trace", metavar="DIR", default=None,
                   help="dump a jax.profiler trace of the run to DIR (the "
                        "framework's per-kernel attribution; the reference "
                        "only offers --profile-sleep-ms for perf attach)")
    args = p.parse_args(argv)

    if args.profile_sleep_ms:
        time.sleep(args.profile_sleep_ms / 1000.0)
    comp = CompressionOption.NONE
    if args.zstd:
        comp = CompressionOption.ZSTD
    elif args.lz4 or args.device_stage2:
        comp = CompressionOption.LZ4  # bare --device-stage2 implies LZ4
    modes = ["V4", "V5", "V4viz", "V5viz"] if args.mode == "all" else [args.mode]

    import contextlib

    tracer = contextlib.nullcontext()
    if args.trace:
        import jax

        tracer = jax.profiler.trace(args.trace)
    with tracer:
        stats = run(args.filename, modes, comp, args.resolution, args.hash,
                    args.decode_repeat, args.backend, device_stage2=args.device_stage2,
                    do_explain=args.explain)
    if args.trace:
        print(f"profiler trace written to {args.trace}")
    print_table(stats, args.hash)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
