"""Streaming point-cloud topic converter — the framework's equivalent of the
reference's ROS 2 composable node + point_cloud_transport plugins
(cloudini_ros/src/topic_converter.cpp:36-199, cloudini_publisher_plugin.cpp).

The rclcpp runtime is host-ecosystem shell, not codec capability (SURVEY §7);
the capability itself — a long-lived service that converts a stream of raw
serialized DDS PointCloud2 messages to CompressedPointCloud2 (or back),
zero-copy on the DDS payload, with a dynamically adjustable resolution
parameter and periodic ratio logging — is this module:

  * ``PointcloudConverterService``: stateful converter with a per-schema
    encoder cache (mixed-topic dispatch; the reference rebuilds its encoder
    when the schema changes, topic_converter.cpp:166-168) and the dynamic
    ``cloudini_resolution`` parameter (cloudini_publisher_plugin.cpp:27-51)
  * a framed-socket server CLI (u8 frame type + u32 LE size + payload):
    type 0 = data frame (raw DDS message in, converted DDS message out),
    type 1 = control frame (JSON, e.g. {"cloudini_resolution": 0.01}) —
    the transport-agnostic stand-in for a ROS parameter service
"""

from __future__ import annotations

import json
import socket
import struct
import sys
import threading
import time
from typing import Dict, Optional

from ..codec.pipeline import PointcloudDecoder
from ..core.types import CompressionOption
from ..io.ros_msgs import (
    apply_resolution_profile,
    convert_compressed_to_point_cloud2,
    convert_point_cloud2_to_compressed,
    get_deserialized_point_cloud_message,
    parse_profile_string,
    to_encoding_info,
)

LOG_EVERY = 20  # messages between ratio logs (topic_converter.cpp:186-196)


class PointcloudConverterService:
    """Compress or decompress a stream of serialized DDS messages."""

    def __init__(
        self,
        mode: str = "compress",
        resolution: float = 0.001,
        profile: Optional[str] = None,
        compression: CompressionOption = CompressionOption.ZSTD,
        backend: str = "auto",
        device_stage2: bool = False,
        log=lambda msg: print(msg, file=sys.stderr),
    ):
        if mode not in ("compress", "decompress"):
            raise ValueError(f"unknown mode {mode!r}")
        self.mode = mode
        self._resolution = float(resolution)
        self._profile = parse_profile_string(profile) if profile else None
        self.compression = compression
        self.backend = backend
        self.device_stage2 = device_stage2
        self._log = log
        self._lock = threading.Lock()
        self._decoder = PointcloudDecoder(backend=backend)
        self._batch_encoders: Dict = {}
        self.msg_count = 0
        self.bytes_in = 0
        self.bytes_out = 0

    # -- dynamic parameter (the `cloudini_resolution` ROS param equivalent) --
    @property
    def resolution(self) -> float:
        return self._resolution

    @resolution.setter
    def resolution(self, value: float) -> None:
        with self._lock:
            self._resolution = float(value)

    def set_param(self, name: str, value) -> None:
        if name == "cloudini_resolution":
            self.resolution = float(value)
        elif name == "profile":
            with self._lock:
                self._profile = parse_profile_string(str(value)) if value else None
        else:
            raise KeyError(f"unknown parameter {name!r}")

    # ------------------------------------------------------------- convert
    def convert(self, raw_msg: bytes) -> bytes:
        out = self._compress(raw_msg) if self.mode == "compress" else self._decompress(raw_msg)
        self.msg_count += 1
        self.bytes_in += len(raw_msg)
        self.bytes_out += len(out)
        if self.msg_count % LOG_EVERY == 0:
            ratio = 100.0 * self.bytes_out / max(1, self.bytes_in)
            self._log(
                f"[cloudini_tpu] {self.msg_count} msgs, "
                f"{self.bytes_in} -> {self.bytes_out} B ({ratio:.1f}%)"
            )
        return out

    def _compress(self, raw_msg: bytes) -> bytes:
        pc = get_deserialized_point_cloud_message(raw_msg)
        with self._lock:
            profile, default_res = dict(self._profile or {}), self._resolution
        pc.fields = apply_resolution_profile(profile, pc.fields, default_res)
        info = to_encoding_info(pc).with_(compression_opt=self.compression)
        # per-message PointcloudEncoder objects are cheap: the compiled device
        # program is shared through the value-keyed cache in ops/device_codec
        return convert_point_cloud2_to_compressed(pc, info)

    def _decompress(self, raw_msg: bytes) -> bytes:
        pc = get_deserialized_point_cloud_message(raw_msg)
        return convert_compressed_to_point_cloud2(pc, decoder=self._decoder)

    # ------------------------------------------------------------- batched
    def convert_many(self, raw_msgs) -> list:
        """Convert a WINDOW of messages with one device dispatch per schema
        group (PointcloudEncoder.encode_many). Per-message streaming encode
        pays the full H2D+dispatch+D2H round trip per call and therefore
        routes to the host codec under ``auto``; batching a window is what
        puts the live-stream path on the TPU. Outputs keep input order; a
        message that fails to parse yields b\"\" (skip-and-warn), matching
        the per-message path."""
        if self.mode != "compress" or len(raw_msgs) <= 1:
            out = []
            for m in raw_msgs:
                try:
                    out.append(self.convert(m))
                except Exception as exc:
                    self._log(f"[cloudini_tpu] conversion failed: {exc}")
                    out.append(b"")
            return out
        from ..codec.pipeline import PointcloudEncoder

        import numpy as np

        with self._lock:
            profile, default_res = dict(self._profile or {}), self._resolution
        parsed: list = []
        for m in raw_msgs:
            try:
                pc = get_deserialized_point_cloud_message(m)
                pc.fields = apply_resolution_profile(profile, pc.fields, default_res)
                info = to_encoding_info(pc).with_(compression_opt=self.compression)
                parsed.append((pc, info))
            except Exception as exc:
                self._log(f"[cloudini_tpu] conversion failed: {exc}")
                parsed.append(None)
        groups: Dict = {}
        for i, item in enumerate(parsed):
            if item is not None:
                groups.setdefault(item[1].with_(width=0, height=1), []).append(i)
        out = [b""] * len(raw_msgs)
        for key, idxs in groups.items():
            enc = self._batch_encoders.get(key)
            if enc is None:
                enc = self._batch_encoders[key] = PointcloudEncoder(
                    key, backend=self.backend, device_stage2=self.device_stage2)
            clouds, infos = [], []
            for i in idxs:
                pc, info = parsed[i]
                n = len(pc.data) // info.point_step if info.point_step else 0
                clouds.append(np.frombuffer(pc.data, np.uint8)[: n * info.point_step])
                infos.append(info.with_(width=n, height=1))
            try:
                streams = enc.encode_many(clouds, infos)
            except Exception as exc:
                self._log(f"[cloudini_tpu] batched encode failed: {exc}")
                continue
            for i, stream in zip(idxs, streams):
                pc, info = parsed[i]
                out[i] = convert_point_cloud2_to_compressed(pc, info, payload=stream)
        for m, o in zip(raw_msgs, out):
            self.msg_count += 1
            self.bytes_in += len(m)
            self.bytes_out += len(o)
        if self.msg_count % LOG_EVERY < len(raw_msgs):
            ratio = 100.0 * self.bytes_out / max(1, self.bytes_in)
            self._log(
                f"[cloudini_tpu] {self.msg_count} msgs, "
                f"{self.bytes_in} -> {self.bytes_out} B ({ratio:.1f}%)"
            )
        return out


# ------------------------------------------------------------------ framing

_FRAME_HDR = struct.Struct("<BI")
FRAME_DATA = 0
FRAME_CONTROL = 1


def _read_exact(sock_file, n: int, allow_timeout_at_start: bool = False) -> bytes:
    """Read exactly n bytes. With ``allow_timeout_at_start``, a socket timeout
    BEFORE any byte arrives returns None (frame boundary — safe to flush a
    pending batch); a timeout mid-frame keeps reading (framing stays intact)."""
    buf = b""
    while len(buf) < n:
        try:
            part = sock_file.read(n - len(buf))
        except (TimeoutError, socket.timeout):
            if allow_timeout_at_start and not buf:
                return None
            continue
        if not part:
            raise EOFError
        buf += part
    return buf


def serve_connection(service: PointcloudConverterService, rfile, wfile,
                     batch_window: int = 0) -> int:
    """Drain frames until EOF; returns the number of data frames served.

    ``batch_window`` > 0 buffers up to that many data frames and converts the
    window with ONE device dispatch per schema group (convert_many); replies
    are written in order at each flush. Flush triggers: window full, any
    control frame, read timeout at a frame boundary, EOF."""
    served = 0
    pending: list = []

    def flush():
        nonlocal served
        if not pending:
            return
        for out in service.convert_many(pending):
            wfile.write(_FRAME_HDR.pack(FRAME_DATA, len(out)) + out)
            served += 1
        wfile.flush()
        pending.clear()

    while True:
        try:
            hdr = _read_exact(rfile, _FRAME_HDR.size, allow_timeout_at_start=True)
        except EOFError:
            flush()
            return served
        if hdr is None:  # idle timeout at a frame boundary
            flush()
            continue
        ftype, size = _FRAME_HDR.unpack(hdr)
        payload = _read_exact(rfile, size)
        if ftype == FRAME_CONTROL:
            flush()  # parameters must not apply retroactively to queued frames
            params = json.loads(payload.decode())
            for k, v in params.items():
                service.set_param(k, v)
            continue
        if batch_window > 0:
            pending.append(payload)
            if len(pending) >= batch_window:
                flush()
            continue
        try:
            out = service.convert(payload)
        except Exception as exc:  # skip-and-warn like the reference tools
            service._log(f"[cloudini_tpu] conversion failed: {exc}")
            out = b""
        wfile.write(_FRAME_HDR.pack(FRAME_DATA, len(out)) + out)
        wfile.flush()
        served += 1


def main(argv=None) -> int:
    import argparse

    ap = argparse.ArgumentParser(description="Streaming PointCloud2 codec service")
    ap.add_argument("-d", "--decompress", action="store_true")
    ap.add_argument("-r", "--resolution", type=float, default=0.001)
    ap.add_argument("--profile", default=None, help='e.g. "xyz:0.001; timestamp:remove"')
    ap.add_argument("--lz4", action="store_true", help="LZ4 stage 2 (default ZSTD)")
    ap.add_argument("--listen", default=None, metavar="HOST:PORT",
                    help="serve a TCP socket instead of stdin/stdout")
    ap.add_argument("--backend", default="auto", choices=["auto", "host", "device"])
    ap.add_argument("--batch-window", type=int, default=0, metavar="N",
                    help="buffer up to N messages and encode the window in one "
                         "device dispatch per schema (replies are batched; "
                         "trades per-message latency for TPU throughput)")
    ap.add_argument("--device-stage2", action="store_true",
                    help="fuse stage-2 (LZ4/ZSTD) into the device encode "
                         "program for batched windows")
    ap.add_argument("--batch-timeout-ms", type=int, default=50, metavar="MS",
                    help="flush a partial batch after this idle time "
                         "(TCP mode only)")
    args = ap.parse_args(argv)

    service = PointcloudConverterService(
        mode="decompress" if args.decompress else "compress",
        resolution=args.resolution,
        profile=args.profile,
        compression=CompressionOption.LZ4 if args.lz4 else CompressionOption.ZSTD,
        backend=args.backend,
        device_stage2=args.device_stage2,
    )
    if args.listen:
        host, port = args.listen.rsplit(":", 1)
        srv = socket.create_server((host, int(port)))
        print(f"[cloudini_tpu] listening on {host}:{port}", file=sys.stderr)
        while True:
            conn, addr = srv.accept()
            with conn:
                if args.batch_window > 0 and args.batch_timeout_ms > 0:
                    conn.settimeout(args.batch_timeout_ms / 1e3)
                rfile = conn.makefile("rb")
                wfile = conn.makefile("wb")
                n = serve_connection(service, rfile, wfile, args.batch_window)
                print(f"[cloudini_tpu] {addr}: served {n} frames", file=sys.stderr)
    else:
        serve_connection(service, sys.stdin.buffer, sys.stdout.buffer, args.batch_window)
    return 0


if __name__ == "__main__":
    sys.exit(main())
