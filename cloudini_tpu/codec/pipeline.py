"""Public encoder/decoder — the framework's equivalent of PointcloudEncoder /
PointcloudDecoder (reference: cloudini.hpp:154-244).

Backends:
  * ``device`` (JAX/TPU): chunk-batched columnar stage-1 — all chunks of a
    cloud encode in ONE device dispatch; V5 adaptive sections and stage-2
    LZ4/ZSTD run host-side overlapped with device compute (the reference's
    worker-thread double-buffering, cloudini.cpp:453-499, becomes XLA async
    dispatch + host stage-2)
  * ``host`` (numpy): the wire kernel of truth; every plan also encodes on
    device (Gorilla via ops/gorilla.py, FLOAT64 lossy via software IEEE
    binary64 in ops/f64.py); mixed fixed-size/Gorilla streams still decode
    host-side (token lengths depend on sequential window state)
  * ``auto`` (default): device when available and the plan is device-exact

Both backends produce byte-identical streams (locked by tests/test_golden.py
against the reference C++).
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..core.header import decode_header, encode_header
from ..core.plan import CodecPlan, build_plan
from ..core.types import (
    ADAPTIVE_MODE_PROBE_POINTS,
    MAGIC_HEADER,
    POINTS_PER_CHUNK,
    CompressionOption,
    EncodingInfo,
)
from ..ref import stage1 as np_stage1
from ..ref import v5 as np_v5
from . import stage2


def _as_point_rows(cloud_data, point_step: int) -> np.ndarray:
    buf = np.frombuffer(cloud_data, dtype=np.uint8) if not isinstance(cloud_data, np.ndarray) else cloud_data
    buf = buf.reshape(-1) if buf.ndim != 1 else buf
    if point_step == 0:
        raise ValueError("point_step cannot be 0")
    if buf.size % point_step != 0:
        raise ValueError("Input cloud_data size is not a multiple of point_step")
    return buf.reshape(-1, point_step)


def _device_available() -> bool:
    try:
        import jax

        return len(jax.devices()) > 0
    except Exception:
        return False


def _bucket(c: int) -> int:
    """Round the chunk count up to a power of two to bound recompiles."""
    return 1 << (c - 1).bit_length() if c > 1 else 1


def _quarter_octave(n: int) -> int:
    """Round up to the next quarter-octave boundary (a multiple of 2^(b-3)
    for b = bit_length, i.e. 4 buckets per power of two), then to 1 KiB
    alignment (device buffers whose minor dim is not a 128-multiple fall off
    the fast DMA path)."""
    n = max(n, 1024)
    step = 1 << max(n.bit_length() - 3, 0)
    return -(-(-(-n // step) * step) // 1024) * 1024


# auto-backend threshold: a host-resident encode call pays H2D + dispatch +
# D2H per call, so per-message streaming (a handful of chunks) runs faster on
# the native host codec; the device wins once a call carries enough chunks to
# amortize the round trip. Large batched workloads (bench.py, encode_many)
# clear this easily; a single 115k-pt LiDAR message (4 chunks) does not.
AUTO_DEVICE_MIN_CHUNKS = 16


def _pad_chunks(points: np.ndarray, n_chunks: int, chunk_points: int, point_step: int):
    """Split rows into a zero-padded (bucketed) chunk batch + per-chunk counts."""
    c_pad = _bucket(n_chunks)
    chunks = np.zeros((c_pad, chunk_points, point_step), dtype=np.uint8)
    n_valid = np.zeros(c_pad, dtype=np.int32)
    for i in range(n_chunks):
        part = points[i * chunk_points : (i + 1) * chunk_points]
        chunks[i, : len(part)] = part
        n_valid[i] = len(part)
    return chunks, n_valid


def max_serialized_point_size(info: EncodingInfo) -> int:
    """Worst-case stage-1 bytes per point over ALL fields (reference:
    MaxSerializedFieldSize/MaxSerializedPointSize, codec_common.cpp:29-67)."""
    return sum(_max_serialized_field_size(f, info.encoding_opt) for f in info.fields)


def _max_serialized_field_size(field, encoding_opt) -> int:
    from ..core.types import EncodingOptions, FieldType

    t = field.type
    if t in (FieldType.INT16, FieldType.UINT16, FieldType.INT32,
             FieldType.UINT32, FieldType.INT64, FieldType.UINT64):
        return 10
    if t == FieldType.FLOAT32:
        if encoding_opt == EncodingOptions.LOSSY and field.resolution is not None:
            return 10
        return 7  # Gorilla/XOR worst case + alignment slop
    if t == FieldType.FLOAT64:
        if encoding_opt == EncodingOptions.LOSSY and field.resolution is not None:
            return 10
        return 11
    if t in (FieldType.INT8, FieldType.UINT8):
        return 1
    raise ValueError(f"Unsupported field type {t} in max_serialized_point_size")


def max_compressed_size(info: EncodingInfo, points_count: int,
                        include_header: bool = True) -> int:
    """Worst-case serialized stream size — the preallocation bound
    (reference: MaxCompressedSize, cloudini.cpp:249-292; byte-identical
    math including the V5 adaptive-section slack)."""
    from ..core.types import uses_v5_codec
    from . import stage2 as _s2

    if info.point_step == 0:
        raise ValueError("point_step cannot be 0")
    chunks = -(-points_count // POINTS_PER_CHUNK) if points_count else 0
    per_point = max_serialized_point_size(info)
    total = len(encode_header(info)) if include_header else 0
    left = points_count
    for _ in range(chunks):
        pts = min(left, POINTS_PER_CHUNK)
        left -= pts
        chunk_in = pts * per_point
        if uses_v5_codec(info):
            chunk_in += len(info.fields) * 32 + 1024
        total += 4
        if info.compression_opt == CompressionOption.LZ4:
            total += _s2.lz4_compress_bound(chunk_in)
        elif info.compression_opt == CompressionOption.ZSTD:
            total += _s2.zstd_compress_bound(chunk_in)
        else:
            total += chunk_in
    return total


class PointcloudEncoder:
    """Two-stage encoder. Stage 1: columnar predictive coding per 32Ki-point
    chunk (device or host). Stage 2: LZ4/ZSTD per chunk with u32 framing."""

    def __init__(self, info: EncodingInfo, backend: str = "auto",
                 chunk_points: int = POINTS_PER_CHUNK, device_stage2: bool = False,
                 viz: bool = False):
        """``device_stage2=True`` (LZ4 or ZSTD) fuses stage-2 into the device
        program (ops/lz4.py / ops/zstd.py): the stage-1 payload never leaves
        the device and the host only writes u32 chunk frames. The stream
        stays decodable by the reference (any valid LZ4 block / ZSTD frame),
        but is not byte-identical to the liblz4/libzstd host path, which
        remains the default.

        ``viz=True`` applies the visualization lossy preprocessing (NaN drop +
        voxel dedup, ros_msg_utils.cpp:249-341) before encoding. ``info`` must
        already carry the viz-adjusted resolutions (FLOAT64 without resolution
        -> 1e-6); on the device backend (non-V5 plans) preprocessing is fused
        into the encode program so points never round-trip to the host."""
        self.info = info
        self.header = encode_header(info)
        self.plan = build_plan(info, for_decode=False)
        self.chunk_points = chunk_points
        self._backend_req = backend
        self._viz = None
        if viz:
            from ..preprocess import _detect_triple

            self._viz = _detect_triple(list(info.fields))  # (base, res) or None
        self._device_enc = None
        self._device_stage2 = False
        self._viz_sub = None
        if backend not in ("auto", "host", "device"):
            raise ValueError(f"unknown backend {backend!r}")
        if device_stage2 and info.compression_opt not in (
                CompressionOption.LZ4, CompressionOption.ZSTD):
            raise ValueError("device_stage2 requires LZ4 or ZSTD compression")
        self._stage2_kind = (
            "none" if not device_stage2
            else "lz4" if info.compression_opt == CompressionOption.LZ4
            else "zstd")
        if backend in ("auto", "host") and device_stage2:
            backend = "device"
        if backend in ("auto", "device"):
            try:
                from ..ops.device_codec import cached_encoder, encoder_prefers_device

                # auto only picks the device when it actually wins there —
                # since r3 that is every plan (the Gorilla device chain beats
                # the native host codec after the fill-forward + tier fixes;
                # see encoder_prefers_device)
                from .. import native

                if (
                    backend == "auto"
                    and not encoder_prefers_device(self.plan)
                    and native.available()
                ):
                    raise NotImplementedError
                # value-keyed program cache: per-message encoders (streaming
                # workloads carry width in EncodingInfo) share one compile
                self._device_enc = cached_encoder(
                    self.plan, info.point_step, chunk_points, stage2=self._stage2_kind
                )
                if not _device_available():
                    self._device_enc = None
            except NotImplementedError:
                self._device_enc = None
            if backend == "device" and self._device_enc is None:
                raise NotImplementedError("plan is not device-encodable")
            self._device_stage2 = device_stage2 and self._device_enc is not None

    @property
    def backend(self) -> str:
        return "device" if self._device_enc is not None else "host"

    def _use_device_for(self, n_chunks: int) -> bool:
        """Per-call backend choice under ``auto``: the device pays H2D +
        dispatch + D2H per encode call, so small host-resident clouds run
        faster on the native host codec (measured ~20x on per-message
        streaming); explicit ``device`` (and fused device stage 2) always
        dispatch."""
        if self._device_enc is None:
            return False
        if self._backend_req == "device" or self._device_stage2:
            return True
        from .. import native

        if not (native.available() and len(self.plan.units) <= 64):
            return True  # no native runtime: the device still beats numpy
        return n_chunks >= AUTO_DEVICE_MIN_CHUNKS

    def encode(self, cloud_data, write_header: bool = True) -> bytes:
        points = _as_point_rows(cloud_data, self.info.point_step)
        if self._viz is not None:
            return self._encode_viz(points, write_header)
        n_points = points.shape[0]
        out: List[bytes] = [self.header] if write_header else []
        n_chunks = -(-n_points // self.chunk_points)

        if self.plan.adaptive and self._use_device_for(n_chunks) and n_chunks > 0:
            # V5 on device: probe on host (first chunk, <=4096 pts), then the
            # committed modes are STATIC for a per-modes compiled encoder that
            # emits the complete stage-1 payload (regular stream + sections)
            committed_modes = self._commit_modes(points[: self.chunk_points])
            stage1_chunks = self._encode_device(points, n_chunks, committed_modes)
            for s in stage1_chunks:
                out.append(self._frame(s.tobytes()))
            return b"".join(out)

        regular_streams = self._encode_regular(points, n_chunks)
        committed_modes: Optional[Dict[int, int]] = None
        for i in range(n_chunks):
            chunk = points[i * self.chunk_points : (i + 1) * self.chunk_points]
            parts = [regular_streams[i]]
            if self.plan.adaptive:
                if committed_modes is None:
                    committed_modes = self._commit_modes(chunk)
                from .. import native

                for field in self.plan.adaptive:
                    mode = committed_modes[field.field_index]
                    if native.available():
                        # extraction fused into the C emit (the numpy
                        # strided extract cost ~0.6 ms/msg, r5 profile)
                        parts.append(native.v5_encode_section_rows(
                            field, mode, chunk))
                    else:
                        signed, unsigned = np_v5.extract_adaptive_values(field, chunk)
                        parts.append(np_v5.encode_section(field, mode, signed, unsigned))
            stage1_bytes = np.concatenate(parts).tobytes() if len(parts) > 1 else parts[0].tobytes()
            out.append(self._frame(stage1_bytes))
        return b"".join(out)

    def encode_with_info(self, cloud_data, info: EncodingInfo,
                         write_header: bool = True) -> bytes:
        """Encode under a per-message ``info`` (same schema, varying
        width/height) while sharing this encoder's compiled programs — the
        supported form of the streaming tools' former mutate-internals idiom."""
        saved = self.info, self.header
        try:
            self.info, self.header = info, encode_header(info)
            return self.encode(cloud_data, write_header)
        finally:
            self.info, self.header = saved

    def encode_many(self, clouds: List, infos: Optional[List[EncodingInfo]] = None) -> List[bytes]:
        """Encode MANY same-schema clouds with ONE device dispatch.

        The per-call H2D/dispatch/D2H round trip is the dominant cost of
        per-message streaming encode (see AUTO_DEVICE_MIN_CHUNKS); batching a
        window of messages amortizes it — the data-parallel "rosbag stream"
        workload, with every cloud's chunks stacked on the chunk axis and an
        ordered split on the way back. Streams are identical to per-cloud
        ``encode`` (predictors reset per chunk; headers carry each cloud's
        width). Plans the batch path cannot carry (V5 adaptive — committed
        modes are per-cloud; viz preprocessing) fall back to a plain loop.
        """
        rows_list = [_as_point_rows(c, self.info.point_step) for c in clouds]
        if infos is None:
            infos = [self.info.with_(width=r.shape[0], height=1) for r in rows_list]
        if len(infos) != len(rows_list):
            raise ValueError(
                f"encode_many: {len(rows_list)} clouds but {len(infos)} infos"
            )
        per_cloud_chunks = [-(-r.shape[0] // self.chunk_points) for r in rows_list]
        total_chunks = sum(per_cloud_chunks)
        if self._viz is not None or not self._use_device_for(total_chunks):
            saved = self.info, self.header
            try:
                out = []
                for r, inf in zip(rows_list, infos):
                    self.info, self.header = inf, encode_header(inf)
                    out.append(self.encode(r))
            finally:
                self.info, self.header = saved
            return out
        if self.plan.adaptive:
            # V5: the committed adaptive modes are compile-time state of the
            # device program, and PER-CLOUD (probed on each cloud's first
            # 4096 points, v5_codec.cpp:934-948) — batch clouds that
            # committed to the SAME modes together, one dispatch per group.
            # Zero-point clouds have no chunks (and nothing to probe): their
            # stream is the bare header.
            out: List[Optional[bytes]] = [None] * len(rows_list)
            groups: Dict[tuple, List[int]] = {}
            for i, r in enumerate(rows_list):
                if r.shape[0] == 0:
                    out[i] = encode_header(infos[i])
                    continue
                m = tuple(sorted(self._commit_modes(r[: self.chunk_points]).items()))
                groups.setdefault(m, []).append(i)
            for modes_key, idxs in groups.items():
                streams = self._encode_many_batch(
                    [rows_list[i] for i in idxs],
                    [infos[i] for i in idxs],
                    [per_cloud_chunks[i] for i in idxs],
                    dict(modes_key),
                )
                for i, s in zip(idxs, streams):
                    out[i] = s
            return out  # type: ignore[return-value]
        return self._encode_many_batch(rows_list, infos, per_cloud_chunks, None)

    def _encode_many_batch(self, rows_list, infos, per_cloud_chunks,
                           committed_modes: Optional[Dict[int, int]]) -> List[bytes]:
        """Stack every cloud's chunks on the chunk axis; one device dispatch."""
        from ..ops.device_codec import cached_encoder

        enc = self._device_enc
        if committed_modes is not None:
            enc = cached_encoder(
                self.plan, self.info.point_step, self.chunk_points,
                adaptive_modes=committed_modes, stage2=self._stage2_kind,
            )
        cp = self.chunk_points
        total_chunks = sum(per_cloud_chunks)
        c_pad = _bucket(total_chunks)
        chunks = np.zeros((c_pad, cp, self.info.point_step), dtype=np.uint8)
        n_valid = np.zeros(c_pad, dtype=np.int32)
        k = 0
        for r in rows_list:
            for i in range(-(-r.shape[0] // cp)):
                part = r[i * cp : (i + 1) * cp]
                chunks[k, : len(part)] = part
                n_valid[k] = len(part)
                k += 1
        payloads, sizes = enc.encode_chunks(chunks, n_valid)
        payloads, sizes = np.asarray(payloads), np.asarray(sizes)
        out = []
        k = 0
        for inf, nc in zip(infos, per_cloud_chunks):
            parts = [encode_header(inf)]
            for _ in range(nc):
                parts.append(self._frame(payloads[k, : sizes[k]].tobytes()))
                k += 1
            out.append(b"".join(parts))
        return out

    def _encode_viz(self, points: np.ndarray, write_header: bool) -> bytes:
        """Viz preprocessing + encode. Device: ONE fused program (dedup never
        leaves the device); host / V5-adaptive: numpy preprocess then the
        regular path. Header width is the post-dedup point count."""
        n = points.shape[0]
        base_res = self._viz
        if (
            self._use_device_for(-(-n // self.chunk_points))
            and not self.plan.adaptive
            and base_res is not None
            and n > 0
        ):
            base, res = base_res
            cp = self.chunk_points
            c_pad = _bucket(-(-n // cp))
            flat = np.zeros((c_pad * cp, self.info.point_step), np.uint8)
            flat[:n] = points
            fn = self._device_enc.viz_program(base, res)
            payloads, sizes, n_kept = fn(flat, np.int32(n))
            payloads, sizes, n_kept = np.asarray(payloads), np.asarray(sizes), int(n_kept)
            out: List[bytes] = []
            if write_header:
                out.append(encode_header(self.info.with_(width=n_kept, height=1)))
            for i in range(-(-n_kept // cp) if n_kept else 0):
                out.append(self._frame(payloads[i, : sizes[i]].tobytes()))
            return b"".join(out)
        from ..preprocess import apply_viz_lossy_preprocessing

        if base_res is None:
            rows = points  # no xyz triple detected: filtering is a no-op
        else:
            _, rows = apply_viz_lossy_preprocessing(list(self.info.fields), points)
        header = encode_header(self.info.with_(width=rows.shape[0], height=1))
        if self._viz_sub is None:
            # the sub-encoder's plan is width-independent (width only feeds
            # the header, written above) — build it once per encoder
            self._viz_sub = PointcloudEncoder(
                self.info.with_(width=rows.shape[0], height=1),
                backend="host" if self._device_enc is None else "auto",
                chunk_points=self.chunk_points,
            )
        payload = self._viz_sub.encode(rows, write_header=False)
        return (header + payload) if write_header else payload

    def _frame(self, payload: bytes) -> bytes:
        """u32 chunk framing; when stage 2 already ran on device the payload
        is final (chunk_writer.cpp:27-48 framing only)."""
        if self._device_stage2:
            return struct.pack("<I", len(payload)) + payload
        return stage2.write_stage1_chunk(self.info.compression_opt, payload)

    def _encode_device(self, points, n_chunks, committed_modes) -> List[np.ndarray]:
        """Full stage-1 on device; the committed mode is compile-time state —
        one cached program per (plan, modes)."""
        from ..ops.device_codec import cached_encoder

        enc = cached_encoder(
            self.plan, self.info.point_step, self.chunk_points,
            adaptive_modes=committed_modes, stage2=self._stage2_kind,
        )
        chunks, n_valid = _pad_chunks(points, n_chunks, self.chunk_points, self.info.point_step)
        payloads, sizes = enc.encode_chunks(chunks, n_valid)
        payloads, sizes = np.asarray(payloads), np.asarray(sizes)
        return [payloads[i, : sizes[i]] for i in range(n_chunks)]

    def _commit_modes(self, first_chunk: np.ndarray) -> Dict[int, int]:
        """V5 probe: first 4096 points of the first chunk, or the whole chunk
        when smaller (v5_codec.cpp:934-948)."""
        probe_n = (
            ADAPTIVE_MODE_PROBE_POINTS
            if first_chunk.shape[0] > ADAPTIVE_MODE_PROBE_POINTS
            else first_chunk.shape[0]
        )
        from .. import native

        use_native = native.available()
        modes = {}
        for field in self.plan.adaptive:
            if use_native:
                # same size math in C, extraction fused (differential-tested
                # vs the numpy oracle); the numpy probe alone cost ~0.7 ms
                # of the 4.2 ms single-message p50 (r5 latency profile)
                modes[field.field_index] = native.v5_analyze_modes_rows(
                    field, first_chunk[:probe_n])
            else:
                signed, unsigned = np_v5.extract_adaptive_values(
                    field, first_chunk[:probe_n])
                modes[field.field_index] = np_v5.analyze_modes(
                    signed, unsigned, field.bytes_per_value)
        return modes

    def _encode_regular(self, points: np.ndarray, n_chunks: int) -> List[np.ndarray]:
        """Per-chunk regular (interleaved) stage-1 streams."""
        if n_chunks == 0:
            return []
        if not self._use_device_for(n_chunks):
            from .. import native

            if native.available() and len(self.plan.units) <= 64:
                mpb = self.plan.max_encoded_point_bytes
                return [
                    native.encode_chunk(
                        self.plan,
                        points[i * self.chunk_points : (i + 1) * self.chunk_points],
                        mpb,
                    )
                    for i in range(n_chunks)
                ]
            return [
                np_stage1.encode_chunk(
                    self.plan, points[i * self.chunk_points : (i + 1) * self.chunk_points]
                )
                for i in range(n_chunks)
            ]
        chunks, n_valid = _pad_chunks(points, n_chunks, self.chunk_points, self.info.point_step)
        payloads, sizes = self._device_enc.encode_chunks(chunks, n_valid)
        payloads = np.asarray(payloads)
        sizes = np.asarray(sizes)
        return [payloads[i, : sizes[i]] for i in range(n_chunks)]


class PointcloudDecoder:
    """Chunked decoder; validates framing like the reference (cloudini.cpp:635-668)."""

    def __init__(self, backend: str = "auto", chunk_points: int = POINTS_PER_CHUNK):
        """``chunk_points`` must match the encoder's; conformant wire always
        uses POINTS_PER_CHUNK (the size is not recoverable from the stream —
        the reference hard-codes it, cloudini.cpp:652)."""
        if backend not in ("auto", "host", "device"):
            raise ValueError(f"unknown backend {backend!r}")
        self._backend = backend
        self.chunk_points = chunk_points
        self._device_dec = None
        self._device_key = None
        # RETRY telemetry (VERDICT r4 item 9): the FSM speculation tiers
        # escape legal-but-unusual chunks to the host at host speed; these
        # counters make that cliff observable (codec_benchmark --explain
        # prints them). device_chunks counts chunks decoded on device,
        # retry_chunks the subset re-decoded host-side via the RETRY escape.
        self.device_chunks = 0
        self.retry_chunks = 0

    def decode(self, info: EncodingInfo, compressed_data: bytes) -> np.ndarray:
        if compressed_data[: len(MAGIC_HEADER)] == MAGIC_HEADER:
            raise ValueError("compressed_data contains the header. Use decode_header first")
        plan = build_plan(info, for_decode=True)
        n_total = info.num_points
        out = np.zeros((n_total, info.point_step), dtype=np.uint8)

        if info.version >= 3:
            chunks = self._split_chunks(info, compressed_data, n_total)
            raws = [
                stage2.decompress_chunk(info.compression_opt, c, plan.max_stage1_chunk_bytes(pts))
                for c, pts in chunks
            ]
            if self._use_device(plan, len(chunks)):
                self._decode_chunks_device(info, plan, raws, chunks, out)
            else:
                row = 0
                for raw, (_, pts) in zip(raws, chunks):
                    self._decode_stage1_host(info, plan, np.frombuffer(raw, np.uint8),
                                             out[row : row + pts])
                    row += pts
        else:
            raw = stage2.decompress_chunk(info.compression_opt, compressed_data,
                                          plan.max_stage1_chunk_bytes(n_total))
            self._decode_stage1_host(info, plan, np.frombuffer(raw, np.uint8), out)
        return out

    def decode_full(self, stream: bytes) -> Tuple[EncodingInfo, np.ndarray]:
        """Convenience: header + payload in one buffer."""
        info, header_len = decode_header(stream)
        return info, self.decode(info, stream[header_len:])

    # ------------------------------------------------------------------ internals

    def _split_chunks(self, info, data: bytes, n_total: int):
        """Walk the u32-framed chunk list (cloudini.cpp:645-661)."""
        chunks = []
        pos = 0
        points_remaining = n_total
        view = memoryview(data)
        while pos < len(view):
            if points_remaining == 0:
                raise ValueError("Encoded data contains more chunks than declared points")
            if pos + 4 > len(view):
                raise ValueError("Invalid chunk size found while decoding")
            (chunk_size,) = struct.unpack_from("<I", view, pos)
            pos += 4
            if chunk_size > len(view) - pos:
                raise ValueError("Invalid chunk size found while decoding")
            pts = min(points_remaining, self.chunk_points)
            chunks.append((bytes(view[pos : pos + chunk_size]), pts))
            pos += chunk_size
            points_remaining -= pts
        if points_remaining != 0:
            raise ValueError("Encoded data ended before all declared points were decoded")
        return chunks

    def _use_device(self, plan: CodecPlan, n_chunks: int) -> bool:
        if self._backend == "host":
            return False
        from ..ops.device_codec import decoder_prefers_device, decoder_supports_plan

        if self._backend == "device":
            if not (decoder_supports_plan(plan) and _device_available()):
                raise NotImplementedError("plan is not device-decodable")
            return True
        # auto: only when the device path actually wins — pure-varint plans
        # with enough chunks to amortize the per-call H2D/dispatch/D2H round
        # trip (small host-resident decodes run faster on the NATIVE
        # sequential decoder; the mixed-plan binary-lifting path loses to it
        # by ~100x at any size — but either device path still beats the
        # pure-Python seqdecode walk used when native cannot build)
        from .. import native

        if not native.available():
            prefer = decoder_supports_plan(plan)
        else:
            prefer = decoder_prefers_device(plan) and n_chunks >= AUTO_DEVICE_MIN_CHUNKS
        return prefer and _device_available()

    def _decode_chunks_device(self, info, plan, raws, chunks, out):
        from ..ops.device_codec import cached_decoder

        c = len(raws)
        c_pad = _bucket(c)
        # +1 guarantees the buffer exceeds every raw size so the decoder's
        # clamped-at-B truncation sentinel is always > the real size.
        # Bucket to quarter-octave steps (~19% apart): a stream of varying
        # message sizes then compiles a BOUNDED set of decoder programs
        # (jaxlib's CPU client crashes once a few hundred executables pile
        # up in one process, and every program costs compile time) at a
        # worst-case ~19% of wasted scan/sort width
        max_bytes = max((len(r) for r in raws), default=0) + 1
        max_bytes = _quarter_octave(max_bytes)
        with_sections = bool(plan.adaptive)
        self._device_dec = cached_decoder(
            plan, info.point_step, self.chunk_points, max_bytes,
            raw_words_out=not with_sections, with_sections=with_sections,
        )
        payloads = np.zeros((c_pad, max_bytes), dtype=np.uint8)
        sizes = np.zeros(c_pad, dtype=np.int32)
        n_valid = np.zeros(c_pad, dtype=np.int32)
        for i, (raw, (_, pts)) in enumerate(zip(raws, chunks)):
            payloads[i, : len(raw)] = np.frombuffer(raw, np.uint8)
            sizes[i] = len(raw)
            n_valid[i] = pts
        rows_dev, consumed = self._device_dec.decode_chunks(payloads, sizes, n_valid)
        rows_h = np.asarray(rows_dev)
        if self._device_dec.raw_words_out:
            # flat u32 words ARE the row bytes (little-endian): free view
            rows_h = rows_h.view(np.uint8).reshape(
                rows_h.shape[0], self.chunk_points, info.point_step
            )
        consumed = np.asarray(consumed)
        from ..ops.adaptive_decode import RETRY

        row = 0
        self.device_chunks += len(chunks)
        for i, (raw, (_, pts)) in enumerate(zip(raws, chunks)):
            if consumed[i] == RETRY:
                # legal-but-unusual stream shapes (e.g. per-chunk V5 wire
                # modes diverging): decode this chunk entirely host-side
                self.retry_chunks += 1
                self._decode_stage1_host(info, plan, np.frombuffer(raw, np.uint8),
                                         out[row : row + pts])
                row += pts
                continue
            if consumed[i] > len(raw):
                raise ValueError("Truncated encoded data: not enough bytes for a complete point")
            out[row : row + pts] = rows_h[i, :pts]
            if plan.adaptive and not with_sections:
                data = np.frombuffer(raw, np.uint8)
                pos = int(consumed[i])
                for field in plan.adaptive:
                    pos = np_v5.decode_section(field, data, pos, out[row : row + pts], pts)
                if pos != len(data):
                    raise ValueError("V5 chunk has trailing bytes after decode")
            elif with_sections and consumed[i] != len(raw):
                raise ValueError("V5 chunk has trailing bytes after decode")
            row += pts

    def _decode_stage1_host(self, info, plan, data: np.ndarray, out_rows: np.ndarray):
        expected_points = out_rows.shape[0]
        from .. import native

        # the native sequential decoder beats the numpy boundary-scan ~9x on
        # all-varint plans too (1.0 vs 8.6 ms/chunk on lidar.pcd), so the
        # host pipeline always prefers it; the numpy kernel remains the
        # independent wire oracle used by tests and bench gates
        if native.available() and plan.units and len(plan.units) <= 64:
            consumed = native.decode_chunk(plan, data, out_rows, expected_points)
        else:
            consumed = np_stage1.decode_chunk(plan, data, out_rows, expected_points)
        if plan.adaptive:
            pos = consumed
            for field in plan.adaptive:
                pos = np_v5.decode_section(field, data, pos, out_rows, expected_points)
            if pos != len(data):
                raise ValueError("V5 chunk has trailing bytes after decode")
