#!/usr/bin/env python3
"""Benchmark: stage-1 codec throughput on one TPU chip vs the reference C++.

Workload: the reference's own LiDAR fixture (lidar.pcd, 115385-pt XYZI float32,
1 mm resolution — BASELINE config 2 shape) replicated to fill 64 x 32768-point
chunks, encoded + decoded on device. Correctness-gated: the device round trip
must be bit-identical to the numpy wire kernel (itself locked to the reference
C++ bytes by tests/test_golden.py), enforced with an FNV-1a fingerprint like the
reference's ``mcap_codec_benchmark --hash``.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where value is
encode+decode GB/s per chip and vs_baseline is the speedup over the reference
C++ library (single core, same machine, same data, stage-1 NONE path).

Timing is memoization-proof: the axon runtime caches executions by (program,
argument contents), so every timed call uses content-unique inputs.
"""

import json
import os
import pathlib
import subprocess
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

CHUNK = 32 * 1024
N_CHUNKS = 64
ITERS = 8
# measured on this machine (1-core reference C++, lidar.pcd XYZI, stage-1 only):
# encode 2.866 ms + decode 3.334 ms for 1 846 160 B  ->  0.2977 GB/s round trip
FALLBACK_BASELINE_GBPS = 0.2977


def _load_rows():
    pcd = pathlib.Path("/root/reference/cloudini_lib/samples/lidar.pcd")
    if pcd.exists():
        from cloudini_tpu.io.pcd import read_pcd

        _, rows = read_pcd(str(pcd))
        return rows
    rng = np.random.default_rng(0)
    pts = np.cumsum(rng.normal(0, 0.05, (115385, 4)), axis=0).astype(np.float32)
    return np.ascontiguousarray(pts).view(np.uint8).reshape(-1, 16)


def _reference_baseline(rows: np.ndarray) -> float:
    """GB/s of the reference C++ (encode+decode, stage-1 NONE) on this host."""
    oracle = REPO / "oracle" / "build" / "oracle_cli"
    if not oracle.exists():
        return FALLBACK_BASELINE_GBPS
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        d = pathlib.Path(d)
        (d / "raw").write_bytes(rows.tobytes())
        (d / "spec").write_text(
            f"width={rows.shape[0]}\nheight=1\npoint_step=16\nversion=5\n"
            "encoding=LOSSY\ncompression=NONE\n"
            "field=x:FLOAT32:0:0.001\nfield=y:FLOAT32:4:0.001\n"
            "field=z:FLOAT32:8:0.001\nfield=intensity:FLOAT32:12:0.001\n"
        )
        try:
            out = subprocess.run(
                [str(oracle), "bench", str(d / "spec"), str(d / "raw"), "10"],
                capture_output=True, text=True, timeout=300, check=True,
            ).stdout.split()
            enc_ns, dec_ns, nbytes = int(out[0]), int(out[1]), int(out[2])
            return nbytes / (enc_ns + dec_ns)  # bytes/ns == GB/s
        except Exception:
            return FALLBACK_BASELINE_GBPS


def _fnv1a(data: bytes) -> int:
    h = np.uint64(14695981039346656037)
    arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    np.seterr(over="ignore")
    prime = np.uint64(1099511628211)
    for b in arr[:: max(1, len(arr) // 65536)]:  # sampled fingerprint
        h = (h ^ b) * prime
    return int(h)


def main():
    import jax

    from cloudini_tpu.core.plan import build_plan
    from cloudini_tpu.core.types import (
        CompressionOption,
        EncodingInfo,
        EncodingOptions,
        FieldType,
        PointField,
    )
    from cloudini_tpu.ops.device_codec import DeviceStage1Decoder, DeviceStage1Encoder
    from cloudini_tpu.ref import stage1 as np_stage1

    rows = _load_rows()
    # the shared host is often heavily loaded, which deflates the reference
    # C++ measurement; compare against the best baseline ever observed here
    # so vs_baseline stays conservative
    base_gbps = max(_reference_baseline(rows), FALLBACK_BASELINE_GBPS)

    info = EncodingInfo(
        fields=(
            PointField("x", 0, FieldType.FLOAT32, 0.001),
            PointField("y", 4, FieldType.FLOAT32, 0.001),
            PointField("z", 8, FieldType.FLOAT32, 0.001),
            PointField("intensity", 12, FieldType.FLOAT32, 0.001),
        ),
        width=rows.shape[0], height=1, point_step=16,
        encoding_opt=EncodingOptions.LOSSY, compression_opt=CompressionOption.NONE,
    )
    plan = build_plan(info)

    # replicate the cloud to fill N_CHUNKS full chunks
    reps = -(-N_CHUNKS * CHUNK // rows.shape[0])
    big = np.tile(rows, (reps, 1))[: N_CHUNKS * CHUNK]
    chunks = big.reshape(N_CHUNKS, CHUNK, 16)
    n_valid = np.full(N_CHUNKS, CHUNK, dtype=np.int32)
    total_bytes = big.nbytes

    enc = DeviceStage1Encoder(plan, 16, chunk_points=CHUNK)
    d_rows = jax.device_put(chunks)
    d_valid = jax.device_put(n_valid)

    payloads, sizes = jax.block_until_ready(enc.encode_chunks(d_rows, d_valid))  # warmup/compile
    # size the decode buffer from the actual chunk sizes (1 KiB buckets, +1 so
    # the truncation sentinel exceeds any real size), like the pipeline does
    b_act = int(-(-(int(np.asarray(sizes).max()) + 1) // 1024) * 1024)
    payloads = jax.block_until_ready(jax.jit(lambda p: p[:, :b_act])(payloads))
    # raw_words_out: rows return as flat u32 words (identical bytes, viewed
    # for free on the host) — skips ~1 ms/iter of byte-materialization
    dec = DeviceStage1Decoder(plan, 16, chunk_points=CHUNK, max_bytes=b_act,
                              raw_words_out=True)
    decoded, _consumed = jax.block_until_ready(dec.decode_chunks(payloads, sizes, d_valid))

    # CRITICAL honesty requirements (both empirically observed on axon):
    #  * the runtime memoizes executions by (program, argument contents) —
    #    re-timing identical calls measures a cache hit (~1000x inflation)
    #  * batching independent dispatches and blocking once reports times far
    #    below the serialized compute — results must form a DEPENDENCY CHAIN
    # Every timed iteration therefore consumes the previous iteration's
    # output (content-unique and serialized).
    import jax.numpy as jnp

    # chain folds the FULL large output of each step into the next input
    # through a WIDE-entropy hash (a narrow chain state, e.g. one byte value,
    # revisits earlier contents within a few iterations and the memoizer
    # serves those dispatches)
    _MULT = np.int32(-1640531535)  # 2654435761 (Knuth) as int32
    _iota_pts = jnp.arange(CHUNK, dtype=jnp.int32)[None, :]

    @jax.jit
    def _mix_rows(r, p, k):
        st = (p.astype(jnp.int32) * _MULT).sum() + k * np.int32(40503)
        v = (((st + _iota_pts * _MULT) >> 7) & 0x7F).astype(jnp.uint8)
        return r.at[:, :, 12].set(v)

    @jax.jit
    def _mix_payload(p, o, k):
        st = (o.astype(jnp.int32) * _MULT).sum() + k * np.int32(40503)
        v = (((st + jnp.arange(N_CHUNKS, dtype=jnp.int32) * _MULT) >> 7) & 0x7F).astype(jnp.uint8)
        # perturb only the PADDING column (max_bytes exceeds every real
        # size): contents change every iteration — the memoizer must
        # re-execute — but the streams stay VALID, so the timed decode is
        # the hot no-NaN path, not the corrupt-stream reset path
        return p.at[:, -1].set(v)

    # three trials with disjoint content streams (k offsets), best-of —
    # the shared host/tunnel adds large run-to-run noise
    t_enc = float("inf")
    t_dec = float("inf")
    for trial in range(3):
        base = jnp.int32(1000 * trial)
        rr = jax.block_until_ready(_mix_rows(d_rows, payloads, base))
        t0 = time.perf_counter()
        for i in range(ITERS):
            p_i, s_i = enc.encode_chunks(rr, d_valid)
            rr = _mix_rows(rr, p_i, base + jnp.int32(i + 1))
        jax.block_until_ready((p_i, s_i, rr))
        t_enc = min(t_enc, (time.perf_counter() - t0) / ITERS)
        rr.delete(), p_i.delete()

        pp = jax.block_until_ready(_mix_payload(payloads, decoded, base))
        t0 = time.perf_counter()
        for i in range(ITERS):
            o_i, c_i = dec.decode_chunks(pp, sizes, d_valid)
            pp = _mix_payload(pp, o_i, base + jnp.int32(i + 1))
        jax.block_until_ready((o_i, c_i, pp))
        t_dec = min(t_dec, (time.perf_counter() - t0) / ITERS)
        o_i.delete(), pp.delete()

    # correctness gate vs the numpy wire kernel (bit-exact to reference C++),
    # covering EVERY chunk. Raw buffers are never pulled (D2H over this tunnel
    # runs ~40 KB/s); instead int32-wrapping weighted fingerprints are reduced
    # per chunk ON DEVICE and only the (C,) scalars come back.
    np.seterr(over="ignore")
    sizes_h = np.asarray(sizes)
    dplan = build_plan(info, for_decode=True)
    ref_payloads = [np_stage1.encode_chunk(plan, chunks[i]) for i in range(N_CHUNKS)]
    ref_rows = np.zeros_like(chunks)
    for i in range(N_CHUNKS):
        np_stage1.decode_chunk(dplan, ref_payloads[i], ref_rows[i], CHUNK)



    def _fp_host(a):
        flat = a.reshape(-1).astype(np.int32)
        w = np.arange(flat.shape[0], dtype=np.int32) % 251 + 1
        return int(np.sum(flat * w, dtype=np.int32))

    @jax.jit
    def _fp_dev_rows(x):  # u32 row words -> (C,) int32 BYTE fingerprints
        b = jax.lax.bitcast_convert_type(x, jnp.uint8).reshape(x.shape[0], -1)
        flat = b.astype(jnp.int32)
        w = jnp.arange(flat.shape[1], dtype=jnp.int32) % 251 + 1
        return jnp.sum(flat * w, axis=1, dtype=jnp.int32)

    @jax.jit
    def _fp_dev_payload(p, s):  # fingerprint only the valid prefix per chunk
        w = jnp.arange(p.shape[1], dtype=jnp.int32) % 251 + 1
        valid = jnp.arange(p.shape[1], dtype=jnp.int32)[None, :] < s[:, None]
        return jnp.sum(jnp.where(valid, p.astype(jnp.int32) * w, 0), axis=1,
                       dtype=jnp.int32)

    enc_fps = np.asarray(_fp_dev_payload(payloads, sizes))
    dec_fps = np.asarray(_fp_dev_rows(decoded))
    for i in range(N_CHUNKS):
        assert sizes_h[i] == len(ref_payloads[i]), f"chunk {i} size mismatch"
        assert enc_fps[i] == _fp_host(ref_payloads[i]), (
            f"device encode diverges from reference wire bytes (chunk {i})"
        )
        assert dec_fps[i] == _fp_host(ref_rows[i]), (
            f"device decode diverges from reference output (chunk {i})"
        )
    fingerprint = _fnv1a(ref_rows.tobytes())

    gbps = total_bytes / (t_enc + t_dec) / 1e9
    result = {
        "metric": "stage1 encode+decode throughput per chip (lidar.pcd XYZI, 1mm)",
        "value": round(gbps, 4),
        "unit": "GB/s",
        "vs_baseline": round(gbps / base_gbps, 3),
    }
    print(json.dumps(result))
    # details to stderr for humans
    print(
        f"# enc {total_bytes/t_enc/1e9:.3f} GB/s, dec {total_bytes/t_dec/1e9:.3f} GB/s, "
        f"ratio {total_bytes/float(sizes_h.sum()):.3f}, fingerprint {fingerprint:#x}, "
        f"baseline(C++ 1-core) {base_gbps:.4f} GB/s, device {jax.devices()[0]}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
