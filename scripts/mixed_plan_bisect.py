#!/usr/bin/env python3
"""Bisect the dds-mixed-plan device encode pathology by sub-plan.

Times DeviceStage1Encoder honestly (memoization-proof chain, no profiler)
on three plans over the same C chunks:
  xyzi_ring — FloatN(xyzi) + INT_DELTA(ring), no Gorilla
  gorilla   — timestamp f64 Gorilla only
  mixed     — the full dds schema (the r2 pathology: 15.8 s/iter wall)

Run: python scripts/mixed_plan_bisect.py [C] [iters] [case ...]
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from cloudini_tpu.core.plan import build_plan
from cloudini_tpu.core.types import (
    CompressionOption,
    EncodingInfo,
    EncodingOptions,
    FieldType,
    PointField,
)
from cloudini_tpu.ops.device_codec import DeviceStage1Encoder

C = int(sys.argv[1]) if len(sys.argv) > 1 else 8
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
ONLY = set(sys.argv[3:])
CH = 32 * 1024
MULT = np.int32(-1640531535)


def make_rows(n, step, fields_kind):
    rng = np.random.default_rng(0)
    pts = np.cumsum(rng.normal(0, 0.05, (n, 4)), axis=0).astype(np.float32)
    ts = (1.7e9 + np.cumsum(rng.uniform(0, 1e-4, n))).astype(np.float64)
    rows = np.zeros((n, step), np.uint8)
    if fields_kind == "xyzi_ring":
        rows[:, :16] = pts.view(np.uint8).reshape(n, 16)
        rows[:, 16:18] = (np.arange(n) % 16).astype(np.uint16).reshape(-1, 1).view(np.uint8)
    elif fields_kind == "gorilla":
        rows[:, :8] = ts.reshape(-1, 1).view(np.uint8)
    else:
        rows[:, :16] = pts.view(np.uint8).reshape(n, 16)
        rows[:, 16:18] = (np.arange(n) % 16).astype(np.uint16).reshape(-1, 1).view(np.uint8)
        rows[:, 18:26] = ts.reshape(-1, 1).view(np.uint8)
    return rows.reshape(C, CH, step)


def plan_for(kind):
    if kind == "xyzi_ring":
        step = 18
        fields = tuple(
            PointField(nm, 4 * i, FieldType.FLOAT32, 0.001) for i, nm in enumerate("xyzi")
        ) + (PointField("ring", 16, FieldType.UINT16, None),)
    elif kind == "gorilla":
        step = 8
        fields = (PointField("timestamp", 0, FieldType.FLOAT64, None),)
    else:
        step = 26
        fields = tuple(
            PointField(nm, 4 * i, FieldType.FLOAT32, 0.001) for i, nm in enumerate("xyzi")
        ) + (
            PointField("ring", 16, FieldType.UINT16, None),
            PointField("timestamp", 18, FieldType.FLOAT64, None),
        )
    info = EncodingInfo(
        fields=fields, width=C * CH, height=1, point_step=step,
        encoding_opt=EncodingOptions.LOSSY, compression_opt=CompressionOption.NONE,
        version=4,
    )
    return build_plan(info), step


def run_case(kind):
    plan, step = plan_for(kind)
    rows_h = make_rows(C * CH, step, kind)
    enc = DeviceStage1Encoder(plan, step, chunk_points=CH)
    rows = jax.device_put(jnp.asarray(rows_h))
    nv = jnp.full(C, CH, jnp.int32)
    iota = jnp.arange(CH, dtype=jnp.int32)[None, :]

    @jax.jit
    def mix_r(r, big, k):
        st = (big.astype(jnp.int32) * MULT).sum() + k * np.int32(40503)
        v = (((st + iota * MULT) >> 7) & 0x7F).astype(jnp.uint8)
        return r.at[:, :, 12].set(v)

    import os

    p, s = jax.block_until_ready(enc.encode_chunks(rows, nv))  # compile
    np.asarray(s[:1])  # SYNC: un-synced blocks are no-ops (SKILL.md r3)
    rr = jax.block_until_ready(mix_r(rows, p, jnp.int32(0)))
    queue = bool(os.environ.get("CLDN_QUEUE"))
    per = []
    t_all = time.perf_counter()
    for i in range(ITERS):
        t0 = time.perf_counter()
        p_i, s_i = enc.encode_chunks(rr, nv)
        rr = mix_r(rr, p_i, jnp.int32(i + 1))
        if not queue:
            jax.block_until_ready((p_i, s_i, rr))
        per.append((time.perf_counter() - t0) * 1e3)
    jax.block_until_ready((p_i, s_i, rr))
    wall = (time.perf_counter() - t_all) / ITERS * 1e3
    gbs = rows_h.nbytes / (wall / 1e3) / 1e9
    print(
        f"{kind:10s}: " + " ".join(f"{p:10.2f}" for p in per)
        + f" | avg {wall:10.2f} ms/iter  ({gbs:.3f} GB/s)",
        flush=True,
    )
    p.delete()


def main():
    print(f"device: {jax.devices()[0]}, C={C}")
    for kind in ("xyzi_ring", "gorilla", "mixed"):
        if ONLY and kind not in ONLY:
            continue
        run_case(kind)


if __name__ == "__main__":
    main()
