#!/usr/bin/env python3
"""Run a single bench.py config row standalone (r3 re-measurements of the
fused stage-2 rows after the r2 measurement-artifact finding, DECISIONS.md).

Usage: python scripts/run_one_cfg.py {fused_lz4|fused_zstd|dds_fsm|mixed_schema|xyz_zstd|latency}
"""

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import bench


def main():
    which = sys.argv[1]
    import jax

    rows = bench._load_rows()
    n = rows.shape[0]
    CH = bench.CHUNK
    C = bench.N_CHUNKS
    reps = -(-C * CH // n)
    big = np.tile(rows, (reps, 1))[: C * CH]
    chunks = big.reshape(C, CH, 16)
    n_valid = np.full(C, CH, np.int32)
    t0 = time.time()
    if which == "fused_lz4":
        from cloudini_tpu.core.plan import build_plan

        row = bench._cfg_fused_lz4(jax, None, chunks, n_valid)
    elif which == "fused_zstd":
        row = bench._cfg_fused_zstd(jax, chunks, n_valid)
    elif which == "dds_fsm":
        row = bench._cfg_dds_fsm(jax)
    elif which == "mixed_schema":
        row = bench._cfg_mixed_schema(jax, chunks, n_valid)
    elif which == "xyz_zstd":
        row = bench._cfg_xyz_zstd(jax, None, chunks, n_valid)
    elif which == "latency":
        row = bench._cfg_streaming_latency(jax)
    else:
        raise SystemExit(f"unknown config {which}")
    print(f"# wall {time.time()-t0:.0f}s", file=sys.stderr)
    print(json.dumps({"metric": which, **row}), flush=True)


if __name__ == "__main__":
    main()
