#!/usr/bin/env python3
"""Bisect the r4 fused-path regression (14.88 ms vs 6.5-7.7 committed):
run ONLY the fused9 variant under the env knobs set by the caller
(CLDN_COMPACT_GUARD_FROM, CLDN_COMPACT_FUSED_MASK)."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import numpy as np

sys.path.insert(0, "/root/repo")
from cloudini_tpu.ops.compact_kernel import masked_compact  # noqa: E402
from scripts.compact_kernel_probe import _time, C, B, K  # noqa: E402


def main():
    rng = np.random.default_rng(0)
    mask = (rng.random((C, B)) < 0.5).astype(np.int32)
    val = rng.integers(0, 2**31, (C, B), dtype=np.int64).astype(np.uint32)
    val9 = ((val & np.uint32(0xFF)) | np.uint32(0x100)) * mask.astype(np.uint32)
    d_mask = jax.device_put(mask)
    d_val9 = jax.device_put(val9)
    # default strings MUST match compact_kernel.py's env defaults ('99'/'1')
    # or an unset-env run gets mislabeled (ADVICE r4)
    tag = (f"g{os.environ.get('CLDN_COMPACT_GUARD_FROM', '99')}"
           f"_m{os.environ.get('CLDN_COMPACT_FUSED_MASK', '1')}")
    _time(lambda v: masked_compact(d_mask, v, K, tile_rows=256, fuse_bits=9),
          d_val9, f"fused9_{tag}")


if __name__ == "__main__":
    main()
