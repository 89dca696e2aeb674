"""Extended differential fuzz: random schemas through the FULL pipeline,
cross-decoded by the reference C++ binary (oracle/), incl. fused
device-ZSTD streams. Ad-hoc campaign tool (takes ~30-40 min on CPU; the
committed fast variant is tests/test_fuzz_plans.py).

r2 campaign result: 200 seeds, 25 zstd-fused oracle decodes, 0 failures.
Run: python scripts/oracle_fuzz.py [start] [end]
"""
import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")
import sys, pathlib
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
import numpy as np
from tests.test_fuzz_plans import _random_info, _random_rows
from tests.oracle_utils import Oracle
from tests.conftest import ORACLE_BIN
from cloudini_tpu.codec.pipeline import PointcloudDecoder, PointcloudEncoder
from cloudini_tpu.core.types import CompressionOption

oracle = Oracle(str(ORACLE_BIN))
fails = zchecks = 0
lo = int(sys.argv[1]) if len(sys.argv) > 1 else 100
hi = int(sys.argv[2]) if len(sys.argv) > 2 else 300
for seed in range(lo, hi):
    rng = np.random.default_rng(seed)
    info, n = _random_info(rng)
    rows = _random_rows(rng, info, n)
    try:
        host_enc = PointcloudEncoder(info, backend="host")
        host_rows = PointcloudDecoder(backend="host").decode(
            info, host_enc.encode(rows, write_header=False))
        full = host_enc.encode(rows, write_header=True)
        ref = np.frombuffer(oracle.decode(full), np.uint8).reshape(-1, info.point_step)
        assert np.array_equal(ref, np.asarray(host_rows).reshape(-1, info.point_step)), "oracle rows differ"
        if info.compression_opt == CompressionOption.ZSTD and zchecks < 25:
            try:
                zenc = PointcloudEncoder(info, backend="device", device_stage2=True)
            except Exception:
                zenc = None
            if zenc is not None and zenc._device_stage2:
                zchecks += 1
                zs = zenc.encode(rows, write_header=True)
                refz = np.frombuffer(oracle.decode(zs), np.uint8).reshape(-1, info.point_step)
                assert np.array_equal(refz, np.asarray(host_rows).reshape(-1, info.point_step)), "oracle(zstd-fused) rows differ"
                jax.clear_caches()
    except Exception as e:
        fails += 1
        print(f"SEED {seed} FAIL: {type(e).__name__}: {e}", flush=True)
print(f"oracle cross-decode fuzz fails: {fails} (zstd-fused checks: {zchecks})")
