#!/usr/bin/env bash
# Pending r2 TPU measurements (PROFILE.md "Pending TPU measurements").
# Run as soon as the axon tunnel is back: bash scripts/pending_tpu_r2.sh
# Each step is independently timeboxed; artifacts land in /tmp and the
# session then records them into PROFILE.md / BENCH files.
set -x
cd "$(dirname "$0")/.."

# 0. tunnel sanity (fail fast if still wedged)
timeout 120 python -c "import jax; print(jax.devices())" || exit 1

# 1. full bench matrix (headline + 5 config rows, deadline-managed inside)
timeout 900 python bench.py 2>/tmp/bench_r2.err | tee /tmp/bench_r2.json

# 2. FSM decode per-op profile (post-unroll attribution)
timeout 600 python scripts/profile_encode.py fsm 16 4 | tee /tmp/prof_fsm.txt

# 3. fused device-zstd encode profile (post-dynamic-FSE cost)
timeout 900 python scripts/profile_encode.py zstd 16 4 | tee /tmp/prof_zstd.txt

# 4. device Gorilla encode (scan-based chain) — the auto-flip measurement
timeout 600 python scripts/profile_encode.py gorilla 16 4 | tee /tmp/prof_gorilla.txt

echo "DONE — record into PROFILE.md, BENCH_r02 artifacts; decide the"
echo "Gorilla auto flip (encoder_prefers_device) from /tmp/prof_gorilla.txt"
