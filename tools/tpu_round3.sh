#!/bin/bash
# Round-3 TPU measurement sequence — run when the axon tunnel is up.
# Populates the persistent compile cache as it goes, so the driver's
# end-of-round bench.py re-hits everything.  Each section is timeout-
# bounded; partial results are still useful.
set -x
cd "$(dirname "$0")/.."
export CONP2_TPU_COMPILE_CACHE="$PWD/.jax_cache"
OUT=validation/round3_tpu.log
: > "$OUT"

run() { echo "=== $* ===" >> "$OUT"; timeout "$1" "${@:2}" >> "$OUT" 2>&1; }

# 1. 100k production config, INV (the VERDICT item-1 headline)
run 1800 python tools/bench_large.py
# 2. A/B: matrix-free CG on the same config
run 1200 python tools/bench_large.py 98304 23 cg_matfree
# 3. phase breakdown for VALIDATION.md
run 1200 python tools/step_breakdown_large.py
# 4. the bench harness (dilute + il_twolayer + 100k extras)
run 1800 python bench.py
# 5. il_twolayer phase profile (stretch goal >=650 steps/s)
run 900 python tools/profile_il.py
tail -40 "$OUT"
