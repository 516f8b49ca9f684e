#!/bin/bash
# Round-4 end-of-round measurement queue: run when the TPU relay is up.
# Confirms the canonical table numbers on the same day and sanity-checks
# that the session's simulator/mixed-dtype work did not perturb the
# compute path (it should not — the backends' generated code for
# uniform-f32 programs is unchanged).
#
# Usage: bash scripts/r4_remeasure.sh [outfile]
set -u
OUT=${1:-/tmp/r4_remeasure.log}
cd "$(dirname "$0")/.."
echo "=== r4 remeasure $(date -u +%FT%TZ) ===" | tee -a "$OUT"

run() {
  echo "--- $* ---" | tee -a "$OUT"
  timeout 900 python bench.py "$@" 2>&1 | tail -1 | tee -a "$OUT"
}

# headline: exact mode (the canonical number) and the bf16-ring opt-in
run
run --backend panel --ring-storage bfloat16
# box composed MXU, exact split precision (the 1-pass bf16 opt-in leg
# lives in scripts/box_precision_ab.py)
run --workload box --size 256
# jacobi2d: f32 and bf16 rings (binder check)
run --workload jacobi2d
run --workload jacobi2d --backend stream --ring-storage bfloat16
# hdiff structural check
run --workload hdiff

echo "=== done ===" | tee -a "$OUT"
