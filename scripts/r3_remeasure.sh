#!/bin/bash
# Round-3 re-measurement after the fori_loop carry-copy harness fix
# (scripts/loop_copy_probe.py, RESULTS.md).  Waits for the TPU relay,
# then re-runs the headline benchmarks + canonical sweep with the
# corrected 2-apps-per-iteration timing bodies.
set -u
cd /root/repo
LOG=results/r3_remeasure.log
mkdir -p results

until timeout 90 python -c "import jax, numpy as np, jax.numpy as jnp; np.asarray(jnp.ones((8,8))+1)" >/dev/null 2>&1; do
  echo "relay down $(date)" | tee -a "$LOG"
  sleep 120
done
echo "relay UP $(date)" | tee -a "$LOG"

{
  echo "=== headline jacobi3d 512^3 x8 ==="
  python bench.py
  echo "=== hotspot 256^3 x8 ==="
  python bench.py --workload hotspot
  echo "=== box 128^3 x8 (MXU) ==="
  python bench.py --workload box
  echo "=== hdiff 256^3 x8 ==="
  python bench.py --workload hdiff
  echo "=== jacobi2d 8192^2 x8 ==="
  python bench.py --workload jacobi2d
  echo "=== canonical perf sweep ==="
  python scripts/perf_sweep.py -o results/r3_perf_sweep.jsonl
  echo "=== stateless panel probe (vs ring overlap) ==="
  python scripts/stateless_panel_probe.py
  echo "=== done $(date) ==="
} 2>&1 | tee -a "$LOG"
