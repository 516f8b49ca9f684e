#!/bin/bash
# Follow-up chip studies after r3_remeasure.sh: waits for its "=== done"
# marker, then runs the targeted A/Bs the re-measurement exposed.
set -u
cd /root/repo
LOG=results/r3_followup.log
mkdir -p results

until grep -q "=== done" results/r3_remeasure.log 2>/dev/null; do
  sleep 60
done

{
  echo "=== box 256^3 x8 (VERDICT #5 criterion size) ==="
  python bench.py --workload box --size 256
  echo "=== MXU precision A/B (split/bf16/exact) 256^3 x8 ==="
  python scripts/box_precision_ab.py --size 256 --iters 8
  echo "=== jacobi2d 8192^2 x8: rows backend A/B ==="
  python bench.py --workload jacobi2d --backend rows
  echo "=== jacobi2d 8192^2 x8: panel via rows (B=32) ==="
  python bench.py --workload jacobi2d --backend rows --panel 32
  echo "=== autotune-vs-policy canonical table ==="
  python scripts/autotune_canonical.py
  echo "=== done $(date) ==="
} 2>&1 | tee -a "$LOG"
