#!/bin/bash
# Round-3 queued chip studies: waits for the axon relay to come back,
# then runs the A/Bs blocked by the outage.  Appends to
# results/r3_relay_queue.log.
set -u
cd /root/repo
LOG=results/r3_relay_queue.log
mkdir -p results

echo "=== waiting for relay $(date -u) ===" >> "$LOG"
until timeout 90 python -c "
import jax, numpy as np, jax.numpy as jnp
assert jax.devices()[0].platform != 'cpu'
np.asarray((jnp.ones((8,8))+1).ravel()[0])
" >/dev/null 2>&1; do
  sleep 120
done
echo "=== relay up $(date -u) ===" >> "$LOG"

{
  echo "=== panel interior-split A/B (jacobi/hotspot/hdiff) ==="
  timeout 3000 python scripts/panel_isplit_ab.py
  echo "=== MXU precision A/B (split/bf16/exact) 256^3 x8 (concat guard in) ==="
  timeout 1800 python scripts/box_precision_ab.py --size 256 --iters 8
  echo "=== headline bench (post-isplit) ==="
  timeout 1200 python bench.py
  echo "=== box criterion bench (post concat guard) ==="
  timeout 1200 python bench.py --workload box --size 256
  echo "=== done $(date -u) ==="
} >> "$LOG" 2>&1
