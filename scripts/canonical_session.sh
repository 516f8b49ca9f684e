#!/bin/bash
# One measurement SESSION of the canonical workload table (VERDICT r4 #3:
# variance-aware protocol).  Run this several times, hours apart, then
# aggregate with scripts/session_stats.py to get median +- spread per
# cell.  Each bench.py invocation below uses --sessions 1 so a "session"
# is one well-separated protocol run; the within-run best-of-5
# differencing is unchanged.
#
#   bash scripts/canonical_session.sh results/sessions_r5.jsonl
#   python scripts/session_stats.py results/sessions_r5.jsonl
set -u
LOG="${1:-results/sessions_r5.jsonl}"
mkdir -p "$(dirname "$LOG")"

run() {
  echo "=== $* ===" >&2
  timeout 570 python bench.py --sessions 1 --append-log "$LOG" "$@" 2>&1 \
    | tail -1
}

# canonical exact-mode cells (winning backends per RESULTS.md r4/r5)
run --workload jacobi --backend panel                    # headline 512^3 x8
run --workload jacobi2d --backend stream                 # 8192^2 x8 j-tiled
run --workload jacobi2d --backend rows --rows-backend group \
    --group-size 8 --panel 64                            # r5 exact winner
run --workload hdiff --backend panel
run --workload hotspot --backend panel
run --workload box --size 256                            # auto: composed MXU
                                                         # (256^3 criterion
                                                         # size; 128^3 swings
                                                         # +-25% day-to-day)
# opt-in cells (documented reduced-precision envelopes)
run --workload jacobi --backend panel --ring-storage bfloat16
run --workload jacobi2d --backend stream --ring-storage bfloat16
run --workload box --size 256 --mxu-precision bf16      # 1-pass MXU
