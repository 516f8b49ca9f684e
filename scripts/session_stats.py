#!/usr/bin/env python
"""Aggregate benchmark sessions into a median +- spread table.

Input: one or more JSONL files produced by `bench.py --append-log` or
`scripts/perf_sweep.py -o` — each line a measurement record carrying
either {"metric": ..., "value": ...} (bench.py) or {"config": ...,
"gcell_s": ...} (perf_sweep), plus a "ts" timestamp.  Lines with
"session_values" contribute every session reading.

Output: per metric/config — session count, median, min, max, spread%
(max-min over median), and the time span covered.  This is the
variance-aware canonical protocol (VERDICT r4 #3): a table cell is only
as credible as its measured cross-session spread, and the r3->r4
jacobi2d contradiction (20.4 vs 15.5, identical plan) showed the
single-day best-of-5 protocol under-reports the tunnel's true band at
8192^2 and <=128^3.

    python bench.py --append-log runs.jsonl           # hours apart, xN
    python scripts/session_stats.py runs.jsonl
"""
import json
import sys
from collections import defaultdict


def main(paths):
    groups = defaultdict(list)   # key -> [(ts, value)]
    for path in paths:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    rec = json.loads(line)
                except ValueError:
                    continue
                key = rec.get("metric") or rec.get("config")
                if key is None:
                    continue
                ts = rec.get("ts", "")
                vals = rec.get("session_values")
                if vals:
                    groups[key].extend((ts, float(v)) for v in vals)
                else:
                    v = rec.get("value", rec.get("gcell_s"))
                    if v is not None:
                        groups[key].append((ts, float(v)))

    print("| metric | n | median | min | max | spread% | span |")
    print("|---|---|---|---|---|---|---|")
    for key in sorted(groups):
        entries = groups[key]
        vals = sorted(v for _, v in entries)
        n = len(vals)
        med = vals[n // 2] if n % 2 else 0.5 * (vals[n // 2 - 1]
                                                + vals[n // 2])
        spread = 100.0 * (vals[-1] - vals[0]) / med if med else 0.0
        tss = sorted(ts for ts, _ in entries if ts)
        span = f"{tss[0][:16]}..{tss[-1][:16]}" if tss else "-"
        print(f"| {key} | {n} | {med:.2f} | {vals[0]:.2f} | "
              f"{vals[-1]:.2f} | {spread:.1f} | {span} |")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:] or ["runs.jsonl"]))
