#!/usr/bin/env python
"""On-chip A/B of the panel interior/boundary stage split (round 3).

The panel lowering splits each stage's ``pl.when`` region into interior
panels (every i-offset read provably in-range -> the global-i boundary
selects are elided) and edge panels (full masks).  For a jacobi-style
star stage the i-selects are ~2 of ~9.5 VPU pass-equivalents, so the
model predicts up to ~20% on select-heavy panel workloads; this script
measures it on the canonical panel-policy workloads with the corrected
two-applications-per-iteration harness (CLAUDE.md methodology).

    python scripts/panel_isplit_ab.py [--quick]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

import numpy as np

from perf_sweep import bench, build_program


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="shrink sizes (CPU smoke)")
    args = ap.parse_args()

    import jax
    from stencilflow_tpu.backend import panel as panel_mod
    from stencilflow_tpu.backend.panel import compile_chain_panel

    on_tpu = jax.devices()[0].platform != "cpu"
    sz = {"jacobi": 128 if args.quick else 512,
          "hotspot": 64 if args.quick else 256,
          "hdiff": 64 if args.quick else 256}
    for workload in ("jacobi", "hotspot", "hdiff"):
        program = build_program(workload, sz[workload], 8)
        row = {"workload": f"{workload}_{sz[workload]}_8"}
        for split in (True, False):
            panel_mod.INTERIOR_SPLIT = split
            try:
                fn = compile_chain_panel(program, interpret=not on_tpu)
                gcs, dt = bench(program, fn, on_tpu)
                row["isplit_on" if split else "isplit_off"] = round(gcs, 2)
            finally:
                panel_mod.INTERIOR_SPLIT = True
        if "isplit_on" in row and "isplit_off" in row and row["isplit_off"]:
            row["speedup"] = round(row["isplit_on"] / row["isplit_off"], 4)
        print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
