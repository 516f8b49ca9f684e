#!/usr/bin/env python
"""On-chip A/Bs for the two interior-split knobs on large 2-D planes.

1. stream TILE_INTERIOR_SPLIT: j-tiled grids evaluate each stage under
   interior/edge pl.when regions; interior tiles skip the origin-based
   OOB mask chains (predicted from the mask arithmetic: jacobi2d pays
   ~16 selects + 2 iota-mask builds per tile over 40 source ops).
2. panel INTERIOR_SPLIT on the ROTATED rows path: rows+panel B=64 at
   8192^2 x8 measured 19.45 pre-split but 16.1 post-split — suspect the
   split hurts the many-small-panels regime.

    python scripts/tile_split_ab.py [--quick] [--case stream|rows|all]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--case", default="all",
                    choices=["stream", "rows", "all"])
    args = ap.parse_args()

    import jax
    from perf_sweep import bench, build_program
    from stencilflow_tpu.backend import compile_chain_rows
    from stencilflow_tpu.backend import panel as panel_mod
    from stencilflow_tpu.backend import stream as stream_mod
    from stencilflow_tpu.backend.stream import compile_chain_stream

    on_tpu = jax.devices()[0].platform != "cpu"
    size = 256 if args.quick else 8192
    deep = build_program("jacobi2d", size, 8)

    if args.case in ("stream", "all"):
        row = {"workload": f"jacobi2d_{size}_8_stream_jtiled"}
        for split in (True, False):
            stream_mod.TILE_INTERIOR_SPLIT = split
            try:
                kw = {} if not args.quick else {"vmem_budget": 1 << 20}
                fn = compile_chain_stream(deep, interpret=not on_tpu, **kw)
                assert compile_chain_stream.last_config["jtiles"] > 1
                gcs, _ = bench(deep, fn, on_tpu)
                row["tsplit_on" if split else "tsplit_off"] = round(gcs, 2)
            finally:
                stream_mod.TILE_INTERIOR_SPLIT = True
        if row.get("tsplit_off"):
            row["speedup"] = round(row["tsplit_on"] / row["tsplit_off"], 4)
        print(json.dumps(row), flush=True)

    if args.case in ("rows", "all"):
        row = {"workload": f"jacobi2d_{size}_8_rows_B64"}
        B = 8 if args.quick else 64
        for split in (True, False):
            panel_mod.INTERIOR_SPLIT = split
            try:
                fn, _ = compile_chain_rows(deep, interpret=not on_tpu,
                                           panel=B, backend="panel",
                                           gate_frac=1.0)
                gcs, _ = bench(deep, fn, on_tpu)
                row["isplit_on" if split else "isplit_off"] = round(gcs, 2)
            finally:
                panel_mod.INTERIOR_SPLIT = True
        if row.get("isplit_off"):
            row["speedup"] = round(row["isplit_on"] / row["isplit_off"], 4)
        print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
