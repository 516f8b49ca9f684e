#!/usr/bin/env python
"""Autotune the canonical workloads on the attached chip and compare the
measured winners against compile_chain_best's heuristic policy.

    python scripts/autotune_canonical.py [--quick] [--only NAME ...]

Prints one JSON line per workload: the policy's choice, the measured
winner, and the measured gap — the validation study for `--backend auto`
(RESULTS.md records the outcome).
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--only", nargs="*", default=None)
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()

    import jax

    import stencilflow_tpu as sft
    from stencilflow_tpu.autotune import autotune
    from stencilflow_tpu.backend import compile_chain_best
    from stencilflow_tpu.synthesize import jacobi, synthesize_stencil

    interpret = jax.devices()[0].platform != "tpu"
    rows = ([("jacobi_64_8", jacobi(3, 16, iterations=8))]
            if args.quick else [
        ("jacobi_512_8", jacobi(3, 512, iterations=8)),
        ("jacobi_128_8", jacobi(3, 128, iterations=8)),
        ("shallow_256_2", jacobi(3, 256, iterations=2)),
        ("hotspot_256_8", synthesize_stencil(
            num_stages=8, dimensions=(256,) * 3, shape="hotspot")),
        ("hdiff_256", synthesize_stencil(
            num_stages=8, dimensions=(256,) * 3, shape="hdiff")),
        ("box_128_8", synthesize_stencil(
            num_stages=8, dimensions=(128,) * 3, shape="box", extent=2)),
    ])
    fails = 0
    for name, spec in rows:
        if args.only and name not in args.only:
            continue
        p = sft.parse_program(spec, name=name)
        _fn, policy = compile_chain_best(p, interpret=interpret)
        try:
            res = autotune(p, trials=args.trials, interpret=interpret)
        except Exception as e:  # noqa: BLE001 — record and continue
            print(json.dumps({"workload": name, "policy": policy,
                              "error": f"{type(e).__name__}: {e}"}))
            fails += 1
            continue
        finite = {l: t for l, t in res.timings.items()
                  if np.isfinite(t)}
        policy_key = next(
            (l for l in finite
             if l == policy or l.startswith(policy + ":")), None)
        gap = (finite[policy_key] / res.seconds
               if policy_key is not None else None)
        print(json.dumps({
            "workload": name,
            "policy": policy,
            "winner": res.label,
            "winner_gcell_s": round(
                p.total_elements / res.seconds / 1e9, 3),
            "policy_vs_winner": round(gap, 4) if gap else None,
            "timings_ms": {l: round(t * 1e3, 3) for l, t in
                           sorted(finite.items())},
        }))
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
