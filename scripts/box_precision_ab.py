#!/usr/bin/env python
"""On-chip A/B of MXU band-transform precision modes (round 3).

Times the canonical box-r2 chain through the streaming backend at each
``mxu_precision`` — "split" (2-3 bf16 passes, near-f32), "bf16"
(single pass, bf16-level error, opt-in), "exact" (f32 HIGHEST) — with
the corrected two-applications-per-iteration loop bodies (CLAUDE.md
methodology; scripts/loop_copy_probe.py).  Also reports each mode's
max relative error vs the numpy oracle on a small grid so the speed /
accuracy tradeoff is printed side by side.

    python scripts/box_precision_ab.py --size 256 --iters 8
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--trials", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import stencilflow_tpu as sft
    from stencilflow_tpu.backend.stream import compile_chain_stream
    from stencilflow_tpu.synthesize import synthesize_stencil

    on_tpu = jax.devices()[0].platform != "cpu"
    print(f"device: {jax.devices()[0].device_kind}", flush=True)

    # accuracy leg (small grid, oracle-comparable)
    small = sft.parse_program(
        synthesize_stencil(num_stages=args.iters, dimensions=(24, 32, 32),
                           shape="box", extent=2, seed_data="random:1,2"),
        name=f"boxab_acc_{args.iters}")
    sinputs = sft.load_input_arrays(small, seed=0)
    oracle = np.asarray(
        sft.run_interpreter(small, sinputs)[small.outputs[0]], np.float64)

    program = sft.parse_program(
        synthesize_stencil(num_stages=args.iters,
                           dimensions=(args.size,) * 3, shape="box",
                           extent=2),
        name=f"boxab_{args.size}_{args.iters}")
    inputs = sft.load_input_arrays(program, seed=0)
    in_name = next(iter(program.inputs))
    out_name = program.outputs[0]
    a = jnp.asarray(inputs[in_name])
    cells = float(np.prod(program.dimensions))

    for mode in ("split", "bf16", "exact"):
        fn = compile_chain_stream(program, mxu_precision=mode,
                                  interpret=not on_tpu)
        sfn = compile_chain_stream(small, mxu_precision=mode,
                                   interpret=not on_tpu)
        got = np.asarray(sfn({k: jnp.asarray(v)
                              for k, v in sinputs.items()})[small.outputs[0]],
                         np.float64)
        relerr = np.max(np.abs(got - oracle)
                        / (np.maximum(np.abs(got), np.abs(oracle)) + 1e-10))

        @jax.jit
        def loop(r, fn=fn):
            def body(_, x):
                y = fn({in_name: x})[out_name]
                return fn({in_name: y})[out_name]
            return jax.lax.fori_loop(0, r, body, a).sum()

        def timed(reps):
            np.asarray(loop(reps))
            best = float("inf")
            for _ in range(args.trials):
                t0 = time.perf_counter()
                np.asarray(loop(reps))
                best = min(best, time.perf_counter() - t0)
            return best

        big = int(max(6, round(8 * (256**3 / cells))))
        sm = max(2, big // 4)
        dt = (timed(big) - timed(sm)) / (2 * (big - sm))
        print(json.dumps({
            "mode": mode, "gcell_s": round(cells / dt / 1e9, 3),
            "ms_per_app": round(dt * 1e3, 3),
            "max_rel_err_vs_oracle": float(f"{relerr:.3e}"),
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
