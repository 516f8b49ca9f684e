"""A/B: composed vs per-stage MXU lowering on the box-r2 chain (VERDICT
r3 next #1/#6).

Composition collapses the 8 rank-1 box stages into one radius-16 banded
operator: ONE (L, R) transform per source plane instead of 8, an SMEM
i-weight table combining 33 transformed planes per output.  The study
model (scripts/compose_study.py) prices the ceiling move 5.9 -> 15.0
GCell/s (coarse) / report.mxu_model 10.7 -> 24.2 (executed-flops).

Legs: compiled correctness at 64^3 vs the oracle (first — the SMEM
dynamic-row table is new Mosaic surface), then differenced-loop timing at
the criterion size (bench.py methodology, two applications/iteration).

Usage: python scripts/box_compose_ab.py [--size 256] [--iters 8]
       [--t 0(auto),2,4] [--skip-check]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--legs", default="auto,off",
                    help="comma list of compose values to time")
    ap.add_argument("--precision", default="split",
                    help="comma list of mxu_precision legs "
                         "(split/bf16/exact) timed per compose leg")
    ap.add_argument("--skip-check", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import stencilflow_tpu as sft
    from stencilflow_tpu.backend.stream import compile_chain_stream
    from stencilflow_tpu.report import Report
    from stencilflow_tpu.synthesize import synthesize_stencil

    on_tpu = jax.devices()[0].platform != "cpu"
    if not on_tpu:
        print("needs the TPU")
        return 1

    # --- compiled correctness at small size ---------------------------------
    if not args.skip_check:
        ps = sft.parse_program(
            synthesize_stencil(num_stages=4, dimensions=(32, 32, 128),
                               shape="box", extent=2,
                               seed_data="random:0.0,1.0"),
            name="box_check")
        ins = sft.load_input_arrays(ps, seed=0)
        oracle = sft.run_interpreter(ps, ins)
        fn = compile_chain_stream(ps)
        cfg = compile_chain_stream.last_config
        out = fn({k: jnp.asarray(v) for k, v in ins.items()})
        o = ps.outputs[0]
        a, b = np.asarray(out[o]), np.asarray(oracle[o])
        err = np.abs(a - b).max() / max(1e-9, np.abs(b).max())
        print(f"compiled check: composed={list(cfg['composed'])} "
              f"err={err:.2e} {'OK' if err < 3e-5 else 'FAIL'}", flush=True)
        if err >= 3e-5:
            return 1

    # --- timing ---------------------------------------------------------------
    program = sft.parse_program(
        synthesize_stencil(num_stages=args.iters,
                           dimensions=(args.size,) * 3, shape="box",
                           extent=2),
        name=f"box3d_{args.size}_{args.iters}itr")
    cells = float(np.prod(program.dimensions))
    inputs = sft.load_input_arrays(program, seed=0)
    in_name = next(iter(program.inputs))
    out_name = program.outputs[0]
    a0 = jnp.asarray(inputs[in_name])
    rest = {k: jnp.asarray(v) for k, v in inputs.items() if k != in_name}

    rep = Report.build(program)
    print(f"model: bound={rep.bound()} roofline="
          f"{rep.roofline_gcell_s():.2f} GCell/s "
          f"(composed-aware)", flush=True)

    def time_leg(compose, label, precision="split"):
        try:
            fn = compile_chain_stream(program, compose=compose,
                                      mxu_precision=precision)
        except ValueError as e:
            print(f"{label}: SKIP ({e})", flush=True)
            return
        cfg = compile_chain_stream.last_config
        tag = (f"composed={list(cfg['composed'])} "
               f"sm={cfg['stage_major']} block={cfg['block']}")

        @jax.jit
        def loop(r):
            def body(_, x):
                y = fn({in_name: x, **rest})[out_name]
                return fn({in_name: y, **rest})[out_name]
            return jax.lax.fori_loop(0, r, body, a0).sum()

        def timed(reps, trials=5):
            np.asarray(loop(reps))
            best = float("inf")
            for _ in range(trials):
                t0 = time.perf_counter()
                np.asarray(loop(reps))
                best = min(best, time.perf_counter() - t0)
            return best

        big = int(min(1920, max(15, round(15 * (512**3 / cells)))))
        small = max(3, big // 5)
        dt = (timed(big) - timed(small)) / (2 * (big - small))
        if dt <= 0:
            print(f"{label}: unstable (dt<=0), rerun", flush=True)
            return
        g = cells / dt / 1e9
        print(f"{label} [{tag}]: {g:.2f} GCell/s "
              f"(bounds {rep.bound_fractions(dt)})", flush=True)

    for leg in args.legs.split(","):
        for prec in args.precision.split(","):
            time_leg(leg, f"compose={leg} prec={prec}", prec)
    return 0


if __name__ == "__main__":
    sys.exit(main())
