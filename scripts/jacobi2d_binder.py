"""Pin the jacobi2d 8192^2 x8 binder (VERDICT r3 next #2).

Round-3 left the canonical 2-D workload at 20.4 GCell/s = "0.20 of the
HBM roofline" without naming what actually binds.  Candidates:

  (a) HBM       — 8 bytes/cell-chain at the measured ~670 GB/s pipe
                  => ~84 GCell/s.  20.4 << 84, so HBM is NOT binding.
  (b) VPU pass  — 8 stages x 4 weighted ops = 32 ops/cell-chain at the
                  1.85e12 serial pass rate => 57.8.  Still far above.
  (c) VPU shape — the measured issue rate of the ACTUAL stage shape
                  (4-term sum over 3 distinct loaded operands + carry,
                  expr_jac2d in vpu_ceiling.py).  The 3-D analogue
                  (expr_jac, 6 operands) measured 1.24e12, well under
                  the serial-chain pass rate — load-heavy low-intensity
                  sums bind on VMEM operand passes.
  (d) j-tiling  — halo re-reads inflate compute by plane_j/core_j.

This script measures (c) on chip, reads (d) from the planner, times the
real kernel same-day, and prints every fraction.  The binder is named
by whichever bound the kernel sits nearest (>= 0.5 is the done-bar).

Usage: python scripts/jacobi2d_binder.py [--size 8192] [--iters 8]
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
    ap.add_argument("--size", type=int, default=8192)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--skip-probe", action="store_true",
                    help="reuse a known expr_jac2d rate instead of "
                         "re-measuring (tunnel time saver)")
    ap.add_argument("--probe-rate", type=float, default=None,
                    help="issues/s for the expr_jac2d shape (with "
                         "--skip-probe)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import stencilflow_tpu as sft
    from stencilflow_tpu import config
    from stencilflow_tpu.backend.stream import compile_chain_stream
    from stencilflow_tpu.synthesize import jacobi

    on_tpu = jax.devices()[0].platform != "cpu"
    if not on_tpu:
        print("needs the TPU (shape probe + kernel timing)")
        return 1
    size, iters = args.size, args.iters
    program = sft.parse_program(jacobi(2, size, iterations=iters),
                                name=f"jacobi2d_{size}_{iters}itr")
    cells = float(np.prod(program.dimensions))
    ops_per_cell = 4.0 * iters          # 3 adds + 1 mul per stage

    # --- (c) the stage-shape issue rate ------------------------------------
    if args.skip_probe and args.probe_rate:
        shape_rate = args.probe_rate
    else:
        from vpu_ceiling import time_op
        rng = np.random.default_rng(0)
        from vpu_ceiling import COLS, ROWS
        x = jnp.asarray(rng.uniform(0.5, 1.0, (ROWS, COLS)), jnp.float32)
        dt = time_op("expr_jac2d", 64, x)
        shape_rate = 64 * 4 * ROWS * COLS / dt
    print(f"expr_jac2d shape rate: {shape_rate/1e12:.3f} Tissue/s "
          f"({shape_rate/(8*128)/940e6:.2f} issues/lane/cycle)", flush=True)

    # --- (d) the planner's j-tiling inflation -------------------------------
    fn = compile_chain_stream(program)
    cfg = compile_chain_stream.last_config
    jtiles = cfg.get("jtiles", 1)
    halo = cfg.get("halo_jk") or (0, 0)
    tile = cfg.get("tile_jk") or (program.dimensions[1],
                                  program.dimensions[2])
    inflation = (tile[0] + 2 * halo[0]) / tile[0]
    print(f"plan: jtiles={jtiles} tile_jk={tile} halo_jk={halo} "
          f"compute inflation={inflation:.3f} cfg={cfg}", flush=True)

    # --- measured kernel (bench.py methodology) -----------------------------
    inputs = sft.load_input_arrays(program, seed=0)
    in_name = next(iter(program.inputs))
    out_name = program.outputs[0]
    a0 = jnp.asarray(inputs[in_name])
    rest = {k: jnp.asarray(v) for k, v in inputs.items() if k != in_name}

    @jax.jit
    def loop(r):
        def body(_, x_):
            y = fn({in_name: x_, **rest})[out_name]
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
        print("unstable timing (dt<=0), rerun")
        return 1
    meas = cells / dt / 1e9
    print(f"measured: {meas:.2f} GCell/s", flush=True)

    # --- the bound table -----------------------------------------------------
    hbm = 670e9 / 8 / 1e9                      # measured pipe, 8 B/cell-chain
    pas = config.TPU_VPU_PASS_RATE / ops_per_cell / 1e9
    issue = config.TPU_VPU_ELEMOPS / ops_per_cell / 1e9
    shape = shape_rate / ops_per_cell / 1e9
    shape_tiled = shape / inflation
    rows = [("hbm (measured 670 GB/s pipe)", hbm),
            ("vpu 4-ALU issue peak", issue),
            ("vpu serial pass rate", pas),
            ("vpu SHAPE rate (expr_jac2d)", shape),
            ("shape rate / tile inflation", shape_tiled)]
    print(f"\n{'bound':38s} {'GCell/s':>9s} {'measured/bound':>15s}")
    for name, b in rows:
        print(f"{name:38s} {b:9.1f} {meas/b:15.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
