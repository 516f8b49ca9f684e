#!/usr/bin/env python
"""Standard performance sweep: the canonical workload table on one chip.

Runs each configuration through the auto-selected backend (or an explicit
one) with bench.py's on-device loop-differencing method and prints one
JSON line per row plus a final markdown table — the reproducible source
of RESULTS.md's numbers.

    python scripts/perf_sweep.py                # full table (TPU, ~30 min)
    python scripts/perf_sweep.py --quick        # tiny sizes (CPU smoke)
    python scripts/perf_sweep.py --only jacobi_512_8 shallow_256_2
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def configs(quick: bool):
    """(name, workload, size, iters) rows; sizes shrink under --quick."""
    if quick:
        return [
            ("jacobi_32_8", "jacobi", 32, 8),
            ("shallow_32_2", "jacobi", 32, 2),
            ("hotspot_16_4", "hotspot", 16, 4),
        ]
    return [
        ("jacobi_512_8", "jacobi", 512, 8),     # headline
        ("jacobi_256_8", "jacobi", 256, 8),
        ("jacobi_128_8", "jacobi", 128, 8),
        ("shallow_256_2", "jacobi", 256, 2),
        ("shallow_512_2", "jacobi", 512, 2),
        ("hotspot_256_8", "hotspot", 256, 8),
        ("hdiff_256_8", "hdiff", 256, 8),
        ("box_128_8", "box", 128, 8),
        ("jacobi2d_8192_8", "jacobi2d", 8192, 8),
    ]


def build_program(workload, size, iters):
    import stencilflow_tpu as sft
    from stencilflow_tpu.synthesize import jacobi, synthesize_stencil
    if workload == "jacobi":
        return sft.parse_program(jacobi(3, size, iterations=iters),
                                 name=f"ps_j3d_{size}_{iters}")
    if workload == "jacobi2d":
        return sft.parse_program(jacobi(2, size, iterations=iters),
                                 name=f"ps_j2d_{size}_{iters}")
    shape = {"hotspot": "hotspot", "hdiff": "hdiff", "box": "box"}[workload]
    extent = 2 if workload == "box" else 1
    return sft.parse_program(
        synthesize_stencil(num_stages=iters, dimensions=(size,) * 3,
                           shape=shape, extent=extent),
        name=f"ps_{workload}_{size}_{iters}")


def bench(program, fn, on_tpu, trials=5):
    import jax
    import jax.numpy as jnp
    import stencilflow_tpu as sft
    inputs = sft.load_input_arrays(program, seed=0)
    in_name = next(iter(program.inputs))
    out_name = program.outputs[0]
    a = jnp.asarray(inputs[in_name])
    rest = {k: jnp.asarray(v) for k, v in inputs.items() if k != in_name}
    cells = float(np.prod(program.dimensions))

    # two applications per iteration: a single-application body pays a
    # full extra HBM round-trip copying the output into the pinned carry
    # buffer (scripts/loop_copy_probe.py; CLAUDE.md methodology rule)
    @jax.jit
    def loop(r):
        def body(_, x):
            y = fn({in_name: x, **rest})[out_name]
            return fn({in_name: y, **rest})[out_name]
        return jax.lax.fori_loop(0, r, body, a).sum()

    if on_tpu:
        big = int(min(1920, max(15, round(15 * (512 ** 3 / cells)))))
        small = max(3, big // 5)
    else:
        big, small, trials = 5, 1, 3

    def t(r):
        np.asarray(loop(r))   # warm-up with host readback (tunnel!)
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            np.asarray(loop(r))
            best = min(best, time.perf_counter() - t0)
        return best

    dt = (t(big) - t(small)) / (2 * (big - small))
    return cells / dt / 1e9, dt


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="tiny sizes for a CPU smoke run")
    ap.add_argument("--backend", default="auto",
                    choices=["auto", "stream", "panel", "overlap"])
    ap.add_argument("--only", nargs="*", default=None,
                    help="subset of config names")
    ap.add_argument("-o", "--output", default=None,
                    help="also append JSON lines to this file")
    ap.add_argument("--sessions", type=int, default=1,
                    help="repeat the whole differenced measurement N"
                         " times per config and report median + spread"
                         " (VERDICT r4 #3: single best-of-5 readings"
                         " at 8192^2 / <=128^3 swing beyond the +-5-8%"
                         " band); accumulate runs hours apart via"
                         " --output and scripts/session_stats.py")
    ap.add_argument("--session-gap", type=float, default=0.0,
                    help="seconds between sessions")
    args = ap.parse_args()

    import jax
    import stencilflow_tpu as sft  # noqa: F401
    from stencilflow_tpu.backend import compile_chain_best
    from stencilflow_tpu.report import Report
    on_tpu = jax.devices()[0].platform != "cpu"

    rows = []
    for name, workload, size, iters in configs(args.quick):
        if args.only and name not in args.only:
            continue
        program = build_program(workload, size, iters)
        try:
            if args.backend == "auto":
                fn, backend = compile_chain_best(program)
            else:
                from stencilflow_tpu.backend.overlap import \
                    compile_chain_overlap
                from stencilflow_tpu.backend.panel import compile_chain_panel
                from stencilflow_tpu.backend.stream import \
                    compile_chain_stream
                maker = {"panel": compile_chain_panel,
                         "overlap": compile_chain_overlap,
                         "stream": compile_chain_stream}[args.backend]
                fn, backend = maker(program), args.backend
            vals, dts = [], []
            for s in range(max(1, args.sessions)):
                if s and args.session_gap:
                    time.sleep(args.session_gap)
                gcell, dt = bench(program, fn, on_tpu)
                vals.append(gcell)
                dts.append(dt)
            gcell = float(np.median(vals))
            dt = float(np.median(dts))
            vs = (Report.build(program).roofline_time_s() / dt
                  if on_tpu else None)
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            print(json.dumps({"config": name, "error":
                              f"{type(e).__name__}: {str(e)[:120]}"}),
                  flush=True)
            continue
        row = {"config": name, "backend": backend,
               "gcell_s": round(gcell, 2),
               "vs_roofline": round(vs, 4) if vs is not None else None,
               "ts": time.strftime("%Y-%m-%dT%H:%M:%S")}
        if args.sessions > 1:
            sv = sorted(round(v, 2) for v in vals)
            row["session_values"] = sv
            row["spread_pct"] = round(100 * (sv[-1] - sv[0]) / gcell, 1)
        rows.append(row)
        print(json.dumps(row), flush=True)
        if args.output:
            with open(args.output, "a") as f:
                f.write(json.dumps(row) + "\n")

    print("\n| config | backend | GCell/s | vs roofline |")
    print("|---|---|---|---|")
    for r in rows:
        vs = f"{r['vs_roofline']:.3f}" if r["vs_roofline"] else "—"
        print(f"| {r['config']} | {r['backend']} | {r['gcell_s']} | {vs} |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
