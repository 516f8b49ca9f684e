"""A/B: rows+overlap vs rows+panel vs j-tiled stream on deep 2-D chains.

Hypothesis (round 3): at depth 8 the 2-D paths all sit at ~16 GCell/s
= ~0.35 of the pass-rate bound while the 3-D panel path reaches 0.73 —
the rotated panel's per-read ring-pair concats are the suspect.  The
overlap lowering reads every intermediate as a static slice of an
i-overlapped block (no rings), at the cost of (B+2H)/B recompute —
12.5% at B=128, H=8.  Same differenced-loop timing as bench.py.

Legs: rows+overlap per panel size, rows+panel per panel size, and the
j-tiled stream default.

Usage: python scripts/rows_overlap_ab.py [--size 8192] [--iters 8]
       [--bs 128,256]
"""
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
    ap.add_argument("--bs", type=str, default="128,256")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import stencilflow_tpu as sft
    from stencilflow_tpu.backend import compile_chain_rows
    from stencilflow_tpu.synthesize import jacobi

    on_tpu = jax.devices()[0].platform != "cpu"
    size = args.size if on_tpu else 64
    program = sft.parse_program(
        jacobi(2, size, iterations=args.iters),
        name=f"jacobi2d_{size}_{args.iters}itr")
    cells = float(np.prod(program.dimensions))

    inputs = sft.load_input_arrays(program, seed=0)
    in_name = next(iter(program.inputs))
    out_name = program.outputs[0]
    a0 = jnp.asarray(inputs[in_name])
    rest = {k: jnp.asarray(v) for k, v in inputs.items() if k != in_name}

    def time_fn(fn, label):
        @jax.jit
        def loop(r):
            def body(_, x):
                y = fn({in_name: x, **rest})[out_name]
                return fn({in_name: y, **rest})[out_name]
            return jax.lax.fori_loop(0, r, body, a0).sum()

        def timed(reps, trials):
            np.asarray(loop(reps))
            best = float("inf")
            for _ in range(trials):
                t0 = time.perf_counter()
                np.asarray(loop(reps))
                best = min(best, time.perf_counter() - t0)
            return best

        if not on_tpu:
            small, big, trials = 1, 2, 2
        else:
            small, big, trials = 2, 6, 5
        dt = timed(big, trials) - timed(small, trials)
        if dt <= 0:
            # differenced timing assumes dt > 0; the tunnel's ±5-8% noise
            # can produce a near-zero or negative delta on short runs
            print(f"{label}: unstable (dt<=0), rerun", flush=True)
            return None
        apps = 2 * (big - small)
        gcells = cells * apps / dt / 1e9
        print(f"{label}: {gcells:.2f} GCell/s", flush=True)
        return gcells

    for inner in ("overlap", "panel"):
        for b in [int(x) for x in args.bs.split(",") if x]:
            try:
                fn, name = compile_chain_rows(program, backend=inner,
                                              panel=b, gate_frac=1.0,
                                              interpret=not on_tpu)
                time_fn(fn, f"rows+{inner} B={b} ({name})")
            except ValueError as e:
                print(f"rows+{inner} B={b}: SKIP ({e})", flush=True)
    try:
        from stencilflow_tpu.backend.stream import compile_chain_stream
        fn = compile_chain_stream(program, interpret=not on_tpu)
        time_fn(fn, "stream (j-tiled)")
    except ValueError as e:
        print(f"stream: SKIP ({e})", flush=True)


if __name__ == "__main__":
    main()
