#!/usr/bin/env python
"""Price the jacobi2d rows-mode stage's read classes on chip.

The r4/r5 binder analysis says jacobi2d exact (16.9 GCell/s via
rows+group g=8, 0.29 of the pass-rate bound) is bound by "VPU shape rate
with k-shift materialization".  This probe holds the op count constant
(4 reads + 3 adds + 1 mul per stage, 8 stages) and swaps READ CLASSES:

  rows-only : a[i-1], a[i+1], a[i-2], a[i+2]   (4 static row slices)
  cross     : a[i-1], a[i+1], a[j-1], a[j+1]   (the real jacobi2d)
  k-only    : a[j-1], a[j+1], a[j-2], a[j+2]   (4 k shift_fills)

The rows-only minus k-only spread prices the k-shift materialization
directly; rows-only is the machinery+arith floor of this formulation.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def make(expr_terms, name, size, stages):
    import stencilflow_tpu as sft
    prog = {}
    prev = "a"
    for s in range(stages):
        cur = f"s{s}"
        terms = " + ".join(t.format(f=prev) for t in expr_terms)
        prog[cur] = {
            "computation_string": f"{cur} = 0.25 * ({terms})",
            "boundary_conditions": {prev: {"type": "constant",
                                           "value": 0.0}},
            "data_type": "float32"}
        prev = cur
    spec = {"inputs": {"a": {"data": "random:-1,1",
                             "data_type": "float32"}},
            "outputs": [prev], "dimensions": [size, size],
            "program": prog}
    return sft.parse_program(spec, name=name)


def main():
    import jax
    import jax.numpy as jnp
    import stencilflow_tpu as sft
    from stencilflow_tpu.backend import compile_chain_rows

    size, stages = 8192, 8
    cases = [
        ("rows-only", ["{f}[i-1, j]", "{f}[i+1, j]",
                       "{f}[i-2, j]", "{f}[i+2, j]"]),
        ("cross (jacobi2d)", ["{f}[i-1, j]", "{f}[i+1, j]",
                              "{f}[i, j-1]", "{f}[i, j+1]"]),
        ("k-only", ["{f}[i, j-1]", "{f}[i, j+1]",
                    "{f}[i, j-2]", "{f}[i, j+2]"]),
    ]
    cells = float(size * size)
    for label, terms in cases:
        p = make(terms, f"j2dprobe_{label.split()[0]}", size, stages)
        fn, bk = compile_chain_rows(p, backend="group", group=stages,
                                    panel=64)
        out_name = p.outputs[0]
        a0 = jnp.asarray(sft.load_input_arrays(p, seed=0)["a"])

        # bench.py methodology: the input is an ARGUMENT (not a jit
        # constant — an embedded 256 MB literal overflows the tunnel's
        # request cap), two applications per iteration, differenced
        @jax.jit
        def loop(r, a):
            def body(_, x):
                y = fn({"a": x})[out_name].reshape(a.shape)
                return fn({"a": y})[out_name].reshape(a.shape)
            return jax.lax.fori_loop(0, r, body, a).sum()

        def timed(reps, trials=5):
            np.asarray(loop(reps, a0))
            best = float("inf")
            for _ in range(trials):
                t0 = time.perf_counter()
                np.asarray(loop(reps, a0))
                best = min(best, time.perf_counter() - t0)
            return best

        big, small = 30, 6
        dt = (timed(big) - timed(small)) / (2 * (big - small))
        print(f"{label:20s} [{bk}] {cells / dt / 1e9:8.2f} GCell/s "
              f"({dt * 1e3:.2f} ms)", flush=True)


if __name__ == "__main__":
    main()
