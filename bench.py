#!/usr/bin/env python
"""Headline benchmark: jacobi3d 8-iteration chain, GCell/s per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "GCell/s", "vs_baseline": N}

``vs_baseline`` is the fraction of the single-chip HBM roofline achieved
(minimum traffic for the fused chain = read every input + write every output
exactly once — the reference's minimum-communication-volume model,
/root/reference/stencilflow/kernel_chain_graph.py:749-768 — at the chip's HBM
bandwidth).  The reference repo publishes no measured numbers (BASELINE.md),
so roofline fraction is the honest comparator.
"""
import argparse
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=None,
                    help="cubic domain edge (default: 384 on TPU, 64 on CPU)")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--backend", default="auto",
                    choices=["auto", "pallas", "xla"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import stencilflow_tpu as sft
    from stencilflow_tpu.config import TPU_HBM_BANDWIDTH
    from stencilflow_tpu.data import load_input_arrays
    from stencilflow_tpu.synthesize import jacobi

    on_tpu = jax.devices()[0].platform != "cpu"
    size = args.size or (384 if on_tpu else 64)

    program = sft.parse_program(
        jacobi(3, size, iterations=args.iters),
        name=f"jacobi3d_{size}_{args.iters}itr")

    backend = args.backend
    fn = None
    if backend in ("auto", "pallas"):
        try:
            from stencilflow_tpu.backend.pallas import compile_chain_pallas
            fn = compile_chain_pallas(program)
            backend = "pallas"
        except Exception as e:  # noqa: BLE001
            if args.backend == "pallas":
                raise
            print(f"# pallas backend unavailable ({e}); falling back to xla",
                  file=sys.stderr)
            fn = None
    if fn is None:
        from stencilflow_tpu.backend.xla import compile_chain
        fn = compile_chain(program, strategy="tile")
        backend = "xla"

    inputs = {k: jnp.asarray(v)
              for k, v in load_input_arrays(program, seed=0).items()}
    out = fn(inputs)          # compile + warm up
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(args.reps):
        out = fn(inputs)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / args.reps

    cells = float(np.prod(program.dimensions))
    gcell_s = cells / dt / 1e9

    itemsize = 4
    min_bytes = 2 * cells * itemsize  # one input read + one output write
    roofline_s = min_bytes / TPU_HBM_BANDWIDTH
    vs = roofline_s / dt if on_tpu else float("nan")

    print(json.dumps({
        "metric": f"jacobi3d_{size}^3_{args.iters}itr_{backend}"
                  f"_{jax.devices()[0].platform}",
        "value": round(gcell_s, 3),
        "unit": "GCell/s",
        "vs_baseline": round(vs, 4) if vs == vs else None,
    }))


if __name__ == "__main__":
    main()
