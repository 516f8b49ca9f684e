#!/usr/bin/env python
"""A/B: overlap panel size vs the vmem limit at big planes.

At J=K=768 a 2-stage chain's overlap state at B=4 is ~86 MB (over the
0.7-budget gate, slow vmem-limit regime), while B=2 fits the fast
64 MiB limit.  Measured outcome (RESULTS.md round 2): B=4 wins by 1.3x
— halo amortization ((B+2H)/B recompute + re-reads) dominates, and the
fast-vs-slow vmem limit is worth only ~3.5% to this kernel.  The auto
selector therefore never steps the panel down; this script documents
the measurement.

    python scripts/overlap_vmem_ab.py [--size 768] [--planes 128]
"""
import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=768)
    ap.add_argument("--planes", type=int, default=128)
    ap.add_argument("--stages", type=int, default=2)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--long", type=int, default=42)
    args = ap.parse_args()

    import jax.numpy as jnp
    import jax

    import stencilflow_tpu as sft
    from stencilflow_tpu.backend.overlap import compile_chain_overlap
    from stencilflow_tpu.synthesize import synthesize_stencil

    Ic, S = args.planes, args.size
    p = sft.parse_program(
        synthesize_stencil(num_stages=args.stages, dimensions=(Ic, S, S),
                           shape="diffusion"),
        name=f"ovab_{Ic}_{S}")
    in_name = next(iter(p.inputs))
    out_name = p.outputs[0]
    x0 = jnp.asarray(np.random.default_rng(0).random(
        (Ic, S, S), dtype=np.float32))
    cells = float(Ic * S * S)

    def loop_time(one, x0, n):
        @functools.partial(jax.jit, static_argnums=1)
        def loop(x, n):
            return jax.lax.fori_loop(0, n, lambda _, t: one(t), x)

        def timed(n):
            t0 = time.perf_counter()
            r = loop(x0, n)
            np.asarray(r.ravel()[0])   # scalar readback (index on device)
            return time.perf_counter() - t0

        timed(2)
        timed(n)
        best = min(timed(n) - timed(2) for _ in range(args.reps))
        return best / (n - 2)

    from stencilflow_tpu import config
    for label, panel, budget in (
            ("small-panel-fast-limit", 2, config.TPU_STREAM_VMEM_BUDGET),
            # large case bypasses the 0.7*budget gate so the slow
            # (>=96 MiB) vmem_limit regime is actually measured
            ("large-panel-slow-limit", 4, config.TPU_VMEM_PHYSICAL * 2)):
        fn = compile_chain_overlap(p, panel=panel, vmem_budget=budget)
        chosen = compile_chain_overlap.last_config["panel"]

        def one(t, fn=fn):
            return fn({in_name: t})[out_name].astype(t.dtype)

        t = loop_time(one, x0, args.long)
        print(json.dumps({"case": label, "panel": chosen,
                          "shape": [Ic, S, S], "stages": args.stages,
                          "s_per_sweep": round(t, 5),
                          "gcell_s": round(cells / t / 1e9, 2)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
