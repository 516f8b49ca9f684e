#!/usr/bin/env python
"""Chip sweep: shallow (2-stage) 512-cube — overlap panel x vmem-gate grid.

Round-2 frontier: jacobi3d 512^3 x2 sits at ~0.52 of the HBM roofline
(overlap auto-panel) while a zero-compute DMA passthrough measures 0.80.
At (128,768,768) the over-gate B=4 panel beat the stream fallback by
+18% (RESULTS.md), so this sweeps panel B x {gated, over-gate} budgets
at the 512-cube shallow point plus the plane streamer for reference.

    python scripts/shallow512_sweep.py [--size 512] [--stages 2]
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
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--stages", type=int, default=2)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--long", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import stencilflow_tpu as sft
    from stencilflow_tpu import config
    from stencilflow_tpu.backend.overlap import compile_chain_overlap
    from stencilflow_tpu.backend.stream import compile_chain_stream
    from stencilflow_tpu.synthesize import synthesize_stencil

    S = args.size
    p = sft.parse_program(
        synthesize_stencil(num_stages=args.stages, dimensions=(S, S, S),
                           shape="diffusion"),
        name=f"sh512_{S}_{args.stages}")
    in_name = next(iter(p.inputs))
    out_name = p.outputs[0]
    x0 = jnp.asarray(np.random.default_rng(0).random(
        (S, S, S), dtype=np.float32))
    cells = float(S) ** 3

    def loop_time(one, x0, n):
        # two applications per iteration (carry-copy rule, CLAUDE.md)
        @functools.partial(jax.jit, static_argnums=1)
        def loop(x, n):
            return jax.lax.fori_loop(0, n, lambda _, t: one(one(t)), x)

        def timed(n):
            t0 = time.perf_counter()
            r = loop(x0, n)
            np.asarray(r.ravel()[0])
            return time.perf_counter() - t0

        timed(2)
        timed(n)
        best = min(timed(n) - timed(2) for _ in range(args.reps))
        return best / (2 * (n - 2))

    cases = [("stream", None, None)]
    for b in (2, 4, 8):
        cases.append((f"overlap-B{b}-gated", b, config.TPU_STREAM_VMEM_BUDGET))
        cases.append((f"overlap-B{b}-overgate", b,
                      config.TPU_VMEM_PHYSICAL * 2))
    for label, panel, budget in cases:
        try:
            if panel is None:
                fn = compile_chain_stream(p)
                chosen = None
            else:
                fn = compile_chain_overlap(p, panel=panel, vmem_budget=budget)
                chosen = compile_chain_overlap.last_config["panel"]
        except Exception as e:
            print(json.dumps({"case": label, "error": str(e)[:200]}))
            continue

        def one(t, fn=fn):
            return fn({in_name: t})[out_name].astype(t.dtype)

        try:
            t = loop_time(one, x0, args.long)
        except Exception as e:
            print(json.dumps({"case": label, "error": str(e)[:200]}))
            continue
        print(json.dumps({"case": label, "panel": chosen,
                          "shape": [S, S, S], "stages": args.stages,
                          "s_per_sweep": round(t, 5),
                          "gcell_s": round(cells / t / 1e9, 2)}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
