#!/usr/bin/env python
"""Chain-depth scaling of the panel lowering (jacobi3d, one fused
streaming kernel per depth), on-device loop method.  Round-1 stream
held ~120-137 Gcell-stages/s flat to depth 64; round-2 panel measured
183/187 at depth 8/16 — this completes 32/64.

    python scripts/depth_scaling.py [--size 256] [--depths 8,16,32,64]
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
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--depths", type=str, default="8,16,32,64")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import stencilflow_tpu as sft
    from stencilflow_tpu.backend.panel import compile_chain_panel
    from stencilflow_tpu.synthesize import synthesize_stencil

    S = args.size
    cells = float(S ** 3)

    def loop_time(one, x0, n, reps):
        @functools.partial(jax.jit, static_argnums=1)
        def loop(x, n):
            return jax.lax.fori_loop(0, n, lambda _, t: one(t), x)

        def timed(n):
            t0 = time.perf_counter()
            r = loop(x0, n)
            np.asarray(r.ravel()[0])
            return time.perf_counter() - t0

        timed(2)
        timed(n)
        best = min(timed(n) - timed(2) for _ in range(reps))
        return best / (n - 2)

    x0 = jnp.asarray(np.random.default_rng(0).random(
        (S, S, S), dtype=np.float32))
    for depth in [int(d) for d in args.depths.split(",")]:
        p = sft.parse_program(
            synthesize_stencil(num_stages=depth, dimensions=(S,) * 3,
                               shape="diffusion"),
            name=f"depth_{S}_{depth}")
        # deep chains multiply ring state (one ring per stage): cascade
        # to smaller panels when auto's choice exceeds the VMEM gate
        fn = None
        for B in (0, 4, 2, 1):
            try:
                fn = compile_chain_panel(p, panel=B)
                used_B = B
                break
            except ValueError:
                continue
        if fn is None:
            print(json.dumps({"depth": depth, "size": S,
                              "skipped": "no panel fits VMEM"}))
            continue
        in_name = next(iter(p.inputs))
        out_name = p.outputs[0]

        def one(t, fn=fn):
            return fn({in_name: t})[out_name].astype(t.dtype)

        # keep differenced on-device work >> the ~35 ms tunnel overhead
        n = max(6, int(240 * (256 / S) ** 3 * 8 / depth))
        t = loop_time(one, x0, n, args.reps)
        print(json.dumps({
            "depth": depth, "size": S, "panel": used_B,
            "s_per_sweep": round(t, 5),
            "gcell_s": round(cells / t / 1e9, 2),
            "gcell_stages_s": round(cells * depth / t / 1e9, 1)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
