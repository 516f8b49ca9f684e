#!/usr/bin/env python
"""A/B: single-chip unwidened stream vs the origin-parameterized
(sharded/out-of-core) chunk body at matched shape, on-device loop method.

    python scripts/origin_ab.py [--size 256] [--planes 64] [--iters 4]
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
    ap.add_argument("--planes", type=int, default=64)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--reps", type=int, default=3)
    # differenced on-device work must dominate the tunnel's ~35 ms
    # per-call overhead (RESULTS.md methodology note): ~200 sweeps of a
    # (64,256,256) 4-stage chain is ~60 ms of real work
    ap.add_argument("--long", type=int, default=202)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import stencilflow_tpu as sft
    from stencilflow_tpu.outofcore import _host_slab, compile_chunked_chain
    from stencilflow_tpu.synthesize import jacobi

    S, Ic, it = args.size, args.planes, args.iters

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

    # A: single-chip stream at (Ic, S, S)
    from stencilflow_tpu.synthesize import synthesize_stencil
    pa = sft.parse_program(
        synthesize_stencil(num_stages=it, dimensions=(Ic, S, S),
                           shape="diffusion"),
        name=f"oa_{Ic}_{S}")
    from stencilflow_tpu.backend.stream import compile_chain_stream
    fa = compile_chain_stream(pa)
    xa = jnp.asarray(np.random.default_rng(0).random(
        (Ic, S, S), dtype=np.float32))
    out_name = pa.outputs[0]

    def one_a(t):
        return fa({next(iter(pa.inputs)): t})[out_name].astype(t.dtype)

    ta = loop_time(one_a, xa, args.long)
    cells = float(Ic * S * S)
    print(json.dumps({"case": "single_chip_stream",
                      "shape": [Ic, S, S], "iters": it,
                      "s_per_sweep": round(ta, 5),
                      "gcell_s": round(cells / ta / 1e9, 2)}))

    # B: origin-parameterized chunk body (chunks = size/planes)
    p = sft.parse_program(jacobi(3, S, iterations=it), name=f"ob_{S}")
    chunks = S // Ic
    fn, plan = compile_chunked_chain(p, chunks)
    h = plan.halo
    in_name = next(iter(p.inputs))
    tile0 = jnp.asarray(_host_slab(
        np.random.default_rng(0).random((S, S, S), dtype=np.float32),
        -h, Ic + h, S))

    def one_b(t):
        out = fn(jnp.int32(0), {in_name: t})[p.outputs[0]]
        pad = ((h, h),) + ((0, 0),) * (out.ndim - 1)
        return (jnp.pad(out, pad) if h else out).astype(t.dtype)

    tb = loop_time(one_b, tile0, args.long)
    print(json.dumps({"case": "origin_chunk_body", "backend": plan.backend,
                      "shape_widened": list(tile0.shape), "iters": it,
                      "s_per_sweep": round(tb, 5),
                      "gcell_s": round(cells / tb / 1e9, 2),
                      "slowdown_vs_single": round(tb / ta, 2)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
