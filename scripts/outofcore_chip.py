#!/usr/bin/env python
"""Out-of-core chip check: compiled chunked runs vs the oracle, plus a
device-time measurement per chunk sweep.

    python scripts/outofcore_chip.py [--size 256] [--iters 4] [--chunks 4]

Verifies run_chunked (stream chunk body, compiled Mosaic) against the
numpy oracle at a small size, then times a larger sweep: total wall time
(includes host slicing + tunnel transfers) and pure device time per sweep
(differenced repeat calls with identical chunk inputs), printing one JSON
line per configuration.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--chunks", type=int, default=4)
    ap.add_argument("--verify-size", type=int, default=64)
    args = ap.parse_args()

    import stencilflow_tpu as sft
    from stencilflow_tpu.outofcore import compile_chunked_chain, run_chunked
    from stencilflow_tpu.synthesize import jacobi

    # 1. correctness, compiled on the real device
    pv = sft.parse_program(jacobi(3, args.verify_size, iterations=2),
                           name="ocv")
    inputs = sft.load_input_arrays(pv, seed=0)
    ref = np.asarray(sft.run_interpreter(pv, inputs)[pv.outputs[0]],
                     dtype=np.float64)
    got = run_chunked(pv, inputs, 4)
    ok = bool(np.allclose(got[pv.outputs[0]], ref, rtol=2e-5, atol=1e-6))
    print(json.dumps({"check": "outofcore_verify",
                      "size": args.verify_size, "chunks": 4, "ok": ok}))
    if not ok:
        return 1

    # 2. throughput: wall time per sweep + amortized per-chunk device time
    p = sft.parse_program(jacobi(3, args.size, iterations=args.iters),
                          name="ocp")
    inputs = sft.load_input_arrays(p, seed=0)
    compiled = compile_chunked_chain(p, args.chunks)
    run_chunked(p, inputs, args.chunks, compiled=compiled)  # warm up
    t0 = time.perf_counter()
    run_chunked(p, inputs, args.chunks, compiled=compiled)
    wall = time.perf_counter() - t0
    cells = float(np.prod(p.dimensions))
    print(json.dumps({
        "check": "outofcore_sweep",
        "size": args.size, "iters": args.iters, "chunks": args.chunks,
        "backend": compiled[1].backend,
        "wall_s": round(wall, 4),
        "gcell_s_incl_transfers": round(cells / wall / 1e9, 3),
    }))

    # 3. pure device time of the chunk body (what real PCIe/DMA hosts
    # would see per chunk): on-device loop feeding the chunk output back
    # into the (re-padded) input tile, two loop lengths differenced to
    # cancel the tunnel's dispatch + readback overhead (CLAUDE.md).
    import functools

    import jax
    import jax.numpy as jnp

    from stencilflow_tpu.outofcore import _host_slab

    fn, plan = compiled
    h, Ic = plan.halo, plan.block
    in_name = next(iter(p.inputs))
    tile0 = jnp.asarray(_host_slab(np.asarray(inputs[in_name], dtype=np.float32),
                                   -h, Ic + h, p.dimensions[0]))
    out_name = p.outputs[0]

    def one(tile):
        out = fn(jnp.int32(0), {in_name: tile})[out_name]
        pad = ((h, h),) + ((0, 0),) * (out.ndim - 1)
        return (jnp.pad(out, pad) if h else out).astype(tile.dtype)

    @functools.partial(jax.jit, static_argnums=1)
    def loop(tile, n):
        return jax.lax.fori_loop(0, n, lambda _, t: one(t), tile)

    def timed(n):
        t0 = time.perf_counter()
        r = loop(tile0, n)
        np.asarray(r.ravel()[0])   # scalar readback (index on device)
        return time.perf_counter() - t0

    # loop long enough that the differenced work dominates the tunnel's
    # per-call overhead (RESULTS.md methodology note)
    long_n = 202
    timed(2)   # warm up both loop lengths' compiles
    timed(long_n)
    best = min(timed(long_n) - timed(2) for _ in range(3))
    chunk_cells = float(Ic * np.prod(p.dimensions[1:]))
    dev_s = best / (long_n - 2)
    print(json.dumps({
        "check": "outofcore_device_chunk",
        "chunk_planes": Ic, "halo": h,
        "device_s_per_chunk_sweep": round(dev_s, 5),
        "gcell_s_device": round(chunk_cells / dev_s / 1e9, 2),
        "sweep_device_s_est": round(dev_s * args.chunks, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
