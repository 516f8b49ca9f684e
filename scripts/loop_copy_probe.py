"""Does the fori_loop benchmark harness add a per-iteration carry copy?

Every io-structure factor (block size 1/4/16, arbitrary/parallel
semantics, vmem limit, plane shape) measures the SAME ~320 GB/s
passthrough pipe through the loop harness (scripts/dma_matrix_probe.py)
— a suspicious constant.  Hypothesis: XLA while-loops pin the carry to
a fixed buffer; a pallas custom-call result cannot alias its operand,
so each iteration copies the full output array back into the carry slot
(+2 more HBM passes ~= 10-12 ps/cell at f32), roughly DOUBLING the
apparent cost of any HBM-bound kernel.

Test: unroll U chained applications inside the loop body — the copy
amortizes to 1/U per application while real kernel io does not.

    ps/cell(U) ~= kernel + copy/U      (hypothesis)
    ps/cell(U) ~= const                (null)
"""
from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

J = K = 512


def build(planes):
    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    return pl.pallas_call(
        kernel,
        grid=(planes // 4,),
        in_specs=[pl.BlockSpec((4, J, K), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((4, J, K), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((planes, J, K), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )


def timed(fn, x, unroll, trials, n1=4, n2=12):
    """Per-APPLICATION seconds: fori_loop whose body applies fn
    `unroll` times; two loop lengths differenced."""
    def make(n):
        @jax.jit
        def run(v):
            def body(_, u):
                for _i in range(unroll):
                    u = fn(u)
                return u
            return jax.lax.fori_loop(0, n, body, v)
        return run
    r1, r2 = make(n1), make(n2)
    best = [float("inf"), float("inf")]
    for k, r in enumerate((r1, r2)):
        np.asarray(r(x).ravel()[0])
        for _ in range(trials):
            t0 = time.perf_counter()
            np.asarray(r(x).ravel()[0])
            best[k] = min(best[k], time.perf_counter() - t0)
    return max(best[1] - best[0], 1e-9) / ((n2 - n1) * unroll)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--planes", type=int, default=512)
    args = ap.parse_args()
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0.5, 1, (args.planes, J, K)), jnp.float32)
    cells = args.planes * J * K
    fn = build(args.planes)

    for unroll in (1, 2, 4, 8):
        dt = timed(fn, x, unroll, args.trials)
        print(f"U={unroll}: {cells/dt/1e9:7.2f} GCell/s  "
              f"({dt*1e12/cells:6.2f} ps/cell, "
              f"{cells*8/dt/1e9:6.1f} GB/s apparent io)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
