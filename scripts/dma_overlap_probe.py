"""Does Mosaic overlap block DMA with VPU compute? (round 3, item #2)

Every 512^3 x2 formulation plateaus at ~41 GCell/s (autotune sweep:
stream/panel B=2..8/overlap B=4..8 all 40-41) while the pure-DMA
passthrough on the same grid runs ~82 — and the stage-count ladder fits
time = intercept + 4 ps/cell/stage almost exactly, i.e. DMA and compute
ADD instead of overlapping.  This probe pins that down:

  passthrough : out[g] = in[g]                      (DMA only)
  indep-N     : passthrough + N whole-plane VPU ops on a scratch
                accumulator with NO data dependency on the stream
  dep-N       : out[g] = f_N(in[g]) (N dependent VPU ops on the block)

If Mosaic keeps the block DMAs in flight behind VPU work, indep-N stays
at passthrough speed until compute exceeds the DMA time.  If the
schedule serializes (wait-DMA -> compute -> issue-DMA), indep-N grows
linearly from the passthrough baseline with slope = the VPU pass time.
"""
from __future__ import annotations

import argparse
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

J = K = 512


def _kernel(mode: str, nops: int, x_ref, o_ref, acc):
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        acc[...] = x_ref[0] * 0.5

    if mode == "indep":
        o_ref[...] = x_ref[...]
        a = acc[...]
        for i in range(nops):
            a = a * (0.9999 if i % 2 == 0 else 1.0001)
        acc[...] = a
    else:   # dep
        v = x_ref[0]
        for i in range(nops):
            v = v * (0.9999 if i % 2 == 0 else 1.0001)
        o_ref[...] = v[None]


def build(mode: str, nops: int, planes: int):
    return pl.pallas_call(
        functools.partial(_kernel, mode, nops),
        grid=(planes,),
        in_specs=[pl.BlockSpec((1, J, K), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, J, K), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((planes, J, K), jnp.float32),
        scratch_shapes=[pltpu.VMEM((J, K), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )


def timed(fn, x, trials, n1=4, n2=12):
    """Per-application seconds via the on-device differenced-loop method
    (CLAUDE.md): the kernel is passthrough-shaped, so an on-device
    lax.fori_loop feeds output->input; two loop lengths differenced
    cancel dispatch/readback, a scalar readback forces completion."""
    def make(n):
        @jax.jit
        def run(v):
            return jax.lax.fori_loop(0, n, lambda i, u: fn(u), v)
        return run
    r1, r2 = make(n1), make(n2)
    best = [float("inf"), float("inf")]
    for k, r in enumerate((r1, r2)):
        np.asarray(r(x).ravel()[0])       # warm-up forces remote compile
        for _ in range(trials):
            t0 = time.perf_counter()
            np.asarray(r(x).ravel()[0])
            best[k] = min(best[k], time.perf_counter() - t0)
    return max(best[1] - best[0], 1e-9) / (n2 - n1)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--planes", type=int, default=512)
    args = ap.parse_args()
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0.5, 1, (args.planes, J, K)), jnp.float32)
    cells = args.planes * J * K

    for mode, nops in [("dep", 0), ("indep", 0), ("indep", 4),
                       ("indep", 8), ("indep", 16), ("dep", 4),
                       ("dep", 8), ("dep", 16)]:
        dt = timed(build(mode, nops, args.planes), x, args.trials)
        print(f"{mode:6s} N={nops:3d}: {cells/dt/1e9:7.2f} GCell/s  "
              f"({dt*1e12/cells:6.2f} ps/cell)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
