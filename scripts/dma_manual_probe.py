"""Manual double-buffered DMA vs Mosaic's automatic block pipeline.

Companion to scripts/dma_overlap_probe.py (round 3, VERDICT #2): if the
automatic pallas_call block pipeline serializes HBM DMA with VPU
compute on "arbitrary"-semantics grids, an explicit software pipeline —
inputs/outputs in ANY memory space, pltpu.make_async_copy into a
2-slot VMEM ring, copy of plane g+1 issued BEFORE computing plane g —
should recover min-sum time = max(dma, compute) instead of dma+compute.

  auto dep-N    : pallas_call block pipeline, N dependent VPU ops/plane
  manual dep-N  : same math, explicit double-buffered DMA

Compare slopes: if manual dep-N stays at the passthrough rate until
N*vpu_pass > dma_time, the streaming backends should adopt the manual
pipeline for shallow chains.
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


def _compute(v, nops):
    for i in range(nops):
        v = v * (0.9999 if i % 2 == 0 else 1.0001)
    return v


def _auto_kernel(nops, x_ref, o_ref):
    o_ref[...] = _compute(x_ref[0], nops)[None]


def build_auto(nops: int, planes: int):
    return pl.pallas_call(
        functools.partial(_auto_kernel, nops),
        grid=(planes,),
        in_specs=[pl.BlockSpec((1, J, K), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, J, K), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((planes, J, K), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )


def _manual_kernel(nops, planes, x_hbm, o_hbm, ibuf, obuf, isem, osem):
    g = pl.program_id(0)

    def icopy(p):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(p, 1)], ibuf.at[pl.ds(p % 2, 1)],
            isem.at[p % 2])

    def ocopy(p):
        return pltpu.make_async_copy(
            obuf.at[pl.ds(p % 2, 1)], o_hbm.at[pl.ds(p, 1)],
            osem.at[p % 2])

    @pl.when(g == 0)
    def _():                           # prologue: plane 0 in flight
        icopy(0).start()

    @pl.when(g + 1 < planes)
    def _():                           # lookahead: plane g+1 behind compute
        icopy(g + 1).start()

    icopy(g).wait()
    v = _compute(ibuf[(g % 2, slice(None), slice(None))], nops)

    @pl.when(g >= 2)
    def _():                           # slot reuse: out-copy g-2 must be done
        ocopy(g - 2).wait()

    obuf[(g % 2, slice(None), slice(None))] = v
    ocopy(g).start()

    @pl.when(g == planes - 1)
    def _():                           # epilogue: drain outstanding out-copies
        if planes >= 2:
            ocopy(g - 1).wait()
        ocopy(g).wait()


def build_manual(nops: int, planes: int):
    return pl.pallas_call(
        functools.partial(_manual_kernel, nops, planes),
        grid=(planes,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((planes, J, K), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, J, K), jnp.float32),
                        pltpu.VMEM((2, J, K), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA((2,))],
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

    # correctness first (small grid; full arrays cross the tunnel)
    xs = x[:8]
    a = np.asarray(jax.jit(build_auto(4, 8))(xs))
    m = np.asarray(jax.jit(build_manual(4, 8))(xs))
    assert np.array_equal(a, m), "manual DMA kernel mismatch"
    print("manual == auto: bit-exact", flush=True)

    for mode, build in [("auto", build_auto), ("manual", build_manual)]:
        for nops in (0, 4, 8, 16, 32):
            dt = timed(build(nops, args.planes), x, args.trials)
            print(f"{mode:7s} N={nops:3d}: {cells/dt/1e9:7.2f} GCell/s  "
                  f"({dt*1e12/cells:6.2f} ps/cell)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
