"""Factor matrix for the Pallas block-DMA pipe floor (round 3, VERDICT #2).

dma_overlap_probe / dma_manual_probe establish that at (1,512,512) f32
blocks the pipeline moves ~310 GB/s (26 ps/cell for in+out) regardless
of VPU load and regardless of manual vs automatic DMA — compute is
fully hidden, the io pipe is the binder.  This sweeps the remaining
structural factors on a pure passthrough:

  * block size: 1 / 4 / 16 planes per grid step (DMA chunk 1-16 MiB)
  * dimension semantics: arbitrary vs parallel
  * vmem_limit_bytes: default vs 64 MiB
  * plane shape: 512x512 vs 256x256 (same bytes at 4x the steps)

Loop-differenced timing (CLAUDE.md methodology).
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


def build(planes, J, K, B, semantics, vmem_mib):
    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    params = dict(dimension_semantics=(semantics,))
    if vmem_mib:
        params["vmem_limit_bytes"] = vmem_mib * 2**20
    return pl.pallas_call(
        kernel,
        grid=(planes // B,),
        in_specs=[pl.BlockSpec((B, J, K), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((B, J, K), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((planes, J, K), jnp.float32),
        compiler_params=pltpu.CompilerParams(**params),
    )


def timed(fn, x, trials, n1=4, n2=12):
    def make(n):
        @jax.jit
        def run(v):
            return jax.lax.fori_loop(0, n, lambda i, u: fn(u), v)
        return run
    r1, r2 = make(n1), make(n2)
    best = [float("inf"), float("inf")]
    for k, r in enumerate((r1, r2)):
        np.asarray(r(x).ravel()[0])
        for _ in range(trials):
            t0 = time.perf_counter()
            np.asarray(r(x).ravel()[0])
            best[k] = min(best[k], time.perf_counter() - t0)
    return max(best[1] - best[0], 1e-9) / (n2 - n1)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    rng = np.random.default_rng(0)

    cases = [
        (512, 512, 512, 1, "arbitrary", 0),
        (512, 512, 512, 4, "arbitrary", 0),
        # 16-plane blocks: 2x double-buffered 16 MiB io = 64 MiB scoped
        # state; the default scoped limit (16 MiB) OOMs, so size it
        (512, 512, 512, 16, "arbitrary", 80),
        (512, 512, 512, 1, "parallel", 0),
        (512, 512, 512, 4, "parallel", 0),
        (512, 512, 512, 4, "arbitrary", 64),
        (512, 512, 512, 1, "arbitrary", 64),
        (2048, 256, 256, 4, "arbitrary", 0),
    ]

    arrs = {}
    for planes, J, K, B, sem, lim in cases:
        key = (planes, J, K)
        if key not in arrs:
            arrs[key] = jnp.asarray(
                rng.uniform(0.5, 1, (planes, J, K)), jnp.float32)
        x = arrs[key]
        cells = planes * J * K
        try:
            dt = timed(build(planes, J, K, B, sem, lim), x, args.trials)
        except Exception as e:  # noqa: BLE001 — report and keep sweeping
            print(f"{J}x{K} B={B:2d} {sem:9s} lim={lim or 'def':>3}: "
                  f"FAILED ({type(e).__name__}: {str(e)[:120]})",
                  flush=True)
            continue
        gbs = cells * 8 / dt / 1e9
        print(f"{J}x{K} B={B:2d} {sem:9s} lim={lim or 'def':>3}: "
              f"{cells/dt/1e9:7.2f} GCell/s  ({dt*1e12/cells:6.2f} ps/cell,"
              f" {gbs:6.1f} GB/s io)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
