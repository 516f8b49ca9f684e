"""Measure the real v5e VPU elementwise ceiling (VERDICT r2 next #1).

The previous comparator (config.TPU_VPU_ELEMOPS = 8*128 lanes x 940 MHz
x 1 op) is a one-ALU-per-lane model that round-2 kernels EXCEEDED by up
to 2.87x — real v5e VPUs issue multiple elementwise ops per lane-cycle,
so the model measured nothing.  This script measures the sustainable
rate directly:

* a Pallas kernel holds a VMEM-resident f32 accumulator block and
  applies U unrolled elementwise ops per grid step — no HBM traffic in
  the steady state, so the rate is pure VPU issue;
* each op is a whole-block elementwise op (block >> 8x128), so
  cross-step dependencies are hidden by intra-op pipelining;
* two grid lengths are differenced (the repo's standard tunnel-safe
  methodology) and a host readback closes each timing.

Measured quantities:
  add   : a = a + c            (1 flop/elem)
  mul   : a = a * c            (1 flop/elem)
  fma   : a = a * c + d        (2 flops/elem, 1 instr if Mosaic fuses)
  mixed : alternating add/mul  (1 flop/elem)

Output: elem-ops/s per op kind, the implied ops/lane/cycle at 940 MHz,
and whether fma issues as one instruction (fma elem rate ~= add elem
rate) — the numbers that set config.TPU_VPU_* for the recalibrated
roofline.
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

# block: 512 x 1024 f32 = 2 MiB accumulator (+2 operand blocks) — far
# larger than one (8,128) vreg so every op is ~512 vector instructions
ROWS, COLS = 512, 1024


def _kernel(op: str, unroll: int, x_ref, o_ref, acc, c, d):
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _init():
        acc[...] = x_ref[...]
        c[...] = x_ref[...] * 0.999993
        d[...] = x_ref[...] * 1e-7

    if op == "expr_jac2d_shift":
        # the REAL jacobi2d stage: operands are j/k-SHIFTED views of one
        # resident plane (shift-in-fill concats, backend/stream.py), and
        # the result is stored back (the ring store).  The delta to
        # expr_jac2d prices shift materialization + store passes.
        a = acc[...]
        for _ in range(unroll):
            jm = jnp.concatenate([a[1:], a[-1:]], axis=0)
            jp = jnp.concatenate([a[:1], a[:-1]], axis=0)
            km = jnp.concatenate([a[:, 1:], a[:, -1:]], axis=1)
            kp = jnp.concatenate([a[:, :1], a[:, :-1]], axis=1)
            a = 0.25 * (jm + jp + km + kp)
        acc[...] = a

        @pl.when(g == pl.num_programs(0) - 1)
        def _outs():
            o_ref[...] = acc[...]
        return

    if op.startswith("expr_lim"):
        # the hdiff flux-limiter stage shape (VERDICT r3 next #3):
        # flx = lap[j+1]-lap[j]; flx = 0 if flx*dq > 0 else flx —
        # 7 counted ops per unroll step (the 5-op limiter: 2 sub, 1
        # mul, 1 cmp, 1 select — plus the carry fma's mul+add), the
        # SAME 7 in all three formulations so rates compare directly;
        # the winner is what the backend should emit.  main() prices
        # chains=7 to match.
        lap, q = acc[...], c[...]
        for u in range(unroll):
            flx = (lap if u % 2 == 0 else q) - lap * 0.999
            dq = q - lap * 1.001
            p = flx * dq
            if op == "expr_lim_sel":        # shipped: where on cmp
                flx = jnp.where(p > 0.0, jnp.float32(0.0), flx)
            elif op == "expr_lim_mask":     # float-mask multiply
                flx = flx * (p <= 0.0).astype(jnp.float32)
            elif op == "expr_lim_minmax":   # min/max blend (dq==0 edge
                flx = jnp.where(dq > 0.0,   # differs — speed probe only)
                                jnp.minimum(flx, 0.0),
                                jnp.maximum(flx, 0.0))
            else:
                raise ValueError(op)
            lap = lap * 0.5 + flx
        acc[...] = lap

        @pl.when(g == pl.num_programs(0) - 1)
        def _outl():
            o_ref[...] = acc[...]
        return

    if op in ("expr_jac", "expr_hs", "expr_jac2d"):
        # REAL expression shapes: a deep per-tile expression DAG over
        # several distinct VMEM operand blocks — Mosaic evaluates the
        # whole DAG in registers per (8,128) tile, so ALU throughput,
        # not per-op VMEM round-trips, binds (this is what stencil
        # stage bodies look like; the serial a=a+c chain above binds on
        # the VMEM round-trip instead)
        bs = [c[...] * (0.9 + 0.01 * k) for k in range(4)] + [d[...]]
        a = acc[...]
        for _ in range(unroll):
            if op == "expr_jac":
                # 7-term jacobi-like: 6 adds + 1 mul = 7 ops
                a = 0.142857 * (a + bs[0] + bs[1] + bs[2]
                                + bs[3] + bs[4] + a * 1e-7)
            elif op == "expr_jac2d":
                # jacobi2d stage shape: 4-term sum over 3 distinct
                # loaded operands + the carry = 3 adds + 1 mul = 4 ops
                a = 0.25 * (a + bs[0] + bs[1] + bs[2])
            else:
                # hotspot-like: 20 ops (3 laplacian groups + coupling)
                a = a + 0.01 * (bs[0]
                                + 0.1 * (bs[1] + bs[2] - 2.0 * a)
                                + 0.1 * (bs[3] + bs[4] - 2.0 * a)
                                + 0.1 * (bs[1] + bs[3] - 2.0 * a)
                                + 0.0001 * (80.0 - a))
        acc[...] = a

        @pl.when(g == pl.num_programs(0) - 1)
        def _oute():
            o_ref[...] = acc[...]
        return

    if op.endswith(("4", "8")) and op not in ("add4", "mul4", "fma4",
                                              "add8"):
        raise ValueError(op)
    if op in ("add4", "mul4", "fma4", "add8"):
        # K INDEPENDENT accumulator chains expose instruction-level
        # parallelism to the VPU's multiple ALUs per lane — a single
        # serial chain measures only the dependent-issue rate
        K = int(op[-1])
        base, cc, dd = acc[...], c[...], d[...]
        chains = [base * (1.0 + 1e-6 * k) for k in range(K)]
        for u in range(unroll):
            for k in range(K):
                if op.startswith("add"):
                    chains[k] = chains[k] + (cc if (u + k) % 2 == 0
                                             else dd)
                elif op == "mul4":
                    chains[k] = chains[k] * (cc if (u + k) % 2 == 0
                                             else dd)
                else:  # fma4
                    chains[k] = chains[k] * cc + dd
        a = chains[0]
        for k in range(1, K):
            a = a + chains[k]
        acc[...] = a

        @pl.when(g == pl.num_programs(0) - 1)
        def _out4():
            o_ref[...] = acc[...]
        return

    a = acc[...]
    cc = c[...]
    dd = d[...]
    if op in ("selc", "maskmul"):
        # the BC-mask question: with the compare HOISTED (the panel
        # kernel caches masks per offset), is a per-read select any
        # slower than a float-mask multiply?  One cmp per grid step
        # (amortized 1/unroll), one select / one mul per unroll step.
        m = cc > dd
        mf = m.astype(jnp.float32)
        nf = jnp.float32(1.0) - mf
        for u in range(unroll):
            if op == "selc":
                # alternate polarity so no step is algebraically
                # idempotent with its predecessor
                a = jnp.where(m, dd, a) if u % 2 == 0 \
                    else jnp.where(jnp.logical_not(m), cc, a)
            else:
                a = a * (mf if u % 2 == 0 else nf)
        acc[...] = a

        @pl.when(g == pl.num_programs(0) - 1)
        def _outm():
            o_ref[...] = acc[...]
        return

    for u in range(unroll):
        if op == "add":
            a = a + (cc if u % 2 == 0 else dd)
        elif op == "add2":            # 2-operand traffic probe
            a = a + a
        elif op == "mul":
            a = a * (cc if u % 2 == 0 else dd)
        elif op == "fma":
            a = a * cc + dd
        elif op == "mixed":
            a = (a + dd) if u % 2 == 0 else (a * cc)
        elif op == "div":
            a = (cc if u % 2 == 0 else dd) / a
        elif op == "divc":            # divide by constant (foldable?)
            a = a / (1.0000001 if u % 2 == 0 else 0.9999999)
        elif op == "sqrt":
            a = jnp.sqrt(a)           # converges to 1.0 (timing is
            #                           value-independent on the VPU)
        elif op == "exp":
            a = jnp.exp(-a)           # bounded fixed-point iteration
        elif op == "select":
            a = jnp.where(a > cc, dd, a)   # cmp + select, 2 passes
        elif op == "min":
            a = jnp.minimum(a, cc if u % 2 == 0 else dd)
        elif op == "sin":
            a = jnp.sin(a)
        elif op == "cos":
            a = jnp.cos(a)
        elif op == "tan":
            a = jnp.tan(a * 1e-3)     # decays to 0 (one extra mul pass)
        elif op == "tanh":
            a = jnp.tanh(a)
        elif op == "log":
            a = jnp.log(a + 1.0)      # (0,1] -> (0,0.7]: one extra add
        elif op == "abs":
            a = jnp.abs(a)
        else:
            raise ValueError(op)
    acc[...] = a

    @pl.when(g == pl.num_programs(0) - 1)
    def _out():
        o_ref[...] = acc[...]


def build(op: str, unroll: int, steps: int):
    kernel = functools.partial(_kernel, op, unroll)
    return pl.pallas_call(
        kernel,
        grid=(steps,),
        in_specs=[pl.BlockSpec((ROWS, COLS), lambda g: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((ROWS, COLS), lambda g: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS, COLS), jnp.float32),
        scratch_shapes=[pltpu.VMEM((ROWS, COLS), jnp.float32)] * 3,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # multi-chain variants keep up to 8 live blocks: raise the
            # scoped-vmem limit past the 16 MiB default (still under the
            # 64 MiB fast-DMA threshold, CLAUDE.md)
            vmem_limit_bytes=64 * 2**20),
    )


def time_op(op: str, unroll: int, x, trials: int = 5):
    """Seconds per grid step (differenced), ops/elem = unroll."""

    def timed(steps: int) -> float:
        fn = jax.jit(build(op, unroll, steps))
        np.asarray(fn(x))  # warm-up + force remote compile, readback
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            np.asarray(fn(x))
            best = min(best, time.perf_counter() - t0)
        return best

    big, small = 4096, 512
    dt = (timed(big) - timed(small)) / (big - small)
    return dt


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--unroll", type=int, default=64)
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--ops", default=None,
                    help="comma-separated subset (default: all)")
    args = ap.parse_args()

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0.5, 1.0, (ROWS, COLS)), jnp.float32)

    elems = ROWS * COLS
    results = {}
    default_ops = ("add", "add2", "mul", "fma", "mixed", "div", "divc",
                   "sqrt", "exp", "select", "min", "sin", "cos", "tan",
                   "tanh", "log", "abs")
    for op in (args.ops.split(",") if args.ops else default_ops):
        dt = time_op(op, args.unroll, x, args.trials)
        # ops issued per grid step: unroll whole-block elementwise ops
        # (fma counts 1 issue, 2 flops; addK/mulK/fmaK run K chains)
        chains = (int(op[-1])
                  if op[-1] in "48" and op[:-1] in ("add", "mul", "fma")
                  else 1)
        if op == "expr_jac":
            chains = 8    # ops per unrolled expression
        elif op in ("expr_jac2d", "expr_jac2d_shift"):
            chains = 4    # counted ops only; shifts/stores are the delta
        elif op == "expr_hs":
            chains = 20
        elif op.startswith("expr_lim"):
            chains = 7    # 2 sub + mul + cmp + select + the carry fma
        issues = args.unroll * elems * chains
        flops = issues * (2 if op.startswith("fma") else 1)
        ops_s = issues / dt
        lanes = 8 * 128
        per_lane_cycle = ops_s / lanes / 940e6
        results[op] = (ops_s, flops / dt, per_lane_cycle)
        print(f"{op:6s}: {ops_s/1e12:7.3f} Tissue/s  "
              f"{flops/dt/1e12:7.3f} Tflop/s  "
              f"{per_lane_cycle:5.2f} issues/lane/cycle @940MHz",
              flush=True)

    if "add" in results and "fma" in results:
        add_rate = results["add"][0]
        fma_rate = results["fma"][0]
        print(f"\nfma/add issue-rate ratio: {fma_rate/add_rate:.2f} "
              f"({'fused (1 instr)' if fma_rate > 0.8 * add_rate else 'NOT fused'})")
    print("\nsuggested config:")
    best = max(r[0] for r in results.values())
    print(f"  TPU_VPU_ELEMOPS = {best:.3e}  # measured, this script")
    return 0


if __name__ == "__main__":
    sys.exit(main())
