"""Where affine-run composition wins and loses (VERDICT r3 next #1).

Model study over the canonical workloads: for composition factor t, build
the EXACT composed coefficient tensor (t-fold convolution of the stage
coefficient maps), factor every i-offset group with the same SVD the MXU
planner uses, and price the result with the executed-flops model
(128-lane contraction granularity, split-precision passes) plus the VPU
plane-combination cost.  No chip needed — this is the compile-time
economics that decide whether the planner composes.

The punchline this script documents:

* separable (rank-1) chains — box/Gaussian — compose at CONSTANT
  transform count: one (L, R) pair regardless of t, so MXU flops divide
  by t.  This is what backend/compose.py ships.
* cross-footprint chains (jacobi) are NOT separable: the composed
  i-offset groups are polynomials of growing degree in the 2-D cross,
  whose rank grows linearly with t.  Total rank terms ~ sum over offsets
  of (t - |d| + 1) ~ t^2/... — transform count grows ~quadratically
  while the per-matmul floor stays one-two 128-chunks, so composed
  jacobi costs MORE executed flops per step than the VPU path costs
  issues.  Composition is therefore gated on separability, and jacobi
  keeps the VPU panel lowering (RESULTS.md round-3 structural residual).

Usage: python scripts/compose_study.py
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import stencilflow_tpu as sft  # noqa: E402
from stencilflow_tpu import config  # noqa: E402
from stencilflow_tpu.backend.linear import extract_linear  # noqa: E402
from stencilflow_tpu.synthesize import jacobi, synthesize_stencil  # noqa: E402

SPLIT_PASSES = 2.5       # bf16 hi/lo split precision: 2-3 passes
PASS_RATE = config.TPU_VPU_PASS_RATE
MXU = config.TPU_MXU_BF16_FLOPS


def stage_coeffs(program, name):
    c = extract_linear(program.kernels[name])
    return {k[1]: v for k, v in c.items() if k != ("const",)}


def convolve(a, b):
    out = {}
    for o1, w1 in a.items():
        for o2, w2 in b.items():
            o = tuple(x + y for x, y in zip(o1, o2))
            out[o] = out.get(o, 0.0) + w1 * w2
    return {o: w for o, w in out.items() if w != 0.0}


def composed_cost(coeffs, t, plane, steps_covered):
    """(mxu_flops_per_cell_per_step, vpu_ops_per_cell_per_step,
    n_transforms, max_rank) of ONE composed operator applied every
    ``steps_covered`` steps."""
    acc = {(0, 0, 0): 1.0}
    for _ in range(t):
        acc = convolve(acc, coeffs)
    by_oi = {}
    for (di, dj, dk), w in acc.items():
        by_oi.setdefault(di, {})[(dj, dk)] = w
    transforms = {}            # normalized pattern -> (Dj, Dk) radii
    vpu = 0.0
    max_rank = 0
    for di, cmap in sorted(by_oi.items()):
        ojs = sorted({o[0] for o in cmap})
        oks = sorted({o[1] for o in cmap})
        C = np.zeros((len(ojs), len(oks)))
        for (oj, ok), w in cmap.items():
            C[ojs.index(oj), oks.index(ok)] = w
        if C.shape == (1, 1):
            vpu += 2           # scaled identity: one FMA (2 passes)
            continue
        u, sv, vt = np.linalg.svd(C)
        rank = int((sv > 1e-10 * max(1.0, sv[0])).sum())
        max_rank = max(max_rank, rank)
        for m in range(rank):
            key = (tuple(np.round(u[:, m] / u[np.argmax(np.abs(u[:, m])), m],
                                  6)),
                   tuple(np.round(vt[m] / vt[m][np.argmax(np.abs(vt[m]))],
                                  6)),
                   min(ojs), max(ojs), min(oks), max(oks))
            transforms[key] = (max(abs(ojs[0]), ojs[-1]),
                               max(abs(oks[0]), oks[-1]))
            vpu += 3           # read transformed plane + FMA
    # executed matmul flops per cell: per unique transform, 2 sides of
    # 2*contraction flops, contraction = 128-aligned blocked window
    pj, pk = plane

    def contraction(n, radius):
        win = 128 + 2 * radius              # BLOCK_T rows + band
        win = min(n, -(-win // 128) * 128)
        return win

    mxu_fpc = 0.0
    for (Dj, Dk) in transforms.values():
        mxu_fpc += SPLIT_PASSES * 2 * contraction(pj, Dj)
        mxu_fpc += SPLIT_PASSES * 2 * contraction(pk, Dk)
    return (mxu_fpc / steps_covered, vpu / steps_covered,
            len(transforms), max_rank)


def main():
    rows = []
    cases = [
        ("jacobi3d 512^3", jacobi(3, 512, iterations=8), (512, 512), 8),
        ("jacobi2d 8192^2", jacobi(2, 8192, iterations=8), (8192, 8192), 8),
        ("box-r2 256^3", synthesize_stencil(num_stages=8,
                                            dimensions=(256,) * 3,
                                            shape="box", extent=2),
         (256, 256), 8),
    ]
    for label, spec, plane, iters in cases:
        p = sft.parse_program(spec, name="study")
        coeffs = stage_coeffs(p, next(iter(p.kernels)))
        # offsets as dense 3-vectors
        coeffs = {tuple(0 if o is None else o for o in offs): w
                  for offs, w in coeffs.items()}
        print(f"\n{label}: stage footprint {len(coeffs)}")
        print(f"{'t':>3} {'#transforms':>11} {'max rank':>8} "
              f"{'mxu flops/cell/step':>20} {'vpu ops/step':>12} "
              f"{'ceiling GCell/s':>15}")
        for t in (1, 2, 4, 8):
            if t > iters:
                continue
            m, v, ntr, rk = composed_cost(coeffs, t, plane, t)
            # serialized engines: per-cell time = mxu + vpu parts
            tcell = iters * (m / MXU + v / PASS_RATE)
            rows.append((label, t, m, v, ntr, rk, 1.0 / tcell / 1e9))
            print(f"{t:3d} {ntr:11d} {rk:8d} {m:20.0f} {v:12.1f} "
                  f"{1.0/tcell/1e9:15.2f}")
        # the all-VPU comparator for this stage shape
        ops = 2.0 * len(coeffs)          # load+add per footprint point
        print(f"    all-VPU comparator: ~{PASS_RATE/ (ops*iters) /1e9:.2f} "
              f"GCell/s at {ops:.0f} ops/cell/step (pass-rate bound)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
