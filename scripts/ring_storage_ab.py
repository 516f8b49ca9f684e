"""A/B: bf16 ring storage (f32 compute) vs f32 rings on deep chains
(VERDICT r3 next #5).

Mechanisms in tension on a VPU-bound chain: bf16 rings halve ring
VMEM (larger blocks fit -> less per-grid-step overhead) and halve
ring-store traffic, but every ring READ pays a bf16->f32 cast issue
and every store a rounding.  Whether the balance wins is an empirical
question per workload — this measures it same-day on the two VERDICT
targets (jacobi3d 512^3 x8, hdiff3d 256^3 x8) plus the oracle error
envelope at a check size.

Usage: python scripts/ring_storage_ab.py [--workloads jacobi3d,hdiff]
       [--legs off,bfloat16]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workloads", default="jacobi3d,hdiff")
    ap.add_argument("--legs", default="off,bfloat16")
    ap.add_argument("--skip-check", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import stencilflow_tpu as sft
    from stencilflow_tpu.backend.stream import compile_chain_stream
    from stencilflow_tpu.synthesize import jacobi, synthesize_stencil

    on_tpu = jax.devices()[0].platform != "cpu"
    if not on_tpu:
        print("needs the TPU")
        return 1

    def make(workload):
        if workload == "jacobi3d":
            return sft.parse_program(jacobi(3, 512, iterations=8),
                                     name="jacobi3d_512_8itr")
        if workload == "hdiff":
            return sft.parse_program(
                synthesize_stencil(num_stages=8,
                                   dimensions=(256,) * 3, shape="hdiff"),
                name="hdiff3d_256_8itr")
        if workload == "jacobi2d":
            # bf16 rings halve the j-tile ring bytes: tile 256 fits
            # where f32 forced 128 -> halo inflation 1.125 -> 1.0625
            return sft.parse_program(jacobi(2, 8192, iterations=8),
                                     name="jacobi2d_8192_8itr")
        raise SystemExit(f"unknown workload {workload}")

    # --- compiled correctness envelope at a small size ---------------------
    if not args.skip_check:
        ps = sft.parse_program(jacobi(3, 64, iterations=8), name="chk")
        ins = sft.load_input_arrays(ps, seed=0)
        oracle = sft.run_interpreter(ps, ins)
        fn = compile_chain_stream(ps, ring_storage="bfloat16")
        out = fn({k: jnp.asarray(v) for k, v in ins.items()})
        o = ps.outputs[0]
        a, b = np.asarray(out[o]), np.asarray(oracle[o])
        err = np.abs(a - b).max() / max(1e-9, np.abs(b).max())
        print(f"compiled check 64^3x8: rel err {err:.2e} "
              f"{'OK' if 0 < err < 2e-2 else 'FAIL'}", flush=True)
        if not (0 < err < 2e-2):
            return 1

    for workload in args.workloads.split(","):
        program = make(workload)
        cells = float(np.prod(program.dimensions))
        inputs = sft.load_input_arrays(program, seed=0)
        in_name = next(iter(program.inputs))
        out_name = program.outputs[0]
        a0 = jnp.asarray(inputs[in_name])
        rest = {k: jnp.asarray(v) for k, v in inputs.items()
                if k != in_name}

        for leg in args.legs.split(","):
            try:
                fn = compile_chain_stream(program, ring_storage=leg)
            except ValueError as e:
                print(f"{workload} ring_storage={leg}: SKIP ({e})",
                      flush=True)
                continue
            cfg = compile_chain_stream.last_config
            tag = (f"block={cfg['block']} jtiles={cfg['jtiles']} "
                   f"vmem={cfg['vmem_bytes']//2**20}MiB "
                   f"spilled={cfg['spilled']}")

            @jax.jit
            def loop(r):
                def body(_, x):
                    y = fn({in_name: x, **rest})[out_name]
                    return fn({in_name: y, **rest})[out_name]
                return jax.lax.fori_loop(0, r, body, a0).sum()

            def timed(reps, trials=5):
                np.asarray(loop(reps))
                best = float("inf")
                for _ in range(trials):
                    t0 = time.perf_counter()
                    np.asarray(loop(reps))
                    best = min(best, time.perf_counter() - t0)
                return best

            big = int(min(1920, max(15, round(15 * (512**3 / cells)))))
            small = max(3, big // 5)
            dt = (timed(big) - timed(small)) / (2 * (big - small))
            if dt <= 0:
                print(f"{workload} ring_storage={leg}: unstable "
                      "(dt<=0), rerun", flush=True)
                continue
            g = cells / dt / 1e9
            print(f"{workload} ring_storage={leg} [{tag}]: "
                  f"{g:.2f} GCell/s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
