#!/usr/bin/env python
"""Hardware validation: every reference fixture, compiled on the real chip.

Runs each upstream program JSON (read in place from /root/reference) through
the auto-selected compiled backend on the current default device and
verifies against the numpy oracle (halo-pruned for shrink-BC programs).
Exit code 0 iff everything matches.

    python scripts/tpu_validation.py [--stencils DIR] [--max-elements N]
"""
import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stencils", default="/root/reference/test/stencils")
    ap.add_argument("--max-elements", type=int, default=2_000_000)
    args = ap.parse_args()

    import jax.numpy as jnp

    import stencilflow_tpu as sft
    from stencilflow_tpu.backend import compile_chain_best
    from stencilflow_tpu.backend.xla import chain_halo
    from stencilflow_tpu.data import arrays_are_equal, prune_halo
    from stencilflow_tpu.frontend.analysis import ChainAnalysis
    from stencilflow_tpu.ir import BCKind

    paths = sorted(glob.glob(os.path.join(args.stencils, "*.json")))
    if not paths:
        print(f"no programs found under {args.stencils}", file=sys.stderr)
        return 2

    failures = 0
    for path in paths:
        name = os.path.basename(path)
        program = sft.parse_program(path)
        if program.total_elements > args.max_elements:
            print(f"SKIP {name} (too large)")
            continue
        inputs = sft.load_input_arrays(program, prefix=args.stencils,
                                       seed=0)
        ref = sft.run_interpreter(program, inputs)
        fn, backend = compile_chain_best(program)
        out = fn({k: jnp.asarray(v) for k, v in inputs.items()})
        analysis = ChainAnalysis.run(program)
        shrink = any(bc.kind == BCKind.SHRINK
                     for k in program.kernels.values()
                     for bc in k.boundary_conditions.values())
        halo = max(chain_halo(analysis)) if shrink else 0
        ok = all(
            arrays_are_equal(
                prune_halo(np.asarray(ref[o]), program.raw_dimensions,
                           halo),
                prune_halo(np.asarray(out[o]), program.raw_dimensions,
                           halo))
            for o in program.outputs)
        print(f"{'OK  ' if ok else 'FAIL'} {name} [{backend}]")
        failures += not ok
    print(f"\n{len(paths)} programs, {failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
