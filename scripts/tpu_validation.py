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
    ap.add_argument("--odd-shapes", action="store_true",
                    help="also sweep synthetic programs with odd "
                         "(non-8/128-divisible) dims through the compiled "
                         "streaming backend — shakes out Mosaic block-"
                         "shape edge cases invisible to interpret mode")
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
        try:
            fn, backend = compile_chain_best(program)
            out = fn({k: jnp.asarray(v) for k, v in inputs.items()})
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:120]}")
            failures += 1
            continue
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
    if args.odd_shapes:
        from stencilflow_tpu.backend.stream import compile_chain_stream
        from stencilflow_tpu.synthesize import synthesize_stencil
        cases = [
            (3, (7, 100, 100), "diffusion", 1),
            (2, (53, 200), "cross", 2),
            (4, (10, 96, 53), "cross", 2),
            (2, (5, 33, 129), "box", 1),
            (3, (11, 17, 257), "diffusion", 1),
            (1, (9, 130), "hotspot", 1),
            (2, (100, 100), "box", 3),
            (2, (6, 24, 1000), "cross", 1),
            (2, (8, 24, 24), "hdiff", 1),
            # MXU-eligible box on a vreg-UNALIGNED plane (33 % 8, 96+33
            # % 128): compiled stage-major batch transforms must take
            # the per-plane fallback (Mosaic concatenate rejects
            # mismatched packed offsets — see RESULTS.md round 3)
            (2, (6, 33, 96), "box", 2),
        ]
        for stages, dims, shape, extent in cases:
            spec = synthesize_stencil(num_stages=stages, dimensions=dims,
                                      shape=shape, extent=extent,
                                      seed_data="random:0,1")
            nm = f"odd_{shape}_{'x'.join(map(str, dims))}"
            program = sft.parse_program(spec, name=nm)
            inputs = sft.load_input_arrays(program, seed=1)
            ref = sft.run_interpreter(program, inputs)
            try:
                fn = compile_chain_stream(program)
                out = fn({k: jnp.asarray(v) for k, v in inputs.items()})
                ok = all(arrays_are_equal(np.asarray(ref[o]),
                                          np.asarray(out[o]))
                         for o in program.outputs)
            except Exception as e:  # noqa: BLE001 — report, keep sweeping
                print(f"FAIL {nm}: {type(e).__name__}: {str(e)[:100]}")
                failures += 1
                continue
            print(f"{'OK  ' if ok else 'FAIL'} {nm} [stream]")
            failures += not ok
        total = len(paths) + len(cases)
    else:
        total = len(paths)
    print(f"\n{total} programs, {failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
