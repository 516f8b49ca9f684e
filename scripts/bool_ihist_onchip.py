#!/usr/bin/env python
"""On-chip validation of bool i-history through the Pallas lowerings.

Round 4 found that a bool field read at a nonzero i-offset crashed the
Mosaic compiler (i1 ring + history shifts) and gated such programs to
fused XLA.  Round 5 lowers bool history as 0/1 int32 through the
panel/group slice machinery with `!= 0` at read exit (VERDICT r4 #5).
This script re-runs the 12-seed mixed-dtype fuzz on the REAL chip
through compile_chain_best (which now lands bool-i-history programs on
panel) plus explicit panel/group compiles of the bool-history shapes,
verifying against the numpy oracle.
"""
import os
import sys
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))

import numpy as np


def has_bool_ihistory(program) -> bool:
    for kspec in program.kernels.values():
        for field, offsets in kspec.accesses().items():
            if np.dtype(program.field_dtype(field)).kind != "b":
                continue
            for offs in offsets:
                if offs and offs[0] not in (0, None):
                    return True
    return False


def main() -> int:
    import jax.numpy as jnp

    import stencilflow_tpu as sft
    from test_fuzz import make_mixed_dtype_program
    from stencilflow_tpu.backend import compile_chain_best
    from stencilflow_tpu.backend.group import compile_chain_group
    from stencilflow_tpu.backend.panel import compile_chain_panel
    from stencilflow_tpu.backend.stream import compile_chain_stream

    failures = 0
    n_bool_hist = 0
    for seed in range(12):
        rng = np.random.default_rng(42000 + seed)
        spec = make_mixed_dtype_program(rng)
        p = sft.parse_program(spec, name=f"onchip_mix{seed}")
        inputs = sft.load_input_arrays(p, seed=seed)
        out_name = p.outputs[0]
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            ref = np.asarray(sft.run_interpreter(p, inputs)[out_name])
        bh = has_bool_ihistory(p)
        n_bool_hist += bh
        runs = [("best", lambda: compile_chain_best(p))]
        if bh:
            runs += [
                ("panel", lambda: (compile_chain_panel(p), "panel")),
                ("group", lambda: (compile_chain_group(p, group=2),
                                   "group")),
                ("stream", lambda: (compile_chain_stream(p), "stream")),
            ]
        for label, mk in runs:
            try:
                fn, backend = mk()
                got = np.asarray(fn({k: jnp.asarray(v)
                                     for k, v in inputs.items()})[out_name])
            except ValueError as e:
                print(f"SKIP seed={seed} {label}: {str(e)[:90]}")
                continue
            except Exception as e:  # noqa: BLE001
                print(f"FAIL seed={seed} {label}: "
                      f"{type(e).__name__}: {str(e)[:120]}")
                failures += 1
                continue
            if ref.dtype.kind in "ib":
                ok = np.array_equal(got, ref)
            else:
                ok = np.allclose(got.astype(np.float64),
                                 ref.astype(np.float64),
                                 rtol=2e-5, atol=1e-6)
            print(f"{'OK  ' if ok else 'FAIL'} seed={seed} "
                  f"[{label}:{backend}] bool_ihist={bh}")
            failures += not ok
    print(f"\n12 seeds ({n_bool_hist} with bool i-history), "
          f"{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
