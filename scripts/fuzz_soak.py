#!/usr/bin/env python
"""Offline fuzz soak: drive the CI fuzz properties over a much larger
seed range than the suite runs (the RESULTS.md "offline sweeps" hook,
re-runnable).  CPU-only; run with

    env PYTHONPATH= JAX_PLATFORMS=cpu python scripts/fuzz_soak.py \
        [--seeds 150] [--legs all_engines,rows,comm_overlap,...]

Exits non-zero on the first failing seed with the leg + seed printed
(reproduce via the same test function in tests/test_fuzz.py).
"""
from __future__ import annotations

import argparse
import os
import sys
import time
import traceback

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS",
    (os.environ.get("XLA_FLAGS", "")
     + " --xla_force_host_platform_device_count=8").strip())

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

# tests/conftest.py enables x64 under pytest; the soak must match or
# float64 programs (mixed_dtype leg) silently truncate in the jnp
# backends and fail the dtype asserts
import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

LEGS = ["all_engines", "multi_output", "deep", "mxu", "mxu_bf16",
        "rows", "rows_outofcore", "comm_overlap", "jtiled_split",
        "mixed_dtype", "mixed_dtype_sharded"]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=150)
    ap.add_argument("--offset", type=int, default=10_000,
                    help="seed offset (keeps soak seeds disjoint from CI)")
    ap.add_argument("--legs", default="all")
    args = ap.parse_args()
    legs = LEGS if args.legs == "all" else args.legs.split(",")

    import test_fuzz as tf
    fns = {
        "all_engines": tf.test_random_program_all_engines,
        "multi_output": tf.test_random_multi_output_programs,
        "deep": tf.test_deep_chain_stream_and_sim,
        "mxu": tf.test_affine_mxu_configurations,
        "mxu_bf16": tf.test_affine_mxu_bf16_envelope,
        "rows": tf.test_random_2d_program_rows,
        "rows_outofcore": tf.test_random_2d_rows_outofcore_composition,
        "comm_overlap": tf.test_random_program_comm_overlap,
        "jtiled_split": tf.test_random_jtiled_interior_split,
        "mixed_dtype": tf.test_random_mixed_dtype_programs,
        "mixed_dtype_sharded": tf.test_random_mixed_dtype_sharded,
    }
    t0 = time.time()
    ran = 0
    for leg in legs:
        fn = fns[leg]
        for s in range(args.offset, args.offset + args.seeds):
            try:
                fn(s)
            except Exception:
                print(f"FAIL leg={leg} seed={s}", flush=True)
                traceback.print_exc()
                return 1
            ran += 1
        print(f"leg {leg}: {args.seeds} seeds OK "
              f"({time.time() - t0:.0f}s elapsed)", flush=True)
    print(f"soak OK: {ran} runs across {len(legs)} legs "
          f"in {time.time() - t0:.0f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
