"""Probe: dynamic SMEM table reads inside a Mosaic kernel.

The composed-stage lowering (backend/compose.py) selects per-output-plane
i-combination weights from a small SMEM table with a TRACED row index:
``w = table[row, d]; acc += w * plane``.  This probe verifies Mosaic
supports (a) dynamic scalar indexing of an SMEM ref and (b) broadcasting
the resulting f32 scalar over a VMEM plane — on chip and in interpret
mode — before the real kernel depends on it.
"""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, COLS = 64, 256
NTAB, NOFF = 7, 5


def kernel(tab_ref, x_ref, o_ref):
    g = pl.program_id(0)
    n = pl.num_programs(0)
    # traced row index with the same clamp shape the composed plan uses
    D = jnp.int32(NTAB // 2)
    row = jnp.where(g < D, g,
                    jnp.where(g >= n - D, jnp.int32(NTAB) + g - n,
                              D)).astype(jnp.int32)
    acc = jnp.zeros((ROWS, COLS), jnp.float32)
    for d in range(NOFF):
        w = tab_ref[row, d]
        acc = acc + w * (x_ref[...] + jnp.float32(d))
    o_ref[...] = acc


def build(steps, interpret):
    return pl.pallas_call(
        kernel,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((NTAB, NOFF), lambda g: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((ROWS, COLS), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROWS, COLS), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((steps * ROWS, COLS), jnp.float32),
        interpret=interpret,
    )


def main():
    steps = 9
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.normal(size=(NTAB, NOFF)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(ROWS, COLS)), jnp.float32)

    def expect():
        out = []
        D = NTAB // 2
        for g in range(steps):
            row = g if g < D else (NTAB + g - steps if g >= steps - D else D)
            acc = sum(np.asarray(tab)[row, d] * (np.asarray(x) + d)
                      for d in range(NOFF))
            out.append(acc)
        return np.concatenate(out, axis=0)

    ref = expect()
    on_tpu = jax.devices()[0].platform != "cpu"
    # interpret mode through the device tunnel dispatches per ref access
    # (minutes for even this toy kernel): compiled-only on TPU, the
    # interpret leg is covered by the CPU run
    for interp in ([True] if not on_tpu else [False]):
        got = np.asarray(jax.jit(build(steps, interp))(tab, x))
        err = np.abs(got - ref).max() / max(1e-9, np.abs(ref).max())
        print(f"interpret={interp}: max rel err {err:.2e} "
              f"{'OK' if err < 1e-6 else 'FAIL'}", flush=True)
        if err >= 1e-6:
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
