"""Shared io plumbing for the stacked-plane backends (panel, overlap).

Both backends stack B consecutive i-planes along the sublane axis and
stream one panel per grid step; everything about how program inputs
enter the kernel and how results leave it is identical:

* input classification (scalar / full stream / partial-rank stream /
  static) and the matching BlockSpecs — including the Mosaic workaround
  for partial-rank i-spanning inputs, whose (B, jk) block violates the
  last-two-dims divisibility rule when B % 8 != 0, so the (small) whole
  array ships instead and rows are sliced in-kernel with ``pl.ds``.
  When the block IS legal (B a sublane multiple, 4-byte dtype) the
  partial input streams per-panel instead ("stream_rows") — required
  for row-streamed 2-D programs (rotate_2d_to_rows), whose main input
  is (i, k)-masked and would otherwise ship whole into VMEM;
* panel materialization on ingest (reshape full blocks, row-slice +
  broadcast partial ones);
* the k-axis shift-in-fill read (one slice + one concat with exact
  constant/shrink fill semantics, the measured winner over roll+mask at
  K >= 256, RESULTS.md);
* the dict-in/dict-out ``forward`` wrapper around the pallas_call.
"""
from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import ir


def classify_input(spec: ir.InputSpec, B: int) -> str:
    """Kind of BlockSpec an input gets at panel size ``B``: ``scalar``,
    full-rank per-panel ``stream``, partial-rank per-panel
    ``stream_rows`` (legal only when B is a sublane multiple and the
    dtype is 4-byte — Mosaic's last-two-dims divisibility rule),
    whole-array ``stream_partial``, or i-invariant ``static``."""
    if spec.is_scalar:
        return "scalar"
    if spec.dim_mask[0]:
        if spec.dim_mask[1] and spec.dim_mask[2]:
            return "stream"
        if (any(spec.dim_mask[1:]) and B % 8 == 0
                and np.dtype(spec.dtype).itemsize == 4):
            return "stream_rows"
        return "stream_partial"
    return "static"


def input_resident_bytes(program: ir.Program, input_names, B: int,
                         dims) -> int:
    """VMEM bytes the input BlockSpecs keep resident at panel size B:
    2x the per-panel block for streamed kinds (Pallas double-buffers),
    but the WHOLE array for ``stream_partial`` — its block IS the full
    (I, jk) array, which for large odd-factor domains (e.g. rotated
    4500^2 f32 -> 81 MiB) dwarfs the rings; un-counted it let the gate
    pass and the kernel die inside Mosaic at first call (ADVICE r2).
    ``static`` inputs keep their full (jk) plane."""
    I, J, K = dims
    total = 0
    for name in input_names:
        spec = program.inputs[name]
        kind = classify_input(spec, B)
        if kind == "scalar":
            continue
        isz = np.dtype(spec.dtype).itemsize
        if kind in ("stream", "stream_rows"):
            jk = 1
            for d in (1, 2):
                if spec.dim_mask[d]:
                    jk *= dims[d]
            total += 2 * B * jk * isz
        else:  # stream_partial / static: whole spanned array resident
            n = 1
            for d in range(3):
                if spec.dim_mask[d]:
                    n *= dims[d]
            total += n * isz
    return total


def has_partial_rank_risk(program: ir.Program) -> bool:
    """True when some input would classify ``stream_partial`` at a
    non-sublane-multiple B but ``stream_rows`` at B % 8 == 0 — i.e. the
    auto-panel cascade should prefer sublane-multiple divisors."""
    return any(
        not sp.is_scalar and sp.dim_mask[0]
        and not (sp.dim_mask[1] and sp.dim_mask[2])
        and any(sp.dim_mask[1:])
        and np.dtype(sp.dtype).itemsize == 4
        for sp in program.inputs.values())


def build_input_specs(program: ir.Program, input_names, B: int,
                      dims, n_panels: int
                      ) -> Tuple[List[str], List[Any]]:
    """(input_kinds, in_specs) for one-panel-per-step streaming."""
    I, J, K = dims
    input_kinds: List[str] = []
    in_specs: List[Any] = []
    for name in input_names:
        spec = program.inputs[name]
        kind = classify_input(spec, B)
        input_kinds.append(kind)
        if kind == "scalar":
            in_specs.append(pl.BlockSpec((1, 1), lambda g: (0, 0),
                                         memory_space=pltpu.SMEM))
        elif kind == "stream":
            in_specs.append(pl.BlockSpec(
                (B, J, K),
                lambda g, np_=n_panels:
                    (jnp.minimum(g, np_ - 1), 0, 0),
                memory_space=pltpu.VMEM))
        elif kind == "stream_rows":
            # (B, jk...) blocks satisfy Mosaic's last-two-dims rule:
            # stream panels instead of shipping the whole array.
            # (i,)-only rank-1 inputs stay on the whole-array path —
            # they are I*itemsize bytes, and a 1-D block window is
            # not worth the Mosaic edge case.
            jk = [d for d in (1, 2) if spec.dim_mask[d]]
            blk = (B,) + tuple((J, K)[d - 1] for d in jk)
            in_specs.append(pl.BlockSpec(
                blk,
                lambda g, np_=n_panels, n=len(jk):
                    (jnp.minimum(g, np_ - 1),) + (0,) * n,
                memory_space=pltpu.VMEM))
        elif kind == "stream_partial":
            jk = [d for d in (1, 2) if spec.dim_mask[d]]
            sizes = [I] + [(J, K)[d - 1] for d in jk]
            in_specs.append(pl.BlockSpec(
                tuple(sizes),
                lambda g, n=len(jk): (0,) * (n + 1),
                memory_space=pltpu.VMEM))
        else:  # static
            spanned = [d for d in (1, 2) if spec.dim_mask[d]]
            in_specs.append(pl.BlockSpec(
                tuple((J, K)[d - 1] for d in spanned),
                lambda g, n=len(spanned): (0,) * n,
                memory_space=pltpu.VMEM))
    return input_kinds, in_specs


def ingest_panel(spec: ir.InputSpec, kind: str, ref, g, B: int, dims):
    """The (B*J, K) panel of planes [g*B, g*B + B) from an input ref."""
    I, J, K = dims
    if kind == "stream":
        return ref[...].reshape(B * J, K)
    pj = J if spec.dim_mask[1] else 1
    pk = K if spec.dim_mask[2] else 1
    if kind == "stream_rows":
        rows = ref[...]          # the block IS this panel's rows
    else:
        rows = ref[pl.ds(g * B, B)]
    return jnp.broadcast_to(rows.reshape(B, pj, pk),
                            (B, J, K)).reshape(B * J, K)


def shift_fill(x, o: int, axis: int, fill):
    """result[p] = x[p + o] along ``axis``, fill shifted in at the
    border — one slice + one concat, replacing roll (2 slices + concat)
    + iota-mask select.  Exact constant/shrink BC semantics on an
    unwidened domain-spanning plane at origin 0.  Shared by the plane
    streamer (both axes) and the stacked backends (k axis)."""
    n0, n1 = x.shape
    fv = jnp.asarray(fill, x.dtype)
    if axis == 0:
        if o > 0:
            parts = [jax.lax.slice(x, (o, 0), (n0, n1)),
                     jnp.full((o, n1), fv, x.dtype)]
        else:
            parts = [jnp.full((-o, n1), fv, x.dtype),
                     jax.lax.slice(x, (0, 0), (n0 + o, n1))]
    else:
        if o > 0:
            parts = [jax.lax.slice(x, (0, o), (n0, n1)),
                     jnp.full((n0, o), fv, x.dtype)]
        else:
            parts = [jnp.full((n0, -o), fv, x.dtype),
                     jax.lax.slice(x, (0, 0), (n0, n1 + o))]
    return jnp.concatenate(parts, axis=axis)


def shift_fill_k(x, o: int, fill):
    """result[:, k] = x[:, k + o], out-of-range filled with ``fill``."""
    return shift_fill(x, o, 1, fill)


def narrow_store_dtype(dt, interpret: bool):
    """Mosaic crashes storing narrow-int/bool OUTPUT blocks at vreg-
    unaligned panel shapes with B > 1 (measured on v5e: an int16 output
    at (6,7,6) dims, B >= 2 — same packed-vreg bug family as the
    round-3 tpu.concatenate guard).  Compiled kernels therefore store
    such outputs as int32 and the forward wrapper casts back outside
    the pallas_call — value-exact (the kernel result is cast to the
    narrow dtype FIRST, so wraparound happens per the oracle)."""
    dt = jax.dtypes.canonicalize_dtype(dt)
    if interpret:
        return dt
    if np.dtype(dt).kind in "iub" and np.dtype(dt).itemsize < 4:
        return jnp.int32
    return dt


def make_forward(program: ir.Program, input_names, dims, call,
                 n_outputs: int):
    """Dict-in/dict-out wrapper: reshape inputs to spanned dims, call,
    reshape outputs to the program's raw rank (casting back any output
    the kernel stored widened — narrow_store_dtype)."""
    raw = program.raw_dimensions

    def forward(inputs: Dict[str, Any]) -> Dict[str, Any]:
        args = []
        for name in input_names:
            spec = program.inputs[name]
            arr = jnp.asarray(inputs[name])
            if spec.is_scalar:
                args.append(arr.reshape(1, 1))
                continue
            spanned = [d for d in range(3) if spec.dim_mask[d]]
            args.append(arr.reshape(tuple(dims[d] for d in spanned)))
        res = call(*args)
        if n_outputs == 1:
            res = (res,)
        return {o: r.astype(jax.dtypes.canonicalize_dtype(
                    program.kernels[o].dtype)).reshape(raw)
                for o, r in zip(program.outputs, res)}

    return jax.jit(forward)
