"""Mask-free interior evaluator: shrinking-margin slice semantics.

The hot path of the fused Pallas backend.  Observation: a cell farther than
the chain's cumulative halo ``H`` from every domain border never triggers an
out-of-domain read in ANY stage (each stage's reads reach at most its radius,
and radii along any path sum to ≤ H).  So the interior can be computed with
no boundary-condition logic at all: every field buffer carries a per-dim
*margin* (``ChainAnalysis.stage_halo``: the halo its consumers still need),
and a read of field ``f`` at offset ``o`` producing a result with margin
``m`` is the static slice

    f_buf[ margin_f - m + o : margin_f - m + o + T + 2m ]     (per dim)

— in-bounds because ``margin_f >= m + |o|`` by the stage-halo recurrence
(analysis.py:330-353).  No rolls, no iota masks, no selects: Mosaic lowers
these overlapping VMEM slices to plain vector loads with offsets, which is
the speed-of-light formulation of a stencil chain on the VPU.

Cells within ``H`` of a border are wrong here (they see zero-padding instead
of their BC); the Pallas backend overwrites that thin shell with the exact
masked evaluator afterwards (see pallas.py `_shell_fixup`).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax.numpy as jnp
from jax import lax

from .. import ir
from ..frontend.analysis import ChainAnalysis

Vec3 = Tuple[int, int, int]


def field_margins(analysis: ChainAnalysis, halo: Vec3
                  ) -> Dict[str, Vec3]:
    """Margin (extra border carried) per field buffer: inputs carry the full
    halo budget, kernels carry their stage halo."""
    margins: Dict[str, Vec3] = {n: halo for n in analysis.program.inputs}
    margins.update(analysis.stage_halo())
    return margins


def _slice_read(buf, buf_margin: Vec3, offsets: ir.Offsets,
                target_margin: Vec3, tile: Vec3):
    starts, sizes = [], []
    for d in range(3):
        o = offsets[d] or 0
        start = buf_margin[d] - target_margin[d] + o
        size = tile[d] + 2 * target_margin[d]
        assert 0 <= start and start + size <= buf.shape[d], (
            f"fast-path slice out of range: dim {d}, start {start}, "
            f"size {size}, buf {buf.shape[d]}")
        starts.append(start)
        sizes.append(start + size)
    return lax.slice(buf, starts, sizes)


def _eval(expr: ir.Expr, fields, margins, env, target_margin, tile,
          const_dtype=None):
    """Slice-read strategy over the shared walker (tile_eval)."""
    from .tile_eval import eval_expr_generic

    def read_fn(field, offsets):
        buf = fields[field]
        if not hasattr(buf, "shape") or buf.ndim == 0:
            return buf
        return _slice_read(buf, margins[field], offsets,
                           target_margin, tile)

    return eval_expr_generic(expr, env, read_fn, const_dtype)


def evaluate_chain_fast(analysis: ChainAnalysis,
                        tile_fields: Dict[str, Any],
                        tile: Vec3,
                        margins: Optional[Dict[str, Vec3]] = None,
                        halo: Optional[Vec3] = None,
                        keep: Optional[Sequence[str]] = None
                        ) -> Dict[str, Any]:
    """Evaluate the chain on one tile, mask-free.

    ``tile_fields[input]`` must have shape ``tile + 2*margin(input)`` in its
    spanned dims (zero-padding beyond the domain is fine — those values only
    reach shell cells, which the caller fixes up).  Returns each requested
    field at shape ``tile + 2*margin(field)``.
    """
    program = analysis.program
    graph = analysis.graph
    if halo is None:
        from .xla import chain_halo
        halo = chain_halo(analysis)
    margins = margins or field_margins(analysis, halo)

    fields: Dict[str, Any] = {}
    for iname, spec in program.inputs.items():
        arr = tile_fields[iname]
        if spec.is_scalar:
            fields[iname] = jnp.asarray(arr)
            continue
        arr = jnp.asarray(arr)
        m = margins[iname]
        full = tuple(tile[d] + 2 * m[d] for d in range(3))
        if not all(spec.dim_mask):
            shape = tuple(full[d] if spec.dim_mask[d] else 1
                          for d in range(3))
            arr = jnp.broadcast_to(arr.reshape(shape), full)
        fields[iname] = arr

    names = list(keep) if keep is not None else list(program.outputs)
    order = graph.kernel_order
    from .tile_eval import last_use_map
    last_use = last_use_map(program, order, names)

    for idx, kname in enumerate(order):
        kspec = program.kernels[kname]
        m = margins[kname]
        shape = tuple(tile[d] + 2 * m[d] for d in range(3))
        from .tile_eval import const_dtype_of
        cdt = const_dtype_of(kspec)
        env: Dict[str, Any] = {}
        for stmt in kspec.statements:
            env[stmt.lhs] = _eval(stmt.rhs, fields, margins, env, m, tile,
                                  cdt)
        result = jnp.asarray(env[kspec.output_statement.lhs])
        if result.shape != shape:
            result = jnp.broadcast_to(result, shape)
        fields[kname] = result.astype(kspec.dtype)
        for f in [f for f, last in last_use.items() if last == idx]:
            if f in fields and f not in names:
                del fields[f]

    return {n: fields[n] for n in names}
