"""Fused Pallas TPU backend: the whole kernel chain as ONE overlapped-tile
Mosaic kernel.

This is the performance backend — the TPU-native equivalent of the
reference's full-chip FPGA pipeline (every kernel a processing element
connected by FIFOs, /root/reference/stencilflow/sdfg_generator.py:219-577).
Where the FPGA streams one vector per cycle through all kernels with line
buffers and delay FIFOs holding the working set on-chip, we stream *tiles*
through all kernels with the working set in VMEM:

* the grid walks core tiles of the (padded) domain;
* every input block is a halo-widened window (``pl.Element`` indexing) so
  each HBM element is read once per tile (plus halo overlap) and written
  once — the minimum-communication-volume model the reference reports
  (kernel_chain_graph.py:749-768) becomes the actual traffic;
* all intermediate stages live and die in VMEM/registers (the tile evaluator
  frees dead stages so Mosaic can reuse buffers);
* out-of-domain reads are masked per boundary condition with global
  coordinates derived from ``pl.program_id``.

Tile sizes are chosen to respect the (8, 128) VPU register shape and a VMEM
budget (config.TPU_VMEM_BYTES * VMEM_PLANNER_FRACTION).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import config, ir
from ..config import TPU_VMEM_BYTES, VMEM_PLANNER_FRACTION
from ..frontend.analysis import ChainAnalysis
from ..frontend.chain import ChainGraph
from .fast_tile import evaluate_chain_fast, field_margins
from .tile_eval import evaluate_chain_tile
from .xla import chain_halo

Vec3 = Tuple[int, int, int]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def plan_tiles(program: ir.Program, halo: Vec3,
               vmem_budget: Optional[int] = None,
               graph: Optional[ChainGraph] = None) -> Tuple[Vec3, Vec3]:
    """Choose (tile, padded_dims).

    The lane dim (k) is tiled in multiples of 128, the sublane dim (j) in
    multiples of 8, the outer dim (i) freely.  The number of simultaneously
    live widened tiles is bounded by the chain's peak live-field count; total
    VMEM stays under the budget.
    """
    dims = program.dimensions
    budget = vmem_budget or int(TPU_VMEM_BYTES * VMEM_PLANNER_FRACTION)
    itemsize = max(np.dtype(program.field_dtype(f)).itemsize
                   for f in list(program.inputs) + list(program.kernels))

    # peak live fields: inputs + kernels is a safe overestimate; the
    # evaluator frees dead fields, so use a simple live-range count
    graph = graph or ChainGraph.build(program)
    order = graph.kernel_order
    from .tile_eval import last_use_map
    last_use = last_use_map(program, order, program.outputs)
    peak = 0
    live = set(program.inputs)
    for idx, kname in enumerate(order):
        live.add(kname)
        peak = max(peak, len(live))
        live -= {f for f, l in last_use.items() if l == idx and
                 f not in program.outputs}
    peak = max(peak, 2)

    def widened_bytes(t: Vec3) -> int:
        n = 1
        for d in range(3):
            n *= t[d] + 2 * halo[d]
        return n * itemsize * peak

    # start from full domain, shrink k to lane multiples, then j, then i
    tk = _round_up(min(dims[2], 2048), 128)
    tj = _round_up(min(dims[1], 256), 8)
    ti = min(dims[0], 8)
    # shrink dims until under budget (k first, then j, then i)
    while widened_bytes((ti, tj, tk)) > budget and tk > 128:
        tk //= 2
        tk = _round_up(tk, 128)
    while widened_bytes((ti, tj, tk)) > budget and tj > 8:
        tj //= 2
        tj = _round_up(tj, 8)
    while widened_bytes((ti, tj, tk)) > budget and ti > 1:
        ti = max(1, ti // 2)
    tile = (ti, tj, tk)
    padded = tuple(_round_up(dims[d], tile[d]) for d in range(3))
    return tile, padded


def _kernel_body(program: ir.Program, graph: ChainGraph, halo: Vec3,
                 tile: Vec3, input_names, input_masks, *refs):
    n_in = len(input_names)
    in_refs = refs[:n_in]
    out_refs = refs[n_in:]
    origin = tuple(pl.program_id(d) * tile[d] for d in range(3))

    tiles: Dict[str, Any] = {}
    for name, mask, ref in zip(input_names, input_masks, in_refs):
        if mask is None:          # scalar (SMEM (1,1))
            tiles[name] = ref[0, 0]
        else:
            tiles[name] = ref[...]
    results = evaluate_chain_tile(program, graph, tiles, origin, halo)
    core = tuple(slice(halo[d], halo[d] + tile[d]) for d in range(3))
    for out_name, ref in zip(program.outputs, out_refs):
        ref[...] = results[out_name][core]


def _fast_kernel_body(analysis: ChainAnalysis, halo: Vec3, tile: Vec3,
                      input_names, input_masks, *refs):
    """Mask-free interior kernel (fast_tile.py); shell fixed up by caller."""
    program = analysis.program
    n_in = len(input_names)
    in_refs = refs[:n_in]
    out_refs = refs[n_in:]
    tiles: Dict[str, Any] = {}
    for name, mask, ref in zip(input_names, input_masks, in_refs):
        tiles[name] = ref[0, 0] if mask is None else ref[...]
    margins = field_margins(analysis, halo)
    results = evaluate_chain_fast(analysis, tiles, tile, margins, halo)
    for out_name, ref in zip(program.outputs, out_refs):
        res = results[out_name]
        m = margins[out_name]
        core = tuple(slice(m[d], m[d] + tile[d]) for d in range(3))
        ref[...] = res[core]


def _shell_fixup(program: ir.Program, graph: ChainGraph, halo: Vec3,
                 padded_inputs: Dict[str, Any], outputs: Dict[str, Any],
                 dims: Vec3) -> Dict[str, Any]:
    """Overwrite the H-wide border shell of each output with the exact
    (BC-masked) evaluation.  ``padded_inputs`` are the H-padded (and
    tile-rounded) arrays already built for the Pallas call; padded coords =
    global + H in each spanned dim."""
    for d in range(3):
        if halo[d] == 0 or dims[d] == 0:
            continue
        thick = min(halo[d], dims[d])
        for side in (0, 1):
            start = [0, 0, 0]
            size = list(dims)
            start[d] = 0 if side == 0 else dims[d] - thick
            size[d] = thick
            windows = {}
            for name, spec in program.inputs.items():
                arr = padded_inputs[name]
                if spec.is_scalar:
                    windows[name] = arr
                    continue
                sl = tuple(
                    slice(start[dd], start[dd] + size[dd] + 2 * halo[dd])
                    for dd in range(3) if spec.dim_mask[dd])
                windows[name] = arr[sl]
            exact = evaluate_chain_tile(program, graph, windows,
                                        tuple(start), halo)
            core = tuple(slice(halo[dd], halo[dd] + size[dd])
                         for dd in range(3))
            for o in program.outputs:
                outputs[o] = jax.lax.dynamic_update_slice(
                    outputs[o], exact[o][core].astype(outputs[o].dtype),
                    tuple(start))
    return outputs


def compile_chain_pallas(program: ir.Program,
                         analysis: Optional[ChainAnalysis] = None,
                         tile: Optional[Vec3] = None,
                         interpret: bool = False,
                         vmem_budget: Optional[int] = None,
                         mode: str = "auto"):
    """Build a jitted ``fn(inputs: dict) -> outputs: dict`` around one fused
    Pallas kernel for the whole chain.

    ``mode``: "masked" evaluates BCs inside the kernel (tile_eval); "fast"
    runs the mask-free interior kernel (fast_tile) plus an exact border-shell
    fixup in XLA; "auto" picks fast when the domain dwarfs the shell.
    """
    analysis = analysis or ChainAnalysis.run(program)
    from .tile_eval import reject_unsupported_mosaic
    reject_unsupported_mosaic(program, interpret)
    graph = analysis.graph
    halo = chain_halo(analysis)
    dims = program.dimensions
    if mode == "auto":
        # The mask-free interior kernel is ~15% faster than the masked one,
        # but its XLA border-shell fixup currently costs more than it saves;
        # keep the exact in-kernel BC path as the default.
        mode = "masked"
    if tile is None:
        tile, padded = plan_tiles(program, halo, vmem_budget,
                                  graph=analysis.graph)
    else:
        padded = tuple(_round_up(dims[d], tile[d]) for d in range(3))
    grid = tuple(padded[d] // tile[d] for d in range(3))

    input_names = list(program.inputs)
    input_masks = []
    in_specs = []
    for name in input_names:
        spec = program.inputs[name]
        if spec.is_scalar:
            input_masks.append(None)
            in_specs.append(pl.BlockSpec((1, 1), lambda i, j, k: (0, 0),
                                         memory_space=pltpu.SMEM))
            continue
        spanned = [d for d in range(3) if spec.dim_mask[d]]
        input_masks.append(spec.dim_mask)
        block = tuple(pl.Element(tile[d] + 2 * halo[d]) for d in spanned)

        def index_map(i, j, k, spanned=spanned, tile=tile):
            gidx = (i, j, k)
            return tuple(gidx[d] * tile[d] for d in spanned)

        in_specs.append(pl.BlockSpec(block, index_map,
                                     memory_space=pltpu.VMEM))

    out_specs = []
    out_shapes = []
    for out in program.outputs:
        out_specs.append(pl.BlockSpec(tile, lambda i, j, k: (i, j, k),
                                      memory_space=pltpu.VMEM))
        # canonicalize: without jax_enable_x64, f64 programs compute in f32
        out_dtype = jax.dtypes.canonicalize_dtype(program.kernels[out].dtype)
        out_shapes.append(jax.ShapeDtypeStruct(padded, out_dtype))

    if mode == "fast":
        kernel = functools.partial(_fast_kernel_body, analysis, halo, tile,
                                   input_names, input_masks)
    else:
        kernel = functools.partial(_kernel_body, program, graph, halo, tile,
                                   input_names, input_masks)

    # widened input tiles + output tile, double-buffered, + per-stage
    # eval temporaries (one widened tile per live stage, conservatively
    # all stages); limits above 64 MiB halve DMA throughput
    # (config.vmem_limit_for)
    wtile = int(np.prod([tile[d] + 2 * halo[d] for d in range(3)])) * 4
    est = (2 * (len(input_names) + len(program.outputs)) * wtile +
           len(program.kernels) * wtile)
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs[0] if len(out_specs) == 1 else out_specs,
        out_shape=out_shapes[0] if len(out_shapes) == 1 else out_shapes,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=config.vmem_limit_for(est)),
    )

    raw = program.raw_dimensions

    def forward(inputs: Dict[str, Any]) -> Dict[str, Any]:
        args = []
        padded_inputs = {}
        for name in input_names:
            spec = program.inputs[name]
            arr = jnp.asarray(inputs[name])
            if spec.is_scalar:
                padded_inputs[name] = arr
                args.append(arr.reshape(1, 1))
                continue
            spanned = [d for d in range(3) if spec.dim_mask[d]]
            shape = tuple(dims[d] for d in spanned)
            arr = arr.reshape(shape)
            pads = [(halo[d], halo[d] + (padded[d] - dims[d]))
                    for d in spanned]
            arr = jnp.pad(arr, pads)
            padded_inputs[name] = arr
            args.append(arr)
        res = call(*args)
        if len(program.outputs) == 1:
            res = (res,)
        core = tuple(slice(0, dims[d]) for d in range(3))
        out = {o: r[core] for o, r in zip(program.outputs, res)}
        if mode == "fast" and any(halo):
            out = _shell_fixup(program, graph, halo, padded_inputs, out,
                               dims)
        return {o: v.reshape(raw) for o, v in out.items()}

    return jax.jit(forward)


def run_chain_pallas(program: ir.Program, inputs: Dict[str, Any],
                     interpret: bool = False,
                     tile: Optional[Vec3] = None) -> Dict[str, np.ndarray]:
    fn = compile_chain_pallas(program, interpret=interpret, tile=tile)
    out = fn({k: jnp.asarray(v) for k, v in inputs.items()})
    return {k: np.asarray(v) for k, v in out.items()}
