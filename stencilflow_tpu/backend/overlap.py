"""Overlap-mode shallow-chain backend: recompute halos, no stage rings.

Deep chains amortize per-stage state (rings) over many stages; *shallow*
chains (1-3 stages) are dominated by the per-stage ring machinery itself
— the measured 256^3 x2 plateau (~0.48 of the HBM roofline, RESULTS.md)
is set by ring stores, ring-pair concats, and modulo-indexed reads, not
by compute.

This lowering keeps a ring ONLY for each streamed program input (depth
3: panels q-1, q, q+1) and evaluates every kernel stage per grid step
over an i-OVERLAPPED row block, wide enough that all downstream reads
are in-block:

* per-stage i-extents come from a reverse topological pass
  (``need_lo/need_hi``, the transpose of the forward lag algebra in
  backend/stream.py);
* every intermediate read is a STATIC ``lax.slice`` of the producer's
  temporary — no ring slots, no modulo, no dynamic ds;
* j-offsets fold into the same slice (rows are J-periodic) and one
  periodic seam mask per (rows, oj) fixes seam rows and the global j
  boundary at once — the trick of backend/panel.py generalized to
  variable row counts;
* the only recompute waste is the per-stage halo: (B + 2H)/B per
  stage, negligible for the shallow chains this path targets.

Same dataflow ancestry as the other backends: the reference's
shift-register pipeline (/root/reference/stencilflow/stencil/
intel_fpga.py:367-440) with the delay alignment transposed into spatial
overlap (cf. the overlapped-tile backend, backend/tile_eval.py, which
does the same across (j, k) tiles).

Measured outcome (RESULTS.md round 2): before the vmem-limit fix this
backend tied gated panel mode at ~40 GCell/s on jacobi3d 256^3 x2 —
the plateau was the crippled DMA pipeline (vmem_limit_bytes > 64 MiB
halves block-DMA throughput on v5e), not the per-stage reads.  With
``config.vmem_limit_for`` sizing the limit to the kernel's real state,
overlap reaches **58.6 GCell/s (0.73 of the HBM roofline)** at
256^3 x2 vs ~40 for panel (whose per-stage rings push its VMEM state
past the fast-limit threshold at the panel sizes shallow chains want),
and ties stream at 512^3 x2 (~0.52; the pure-DMA ceiling of the same
grid structure measures 0.80).  compile_chain_best selects overlap for
untiled VPU chains with cumulative i-extent <= 2.

Scope (callers fall back otherwise): single chip, untiled planes, VPU
stages only, no spill, B | I, and every cumulative extent <= B.  All BC
kinds (constant / copy / shrink) and input ranks are supported.
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
from ..config import JUNK_VAL
from ..frontend.analysis import ChainAnalysis
from .stacked_io import (build_input_specs, has_partial_rank_risk,
                         ingest_panel, input_resident_bytes,
                         make_forward, narrow_store_dtype, shift_fill_k)
from .tile_eval import eval_kernel_statements


def _chain_needs(program: ir.Program, analysis: ChainAnalysis
                 ) -> Dict[str, Tuple[int, int]]:
    """Per-field i-extents (need_lo, need_hi): the rows of field f that
    must exist so every transitive consumer's core B planes are
    computable.  Reverse topological transpose of stream.py's forward
    lag algebra; the j terms add one plane of slack so folded-j slice
    starts stay in range (seam rows are overwritten by the j mask)."""
    needs: Dict[str, Tuple[int, int]] = {}
    for o in program.outputs:
        needs[o] = (0, 0)
    order = list(analysis.graph.kernel_order)
    for kname in reversed(order):
        lo_c, hi_c = needs.get(kname, (0, 0))
        needs.setdefault(kname, (lo_c, hi_c))
        kspec = program.kernels[kname]
        accs = dict(kspec.accesses())
        for f, bc in kspec.boundary_conditions.items():
            if bc.kind == ir.BCKind.COPY:
                accs.setdefault(f, ())
                accs[f] = tuple(accs[f]) + ((0, 0, 0),)
        for f, alist in accs.items():
            lo_f, hi_f = needs.get(f, (0, 0))
            for a in alist:
                oi = a[0] or 0
                oj = a[1] or 0
                lo_f = max(lo_f, lo_c - oi + (1 if oj < 0 else 0))
                hi_f = max(hi_f, hi_c + oi + (1 if oj > 0 else 0))
            needs[f] = (lo_f, hi_f)
    return needs


def _overlap_kernel_body(program: ir.Program, analysis: ChainAnalysis,
                         needs: Dict[str, Tuple[int, int]], B: int,
                         input_names, input_kinds, shiftk: bool, *refs):
    dims = program.dimensions
    I, J, K = dims
    BJ = B * J
    n_panels = I // B
    n_in = len(input_names)
    n_out = len(program.outputs)
    in_refs = refs[:n_in]
    out_refs = refs[n_in:n_in + n_out]
    streamed = [n for n, k in zip(input_names, input_kinds)
                if k in ("stream", "stream_rows", "stream_partial")]
    rings = dict(zip(streamed, refs[n_in + n_out:]))
    g = pl.program_id(0)
    q = g - 1              # output panel this step computes

    scalar_cache: Dict[str, Any] = {}
    plane_cache: Dict[str, Any] = {}
    for name, kind, ref in zip(input_names, input_kinds, in_refs):
        if kind == "scalar":
            scalar_cache[name] = ref[0, 0]
        elif kind == "static":
            spec = program.inputs[name]
            pj = J if spec.dim_mask[1] else 1
            pk = K if spec.dim_mask[2] else 1
            plane_cache[name] = jnp.broadcast_to(
                ref[...].reshape(pj, pk), (J, K))

    # 1. ingest this step's input panel into the 3-deep ring
    for name, kind, ref in zip(input_names, input_kinds, in_refs):
        if kind not in ("stream", "stream_rows", "stream_partial"):
            continue

        @pl.when(g < n_panels)
        def _(name=name, kind=kind, ref=ref):
            slot = jax.lax.rem(g, jnp.int32(3))
            panel = ingest_panel(program.inputs[name], kind, ref, g, B,
                                 dims)
            rings[name][pl.ds(slot, 1)] = panel[None]

    # 2. compute every stage over its overlapped block, store output
    @pl.when((q >= 0) & (q < n_panels))
    def _():
        jmask_cache: Dict[Any, Any] = {}
        kmask_cache: Dict[Any, Any] = {}
        imask_cache: Dict[Any, Any] = {}

        def _jmask(oj, rows):
            key = (oj, rows)
            if key not in jmask_cache:
                t = jax.lax.broadcasted_iota(
                    jnp.int32, (rows, K), 0) % J + oj
                jmask_cache[key] = (t < 0) | (t >= J)
            return jmask_cache[key]

        def _kmask(ok, rows):
            key = (ok, rows)
            if key not in kmask_cache:
                t = jax.lax.broadcasted_iota(
                    jnp.int32, (rows, K), 1) + ok
                kmask_cache[key] = (t < 0) | (t >= K)
            return kmask_cache[key]

        def _imask(lo_c, rows, oi):
            # global plane of row r (consumer block) is
            # q*B - lo_c + r//J; the read targets plane + oi
            key = (lo_c, rows, oi)
            if key not in imask_cache:
                p = (jax.lax.broadcasted_iota(jnp.int32, (rows, K), 0)
                     // J + q * B - jnp.int32(lo_c) + jnp.int32(oi))
                imask_cache[key] = (p < 0) | (p >= I)
            return imask_cache[key]

        _shift_fill_k = shift_fill_k

        # materialize each streamed input's needed row window from its
        # ring: rows [q*B - lo, q*B + B + hi) via 3 slot slices
        vals: Dict[str, Any] = {}
        for name in streamed:
            lo, hi = needs.get(name, (0, 0))
            s0 = jax.lax.rem(q - 1 + 3, jnp.int32(3))
            s1 = jax.lax.rem(q, jnp.int32(3))
            s2 = jax.lax.rem(q + 1, jnp.int32(3))
            parts = []
            if lo:
                parts.append(rings[name][s0][BJ - lo * J:])
            parts.append(rings[name][s1])
            if hi:
                parts.append(rings[name][s2][:hi * J])
            vals[name] = (jnp.concatenate(parts, axis=0)
                          if len(parts) > 1 else parts[0])
            # rows mapping to OOB planes hold stale/garbage ring data;
            # every read of them is i-masked below, so they are
            # unobservable.

        def make_read(kname):
            kspec = program.kernels[kname]
            bcs = kspec.boundary_conditions
            lo_c, hi_c = needs[kname]
            rows_c = (lo_c + B + hi_c) * J

            def read(field, offsets):
                if field in scalar_cache:
                    return scalar_cache[field]
                oi, oj, ok = (offsets[0] or 0, offsets[1] or 0,
                              offsets[2] or 0)
                bc = bcs.get(field)
                fillv = (bc.value if bc is not None and
                         bc.kind == ir.BCKind.CONSTANT else
                         JUNK_VAL if bc is not None and
                         bc.kind == ir.BCKind.SHRINK else 0.0)
                is_copy = bc is not None and bc.kind == ir.BCKind.COPY

                if field in plane_cache:
                    # i-invariant plane: j/k shifts + union of masks
                    plane = plane_cache[field]
                    center = jnp.broadcast_to(
                        jnp.concatenate([plane] * (rows_c // J), axis=0)
                        if rows_c // J > 1 else plane, (rows_c, K))
                    val = center
                    if oj:
                        val = jnp.roll(val, -oj, axis=0)
                    if ok:
                        val = jnp.roll(val, -ok, axis=1)
                    m = None
                    for mm in ((_jmask(oj, rows_c) if oj else None),
                               (_imask(lo_c, rows_c, oi) if oi else None),
                               (_kmask(ok, rows_c) if ok else None)):
                        if mm is not None:
                            m = mm if m is None else (m | mm)
                    if m is None:
                        return val
                    return jnp.where(m, center if is_copy else
                                     jnp.asarray(fillv, val.dtype), val)

                lo_f, _hi_f = needs[field]
                src = vals[field]
                start = (lo_f - lo_c + oi) * J + oj
                assert 0 <= start and start + rows_c <= src.shape[0], (
                    field, offsets, start, rows_c, src.shape)
                val = jax.lax.slice(src, (start, 0), (start + rows_c, K))

                if is_copy:
                    cstart = (lo_f - lo_c) * J
                    center = jax.lax.slice(src, (cstart, 0),
                                           (cstart + rows_c, K))
                    if ok:
                        val = jnp.roll(val, -ok, axis=1)
                    m = None
                    for mm in ((_jmask(oj, rows_c) if oj else None),
                               (_imask(lo_c, rows_c, oi) if oi else None),
                               (_kmask(ok, rows_c) if ok else None)):
                        if mm is not None:
                            m = mm if m is None else (m | mm)
                    return (jnp.where(m, center, val)
                            if m is not None else val)

                if oj:
                    val = jnp.where(_jmask(oj, rows_c),
                                    jnp.asarray(fillv, val.dtype), val)
                if oi:
                    val = jnp.where(_imask(lo_c, rows_c, oi),
                                    jnp.asarray(fillv, val.dtype), val)
                if ok:
                    if shiftk:
                        val = _shift_fill_k(val, ok, fillv)
                    else:
                        val = jnp.where(_kmask(ok, rows_c),
                                        jnp.asarray(fillv, val.dtype),
                                        jnp.roll(val, -ok, axis=1))
                return val

            return read, rows_c

        out_ref_of = dict(zip(program.outputs, out_refs))
        for kname in analysis.graph.kernel_order:
            kspec = program.kernels[kname]
            read, rows_c = make_read(kname)
            result = jnp.asarray(eval_kernel_statements(kspec, read))
            if result.shape != (rows_c, K):
                result = jnp.broadcast_to(result, (rows_c, K))
            result = result.astype(
                jax.dtypes.canonicalize_dtype(kspec.dtype))
            vals[kname] = result
            if kname in out_ref_of:
                lo_c, _ = needs[kname]
                core = (jax.lax.slice(result, (lo_c * J, 0),
                                      (lo_c * J + BJ, K))
                        if result.shape[0] != BJ else result)
                oref = out_ref_of[kname]
                oref[...] = core.reshape(B, J, K).astype(oref.dtype)


def compile_chain_overlap(program: ir.Program,
                          analysis: Optional[ChainAnalysis] = None,
                          panel: int = 0,
                          interpret: bool = False,
                          vmem_budget: int =
                          config.TPU_STREAM_VMEM_BUDGET,
                          gate_frac: float = 0.7):
    """Overlap-mode compile; raises ValueError when the program shape
    doesn't fit this lowering (callers fall back).

    ``gate_frac`` scales the VMEM-estimate gate (default 0.7 of the
    budget, conservative for blind policy).  The autotuner relaxes it
    to 1.0 for explicitly requested panels: measured at (128,768,768)x2
    the over-gate B=4 ran at 49.3 GCell/s vs the stream fallback's 41.7
    (RESULTS.md round 2), and autotune catches Mosaic allocation
    failures at build/first-execution, so the safety margin blind
    policy needs does not apply there."""
    analysis = analysis or ChainAnalysis.run(program)
    from .tile_eval import reject_unsupported_mosaic
    reject_unsupported_mosaic(program, interpret)
    dims = program.dimensions
    I, J, K = dims
    needs = _chain_needs(program, analysis)
    # only i-spanning (ring-backed) inputs bound the panel: scalar and
    # static (j,k)/(k) inputs are read whole, outside the rings
    streamed = [n for n, sp in program.inputs.items()
                if not sp.is_scalar and sp.dim_mask[0]]
    H = max((max(lo, hi) for f, (lo, hi) in needs.items()
             if f in streamed), default=0)
    # VMEM estimate is affine in B: input rings (3 slots) + the widest
    # live temporary set + the Pallas pipeline's double-buffered io
    # blocks (the io windows count toward the budget GATE too, like
    # every other stream caller, so an oversized panel raises the
    # ValueError callers catch for fallback instead of failing inside
    # Mosaic)
    isz = {f: np.dtype(program.field_dtype(f)).itemsize
           for f in list(program.inputs) + list(program.kernels)}
    input_names_all = list(program.inputs)
    c1 = (sum(3 * J * K * isz[f] for f in streamed)
          + sum(J * K * isz[f] for f in needs if f in program.kernels)
          + sum(2 * J * K * isz[f] for f in program.outputs))
    c0 = sum((lo + hi) * J * K * isz[f]
             for f, (lo, hi) in needs.items() if f in program.kernels)

    def est_for(b: int) -> int:
        # rings + temporaries (affine in b) + the input blocks the
        # BlockSpecs keep resident — whole arrays for stream_partial
        # inputs (kind depends on b % 8; previously un-counted, ADVICE r2)
        return (c0 + c1 * b
                + input_resident_bytes(program, input_names_all, b, dims))

    if panel <= 0:
        # big panels amortize the halo recompute ((B+2H)/B per stage);
        # same ~1024-sublane-row op target as panel mode, floored at 4H
        # so the waste stays <= 50%; smallest divisor of I that fits —
        # preferring sublane multiples (B % 8 == 0) when a partial-rank
        # input would otherwise ship whole-array (stream_partial)
        target = max(1, 4 * H, (1024 // J) if J < 512 else 1)
        cands = [d for d in range(1, I + 1)
                 if I % d == 0 and d >= min(target, I)]
        if has_partial_rank_risk(program):
            c8 = [d for d in cands if d % 8 == 0]
            cands = c8 or cands
        panel = min(cands) if cands else I
        # Do NOT step the panel down to a smaller divisor when the
        # estimate exceeds the budget: halo recompute+re-read scale as
        # (B+2H)/B, and on chip that amortization dominates — at
        # (128,768,768)x2 a gate-passing B=2 measured 38.1 GCell/s vs
        # the stream fallback's 41.7 (and the fast-vs-slow vmem limit
        # was worth only ~3.5% to this kernel, unlike pure-DMA
        # passthroughs).  Raising here hands the program to a backend
        # that wins (RESULTS.md round 2, overlap panel/vmem study).
    B = panel
    if I % B or B < 1:
        raise ValueError(f"overlap panel {B} must divide I={I}")
    for f, (lo, hi) in needs.items():
        if f in streamed and max(lo, hi) > B:
            raise ValueError(
                f"cumulative extent {max(lo, hi)} exceeds panel {B}")
    # J >= 8: on rotated-rows blocks (J == 1) the i/j slices land at
    # arbitrary sublane offsets and Mosaic's tpu.concatenate rejects the
    # shift-fill's offset-layout operands ("result/input offset mismatch
    # on non-concat dimension", measured at (136, 8192) f32) — the same
    # bug family as stream.apply_transform_block's vreg-alignment guard
    # (RESULTS.md round 3).  With J >= 8 every slice start is a multiple
    # of J, sublane-aligned, and the proven 3-D behavior is unchanged;
    # J == 1 blocks take the roll + cached-lane-mask path (~1 extra
    # issue per k read against a loop-invariant mask).
    shiftk = K >= 256 and J >= 8

    input_names = list(program.inputs)
    n_panels = I // B
    input_kinds, in_specs = build_input_specs(program, input_names, B,
                                              dims, n_panels)

    out_specs = []
    out_shapes = []
    for out in program.outputs:
        out_specs.append(pl.BlockSpec(
            (B, J, K),
            lambda g, np_=n_panels: (jnp.clip(g - 1, 0, np_ - 1), 0, 0),
            memory_space=pltpu.VMEM))
        out_dtype = narrow_store_dtype(program.kernels[out].dtype,
                                       interpret)
        out_shapes.append(jax.ShapeDtypeStruct((I, J, K), out_dtype))

    scratch_shapes = [
        pltpu.VMEM((3, B * J, K),
                   jax.dtypes.canonicalize_dtype(program.field_dtype(f)))
        for f in streamed
    ]
    est = est_for(B)
    if est > gate_frac * vmem_budget:
        raise ValueError("overlap blocks exceed the VMEM budget")

    kernel = functools.partial(_overlap_kernel_body, program, analysis,
                               needs, B, input_names, input_kinds,
                               shiftk)
    call = pl.pallas_call(
        kernel,
        grid=(n_panels + 1,),
        in_specs=in_specs,
        out_specs=out_specs[0] if len(out_specs) == 1 else out_specs,
        out_shape=out_shapes[0] if len(out_shapes) == 1 else out_shapes,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=config.vmem_limit_for(est)),
    )
    compile_chain_overlap.last_config = {"panel": B,
                                         "needs": dict(needs)}
    return make_forward(program, input_names, dims, call,
                        len(out_shapes))


def run_chain_overlap(program: ir.Program, inputs: Dict[str, Any],
                      interpret: bool = False, panel: int = 0
                      ) -> Dict[str, np.ndarray]:
    fn = compile_chain_overlap(program, interpret=interpret, panel=panel)
    out = fn({k: jnp.asarray(v) for k, v in inputs.items()})
    return {k: np.asarray(v) for k, v in out.items()}
