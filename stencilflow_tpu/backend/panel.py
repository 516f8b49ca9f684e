"""Panel-mode streaming backend: B stacked planes per grid step.

The plane-streaming kernel (backend/stream.py) issues every VPU op at
(J, K) plane granularity and unrolls ``block`` micro-steps in Python —
at small planes (128^2 = one lane tile x 16 sublane groups) the per-op
issue overhead and the per-grid-step pipeline overhead dominate
(measured: 128^3 x8 runs at 0.57 of its roofline vs 0.81 at 256^3).

Panel mode stores each field's ring as (depth, B*J, K) *panels* — B
consecutive i-planes stacked along the sublane dimension — and computes
whole panels per stage step:

* an i-offset read is pure ROW ARITHMETIC: rows [base + oi*J + oj, ...)
  of two consecutive ring panels concatenated — i-offsets and j-offsets
  share one slice, so the per-access cost collapses to ~(2 slices +
  concat + 1 seam select), and the warmup/drain i-selects disappear into
  the same seam mask;
* ops are B× larger and B× fewer, amortizing Mosaic issue overhead and
  eliminating the Python unroll (compile time drops with it);
* stage lags round up to whole panels (the alignment algebra of
  stream.py in panel units): lagP(c) = max_f(lagP(f) + ceil(max_oi/B)).

The j-plane seams between stacked planes coincide with the j boundary
of every plane, so ONE periodic iota mask per (j-offset) both fixes the
seams and applies the global j BC.  k reads follow the measured policy
of stream.py (shift-in-fill concat at K >= 256, roll + mask below).

Scope (callers fall back to stream.py otherwise): single chip, untiled
planes, VPU stages only (no MXU banded lowering), no HBM spill.  All
BC kinds (constant / copy / shrink) and input ranks are supported.

Reference lineage: same dataflow as the plane streamer — the FPGA
shift-register pipeline of /root/reference/stencilflow/stencil/
intel_fpga.py:367-440 with panels as the vectorization unit (the W-lane
concept of intel_fpga.py:84-137 realized along the sublane axis).
"""
from __future__ import annotations

import dataclasses
import functools
import math
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


def _access_geometry(oi: int, oj: int, B: int, J: int):
    """Row geometry of a panel-pair read.

    A read at (oi, oj) of field f by a stage computing panel qp takes
    rows [start, start + B*J) of the two consecutive ring panels
    (qp + h - 1, qp + h) stacked; rows outside the pair's valid planes
    are seam/boundary rows that the j/i masks overwrite.  Returns
    ``(h, start)`` with ``0 <= start <= B*J`` guaranteed.
    """
    BJ = B * J
    h = -(-oi // B) if oi > 0 else 0
    start = BJ + (oi - h * B) * J + oj
    if start > BJ:
        h += 1
        start -= BJ
    elif start < 0:
        h -= 1
        start += BJ
    if not 0 <= start <= BJ:
        # |oj| > B*J: the read spans more than one neighboring panel —
        # ValueError so compile_chain_best falls back to the plane
        # streamer (panel-mode scope, compile_chain_panel docstring)
        raise ValueError(
            f"j-offset {oj} exceeds the panel row span {BJ} "
            f"(oi={oi}, B={B}, J={J})")
    return h, start


@dataclasses.dataclass
class PanelPlan:
    B: int                       # planes per panel
    lagp: Dict[str, int]         # per field: panel lag
    ring: Dict[str, int]         # per field: ring depth in panels
    lagp_max: int

    @classmethod
    def build(cls, analysis: ChainAnalysis, B: int) -> "PanelPlan":
        program = analysis.program

        def i_range(kname, field):
            accs = program.kernels[kname].accesses()[field]
            offs = [a[0] or 0 for a in accs]
            bc = program.kernels[kname].boundary_conditions.get(field)
            if bc is not None and bc.kind == ir.BCKind.COPY:
                offs.append(0)   # copy center
            if not offs:
                return (0, 0)
            return (min(0, min(offs)), max(0, max(offs)))

        lagp: Dict[str, int] = {
            n: 0 for n, sp in program.inputs.items()
            if not sp.is_scalar and sp.dim_mask[0]}
        for kname in analysis.graph.kernel_order:
            lag = 0
            for f in analysis.graph.producers(kname):
                if f not in lagp and f in program.inputs:
                    continue   # static / scalar input
                hi = i_range(kname, f)[1]
                lag = max(lag, lagp[f] + -(-hi // B))
            lagp[kname] = lag
        lagp_max = max(lagp[o] for o in program.outputs)

        ring: Dict[str, int] = {}
        dims = program.dimensions
        for f in lagp:
            if not any(c in program.kernels
                       for c in analysis.graph.consumers(f)):
                # pure output (or unused input): nothing ever reads it
                # back, so it gets no ring — elides a (B*J, K) VMEM
                # store per step and frees 2*B*J*K*isz from the budget
                continue
            depth = 2    # minimum: a (previous, current) pair
            for c in analysis.graph.consumers(f):
                if c not in program.kernels:
                    continue
                kspec = program.kernels[c]
                accs = list(kspec.accesses().get(f, ()))
                bc = kspec.boundary_conditions.get(f)
                if bc is not None and bc.kind == ir.BCKind.COPY:
                    accs.append((0, 0, 0))
                for a in accs:
                    h, _start = _access_geometry(a[0] or 0, a[1] or 0,
                                                 B, dims[1])
                    # oldest panel touched: qp + h - 1 = g - lagp[c]
                    # + h - 1; newest retained: g - lagp[f]
                    depth = max(depth,
                                (lagp[c] - lagp[f]) - h + 1 + 1)
            ring[f] = depth
        return cls(B, lagp, ring, lagp_max)

    def vmem_bytes(self, program: ir.Program, J: int, K: int,
                   ring_storage=None) -> int:
        total = 0
        for f, depth in self.ring.items():
            dt = np.dtype(program.field_dtype(f))
            isz = dt.itemsize
            if ring_storage == "bfloat16" and dt == np.float32:
                isz = 2   # bf16 panel-stack storage, f32 compute
            total += depth * self.B * J * K * isz
        return total


# A/B knob for the interior/boundary stage split (scripts study):
# module-global so a study can toggle between compiles; production
# always leaves it on (the split is semantics-preserving).
INTERIOR_SPLIT = True


def _panel_kernel_body(program: ir.Program, analysis: ChainAnalysis,
                      plan: PanelPlan, input_names, input_kinds,
                      shiftk: bool, *refs, ring_storage="off"):
    B = plan.B
    dims = program.dimensions
    I, J, K = dims
    BJ = B * J
    n_in = len(input_names)
    n_out = len(program.outputs)
    in_refs = refs[:n_in]
    out_refs = refs[n_in:n_in + n_out]
    rings = dict(zip(plan.ring, refs[n_in + n_out:]))
    g = pl.program_id(0)

    # row -> in-plane j and panel-local plane index (static iotas, shared)
    row_j = jax.lax.broadcasted_iota(jnp.int32, (BJ, K), 0) % J
    row_p = jax.lax.broadcasted_iota(jnp.int32, (BJ, K), 0) // J

    scalar_cache: Dict[str, Any] = {}
    plane_cache: Dict[str, Any] = {}
    for name, kind, ref in zip(input_names, input_kinds, in_refs):
        if kind == "scalar":
            scalar_cache[name] = ref[0, 0]
        elif kind == "static":
            spec = program.inputs[name]
            pj = J if spec.dim_mask[1] else 1
            pk = K if spec.dim_mask[2] else 1
            plane = jnp.broadcast_to(ref[...].reshape(pj, pk), (J, K))
            plane_cache[name] = jnp.concatenate([plane] * B, axis=0) \
                if B > 1 else plane

    pair_cache: Dict[Any, Any] = {}
    jmask_cache: Dict[Any, Any] = {}
    kmask_cache: Dict[Any, Any] = {}
    imask_cache: Dict[Any, Any] = {}

    # bf16 panel-stack storage (f32 compute): rounded at store, cast at
    # read; interpret keeps f32 buffers and emulates the rounding (same
    # contract as backend/stream.py's ring_storage)
    def _eval_dtype(f):
        return jax.dtypes.canonicalize_dtype(program.field_dtype(f))

    rs_round = (frozenset(f for f in plan.ring
                          if _eval_dtype(f) == jnp.float32)
                if ring_storage == "bfloat16" else frozenset())

    # bool i-history: the ring is int32 (compile_chain_panel's
    # _ring_dtype — an i1 ring with history reads crashes Mosaic), and
    # the value stays 0/1 int32 THROUGH the slice/roll/mask machinery —
    # make_read converts with `!= 0` only at its exit (shifting the i1
    # vector itself is what crashed, not the ring storage).
    bool_wire = frozenset(
        f for f in plan.ring
        if _eval_dtype(f) == jnp.bool_
        and rings[f].dtype == jnp.int32)   # interpret keeps bool rings

    def _wire_dtype(f):
        edt = _eval_dtype(f)
        return jnp.int32 if f in bool_wire else edt

    def to_ring(field, panel):
        if panel.dtype == jnp.bool_ and field in bool_wire:
            return panel.astype(jnp.int32)
        if field not in rs_round:
            return panel
        if rings[field].dtype == panel.dtype:   # interpret: emulate
            return jax.lax.reduce_precision(panel, 8, 7)
        return panel.astype(rings[field].dtype)

    def to_eval(field, arr):
        edt = _wire_dtype(field)
        return arr if arr.dtype == edt else arr.astype(edt)

    def ring_panel(field, behind):
        """One (BJ, K) ring panel, index ``g - behind`` (cached per
        (field, behind) within a grid step)."""
        key = ("p", field, behind)
        if key in pair_cache:
            return pair_cache[key]
        pidx = g - jnp.int32(behind)
        D = jnp.int32(plan.ring[field])
        s = jax.lax.rem(jax.lax.rem(pidx, D) + D, D)
        panel = to_eval(field, rings[field][s])
        pair_cache[key] = panel
        return panel

    def ring_pair(field, behind):
        """(2*BJ, K) stack of ``field``'s panels (g-behind-1, g-behind);
        ``behind`` is static, so the stack is cached per (field, behind)
        and shared across all reads of this grid step."""
        key = (field, behind)
        if key in pair_cache:
            return pair_cache[key]
        stack = jnp.concatenate([ring_panel(field, behind + 1),
                                 ring_panel(field, behind)], axis=0)
        pair_cache[key] = stack
        return stack


    def _roll_k(x, o):
        return jnp.roll(x, -o, axis=1)

    def make_read(kname, qp, with_imask=True):
        """Read fn for stage ``kname`` computing output panel ``qp``
        (panel index; planes [qp*B, qp*B + B)).

        ``with_imask=False`` skips the global-i boundary selects: the
        stage loop proves them all-false for interior panels (every
        read's target plane is in [0, I)) and emits this cheaper body
        there — i-selects are ~2 of the ~9 VPU pass-equivalents of a
        star stage, paid on every step for a mask that only fires on
        edge panels."""
        kspec = program.kernels[kname]
        bcs = kspec.boundary_conditions

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
                val = plane_cache[field]
                center = val
                # static planes are i-invariant: oi needs no shift, only
                # its boundary mask (handled in the union below for copy)
                if oj:
                    val = jnp.roll(val, -oj, axis=0)
                if ok:
                    val = _roll_k(val, ok)
                masks = []
                if oj:
                    # plane_cache entries are always (B*J, K): built by
                    # concatenating B copies (or J == B*J when B == 1)
                    masks.append(_jmask(oj))
                if oi and with_imask:
                    tgt = row_p + qp * B + oi
                    masks.append((tgt < 0) | (tgt >= I))
                if ok:
                    masks.append(_kmask(ok, BJ))
                m = None
                for mm in masks:
                    m = mm if m is None else (m | mm)
                if m is None:
                    return val
                return jnp.where(m, center if is_copy else
                                 jnp.asarray(fillv, val.dtype), val)

            h, start = _access_geometry(oi, oj, B, J)
            behind = plan.lagp[kname] - h   # pair top = g - behind
            if start % BJ == 0:
                # the read IS one whole ring panel (every oj == 0 read
                # at B == 1, and B-aligned i-offsets generally): index
                # the slot directly — the 2-panel pair concat would
                # materialize 2*BJ rows to serve BJ (on the 512^3
                # headline that is 2 whole-plane passes per (field,
                # behind) per stage)
                val = ring_panel(field, behind + (1 if start == 0
                                                  else 0))
            else:
                stack = ring_pair(field, behind)
                val = jax.lax.slice(stack, (start, 0), (start + BJ, K))

            def imask():
                mkey = (plan.lagp[kname], oi)
                if mkey not in imask_cache:
                    tgt = row_p + qp * B + oi
                    imask_cache[mkey] = (tgt < 0) | (tgt >= I)
                return imask_cache[mkey]

            if is_copy:
                # copy BC: shift every dim first, then ONE union mask
                # selecting the unshifted center (per-dim masking would
                # re-shift already-masked center values)
                center = ring_panel(field, plan.lagp[kname])
                if ok:
                    val = _roll_k(val, ok)
                m = None
                for mm in ((_jmask(oj) if oj else None),
                           (imask() if oi and with_imask else None),
                           (_kmask(ok, BJ) if ok else None)):
                    if mm is not None:
                        m = mm if m is None else (m | mm)
                return jnp.where(m, center, val) if m is not None else val

            # constant / shrink: the fill is uniform, so per-dim masking
            # and shift-fill commute
            if oj:
                val = jnp.where(_jmask(oj),
                                jnp.asarray(fillv, val.dtype), val)
            if oi and with_imask:
                val = jnp.where(imask(),
                                jnp.asarray(fillv, val.dtype), val)
            if ok:
                if shiftk:
                    val = shift_fill_k(val, ok, fillv)
                else:
                    val = jnp.where(_kmask(ok, BJ),
                                    jnp.asarray(fillv, val.dtype),
                                    _roll_k(val, ok))
            return val

        if not bool_wire:
            return read

        def read_wire(field, offsets):
            val = read(field, offsets)
            # bool history rode the wire as 0/1 int32; hand the kernel
            # a real bool only now, after every slice/roll/mask
            if field in bool_wire:
                return val != 0
            return val

        return read_wire

    def _jmask(oj):
        if oj in jmask_cache:
            return jmask_cache[oj]
        t = row_j + oj
        m = (t < 0) | (t >= J)
        jmask_cache[oj] = m
        return m

    def _kmask(ok, rows):
        key = (ok, rows)
        if key not in kmask_cache:
            t = jax.lax.broadcasted_iota(jnp.int32, (rows, K), 1) + ok
            kmask_cache[key] = (t < 0) | (t >= K)
        return kmask_cache[key]

    # 1. ingest this step's input panel
    n_panels = I // B
    for name, kind, ref in zip(input_names, input_kinds, in_refs):
        if kind not in ("stream", "stream_rows", "stream_partial") \
                or name not in rings:
            continue

        @pl.when(g < n_panels)
        def _(name=name, kind=kind, ref=ref):
            slot = jax.lax.rem(g, jnp.int32(plan.ring[name]))
            panel = ingest_panel(program.inputs[name], kind, ref, g, B,
                                 dims)
            rings[name][pl.ds(slot, 1)] = to_ring(name, panel)[None]

    # 2. advance every stage one panel.  The whole stage — reads,
    # compute, ring + output stores — is gated on the stage being live
    # (0 <= qp < n_panels): during pipeline fill/drain inactive stages
    # cost nothing.  (Ungated compute with gated stores measured exactly
    # the structural-waste prediction at 128^3 B=4: 0.668 = 0.840 x
    # 256 live panel-stages / 320 grid-stage slots.)  Panels >= n_panels
    # are never stored; every read of them is i-masked (tgt >= I), so
    # stale ring slots are unobservable.  Read caches are cleared at
    # region entry: a tracer cached inside one pl.when region must not
    # leak into a sibling region, and same-step consumers must re-read
    # the ring slot their producer stored this step.
    out_ref_of = dict(zip(program.outputs, out_refs))
    for kname in analysis.graph.kernel_order:
        kspec = program.kernels[kname]
        qp = g - jnp.int32(plan.lagp[kname])

        def stage_body(kname, kspec, qp, with_imask):
            pair_cache.clear()
            jmask_cache.clear()
            kmask_cache.clear()
            imask_cache.clear()
            result = eval_kernel_statements(
                kspec, make_read(kname, qp, with_imask))
            result = jnp.asarray(result)
            if result.shape != (BJ, K):
                result = jnp.broadcast_to(result, (BJ, K))
            result = result.astype(
                jax.dtypes.canonicalize_dtype(kspec.dtype))
            if kname in rings:   # static: pure outputs have no ring
                slot = jax.lax.rem(qp, jnp.int32(plan.ring[kname]))
                rings[kname][pl.ds(slot, 1)] = to_ring(kname,
                                                       result)[None]
            if kname in out_ref_of:
                oref = out_ref_of[kname]
                oref[...] = result.reshape(B, J, K).astype(oref.dtype)

        # interior/boundary split: a stage whose reads carry i-offsets
        # pays its global-i boundary selects only on the edge panels
        # where the mask can fire — panels in [qlo, qhi] prove every
        # read's target plane in-range and take the select-free body
        # (make_read's with_imask note).  Stale-ring reads stay guarded:
        # the never-stored panels (< 0 or >= n_panels) are only reached
        # from edge panels, which keep full masks, and j-seam rows are
        # fixed by the always-on j masks.
        offs = [a[0] or 0 for accs in kspec.accesses().values()
                for a in accs]
        neg = max((-o for o in offs if o < 0), default=0)
        pos = max((o for o in offs if o > 0), default=0)
        qlo = -(-neg // B)
        qhi = n_panels - 1 - (-(-pos // B))
        live = (qp >= 0) & (qp < n_panels)
        if INTERIOR_SPLIT and (neg or pos) and qlo <= qhi:
            interior = (qp >= qlo) & (qp <= qhi)

            @pl.when(live & interior)
            def _(kname=kname, kspec=kspec, qp=qp):
                stage_body(kname, kspec, qp, False)

            @pl.when(live & jnp.logical_not(interior))
            def _(kname=kname, kspec=kspec, qp=qp):
                stage_body(kname, kspec, qp, True)
        else:
            @pl.when(live)
            def _(kname=kname, kspec=kspec, qp=qp):
                stage_body(kname, kspec, qp, True)


def compile_chain_panel(program: ir.Program,
                        analysis: Optional[ChainAnalysis] = None,
                        panel: int = 0,
                        interpret: bool = False,
                        vmem_budget: int = config.TPU_STREAM_VMEM_BUDGET,
                        gate_frac: float = 0.7,
                        ring_storage: str = "off"):
    """Panel-mode streaming compile; raises ValueError when the program
    shape doesn't fit this lowering (callers fall back to stream.py).

    ``gate_frac`` scales the VMEM-estimate gate (0.7 of the budget for
    blind policy; the autotuner passes 1.0 for explicitly requested
    panels since it catches Mosaic failures itself — see overlap.py)."""
    analysis = analysis or ChainAnalysis.run(program)
    from .tile_eval import reject_unsupported_mosaic
    reject_unsupported_mosaic(program, interpret, bool_ihistory_ok=True)
    dims = program.dimensions
    I, J, K = dims
    auto = panel <= 0
    prefer8 = has_partial_rank_risk(program)

    def _divisor_at_most(ceiling: int) -> int:
        """Largest divisor of I <= ceiling; prefers sublane multiples
        (B % 8 == 0) when a partial-rank input would otherwise fall off
        the stream_rows path onto whole-array stream_partial."""
        ceiling = max(1, min(ceiling, I))
        divs = [d for d in range(1, ceiling + 1) if I % d == 0]
        if prefer8:
            d8 = [d for d in divs if d % 8 == 0]
            if d8:
                return d8[-1]
        return divs[-1]

    if auto:
        # target ~1024 sublane rows per op (measured plateau: 128^3 B=4/8/16
        # all 17.3-17.4, 256^3 B=4/8 both ~20, 384^3 B=2 > B=1); J >= 512
        # stays at B=1 — single planes already saturate (1.05 roofline) and
        # B=2 rings at (1024, 512) push Mosaic compile past 5 minutes
        panel = _divisor_at_most(
            max(1, min(1024 // J if J < 512 else 1, I // 2)) or 1)
    if I % panel or panel < 1:
        raise ValueError(f"panel {panel} must divide I={I}")
    B = panel
    # every i-offset must fit within one neighboring panel
    moff = max((abs(a[0] or 0) for kspec in program.kernels.values()
                for accs in kspec.accesses().values() for a in accs),
               default=0)
    plan = PanelPlan.build(analysis, B)
    budget = gate_frac * vmem_budget
    input_names = list(program.inputs)

    if ring_storage not in ("off", "bfloat16"):
        raise ValueError(f"ring_storage must be 'off' or 'bfloat16', "
                         f"got {ring_storage!r}")

    def _state_bytes(plan_, B_):
        # rings + the input blocks the BlockSpecs keep resident (whole
        # arrays for stream_partial — previously un-counted, ADVICE r2)
        return (plan_.vmem_bytes(program, J, K, ring_storage)
                + input_resident_bytes(program, input_names, B_, dims))

    # auto panels cascade down (to the next divisor of I) until the rings
    # fit the budget — deep chains and row-streamed 2-D domains (J = 1,
    # where the sublane-row target alone would ask for B = 1024) land on
    # the largest affordable panel instead of falling back
    while (auto and B > max(1, moff)
           and _state_bytes(plan, B) > budget):
        nb = _divisor_at_most(max(1, B // 2))
        if nb >= B:
            break   # no smaller divisor of I exists
        B = nb
        plan = PanelPlan.build(analysis, B)
    if moff > B:
        raise ValueError(f"i-offset {moff} exceeds panel size {B}")
    if _state_bytes(plan, B) > budget:
        raise ValueError("panel rings exceed the VMEM budget")
    shiftk = K >= 256

    n_panels = I // B
    input_kinds, in_specs = build_input_specs(program, input_names, B,
                                              dims, n_panels)

    out_specs = []
    out_shapes = []
    for out in program.outputs:
        c = plan.lagp[out]
        out_specs.append(pl.BlockSpec(
            (B, J, K),
            lambda g, c=c, np_=n_panels: (jnp.clip(g - c, 0, np_ - 1),
                                          0, 0),
            memory_space=pltpu.VMEM))
        out_dtype = narrow_store_dtype(program.kernels[out].dtype,
                                       interpret)
        out_shapes.append(jax.ShapeDtypeStruct((I, J, K), out_dtype))

    def _ring_dtype(f):
        dt = jax.dtypes.canonicalize_dtype(program.field_dtype(f))
        if (ring_storage == "bfloat16" and dt == jnp.float32
                and not interpret):
            return jnp.bfloat16
        if dt == jnp.bool_ and not interpret:
            # an i1 ring with i-history reads crashes the Mosaic
            # compiler (measured on v5e); store 0/1 int32 and keep the
            # value int32 through the read machinery — the kernel body
            # converts with `!= 0` at read exit (VERDICT r4 #5)
            return jnp.int32
        return dt

    scratch_shapes = [
        pltpu.VMEM((plan.ring[f], B * J, K), _ring_dtype(f))
        for f in plan.ring
    ]

    kernel = functools.partial(_panel_kernel_body, program, analysis,
                               plan, input_names, input_kinds, shiftk,
                               ring_storage=ring_storage)
    grid = (n_panels + plan.lagp_max,)
    # state estimate for the vmem limit: rings + double-buffered io
    # blocks + pair-stack/eval temporaries (~8 panels); limits above
    # 64 MiB measurably halve DMA throughput (config.vmem_limit_for)
    panel_b = B * J * K * 4
    io_est = input_resident_bytes(program, input_names, B, dims)
    io_est += sum(2 * B * J * K * np.dtype(
        jax.dtypes.canonicalize_dtype(program.kernels[o].dtype)).itemsize
        for o in program.outputs)
    est = plan.vmem_bytes(program, J, K, ring_storage) + io_est \
        + 8 * panel_b
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs[0] if len(out_specs) == 1 else out_specs,
        out_shape=out_shapes[0] if len(out_shapes) == 1 else out_shapes,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=config.vmem_limit_for(est)),
    )
    compile_chain_panel.last_config = {"panel": B, "lagp": dict(plan.lagp),
                                       "ring": dict(plan.ring)}
    return make_forward(program, input_names, dims, call,
                        len(out_shapes))


def run_chain_panel(program: ir.Program, inputs: Dict[str, Any],
                    interpret: bool = False, panel: int = 0
                    ) -> Dict[str, np.ndarray]:
    fn = compile_chain_panel(program, interpret=interpret, panel=panel)
    out = fn({k: jnp.asarray(v) for k, v in inputs.items()})
    return {k: np.asarray(v) for k, v in out.items()}
