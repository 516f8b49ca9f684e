"""Stage-grouped recompute backend: rings every g stages, overlap within.

The panel backend (backend/panel.py) materializes EVERY stage's output
into a VMEM ring — each stage costs a (B*J, K) ring store plus ring-pair
concats at read, and those VMEM passes are what the measured pass-rate
bound prices (RESULTS.md: the jacobi3d 512^3 x8 headline sits at ~0.73
of the 38.5 GCell/s serial-pass bound).  The overlap backend
(backend/overlap.py) materializes NO stage rings — every output panel
recomputes the whole chain over an i-widened block — but its recompute
waste grows with chain depth, so it is gated to shallow chains.

This lowering is the hybrid between them: the stage order is cut into
GROUPS of at most ``group`` consecutive stages; only group-boundary
fields (streamed inputs plus any kernel output consumed outside its own
group) get VMEM rings, and the stages inside a group are evaluated
overlap-style over i-widened row blocks with static ``lax.slice`` reads
of in-register temporaries.  For a chain of n stages with per-stage
extent h this divides ring stores (and their read-back concats) by ~g at
an overcompute cost of ~(B + 2(g-1)h)/B on the deepest stage of each
group — the knob trades VMEM passes for VPU flops, and both ``panel``
(B) and ``group`` (g) are autotune dimensions.

Mechanics shared with the parents:

* within-group widened extents are overlap.py's reverse ``need_lo/hi``
  transpose, seeded at the group's ring-stored/output stages;
* ring windows generalize panel.py's ring *pair* to a ``ceil(lo/B) + 1
  + ceil(hi/B)``-panel stack (one concat + one slice per external field
  per step, shared by all of the group's reads of that field);
* group lags follow panel.py's alignment algebra at group granularity:
  ``lag_G = max_f(lag_src(f) + ceil(hi_f/B))`` over the group's external
  reads, and ring depths are ``max_C(lag_C - lag_src + ceil(lo_f^C/B))
  + 1`` over consumer groups;
* the j-seam trick, k shift-fill policy, io classification, and bf16
  ring storage are the shared stacked-io/panel machinery.

Scope (callers fall back otherwise): single chip, untiled planes, VPU
stages only, no HBM spill, B | I.  Unlike panel mode, i-offsets LARGER
than B are legal (they widen windows/lags instead of being rejected).
All BC kinds (constant / copy / shrink) and input ranks are supported.

Reference lineage: the operator-merging idea of
/root/reference/stencilflow/stencil/stencilfusion.py:26-171 taken to
group granularity over the shift-register pipeline dataflow of
/root/reference/stencilflow/stencil/intel_fpga.py:107-440 (groups play
the role of fused library nodes; the recompute halo is the spatial
transpose of their inter-node delay FIFOs).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Optional, Tuple

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


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


def _kernel_reads(kspec: ir.KernelSpec):
    """accesses() plus the copy-BC center read, as (field, offsets)."""
    accs = {f: list(a) for f, a in kspec.accesses().items()}
    for f, bc in kspec.boundary_conditions.items():
        if bc.kind == ir.BCKind.COPY:
            accs.setdefault(f, []).append((0, 0, 0))
    return accs


@dataclasses.dataclass
class GroupPlan:
    B: int                                   # planes per panel
    groups: List[List[str]]                  # stage names per group
    group_of: Dict[str, int]
    ring_fields: List[str]                   # ring-backed fields, stable order
    needs: List[Dict[str, Tuple[int, int]]]  # per group: (lo, hi) extents
    lag: List[int]                           # per group: panel lag
    depth: Dict[str, int]                    # ring depth (panels)
    src_lag: Dict[str, int]                  # ring field -> producer lag

    @classmethod
    def build(cls, program: ir.Program, analysis: ChainAnalysis,
              B: int, group: int) -> "GroupPlan":
        order = list(analysis.graph.kernel_order)
        groups = [order[i:i + group] for i in range(0, len(order), group)]
        group_of = {k: gi for gi, grp in enumerate(groups) for k in grp}

        streamed = [n for n, sp in program.inputs.items()
                    if not sp.is_scalar and sp.dim_mask[0]]
        ring_kernels: List[str] = []
        for kname in order:
            consumers = [c for c in analysis.graph.consumers(kname)
                         if c in program.kernels]
            if any(group_of[c] != group_of[kname] for c in consumers):
                ring_kernels.append(kname)
        ring_fields = streamed + ring_kernels
        ring_set = set(ring_fields)

        # within-group widened extents (overlap.py's reverse transpose,
        # seeded at the group's ring-stored / program-output stages)
        needs: List[Dict[str, Tuple[int, int]]] = []
        for gi, grp in enumerate(groups):
            nd: Dict[str, Tuple[int, int]] = {}
            for k in grp:
                if k in ring_set or k in program.outputs:
                    nd[k] = (0, 0)
            for k in reversed(grp):
                if k not in nd:
                    continue   # dead within this group (no consumer)
                lo_c, hi_c = nd[k]
                kspec = program.kernels[k]
                for f, alist in _kernel_reads(kspec).items():
                    if f in program.inputs and program.inputs[f].is_scalar:
                        continue
                    lo_f, hi_f = nd.get(f, (0, 0))
                    for a in alist:
                        oi = a[0] or 0
                        oj = a[1] or 0
                        if abs(oj) > program.dimensions[1]:
                            raise ValueError(
                                f"j-offset {oj} exceeds J="
                                f"{program.dimensions[1]} (group scope)")
                        lo_f = max(lo_f, lo_c - oi + (1 if oj < 0 else 0))
                        hi_f = max(hi_f, hi_c + oi + (1 if oj > 0 else 0))
                    nd[f] = (lo_f, hi_f)
            needs.append(nd)

        # group lags (panel.py's alignment algebra at group granularity)
        lag: List[int] = []
        src_lag: Dict[str, int] = {f: 0 for f in streamed}
        for gi, grp in enumerate(groups):
            gset = set(grp)
            lg = 0
            for f, (_lo, hi) in needs[gi].items():
                if f in gset or f not in ring_set:
                    continue   # in-group temporary or static/scalar
                lg = max(lg, src_lag[f] + _ceil_div(hi, B))
            lag.append(lg)
            for k in grp:
                if k in ring_set:
                    src_lag[k] = lg

        depth: Dict[str, int] = {}
        for gi in range(len(groups)):
            gset = set(groups[gi])
            for f, (lo, _hi) in needs[gi].items():
                if f in gset or f not in ring_set:
                    continue
                d = lag[gi] - src_lag[f] + _ceil_div(lo, B) + 1
                depth[f] = max(depth.get(f, 1), d)
        # a ring field no group reads (e.g. an unused streamed input)
        # still needs a slot for its ingest store
        for f in ring_fields:
            depth.setdefault(f, 1)
        return cls(B, groups, group_of, ring_fields, needs, lag, depth,
                   src_lag)

    def vmem_bytes(self, program: ir.Program, J: int, K: int,
                   ring_storage=None) -> int:
        """Rings + the widest group's live widened blocks."""
        def isz(f, rs):
            dt = np.dtype(program.field_dtype(f))
            if rs and ring_storage == "bfloat16" and dt == np.float32:
                return 2
            return dt.itemsize

        total = sum(self.depth[f] * self.B * J * K * isz(f, True)
                    for f in self.ring_fields)
        widest = 0
        for gi, grp in enumerate(self.groups):
            live = 0
            for f, (lo, hi) in self.needs[gi].items():
                if f in program.inputs and not (
                        program.inputs[f].dim_mask[0]
                        and not program.inputs[f].is_scalar):
                    continue   # static/scalar: no widened block
                live += (lo + self.B + hi) * J * K * isz(f, False)
            widest = max(widest, live)
        return total + widest


def _group_kernel_body(program: ir.Program, analysis: ChainAnalysis,
                       plan: GroupPlan, input_names, input_kinds,
                       shiftk: bool, interior_split: bool,
                       ring_fields, win_ref_idx, bool_wire, *refs,
                       ring_storage="off"):
    B = plan.B
    dims = program.dimensions
    I, J, K = dims
    BJ = B * J
    n_panels = I // B
    n_in = len(input_names)
    n_out = len(program.outputs)
    in_refs = refs[:n_in]
    out_refs = refs[n_in:n_in + n_out]
    rings = dict(zip(ring_fields, refs[n_in + n_out:]))
    ring_set = set(plan.ring_fields)   # incl. direct-window inputs
    g = pl.program_id(0)

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

    def _eval_dtype(f):
        return jax.dtypes.canonicalize_dtype(program.field_dtype(f))

    rs_round = (frozenset(f for f in plan.ring_fields
                          if _eval_dtype(f) == jnp.float32)
                if ring_storage == "bfloat16" else frozenset())

    def to_ring(field, panel):
        if panel.dtype == jnp.bool_ and field in bool_wire:
            return panel.astype(jnp.int32)
        if field not in rs_round:
            return panel
        if rings[field].dtype == panel.dtype:   # interpret: emulate
            return jax.lax.reduce_precision(panel, 8, 7)
        return panel.astype(rings[field].dtype)

    def to_eval(field, arr):
        # bool history/blocks ride the wire as 0/1 int32 (panel.py's
        # bool_wire contract: i1 shifts crash Mosaic); make_read
        # converts with != 0 at its exit
        edt = (jnp.int32 if field in bool_wire
               else _eval_dtype(field))
        return arr if arr.dtype == edt else arr.astype(edt)

    def _slot(pidx, D):
        return jax.lax.rem(jax.lax.rem(pidx, D) + D, D)

    # 1. ingest this step's input panel into each streamed ring
    # (direct-window inputs have no ring: their refs ARE the windows)
    for name, kind, ref in zip(input_names, input_kinds, in_refs):
        if kind not in ("stream", "stream_rows", "stream_partial") \
                or name not in rings:
            continue

        @pl.when(g < n_panels)
        def _(name=name, kind=kind, ref=ref):
            slot = _slot(g, jnp.int32(plan.depth[name]))
            panel = ingest_panel(program.inputs[name], kind, ref, g, B,
                                 dims)
            rings[name][pl.ds(slot, 1)] = to_ring(name, panel)[None]

    out_ref_of = dict(zip(program.outputs, out_refs))

    # 2. advance every group one panel
    for gi, grp in enumerate(plan.groups):
        nd = plan.needs[gi]
        gset = set(grp)
        q = g - jnp.int32(plan.lag[gi])
        externals = [f for f in nd
                     if f not in gset and f in ring_set]

        def group_body(gi=gi, grp=grp, nd=nd, gset=gset, q=q,
                       externals=externals, with_imask=True):
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
                # global plane of row r of a (lo_c + B + hi_c)-widened
                # block is q*B - lo_c + r//J; the read targets + oi
                key = (lo_c, rows, oi)
                if key not in imask_cache:
                    p = (jax.lax.broadcasted_iota(
                        jnp.int32, (rows, K), 0) // J
                        + q * B - jnp.int32(lo_c) + jnp.int32(oi))
                    imask_cache[key] = (p < 0) | (p >= I)
                return imask_cache[key]

            # materialize each external ring field's widened window:
            # rows [q*B - lo, q*B + B + hi) via a ceil(lo/B)+1+ceil(hi/B)
            # panel stack (panel.py's ring pair, generalized)
            vals: Dict[str, Any] = {}
            for f in externals:
                lo, hi = nd[f]
                cl, ch = _ceil_div(lo, B), _ceil_div(hi, B)
                if (f, gi) in win_ref_idx:
                    # direct windows: the overlapping input block refs
                    # for this group ARE panels q-cl .. q+ch
                    parts = [in_refs[ix][...].reshape(B * J, K)
                             for ix in win_ref_idx[(f, gi)]]
                else:
                    D = jnp.int32(plan.depth[f])
                    parts = [rings[f][_slot(q + s, D)]
                             for s in range(-cl, ch + 1)]
                # cast to the wire dtype BEFORE the concat: an i1 (or
                # bf16-storage) concat is itself in the Mosaic packed-
                # layout risk class the wire exists to avoid
                parts = [to_eval(f, p) for p in parts]
                stack = (jnp.concatenate(parts, axis=0)
                         if len(parts) > 1 else parts[0])
                start = (cl * B - lo) * J
                win = jax.lax.slice(stack, (start, 0),
                                    (start + (lo + B + hi) * J, K))
                vals[f] = win
                # rows mapping to OOB planes hold stale ring data; every
                # read that could move them into in-range planes is
                # i-masked below, and same-plane propagation only ever
                # lands them back in OOB rows (sliced away at the core).

            def make_read(kname):
                kspec = program.kernels[kname]
                bcs = kspec.boundary_conditions
                lo_c, hi_c = nd[kname]
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
                            jnp.concatenate(
                                [plane] * (rows_c // J), axis=0)
                            if rows_c // J > 1 else plane, (rows_c, K))
                        val = center
                        if oj:
                            val = jnp.roll(val, -oj, axis=0)
                        if ok:
                            val = jnp.roll(val, -ok, axis=1)
                        m = None
                        for mm in ((_jmask(oj, rows_c) if oj else None),
                                   (_imask(lo_c, rows_c, oi)
                                    if oi and with_imask else None),
                                   (_kmask(ok, rows_c) if ok else None)):
                            if mm is not None:
                                m = mm if m is None else (m | mm)
                        if m is None:
                            return val
                        return jnp.where(m, center if is_copy else
                                         jnp.asarray(fillv, val.dtype),
                                         val)

                    lo_f, hi_f = nd[field]
                    src = vals[field]
                    start = (lo_f - lo_c + oi) * J + oj
                    assert 0 <= start and start + rows_c <= src.shape[0], (
                        field, offsets, start, rows_c, src.shape)
                    val = jax.lax.slice(src, (start, 0),
                                        (start + rows_c, K))

                    if is_copy:
                        cstart = (lo_f - lo_c) * J
                        center = jax.lax.slice(src, (cstart, 0),
                                               (cstart + rows_c, K))
                        if ok:
                            val = jnp.roll(val, -ok, axis=1)
                        m = None
                        for mm in ((_jmask(oj, rows_c) if oj else None),
                                   (_imask(lo_c, rows_c, oi)
                                    if oi and with_imask else None),
                                   (_kmask(ok, rows_c) if ok else None)):
                            if mm is not None:
                                m = mm if m is None else (m | mm)
                        return (jnp.where(m, center, val)
                                if m is not None else val)

                    if oj:
                        val = jnp.where(_jmask(oj, rows_c),
                                        jnp.asarray(fillv, val.dtype),
                                        val)
                    if oi and with_imask:
                        val = jnp.where(_imask(lo_c, rows_c, oi),
                                        jnp.asarray(fillv, val.dtype),
                                        val)
                    if ok:
                        if shiftk:
                            val = shift_fill_k(val, ok, fillv)
                        else:
                            val = jnp.where(_kmask(ok, rows_c),
                                            jnp.asarray(fillv, val.dtype),
                                            jnp.roll(val, -ok, axis=1))
                    return val

                if not bool_wire:
                    return read, rows_c

                def read_wire(field, offsets):
                    val = read(field, offsets)
                    if field in bool_wire:   # back to bool at read exit
                        return val != 0
                    return val

                return read_wire, rows_c

            for kname in grp:
                if kname not in nd:
                    continue   # dead within this group
                kspec = program.kernels[kname]
                read, rows_c = make_read(kname)
                result = jnp.asarray(
                    eval_kernel_statements(kspec, read))
                if result.shape != (rows_c, K):
                    result = jnp.broadcast_to(result, (rows_c, K))
                result = result.astype(
                    jax.dtypes.canonicalize_dtype(kspec.dtype))
                # bool stage results ride in-group reads as 0/1 int32
                # too (slicing an i1 block risks the same Mosaic class)
                vals[kname] = (result.astype(jnp.int32)
                               if kname in bool_wire else result)
                lo_s, _hi_s = nd[kname]
                core = (jax.lax.slice(result, (lo_s * J, 0),
                                      (lo_s * J + BJ, K))
                        if result.shape[0] != BJ else result)
                if kname in ring_set:
                    slot = _slot(q, jnp.int32(plan.depth[kname]))
                    rings[kname][pl.ds(slot, 1)] = to_ring(kname,
                                                           core)[None]
                if kname in out_ref_of:
                    oref = out_ref_of[kname]
                    oref[...] = core.reshape(B, J, K).astype(oref.dtype)

        live = (q >= 0) & (q < n_panels)
        # interior split: panels where EVERY widened row of every block
        # and window maps to an in-range plane take the select-free body
        # (i-masks provably all-false; windows hold no stale rows)
        ext_lo = max((lo for lo, _ in nd.values()), default=0)
        ext_hi = max((hi for _, hi in nd.values()), default=0)
        has_imask = any(
            (a[0] or 0) != 0
            for k in grp if k in nd
            for alist in _kernel_reads(program.kernels[k]).values()
            for a in alist) or ext_lo or ext_hi
        qlo = _ceil_div(ext_lo, B)
        qhi = n_panels - 1 - _ceil_div(ext_hi, B)
        if interior_split and has_imask and qlo <= qhi:
            interior = (q >= qlo) & (q <= qhi)

            @pl.when(live & interior)
            def _(group_body=group_body):
                group_body(with_imask=False)

            @pl.when(live & jnp.logical_not(interior))
            def _(group_body=group_body):
                group_body(with_imask=True)
        else:
            @pl.when(live)
            def _(group_body=group_body):
                group_body(with_imask=True)


def compile_chain_group(program: ir.Program,
                        analysis: Optional[ChainAnalysis] = None,
                        panel: int = 0,
                        group: int = 2,
                        interpret: bool = False,
                        vmem_budget: int = config.TPU_STREAM_VMEM_BUDGET,
                        gate_frac: float = 0.7,
                        ring_storage: str = "off",
                        interior_split: bool = False,
                        input_windows: str = "ring"):
    """Stage-grouped streaming compile; raises ValueError when the
    program shape doesn't fit this lowering (callers fall back).

    ``panel`` is the panel size B (0 = auto), ``group`` the maximum
    stages per group g (1 degenerates to panel-style per-stage rings
    with window reads; >= the chain depth degenerates to overlap-style
    full recompute).  ``gate_frac`` scales the VMEM-estimate gate
    exactly as in panel.py (autotune passes 1.0).

    ``interior_split`` defaults OFF: unlike panel mode (where the
    per-stage split is free-to-+17%), duplicating the whole GROUP body
    into interior/boundary regions measured 37% SLOWER on the jacobi3d
    512^3 x8 headline (14.8 vs 23.4 GCell/s split-off, same day, v5e) —
    the doubled kernel body costs more than the elided i-selects.

    ``input_windows="direct"`` replaces each full-rank streamed input's
    VMEM ring with ceil(lo/B)+1+ceil(hi/B) OVERLAPPING input block refs
    (index maps q-cl .. q+ch, clipped): zero ingest stores and zero
    window concat-from-ring VMEM passes, at (cl+ch)x extra HBM reads of
    that input — a measured trade (wins where VMEM passes bind, loses
    where HBM binds), so it is a knob/autotune label, not a default.
    Clipped edge blocks deliver wrong-plane data only in rows whose
    plane is out of range — unobservable under the same i-mask invariant
    that covers stale ring slots."""
    analysis = analysis or ChainAnalysis.run(program)
    from .tile_eval import reject_unsupported_mosaic
    reject_unsupported_mosaic(program, interpret, bool_ihistory_ok=True)
    # The interior split is bit-exact on compiled Mosaic (verified on
    # v5e: the VPU does not contract mul+add, RESULTS.md vpu study) but
    # NOT in interpret mode: eliding a provably-all-false i-select
    # exposes the producer stage's `c*sum` directly to the consumer's
    # add, and XLA *CPU* contracts that into an FMA (~1 ulp on a few
    # cells) — the very reassociation documented for the shard_map legs
    # in RESULTS.md round 4.  Interpret mode therefore traces the
    # masked body everywhere so the CPU fuzz/bit-exactness contract
    # holds; test_group.py covers the split trace separately.
    if interpret and interior_split != "force":
        interior_split = False
    interior_split = bool(interior_split)
    if group < 1:
        raise ValueError(f"group size must be >= 1, got {group}")
    if ring_storage not in ("off", "bfloat16"):
        raise ValueError(f"ring_storage must be 'off' or 'bfloat16', "
                         f"got {ring_storage!r}")
    dims = program.dimensions
    I, J, K = dims
    auto = panel <= 0
    prefer8 = has_partial_rank_risk(program)

    def _divisor_at_most(ceiling: int) -> int:
        ceiling = max(1, min(ceiling, I))
        divs = [d for d in range(1, ceiling + 1) if I % d == 0]
        if prefer8:
            d8 = [d for d in divs if d % 8 == 0]
            if d8:
                return d8[-1]
        return divs[-1]

    # per-stage i-extent bound: auto panels want B >= 4*(g-1)*h so the
    # deepest stage's recompute halo stays <= ~50% (overlap.py's 4H
    # floor applied to the within-group cumulative extent)
    hmax = max((abs(a[0] or 0)
                for kspec in program.kernels.values()
                for alist in _kernel_reads(kspec).values()
                for a in alist), default=0)
    if auto:
        target = max(1, 4 * (group - 1) * hmax,
                     (1024 // J) if J < 512 else 1)
        cands = [d for d in range(1, I + 1)
                 if I % d == 0 and d >= min(target, I)]
        if prefer8:
            c8 = [d for d in cands if d % 8 == 0]
            cands = c8 or cands
        panel = min(cands) if cands else I
    B = panel
    if I % B or B < 1:
        raise ValueError(f"panel {B} must divide I={I}")

    plan = GroupPlan.build(program, analysis, B, group)
    budget = gate_frac * vmem_budget
    input_names = list(program.inputs)

    def _state_bytes(plan_, B_):
        return (plan_.vmem_bytes(program, J, K, ring_storage)
                + input_resident_bytes(program, input_names, B_, dims))

    while auto and B > 1 and _state_bytes(plan, B) > budget:
        nb = _divisor_at_most(max(1, B // 2))
        if nb >= B:
            break
        B = nb
        plan = GroupPlan.build(program, analysis, B, group)
    if _state_bytes(plan, B) > budget:
        raise ValueError("group rings/blocks exceed the VMEM budget")
    shiftk = K >= 256 and J >= 8

    n_panels = I // B
    input_kinds, in_specs = build_input_specs(program, input_names, B,
                                              dims, n_panels)

    if input_windows not in ("ring", "direct"):
        raise ValueError(f"input_windows must be 'ring' or 'direct', "
                         f"got {input_windows!r}")
    # direct input windows: expand each eligible input into overlapping
    # block refs (one per (consumer group, window panel)) instead of a
    # VMEM ring.  arg lists carry duplicates of the same input array.
    direct_inputs: List[str] = []
    win_ref_idx: Dict[Tuple[str, int], List[int]] = {}
    if input_windows == "direct":
        exp_names: List[str] = []
        exp_kinds: List[str] = []
        exp_specs: List[Any] = []
        for name, kind, spec_ in zip(input_names, input_kinds, in_specs):
            readers = [gi for gi in range(len(plan.groups))
                       if name in plan.needs[gi]
                       and name not in plan.groups[gi]]
            if kind != "stream" or not readers:
                exp_names.append(name)
                exp_kinds.append(kind)
                exp_specs.append(spec_)
                continue
            direct_inputs.append(name)
            for gi in readers:
                lo, hi = plan.needs[gi][name]
                cl, ch = _ceil_div(lo, B), _ceil_div(hi, B)
                idxs = []
                for s in range(-cl, ch + 1):
                    exp_names.append(name)
                    exp_kinds.append("window")
                    exp_specs.append(pl.BlockSpec(
                        (B, J, K),
                        lambda g, c=plan.lag[gi] - s, np_=n_panels:
                            (jnp.clip(g - c, 0, np_ - 1), 0, 0),
                        memory_space=pltpu.VMEM))
                    idxs.append(len(exp_names) - 1)
                win_ref_idx[(name, gi)] = idxs
        input_names = exp_names
        input_kinds = exp_kinds
        in_specs = exp_specs

    out_specs = []
    out_shapes = []
    for out in program.outputs:
        c = plan.lag[plan.group_of[out]]
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
            # bool history as 0/1 int32 (panel.py's bool_wire contract)
            return jnp.int32
        return dt

    bool_wire = (frozenset(
        f for f in list(program.kernels) + list(program.inputs)
        if jax.dtypes.canonicalize_dtype(
            program.field_dtype(f)) == jnp.bool_)
        if not interpret else frozenset())

    ring_fields_eff = [f for f in plan.ring_fields
                       if f not in direct_inputs]
    scratch_shapes = [
        pltpu.VMEM((plan.depth[f], B * J, K), _ring_dtype(f))
        for f in ring_fields_eff
    ]

    kernel = functools.partial(_group_kernel_body, program, analysis,
                               plan, input_names, input_kinds, shiftk,
                               interior_split, ring_fields_eff,
                               win_ref_idx, bool_wire,
                               ring_storage=ring_storage)
    lag_max = max(plan.lag[plan.group_of[o]] for o in program.outputs)
    grid = (n_panels + lag_max,)
    # expanded input_names double-count direct windows on purpose: each
    # overlapping ref is its own double-buffered block
    io_est = input_resident_bytes(program, input_names, B, dims)
    io_est += sum(2 * B * J * K * np.dtype(
        jax.dtypes.canonicalize_dtype(program.kernels[o].dtype)).itemsize
        for o in program.outputs)
    est = plan.vmem_bytes(program, J, K, ring_storage) + io_est \
        + 4 * B * J * K * 4
    for f in direct_inputs:   # their rings no longer exist
        est -= plan.depth[f] * B * J * K * np.dtype(
            program.field_dtype(f)).itemsize
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
    compile_chain_group.last_config = {
        "panel": B, "group": group,
        "groups": [list(grp) for grp in plan.groups],
        "ring_fields": list(ring_fields_eff),
        "direct_inputs": list(direct_inputs),
        "lag": list(plan.lag), "depth": dict(plan.depth)}
    return make_forward(program, input_names, dims, call,
                        len(out_shapes))


def run_chain_group(program: ir.Program, inputs: Dict[str, Any],
                    interpret: bool = False, panel: int = 0,
                    group: int = 2) -> Dict[str, np.ndarray]:
    fn = compile_chain_group(program, panel=panel, group=group,
                             interpret=interpret)
    out = fn({k: jnp.asarray(v) for k, v in inputs.items()})
    return {k: np.asarray(v) for k, v in out.items()}
