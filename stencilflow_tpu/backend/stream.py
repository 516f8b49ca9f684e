"""Streaming Pallas backend: plane-by-plane pipeline with VMEM ring buffers.

This is the closest TPU analogue of the reference's FPGA dataflow design
(/root/reference/stencilflow/stencil/intel_fpga.py: shift registers + delay
FIFOs + init/drain pipeline phases) and its delay-buffer alignment analysis
(kernel_chain_graph.py:476-559):

* the grid streams the outermost (i) dimension one plane per step, for
  ``I + lag_max`` steps (warmup/"saturation" + steady state + "drain", the
  simulator's phase model at simulator.py:3-19);
* every field keeps a short ring of recent (j, k)-planes in VMEM scratch —
  the line/delay buffers.  Ring depths come from the same alignment algebra
  as the reference: ``lag(s) = max_f (lag(f) + max_i_offset)`` and
  ``W_f = 1 + max_c (lag(c) - min_i_offset(c, f)) - lag(f)``;
* each HBM element is read exactly once and written exactly once — no halo
  re-reads, no redundant compute, so sustained throughput approaches the HBM
  roofline for deep chains;
* boundary conditions are exact in-kernel: j/k handled by masks over static
  plane coordinates, i handled by whole-plane selects on the (traced)
  streamed plane index.

Planes larger than the VMEM budget stream in halo-widened j-tiles; inputs
of any dimensionality are supported (lower-dimensional planes broadcast on
ingest).
"""
from __future__ import annotations

import dataclasses
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
from .stacked_io import narrow_store_dtype, shift_fill
from .tile_eval import eval_kernel_statements, read_access_tile

Vec3 = Tuple[int, int, int]

# Interior-tile split for cut dims (j-tiled / sharded blocks): interior
# tiles prove every origin-based OOB mask all-false and skip the
# iota+compare+select chains entirely; only edge tiles keep full masks.
# The stream-kernel analogue of panel.INTERIOR_SPLIT.  A/B knob.
TILE_INTERIOR_SPLIT = True


@dataclasses.dataclass
class StreamPlan:
    """Static schedule of the streamed pipeline."""
    lag: Dict[str, int]        # per field: newest plane at step g is g - lag
    ring: Dict[str, int]       # per field: ring depth (#planes retained)
    lag_max: int               # output skew; grid = I + lag_max
    halo_jk: Tuple[int, int]   # plane widening in (j, k)
    plane: Tuple[int, int]     # widened plane shape (PJ, PK)
    stage_major: bool = False  # micro-step order: stages outer, planes inner

    @classmethod
    def build(cls, analysis: ChainAnalysis,
              local_jk: Optional[Tuple[int, int]] = None,
              halo_jk: Tuple[int, int] = (0, 0),
              block: int = 1,
              min_lag_max: int = 0,
              direct_emit: bool = True,
              stage_major: bool = False) -> "StreamPlan":
        # Single chip: planes span the full (J, K) domain, unwidened —
        # circular-roll wrap-around of a j/k-offset read lands exactly on
        # the cells whose global index is out of domain, and every read
        # applies its BC mask there, so no halo margin (and no 128-lane
        # padding waste) is needed.  Sharded: planes cover the local block
        # widened by the exchanged halo (halo_jk), with BC masks evaluated
        # at global coordinates supplied via the origin scalars.
        program = analysis.program
        hj, hk = halo_jk
        dims = program.dimensions

        # i-offset extrema per (consumer, field)
        def i_range(kname, field):
            accs = program.kernels[kname].accesses()[field]
            offs = [a[0] for a in accs if a[0] is not None]
            if not offs:
                return (0, 0)
            return (min(0, min(offs)), max(0, max(offs)))

        lag: Dict[str, int] = {n: 0 for n in program.inputs}
        for kname in analysis.graph.kernel_order:
            lag[kname] = max(
                (lag[f] + i_range(kname, f)[1]
                 for f in analysis.graph.producers(kname)),
                default=0)  # constant/scalar-only kernels read no fields
        lag_max = max(lag[o] for o in program.outputs)
        # floor for i-sharded decomposition (emission must outlast the
        # top-halo ingestion), then pad to a block multiple so emitted
        # planes align with whole output blocks (micro-step blocking)
        lag_max = max(lag_max, min_lag_max)
        lag_max = -(-lag_max // block) * block

        # rings exist only for streamed fields (kernels and i-spanning
        # inputs); scalars and static planes are cached, not ring-buffered.
        # With ``direct_emit`` (emit_off == 0), an output whose lag is a
        # block multiple is written straight to the out ref at compute
        # time: pure outputs (no kernel consumers) then carry no ring at
        # all and consumed outputs only the consumer-driven depth — two
        # plane copies saved per output plane, which dominates for shallow
        # (HBM-bound) chains.
        streamed = [n for n, sp in program.inputs.items()
                    if not sp.is_scalar and sp.dim_mask[0]]
        # stage-major micro-steps (MXU transform batching): a producer
        # writes its whole block of planes before any consumer reads, so
        # consumed rings retain block-1 extra planes
        extra = (block - 1) if stage_major else 0
        ring: Dict[str, int] = {}
        for f in streamed + list(program.kernels):
            depth = 1
            consumed = f in program.inputs   # input rings always exist
            for c in analysis.graph.consumers(f):
                if c not in program.kernels:
                    continue
                consumed = True
                depth = max(depth,
                            1 + lag[c] - i_range(c, f)[0] - lag[f] + extra)
            if f in program.outputs:
                aligned = direct_emit and lag[f] % block == 0
                if not aligned:
                    depth = max(depth, 1 + lag_max - lag[f] + extra)
                elif not consumed:
                    continue   # pure output: emitted directly, no ring
            ring[f] = depth
        lj, lk = local_jk or (dims[1], dims[2])
        return cls(lag, ring, lag_max, (hj, hk),
                   (lj + 2 * hj, lk + 2 * hk), stage_major)

    def vmem_bytes(self, program: ir.Program, compute_dtype=None,
                   ring_storage=None) -> int:
        pj, pk = self.plane
        total = 0
        for f, depth in self.ring.items():
            dt = np.dtype(compute_dtype) if compute_dtype is not None \
                else np.dtype(program.field_dtype(f))
            itemsize = dt.itemsize
            if ring_storage == "bfloat16" and dt == np.float32:
                itemsize = 2   # bf16 ring storage, f32 compute
            total += depth * pj * pk * itemsize
        return total

    def io_window_bytes(self, program: ir.Program, block: int = 1,
                        compute_dtype=None) -> int:
        """VMEM the Mosaic pipeline itself allocates for the pallas
        input/output windows (2 buffering levels per operand).  Rings are
        explicit scratch; these windows are implicit, and they dominate at
        very large planes (e.g. 2-D domains), so the tile-size search must
        budget them too.  Inputs are cast to ``compute_dtype`` before the
        pallas call; outputs keep their kernel dtype."""
        pj, pk = self.plane
        core_j = pj - 2 * self.halo_jk[0]
        total = 0
        for name, spec in program.inputs.items():
            if spec.is_scalar:
                continue
            isz = (np.dtype(compute_dtype).itemsize if compute_dtype
                   is not None else
                   np.dtype(program.field_dtype(name)).itemsize)
            sizes = [(pj, pk)[d - 1] for d in (1, 2) if spec.dim_mask[d]]
            if spec.dim_mask[0]:
                sizes = [block] + sizes
            total += 2 * int(np.prod(sizes)) * isz
        for out in program.outputs:
            isz = np.dtype(
                jax.dtypes.canonicalize_dtype(
                    program.kernels[out].dtype)).itemsize
            total += 2 * block * core_j * pk * isz
        return total


def fast_pad_fields(program: ir.Program, analysis: ChainAnalysis,
                    plan: StreamPlan,
                    spilled: Optional[Dict[str, Any]] = None,
                    mode: str = "j") -> Dict[str, Tuple[int, int, float]]:
    """Fields whose ring planes can carry BC-value padding, making every
    (j, k)-offset read a single static slice — no circular roll, no iota
    mask, no select (the interior-read cost that capped shallow chains at
    ~0.38 of the HBM roofline in round 1).

    A field qualifies when every consumer sees the same constant-like
    boundary fill (CONSTANT with one shared value, missing-BC zero, or
    SHRINK junk): the ring plane is stored at (J + 2*pad_j, K + 2*pad_k)
    with the pad region pre-filled with that value, so ``read[j, k] =
    plane[pad_j + oj + j, pad_k + ok + k]`` IS the exact BC semantics
    (per-dim OOB union, matching the reference's rule cpu.py:71-78) —
    unlike fast_tile.py's zero-padded margins, no shell fixup is needed.
    COPY-BC fields (center-value semantics, not expressible as padding)
    and spilled rings keep the masked path.  Valid only for the
    single-chip untiled lowering (planes span the whole domain at
    origin 0); j-tiled/sharded planes keep origin-based masks.

    Returns ``{field: (pad_j, pad_k, fill)}``.
    """
    spilled = spilled or {}
    out: Dict[str, Tuple[int, int, float]] = {}
    for f in plan.ring:
        if f in spilled:
            continue
        if f in program.inputs and not all(program.inputs[f].dim_mask):
            continue   # partial-rank planes broadcast on ingest
        fill = None
        pj = pk = 0
        ok_field = True
        for c in analysis.graph.consumers(f):
            if c not in program.kernels:
                continue
            kspec = program.kernels[c]
            accs = kspec.accesses().get(f)
            if not accs:
                continue
            bc = kspec.boundary_conditions.get(f)
            if bc is None:
                this_fill = 0.0
            elif bc.kind == ir.BCKind.CONSTANT:
                this_fill = float(bc.value)
            elif bc.kind == ir.BCKind.SHRINK:
                this_fill = float(JUNK_VAL)
            else:               # COPY: center-value semantics
                ok_field = False
                break
            if fill is None:
                fill = this_fill
            elif fill != this_fill:
                ok_field = False
                break
            for a in accs:
                pj = max(pj, abs(a[1] or 0))
                pk = max(pk, abs(a[2] or 0))
        if mode == "j":
            # sublane-only padding: k stays at the exact lane width (a
            # k-pad adds a whole extra 128-lane tile to every ring op —
            # measured 18-40% slower than roll+mask); k-offset reads
            # keep the roll+mask path on the j-sliced plane
            pk = 0
        if ok_field:
            out[f] = (pj, pk, fill if fill is not None else 0.0)
    return out


def fast_pad_extra_bytes(program: ir.Program, plan: StreamPlan,
                         fast_fields, compute_dtype=None) -> int:
    """Extra VMEM the padded ring planes cost over plan.vmem_bytes."""
    J, K = plan.plane
    total = 0
    for f, (pj, pk, _fill) in fast_fields.items():
        itemsize = (np.dtype(compute_dtype).itemsize
                    if compute_dtype is not None
                    else np.dtype(program.field_dtype(f)).itemsize)
        total += plan.ring[f] * ((J + 2 * pj) * (K + 2 * pk)
                                 - J * K) * itemsize
    return total


def scratch_vmem_bytes(scratch_shapes) -> int:
    """Total bytes of the VMEM scratch allocations (semaphores ~0)."""
    total = 0
    for s in scratch_shapes:
        shape = getattr(s, "shape", None)
        dtype = getattr(s, "dtype", None)
        if shape is None or dtype is None:
            continue
        try:
            total += int(np.prod(shape)) * np.dtype(dtype).itemsize
        except TypeError:
            continue   # semaphore dtypes have no numpy equivalent
    return total


def jtile_splits(n: int, halo: int):
    """Legal j-tile configurations for a plane of ``n`` rows under the
    Mosaic block rules: the core tile divides ``n`` and is a multiple of 8
    (it is an output-block dim), and the overlap halo is rounded up to a
    multiple of 4 so the widened tile (core + 2*halo, an input-block dim)
    stays 8-divisible.  Returns ``(halo_pad, [(tiles, core), ...])`` in
    increasing tile-count order."""
    halo_pad = -(-halo // 4) * 4 if halo else 0
    splits = []
    for tiles in range(2, n + 1):
        if n % tiles:
            continue
        core = n // tiles
        if core % 8 or core <= halo_pad:
            continue
        splits.append((tiles, core))
    return halo_pad, splits


def _stream_kernel_body(program: ir.Program, analysis: ChainAnalysis,
                        plan: StreamPlan, input_names, input_kinds,
                        local_i, sharded, mxu_plans, pool_keys, pool_meta,
                        transform_keys, block, jtiled, emit_off,
                        compute_dtype, interpret, spill_reads, fast_fields,
                        *refs, ring_storage="off"):
    # fast_fields: {} (masked reads), a padding dict (fast_pad_fields),
    # or the string "shift" (shift-in-fill concat reads, no ring changes).
    # Per dim, a shift-fill read is exactly the BC semantics whenever the
    # ring plane spans the WHOLE global domain in that dim at origin 0 —
    # true untiled/unsharded, but also in sharded/out-of-core blocks for
    # every dim the block does not cut (i-only sharding leaves both j and
    # k eligible; j-tiling cuts j but never k, so large j-tiled 2-D
    # planes still get shift-fill k reads).  A cut dim keeps the
    # origin-based mask.
    shift_mode = fast_fields == "shift"
    if shift_mode:
        fast_fields = {}
    fast_shift = (shift_mode and not jtiled
                  and plan.halo_jk[0] == 0
                  and plan.plane[0] == program.dimensions[1])
    fast_shift_k = (shift_mode and plan.halo_jk[1] == 0
                    and plan.plane[1] == program.dimensions[2])
    """One grid step: ingest ``block`` input planes, advance every stage
    ``block`` planes, emit ``block`` output planes (micro-steps amortize the
    per-grid-step pipeline overhead).  With ``sharded`` the first ref is a
    (1, 3) SMEM block of global origin coordinates for this device's block.
    MXU-lowered stages (mxu_plans) read their banded matrices / correction
    planes from the ``pool_keys``-ordered refs that follow the inputs.

    ``spill_reads``: fields whose ring lives in an HBM circular buffer
    (the memory optimizer's spill decision, reference optimizer.py
    semantics mapped to TPU) -> the static read deltas ``lag[consumer] -
    oi`` it is read at; their planes move via explicit async DMA."""
    if sharded:
        origin_ref, *refs = refs
        origin_j = origin_ref[0, 1]
        if jtiled:   # shard origin + j-tile offset within the shard
            core_j0 = plan.plane[0] - 2 * plan.halo_jk[0]
            origin_j = origin_j + pl.program_id(0) * jnp.int32(core_j0)
        origin = (origin_ref[0, 0], origin_j, origin_ref[0, 2])
    elif jtiled:
        # grid = (j-tiles, stream); tile origin drives the global BC masks
        # (static-0 entries stay Python ints so trivially in-bounds reads
        # skip their masks, tile_eval._global_oob_mask)
        core_j0 = plan.plane[0] - 2 * plan.halo_jk[0]
        origin = (0, pl.program_id(0) * jnp.int32(core_j0), 0)
    else:
        origin = (0, 0, 0)
    n_in = len(input_names)
    n_pool = len(pool_keys)
    n_out = len(program.outputs)
    spilled = tuple(spill_reads)
    in_refs = refs[:n_in]
    pool = {k: refs[n_in + i] for i, k in enumerate(pool_keys)}
    out_refs = refs[n_in + n_pool:n_in + n_pool + n_out]
    idx = n_in + n_pool + n_out
    hbm_rings = dict(zip(spilled, refs[idx:idx + len(spilled)]))
    idx += len(spilled)
    vmem_ring_fields = [f for f in plan.ring if f not in spill_reads]
    rings = dict(zip(vmem_ring_fields,
                     refs[idx:idx + len(vmem_ring_fields)]))
    idx += len(vmem_ring_fields)
    transform_rings = dict(zip(transform_keys,
                               refs[idx:idx + len(transform_keys)]))
    idx += len(transform_keys)
    # per spilled field: (read buffers, write staging, DMA semaphores)
    spill_bufs = {}
    for f in spilled:
        spill_bufs[f] = (refs[idx], refs[idx + 1], refs[idx + 2])
        idx += 3

    gb = pl.program_id(1) if jtiled else pl.program_id(0)
    dims = program.dimensions
    I = local_i                      # local streamed extent (== global I
    Ig = dims[0]                     # unless i were sharded)
    hj, hk = plan.halo_jk
    J, K = dims[1], dims[2]          # GLOBAL extents (for BC masks)
    core_j = plan.plane[0] - 2 * hj  # local core block extents
    core_k = plan.plane[1] - 2 * hk
    lagB = plan.lag_max // block     # lag_max is padded to a block multiple

    # BC-value-padded rings (fast_pad_fields): pad regions are written once
    # at the first grid step and never touched again (plane writes store
    # only the core window), so offset reads are pure static slices
    if fast_fields:
        @pl.when(gb == 0)
        def _():
            for f, (pj_f, pk_f, fill) in fast_fields.items():
                if pj_f or pk_f:
                    rings[f][...] = jnp.full(
                        rings[f].shape, fill, rings[f].dtype)

    # composed-run stages: zero the derived transform rings once so
    # out-of-domain ring slots hold finite values — the SMEM table's
    # zero weights then make the per-offset i_oob selects unnecessary
    # (mxu_eval's ComposedPlan branch reads them select-free; a stale
    # wrapped slot is a finite real plane, also killed by weight 0)
    if mxu_plans:
        from .compose import ComposedPlan
        composed_tkeys = {(p.field, p.lkey, p.rkey)
                          for p in mxu_plans.values()
                          if isinstance(p, ComposedPlan)}
        if composed_tkeys:
            @pl.when(gb == 0)
            def _():
                for tkey in composed_tkeys:
                    if tkey in transform_rings:
                        transform_rings[tkey][...] = jnp.zeros(
                            transform_rings[tkey].shape,
                            transform_rings[tkey].dtype)
    else:
        composed_tkeys = set()

    def eval_dtype(f):
        """The dtype stage math runs in for planes of field ``f``."""
        return (compute_dtype or
                jax.dtypes.canonicalize_dtype(program.field_dtype(f)))

    # bf16 ring storage (f32 compute): rounded at store, cast at read.
    # Compiled buffers are real bf16; under interpret they stay f32 and
    # the store rounding is emulated (reduce_precision — CLAUDE.md: XLA
    # elides plain f32->bf16->f32 round-trips outside Mosaic).
    rs_round = (frozenset(f for f in plan.ring
                          if eval_dtype(f) == jnp.float32)
                if ring_storage == "bfloat16" else frozenset())

    def to_ring(field, plane):
        if plane.dtype == jnp.bool_:
            # bool rings are stored as int32 (Mosaic crash — ring_dtype)
            return plane.astype(jnp.int32)
        if field not in rs_round:
            return plane
        if interpret:
            return jax.lax.reduce_precision(plane, 8, 7)
        return plane.astype(jnp.bfloat16)

    def to_eval(field, arr):
        edt = eval_dtype(field)
        if edt == jnp.bool_:
            # bool history travels as 0/1 int32 through ALL ring/roll/
            # mask/select machinery (Mosaic crashes shifting i1
            # vectors, not on the ring type itself); the read exit
            # converts with != 0 (VERDICT r4 #5, stream leg — same
            # scheme as panel/group)
            return arr
        return arr if arr.dtype == edt else arr.astype(edt)

    def ring_store(field, slot, plane):
        """Write a core-shaped plane into its (possibly padded) ring slot."""
        plane = to_ring(field, plane)
        if field in fast_fields:
            pj_f, pk_f, _fill = fast_fields[field]
            rings[field][pl.ds(slot, 1), pl.ds(pj_f, plan.plane[0]),
                         pl.ds(pk_f, plan.plane[1])] = plane[None]
        else:
            rings[field][pl.ds(slot, 1)] = plane[None]

    def ring_core(field, slot):
        """Core-shaped plane from a (possibly padded) ring slot."""
        if field in fast_fields:
            pj_f, pk_f, _fill = fast_fields[field]
            return to_eval(field,
                           rings[field][slot, pl.ds(pj_f, plan.plane[0]),
                                        pl.ds(pk_f, plan.plane[1])])
        return to_eval(field, rings[field][slot])

    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)

    def _split_bf16(val):
        """bf16 hi/lo decomposition of an f32 plane (val == hi + lo up to
        one bf16 rounding of the residual).  In interpret mode the rounding
        is emulated with reduce_precision in f32 — XLA elides plain
        f32->bf16->f32 convert pairs as excess precision, which would
        silently zero the lo part."""
        if interpret:
            hi = jax.lax.reduce_precision(val, 8, 7)
            lo = jax.lax.reduce_precision(val - hi, 8, 7)
            return [hi, lo]
        hi = val.astype(jnp.bfloat16)
        lo = (val - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return [hi, lo]

    def _band_dot(key, val, side):
        """``pool[key] @ val`` (side "L") or ``val @ pool[key]`` ("R").

        f32 pool matrices use full-precision MXU passes (HIGHEST; the
        default truncates operands to bf16 — 1e-2-level error on deep
        chains).  bf16 pool matrices are the split-float fast path: the
        plane splits into bf16 hi+lo parts, each multiplied by the bf16
        matrix (plus a ``<key>__lo`` residual matrix when the weights are
        not exactly representable) with f32 accumulation — 2-3 single-pass
        bf16 matmuls instead of ~6 emulation passes, exact to ~1e-7 when
        the banded weights are bf16-exact (normalized patterns usually
        are).  Blocked-banded matrices (pool_meta entries,
        backend/linear.py:_blocked_rows) apply per output block against
        only their narrow source window — O(n*Twin*k) rectangular matmuls
        instead of O(n^2*k) full ones."""
        from .linear import is_stacked_key
        starts = pool_meta.get(key)
        mref = pool[key]
        # per-tile/shard stacked matrices arrive as a (1, n, n) block
        # (the instance's slice, selected by index map / sharding)
        unstack = (lambda m: m[0]) if is_stacked_key(key) else \
                  (lambda m: m[...])
        if mref.dtype == jnp.bfloat16:
            lo_ref = pool.get(key + "__lo")
            if val.dtype == jnp.bfloat16:
                vparts = [val]
            elif pool_meta.get("__precision__") == "bf16":
                # single-pass opt-in mode (finalize_pool sentinel): round
                # the operand to bf16, one matmul per side, f32 accumulate
                v32 = val.astype(jnp.float32)
                vparts = [jax.lax.reduce_precision(v32, 8, 7) if interpret
                          else v32.astype(jnp.bfloat16)]
            else:
                vparts = _split_bf16(val.astype(jnp.float32))
            mats = [mref] + ([lo_ref] if lo_ref is not None else [])
            # skip the lo@lo cross term (~2^-32 relative)
            pairs = [(m, v) for mi, m in enumerate(mats)
                     for vi, v in enumerate(vparts) if mi == 0 or vi == 0]
            if interpret:
                # outside Mosaic, XLA-on-TPU accumulates bf16 dots in bf16;
                # upcasting the (already bf16-rounded) operands models the
                # Mosaic split path exactly
                fdot = lambda a, b: jnp.dot(
                    a.astype(jnp.float32), b.astype(jnp.float32),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
            else:
                fdot = functools.partial(jnp.dot,
                                         preferred_element_type=jnp.float32)
        else:
            pairs = [(mref, val)]
            fdot = dot
        if starts is None:
            acc = None
            for m, v in pairs:
                mm = unstack(m)
                t = fdot(mm, v) if side == "L" else fdot(v, mm)
                acc = t if acc is None else acc + t
            return acc
        blocks = []
        for t, s in enumerate(starts):
            acc = None
            for m, v in pairs:
                if side == "L":
                    twin = m.shape[2]
                    win = jax.lax.slice(v, (s, 0), (s + twin, v.shape[1]))
                    r = fdot(m[t], win)
                else:
                    twin = m.shape[1]
                    win = jax.lax.slice(v, (0, s), (v.shape[0], s + twin))
                    r = fdot(win, m[t])
                acc = r if acc is None else acc + r
            blocks.append(acc)
        return jnp.concatenate(blocks, axis=0 if side == "L" else 1)

    def apply_transform_block(vals, lkey, rkey):
        """(L, R) band transforms of ``len(vals)`` planes as ONE wide
        matmul per side: the free (non-contracted) axis of the planes is
        concatenated — k for L (M @ [v0|v1|..]), j for R ([v0/v1/..] @ M)
        — so the MXU sees a B-times-wider operand instead of B separate
        passes (stage-major micro-steps; per-element math is identical to
        the per-plane path, the contraction order does not change).

        Batching requires vreg-aligned planes: Mosaic's concatenate
        rejects operands whose packed lane/sublane offsets differ
        ("result/input offset mismatch on non-concat dimension"), which
        happens whenever pk is not a lane multiple (128) or pj not a
        sublane multiple (8) — planes then share vregs at nonzero
        offsets.  Small planes fall back to per-plane transforms (their
        matmuls gain nothing from batching anyway)."""
        pj_, pk_ = plan.plane
        vals = [v if hasattr(v, "shape") and v.shape == plan.plane
                else jnp.broadcast_to(v, plan.plane) for v in vals]
        if len(vals) > 1 and not interpret and (pk_ % 128 or pj_ % 8):
            return [apply_transform(v, lkey, rkey) for v in vals]
        if lkey is not None:
            cat = vals[0] if len(vals) == 1 else \
                jnp.concatenate(vals, axis=1)
            res = _band_dot(lkey, cat, "L")
            vals = [jax.lax.slice(res, (0, m * pk_),
                                  (res.shape[0], (m + 1) * pk_))
                    for m in range(len(vals))]
        if rkey is not None:
            cat = vals[0] if len(vals) == 1 else \
                jnp.concatenate(vals, axis=0)
            res = _band_dot(rkey, cat, "R")
            vals = [jax.lax.slice(res, (m * pj_, 0),
                                  ((m + 1) * pj_, res.shape[1]))
                    for m in range(len(vals))]
        return vals

    def apply_transform(val, lkey, rkey):
        return apply_transform_block([val], lkey, rkey)[0]

    def write_transforms(field, slot, plane_f32):
        for tkey in transform_keys:
            if tkey[0] != field:
                continue
            t = apply_transform(plane_f32, tkey[1], tkey[2])
            transform_rings[tkey][pl.ds(slot, 1)] = t[None]

    def write_transforms_batch(field, items):
        """Batched ``write_transforms`` over one block of planes:
        ``items`` is ``[(slot, guard, plane), ...]`` — stores are guarded
        per micro-step (warmup / drain planes compute junk transforms that
        are simply not stored)."""
        keys = [t for t in transform_keys if t[0] == field]
        if not keys:
            return
        for tkey in keys:
            ts = apply_transform_block([p for _s, _g, p in items],
                                       tkey[1], tkey[2])
            for (slot, guard, _p), t in zip(items, ts):
                @pl.when(guard)
                def _(tkey=tkey, slot=slot, t=t):
                    transform_rings[tkey][pl.ds(slot, 1)] = t[None]

    # g-independent caches: scalars and non-streamed ("static") planes
    plane_cache: Dict[str, Any] = {}
    scalar_cache: Dict[str, Any] = {}
    for name, kind, ref in zip(input_names, input_kinds, in_refs):
        if kind == "scalar":
            scalar_cache[name] = ref[0, 0]
        elif kind == "static":
            plane_cache[name] = ref[...]

    # OOB masks depend only on (offsets, plane shape): share them across
    # every read of every stage in this grid step
    mask_cache: Dict[Any, Any] = {}

    # HBM-spilled rings move planes via explicit async DMA; a
    # per-(field, delta, micro-step) cache fetches each distinct plane once
    spill_cache: Dict[Any, Any] = {}

    spill_pending: Dict[Any, Any] = {}

    def spill_prefetch(g, m):
        """Start the DMAs for every spilled read of this micro-step whose
        plane was written at an earlier step (delta > producer lag) — they
        overlap each other and the stage compute until first use.
        Same-step reads (delta == lag, a consumer directly behind its
        producer) stay synchronous in spill_read."""
        for f, dl in spill_reads.items():
            rbuf, _stage, sems = spill_bufs[f]
            prod_lag = plan.lag.get(f, 0)
            for ridx, delta in enumerate(dl):
                if delta <= prod_lag:
                    continue
                Wc = jnp.int32(plan.ring[f])
                target = g - jnp.int32(delta)
                slot = jax.lax.rem(jax.lax.rem(target, Wc) + Wc, Wc)
                dma = pltpu.make_async_copy(
                    hbm_rings[f].at[pl.ds(slot, 1)],
                    rbuf.at[pl.ds(ridx, 1)], sems.at[ridx])
                dma.start()
                spill_pending[(f, delta, m)] = dma

    def spill_read(field, delta, slot, m):
        key = (field, delta, m)
        if key in spill_cache:
            return spill_cache[key]
        rbuf, _stage, sems = spill_bufs[field]
        ridx = spill_reads[field].index(delta)
        dma = spill_pending.pop(key, None)
        if dma is None:   # same-step read: fetch synchronously
            dma = pltpu.make_async_copy(
                hbm_rings[field].at[pl.ds(slot, 1)],
                rbuf.at[pl.ds(ridx, 1)], sems.at[ridx])
            dma.start()
        dma.wait()
        plane = to_eval(field, rbuf[ridx])
        spill_cache[key] = plane
        return plane

    def spill_write(field, slot, plane):
        _rbuf, stage, sems = spill_bufs[field]
        stage[...] = to_ring(field, plane)[None]
        dma = pltpu.make_async_copy(stage,
                                    hbm_rings[field].at[pl.ds(slot, 1)],
                                    sems.at[len(spill_reads[field])])
        dma.start()
        dma.wait()

    _shift_fill = shift_fill   # shared helper (stacked_io.py)

    def make_read(kname, q, m=0, assume_dims=(), mcache=None):
        # assume_dims/mcache: interior-tile split (see the drive
        # loop) — proven-in-bounds cut dims skip their mask terms;
        # each pl.when branch gets its own mask cache so traced
        # masks never escape their cond region
        mc = mask_cache if mcache is None else mcache
        bcs = program.kernels[kname].boundary_conditions

        def read(field, offsets):
            val = _read_raw(field, offsets)
            edt = eval_dtype(field)
            if edt == jnp.bool_ and val.dtype != edt:
                return val != 0   # 0/1 int32 transport -> bool at exit
            return val

        def _read_raw(field, offsets):
            if field in scalar_cache:
                return scalar_cache[field]
            oi, oj, ok = offsets
            bc = bcs.get(field)
            use_shift = (fast_shift and
                         (bc is None or bc.kind != ir.BCKind.COPY))
            fillv = (bc.value if bc is not None and
                     bc.kind == ir.BCKind.CONSTANT else
                     JUNK_VAL if bc is not None and
                     bc.kind == ir.BCKind.SHRINK else 0.0)
            if field in plane_cache:
                plane = plane_cache[field]
                spec = program.inputs[field]
                # widened-plane shape with per-dim broadcast
                pj = plan.plane[0] if spec.dim_mask[1] else 1
                pk = plan.plane[1] if spec.dim_mask[2] else 1
                plane = plane.reshape(pj, pk)
                plane = jnp.broadcast_to(plane, plan.plane)
                use_shift_k = (fast_shift_k and
                               (bc is None or
                                bc.kind != ir.BCKind.COPY))
                if use_shift or use_shift_k:
                    if oj:
                        if use_shift:
                            plane = _shift_fill(plane, oj, 0, fillv)
                        else:
                            plane = read_access_tile(
                                plane, (oj, 0), bc,
                                (origin[1], origin[2]),
                                plan.halo_jk, (J, K), cache=mc,
                                assume_dims=assume_dims)
                    if ok:
                        if use_shift_k:
                            plane = _shift_fill(plane, ok, 1, fillv)
                        else:   # k is a cut dim: origin-based mask
                            plane = read_access_tile(
                                plane, (0, ok), bc,
                                (origin[1], origin[2]),
                                plan.halo_jk, (J, K), cache=mc,
                                assume_dims=assume_dims)
                    return plane
                return read_access_tile(plane, (oj, ok), bc,
                                        (origin[1], origin[2]),
                                        plan.halo_jk, (J, K),
                                        cache=mc, assume_dims=assume_dims)
            W = plan.ring[field]
            target = q + jnp.int32(oi or 0)
            Wc = jnp.int32(W)
            slot = jax.lax.rem(jax.lax.rem(target, Wc) + Wc, Wc)
            use_shift_k = (fast_shift_k and
                           (bc is None or bc.kind != ir.BCKind.COPY))
            if (use_shift or use_shift_k) and field not in spill_reads:
                val = to_eval(field, rings[field][slot])
                if oj:
                    if use_shift:
                        val = _shift_fill(val, oj, 0, fillv)
                    else:
                        # j-tiled/j-sharded: j keeps the origin mask
                        val = read_access_tile(
                            val, (oj, 0), bc, (origin[1], origin[2]),
                            plan.halo_jk, (J, K), cache=mc,
                            assume_dims=assume_dims)
                if ok:
                    if use_shift_k:
                        val = _shift_fill(val, ok, 1, fillv)
                    else:   # k is a cut dim: origin-based mask
                        val = read_access_tile(
                            val, (0, ok), bc, (origin[1], origin[2]),
                            plan.halo_jk, (J, K), cache=mc,
                            assume_dims=assume_dims)
                if oi is not None and oi != 0:
                    gtarget = origin[0] + target
                    i_oob = (gtarget < 0) | (gtarget >= Ig)
                    val = jnp.where(i_oob,
                                    jnp.asarray(fillv, val.dtype), val)
                return val
            if field in fast_fields:
                # BC-padded ring: the j (and in "jk" mode k) offset read
                # is one static slice with exact boundary semantics (no
                # roll / mask / select in the padded dims)
                pj_f, pk_f, fill_f = fast_fields[field]
                if pk_f == 0 and (ok or 0) != 0:
                    base = to_eval(field,
                                   rings[field][slot,
                                                pl.ds(pj_f + (oj or 0),
                                                      plan.plane[0]), :])
                    # k component: roll + k-only mask (the j-pad rows are
                    # uniform fill, so the roll keeps them correct)
                    val = read_access_tile(base, (0, ok), bc,
                                           (origin[1], origin[2]),
                                           plan.halo_jk, (J, K),
                                           cache=mc, assume_dims=assume_dims)
                else:
                    val = to_eval(field,
                                  rings[field][slot,
                                               pl.ds(pj_f + (oj or 0),
                                                     plan.plane[0]),
                                               pl.ds(pk_f + (ok or 0),
                                                     plan.plane[1])])
                if oi is not None and oi != 0:
                    gtarget = origin[0] + target
                    i_oob = (gtarget < 0) | (gtarget >= Ig)
                    # fill_f IS this consumer's fill (eligibility enforces
                    # one shared value across consumers)
                    val = jnp.where(i_oob,
                                    jnp.asarray(fill_f, val.dtype), val)
                return val
            if field in spill_reads:
                plane = spill_read(field,
                                   plan.lag[kname] - (oi or 0), slot, m)
            else:
                plane = to_eval(field, rings[field][slot])
            center = None
            if bc is not None and bc.kind == ir.BCKind.COPY and \
                    oi not in (None, 0):
                # copy center is the evaluation-point plane q, not the
                # i-shifted target plane
                cslot = jax.lax.rem(jax.lax.rem(q, Wc) + Wc, Wc)
                if field in spill_reads:
                    center = spill_read(field, plan.lag[kname], cslot, m)
                else:
                    center = to_eval(field, rings[field][cslot])
            val = read_access_tile(plane, (oj, ok), bc,
                                   (origin[1], origin[2]),
                                   plan.halo_jk, (J, K), center=center,
                                   cache=mc, assume_dims=assume_dims)
            if oi is not None and oi != 0:
                gtarget = origin[0] + target
                i_oob = (gtarget < 0) | (gtarget >= Ig)
                if bc is None or bc.kind == ir.BCKind.CONSTANT:
                    fill = jnp.asarray(
                        bc.value if bc is not None else 0.0, val.dtype)
                    val = jnp.where(i_oob, fill, val)
                elif bc.kind == ir.BCKind.COPY:
                    val = jnp.where(i_oob, center, val)
                elif bc.kind == ir.BCKind.SHRINK:
                    val = jnp.where(
                        i_oob, jnp.asarray(JUNK_VAL, val.dtype), val)
            return val

        return read

    def ring_slot(field, oi, q):
        """(ring slot, i_oob) of field's plane at i-offset ``oi``."""
        Wc = jnp.int32(plan.ring[field])
        target = q + jnp.int32(oi or 0)
        slot = jax.lax.rem(jax.lax.rem(target, Wc) + Wc, Wc)
        gtarget = origin[0] + target
        return slot, (gtarget < 0) | (gtarget >= Ig)

    def fetch_plane(field, oi, q):
        """Raw (un-BC'd) plane of ``field`` at i-offset ``oi`` (None for
        non-streamed fields); returns (plane_or_scalar, i_oob_or_None)."""
        if field in scalar_cache:
            return scalar_cache[field], None
        if field in plane_cache:
            spec = program.inputs[field]
            pjj = plan.plane[0] if spec.dim_mask[1] else 1
            pkk = plan.plane[1] if spec.dim_mask[2] else 1
            pln = plane_cache[field].reshape(pjj, pkk)
            return jnp.broadcast_to(pln, plan.plane), None
        slot, i_oob = ring_slot(field, oi, q)
        return ring_core(field, slot), i_oob

    # transformed-plane cache for non-streamed (broadcast) fields
    static_transform_cache: Dict[Any, Any] = {}

    def transformed_plane(field, oi, q, lkey, rkey):
        """Plane of ``field`` at i-offset ``oi`` with (L, R) applied —
        from the derived transform ring when available (computed once per
        plane instead of once per consuming group)."""
        tkey = (field, lkey, rkey)
        if field in scalar_cache or field in plane_cache:
            if tkey not in static_transform_cache:
                base, _ = fetch_plane(field, None, q)
                static_transform_cache[tkey] = \
                    apply_transform(base, lkey, rkey)
            return static_transform_cache[tkey], None
        if tkey in transform_rings:
            slot, i_oob = ring_slot(field, oi, q)
            return transform_rings[tkey][slot], i_oob
        base, i_oob = fetch_plane(field, oi, q)
        return apply_transform(base, lkey, rkey), i_oob

    def mxu_eval(mplan, q):
        """Banded-matmul plane update (backend/linear.py), or a composed-
        run update (backend/compose.py): ONE cached (L, R) transform per
        source plane combined across i-offsets with exact per-output-plane
        weights from a small SMEM table (interior planes share one row;
        the first/last D planes get the boundary-truncated rows of the
        composed i-matrix)."""
        from .compose import ComposedPlan
        if isinstance(mplan, ComposedPlan):
            tref = pool[mplan.table_key]
            Dc = jnp.int32(mplan.D)
            nrow = mplan.table_rows
            # the table is indexed by the GLOBAL plane: origin[0] + q
            # globalizes the local evaluation index on i-sharded /
            # chunked paths (0 + q on the single-chip path)
            qg = origin[0] + q
            if mplan.full_table:
                row = qg
            else:
                row = jnp.where(
                    qg < Dc, qg,
                    jnp.where(qg >= jnp.int32(Ig) - Dc,
                              jnp.int32(nrow) + qg - jnp.int32(Ig),
                              Dc))
            # warmup (q < 0) evaluations are discarded; clamp so the
            # table read stays in range
            row = jnp.clip(row, 0, nrow - 1)
            tkey = (mplan.field, mplan.lkey, mplan.rkey)
            ring_zeroed = tkey in composed_tkeys and \
                tkey in transform_rings
            acc = None
            for idx, d in enumerate(mplan.offsets):
                tplane, i_oob = transformed_plane(
                    mplan.field, d, q, mplan.lkey, mplan.rkey)
                val = tplane * tref[row, idx]
                if i_oob is not None and not ring_zeroed:
                    # the table weight is already 0 for out-of-domain
                    # source planes; with a zero-initialized transform
                    # ring (gb == 0 above) every slot is finite and the
                    # select is elided — this guard only remains for
                    # ring-less fall-through transforms, where base-ring
                    # garbage could reach 0 * NaN
                    val = jnp.where(i_oob, jnp.float32(0.0), val)
                acc = val if acc is None else acc + val
            return acc
        acc = None
        for grp in mplan.groups:
            parts = None
            i_oob = None
            for term in grp.terms:
                if term.left_key is None and term.right_key is None:
                    base, i_oob = fetch_plane(grp.field, grp.oi, q)
                    val = base * jnp.float32(term.scale)
                    if not hasattr(val, "shape") or val.shape != plan.plane:
                        val = jnp.broadcast_to(val, plan.plane)
                else:
                    val, i_oob = transformed_plane(
                        grp.field, grp.oi, q, term.left_key, term.right_key)
                    if term.scale != 1.0:
                        val = val * jnp.float32(term.scale)
                parts = val if parts is None else parts + val
            if grp.correction_key is not None:
                from .linear import is_stacked_key
                cref = pool[grp.correction_key]
                parts = parts + (cref[0] if
                                 is_stacked_key(grp.correction_key)
                                 else cref[...])
            if i_oob is not None:
                alt = jnp.float32(grp.bc_value * grp.weight_sum)
                parts = jnp.where(i_oob, alt, parts)
            acc = parts if acc is None else acc + parts
        if mplan.bias:
            acc = acc + jnp.float32(mplan.bias)
        return acc

    # outputs whose lag is a block multiple emit directly from the compute
    # step (position m of the out block the index map selected); the rest
    # go through their ring with the lag_max skew (step 3)
    direct_set = ({f for f in program.outputs
                   if plan.lag[f] % block == 0} if emit_off == 0 else set())
    out_ref_of = dict(zip(program.outputs, out_refs))

    # ---- micro-steps: block planes per grid step --------------------------
    # Two drive orders over the (micro-step, work-item) product:
    #   plane-major (default): for each plane m — ingest, every stage,
    #     emit.  Matches the reference pipeline's one-plane-at-a-time
    #     semantics directly.
    #   stage-major (plan.stage_major, MXU chains): ingest ALL block
    #     planes, then advance each stage across the whole block, with
    #     the (L, R) band transforms batched into one block-wide matmul
    #     per side (apply_transform_block) — B-times-wider MXU operands.
    #     Ring depths carry the +block-1 planes this ordering needs
    #     (StreamPlan.build).
    ring_outs = [(f, out_ref_of[f]) for f in program.outputs
                 if f not in direct_set]

    def ingest_one(m, g, collect=None):
        """Ingest plane m of this input block (partial planes broadcast
        to the full widened-plane shape)."""
        for name, kind, ref in zip(input_names, input_kinds, in_refs):
            if kind not in ("stream", "stream_partial"):
                continue
            if kind == "stream":
                plane = ref[m]
            else:
                dmask = program.inputs[name].dim_mask
                shape = (plan.plane[0] if dmask[1] else 1,
                         plan.plane[1] if dmask[2] else 1)
                plane = jnp.broadcast_to(ref[m].reshape(shape),
                                         plan.plane)
            slot = jax.lax.rem(g, jnp.int32(plan.ring[name]))

            @pl.when(g < I)
            def _(name=name, plane=plane, slot=slot):
                if name in spill_reads:
                    spill_write(name, slot, plane)
                else:
                    ring_store(name, slot, plane)
                if collect is None:
                    write_transforms(name, slot, plane)

            if collect is not None:
                collect.setdefault(name, []).append((slot, g < I, plane))

    def advance_one(kname, m, g, collect=None, assume_dims=(),
                    mcache=None):
        """Advance stage ``kname`` one plane (micro-step m)."""
        kspec = program.kernels[kname]
        q = g - jnp.int32(plan.lag[kname])
        if kname in mxu_plans:
            result = mxu_eval(mxu_plans[kname], q)
        else:
            result = eval_kernel_statements(
                kspec, make_read(kname, q, m, assume_dims=assume_dims,
                                 mcache=mcache))
        result = jnp.asarray(result)
        if result.shape != plan.plane:
            result = jnp.broadcast_to(result, plan.plane)
        result = result.astype(
            compute_dtype or
            jax.dtypes.canonicalize_dtype(kspec.dtype))

        if kname in plan.ring:
            Wc = jnp.int32(plan.ring[kname])
            slot = jax.lax.rem(jax.lax.rem(q, Wc) + Wc, Wc)

            @pl.when(q >= 0)
            def _(kname=kname, result=result, slot=slot):
                if kname in spill_reads:
                    spill_write(kname, slot, result)
                else:
                    ring_store(kname, slot, result)
                if collect is None:
                    write_transforms(kname, slot, result)

            if collect is not None:
                collect.setdefault(kname, []).append((slot, q >= 0,
                                                      result))

        if kname in direct_set:
            # result IS output plane q = (gb - lag/block)*block + m —
            # exactly position m of the block this step's out index
            # map selected; guard against warmup (q < 0) and the
            # drain steps that revisit the (clamped) last block
            oref = out_ref_of[kname]
            core = jax.lax.slice(result, (hj, hk),
                                 (hj + core_j, hk + core_k))

            @pl.when((q >= 0) & (q < I))
            def _(oref=oref, core=core, m=m):
                oref[pl.ds(m, 1)] = core.reshape(
                    1, core_j, core_k).astype(oref.dtype)

    def emit_rings(m):
        """Ring-emitting outputs: plane m of the output block at index
        max(gb - lagB, 0) (clamped during warmup; the final write to
        each block wins).  With an i-halo (emit_off, sharded
        i-decomposition, block == 1) the emitted ring plane is offset
        into the core region."""
        if not ring_outs:
            return
        p_out = (jnp.maximum(gb - jnp.int32(lagB + emit_off), 0)
                 + jnp.int32(emit_off)) * jnp.int32(block) \
            + jnp.int32(m)
        for out_name, ref in ring_outs:
            oslot = jax.lax.rem(p_out, jnp.int32(plan.ring[out_name]))
            plane = ring_core(out_name, oslot)
            core = jax.lax.slice(plane, (hj, hk),
                                 (hj + core_j, hk + core_k))
            ref[pl.ds(m, 1)] = core.reshape(1, core_j, core_k).astype(
                ref.dtype)

    gs = [gb * jnp.int32(block) + jnp.int32(m) for m in range(block)]
    if plan.stage_major:
        assert not spill_reads, "stage-major excludes spilled rings"
        coll: Dict[str, list] = {}
        for m, g in enumerate(gs):
            ingest_one(m, g, coll)
        for name, items in coll.items():
            write_transforms_batch(name, items)
        for kname in analysis.graph.kernel_order:
            kcoll: Dict[str, list] = {}
            for m, g in enumerate(gs):
                advance_one(kname, m, g, kcoll)
            for f, items in kcoll.items():
                write_transforms_batch(f, items)
        for m in range(block):
            emit_rings(m)
    else:
        # ---- interior-tile split (cut dims) ---------------------------
        # Cut dims (j-tiled grids, sharded blocks) evaluate origin-based
        # OOB masks on every spanned read of every stage; on interior
        # tiles those masks are provably all-false.  The tile-interior
        # predicate is stage-independent (it depends only on the tile
        # origin), so ONE pl.when pair wraps the whole stage loop per
        # micro-step: interior tiles drop the cut-dim mask terms
        # (read_access_tile assume_dims), edge tiles keep full masks,
        # and cross-stage value forwarding survives inside each region
        # (a per-stage split measured 0.76x — the cond boundaries forced
        # every stage through a ring round-trip, RESULTS.md round 3).
        # Exact by construction: a dropped term is all-false whenever
        # the predicate holds.  Spilled rings keep the single path (their
        # DMA caches must not straddle cond regions); stage-major ditto
        # (its collect lists would leak tracers across regions); MXU
        # chains ditto (mxu_eval doesn't consult assume_dims, and
        # duplicating its matmuls only bloats the kernel).
        split_assume: Tuple[int, ...] = ()
        split_pred = None
        if TILE_INTERIOR_SPLIT and not spill_reads and not mxu_plans:
            cut = []   # (program dim d, widened extent, halo, global, org)
            for d, pdim, h, ext, org in ((1, plan.plane[0], hj, J,
                                          origin[1]),
                                         (2, plan.plane[1], hk, K,
                                          origin[2])):
                if isinstance(org, (int, np.integer)) or pdim - 2 * h >= ext:
                    continue   # uncut / static origin: masks are the BC
                offs = [a[d] for kspec_ in program.kernels.values()
                        for accs in kspec_.accesses().values()
                        for a in accs if a[d] is not None]
                if not offs:
                    continue   # dim never spanned: no masks to elide
                neg = max((-o for o in offs if o < 0), default=0)
                pos = max((o for o in offs if o > 0), default=0)
                term = ((org >= h + neg)
                        & (org <= ext - pdim + h - pos))
                split_pred = term if split_pred is None \
                    else split_pred & term
                split_assume += (d - 1,)   # tile-dim index (j=0, k=1)
                cut.append(d)

        for m, g in enumerate(gs):
            # 0. start this micro-step's spilled-ring reads (distinct
            #    slots from any write this step, so they overlap freely)
            if spill_reads:
                spill_prefetch(g, m)
            ingest_one(m, g)
            if split_pred is not None:
                @pl.when(split_pred)
                def _(m=m, g=g):
                    mc = dict(mask_cache)
                    for kname in analysis.graph.kernel_order:
                        advance_one(kname, m, g,
                                    assume_dims=split_assume, mcache=mc)

                @pl.when(jnp.logical_not(split_pred))
                def _(m=m, g=g):
                    mc = dict(mask_cache)
                    for kname in analysis.graph.kernel_order:
                        advance_one(kname, m, g, mcache=mc)
            else:
                for kname in analysis.graph.kernel_order:
                    advance_one(kname, m, g)
            emit_rings(m)


def choose_spill(program: ir.Program, analysis: ChainAnalysis,
                 plan: StreamPlan, budget: float, compute_dtype=None,
                 allow_outputs: bool = True, ring_storage=None):
    """Greedy HBM ring-spill selection for one stream plan.

    The reference memory optimizer's metric (bytes freed per unit of extra
    slow-memory traffic, optimizer.py:209-248): a spilled ring keeps one
    staging plane plus one VMEM read buffer per distinct read delta and
    pays 1 write + |deltas| plane reads of HBM traffic per step.  Returns
    ``({field: sorted deltas}, resulting_vmem_bytes)`` or None when no
    selection fits ``budget``.  ``allow_outputs=False`` excludes program
    outputs (required when they emit through their ring, i.e. the
    i-sharded path)."""
    pj0, pk0 = plan.plane

    def itemsize(f):
        dt = np.dtype(compute_dtype if compute_dtype is not None
                      else program.field_dtype(f))
        if ring_storage == "bfloat16" and dt == np.float32:
            return 2
        return dt.itemsize

    deltas: Dict[str, set] = {f: set() for f in plan.ring}
    for kname in analysis.graph.kernel_order:
        kspec = program.kernels[kname]
        for f, accs in kspec.accesses().items():
            if f not in plan.ring:
                continue
            for a in accs:
                deltas[f].add(plan.lag[kname] - (a[0] or 0))
            bc = kspec.boundary_conditions.get(f)
            if bc is not None and bc.kind == ir.BCKind.COPY:
                deltas[f].add(plan.lag[kname])   # copy-center read
    order = sorted(plan.ring,
                   key=lambda f: -(plan.ring[f] / (1 + len(deltas[f]))))
    need = plan.vmem_bytes(program, compute_dtype, ring_storage)
    sel: Dict[str, Tuple[int, ...]] = {}
    for f in order:
        if need <= budget:
            break
        if not allow_outputs and f in program.outputs:
            continue
        keep = 1 + len(deltas[f])     # staging + read buffers
        if plan.ring[f] <= keep or not deltas[f]:
            continue                  # no saving / never read
        need -= (plan.ring[f] - keep) * pj0 * pk0 * itemsize(f)
        sel[f] = tuple(sorted(deltas[f]))
    if sel and need <= budget:
        return {f: sel[f] for f in sorted(sel)}, need
    return None


def compile_chain_stream(program: ir.Program,
                         analysis: Optional[ChainAnalysis] = None,
                         interpret: bool = False,
                         vmem_budget: int = config.TPU_STREAM_VMEM_BUDGET,
                         mxu: str = "auto",
                         mxu_min_footprint: int = 12,
                         mxu_precision: str = "split",
                         block: int = 0,
                         spill: str = "auto",
                         fast: str = "auto",
                         stage_major: str = "auto",
                         compute_dtype=None,
                         compose: str = "auto",
                         ring_storage: str = "off",
                         _composed=None):
    """Build a jitted ``fn(inputs) -> outputs`` around the streaming kernel.

    ``compute_dtype``: optional reduced-precision storage/compute type
    (e.g. "bfloat16") — halves HBM traffic and VMEM for bandwidth-bound
    chains at reduced accuracy (outputs cast back to the program dtype).
    ``ring_storage``: "bfloat16" stores the VMEM/HBM stage rings in bf16
    while COMPUTING in f32 (cast at ring read, rounded at ring store) —
    halves ring VMEM (larger blocks/planes fit) and ring-store traffic
    without the whole-chain compute-cast tax of ``compute_dtype``; each
    stage output rounds once to bf16 between stages, so deep-chain error
    grows ~1 bf16 ulp per stage (the r2 bf16-storage economics,
    reference optimizer.py fast-memory role).  Ignored for non-f32
    fields and when ``compute_dtype`` is already reduced.
    ``mxu``: "auto" lowers wide affine stages (footprint >=
    ``mxu_min_footprint``) to banded matmuls on the MXU (backend/linear.py);
    "off" keeps everything on the VPU.  ``mxu_precision``: "split" (default)
    runs the band transforms as 2-3 single-pass bf16 matmuls with f32
    accumulation via hi/lo operand splitting (near-f32 accuracy, ~3x the
    throughput); "bf16" rounds matrices AND operand planes to bf16 for ONE
    pass per matmul (fastest; ~1e-2-level relative error — opt-in only,
    never chosen automatically); "exact" uses full f32 (HIGHEST) passes.
    ``block``: planes per grid step
    (0 = auto: more micro-steps for small planes, where per-grid-step
    pipeline overhead dominates).  ``stage_major``: "auto" (default) runs
    MXU chains with stages-outer micro-steps so the band transforms batch
    into block-wide matmuls (falls back to plane-major when the deeper
    rings overflow the VMEM budget); "on"/"off" force it.  Raises
    ValueError when the program shape doesn't fit this lowering (callers
    fall back to the overlapped-tile backend).
    """
    analysis = analysis or ChainAnalysis.run(program)
    from .tile_eval import reject_unsupported_mosaic
    # bool i-history is supported here since round 5: rings hold 0/1
    # int32 end-to-end (ring_dtype) and make_read converts at exit
    reject_unsupported_mosaic(program, interpret, bool_ihistory_ok=True)
    dims = program.dimensions
    I, J, K = dims

    # ---- affine-run composition (backend/compose.py) -----------------------
    # Collapse runs of consecutive separable affine stages into single
    # wide banded-MXU stages (t-fold fewer transforms per plane).  The
    # composed program is a stream-internal rewrite: if its compilation
    # fails (VMEM, plan refusal), fall back to the uncomposed program.
    if _composed is None and compose != "off" and mxu != "off":
        from .compose import compose_program
        max_t = int(compose) if compose not in ("auto",) else 0
        got = (compose_program(program, analysis, max_t)
               if max_t >= 0 else None)
        if got is not None:
            program2, builds = got
            try:
                fn = compile_chain_stream(
                    program2, None, interpret, vmem_budget, mxu,
                    mxu_min_footprint, mxu_precision, block, spill,
                    fast, stage_major, compute_dtype,
                    compose="off", ring_storage=ring_storage,
                    _composed=builds)
                compile_chain_stream.last_config["composed"] = {
                    name: list(b.stages) for name, b in builds.items()}
                return fn
            except (ValueError, NotImplementedError):
                pass   # uncomposed path below

    if compute_dtype is not None:
        compute_dtype = jax.dtypes.canonicalize_dtype(
            jnp.dtype(compute_dtype))
    if ring_storage not in ("off", "bfloat16"):
        raise ValueError(f"ring_storage must be 'off' or 'bfloat16', "
                         f"got {ring_storage!r}")
    if (ring_storage == "bfloat16" and compute_dtype is not None
            and jnp.dtype(compute_dtype).itemsize < 4):
        ring_storage = "off"   # compute already reduced: rings match it

    # planes too large for VMEM rings: tile the j dimension, widening each
    # tile by the chain's cumulative j-halo (BC masks use the tile origin).
    # Sizing is block-independent (block only pads the output skew), so
    # search with block=1 and pick the micro-step block from the final
    # (possibly tiled) plane afterwards.  The search is MXU-aware: MXU
    # lowering needs extra VMEM (derived transform rings ~= a second copy
    # of the base rings, plus the band matrices), and it beats the VPU
    # path by >3x on eligible chains, so configurations are preferred in
    # the order untiled+MXU, tiled+MXU, untiled VPU, tiled VPU.
    from .linear import (MatrixPool, assets_extra_vmem, finalize_pool,
                         is_stacked_key, plan_all_stages)

    def mxu_assets(plan_, jtiles_):
        """(mxu_plans, pool_keys, pool_arrays, pool_meta, transform_keys,
        extra_vmem_bytes) for one tiling configuration; empty when no
        stage is eligible."""
        pj_, pk_ = plan_.plane
        hj_ = plan_.halo_jk[0]
        core_j_ = pj_ - 2 * hj_
        pool = MatrixPool()
        # tiled planes: band matrices / corrections are origin-aware, one
        # slice per tile (global truncation at domain edges only; the
        # overlap halo feeds interior band reads)
        j_ctx = ([jt * core_j_ - hj_ for jt in range(jtiles_)]
                 if jtiles_ > 1 else None)
        k_ctx = [0] if jtiles_ > 1 else None
        plans = plan_all_stages(program, (pj_, pk_), dims, pool,
                                mxu_min_footprint, j_ctx, k_ctx,
                                exclude=tuple(_composed or ()))
        for cname, build in (_composed or {}).items():
            from .compose import plan_composed
            cp = plan_composed(build, (pj_, pk_), dims, pool,
                               j_ctx, k_ctx)
            if cp is None:
                # composed segment unplannable (config-independent):
                # abort the composed compile, caller retries uncomposed
                raise ValueError(
                    f"composed segment {cname} not MXU-plannable")
            plans[cname] = cp
        pkeys, parrs, pmeta, tkeys = finalize_pool(plans, pool, program,
                                                   mxu_precision)
        extra = assets_extra_vmem(plan_, tkeys, pkeys, parrs)
        return plans, pkeys, parrs, pmeta, tkeys, extra

    from .xla import chain_halo
    hjt = chain_halo(analysis)[1]
    hjt_pad, splits = jtile_splits(J, hjt)
    candidates = [(1, None, (0, 0))]
    candidates += [(tiles, (core, K), (hjt_pad, 0))
                   for tiles, core in splits]

    budget = vmem_budget * 0.7
    chosen = None
    trial_bytes = 0
    # a composed program MUST run its composed stages through their exact
    # MXU plans (the rewritten IR is interior-only): no VPU leg, no spill
    # rung — any failure raises and the caller retries uncomposed
    mxu_legs = ([True] if _composed else
                [True, False] if mxu != "off" else [False])
    for use_mxu in mxu_legs:
        for nt, tjk, hjk in candidates:
            trial = StreamPlan.build(analysis, local_jk=tjk, halo_jk=hjk)
            trial_bytes = trial.vmem_bytes(program, compute_dtype,
                                           ring_storage) + \
                trial.io_window_bytes(program, compute_dtype=compute_dtype)
            if use_mxu:
                assets = mxu_assets(trial, nt)
                if not assets[0]:
                    break   # no eligible stage: identical to the VPU pass
                trial_bytes += assets[5]
            else:
                assets = ({}, [], [], {}, [], 0)
            if trial_bytes <= budget:
                chosen = (nt, tjk, hjk, assets)
                break
        if chosen is not None:
            break
    spilled_reads: Dict[str, Tuple[int, ...]] = {}
    if chosen is None and spill != "off" and not _composed:
        # last rung: keep full planes but spill the deepest rings to HBM
        # circular buffers moved by async DMA (the reference memory
        # optimizer's fast->slow placement, optimizer.py:209-248, mapped
        # to TPU).  Rescues chains where no j-tile fits (e.g. the halo
        # exceeds every legal tile).
        base = StreamPlan.build(analysis)
        sel = choose_spill(
            program, analysis, base,
            budget - base.io_window_bytes(program,
                                          compute_dtype=compute_dtype),
            compute_dtype, ring_storage=ring_storage)
        if sel is not None:
            spilled_reads, need = sel
            chosen = (1, None, (0, 0), ({}, [], [], {}, [], 0))
            block = 1      # keeps every output lag block-aligned
            trial_bytes = need
    if chosen is None:
        raise ValueError(
            f"stream rings need {trial_bytes/2**20:.1f} MiB VMEM at "
            "the smallest j-tile; plane too large for the streaming "
            "lowering")
    jtiles, tile_jk, halo_jk, assets = chosen
    mxu_plans, pool_keys, pool_arrays, pool_meta, transform_keys, _ = assets

    if block <= 0:
        if interpret:
            # interpreter-mode tracing cost scales with the unroll; keep it
            # small (blocking logic still exercised)
            block = min(2, I)
        else:
            area = (tile_jk[0] + 2 * halo_jk[0] if tile_jk else J) * K
            # micro-step blocking amortizes per-grid-step pipeline
            # overhead (~6us/step); measured on chip block=4 is equal to
            # slightly better than 2 at 256^3-512^3 (within tunnel
            # noise), block=8 only wins on small planes, and the VMEM
            # re-audit below steps block back down if the windows/lag
            # padding overflow the budget
            block = 8 if area <= 128 * 128 else 4
            block = max(1, min(block, I))
    # stage-major micro-steps batch the MXU band transforms into
    # block-wide matmuls — only meaningful when transform rings exist;
    # costs block-1 extra planes per consumed ring (audited below, and
    # "auto" falls back to plane-major before shrinking the block)
    use_sm = (stage_major != "off" and bool(transform_keys)
              and block > 1 and not spilled_reads)
    plan = StreamPlan.build(analysis, local_jk=tile_jk, halo_jk=halo_jk,
                            block=block, stage_major=use_sm)
    # Fast-read policy, measured on chip (same-day A/B with scaled loop
    # lengths, 512^3/256^3/128^3 jacobi chains — see RESULTS.md round-2
    # corrected table):
    #   * "shift" (shift-in-fill concat: one slice + one concat replacing
    #     roll + iota mask + select) wins at K >= 256 where a roll spans
    #     multiple 128-lane tiles anyway (+3-5% deep incl. the 512^3
    #     headline, parity shallow);
    #   * at K <= 128 a roll is a single-vreg lane rotate and shift is
    #     measured neutral (11.05 vs 11.09), so the masked path stays;
    #   * BC-value ring padding loses everywhere it adds lane tiles
    #     ("jk": -18..-40%) or RMW stores on shallow chains ("j") —
    #     both remain selectable for experiments.
    # All variants are single-chip untiled only (tiled/sharded planes
    # need origin-based masks).
    if fast == "auto":
        eff_k = (tile_jk[1] if tile_jk else K)
        fast = "shift" if eff_k >= 256 else "off"
    use_fast = (fast not in ("off", "shift") and jtiles == 1
                and halo_jk == (0, 0) and not spilled_reads)
    # shift applies fully untiled; under j-tiling only the k component
    # is shift-filled (kernel body decides per dim)
    use_shift = fast == "shift"
    fast_mode = "jk" if fast == "jk" else "j"

    def plan_fast(plan_):
        return (fast_pad_fields(program, analysis, plan_, spilled_reads,
                                mode=fast_mode)
                if use_fast else {})

    # the search sized plans at block=1; a larger block changes ring
    # depths (direct-emit alignment, lag padding) — re-audit the budget at
    # the final block and step down until it holds
    fast_fields = plan_fast(plan)
    while block > 1 and not spilled_reads:
        total = plan.vmem_bytes(program, compute_dtype) + \
            plan.io_window_bytes(program, block,
                                 compute_dtype=compute_dtype) + \
            assets_extra_vmem(plan, transform_keys, pool_keys,
                              pool_arrays) + \
            fast_pad_extra_bytes(program, plan, fast_fields, compute_dtype)
        if total <= budget:
            break
        if use_sm and stage_major == "auto":
            # the deeper stage-major rings overflowed: plane-major at the
            # same block beats batched transforms at a halved block
            use_sm = False
        else:
            block = block // 2
            use_sm = use_sm and block > 1
        plan = StreamPlan.build(analysis, local_jk=tile_jk,
                                halo_jk=halo_jk, block=block,
                                stage_major=use_sm)
        fast_fields = plan_fast(plan)
    # pads that still overflow at block=1: drop the fast path, keep masks
    if fast_fields and \
            plan.vmem_bytes(program, compute_dtype, ring_storage) + \
            plan.io_window_bytes(program, block,
                                 compute_dtype=compute_dtype) + \
            assets_extra_vmem(plan, transform_keys, pool_keys,
                              pool_arrays) + \
            fast_pad_extra_bytes(program, plan, fast_fields,
                                 compute_dtype) > budget:
        fast_fields = {}
    # chosen-configuration introspection (tests, report --verbose)
    compile_chain_stream.last_config = {
        "jtiles": jtiles, "tile_jk": tile_jk, "halo_jk": halo_jk,
        "mxu_stages": sorted(mxu_plans),
        "composed": {},   # wrapper fills on a successful composed compile
        "stage_major": use_sm, "block": block,
        "spilled": sorted(spilled_reads),
        "fast_fields": sorted(fast_fields),
        "fast_mode": ("shift" if use_shift else
                      fast_mode if fast_fields else "off"),
        "vmem_bytes": trial_bytes,
    }
    hj, hk = plan.halo_jk
    pj, pk = plan.plane
    core_j = pj - 2 * hj

    input_names = list(program.inputs)
    input_kinds = []
    in_specs = []
    for name in input_names:
        spec = program.inputs[name]
        if spec.is_scalar:
            input_kinds.append("scalar")
            in_specs.append(pl.BlockSpec(
                (1, 1), (lambda jt, g: (0, 0)) if jtiles > 1 else
                (lambda g: (0, 0)), memory_space=pltpu.SMEM))
        elif spec.dim_mask[0]:
            # full or partial streamed input: block covers the spanned
            # (j, k) dims; the kernel broadcasts partial planes on ingest
            full = spec.dim_mask[1] and spec.dim_mask[2]
            input_kinds.append("stream" if full else "stream_partial")
            n_in_blocks = -(-I // block)
            jk_dims = [d for d in (1, 2) if spec.dim_mask[d]]
            sizes = [block] + [(pj, pk)[d - 1] for d in jk_dims]
            if jtiles > 1:
                bdims = tuple(pl.Element(sz) for sz in sizes)

                def imap(jt, g, nb=n_in_blocks, cj=core_j, b=block,
                         jk=tuple(jk_dims)):
                    out = [jnp.minimum(g, nb - 1) * b]
                    out += [jt * cj if d == 1 else 0 for d in jk]
                    return tuple(out)

                in_specs.append(pl.BlockSpec(bdims, imap,
                                             memory_space=pltpu.VMEM))
            else:
                in_specs.append(pl.BlockSpec(
                    tuple(sizes),
                    lambda g, nb=n_in_blocks, n=len(jk_dims):
                        (jnp.minimum(g, nb - 1),) + (0,) * n,
                    memory_space=pltpu.VMEM))
        else:
            input_kinds.append("static")
            spanned = [d for d in (1, 2) if spec.dim_mask[d]]
            sblock = tuple((pj, pk)[d - 1] for d in spanned)
            if jtiles > 1:
                bdims = tuple(pl.Element((pj, pk)[d - 1]) for d in spanned)

                def smap(jt, g, spanned=tuple(spanned), cj=core_j):
                    return tuple(jt * cj if d == 1 else 0 for d in spanned)

                in_specs.append(pl.BlockSpec(bdims, smap,
                                             memory_space=pltpu.VMEM))
            else:
                in_specs.append(pl.BlockSpec(
                    sblock, lambda g, n=len(spanned): (0,) * n,
                    memory_space=pltpu.VMEM))

    lagB = plan.lag_max // block
    nb_out = -(-I // block)
    out_specs = []
    out_shapes = []
    for out in program.outputs:
        if plan.lag[out] % block == 0:
            # direct emit: the block holding plane q = g*block + m - lag
            c = plan.lag[out] // block
            idx = lambda g, c=c: (jnp.clip(g - c, 0, nb_out - 1), 0, 0)
            idxt = lambda jt, g, c=c: (jnp.clip(g - c, 0, nb_out - 1),
                                       jt, 0)
        else:
            idx = lambda g: (jnp.maximum(g - lagB, 0), 0, 0)
            idxt = lambda jt, g: (jnp.maximum(g - lagB, 0), jt, 0)
        if jtiles > 1:
            out_specs.append(pl.BlockSpec(
                (block, core_j, K), idxt, memory_space=pltpu.VMEM))
        else:
            out_specs.append(pl.BlockSpec(
                (block, J, K), idx, memory_space=pltpu.VMEM))
        out_dtype = narrow_store_dtype(program.kernels[out].dtype,
                                       interpret)
        out_shapes.append(jax.ShapeDtypeStruct((I, J, K), out_dtype))

    def ring_dtype(f):
        dt = (compute_dtype or
              jax.dtypes.canonicalize_dtype(program.field_dtype(f)))
        # bf16 ring storage: real bf16 buffers compiled; under interpret
        # the buffers stay f32 and the kernel emulates the store
        # rounding with reduce_precision (XLA elides plain
        # f32->bf16->f32 round-trips outside Mosaic — CLAUDE.md)
        if (ring_storage == "bfloat16" and dt == jnp.float32
                and not interpret):
            return jnp.bfloat16
        if dt == jnp.bool_:
            # bool (and int8: same crash) VMEM rings with i-history
            # rolls crash the Mosaic compiler (measured on v5e: HTTP 500
            # from tpu_compile_helper on a bool ring read at i-1); store
            # 0/1 in int32, cast back to bool at read (to_eval) —
            # value-exact
            return jnp.int32
        return dt

    # HBM-spilled rings are extra ANY-space outputs (Mosaic has no HBM
    # scratch); the wrapper discards them
    for f in spilled_reads:
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        out_shapes.append(jax.ShapeDtypeStruct(
            (plan.ring[f], pj, pk), ring_dtype(f)))

    def ring_plane_shape(f):
        if f in fast_fields:
            fpj, fpk, _ = fast_fields[f]
            return (pj + 2 * fpj, pk + 2 * fpk)
        return (pj, pk)

    scratch_shapes = [
        pltpu.VMEM((plan.ring[f],) + ring_plane_shape(f), ring_dtype(f))
        for f in plan.ring if f not in spilled_reads
    ]
    # derived rings of (L @ P @ R)-transformed planes, one per transform key
    scratch_shapes += [
        pltpu.VMEM((plan.ring[field], pj, pk), jnp.float32)
        for (field, _l, _r) in transform_keys
    ]
    # per spilled field: read buffers (one per distinct delta), write
    # staging plane, and DMA semaphores (reads + 1 write)
    for f, dl in spilled_reads.items():
        scratch_shapes += [
            pltpu.VMEM((len(dl), pj, pk), ring_dtype(f)),
            pltpu.VMEM((1, pj, pk), ring_dtype(f)),
            pltpu.SemaphoreType.DMA((len(dl) + 1,)),
        ]

    # static matrices / correction planes for MXU-lowered stages; stacked
    # (per-tile) entries ship one slice per j-tile via the index map.
    # Composed i-weight tables (itab) are per-plane SCALARS -> SMEM.
    if pool_keys:
        from .linear import is_stacked_key
    for key, arr in zip(pool_keys, pool_arrays):
        if key.startswith("itab"):
            in_specs.append(pl.BlockSpec(
                arr.shape,
                (lambda jt, g: (0, 0)) if jtiles > 1 else
                (lambda g: (0, 0)),
                memory_space=pltpu.SMEM))
        elif jtiles > 1 and is_stacked_key(key):
            in_specs.append(pl.BlockSpec(
                (1,) + arr.shape[1:], lambda jt, g: (jt, 0, 0),
                memory_space=pltpu.VMEM))
        elif jtiles > 1:
            in_specs.append(pl.BlockSpec(
                arr.shape, lambda jt, g, n=arr.ndim: (0,) * n,
                memory_space=pltpu.VMEM))
        else:
            in_specs.append(pl.BlockSpec(
                arr.shape, lambda g, n=arr.ndim: (0,) * n,
                memory_space=pltpu.VMEM))

    kernel = functools.partial(_stream_kernel_body, program, analysis, plan,
                               input_names, input_kinds, I, False,
                               mxu_plans, tuple(pool_keys), pool_meta,
                               tuple(transform_keys), block, jtiles > 1, 0,
                               compute_dtype, interpret, spilled_reads,
                               "shift" if use_shift else fast_fields,
                               ring_storage=ring_storage)

    grid = (-(-I // block) + lagB,)
    semantics = ("arbitrary",)
    if jtiles > 1:
        grid = (jtiles,) + grid
        semantics = ("arbitrary", "arbitrary")
    # vmem limit from the planner's own audit total (rings + pipeline
    # windows + MXU assets + fast pads) plus spill staging; limits above
    # 64 MiB measurably halve DMA throughput (config.vmem_limit_for)
    est = (plan.vmem_bytes(program, compute_dtype, ring_storage) +
           plan.io_window_bytes(program, block,
                                compute_dtype=compute_dtype) +
           assets_extra_vmem(plan, transform_keys, pool_keys,
                             pool_arrays) +
           fast_pad_extra_bytes(program, plan, fast_fields,
                                compute_dtype) +
           8 * block * pj * pk * 4)   # eval/compute temporaries
    for f, dl in spilled_reads.items():
        est += (len(dl) + 1) * pj * pk * np.dtype(ring_dtype(f)).itemsize
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs[0] if len(out_specs) == 1 else out_specs,
        out_shape=out_shapes[0] if len(out_shapes) == 1 else out_shapes,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=semantics,
            vmem_limit_bytes=config.vmem_limit_for(est)),
    )

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
            shape = tuple(dims[d] for d in spanned)
            arr = arr.reshape(shape)
            pads = [(0, 0) if d == 0 else ((hj, hj) if d == 1 else (hk, hk))
                    for d in spanned]
            arr = jnp.pad(arr, pads)
            if compute_dtype is not None:
                arr = arr.astype(compute_dtype)
            args.append(arr)
        for arr in pool_arrays:
            args.append(jnp.asarray(arr))
        res = call(*args)
        if len(out_shapes) == 1:
            res = (res,)
        # drop the HBM spill-ring outputs (kernel-internal scratch)
        return {o: r.astype(jax.dtypes.canonicalize_dtype(
                    program.kernels[o].dtype)).reshape(raw)
                for o, r in zip(program.outputs, res)}

    return jax.jit(forward)


def run_chain_stream(program: ir.Program, inputs: Dict[str, Any],
                     interpret: bool = False) -> Dict[str, np.ndarray]:
    fn = compile_chain_stream(program, interpret=interpret)
    out = fn({k: jnp.asarray(v) for k, v in inputs.items()})
    return {k: np.asarray(v) for k, v in out.items()}


def compile_local_stream(program: ir.Program, analysis: ChainAnalysis,
                         plan: StreamPlan, local_block,
                         interpret: bool = False,
                         vmem_budget: int = config.TPU_STREAM_VMEM_BUDGET,
                         halo_i: int = 0,
                         jtiles: int = 1,
                         mxu_assets: Optional[dict] = None,
                         spill_reads: Optional[Dict[str, Tuple[int, ...]]]
                         = None,
                         ring_storage: str = "off"):
    """Per-shard streaming kernel for domain decomposition.

    Returns ``fn(origin_i32[3], widened_inputs: dict[, pool_locals: dict])
    -> outputs: dict`` of local core blocks; inputs are the halo-exchanged
    local blocks (widened by ``plan.halo_jk`` in the sharded dims and by
    ``halo_i`` planes in the streamed dim when dim 0 is sharded),
    ``origin`` the global offset of this device's core block minus
    ``halo_i``.  Called inside shard_map (parallel/domain.py).

    ``mxu_assets``: optional dict {plans, pool_keys, pool_meta,
    transform_keys, local_shapes} enabling the banded-matmul lowering with
    per-shard matrices — ``pool_locals`` then supplies this shard's slice
    of every pooled matrix/correction (leading dim = in-shard j-tile
    instances for stacked keys), assembled by the caller
    (parallel/domain.py builds them mesh-sharded)."""
    Bi, Bj, Bk = local_block
    pj, pk = plan.plane
    dims = program.dimensions
    Ii = Bi + 2 * halo_i       # local streamed extent (widened planes)
    hjl = plan.halo_jk[0]
    core_j = pj - 2 * hjl      # j-tile core (== Bj + exchange halo parts
    #                            when jtiles == 1)

    nargs = 2 if jtiles > 1 else 1
    idx0 = (lambda jt, g: (0, 0)) if jtiles > 1 else (lambda g: (0, 0))
    input_names = list(program.inputs)
    input_kinds = []
    in_specs = [pl.BlockSpec((1, 3), idx0, memory_space=pltpu.SMEM)]
    for name in input_names:
        spec = program.inputs[name]
        if spec.is_scalar:
            input_kinds.append("scalar")
            in_specs.append(pl.BlockSpec((1, 1), idx0,
                                         memory_space=pltpu.SMEM))
        elif spec.dim_mask[0]:
            full = spec.dim_mask[1] and spec.dim_mask[2]
            input_kinds.append("stream" if full else "stream_partial")
            jk_dims = [d for d in (1, 2) if spec.dim_mask[d]]
            sizes = [1] + [(pj, pk)[d - 1] for d in jk_dims]
            if jtiles > 1:
                # all-Element windows: j-tiles overlap by the j-halo
                bdims = tuple(pl.Element(sz) for sz in sizes)

                def imap(jt, g, jk=tuple(jk_dims), cj=core_j):
                    out = [jnp.minimum(g, Ii - 1)]
                    out += [jt * cj if d == 1 else 0 for d in jk]
                    return tuple(out)

                in_specs.append(pl.BlockSpec(bdims, imap,
                                             memory_space=pltpu.VMEM))
            else:
                in_specs.append(pl.BlockSpec(
                    tuple(sizes),
                    lambda g, n=len(jk_dims): (jnp.minimum(g, Ii - 1),)
                    + (0,) * n,
                    memory_space=pltpu.VMEM))
        else:
            input_kinds.append("static")
            spanned = [d for d in (1, 2) if spec.dim_mask[d]]
            if jtiles > 1:
                bdims = tuple(pl.Element((pj, pk)[d - 1]) for d in spanned)

                def smap(jt, g, spanned=tuple(spanned), cj=core_j):
                    return tuple(jt * cj if d == 1 else 0 for d in spanned)

                in_specs.append(pl.BlockSpec(bdims, smap,
                                             memory_space=pltpu.VMEM))
            else:
                block = tuple((pj, pk)[d - 1] for d in spanned)
                in_specs.append(pl.BlockSpec(
                    block, lambda g, n=len(spanned): (0,) * n,
                    memory_space=pltpu.VMEM))

    out_specs = []
    out_shapes = []
    for out in program.outputs:
        if halo_i == 0:
            # direct emit (block == 1): the block holding plane g - lag
            idx = lambda g, c=plan.lag[out]: (jnp.clip(g - c, 0, Bi - 1),
                                              0, 0)
            idxt = lambda jt, g, c=plan.lag[out]: \
                (jnp.clip(g - c, 0, Bi - 1), jt, 0)
        else:
            idx = lambda g: (jnp.maximum(g - plan.lag_max - halo_i, 0),
                             0, 0)
            idxt = lambda jt, g: (jnp.maximum(g - plan.lag_max - halo_i,
                                              0), jt, 0)
        if jtiles > 1:
            out_specs.append(pl.BlockSpec(
                (1, core_j, Bk), idxt, memory_space=pltpu.VMEM))
        else:
            out_specs.append(pl.BlockSpec(
                (1, Bj, Bk), idx, memory_space=pltpu.VMEM))
        out_dtype = jax.dtypes.canonicalize_dtype(program.kernels[out].dtype)
        out_shapes.append(jax.ShapeDtypeStruct((Bi, Bj, Bk), out_dtype))

    # per-shard MXU assets: band matrices / corrections as extra inputs
    # (this shard's slices, leading dim = in-shard j-tile instance for
    # stacked keys), plus derived transform rings in scratch
    assets = mxu_assets or {}
    mxu_plans = assets.get("plans", {})
    pool_keys = tuple(assets.get("pool_keys", ()))
    pool_meta = assets.get("pool_meta", {})
    transform_keys = tuple(assets.get("transform_keys", ()))
    from .linear import is_stacked_key
    for key in pool_keys:
        shape = assets["local_shapes"][key]
        if is_stacked_key(key):
            if jtiles > 1:
                in_specs.append(pl.BlockSpec(
                    (1,) + tuple(shape[1:]),
                    lambda jt, g, d0=shape[0]: (jnp.minimum(jt, d0 - 1),)
                    + (0,) * (len(shape) - 1),
                    memory_space=pltpu.VMEM))
            else:
                in_specs.append(pl.BlockSpec(
                    (1,) + tuple(shape[1:]),
                    lambda g, n=len(shape): (0,) * n,
                    memory_space=pltpu.VMEM))
        elif key.startswith("itab"):
            # composed i-weight tables are per-plane SCALARS -> SMEM
            # (same route as the single-chip lowering)
            in_specs.append(pl.BlockSpec(
                tuple(shape),
                (lambda jt, g: (0, 0)) if jtiles > 1
                else (lambda g: (0, 0)),
                memory_space=pltpu.SMEM))
        else:
            in_specs.append(pl.BlockSpec(
                tuple(shape),
                (lambda jt, g, n=len(shape): (0,) * n) if jtiles > 1
                else (lambda g, n=len(shape): (0,) * n),
                memory_space=pltpu.VMEM))

    spill_reads = spill_reads or {}

    def local_dtype(f):
        dt = jax.dtypes.canonicalize_dtype(program.field_dtype(f))
        if (ring_storage == "bfloat16" and dt == jnp.float32
                and not interpret):
            return jnp.bfloat16
        if dt == jnp.bool_:
            # bool VMEM rings crash Mosaic (see ring_dtype); int32 store
            return jnp.int32
        return dt

    # HBM-spilled rings as extra ANY-space outputs (dropped by fn)
    for f in spill_reads:
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        out_shapes.append(jax.ShapeDtypeStruct(
            (plan.ring[f], pj, pk), local_dtype(f)))

    scratch_shapes = [
        pltpu.VMEM((plan.ring[f], pj, pk), local_dtype(f))
        for f in plan.ring if f not in spill_reads
    ]
    scratch_shapes += [
        pltpu.VMEM((plan.ring[field], pj, pk), jnp.float32)
        for (field, _l, _r) in transform_keys
    ]
    for f, dl in spill_reads.items():
        scratch_shapes += [
            pltpu.VMEM((len(dl), pj, pk), local_dtype(f)),
            pltpu.VMEM((1, pj, pk), local_dtype(f)),
            pltpu.SemaphoreType.DMA((len(dl) + 1,)),
        ]

    # same auto policy as the single-chip lowering (measured: shift-fill
    # reads win at K >= 256, neutral below): the kernel body enables the
    # shift per dim only where this block spans the whole global domain
    # at origin 0, so cut dims keep their origin-based masks
    fast_local = "shift" if pk >= 256 else {}
    compile_local_stream.last_config = {
        "fast": "shift" if fast_local == "shift" else "off",
        "plane": plan.plane, "halo_jk": plan.halo_jk,
        "jtiles": jtiles, "halo_i": halo_i,
    }
    kernel = functools.partial(_stream_kernel_body, program, analysis, plan,
                               input_names, input_kinds, Ii, True,
                               mxu_plans, pool_keys, pool_meta,
                               transform_keys, 1, jtiles > 1, halo_i, None,
                               interpret, spill_reads, fast_local,
                               ring_storage=ring_storage)

    assert plan.lag_max >= halo_i, \
        "sharded-i plans must be built with min_lag_max=halo_i"
    grid = (Bi + halo_i + plan.lag_max,)
    semantics = ("arbitrary",)
    if jtiles > 1:
        grid = (jtiles,) + grid
        semantics = ("arbitrary", "arbitrary")
    # rings/staging + double-buffered io blocks + pool assets + eval
    # temporaries (~8 planes); see config.vmem_limit_for
    est = (scratch_vmem_bytes(scratch_shapes) +
           2 * (len(input_names) + len(program.outputs) + 4) *
           pj * pk * 4 +
           2 * sum(int(np.prod(assets["local_shapes"][key])) * 4
                   for key in pool_keys))
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs[0] if len(out_specs) == 1 else out_specs,
        out_shape=out_shapes[0] if len(out_shapes) == 1 else out_shapes,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=semantics,
            vmem_limit_bytes=config.vmem_limit_for(est)),
    )

    def fn(origin, widened_inputs, pool_locals=None):
        args = [jnp.asarray(origin, jnp.int32).reshape(1, 3)]
        for name in input_names:
            spec = program.inputs[name]
            arr = jnp.asarray(widened_inputs[name])
            if spec.is_scalar:
                arr = arr.reshape(1, 1)
            args.append(arr)
        for key in pool_keys:
            args.append(jnp.asarray(pool_locals[key]).reshape(
                assets["local_shapes"][key]))
        res = call(*args)
        if len(out_shapes) == 1:
            res = (res,)
        # extra entries are the HBM spill rings (kernel-internal scratch)
        return dict(zip(program.outputs, res))

    return fn
