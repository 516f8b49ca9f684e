"""DaCe-SDFG file ingestion (no dace dependency).

The reference's second frontend consumes DaCe SDFG programs whose stencil
computations sit in ``Stencil`` library nodes
(/root/reference/stencilflow/stencil/stencil.py:11-59) and converts them to
the JSON dialect (/root/reference/stencilflow/sdfg_to_stencilflow.py:522-767).
An ``.sdfg`` file IS a JSON document, so the ingestion itself needs no dace:
this module walks the serialized state machine (including nested SDFGs),
collects Stencil library nodes in order, rewrites their relative-offset
code back to absolute ``[i, j+1, k-1]`` indexing (the inverse of the
reference's ``_RenameTransformer._offset_to_index``, :450-461), and feeds
the ordered op list — repeated writes included — through
:func:`~stencilflow_tpu.frontend.canonicalize.program_from_op_list`'s SSA
versioning.

Scope honestly stated: connector names are used as field names (true for
the SDFGs the reference's own ``generate_sdfg`` emits and for
canonicalized stencil-only programs; the reference additionally resolves
connectors through array nodes, which requires graph edges we do not
model), and dtypes come from the serialized array descriptors when
present.
"""
from __future__ import annotations

import ast
import json
from typing import Any, Dict, List, Optional, Sequence, Tuple

from .. import ir

_ITER = ("i", "j", "k")


def _is_stencil_node(node: dict) -> bool:
    cp = node.get("classpath", "")
    t = node.get("type", "")
    if t == "Stencil" or cp.endswith(".Stencil") or cp == "Stencil":
        return True
    attrs = node.get("attributes", {})
    return ("accesses" in attrs and "output_fields" in attrs
            and "code" in attrs)


def _has_state_loop(sdfg: dict) -> bool:
    """Detect a control-flow back edge in the serialized state machine
    (recursing nested SDFGs).  The reference rejects any remaining loop
    after canonicalization (RemoveLoop, then error at
    /root/reference/stencilflow/sdfg_to_stencilflow.py:281-284)."""
    adj: Dict[str, List[str]] = {}
    for e in sdfg.get("edges", []):
        adj.setdefault(str(e.get("src")), []).append(str(e.get("dst")))
    color: Dict[str, int] = {}
    for root in list(adj):
        if color.get(root, 0):
            continue
        # iterative DFS: unrolled time loops produce thousands of
        # states in a linear chain — recursion would overflow
        stack = [(root, iter(adj.get(root, ())))]
        color[root] = 1
        while stack:
            u, it = stack[-1]
            advanced = False
            for v in it:
                c = color.get(v, 0)
                if c == 1:
                    return True
                if c == 0:
                    color[v] = 1
                    stack.append((v, iter(adj.get(v, ()))))
                    advanced = True
                    break
            if not advanced:
                color[u] = 2
                stack.pop()
    for state in sdfg.get("nodes", []):
        for node in state.get("nodes", []):
            if node.get("type") == "NestedSDFG":
                inner = node.get("attributes", {}).get("sdfg")
                if inner and _has_state_loop(inner):
                    return True
    return False


def _walk_stencil_nodes(sdfg: dict) -> List[dict]:
    """All Stencil library nodes in state order, recursing nested SDFGs
    (reference: the topological order walk, :555-588)."""
    out: List[dict] = []
    for state in sdfg.get("nodes", []):
        for node in state.get("nodes", []):
            if _is_stencil_node(node):
                out.append(node)
            elif node.get("type") == "NestedSDFG":
                inner = node.get("attributes", {}).get("sdfg")
                if inner:
                    out.extend(_walk_stencil_nodes(inner))
    return out


def _code_string(attrs: dict) -> str:
    code = attrs.get("code", "")
    if isinstance(code, dict):
        code = code.get("string_data", "")
    return code


class _AbsoluteIndexer(ast.NodeTransformer):
    """``field[0, 1, -1]`` -> ``field[i, j+1, k-1]`` honoring each field's
    dimension mask (unspanned dims use their own shorter subscripts)."""

    def __init__(self, masks: Dict[str, Tuple[bool, ...]]):
        self.masks = masks

    def visit_Subscript(self, node):
        self.generic_visit(node)
        if not isinstance(node.value, ast.Name):
            return node
        field = node.value.id
        idx = node.slice
        elts = idx.elts if isinstance(idx, ast.Tuple) else [idx]
        offs = []
        for e in elts:
            if isinstance(e, ast.Constant) and isinstance(e.value, int):
                offs.append(e.value)
            elif (isinstance(e, ast.UnaryOp)
                  and isinstance(e.op, ast.USub)
                  and isinstance(e.operand, ast.Constant)
                  and isinstance(e.operand.value, int)):
                offs.append(-e.operand.value)
            else:
                return node   # already absolute / symbolic: leave as-is
        mask = self.masks.get(field, (True,) * len(offs))
        # offsets are per SPANNED dim (stencil.py's accesses example);
        # map them through the field's dim mask to iterator names
        its = [it for it, m in zip(_ITER[3 - len(mask):], mask) if m]
        if len(its) != len(offs):
            its = list(_ITER[3 - len(offs):])
        parts = []
        for it, o in zip(its, offs):
            parts.append(ast.parse(
                it if o == 0 else f"{it}{o:+d}", mode="eval").body)
        new_idx = ast.Tuple(elts=parts, ctx=ast.Load()) \
            if len(parts) > 1 else parts[0]
        return ast.Subscript(value=node.value, slice=new_idx,
                             ctx=node.ctx)


def _rewrite_code(code: str, masks: Dict[str, Tuple[bool, ...]],
                  target: str) -> str:
    """Relative-offset stencil code -> dialect computation string whose
    final assignment targets ``target`` (LHS subscripts dropped — the
    reference's _OutputTransformer, :405-426)."""
    tree = ast.parse(code)
    lines = []
    indexer = _AbsoluteIndexer(masks)
    for stmt in tree.body:
        if not isinstance(stmt, ast.Assign) or len(stmt.targets) != 1:
            raise ValueError(
                f"stencil code must be simple assignments, got "
                f"{type(stmt).__name__}")
        tgt = stmt.targets[0]
        if isinstance(tgt, ast.Subscript):
            tgt = tgt.value
        if not isinstance(tgt, ast.Name):
            raise ValueError("assignment target must be a name")
        rhs = indexer.visit(stmt.value)
        lines.append(f"{tgt.id} = {ast.unparse(rhs)}")
    # the stencil's output connector becomes the op target
    last_lhs = lines[-1].split(" = ")[0]
    if last_lhs != target:
        lines.append(f"{target} = {last_lhs}")
    return "; ".join(lines)


def _bc_json(bc: Any) -> Optional[dict]:
    if bc is None:
        return None
    if isinstance(bc, dict):
        kind = bc.get("btype", bc.get("type", "constant"))
        return {"type": kind, "value": float(bc.get("value", 0.0))}
    return None


def sdfg_to_program(source, name: Optional[str] = None,
                    dimensions: Optional[Sequence[int]] = None,
                    input_data: str = "constant:1.0",
                    vectorization: int = 1) -> ir.Program:
    """Import a serialized DaCe SDFG (path or dict) into a Program."""
    if isinstance(source, (str, bytes)):
        with open(source) as f:
            sdfg = json.load(f)
        if name is None:
            name = sdfg.get("attributes", {}).get("name", "sdfg")
    else:
        sdfg = source
        name = name or sdfg.get("attributes", {}).get("name", "sdfg")

    if _has_state_loop(sdfg):
        raise ValueError(
            "SDFG contains a control-flow loop; unroll or canonicalize "
            "it first (the reference rejects loops the same way, "
            "sdfg_to_stencilflow.py:281-284)")
    nodes = _walk_stencil_nodes(sdfg)
    if not nodes:
        raise ValueError("no Stencil library nodes found in the SDFG")

    arrays = sdfg.get("attributes", {}).get("_arrays", {})

    def array_dtype(field, default="float32"):
        desc = arrays.get(field, {}).get("attributes", {})
        dt = desc.get("dtype", default)
        return dt if isinstance(dt, str) else default

    ops = []
    op_reads: List[List[str]] = []
    masks_all: Dict[str, Tuple[bool, ...]] = {}
    written: List[str] = []
    shapes: List[List[int]] = []
    for node in nodes:
        attrs = node.get("attributes", {})
        accesses = attrs.get("accesses", {})
        outs = list(attrs.get("output_fields", {}))
        if len(outs) != 1:
            raise ValueError(
                f"stencil node {attrs.get('label')!r} must have exactly "
                f"one output field, got {outs}")
        target = outs[0]
        shape = attrs.get("shape") or []
        if shape:
            try:
                shapes.append([int(s) for s in shape])
            except (TypeError, ValueError):
                pass   # symbolic shape: rely on the dimensions argument
        masks = {}
        for f, acc in accesses.items():
            mask = tuple(bool(m) for m in acc[0])
            masks[f] = mask
            masks_all.setdefault(f, mask)
        bcs = {}
        for f, bc in attrs.get("boundary_conditions", {}).items():
            j = _bc_json(bc)
            if j is not None:
                bcs[f] = j
        code = _rewrite_code(_code_string(attrs), masks, target)
        ops.append((target, code, bcs, array_dtype(target)))
        op_reads.append(list(accesses))
        written.append(target)
        masks_all.setdefault(target, (True, True, True))

    if dimensions is None:
        if not shapes:
            raise ValueError("SDFG carries no concrete shapes; pass "
                             "dimensions=")
        # align mixed-rank shapes by TRAILING dims (a 2-D field maps to
        # the (j, k) iterators, _ITER[3-rank:], like everywhere else in
        # the importer) — leading-aligned max would fold a 2-D shape's J
        # into the global i extent
        rank = max(len(s) for s in shapes)
        dimensions = [
            max((s[len(s) - rank + d] for s in shapes
                 if len(s) - rank + d >= 0), default=1)
            for d in range(rank)]

    written_set = set(written)
    inputs: Dict[str, dict] = {}
    for f, mask in masks_all.items():
        if f in written_set:
            continue
        spec: Dict[str, Any] = {"data": input_data,
                                "data_type": array_dtype(f)}
        if not all(mask):
            rank = len(dimensions)
            its = _ITER[3 - rank:]
            spec["input_dims"] = [it for it, m in zip(its, mask) if m]
        inputs[f] = spec

    # outputs: every written name whose final version nothing later reads
    # (the reference versioning keeps the bare name on the last write)
    read_later: Dict[str, int] = {}
    for idx, reads in enumerate(op_reads):
        for f in reads:
            read_later[f] = idx
    last_write = {t: idx for idx, (t, *_rest) in enumerate(ops)}
    outputs = [t for t, lw in last_write.items()
               if read_later.get(t, -1) <= lw]

    from .canonicalize import program_from_op_list
    return program_from_op_list(ops, dimensions, inputs, outputs,
                                name=name, vectorization=vectorization)
