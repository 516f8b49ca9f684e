"""Program JSON parser and stencil-expression frontend.

Accepts the StencilFlow JSON dialect verbatim (schema documented at
/root/reference/stencilflow/kernel_chain_graph.py:364-407 and exercised by all
of /root/reference/test/stencils/*.json):

* ``inputs``: per-field dtype, data source, optional ``input_dims`` mask;
* ``outputs``: list of kernel names whose results are program outputs;
* ``dimensions``: 1-3 domain sizes (canonicalized here to 3, padding with
  leading size-1 dims exactly like the reference's ``import_input``);
* ``vectorization``: optional SIMD width W;
* ``constants``: named scalar constants usable inside computations;
* ``program``: per-kernel ``computation_string`` (Python-syntax, possibly
  multi-statement with ``;``), boundary conditions, and dtype.

Computation strings are parsed with the Python ``ast`` module into the typed
expression IR of :mod:`stencilflow_tpu.ir`.  Index canonicalization follows
the reference (compute_graph_nodes.py:189-238): every access becomes a 3-long
offset vector with ``None`` in dimensions the accessed field does not span.
Unlike the reference we key the index-arity fixup on the field's rank instead
of pruning by ``dim > 1``, which also handles size-1 leading dims in
explicitly 3-D programs (e.g. simple_input_delay_buf.json, where the
reference's pruning would fault).
"""
from __future__ import annotations

import ast
import json
import os
from typing import Dict, List, Optional, Tuple

from .. import ir
from ..config import ITERATORS
from ..dtypes import str_to_dtype

_ALLOWED_CALLS = {
    "sin", "cos", "tan", "sinh", "cosh", "tanh", "sqrt", "exp", "log",
    "abs", "min", "max",
}

_BINOP_MAP = {
    ast.Add: "add",
    ast.Sub: "sub",
    ast.Mult: "mult",
    ast.Div: "div",
}

_CMP_MAP = {
    ast.Lt: "lt",
    ast.LtE: "le",
    ast.Gt: "gt",
    ast.GtE: "ge",
    ast.Eq: "eq",
    ast.NotEq: "ne",
}


class StencilSyntaxError(ValueError):
    pass


def _index_expr_to_offset(node: ast.expr) -> int:
    """Turn one subscript component (``i``, ``j+1``, ``k-2``) into an int."""
    if isinstance(node, ast.Name):
        if node.id not in ITERATORS:
            raise StencilSyntaxError(f"unknown iterator {node.id!r}")
        return 0
    if isinstance(node, ast.BinOp) and isinstance(node.left, ast.Name):
        if node.left.id not in ITERATORS:
            raise StencilSyntaxError(
                f"unknown iterator {node.left.id!r}")
        if not (isinstance(node.right, ast.Constant)
                and isinstance(node.right.value, int)):
            raise StencilSyntaxError(
                "subscript offsets must be iterator ± integer literal")
        off = int(node.right.value)
        if isinstance(node.op, ast.Add):
            return off
        if isinstance(node.op, ast.Sub):
            return -off
        raise StencilSyntaxError("subscript offsets support only + and -")
    if isinstance(node, ast.Constant):
        raise StencilSyntaxError(
            "absolute subscripts are not supported; use iterator-relative "
            "indices like a[i, j+1, k-1]")
    raise StencilSyntaxError(f"unsupported subscript component: "
                             f"{ast.dump(node)}")


class _ExprBuilder(ast.NodeVisitor):
    """Builds ir.Expr trees from computation-string ASTs."""

    def __init__(self, field_dim_masks: Dict[str, Tuple[bool, bool, bool]],
                 input_dims: Dict[str, List[str]],
                 constants: Dict[str, float],
                 temporaries: Dict[str, ir.Expr]):
        self.field_dim_masks = field_dim_masks
        self.input_dims = input_dims
        self.constants = constants
        self.temporaries = temporaries

    # -- leaves -------------------------------------------------------------
    def visit_Constant(self, node: ast.Constant) -> ir.Expr:
        return ir.Const(float(node.value))

    def visit_Name(self, node: ast.Name) -> ir.Expr:
        name = node.id
        if name in self.temporaries:
            return ir.Ref(name)
        if name in self.constants:
            return ir.Const(float(self.constants[name]))
        if name in self.input_dims:
            # bare reference to an input field: scalar (0-d) access
            # (reference: compute_graph.py:138-144 treats Name-in-raw_inputs
            # as a [0,0,0] access)
            mask = self.field_dim_masks.get(name, (False, False, False))
            offsets = tuple(0 if m else None for m in mask)
            return ir.Access(name, offsets)
        raise StencilSyntaxError(f"unknown name {name!r} in computation")

    def visit_Subscript(self, node: ast.Subscript) -> ir.Expr:
        if not isinstance(node.value, ast.Name):
            raise StencilSyntaxError("only simple field subscripts supported")
        field = node.value.id
        sl = node.slice
        if isinstance(sl, ast.Index):  # py<3.9 compat
            sl = sl.value
        comps = list(sl.elts) if isinstance(sl, ast.Tuple) else [sl]
        idx = [_index_expr_to_offset(c) for c in comps]
        if field in self.temporaries:
            # center read of a local temporary == its bare-name value (the
            # reference contracts same-name/same-index nodes,
            # compute_graph.py:203-241); an OFFSET read has no value to
            # refer to — the temporary is a whole-expression alias
            if any(idx):
                raise StencilSyntaxError(
                    f"offset read of local assignment target {field!r}; "
                    "temporaries are whole-expression aliases (offsets "
                    "only apply to input/kernel fields)")
            return ir.Ref(field)
        offsets = self._canonical_offsets(field, idx)
        return ir.Access(field, offsets)

    def _canonical_offsets(self, field: str, idx: List[int]) -> ir.Offsets:
        """Map a positionally parsed index onto the canonical 3-D
        None-masked offset vector."""
        if field in self.input_dims:
            dims = self.input_dims[field]
            if len(idx) > len(dims):
                # leading entries come from the 1D/2D->3D padding rewrite and
                # must be zero-offset
                extra = idx[:len(idx) - len(dims)]
                if any(extra):
                    raise StencilSyntaxError(
                        f"access {field}{idx} has offsets in dimensions the "
                        f"field does not span (input_dims={dims})")
                idx = idx[len(idx) - len(dims):]
            if len(idx) != len(dims):
                raise StencilSyntaxError(
                    f"access {field}{idx}: expected {len(dims)} indices "
                    f"(input_dims={dims})")
            by_iter = dict(zip(dims, idx))
            return tuple(by_iter.get(it, None) for it in ITERATORS)
        # kernel-produced field: rank = 3 after padding rewrite
        if len(idx) < 3:
            idx = [0] * (3 - len(idx)) + idx
        if len(idx) != 3:
            raise StencilSyntaxError(f"access {field}{idx}: too many indices")
        mask = self.field_dim_masks.get(field, (True, True, True))
        return tuple(o if m else None for o, m in zip(idx, mask))

    # -- operators ----------------------------------------------------------
    def visit_BinOp(self, node: ast.BinOp) -> ir.Expr:
        try:
            op = _BINOP_MAP[type(node.op)]
        except KeyError:
            raise StencilSyntaxError(
                f"unsupported operator: {type(node.op).__name__}") from None
        return ir.BinOp(op, self.visit(node.left), self.visit(node.right))

    def visit_UnaryOp(self, node: ast.UnaryOp) -> ir.Expr:
        if isinstance(node.op, ast.USub):
            operand = self.visit(node.operand)
            if isinstance(operand, ir.Const):
                return ir.Const(-operand.value)
            return ir.UnaryOp("neg", operand)
        if isinstance(node.op, ast.UAdd):
            return self.visit(node.operand)
        raise StencilSyntaxError(
            f"unsupported unary operator: {type(node.op).__name__}")

    def visit_Compare(self, node: ast.Compare) -> ir.Expr:
        if len(node.ops) != 1:
            raise StencilSyntaxError("chained comparisons not supported")
        try:
            op = _CMP_MAP[type(node.ops[0])]
        except KeyError:
            raise StencilSyntaxError(
                f"unsupported comparison: {type(node.ops[0]).__name__}"
            ) from None
        return ir.Compare(op, self.visit(node.left),
                          self.visit(node.comparators[0]))

    def visit_BoolOp(self, node: ast.BoolOp) -> ir.Expr:
        op = "and" if isinstance(node.op, ast.And) else "or"
        return ir.BoolOp(op, tuple(self.visit(v) for v in node.values))

    def visit_IfExp(self, node: ast.IfExp) -> ir.Expr:
        return ir.Select(self.visit(node.test), self.visit(node.body),
                         self.visit(node.orelse))

    def visit_Call(self, node: ast.Call) -> ir.Expr:
        if not isinstance(node.func, ast.Name):
            raise StencilSyntaxError("only simple function calls supported")
        fn = node.func.id
        if fn not in _ALLOWED_CALLS:
            raise StencilSyntaxError(f"unsupported function: {fn}")
        return ir.Call(fn, tuple(self.visit(a) for a in node.args))

    def generic_visit(self, node):
        raise StencilSyntaxError(
            f"unsupported syntax in computation: {type(node).__name__}")


def parse_computation(kernel_name: str, computation: str,
                      field_dim_masks: Dict[str, Tuple[bool, bool, bool]],
                      input_dims: Dict[str, List[str]],
                      constants: Dict[str, float]) -> List[ir.Assign]:
    """Parse one kernel's computation string into assignment statements."""
    try:
        module = ast.parse(computation)
    except SyntaxError as e:
        raise StencilSyntaxError(
            f"kernel {kernel_name!r}: cannot parse computation: {e}") from e
    statements: List[ir.Assign] = []
    temporaries: Dict[str, ir.Expr] = {}
    builder = _ExprBuilder(field_dim_masks, input_dims, constants, temporaries)
    for stmt in module.body:
        if not isinstance(stmt, ast.Assign) or len(stmt.targets) != 1:
            raise StencilSyntaxError(
                f"kernel {kernel_name!r}: every statement must be a single "
                f"assignment, got {type(stmt).__name__}")
        target = stmt.targets[0]
        if not isinstance(target, ast.Name):
            raise StencilSyntaxError(
                f"kernel {kernel_name!r}: assignment target must be a name")
        rhs = builder.visit(stmt.value)
        statements.append(ir.Assign(target.id, rhs))
        temporaries[target.id] = rhs
    if not statements:
        raise StencilSyntaxError(f"kernel {kernel_name!r}: empty computation")
    # NB: a subscript of an ALREADY-ASSIGNED temporary is resolved at
    # visit time (center -> Ref, offset -> error); a subscript of a name
    # assigned LATER intentionally stays an Access — op lists read the
    # target's previous version that way (version_program)
    return statements


def _pad_computation_string(s: str, kernel_dimensions: int) -> str:
    """1D/2D -> 3D canonicalization by subscript rewriting, identical to the
    reference (kernel_chain_graph.py:392-405)."""
    if kernel_dimensions == 1:
        return s.replace("[", "[i, j,")
    if kernel_dimensions == 2:
        return s.replace("[", "[i,")
    return s


def parse_program(source, name: Optional[str] = None) -> ir.Program:
    """Parse a program JSON (path or already-loaded dict) into a Program."""
    path = None
    if isinstance(source, (str, os.PathLike)):
        path = os.fspath(source)
        with open(path) as f:
            spec = json.load(f)
        if name is None:
            name = os.path.basename(path)
            for suffix in (".json",):
                if name.endswith(suffix):
                    name = name[:-len(suffix)]
            name = name.replace(".", "_")
    else:
        spec = source
        if name is None:
            name = "stencil_program"

    raw_dimensions = tuple(int(d) for d in spec["dimensions"])
    kernel_dimensions = len(raw_dimensions)
    if not 1 <= kernel_dimensions <= 3:
        raise ValueError("dimensions must have 1-3 entries")
    dimensions = (1,) * (3 - kernel_dimensions) + raw_dimensions

    vectorization = int(spec.get("vectorization", 1))
    if vectorization < 1:
        raise ValueError("vectorization must be >= 1")
    if dimensions[-1] % vectorization != 0:
        raise ValueError(
            f"vectorization {vectorization} must divide the innermost "
            f"dimension {dimensions[-1]}")

    constants: Dict[str, float] = {}
    for cname, cval in spec.get("constants", {}).items():
        if isinstance(cval, dict):
            constants[cname] = float(cval["value"])
        else:
            constants[cname] = float(cval)

    # --- inputs -------------------------------------------------------------
    default_dims = list(ITERATORS[3 - kernel_dimensions:])
    inputs: Dict[str, ir.InputSpec] = {}
    input_dims: Dict[str, List[str]] = {}
    for iname, icfg in spec["inputs"].items():
        dims = icfg.get("input_dims", icfg.get("dimensions"))
        if dims is None:
            dims = list(default_dims)
        dims = list(dims)
        for d in dims:
            if d not in ITERATORS:
                raise ValueError(f"input {iname!r}: bad input_dims entry {d!r}")
        mask = tuple(it in dims for it in ITERATORS)
        inputs[iname] = ir.InputSpec(
            name=iname,
            dtype=str_to_dtype(icfg["data_type"]),
            dim_mask=mask,
            data=icfg["data"],
        )
        input_dims[iname] = dims

    outputs = list(spec["outputs"])

    # --- kernels ------------------------------------------------------------
    kernel_mask = tuple(True for _ in ITERATORS)
    field_dim_masks: Dict[str, Tuple[bool, bool, bool]] = {
        n: s.dim_mask for n, s in inputs.items()
    }
    for kname in spec["program"]:
        field_dim_masks[kname] = kernel_mask

    kernels: Dict[str, ir.KernelSpec] = {}
    for kname, kcfg in spec["program"].items():
        if kname in inputs:
            raise ValueError(f"kernel {kname!r} shadows an input")
        comp = _pad_computation_string(kcfg["computation_string"],
                                       kernel_dimensions)
        statements = parse_computation(kname, comp, field_dim_masks,
                                       input_dims, constants)
        bcs = {
            f: ir.BoundaryCondition.from_json(bc)
            for f, bc in kcfg.get("boundary_conditions", {}).items()
        }
        kernels[kname] = ir.KernelSpec(
            name=kname,
            statements=statements,
            dtype=str_to_dtype(kcfg["data_type"]),
            boundary_conditions=bcs,
            source=kcfg["computation_string"],
        )

    program = ir.Program(
        name=name,
        dimensions=dimensions,
        raw_dimensions=raw_dimensions,
        inputs=inputs,
        outputs=outputs,
        kernels=kernels,
        vectorization=vectorization,
        constants=constants,
        path=path,
    )
    _validate(program)
    return program


def _validate(program: ir.Program) -> None:
    known = set(program.inputs) | set(program.kernels)
    for out in program.outputs:
        if out not in program.kernels:
            raise ValueError(f"output {out!r} is not produced by any kernel")
    for kname, kspec in program.kernels.items():
        for field in kspec.input_fields():
            if field not in known:
                raise ValueError(
                    f"kernel {kname!r} reads undefined field {field!r}")
