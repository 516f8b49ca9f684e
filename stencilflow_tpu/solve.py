"""Matrix-free Krylov solvers over stencil-chain operators.

An affine chain ``y = A x + c`` (constant coefficients, constant BCs) is a
matrix-free linear operator: one application = one streaming-kernel
evaluation.  That unlocks IMPLICIT solvers the reference's feed-forward
pipelines cannot express — e.g. backward-Euler diffusion
``(I - dt·L) x_{t+1} = x_t`` solved by conjugate gradients with the
operator running on the streaming Pallas backend (and its transpose via
:func:`stencilflow_tpu.grad.adjoint_program` when the operator is not
symmetric).

The affine part ``c`` (bias terms + boundary constants) is measured once as
``A(0)`` and subtracted, so programs with nonzero constant BCs solve
correctly.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

from . import ir


def _linear_op(program: ir.Program, field: str, out: str,
               interpret: bool) -> Callable:
    """``op(x) -> A x`` for the chain's affine map ``x -> fn(x) = A x + c``
    (c measured as fn(0)); validates affinity like adjoint_program."""
    import jax.numpy as jnp

    from .backend import compile_chain_best
    from .backend.linear import extract_linear

    for kname, kspec in program.kernels.items():
        if extract_linear(kspec) is None:
            raise ValueError(
                f"kernel {kname!r} is not affine with constant "
                "coefficients; Krylov solvers need a linear operator")
        for bc in kspec.boundary_conditions.values():
            if bc.kind != ir.BCKind.CONSTANT:
                raise ValueError(
                    f"kernel {kname!r} has a non-constant boundary "
                    "condition")
    if field not in program.inputs:
        raise ValueError(f"{field!r} is not a program input")
    if out not in program.outputs:
        raise ValueError(f"{out!r} is not a program output")

    fn, _b = compile_chain_best(program, interpret=interpret)
    spec = program.inputs[field]
    shape = tuple(spec.shape(program.dimensions))

    def full(x):
        return fn({field: x.reshape(shape)})[out].reshape(x.shape)

    zero_img = None

    def op(x):
        nonlocal zero_img
        if zero_img is None:
            zero_img = full(jnp.zeros_like(x))
        return full(x) - zero_img

    return op


def solve_cg(program: ir.Program, rhs: Any,
             field: Optional[str] = None, out: Optional[str] = None,
             x0: Optional[Any] = None,
             tol: float = 1e-6, maxiter: int = 1000,
             interpret: bool = False) -> Tuple[Any, Dict]:
    """Solve ``A x = rhs`` by conjugate gradients, where ``A`` is the
    chain's linear part mapping input ``field`` to output ``out``
    (defaults: the sole input/output).  ``A`` must be symmetric positive
    definite — e.g. ``y = x - dt·laplacian(x)`` for implicit diffusion;
    for general chains use :func:`solve_cgnr`.

    Returns ``(x, info)`` with ``info = {"iterations", "residual"}``.
    The iteration runs on device (``lax.while_loop``); each step costs
    one streaming-kernel evaluation.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    field = field or next(iter(program.inputs))
    out = out or program.outputs[0]
    op = _linear_op(program, field, out, interpret)

    b = jnp.asarray(rhs)
    x = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0)
    atol2 = jnp.asarray(tol, b.dtype) ** 2 * jnp.vdot(b, b).real

    def body(state):
        x, r, p, rs, k = state
        ap = op(p)
        alpha = rs / jnp.vdot(p, ap).real
        x = x + alpha * p
        r = r - alpha * ap
        rs_new = jnp.vdot(r, r).real
        p = r + (rs_new / rs) * p
        return x, r, p, rs_new, k + 1

    def cond(state):
        _x, _r, _p, rs, k = state
        return (rs > atol2) & (k < maxiter)

    @jax.jit
    def run(x, b):
        r = b - op(x)
        rs = jnp.vdot(r, r).real
        state = lax.while_loop(cond, body, (x, r, r, rs, 0))
        return state[0], state[3], state[4]

    x, rs, k = run(x, b)
    return x, {"iterations": int(k), "residual": float(rs) ** 0.5}


def solve_cgnr(program: ir.Program, rhs: Any,
               field: Optional[str] = None, out: Optional[str] = None,
               x0: Optional[Any] = None,
               tol: float = 1e-6, maxiter: int = 1000,
               interpret: bool = False) -> Tuple[Any, Dict]:
    """Solve ``A x = rhs`` for a general (nonsymmetric) affine chain via
    CG on the normal equations ``AᵀA x = Aᵀ rhs`` — ``Aᵀ`` is the
    transposed chain from :func:`stencilflow_tpu.grad.adjoint_program`,
    so both operators run on the streaming backend."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from .grad import adjoint_program

    field = field or next(iter(program.inputs))
    out = out or program.outputs[0]
    op = _linear_op(program, field, out, interpret)
    adj, cot = adjoint_program(program, wrt=[field])
    op_t = _linear_op(adj, cot[out], f"adj_{field}", interpret)

    b = jnp.asarray(rhs)
    x = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0)

    def normal_op(v):
        return op_t(op(v).reshape(v.shape)).reshape(v.shape)

    bt = op_t(b).reshape(b.shape)
    atol2 = jnp.asarray(tol, b.dtype) ** 2 * jnp.vdot(bt, bt).real

    def body(state):
        x, r, p, rs, k = state
        ap = normal_op(p)
        alpha = rs / jnp.vdot(p, ap).real
        x = x + alpha * p
        r = r - alpha * ap
        rs_new = jnp.vdot(r, r).real
        p = r + (rs_new / rs) * p
        return x, r, p, rs_new, k + 1

    def cond(state):
        _x, _r, _p, rs, k = state
        return (rs > atol2) & (k < maxiter)

    @jax.jit
    def run(x, bt):
        r = bt - normal_op(x)
        rs = jnp.vdot(r, r).real
        state = lax.while_loop(cond, body, (x, r, r, rs, 0))
        return state[0], state[3], state[4]

    x, rs, k = run(x, bt)
    return x, {"iterations": int(k), "residual": float(rs) ** 0.5}
