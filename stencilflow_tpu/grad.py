"""Differentiable chain evaluation — adjoints of stencil programs.

A capability the reference cannot offer: its pipelines are generated
OpenCL/HLS (sdfg_generator.py) with no derivative story.  Here the fused-XLA
tile evaluator (backend/xla.py) is pure JAX, so any stencil chain — linear
or not (ternaries, min/max, limiters differentiate as subgradients) — is
reverse-mode differentiable end to end.  The adjoint of a stencil chain is
itself a chain of (transposed) stencils, and XLA fuses the backward pass
the same way it fuses the forward one.

Use cases: PDE-constrained optimization, data assimilation (4D-Var),
sensitivity analysis of initial conditions / coefficient fields.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence, Tuple

from . import ir
from .frontend.analysis import ChainAnalysis


def value_and_grad(program: ir.Program,
                   loss: Optional[Callable[[Dict[str, Any]], Any]] = None,
                   wrt: Optional[Sequence[str]] = None,
                   analysis: Optional[ChainAnalysis] = None,
                   mesh=None, dim_axes: Optional[Sequence] = None,
                   jit: bool = True) -> Callable:
    """Build ``f(inputs) -> (value, grads)`` for a scalar loss of the
    chain's outputs.

    ``loss``: callable mapping the outputs dict to a scalar (default: sum
    of every output).  ``wrt``: input names to differentiate with respect
    to (default: every non-scalar floating-point input).  ``grads`` is a
    dict over ``wrt``.  The returned function is jit-compiled and itself
    further differentiable (higher-order derivatives work).

    Multi-chip: pass ``mesh`` + ``dim_axes`` — the forward pass is the
    shard_map domain decomposition (fused-XLA local body: the Pallas
    stream kernel has no transpose rule) and JAX transposes the ICI halo
    exchange (``ppermute``) in the backward pass, so gradients stay
    sharded exactly like the primals.  The decomposition plan is attached
    as ``f.plan`` — commit inputs with ``f.plan.input_shardings()`` to
    avoid a reshard on entry.  (First compile of the sharded-grad graph
    is slow on real hardware — ~20 min observed through the device
    tunnel — and cached afterwards.)
    """
    import jax
    import jax.numpy as jnp

    from .dtypes import is_floating

    plan = None
    if mesh is not None:
        from .parallel.domain import compile_sharded_chain
        if dim_axes is None:
            raise ValueError("mesh requires dim_axes, e.g. "
                             "(None, 'x', 'y')")
        fn, plan = compile_sharded_chain(program, mesh, dim_axes,
                                         analysis, local_backend="xla")
    else:
        from .backend.xla import compile_chain
        fn = compile_chain(program, analysis)
    if wrt is None:
        wrt = [n for n, s in program.inputs.items()
               if not s.is_scalar and is_floating(s.dtype)]
    unknown = [n for n in wrt if n not in program.inputs]
    if unknown:
        raise ValueError(f"wrt names {unknown} are not program inputs "
                         f"(inputs: {list(program.inputs)})")
    if loss is None:
        def loss(outputs):
            return sum(jnp.sum(v) for v in outputs.values())

    def f(inputs: Dict[str, Any]):
        diff = {n: inputs[n] for n in wrt}
        rest = {n: v for n, v in inputs.items() if n not in diff}

        def scalar(d):
            return loss(fn({**rest, **d}))

        return jax.value_and_grad(scalar)(diff)

    # NB: the backends' forward fns are themselves jitted; jit=False only
    # removes the outer wrapper (the forward still traces), it is not an
    # eager escape hatch
    out = jax.jit(f) if jit else f
    out.plan = plan
    return out


def grad(program: ir.Program, **kw) -> Callable:
    """``f(inputs) -> grads`` (see :func:`value_and_grad`)."""
    vg = value_and_grad(program, **kw)

    def f(inputs):
        return vg(inputs)[1]

    return f
