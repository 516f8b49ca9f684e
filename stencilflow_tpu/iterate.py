"""Iterative solver driver: time-step a stencil chain with checkpoints.

The reference has no iterative state (each run is one pass of the chain;
deep time-stepping is expressed by unrolling, e.g. jacobi3d_*_8itr).  For
production solvers the TPU-native framework provides the missing driver:

* ``make_step`` compiles one chain evaluation (any backend, single- or
  multi-chip) into a jittable state-update ``{field: arr} -> {field: arr}``
  by feeding designated outputs back into inputs;
* ``iterate`` runs N steps with the loop ON DEVICE (``lax.fori_loop`` over
  chunks — no per-step dispatch), periodically checkpointing state to
  ``.npz`` files and resuming from the latest checkpoint after a failure —
  the checkpoint/resume subsystem the reference lacks (SURVEY.md §5).

Multi-chip: pass a ``mesh`` + ``dim_axes``; the step is the shard_map
domain-decomposed evaluation (one cumulative-halo ICI exchange per step) and
state stays device-resident and sharded between steps.
"""
from __future__ import annotations

import glob
import os
import re
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import numpy as np

from . import ir
from .frontend.analysis import ChainAnalysis


class IterateError(ValueError):
    pass


def _default_feed(program: ir.Program) -> Dict[str, str]:
    """Map the unique full-domain input to the unique output (only
    full-domain inputs are feedable; lower-rank coefficient arrays and
    scalars are carried unchanged)."""
    raw = tuple(program.raw_dimensions)
    feedable = [
        n for n, s in program.inputs.items()
        if not s.is_scalar and tuple(s.shape(program.dimensions)) == raw
    ]
    if len(feedable) == 1 and len(program.outputs) == 1:
        return {feedable[0]: program.outputs[0]}
    raise IterateError(
        "ambiguous feedback: pass feed={input_name: output_name}")


def make_step(program: ir.Program,
              feed: Optional[Dict[str, str]] = None,
              backend: str = "auto",
              interpret: bool = False,
              mesh=None, dim_axes: Optional[Sequence] = None
              ) -> Tuple[Callable, Dict[str, str]]:
    """Compile one time step.  Returns ``(step, feed)`` where
    ``step(state_dict) -> state_dict`` carries every program input; fed
    inputs are replaced by the designated outputs each call."""
    feed = feed or _default_feed(program)
    for iname, oname in feed.items():
        if iname not in program.inputs or oname not in program.outputs:
            raise IterateError(f"bad feed entry {iname!r} <- {oname!r}")
        spec = program.inputs[iname]
        in_shape = spec.shape(program.dimensions)
        if tuple(in_shape) != tuple(program.raw_dimensions):
            raise IterateError(
                f"fed input {iname!r} must span the full domain")

    analysis = ChainAnalysis.run(program)
    if mesh is not None:
        if dim_axes is None:
            raise IterateError("mesh requires dim_axes, e.g. "
                               "(None, 'x', 'y')")
        from .parallel.domain import compile_sharded_chain
        fn, _plan = compile_sharded_chain(program, mesh, dim_axes,
                                          analysis, interpret=interpret)
    elif backend == "auto":
        from .backend import compile_chain_best
        fn, _name = compile_chain_best(program, analysis,
                                       interpret=interpret)
    elif backend == "stream":
        from .backend.stream import compile_chain_stream
        fn = compile_chain_stream(program, analysis, interpret=interpret)
    elif backend == "pallas":
        from .backend.pallas import compile_chain_pallas
        fn = compile_chain_pallas(program, analysis, interpret=interpret)
    elif backend == "xla":
        from .backend import compile_chain
        fn = compile_chain(program, analysis)
    else:
        raise IterateError(f"unknown backend: {backend}")

    def step(state: Dict[str, Any]) -> Dict[str, Any]:
        out = fn(state)
        new_state = dict(state)
        for iname, oname in feed.items():
            new_state[iname] = out[oname]
        return new_state

    return step, feed


def _latest_checkpoint(ckpt_dir: str) -> Optional[Tuple[int, str]]:
    best = None
    for path in glob.glob(os.path.join(ckpt_dir, "step_*.npz")):
        m = re.search(r"step_(\d+)\.npz$", path)
        if m:
            k = int(m.group(1))
            if best is None or k > best[0]:
                best = (k, path)
    return best


def iterate(program: ir.Program, inputs: Dict[str, Any], steps: int,
            feed: Optional[Dict[str, str]] = None,
            backend: str = "auto", interpret: bool = False,
            mesh=None, dim_axes: Optional[Sequence] = None,
            chunk: int = 16,
            checkpoint_every: int = 0,
            checkpoint_dir: Optional[str] = None,
            resume: bool = True) -> Dict[str, np.ndarray]:
    """Run ``steps`` chain evaluations with output→input feedback.

    The loop runs on device in chunks (one dispatch per ``chunk`` steps);
    with ``checkpoint_every`` > 0, state is persisted to
    ``checkpoint_dir/step_K.npz`` at that cadence and — when ``resume`` —
    execution continues from the newest checkpoint found.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    step, feed = make_step(program, feed, backend, interpret, mesh,
                           dim_axes)

    start = 0
    state = {k: jnp.asarray(v) for k, v in inputs.items()}
    if checkpoint_every > 0:
        if not checkpoint_dir:
            raise IterateError("checkpoint_every requires checkpoint_dir")
        os.makedirs(checkpoint_dir, exist_ok=True)
        if resume:
            latest = _latest_checkpoint(checkpoint_dir)
            if latest is not None:
                start, path = latest
                if start > steps:
                    raise IterateError(
                        f"checkpoint {path} is at step {start}, beyond the "
                        f"requested {steps}; pass resume=False or a fresh "
                        "checkpoint_dir")
                data = np.load(path)
                state = {k: jnp.asarray(data[k]) for k in state}
        # checkpoints must land on chunk boundaries
        chunk = min(chunk, checkpoint_every)

    @jax.jit
    def run_chunk(state, n):
        return lax.fori_loop(0, n, lambda _i, s: step(s), state)

    done = start
    while done < steps:
        n = min(chunk, steps - done)
        if checkpoint_every > 0:
            n = min(n, checkpoint_every - done % checkpoint_every or
                    checkpoint_every)
        state = run_chunk(state, n)
        done += n
        if checkpoint_every > 0 and (done % checkpoint_every == 0 or
                                     done >= steps):
            jax.block_until_ready(state)
            final = os.path.join(checkpoint_dir, f"step_{done}.npz")
            tmp = final + ".tmp.npz"
            np.savez(tmp, **{k: np.asarray(v) for k, v in state.items()})
            os.replace(tmp, final)  # atomic: a crash never corrupts
            #                         the newest resumable checkpoint

    return {k: np.asarray(v) for k, v in state.items()}
