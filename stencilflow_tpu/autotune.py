"""Measured backend selection: time every applicable lowering on-device.

``--backend auto`` (backend.compile_chain_best) applies a measured
*policy* — shape-class rules derived from the chip studies in RESULTS.md.
``autotune`` instead measures THIS program on THIS device and caches the
winner, the framework-level analogue of XLA's own gemm/conv autotuning.
The reference has no equivalent: its backend is a static vendor flag
(/root/reference/stencilflow/run_program.py:95-109).

Timing uses bench.py's tunnel-safe methodology — a data-dependent
on-device ``lax.fori_loop`` (the output feeds the next iteration's input
when shapes allow, otherwise a scalar carry perturbs one input so XLA
cannot hoist the chain), two loop lengths differenced to cancel dispatch
and readback overheads, best-of-N trials.

The cache key hashes the program *structure* (shapes, dtypes, kernels,
BCs — not data values) plus the device kind, so a tuned choice is reused
across runs and input files: ``compile_chain_autotuned`` returns
instantly on a hit.
"""
from __future__ import annotations

import dataclasses
import hashlib
import json
import os
import time
from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np

from . import ir
from .frontend.analysis import ChainAnalysis

DEFAULT_CACHE = os.environ.get("SFT_AUTOTUNE_CACHE") or os.path.join(
    os.path.expanduser(os.environ.get("XDG_CACHE_HOME", "~/.cache")),
    "stencilflow_tpu", "autotune.json")


@dataclasses.dataclass
class Candidate:
    label: str
    build: Callable[[], Any]  # () -> fn; may raise ValueError (scope)


def _builders(program: ir.Program, analysis: ChainAnalysis,
              interpret: bool, mxu: str = "auto",
              mxu_precision: str = "split",
              spill: str = "auto") -> Dict[str, Callable[[], Any]]:
    """label -> builder for every lowering that might apply.

    Labels are stable and parseable so a cached winner can be rebuilt
    without re-measuring (``build_from_label``).  ``mxu`` /
    ``mxu_precision`` / ``spill`` forward to the streaming candidates
    (so ``run --no-mxu --backend autotuned`` is honored).
    """
    from .backend import _any_mxu_candidate, compile_chain
    from .backend.group import compile_chain_group
    from .backend.overlap import compile_chain_overlap
    from .backend.panel import compile_chain_panel
    from .backend.pallas import compile_chain_pallas
    from .backend.stream import compile_chain_stream

    b: Dict[str, Callable[[], Any]] = {}
    b["stream"] = lambda: compile_chain_stream(
        program, analysis, interpret=interpret, mxu=mxu,
        mxu_precision=mxu_precision, spill=spill)
    # bf16 ring storage, f32 compute: halves ring VMEM (larger
    # tiles/blocks) and ring-store traffic at a documented per-stage
    # rounding envelope — a measured A/B knob, never a blind default
    if all(np.dtype(program.field_dtype(f)) == np.float32
           for f in list(program.inputs) + list(program.kernels)):
        b["stream:rings=bf16"] = lambda: compile_chain_stream(
            program, analysis, interpret=interpret, mxu=mxu,
            mxu_precision=mxu_precision, spill=spill,
            ring_storage="bfloat16")
        b["panel:rings=bf16"] = lambda: compile_chain_panel(
            program, analysis, interpret=interpret,
            ring_storage="bfloat16")
    if mxu != "off" and _any_mxu_candidate(program):
        b["stream:mxu=off"] = lambda: compile_chain_stream(
            program, analysis, interpret=interpret, mxu="off",
            spill=spill)
        # micro-step drive order for MXU chains: "auto" engages
        # stage-major (block-wide batched band transforms); measure the
        # plane-major order too so the cache records which one this
        # (program, device) pair actually prefers
        b["stream:sm=off"] = lambda: compile_chain_stream(
            program, analysis, interpret=interpret, mxu=mxu,
            mxu_precision=mxu_precision, spill=spill,
            stage_major="off")
    b["panel:B=auto"] = lambda: compile_chain_panel(
        program, analysis, interpret=interpret)
    # explicit panels relax the VMEM gate to the full budget: the 0.7
    # policy gate exists to protect blind selection from Mosaic
    # allocation failures, but autotune catches those at build/first
    # execution, and over-gate panels measure real wins (49.3 vs the
    # 41.7 GCell/s stream fallback at (128,768,768)x2 — RESULTS.md)
    for B in (2, 4, 8):
        b[f"panel:B={B}"] = (lambda B=B: compile_chain_panel(
            program, analysis, panel=B, interpret=interpret,
            gate_frac=1.0))
    b["overlap:B=auto"] = lambda: compile_chain_overlap(
        program, analysis, interpret=interpret)
    for B in (4, 8):
        b[f"overlap:B={B}"] = (lambda B=B: compile_chain_overlap(
            program, analysis, panel=B, interpret=interpret,
            gate_frac=1.0))
    # stage-grouped recompute (backend/group.py): rings every g stages,
    # overlap-style recompute within groups — the panel<->overlap hybrid
    # trading VPU flops (recompute halo) for VMEM passes (ring stores)
    for g in (2, 4):
        b[f"group:g={g}"] = (lambda g=g: compile_chain_group(
            program, analysis, group=g, interpret=interpret))
        for B in (2, 4, 8):
            b[f"group:g={g}:B={B}"] = (
                lambda g=g, B=B: compile_chain_group(
                    program, analysis, group=g, panel=B,
                    interpret=interpret, gate_frac=1.0))
    if len(program.raw_dimensions) == 2:
        from .backend import compile_chain_rows
        b["rows:auto"] = lambda: compile_chain_rows(
            program, interpret=interpret, mxu=mxu,
            mxu_precision=mxu_precision, spill=spill)[0]
        for B in (16, 32, 64):
            # explicit rows panels relax the gate like every other
            # explicit panel/overlap candidate (autotune catches Mosaic
            # failures itself)
            b[f"rows:B={B}"] = (lambda B=B: compile_chain_rows(
                program, interpret=interpret, panel=B,
                backend="panel", gate_frac=1.0)[0])
        # stage-grouped rows: g >= depth (single group, overlap-style
        # zero intermediate rings) measured the 2-D exact-mode winner
        # (jacobi2d 8192^2 x8: 16.9 vs j-tiled stream 15.4 — RESULTS.md
        # round 5); win=direct additionally drops the input ring
        for g, B, win in ((8, 64, "ring"), (8, 64, "direct"),
                          (4, 64, "ring")):
            suffix = ":win=direct" if win == "direct" else ""
            b[f"rows:group:g={g}:B={B}{suffix}"] = (
                lambda g=g, B=B, win=win: compile_chain_rows(
                    program, interpret=interpret, panel=B,
                    backend="group", group=g, gate_frac=1.0,
                    input_windows=win)[0])
    b["pallas"] = lambda: compile_chain_pallas(
        program, analysis, interpret=interpret)
    b["xla"] = lambda: compile_chain(program, analysis)
    return b


# stream:rings=bf16 is deliberately NOT a default: autotune selects on
# speed alone, and bf16 ring storage trades accuracy (per-stage
# rounding) — reduced-precision candidates are opt-in via explicit
# labels (--labels stream:rings=bf16,...), like mxu_precision="bf16"
DEFAULT_LABELS = ["stream", "stream:mxu=off", "stream:sm=off",
                  "panel:B=auto", "overlap:B=auto", "group:g=2",
                  "group:g=4", "rows:auto", "rows:group:g=8:B=64",
                  "pallas", "xla"]

# documented reduced-precision opt-ins (per-stage rounding envelopes) —
# added to the measured set by `autotune --allow-reduced-precision`;
# verification must widen to the bf16 envelope when one of these wins
REDUCED_PRECISION_LABELS = ["stream:rings=bf16", "panel:rings=bf16"]


def build_from_label(program: ir.Program, label: str,
                     analysis: Optional[ChainAnalysis] = None,
                     interpret: bool = False, **settings):
    """Rebuild a candidate's compiled fn from its cached label."""
    analysis = analysis or ChainAnalysis.run(program)
    builders = _builders(program, analysis, interpret, **settings)
    if label not in builders:
        raise KeyError(f"unknown autotune label {label!r}")
    return builders[label]()


def _make_loop(fn, program: ir.Program, arrs: Dict[str, Any]):
    """A jitted ``loop(r)`` applying ``fn`` with a data dependency between
    iterations (so the device executes sequential applications), returning
    a cheap scalar.  Returns ``(loop, apps_per_rep)``.

    When an output feeds an input, the body applies the chain TWICE per
    iteration (``apps_per_rep == 2``): a single-application fori_loop body
    pays a full extra HBM read+write per iteration copying the pallas
    output back into the pinned carry buffer (a custom-call result cannot
    alias its operand), nearly doubling the apparent cost of HBM-bound
    candidates — measured 43 vs 83.6 GCell/s on a passthrough
    (scripts/loop_copy_probe.py).  At two applications the second output
    lands in the freed carry slot and the copy vanishes."""
    import jax
    import jax.numpy as jnp

    outs = fn(arrs)  # also validates the candidate end-to-end
    feed = None
    for o_name, o in outs.items():
        for i_name, a in arrs.items():
            if a.shape == o.shape and a.dtype == o.dtype:
                feed = (i_name, o_name)
                break
        if feed:
            break

    def all_outputs_scalar(got):
        # every output contributes to the carry: transparent candidates
        # (fused XLA) must not get their non-fed outputs dead-code
        # eliminated while opaque pallas_call candidates do full work
        return sum(got[o].ravel()[0].astype(jnp.float32)
                   for o in sorted(got))

    if feed is not None:
        i_n, o_n = feed
        rest = {k: v for k, v in arrs.items() if k != i_n}

        @jax.jit
        def loop(r):
            def body(carry, x):
                got = fn({i_n: x, **rest})
                return carry + all_outputs_scalar(got), got[o_n]
            def step(_, c):
                return body(*body(*c))
            out = jax.lax.fori_loop(0, r, step,
                                    (jnp.float32(0.0), arrs[i_n]))
            return out[0] + out[1].ravel()[0].astype(jnp.float32)
        return loop, 2
    else:
        # no shape-compatible (input, output) pair: thread a scalar carry
        # through one input at negligible weight — the data dependency
        # blocks loop-invariant hoisting, the 1e-30 perturbation is far
        # below the verification tolerance (the dialect is float-typed,
        # so the cast cannot flush the epsilon to an exact zero)
        i_n = max(arrs, key=lambda k: int(np.prod(arrs[k].shape)))
        base = arrs[i_n]

        @jax.jit
        def loop(r):
            def body(_, c):
                got = fn({**arrs, i_n: base + c * jnp.asarray(
                    1e-30, base.dtype)})
                return all_outputs_scalar(got)
            return jax.lax.fori_loop(0, r, body, jnp.float32(0.0))

    return loop, 1


def _time_fn(fn, program: ir.Program, arrs: Dict[str, Any],
             trials: int, on_tpu: bool) -> float:
    """Seconds per chain application (differenced on-device loop)."""
    loop, apps = _make_loop(fn, program, arrs)

    def timed(reps: int) -> float:
        np.asarray(loop(reps))  # warm up / force the remote compile
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            np.asarray(loop(reps))
            best = min(best, time.perf_counter() - t0)
        return best

    cells = float(program.total_elements)
    if on_tpu:
        big = int(min(3840, max(30, round(30 * (512**3 / cells)))))
        small = max(6, big // 5)
    else:
        small, big = 2, 6
    big, small = max(big // apps, 2), max(small // apps, 1)
    dt = (timed(big) - timed(small)) / (apps * (big - small))
    if dt <= 0:
        # differencing lost to timer jitter (tiny CPU/interpret runs):
        # fall back to the per-application upper bound so a noise-negative
        # candidate can never win (and never poisons the cache)
        dt = timed(big) / (apps * big)
    return dt


@dataclasses.dataclass
class AutotuneResult:
    label: str                      # winning candidate
    seconds: float                  # per chain application
    timings: Dict[str, float]       # label -> seconds (inf = failed)
    skipped: Dict[str, str]         # label -> reason (out of scope)
    fn: Any = None                  # the winner's compiled callable


def autotune(program: ir.Program,
             analysis: Optional[ChainAnalysis] = None,
             labels: Optional[List[str]] = None,
             sweep: bool = False,
             trials: int = 3,
             seed: int = 0,
             interpret: bool = False,
             verbose: bool = False,
             mxu: str = "auto",
             mxu_precision: str = "split",
             spill: str = "auto",
             allow_reduced_precision: bool = False) -> AutotuneResult:
    """Measure every applicable lowering and return the winner.

    ``sweep`` adds the panel/overlap block-size grid to the default
    candidate set.  Candidates whose scope checks reject the program are
    recorded in ``skipped``; a candidate that fails at runtime is
    recorded with infinite time.

    ``allow_reduced_precision`` adds the documented opt-in rounding
    envelopes (bf16 ring storage) to the measured set — autotune selects
    on SPEED alone, so accuracy-trading candidates never enter the pool
    implicitly; a reduced-precision winner is flagged in the cache and
    ``run --backend autotuned`` widens verification to the bf16
    envelope.  Passing explicit ``labels`` bypasses the filter.
    """
    import jax
    import jax.numpy as jnp

    from .data import load_input_arrays
    analysis = analysis or ChainAnalysis.run(program)
    on_tpu = jax.devices()[0].platform == "tpu" and not interpret
    builders = _builders(program, analysis, interpret, mxu=mxu,
                         mxu_precision=mxu_precision, spill=spill)
    if labels is None:
        labels = list(builders) if sweep else [
            l for l in DEFAULT_LABELS if l in builders]
        if not allow_reduced_precision:
            labels = [l for l in labels if ":rings=bf16" not in l]

    inputs = load_input_arrays(program, seed=seed)
    arrs = {k: jnp.asarray(v) for k, v in inputs.items()}

    timings: Dict[str, float] = {}
    skipped: Dict[str, str] = {}
    fns: Dict[str, Any] = {}
    for label in labels:
        try:
            fn = builders[label]()
        except (ValueError, NotImplementedError) as e:
            skipped[label] = str(e)
            continue
        try:
            dt = _time_fn(fn, program, arrs, trials, on_tpu)
        except Exception as e:  # noqa: BLE001 — Mosaic/XLA compile errors
            timings[label] = float("inf")
            skipped[label] = f"failed: {type(e).__name__}: {e}"
            continue
        timings[label] = dt
        fns[label] = fn   # keep the compiled+warmed fn (recompiling the
        #                   winner would cost another cold Mosaic compile)
        if verbose:
            gc = program.total_elements / dt / 1e9
            print(f"  {label:16s} {dt * 1e3:9.3f} ms  {gc:8.2f} GCell/s")

    finite = {l: t for l, t in timings.items() if np.isfinite(t)}
    if not finite:
        raise RuntimeError(
            f"autotune: no candidate ran ({skipped or timings})")
    best = min(finite, key=finite.get)
    return AutotuneResult(label=best, seconds=finite[best],
                          timings=timings, skipped=skipped,
                          fn=fns[best])


def cache_key(program: ir.Program, interpret: bool = False,
              **settings) -> str:
    """Device-, mode- and structure-dependent key (data values excluded).

    ``interpret`` and the lowering settings (mxu/spill/...) are part of
    the key: a winner measured under emulation or with MXU disabled must
    never be served to a hardware / MXU-enabled run."""
    import jax

    from .frontend.export import program_to_json
    spec = program_to_json(program, embed_data=False)
    dev = jax.devices()[0]
    ctx = "|".join(f"{k}={settings[k]}" for k in sorted(settings))
    src = (json.dumps(spec, sort_keys=True, default=str)
           + f"|{dev.platform}|{getattr(dev, 'device_kind', '')}"
           + f"|interpret={interpret}|{ctx}")
    return hashlib.sha256(src.encode()).hexdigest()[:16]


def _load_cache(path: str) -> Dict[str, Any]:
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _save_cache(path: str, cache: Dict[str, Any]) -> None:
    if os.path.dirname(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(cache, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def save_result(program: ir.Program, res: AutotuneResult,
                cache_path: Optional[str] = None,
                interpret: bool = False, **settings) -> str:
    """Record an AutotuneResult in the on-disk cache; returns the path."""
    import jax
    path = cache_path or DEFAULT_CACHE
    cache = _load_cache(path)
    dev = jax.devices()[0]
    cache[cache_key(program, interpret, **settings)] = {
        "label": res.label,
        # explicit-B winners were built with gate_frac=1.0 (past the
        # blind policy's 0.7 VMEM gate) — safe to serve blind because
        # they MEASURED (compiled + executed) on this device during
        # tuning; recorded so `run --backend autotuned` users can see it
        "over_gate": ":B=" in res.label,
        # reduced-precision winners (bf16 rings) carry a documented
        # rounding envelope: `run --backend autotuned` widens its
        # verification tolerance when this is set
        "reduced_precision": ":rings=bf16" in res.label,
        "seconds": res.seconds,
        "timings": {l: (None if not np.isfinite(t) else t)
                    for l, t in res.timings.items()},
        "program": program.name,
        "dimensions": list(program.raw_dimensions),
        "device": f"{dev.platform}:{getattr(dev, 'device_kind', '')}",
    }
    _save_cache(path, cache)
    return path


def compile_chain_autotuned(program: ir.Program,
                            analysis: Optional[ChainAnalysis] = None,
                            cache_path: Optional[str] = None,
                            force: bool = False,
                            interpret: bool = False,
                            mxu: str = "auto",
                            mxu_precision: str = "split",
                            spill: str = "auto",
                            allow_reduced_precision: bool = False,
                            **autotune_kw) -> Tuple[Any, str]:
    """Return ``(fn, label)`` for the measured-best lowering, consulting
    (and updating) the on-disk cache.  ``allow_reduced_precision`` is
    part of the cache key: a bf16-rings winner tuned under the flag is
    never served to a run that didn't opt in."""
    path = cache_path or DEFAULT_CACHE
    settings = dict(mxu=mxu, mxu_precision=mxu_precision, spill=spill)
    key_settings = dict(settings)
    if allow_reduced_precision:
        key_settings["allow_reduced_precision"] = True
    key = cache_key(program, interpret, **key_settings)
    cache = _load_cache(path)
    if not force and key in cache:
        label = cache[key]["label"]
        try:
            return (build_from_label(program, label, analysis,
                                     interpret=interpret, **settings),
                    label)
        except (ValueError, NotImplementedError, KeyError):
            pass  # stale entry (e.g. tuned on different jax) — re-tune
    res = autotune(program, analysis, interpret=interpret,
                   allow_reduced_precision=allow_reduced_precision,
                   **settings, **autotune_kw)
    save_result(program, res, path, interpret, **key_settings)
    return res.fn, res.label
