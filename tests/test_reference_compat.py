"""Dialect-compatibility sweep: every program JSON shipped with the
reference (read in place from the read-only mount, when present) must parse,
analyze, execute, and verify in this framework — the acceptance checklist's
"JSON dialect accepted verbatim for all test/stencils/*.json" item.

Each program runs through: parser → chain analysis → fused-XLA backend →
whole-domain oracle comparison; small programs additionally cross-check the
cycle-accurate simulator.  Shrink-BC programs are compared with the halo
pruned, mirroring the reference's -halo discipline (README.md:50-56).
"""
import glob
import os

import numpy as np
import pytest

import stencilflow_tpu as sft
from stencilflow_tpu.backend.xla import run_chain
from stencilflow_tpu.data import arrays_are_equal, load_input_arrays, \
    prune_halo
from stencilflow_tpu.frontend.analysis import ChainAnalysis
from stencilflow_tpu.backend.xla import chain_halo
from stencilflow_tpu.ir import BCKind

REF_STENCILS = "/root/reference/test/stencils"

if os.path.isdir(REF_STENCILS):
    PROGRAMS = sorted(glob.glob(os.path.join(REF_STENCILS, "*.json")))
else:  # pragma: no cover
    PROGRAMS = []

pytestmark = pytest.mark.skipif(
    not PROGRAMS, reason="reference fixture programs not mounted")


def _max_shrink_halo(program, analysis) -> int:
    uses_shrink = any(
        bc.kind == BCKind.SHRINK
        for k in program.kernels.values()
        for bc in k.boundary_conditions.values())
    if not uses_shrink:
        return 0
    return max(chain_halo(analysis))


@pytest.mark.parametrize("path", PROGRAMS,
                         ids=[os.path.basename(p) for p in PROGRAMS])
def test_reference_program(path):
    program = sft.parse_program(path)
    analysis = ChainAnalysis.run(program)
    assert analysis.critical_path_cycles >= 0

    inputs = load_input_arrays(program, prefix=REF_STENCILS, seed=0)
    ref = sft.run_interpreter(program, inputs)

    out = run_chain(program, inputs)
    halo = _max_shrink_halo(program, analysis)
    for o in program.outputs:
        exp = prune_halo(np.asarray(ref[o]), program.raw_dimensions, halo)
        got = prune_halo(out[o], program.raw_dimensions, halo)
        assert arrays_are_equal(exp, got), f"XLA mismatch on {o}"

    # streaming-backend cross-check (interpret mode) for small domains
    if program.total_elements <= 4096:
        from stencilflow_tpu.backend.stream import run_chain_stream
        try:
            got_s = run_chain_stream(program, inputs, interpret=True)
        except ValueError:
            got_s = None   # documented lowering limit (e.g. i-spanning
            #                lower-dim inputs); auto falls back to pallas/xla
        for o in (program.outputs if got_s is not None else []):
            exp = prune_halo(np.asarray(ref[o]), program.raw_dimensions,
                             halo)
            got = prune_halo(got_s[o], program.raw_dimensions, halo)
            assert arrays_are_equal(exp, got), f"stream mismatch on {o}"

    # simulator cross-check for small domains (cycle loop cost)
    if program.total_elements <= 40000:
        from stencilflow_tpu.sim import simulate
        res = simulate(program, inputs, analysis=analysis)
        for o in program.outputs:
            exp = prune_halo(np.asarray(ref[o]), program.raw_dimensions,
                             halo)
            got = prune_halo(res.outputs[o], program.raw_dimensions, halo)
            assert arrays_are_equal(exp, got), f"simulator mismatch on {o}"
