"""Mesh-scaling model validation (VERDICT r1 weak #7 / next #8).

The analytic model (report.mesh_scaling) has two terms.  The ICI term is
validated EXACTLY here: its predicted halo-exchange bytes must equal the
collective-permute traffic in the actual compiled sharded program's HLO,
config by config.  The compute term equals roofline_time * shard fraction *
halo widening; at P=1 it reduces to the roofline model, whose error
against real-chip measurement is tracked in RESULTS.md (0.95 achieved on
the 512^3 headline — i.e. the compute projection is within ~5% where
hardware exists to check it).
"""
import re

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

import stencilflow_tpu as sft
from stencilflow_tpu.parallel.domain import (compile_sharded_chain,
                                             place_global_inputs)
from stencilflow_tpu.report import Report
from stencilflow_tpu.synthesize import jacobi, synthesize_stencil

_DTYPE_BYTES = {"f32": 4, "f64": 8, "bf16": 2}


def _collective_permute_bytes(fn, inputs) -> int:
    """Per-device bytes moved by collective-permute ops in the compiled
    HLO (each op's result shape is the slab a device receives/sends)."""
    txt = jax.jit(fn).lower(inputs).compile().as_text()
    total = 0
    for line in txt.splitlines():
        if "collective-permute(" not in line:
            continue
        if "-start" in line.split("=")[0]:
            continue   # async start/done pairs: count once
        m = re.search(r"=\s*(\w+)\[([\d,]*)\]", line)
        if m and m.group(1) in _DTYPE_BYTES:
            shape = [int(x) for x in m.group(2).split(",") if x]
            total += int(np.prod(shape)) * _DTYPE_BYTES[m.group(1)]
    return total


CONFIGS = [
    # (program args, mesh shape, dim_axes)
    (dict(nd=3, size=32, iters=2), (2, 2), (None, "x", "y")),
    (dict(nd=3, size=32, iters=4), (4, 2), (None, "x", "y")),
    (dict(nd=3, size=16, iters=2), (2, 2), ("x", "y", None)),
    (dict(nd=2, size=64, iters=3), (2, 4), (None, "x", "y")),
]


@pytest.mark.parametrize("pa,mshape,axes", CONFIGS)
def test_ici_bytes_match_compiled_hlo(pa, mshape, axes):
    p = sft.parse_program(
        jacobi(pa["nd"], pa["size"], iterations=pa["iters"]),
        name=f"mm_{pa['nd']}_{pa['size']}_{pa['iters']}_{mshape}")
    n = int(np.prod(mshape))
    mesh = Mesh(np.array(jax.devices()[:n]).reshape(mshape), ("x", "y"))
    fn, plan = compile_sharded_chain(p, mesh, axes)
    ins = place_global_inputs(p, plan, sft.load_input_arrays(p, seed=0))
    measured = _collective_permute_bytes(fn, ins)
    model = Report.build(p).mesh_scaling(
        {"x": mshape[0], "y": mshape[1]}, dim_axes=axes)
    assert measured == model["ici_bytes_per_device"], (
        measured, model["ici_bytes_per_device"])


def test_ici_bytes_multi_input_program():
    """Hotspot has mixed-rank inputs: only spanned dims exchange."""
    p = sft.parse_program(
        synthesize_stencil(num_stages=2, dimensions=(8, 32, 32),
                           shape="hotspot"), name="mm_hotspot")
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("x", "y"))
    axes = (None, "x", "y")
    fn, plan = compile_sharded_chain(p, mesh, axes)
    ins = place_global_inputs(p, plan, sft.load_input_arrays(p, seed=0))
    measured = _collective_permute_bytes(fn, ins)
    model = Report.build(p).mesh_scaling({"x": 2, "y": 2}, dim_axes=axes)
    assert measured == model["ici_bytes_per_device"], (
        measured, model["ici_bytes_per_device"])


@pytest.mark.parametrize("pa,mshape,axes", CONFIGS[:2])
def test_comm_overlap_model_terms(pa, mshape, axes):
    """The --comm-overlap model (VERDICT r2 next #7): the strip-
    overcompute term is pinned to the overlap body's actual geometry
    (per sharded face, a 3h-thick strip spanning the widened extents of
    the other dims; interior = the unwidened block), and the exchange
    itself is unchanged — the overlap body's compiled collective-permute
    bytes equal the model's ICI term."""
    p = sft.parse_program(
        jacobi(pa["nd"], pa["size"], iterations=pa["iters"]),
        name=f"ov_{pa['nd']}_{pa['size']}_{pa['iters']}_{mshape}")
    n = int(np.prod(mshape))
    mesh = Mesh(np.array(jax.devices()[:n]).reshape(mshape), ("x", "y"))
    fn, plan = compile_sharded_chain(p, mesh, axes, comm_overlap=True)
    model = Report.build(p).mesh_scaling(
        {"x": mshape[0], "y": mshape[1]}, dim_axes=axes)
    ov = model["comm_overlap"]

    # geometry pin: strips from the plan's own halo/block
    expect_strips = 0.0
    shards = [p.dimensions[d] // plan.block[d] for d in range(3)]
    for d in range(3):
        if shards[d] <= 1 or not plan.halo[d]:
            continue
        face = 1.0
        for o in range(3):
            if o == d:
                continue
            face *= plan.block[o] + (2 * plan.halo[o]
                                     if shards[o] > 1 and plan.halo[o]
                                     else 0)
        expect_strips += 2 * 3 * plan.halo[d] * face
    assert ov["strip_cells"] == pytest.approx(expect_strips)
    assert ov["interior_cells"] == pytest.approx(
        float(np.prod(plan.block)))

    # the exchange is the same collective: HLO bytes match the model
    ins = place_global_inputs(p, plan, sft.load_input_arrays(p, seed=0))
    measured = _collective_permute_bytes(fn, ins)
    assert measured == model["ici_bytes_per_device"]

    # cost identities: overlap step = max(interior, ici) + strips;
    # break-even is the overcompute cost vs the blocking body
    assert ov["t_step_s"] == pytest.approx(
        max(ov["t_interior_s"], model["t_ici_s"]) + ov["t_strips_s"])
    assert ov["break_even_ici_s"] == pytest.approx(max(
        0.0, ov["t_interior_s"] + ov["t_strips_s"]
        - model["t_compute_s"]))
    assert ov["wins"] == (ov["t_step_s"] < model["t_step_s"])


def test_compute_term_reduces_to_roofline_at_p1():
    p = sft.parse_program(jacobi(3, 32, iterations=2), name="mm_p1")
    rep = Report.build(p)
    model = rep.mesh_scaling({"x": 1, "y": 1})
    assert model["t_ici_s"] == 0
    assert model["t_compute_s"] == pytest.approx(rep.roofline_time_s())
    assert model["parallel_efficiency"] == pytest.approx(1.0)
