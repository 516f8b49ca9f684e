"""Synthetic stencil-program generator.

Parity with the reference's benchmark generator
(/root/reference/bin/synthesize.py:34-298): emits program dicts (the JSON
dialect) for parameterized chains — number of stages, domain sizes, stencil
shape (cross / box / diffusion / hotspot), stencil extent, fork frequency and
length, vectorization, and how often a fresh spatial input joins the chain.

Used by the test-suite to generate its fixture programs and by ``bench.py``
for scaling studies.
"""
from __future__ import annotations

import itertools
from typing import Dict, List, Sequence

SHAPES = ("cross", "box", "diffusion", "hotspot", "hdiff")


def _iterators(num_dims: int) -> List[str]:
    return ["i", "j", "k"][3 - num_dims:]


def _center(iters: Sequence[str]) -> str:
    return "[" + ", ".join(iters) + "]"


def _offset_index(iters: Sequence[str], offsets: Sequence[int]) -> str:
    parts = []
    for it, o in zip(iters, offsets):
        if o == 0:
            parts.append(it)
        elif o > 0:
            parts.append(f"{it}+{o}")
        else:
            parts.append(f"{it}-{-o}")
    return "[" + ", ".join(parts) + "]"


def _cross_accesses(num_dims: int, extent: int) -> List[List[int]]:
    """Von-Neumann (cross) footprint of the given radius."""
    acc = [[0] * num_dims]
    for d in range(num_dims):
        for e in range(1, extent + 1):
            for s in (-e, e):
                v = [0] * num_dims
                v[d] = s
                acc.append(v)
    return acc


def _box_accesses(num_dims: int, extent: int) -> List[List[int]]:
    rng = range(-extent, extent + 1)
    return [list(v) for v in itertools.product(*([rng] * num_dims))]


def _stencil_expression(name: str, field: str, num_dims: int, shape: str,
                        extent: int) -> str:
    iters = _iterators(num_dims)
    if shape == "cross":
        accs = _cross_accesses(num_dims, extent)
    elif shape == "box":
        accs = _box_accesses(num_dims, extent)
    elif shape == "diffusion":
        # jacobi-style diffusion: center-weighted cross of radius 1
        accs = _cross_accesses(num_dims, 1)
        terms = " + ".join(field + _offset_index(iters, a) for a in accs[1:])
        return f"{name} = {1.0 / (2 * num_dims):.8f} * ({terms})"
    elif shape == "hotspot":
        return _hotspot_expression(name, field, num_dims)
    else:
        raise ValueError(f"unknown stencil shape: {shape}")
    coeff = 1.0 / len(accs)
    terms = " + ".join(field + _offset_index(iters, a) for a in accs)
    return f"{name} = {coeff:.8f} * ({terms})"


def _hotspot_expression(name: str, field: str, num_dims: int) -> str:
    """Hotspot thermal-simulation update (2-D/3-D), with scalar coefficient
    inputs cap/ct as in the reference's synthesizer (bin/synthesize.py:131-273).
    ``power`` is a full-size auxiliary input field."""
    iters = _iterators(num_dims)
    c = _center(iters)
    if num_dims == 2:
        j, k = iters
        return (f"{name} = {field}{c} + cap * (power{c} "
                f"+ 0.1 * ({field}[{j}+1, {k}] + {field}[{j}-1, {k}] "
                f"- 2.0 * {field}{c}) "
                f"+ 0.1 * ({field}[{j}, {k}+1] + {field}[{j}, {k}-1] "
                f"- 2.0 * {field}{c}) "
                f"+ ct * (80.0 - {field}{c}))")
    i, j, k = iters
    return (f"{name} = {field}{c} + cap * (power{c} "
            f"+ 0.1 * ({field}[{i}+1, {j}, {k}] + {field}[{i}-1, {j}, {k}] "
            f"- 2.0 * {field}{c}) "
            f"+ 0.1 * ({field}[{i}, {j}+1, {k}] + {field}[{i}, {j}-1, {k}] "
            f"- 2.0 * {field}{c}) "
            f"+ 0.1 * ({field}[{i}, {j}, {k}+1] + {field}[{i}, {j}, {k}-1] "
            f"- 2.0 * {field}{c}) "
            f"+ ct * (80.0 - {field}{c}))")


def _hdiff_stage(stage: int, prev: str, iters: Sequence[str],
                 data_type: str, bc) -> Dict[str, Dict]:
    """One COSMO-style horizontal-diffusion block: lap → flux-limited
    flx/fly → out (the canonical multi-operator import target named in the
    reference paper; the reference reaches it through its SDFG importer,
    sdfg_to_stencilflow.py:522).  Offsets live in the two fastest (plane)
    dims only — the vertical dim streams — and the flux limiters exercise
    multi-statement kernels, temporaries, compares, and ternaries."""
    c = _center(iters)
    # offset helpers in the last two dims (j, k of the padded program)
    def off(field, dj=0, dk=0):
        o = [0] * len(iters)
        o[-2] += dj
        o[-1] += dk
        return field + _offset_index(iters, o)

    lap, flx, fly, out = (f"lap{stage}", f"flx{stage}", f"fly{stage}",
                          f"s{stage}")
    kernels = {
        lap: {
            "computation_string":
                f"{lap} = 4.0 * {off(prev)} - ({off(prev, -1, 0)} + "
                f"{off(prev, 1, 0)} + {off(prev, 0, -1)} + "
                f"{off(prev, 0, 1)})",
            "boundary_conditions": bc(prev),
            "data_type": data_type,
        },
        flx: {
            "computation_string":
                f"d = {off(lap, 1, 0)} - {off(lap)}; "
                f"{flx} = 0.0 if d * ({off(prev, 1, 0)} - {off(prev)}) "
                f"> 0.0 else d",
            "boundary_conditions": {**bc(lap), **bc(prev)},
            "data_type": data_type,
        },
        fly: {
            "computation_string":
                f"d = {off(lap, 0, 1)} - {off(lap)}; "
                f"{fly} = 0.0 if d * ({off(prev, 0, 1)} - {off(prev)}) "
                f"> 0.0 else d",
            "boundary_conditions": {**bc(lap), **bc(prev)},
            "data_type": data_type,
        },
        out: {
            "computation_string":
                f"{out} = {off(prev)} - coeff{c} * "
                f"({off(flx)} - {off(flx, -1, 0)} + "
                f"{off(fly)} - {off(fly, 0, -1)})",
            "boundary_conditions": {**bc(flx), **bc(fly), **bc(prev),
                                    **bc("coeff")},
            "data_type": data_type,
        },
    }
    return kernels


def synthesize_stencil(num_stages: int = 4,
                       dimensions: Sequence[int] = (64, 64, 64),
                       shape: str = "diffusion",
                       extent: int = 1,
                       data_type: str = "float32",
                       vectorization: int = 1,
                       fork_frequency: int = 0,
                       fork_length: int = 1,
                       input_frequency: int = 0,
                       boundary: str = "constant",
                       boundary_value: float = 0.0,
                       seed_data: str = "constant:1.0") -> Dict:
    """Build a synthetic chain program dict.

    ``fork_frequency``: every N stages, fork a side chain of ``fork_length``
    stages that rejoins via addition.  ``input_frequency``: every N stages
    a fresh full-size input array is added into the chain.
    """
    num_dims = len(dimensions)
    if not 1 <= num_dims <= 3:
        raise ValueError("dimensions must be 1-3 entries")
    iters = _iterators(num_dims)
    center = _center(iters)

    def bc(field: str) -> Dict:
        return {field: {"type": boundary, "value": boundary_value}}

    inputs: Dict[str, Dict] = {
        "a": {"data": seed_data, "data_type": data_type},
    }
    program: Dict[str, Dict] = {}
    prev = "a"
    extra_inputs = 0

    if shape in ("diffusion", "hotspot") and extent != 1:
        raise ValueError(
            f"shape {shape!r} has a fixed radius-1 footprint; extent "
            "only applies to cross/box")
    if shape == "hotspot":
        if num_dims < 2:
            raise ValueError("hotspot needs >= 2 dimensions")
        inputs["power"] = {"data": "constant:0.5", "data_type": data_type}
        inputs["cap"] = {"data": 0.5, "data_type": data_type,
                         "input_dims": []}
        inputs["ct"] = {"data": 0.05, "data_type": data_type,
                        "input_dims": []}
    elif shape == "hdiff":
        if num_dims < 2:
            raise ValueError("hdiff needs >= 2 dimensions")
        if extent != 1 or fork_frequency or input_frequency:
            raise ValueError(
                "hdiff is a fixed 4-kernel block per stage; extent / "
                "fork_frequency / input_frequency do not apply")
        if seed_data == "constant:1.0":
            # constant input makes lap ≡ 0 and the limiters degenerate
            inputs["a"]["data"] = "random:0.0,1.0"
        inputs["coeff"] = {"data": "constant:0.025", "data_type": data_type}
        for s in range(num_stages):
            program.update(_hdiff_stage(s, prev, iters, data_type, bc))
            prev = f"s{s}"
        spec = {
            "inputs": inputs,
            "outputs": [prev],
            "dimensions": list(dimensions),
            "program": program,
        }
        if vectorization > 1:
            spec["vectorization"] = vectorization
        return spec

    for s in range(num_stages):
        name = f"s{s}"
        expr = _stencil_expression(name, prev, num_dims, shape, extent)
        conditions = bc(prev)
        if shape == "hotspot":
            conditions.update(bc("power"))
        if input_frequency and s > 0 and s % input_frequency == 0:
            extra_inputs += 1
            iname = f"in{extra_inputs}"
            inputs[iname] = {"data": f"constant:{0.1 * extra_inputs:.2f}",
                             "data_type": data_type}
            expr += f" + {iname}{center}"
            conditions.update(bc(iname))
        if fork_frequency and s > 0 and s % fork_frequency == 0:
            fork_prev = prev
            for f in range(fork_length):
                fname = f"f{s}_{f}"
                fexpr = _stencil_expression(fname, fork_prev, num_dims,
                                            "diffusion", 1)
                program[fname] = {
                    "computation_string": fexpr,
                    "boundary_conditions": bc(fork_prev),
                    "data_type": data_type,
                }
                fork_prev = fname
            expr += f" + {fork_prev}{center}"
            conditions.update(bc(fork_prev))
        program[name] = {
            "computation_string": expr,
            "boundary_conditions": conditions,
            "data_type": data_type,
        }
        prev = name

    spec = {
        "inputs": inputs,
        "outputs": [prev],
        "dimensions": list(dimensions),
        "program": program,
    }
    if vectorization > 1:
        spec["vectorization"] = vectorization
    return spec


def jacobi(num_dims: int, size: int, iterations: int = 1,
           data_type: str = "float32", vectorization: int = 1,
           boundary: str = "constant") -> Dict:
    """Canonical jacobi2d/jacobi3d iteration-chain workloads
    (the reference's headline benchmarks, test/stencils/jacobi*.json)."""
    return synthesize_stencil(
        num_stages=iterations,
        dimensions=(size,) * num_dims,
        shape="diffusion",
        data_type=data_type,
        vectorization=vectorization,
        boundary=boundary,
    )
