"""SDFG-file ingestion tests (VERDICT r1 missing #1, r2 next #3).

Builds serialized SDFGs in dace's JSON layout — Stencil library nodes
with the reference's property set (stencil/stencil.py:11-59: shape,
accesses with dim masks, output_fields, btype boundary conditions,
relative-offset code), spread over states including a nested SDFG and a
repeated write — and imports them without a dace dependency.
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

import stencilflow_tpu as sft
from stencilflow_tpu.frontend.sdfg_import import sdfg_to_program

SHAPE = [4, 8, 8]


def _stencil_node(label, accesses, out, bcs, code, shape=None):
    return {"type": "LibraryNode",
            "classpath": "stencilflow.stencil.stencil.Stencil",
            "attributes": {
                "label": label,
                "shape": shape if shape is not None else SHAPE,
                "accesses": accesses,
                "output_fields": {out: None},
                "boundary_conditions": bcs,
                "code": {"string_data": code, "language": "Python"},
            }}


def _cosmoish_sdfg():
    full = [True, True, True]
    return {
        "type": "SDFG",
        "attributes": {"name": "cosmoish_sdfg", "_arrays": {
            "a": {"attributes": {"dtype": "float32", "shape": SHAPE}},
            "lap": {"attributes": {"dtype": "float32", "shape": SHAPE}},
            "b": {"attributes": {"dtype": "float32", "shape": SHAPE}}}},
        "nodes": [
            {"type": "SDFGState", "nodes": [_stencil_node(
                "lap_node",
                {"a": [full, [[0, -1, 0], [0, 1, 0], [0, 0, -1],
                              [0, 0, 1], [0, 0, 0]]]},
                "lap", {"a": {"btype": "constant", "value": 0.0}},
                "lap = a[0,-1,0] + a[0,1,0] + a[0,0,-1] + a[0,0,1] "
                "- 4.0*a[0,0,0]")]},
            # second stage inside a NESTED SDFG (the reference's COSMO
            # programs nest heavily, sdfg_to_stencilflow.py:555-588)
            {"type": "SDFGState", "nodes": [
                {"type": "NestedSDFG", "attributes": {"sdfg": {
                    "type": "SDFG", "attributes": {},
                    "nodes": [{"type": "SDFGState", "nodes": [
                        _stencil_node(
                            "b_node",
                            {"a": [full, [[0, 0, 0]]],
                             "lap": [full, [[0, 0, 0]]]},
                            "b",
                            {"lap": {"btype": "constant", "value": 0.0},
                             "a": {"btype": "constant", "value": 0.0}},
                            "b = a[0,0,0] + 0.1 * lap[0,0,0]")]}]}}}]},
            # repeated write of b: exercises SSA versioning on import
            {"type": "SDFGState", "nodes": [_stencil_node(
                "b_update",
                {"b": [full, [[0, -1, 0], [0, 1, 0], [0, 0, 0]]]},
                "b", {"b": {"btype": "constant", "value": 0.0}},
                "b = b[0,0,0] + 0.1*(b[0,-1,0] + b[0,1,0] "
                "- 2.0*b[0,0,0])")]},
        ],
    }


def test_import_nested_and_versioned(tmp_path):
    path = tmp_path / "cosmoish.sdfg"
    path.write_text(json.dumps(_cosmoish_sdfg()))
    p = sdfg_to_program(str(path))
    assert p.name == "cosmoish_sdfg"
    assert p.dimensions == (4, 8, 8)
    assert list(p.kernels) == ["lap", "b__1", "b"]
    assert p.outputs == ["b"]
    out = sft.run_interpreter(p, sft.load_input_arrays(p, seed=0))

    ops = [
        ("lap", "lap = a[i,j-1,k] + a[i,j+1,k] + a[i,j,k-1] + "
                "a[i,j,k+1] - 4.0*a[i,j,k]",
         {"a": {"type": "constant", "value": 0.0}}),
        ("b", "b = a[i,j,k] + 0.1 * lap[i,j,k]",
         {"lap": {"type": "constant", "value": 0.0},
          "a": {"type": "constant", "value": 0.0}}),
        ("b", "b = b[i,j,k] + 0.1*(b[i,j-1,k] + b[i,j+1,k] "
              "- 2.0*b[i,j,k])",
         {"b": {"type": "constant", "value": 0.0}}),
    ]
    p2 = sft.program_from_op_list(
        ops, (4, 8, 8),
        {"a": {"data": "constant:1.0", "data_type": "float32"}},
        outputs=["b"], name="hand")
    out2 = sft.run_interpreter(p2, sft.load_input_arrays(p2, seed=0))
    np.testing.assert_array_equal(np.asarray(out["b"]),
                                  np.asarray(out2["b"]))


def test_import_lower_rank_access_and_dims_override(tmp_path):
    sdfg = {
        "type": "SDFG", "attributes": {"name": "lowrank"},
        "nodes": [{"type": "SDFGState", "nodes": [_stencil_node(
            "s", {"a": [[True, True, True], [[0, 0, 0], [0, 0, 1]]],
                  "row": [[False, False, True], [[0], [-1]]]},
            "out", {"a": {"btype": "constant", "value": 0.5},
                    "row": {"btype": "constant", "value": 0.0}},
            "out = a[0,0,0] + a[0,0,1] * row[0] + row[-1]",
            shape=["I", "J", "K"])]}],   # symbolic: needs dimensions=
    }
    path = tmp_path / "lowrank.sdfg"
    path.write_text(json.dumps(sdfg))
    with pytest.raises(ValueError, match="dimensions"):
        sdfg_to_program(str(path))
    p = sdfg_to_program(str(path), dimensions=(4, 6, 8),
                        input_data="random:-1,1")
    assert p.inputs["row"].dim_mask == (False, False, True)
    ins = sft.load_input_arrays(p, seed=0)
    out = np.asarray(sft.run_interpreter(p, ins)["out"])
    a = ins["a"].reshape(4, 6, 8)
    row = ins["row"].reshape(8)
    shifted = np.concatenate([a[:, :, 1:],
                              np.full((4, 6, 1), 0.5, np.float32)], 2)
    rshift = np.concatenate([[0.0], row[:-1]]).astype(np.float32)
    exp = a + shifted * row + rshift
    np.testing.assert_allclose(out, exp, rtol=1e-6)


def test_cli_import_sdfg_round_trip(tmp_path):
    path = tmp_path / "c.sdfg"
    path.write_text(json.dumps(_cosmoish_sdfg()))
    out_json = tmp_path / "c.json"
    r = subprocess.run(
        [sys.executable, "-m", "stencilflow_tpu.cli", "import-sdfg",
         str(path), "-o", str(out_json)],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr
    p = sft.parse_program(str(out_json))
    assert list(p.kernels) == ["lap", "b__1", "b"]
    # imported dialect runs on the streaming backend
    from stencilflow_tpu.backend.stream import run_chain_stream
    ins = sft.load_input_arrays(p, seed=0)
    ref = sft.run_interpreter(p, ins)
    got = run_chain_stream(p, ins, interpret=True)
    np.testing.assert_allclose(np.asarray(got["b"]),
                               np.asarray(ref["b"]), rtol=3e-6,
                               atol=1e-7)


def test_missing_input_bc_defaults_to_output_bc():
    """A read field with a None/absent BC inherits the OUTPUT
    connector's BC — the reference's defaulting rule
    (sdfg_to_stencilflow.py:681-685)."""
    full = [True, True, True]
    sdfg = {
        "type": "SDFG", "attributes": {"name": "bcdef"},
        "nodes": [{"type": "SDFGState", "nodes": [_stencil_node(
            "s", {"a": [full, [[0, 0, 0], [0, 1, 0]]]},
            "out",
            {"a": None, "out": {"btype": "constant", "value": 2.5}},
            "out = a[0,0,0] + a[0,1,0]")]}],
    }
    p = sdfg_to_program(sdfg, input_data="constant:1.0",
                        dimensions=(4, 8, 8))
    bc = p.kernels["out"].boundary_conditions["a"]
    assert bc.kind.name == "CONSTANT" and bc.value == 2.5
    out = np.asarray(sft.run_interpreter(
        p, sft.load_input_arrays(p, seed=0))["out"]).reshape(4, 8, 8)
    assert out[0, 7, 0] == 3.5      # j+1 read fell off: 1.0 + 2.5
    assert out[0, 3, 0] == 2.0


def test_no_stencil_nodes_raises(tmp_path):
    path = tmp_path / "empty.sdfg"
    path.write_text(json.dumps({"type": "SDFG", "attributes": {},
                                "nodes": []}))
    with pytest.raises(ValueError, match="no Stencil"):
        sdfg_to_program(str(path))


def test_control_flow_loop_rejected(tmp_path):
    """A state-machine back edge is rejected, matching the reference
    (RemoveLoop then error, sdfg_to_stencilflow.py:281-284)."""
    sdfg = _cosmoish_sdfg()
    sdfg["edges"] = [{"src": "0", "dst": "1"}, {"src": "1", "dst": "2"},
                     {"src": "2", "dst": "1"}]   # back edge 2 -> 1
    path = tmp_path / "loop.sdfg"
    path.write_text(json.dumps(sdfg))
    with pytest.raises(ValueError, match="control-flow loop"):
        sdfg_to_program(str(path))
    # forward-only edges still import
    sdfg["edges"] = [{"src": "0", "dst": "1"}, {"src": "1", "dst": "2"}]
    path.write_text(json.dumps(sdfg))
    assert sdfg_to_program(str(path)).name == "cosmoish_sdfg"


def test_mixed_rank_dimension_inference(tmp_path):
    """Shapes of different ranks align by TRAILING dims when inferring
    the global domain (a 2-D field spans (j, k)): [4,8,8] + [8,8] must
    give [4,8,8], not fold the 2-D J into the i extent."""
    full = [True, True, True]
    jk = [False, True, True]
    sdfg = {
        "type": "SDFG",
        "attributes": {"name": "mixedrank", "_arrays": {
            "a": {"attributes": {"dtype": "float32", "shape": SHAPE}},
            "m": {"attributes": {"dtype": "float32", "shape": [8, 8]}},
            "o": {"attributes": {"dtype": "float32", "shape": SHAPE}}}},
        "nodes": [{"type": "SDFGState", "nodes": [_stencil_node(
            "o_node",
            {"a": [full, [[0, 0, 0]]], "m": [jk, [[0, 0]]]},
            "o", {"a": {"btype": "constant", "value": 0.0},
                  "m": {"btype": "constant", "value": 0.0}},
            "o = a[0,0,0] + m[0,0]")]}],
    }
    path = tmp_path / "mixed.sdfg"
    path.write_text(json.dumps(sdfg))
    p = sdfg_to_program(str(path))
    assert tuple(p.raw_dimensions) == (4, 8, 8)
    inputs = sft.load_input_arrays(p, seed=0)
    out = sft.run_interpreter(p, inputs)
    assert np.asarray(out[p.outputs[0]]).shape == (4, 8, 8)


def test_non_integer_offset_left_symbolic(tmp_path):
    """A negative non-integer subscript constant must not crash the
    indexer (both signs take the leave-as-is path and the import then
    fails with a clear parse error, not a %+d format crash)."""
    import ast

    from stencilflow_tpu.frontend.sdfg_import import _AbsoluteIndexer
    tree = ast.parse("x = f[0, -1.5, 0]")
    # must not raise ValueError('Unknown format code d...')
    new = _AbsoluteIndexer({"f": (True, True, True)}).visit(tree)
    code = ast.unparse(new)
    assert "-1.5" in code   # left as-is, exactly like +1.5


FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "hdiff.sdfg")


def test_hdiff_fixture_import_vs_oracle():
    """The committed COSMO-hdiff SDFG fixture (DaCe serialization layout:
    access-node memlet graphs, connector names != array names, scalar-
    transient tasklet, constant stencil, unused transient sink, transient
    flags, multi-state repeated write) imports and matches a hand-written
    dialect oracle exactly (VERDICT r2 next #3)."""
    p = sdfg_to_program(FIXTURE, input_data="random:-1,1")
    assert p.name == "hdiff"
    assert tuple(p.raw_dimensions) == (8, 32, 32)
    # graph-resolved names, constants folded, dbg sink dropped
    assert sorted(p.inputs) == ["inp"]
    assert p.outputs == ["out_field"]
    assert list(p.kernels) == ["lap", "fly", "flx", "out_field__1",
                               "out_field"]
    out = sft.run_interpreter(p, sft.load_input_arrays(p, seed=3))

    cbc = {"type": "constant", "value": 0.0}
    ops = [
        ("lap", "lap = 4.0 * inp[i,j,k] - (inp[i,j-1,k] + inp[i,j+1,k]"
                " + inp[i,j,k-1] + inp[i,j,k+1])", {"inp": cbc}),
        ("fly", "fly = lap[i,j,k+1] - lap[i,j,k]; "
                "fly = 0.0 if fly * (inp[i,j,k+1] - inp[i,j,k]) > 0.0 "
                "else fly", {"lap": cbc, "inp": cbc}),
        ("flx", "flx = lap[i,j+1,k] - lap[i,j,k]; "
                "flx = 0.0 if flx * (inp[i,j+1,k] - inp[i,j,k]) > 0.0 "
                "else flx", {"lap": cbc, "inp": cbc}),
        ("out_field", "out_field = inp[i,j,k] - 0.025 * (flx[i,j,k] - "
                      "flx[i,j-1,k] + fly[i,j,k] - fly[i,j,k-1])",
         {"inp": cbc, "flx": cbc, "fly": cbc}),
        ("out_field", "out_field = 0.25 * (out_field[i,j-1,k] + "
                      "out_field[i,j+1,k]) + 0.5 * out_field[i,j,k]",
         {"out_field": cbc}),
    ]
    p2 = sft.program_from_op_list(
        ops, (8, 32, 32),
        {"inp": {"data": "random:-1,1", "data_type": "float32"}},
        outputs=["out_field"], name="hand_hdiff")
    out2 = sft.run_interpreter(p2, sft.load_input_arrays(p2, seed=3))
    np.testing.assert_array_equal(np.asarray(out["out_field"]),
                                  np.asarray(out2["out_field"]))


def test_hdiff_fixture_cli_and_backends(tmp_path):
    """cli import-sdfg on the fixture -> dialect JSON -> oracle-exact
    runs on the stream backend and the CLI driver."""
    out_json = tmp_path / "hdiff.json"
    r = subprocess.run(
        [sys.executable, "-m", "stencilflow_tpu.cli", "import-sdfg",
         FIXTURE, "-o", str(out_json), "--input-data", "random:-1,1"],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr
    p = sft.parse_program(str(out_json))
    inputs = sft.load_input_arrays(p, seed=1)
    ref = np.asarray(
        sft.run_interpreter(p, inputs)["out_field"], np.float64)
    from stencilflow_tpu.backend.stream import run_chain_stream
    got = run_chain_stream(p, inputs, interpret=True)["out_field"]
    np.testing.assert_allclose(got, ref, rtol=3e-5, atol=1e-6)


def test_fixture_generator_is_deterministic(tmp_path):
    """The committed fixture matches its committed generator (so edits
    to either cannot drift apart silently)."""
    import importlib.util
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "make_hdiff_sdfg", os.path.join(root, "scripts",
                                        "make_hdiff_sdfg.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    with open(FIXTURE) as f:
        committed = json.load(f)
    assert mod.build() == committed
