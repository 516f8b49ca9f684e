"""Frontend tests: JSON parsing, expression IR, chain graph, analyses.

Mirrors the reference's unit-test strategy
(/root/reference/test/test_stencilflow.py:17-162) at the level of our typed
IR: index canonicalization, dimension padding, buffer/delay analysis values.
"""
import numpy as np
import pytest

import stencilflow_tpu as sft
from stencilflow_tpu import ir
from stencilflow_tpu.frontend.analysis import flatten_index
from stencilflow_tpu.synthesize import jacobi, synthesize_stencil

JACOBI2D = {
    "inputs": {"a": {"data": "constant:1.0", "data_type": "float32"}},
    "outputs": ["b"],
    "dimensions": [128, 128],
    "program": {
        "b": {
            "computation_string":
                "b = 0.25 * (a[j-1,k] + a[j+1,k] + a[j,k-1] + a[j,k+1])",
            "boundary_conditions": {
                "a": {"type": "constant", "value": 0.0}},
            "data_type": "float32",
        }
    },
}

VARYING_DIM = {
    "inputs": {
        "in0d": {"data": 0.1, "data_type": "float64", "input_dims": []},
        "in1d": {"data": "constant:0.2", "data_type": "float32",
                 "input_dims": ["k"]},
        "in2d": {"data": "constant:0.3", "data_type": "float32",
                 "input_dims": ["i", "k"]},
        "in3d": {"data": "constant:0.4", "data_type": "float64",
                 "input_dims": ["i", "j", "k"]},
    },
    "outputs": ["out"],
    "dimensions": [8, 16, 32],
    "program": {
        "out": {
            "computation_string":
                "out = in0d + in1d[k] + in1d[k+4] + in2d[i, k] "
                "+ in2d[i+1, k] + in3d[i, j, k] + in3d[i+1, j+1, k+1]",
            "boundary_conditions": {
                "in0d": {"type": "constant", "value": 1.0},
                "in1d": {"type": "constant", "value": 1.0},
                "in2d": {"type": "constant", "value": 1.0},
                "in3d": {"type": "constant", "value": 1.0},
            },
            "data_type": "float32",
        }
    },
}


class TestParser:
    def test_dimension_padding_2d(self):
        p = sft.parse_program(JACOBI2D, name="jacobi2d")
        assert p.dimensions == (1, 128, 128)
        assert p.raw_dimensions == (128, 128)
        accs = p.kernels["b"].accesses()
        # 2-D program: input spans (j, k) only -> None in dim i
        assert set(accs["a"]) == {(None, -1, 0), (None, 1, 0),
                                  (None, 0, -1), (None, 0, 1)}

    def test_dimension_padding_1d(self):
        p = sft.parse_program({
            "inputs": {"a": {"data": "constant:1.0",
                             "data_type": "float32"}},
            "outputs": ["b"],
            "dimensions": [64],
            "program": {"b": {
                "computation_string": "b = a[k-1] + a[k+1]",
                "boundary_conditions": {
                    "a": {"type": "constant", "value": 0.0}},
                "data_type": "float32"}},
        })
        assert p.dimensions == (1, 1, 64)
        accs = p.kernels["b"].accesses()
        assert set(accs["a"]) == {(None, None, -1), (None, None, 1)}

    def test_varying_dimensionality_masks(self):
        p = sft.parse_program(VARYING_DIM, name="vdim")
        accs = p.kernels["out"].accesses()
        assert accs["in0d"] == [(None, None, None)]
        assert set(accs["in1d"]) == {(None, None, 0), (None, None, 4)}
        assert set(accs["in2d"]) == {(0, None, 0), (1, None, 0)}
        assert set(accs["in3d"]) == {(0, 0, 0), (1, 1, 1)}

    def test_multi_statement_and_ternary(self):
        p = sft.parse_program({
            "inputs": {"x": {"data": "constant:2.0",
                             "data_type": "float64"}},
            "outputs": ["y"],
            "dimensions": [4, 4],
            "program": {"y": {
                "computation_string":
                    "T = x[j,k] * 2.0; res = T if x[j,k] > 1.0 else -T;",
                "boundary_conditions": {
                    "x": {"type": "constant", "value": 0.0}},
                "data_type": "float64"}},
        })
        kspec = p.kernels["y"]
        assert len(kspec.statements) == 2
        assert kspec.output_statement.lhs == "res"
        assert isinstance(kspec.output_statement.rhs, ir.Select)

    def test_constants_section(self):
        p = sft.parse_program({
            "inputs": {"x": {"data": "constant:1.0",
                             "data_type": "float32"}},
            "outputs": ["y"],
            "dimensions": [4],
            "constants": {"alpha": {"value": "0.5",
                                    "data_type": "float32"}},
            "program": {"y": {
                "computation_string": "y = alpha * x[k]",
                "boundary_conditions": {
                    "x": {"type": "constant", "value": 0.0}},
                "data_type": "float32"}},
        })
        rhs = p.kernels["y"].output_statement.rhs
        assert isinstance(rhs, ir.BinOp) and isinstance(rhs.left, ir.Const)
        assert rhs.left.value == 0.5

    def test_vectorization_must_divide(self):
        bad = dict(JACOBI2D, vectorization=7)
        with pytest.raises(ValueError, match="vectorization"):
            sft.parse_program(bad)

    def test_undefined_field_rejected(self):
        bad = {
            "inputs": {}, "outputs": ["y"], "dimensions": [4],
            "program": {"y": {
                "computation_string": "y = ghost[k]",
                "boundary_conditions": {},
                "data_type": "float32"}},
        }
        with pytest.raises(ValueError, match="undefined field"):
            sft.parse_program(bad)

    def test_size_one_leading_dim(self):
        # reference's pruning faults on this shape; we must handle it
        p = sft.parse_program({
            "inputs": {"w": {"data": "constant:1.0",
                             "data_type": "float64"}},
            "outputs": ["o"],
            "dimensions": [1, 3, 3],
            "program": {"o": {
                "computation_string":
                    "o = 0.25 * (w[i,j,k+1] + w[i,j,k-1] "
                    "+ w[i,j+1,k] + w[i,j-1,k])",
                "boundary_conditions": {
                    "w": {"type": "constant", "value": 0.0}},
                "data_type": "float64"}},
        })
        accs = p.kernels["o"].accesses()
        assert (0, 0, 1) in accs["w"] and (0, -1, 0) in accs["w"]


class TestChainGraph:
    def test_topological_order(self):
        spec = synthesize_stencil(num_stages=4, dimensions=(8, 8))
        p = sft.parse_program(spec, name="chain4")
        g = sft.ChainGraph.build(p)
        order = g.kernel_order
        assert order.index("s0") < order.index("s1") < order.index("s3")

    def test_fork_join(self):
        spec = synthesize_stencil(num_stages=4, dimensions=(8, 8),
                                  fork_frequency=2, fork_length=2)
        p = sft.parse_program(spec, name="forked")
        g = sft.ChainGraph.build(p)
        # fork stages feed back into the main chain
        assert "f2_1" in g.producers("s2")
        assert "s1" in g.producers("f2_0")

    def test_cycle_detection(self):
        spec = {
            "inputs": {"a": {"data": "constant:1.0",
                             "data_type": "float32"}},
            "outputs": ["u"],
            "dimensions": [4],
            "program": {
                "u": {"computation_string": "u = v[k] + a[k]",
                      "boundary_conditions": {
                          "v": {"type": "constant", "value": 0.0},
                          "a": {"type": "constant", "value": 0.0}},
                      "data_type": "float32"},
                "v": {"computation_string": "v = u[k]",
                      "boundary_conditions": {
                          "u": {"type": "constant", "value": 0.0}},
                      "data_type": "float32"},
            },
        }
        p = sft.parse_program(spec, name="cyclic")
        with pytest.raises(sft.CycleError):
            sft.ChainGraph.build(p)

    def test_enumerate_cuts(self):
        spec = synthesize_stencil(num_stages=3, dimensions=(8, 8))
        p = sft.parse_program(spec, name="chain3")
        g = sft.ChainGraph.build(p)
        cuts = list(g.enumerate_cuts())
        # for a linear chain of 3 kernels: {s0}, {s0,s1}
        assert frozenset({"s0"}) in cuts
        assert frozenset({"s0", "s1"}) in cuts
        assert frozenset({"s1"}) not in cuts
        assert len(cuts) == 2


class TestAnalysis:
    def test_internal_buffer_size_jacobi3d(self):
        p = sft.parse_program(jacobi(3, 32), name="j3d")
        a = sft.ChainAnalysis.run(p)
        info = a.kernel_accesses["s0"]["a"]
        assert info.min_offsets == (-1, -1, -1)
        assert info.max_offsets == (1, 1, 1)
        # span (2,2,2) flattened over 32^3: 2*32*32 + 2*32 + 2
        assert info.buffer_size == 2 * 32 * 32 + 2 * 32 + 2

    def test_vectorization_widens_fastest_dim(self):
        p = sft.parse_program(jacobi(3, 32, vectorization=4), name="j3dv")
        a = sft.ChainAnalysis.run(p)
        info = a.kernel_accesses["s0"]["a"]
        assert info.buffer_extent == (2, 2, 2 + 3)

    def test_delay_buffers_align_fork(self):
        # s0 -> s1 -> s2 and s0 -> s2: the short edge must absorb the skew
        spec = {
            "inputs": {"a": {"data": "constant:1.0",
                             "data_type": "float32"}},
            "outputs": ["s2"],
            "dimensions": [16, 16],
            "program": {
                "s0": {"computation_string": "s0 = a[j,k] * 2.0",
                       "boundary_conditions": {
                           "a": {"type": "constant", "value": 0.0}},
                       "data_type": "float32"},
                "s1": {"computation_string":
                           "s1 = s0[j,k-1] + s0[j,k+1]",
                       "boundary_conditions": {
                           "s0": {"type": "constant", "value": 0.0}},
                       "data_type": "float32"},
                "s2": {"computation_string": "s2 = s1[j,k] + s0[j,k]",
                       "boundary_conditions": {
                           "s1": {"type": "constant", "value": 0.0},
                           "s0": {"type": "constant", "value": 0.0}},
                       "data_type": "float32"},
            },
        }
        p = sft.parse_program(spec, name="forkskew")
        a = sft.ChainAnalysis.run(p)
        short = a.edges[("s0", "s2")]
        long = a.edges[("s1", "s2")]
        assert short.delay_size > long.delay_size
        # the skew difference equals s1's contribution minus s0's
        diff = short.delay_size - long.delay_size
        c_s0 = a.arrival["s1"]  # contribution of s0 == arrival at s1
        expected = (flatten_index(
            tuple(x - y for x, y in zip(a.arrival["s2"], c_s0)),
            p.dimensions))
        assert diff == expected

    def test_deep_chain_delay_is_one(self):
        p = sft.parse_program(jacobi(3, 32, iterations=3), name="j3d3")
        a = sft.ChainAnalysis.run(p)
        # single-predecessor edges need only the +1 processing-cycle delay
        assert a.edges[("s0", "s1")].delay_size == 1
        assert a.edges[("s1", "s2")].delay_size == 1

    def test_critical_path_and_lower_bound(self):
        p = sft.parse_program(jacobi(3, 32, iterations=8), name="j3d8")
        a = sft.ChainAnalysis.run(p)
        assert a.critical_path_cycles > 0
        rlb = a.runtime_lower_bound()
        assert rlb == (32 ** 3 + a.critical_path_cycles)

    def test_operation_counts(self):
        p = sft.parse_program(JACOBI2D, name="j2d")
        a = sft.ChainAnalysis.run(p)
        ops = a.operation_counts()
        assert ops["add"] == (3, 3 * 128 * 128)
        assert ops["mult"] == (1, 128 * 128)

    def test_communication_volume(self):
        p = sft.parse_program(VARYING_DIM, name="vdim")
        a = sft.ChainAnalysis.run(p)
        expected = (8 + 32 * 4 + 8 * 32 * 4 + 8 * 16 * 32 * 8  # inputs
                    + 8 * 16 * 32 * 4)                         # output
        assert a.minimum_communication_volume() == expected

    def test_stage_halo_accumulates(self):
        p = sft.parse_program(jacobi(2, 64, iterations=3), name="j2d3")
        a = sft.ChainAnalysis.run(p)
        halo = a.stage_halo()
        assert halo["s2"] == (0, 0, 0)   # final stage: no consumer
        assert halo["s1"] == (0, 1, 1)
        assert halo["s0"] == (0, 2, 2)
        ih = a.input_halo()
        assert ih["a"] == (0, 3, 3)
