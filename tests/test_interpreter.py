"""Interpreter (oracle) tests with independently hand-computed expectations.

Covers the BC semantics of the reference CPU backend (cpu.py:58-102):
constant / copy / shrink, lower-dimensional inputs, multi-statement kernels,
ternaries, fork/join chains, and numpy-vs-JAX agreement.
"""
import jax.numpy as jnp
import numpy as np
import pytest

import stencilflow_tpu as sft
from stencilflow_tpu.synthesize import jacobi, synthesize_stencil


def jacobi2d_step(a, bval=0.0):
    """Independent numpy jacobi2d with constant-boundary padding."""
    p = np.pad(a, 1, constant_values=bval)
    return 0.25 * (p[:-2, 1:-1] + p[2:, 1:-1] + p[1:-1, :-2] + p[1:-1, 2:])


def jacobi3d_step(a, bval=0.0):
    p = np.pad(a, 1, constant_values=bval)
    c = (1.0 / 6.0)
    return np.float32(c) * (
        p[:-2, 1:-1, 1:-1] + p[2:, 1:-1, 1:-1] +
        p[1:-1, :-2, 1:-1] + p[1:-1, 2:, 1:-1] +
        p[1:-1, 1:-1, :-2] + p[1:-1, 1:-1, 2:])


class TestConstantBC:
    def test_jacobi2d_matches_numpy(self):
        rng = np.random.default_rng(42)
        a = rng.random((16, 16)).astype(np.float32)
        p = sft.parse_program({
            "inputs": {"a": {"data": a, "data_type": "float32"}},
            "outputs": ["b"],
            "dimensions": [16, 16],
            "program": {"b": {
                "computation_string":
                    "b = 0.25 * (a[j-1,k] + a[j+1,k] + a[j,k-1] + a[j,k+1])",
                "boundary_conditions": {
                    "a": {"type": "constant", "value": 0.0}},
                "data_type": "float32"}},
        }, name="j2d")
        out = sft.run_interpreter(p, {"a": a})["b"]
        np.testing.assert_allclose(out, jacobi2d_step(a), rtol=1e-6)

    def test_nonzero_boundary_value(self):
        a = np.ones((8, 8), dtype=np.float64)
        p = sft.parse_program({
            "inputs": {"a": {"data": a, "data_type": "float64"}},
            "outputs": ["b"],
            "dimensions": [8, 8],
            "program": {"b": {
                "computation_string": "b = a[j-1,k] + a[j+1,k]",
                "boundary_conditions": {
                    "a": {"type": "constant", "value": 7.0}},
                "data_type": "float64"}},
        })
        out = sft.run_interpreter(p, {"a": a})["b"]
        assert out[0, 0] == 8.0  # 7 (OOB above) + 1
        assert out[4, 4] == 2.0

    def test_deep_chain(self):
        rng = np.random.default_rng(1)
        a = rng.random((12, 12, 12)).astype(np.float32)
        p = sft.parse_program(jacobi(3, 12, iterations=4), name="j3d4")
        out = sft.run_interpreter(p, {"a": a})["s3"]
        expected = a
        for _ in range(4):
            expected = np.float32(0.16666667) * (
                np.pad(expected, 1)[: -2, 1:-1, 1:-1]
                + np.pad(expected, 1)[2:, 1:-1, 1:-1]
                + np.pad(expected, 1)[1:-1, :-2, 1:-1]
                + np.pad(expected, 1)[1:-1, 2:, 1:-1]
                + np.pad(expected, 1)[1:-1, 1:-1, :-2]
                + np.pad(expected, 1)[1:-1, 1:-1, 2:])
        np.testing.assert_allclose(out, expected, rtol=1e-5)


class TestCopyBC:
    def test_copy_uses_center_value(self):
        # 1-D: at k=0 the read a[k-1] is OOB -> must yield a[0] (center)
        a = np.array([10.0, 20.0, 30.0, 40.0])
        p = sft.parse_program({
            "inputs": {"a": {"data": a, "data_type": "float64"}},
            "outputs": ["b"],
            "dimensions": [4],
            "program": {"b": {
                "computation_string": "b = a[k-1] + a[k+1]",
                "boundary_conditions": {
                    "a": {"type": "copy", "value": 0.0}},
                "data_type": "float64"}},
        })
        out = np.asarray(sft.run_interpreter(p, {"a": a})["b"])
        # k=0: copy(a[0]) + a[1] = 10 + 20; k=3: a[2] + copy(a[3]) = 30 + 40
        np.testing.assert_allclose(out, [30.0, 40.0, 60.0, 70.0])


class TestShrinkBC:
    def test_shrink_borders_are_junk(self):
        a = np.ones((6, 6), dtype=np.float32)
        p = sft.parse_program({
            "inputs": {"a": {"data": a, "data_type": "float32"}},
            "outputs": ["b"],
            "dimensions": [6, 6],
            "program": {"b": {
                "computation_string":
                    "b = 0.25 * (a[j-1,k] + a[j+1,k] + a[j,k-1] + a[j,k+1])",
                "boundary_conditions": {
                    "a": {"type": "shrink", "value": 0.0}},
                "data_type": "float32"}},
        })
        out = np.asarray(sft.run_interpreter(p, {"a": a})["b"])
        assert np.all(out[1:-1, 1:-1] == 1.0)
        assert out[0, 3] < -1000  # junk leaked into the border

    def test_halo_pruned_comparison(self):
        a = np.ones((6, 6), dtype=np.float32)
        p = sft.parse_program({
            "inputs": {"a": {"data": a, "data_type": "float32"}},
            "outputs": ["b"],
            "dimensions": [6, 6],
            "program": {"b": {
                "computation_string": "b = a[j-1,k] + a[j+1,k]",
                "boundary_conditions": {
                    "a": {"type": "shrink", "value": 0.0}},
                "data_type": "float32"}},
        })
        out = np.asarray(sft.run_interpreter(p, {"a": a})["b"])
        pruned = sft.prune_halo(out, (6, 6), 1)
        assert sft.arrays_are_equal(np.full((4, 4), 2.0), pruned)


class TestVaryingDimensionality:
    def test_mixed_rank_inputs(self):
        dims = (4, 6, 8)
        in0d = np.float64(0.1)
        in1d = np.full((8,), 0.2, np.float32)
        in2d = np.full((4, 8), 0.3, np.float32)
        in3d = np.full(dims, 0.4, np.float64)
        p = sft.parse_program({
            "inputs": {
                "in0d": {"data": 0.1, "data_type": "float64",
                         "input_dims": []},
                "in1d": {"data": "constant:0.2", "data_type": "float32",
                         "input_dims": ["k"]},
                "in2d": {"data": "constant:0.3", "data_type": "float32",
                         "input_dims": ["i", "k"]},
                "in3d": {"data": "constant:0.4", "data_type": "float64",
                         "input_dims": ["i", "j", "k"]},
            },
            "outputs": ["out"],
            "dimensions": list(dims),
            "program": {"out": {
                "computation_string":
                    "out = in0d + in1d[k] + in1d[k+42] + in2d[i, k] "
                    "+ in2d[i+1, k] + in3d[i, j, k] + in3d[i+1, j+1, k+1]",
                "boundary_conditions": {
                    "in0d": {"type": "constant", "value": 1.0},
                    "in1d": {"type": "constant", "value": 1.0},
                    "in2d": {"type": "constant", "value": 1.0},
                    "in3d": {"type": "constant", "value": 1.0},
                },
                "data_type": "float32"}},
        }, name="vdim")
        out = np.asarray(sft.run_interpreter(p, {
            "in0d": in0d, "in1d": in1d, "in2d": in2d, "in3d": in3d})["out"])
        # interior point (i<3, j<5, k<7): all reads in bounds except
        # in1d[k+42] which is always OOB -> 1.0
        interior = 0.1 + 0.2 + 1.0 + 0.3 + 0.3 + 0.4 + 0.4
        np.testing.assert_allclose(out[0, 0, 0], np.float32(interior),
                                   rtol=1e-6)
        # last corner: in2d[i+1,k], in3d[i+1,j+1,k+1] also OOB -> 1.0
        corner = 0.1 + 0.2 + 1.0 + 0.3 + 1.0 + 0.4 + 1.0
        np.testing.assert_allclose(out[3, 5, 7], np.float32(corner),
                                   rtol=1e-6)


class TestMultiStatement:
    def test_temporary_and_ternary(self):
        x = np.array([[0.5, 2.0], [3.0, -1.0]])
        p = sft.parse_program({
            "inputs": {"x": {"data": x, "data_type": "float64"}},
            "outputs": ["y"],
            "dimensions": [2, 2],
            "program": {"y": {
                "computation_string":
                    "T = x[j,k] * 2.0; res = T if x[j,k] > 1.0 else -T;",
                "boundary_conditions": {
                    "x": {"type": "constant", "value": 0.0}},
                "data_type": "float64"}},
        })
        out = np.asarray(sft.run_interpreter(p, {"x": x})["y"])
        np.testing.assert_allclose(out, [[-1.0, 4.0], [6.0, 2.0]])

    def test_fork_join_reconvergence(self):
        # res = kD + kA + kB + kC + arr (deep reconvergence, like the
        # reference's simulator10.json)
        arr = np.arange(6, dtype=np.float64).reshape(2, 3)
        prog = {"inputs": {"arrA": {"data": arr, "data_type": "float64"}},
                "outputs": ["res"], "dimensions": [2, 3], "program": {}}
        prev = "arrA"
        for k in ["kA", "kB", "kC"]:
            prog["program"][k] = {
                "computation_string": f"{k} = {prev}[j,k]",
                "boundary_conditions": {
                    prev: {"type": "constant", "value": 0.0}},
                "data_type": "float64"}
            prev = k
        prog["program"]["kD"] = {
            "computation_string": "kD = kC[j,k] + 1.0",
            "boundary_conditions": {
                "kC": {"type": "constant", "value": 0.0}},
            "data_type": "float64"}
        prog["program"]["res"] = {
            "computation_string":
                "res = kD[j,k] + kA[j,k] + kB[j,k] + kC[j,k] + arrA[j,k]",
            "boundary_conditions": {
                f: {"type": "constant", "value": 0.0}
                for f in ["kD", "kA", "kB", "kC", "arrA"]},
            "data_type": "float64"}
        p = sft.parse_program(prog, name="fork10")
        out = np.asarray(sft.run_interpreter(p, {"arrA": arr})["res"])
        np.testing.assert_allclose(out, 5 * arr + 1.0)


class TestCalls:
    def test_transcendentals(self):
        x = np.linspace(0.1, 1.0, 8)
        p = sft.parse_program({
            "inputs": {"x": {"data": x, "data_type": "float64"}},
            "outputs": ["y"],
            "dimensions": [8],
            "program": {"y": {
                "computation_string":
                    "y = sin(x[k]) + cos(x[k]) + sqrt(x[k]) "
                    "+ max(x[k], 0.5)",
                "boundary_conditions": {
                    "x": {"type": "constant", "value": 0.0}},
                "data_type": "float64"}},
        })
        out = np.asarray(sft.run_interpreter(p, {"x": x})["y"])
        expected = np.sin(x) + np.cos(x) + np.sqrt(x) + np.maximum(x, 0.5)
        np.testing.assert_allclose(out, expected, rtol=1e-12)


class TestJaxAgreement:
    @pytest.mark.parametrize("shape,ndims", [("diffusion", 2), ("cross", 3),
                                             ("box", 2), ("hotspot", 2)])
    def test_numpy_vs_jax(self, shape, ndims):
        spec = synthesize_stencil(num_stages=3,
                                  dimensions=(12,) * ndims,
                                  shape=shape,
                                  data_type="float32",
                                  fork_frequency=2)
        p = sft.parse_program(spec, name=f"x_{shape}{ndims}")
        inputs = sft.load_input_arrays(p)
        out_np = sft.run_interpreter(p, inputs, xp=np)
        out_jx = sft.run_interpreter(p, inputs, xp=jnp)
        for k in out_np:
            np.testing.assert_allclose(np.asarray(out_jx[k]), out_np[k],
                                       rtol=1e-6)

    def test_jit_whole_chain(self):
        import jax
        p = sft.parse_program(jacobi(3, 8, iterations=2), name="jit2")
        interp = sft.ChainInterpreter(p, xp=jnp)
        f = jax.jit(lambda a: interp({"a": a})["s1"])
        a = np.ones((8, 8, 8), np.float32)
        out = np.asarray(f(a))
        expected = jacobi3d_step(jacobi3d_step(a))
        np.testing.assert_allclose(out, expected, rtol=1e-5)


class TestDataLoading:
    def test_constant_and_random(self, tmp_path):
        p = sft.parse_program(jacobi(2, 8), name="dl")
        arrays = sft.load_input_arrays(p)
        assert arrays["a"].shape == (8, 8)
        assert np.all(arrays["a"] == 1.0)

    def test_dat_roundtrip(self, tmp_path):
        arr = np.arange(64, dtype=np.float32)
        path = str(tmp_path / "x.dat")
        sft.save_array(arr, path)
        spec = {
            "inputs": {"x": {"data": path, "data_type": "float32"}},
            "outputs": ["y"],
            "dimensions": [8, 8],
            "program": {"y": {
                "computation_string": "y = x[j,k]",
                "boundary_conditions": {
                    "x": {"type": "constant", "value": 0.0}},
                "data_type": "float32"}},
        }
        p = sft.parse_program(spec, name="roundtrip")
        arrays = sft.load_input_arrays(p)
        np.testing.assert_array_equal(arrays["x"],
                                      arr.reshape(8, 8))

    def test_arrays_are_equal_tolerance(self):
        a = np.ones(10)
        b = a * (1 + 5e-6)
        assert sft.arrays_are_equal(a, b)
        assert not sft.arrays_are_equal(a, a * 1.1)

    def test_arrays_are_equal_negative_values(self):
        # Regression: the reference's formula (helper.py:261-276) divides by
        # max(ref, res) without abs, so for negative outputs the relative
        # diff is negative and any wrong result passes vacuously.  Ours must
        # reject a 10% error regardless of sign.
        a = -np.ones(10)
        assert sft.arrays_are_equal(a, a * (1 + 5e-6))
        assert not sft.arrays_are_equal(a, a * 1.1)
        assert not sft.arrays_are_equal(a, a + 0.5)
        mixed = np.linspace(-1.0, 1.0, 16)
        assert not sft.arrays_are_equal(mixed, mixed - 0.1)

    def test_driver_verification_rejects_negative_wrong_result(self):
        # End-to-end: a chain whose output is ~ -1 everywhere, with an
        # injected error, must fail compare_to_reference.
        spec = {
            "inputs": {"x": {"data": "constant:1.0", "data_type": "float64"}},
            "outputs": ["y"],
            "dimensions": [8, 8],
            "program": {"y": {
                "computation_string": "y = -x[j,k]",
                "boundary_conditions": {
                    "x": {"type": "constant", "value": 0.0}},
                "data_type": "float64"}},
        }
        p = sft.parse_program(spec, name="neg_out")
        arrays = sft.load_input_arrays(p)
        ref = sft.run_interpreter(p, arrays)
        assert np.all(np.asarray(ref["y"]) == -1.0)
        wrong = {"y": np.asarray(ref["y"]) * 1.5}
        assert not sft.arrays_are_equal(ref["y"], wrong["y"])
