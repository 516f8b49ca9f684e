"""Matrix-free Krylov solvers (solve.py): the chain as a linear operator.

CG on an SPD implicit-diffusion operator and CGNR (via the transposed
chain) on a nonsymmetric upwind operator, both checked against dense
numpy solves; nonzero boundary constants fold into the measured affine
offset; non-affine programs are rejected.
"""
import itertools

import numpy as np
import pytest

import stencilflow_tpu as sft
from stencilflow_tpu.solve import solve_cg, solve_cgnr

N, DT = 10, 0.3


def _implicit_program(bc_value=0.0):
    return sft.parse_program({
        "inputs": {"x": {"data": "constant:0.0", "data_type": "float32"}},
        "outputs": ["y"], "dimensions": [N, N],
        "program": {"y": {
            "computation_string":
                f"y = x[j, k] - {DT} * (x[j-1, k] + x[j+1, k] + "
                f"x[j, k-1] + x[j, k+1] - 4.0 * x[j, k])",
            "boundary_conditions": {
                "x": {"type": "constant", "value": bc_value}},
            "data_type": "float32"}}}, name=f"impl_{bc_value}")


def _dense_operator():
    A = np.zeros((N * N, N * N), np.float32)
    for j, k in itertools.product(range(N), range(N)):
        r = j * N + k
        A[r, r] = 1 + 4 * DT
        for dj, dk in ((-1, 0), (1, 0), (0, -1), (0, 1)):
            jj, kk = j + dj, k + dk
            if 0 <= jj < N and 0 <= kk < N:
                A[r, jj * N + kk] = -DT
    return A


@pytest.mark.parametrize("bc_value", [0.0, 2.5])
def test_cg_implicit_diffusion(bc_value):
    """CG solves (I - dt L) x = b; a nonzero BC constant becomes part of
    the affine offset and must not corrupt the linear solve."""
    p = _implicit_program(bc_value)
    b = np.random.default_rng(0).random((N, N)).astype(np.float32)
    x, info = solve_cg(p, b, interpret=True, tol=1e-6)
    assert info["iterations"] < 100
    x_ref = np.linalg.solve(_dense_operator(), b.ravel()).reshape(N, N)
    np.testing.assert_allclose(np.asarray(x), x_ref, rtol=2e-4, atol=3e-5)


def test_cgnr_nonsymmetric():
    p = sft.parse_program({
        "inputs": {"x": {"data": "constant:0.0", "data_type": "float32"}},
        "outputs": ["y"], "dimensions": [N, N],
        "program": {"y": {
            "computation_string":
                "y = x[j, k] - 0.4 * (x[j, k] - x[j, k-1])",
            "boundary_conditions": {
                "x": {"type": "constant", "value": 0.0}},
            "data_type": "float32"}}}, name="upwind")
    b = np.random.default_rng(1).random((N, N)).astype(np.float32)
    x, info = solve_cgnr(p, b, interpret=True, tol=1e-6, maxiter=3000)
    A = np.eye(N * N, dtype=np.float32) * 0.6
    for j, k in itertools.product(range(N), range(N)):
        if k > 0:
            A[j * N + k, j * N + k - 1] = 0.4
    x_ref = np.linalg.solve(A, b.ravel()).reshape(N, N)
    np.testing.assert_allclose(np.asarray(x), x_ref, rtol=1e-3, atol=1e-3)


def test_rejects_nonlinear():
    from stencilflow_tpu.synthesize import synthesize_stencil
    p = sft.parse_program(
        synthesize_stencil(num_stages=1, dimensions=(4, 8, 8),
                           shape="hdiff"), name="slv_nl")
    with pytest.raises(ValueError, match="not affine"):
        solve_cg(p, np.zeros((4, 8, 8), np.float32), field="a")
