"""Stage-grouped recompute backend (backend/group.py): rings every g
stages, overlap-style recompute within groups.

Contract: bit-exact vs the numpy oracle in interpret mode (the split
path is compiled-only — see the FMA-contraction note in
compile_chain_group — and covered here at trace level with a tight
tolerance).
"""
import numpy as np
import pytest

import stencilflow_tpu as sft
from stencilflow_tpu.synthesize import jacobi, synthesize_stencil


def _oracle(program, inputs):
    return {k: np.asarray(v)
            for k, v in sft.run_interpreter(program, inputs).items()}


def _program_jacobi3d(size=16, iters=4, boundary="constant"):
    spec = jacobi(3, size, iterations=iters)
    for kspec in spec["program"].values():
        for bc in kspec["boundary_conditions"].values():
            bc["type"] = boundary
            bc["value"] = 0.25
    return sft.parse_program(spec, name=f"grp_jac_{boundary}")


class TestGroupBackend:

    @pytest.mark.parametrize("boundary", ["constant", "copy", "shrink"])
    @pytest.mark.parametrize("B,g", [(1, 2), (2, 2), (2, 3), (4, 4)])
    def test_jacobi3d_boundaries(self, boundary, B, g):
        from stencilflow_tpu.backend.group import run_chain_group
        p = _program_jacobi3d(size=16, iters=4, boundary=boundary)
        inputs = sft.load_input_arrays(p, seed=70)
        ref = _oracle(p, inputs)
        got = run_chain_group(p, inputs, interpret=True, panel=B, group=g)
        for o in p.outputs:
            np.testing.assert_array_equal(got[o], ref[o])

    @pytest.mark.parametrize("g", [1, 2, 3, 8, 100])
    def test_group_size_sweep_degenerates(self, g):
        """g=1 ~ per-stage rings; g >= depth ~ overlap (single group)."""
        from stencilflow_tpu.backend.group import (compile_chain_group,
                                                   run_chain_group)
        p = _program_jacobi3d(size=16, iters=8)
        inputs = sft.load_input_arrays(p, seed=71)
        ref = _oracle(p, inputs)
        got = run_chain_group(p, inputs, interpret=True, panel=2, group=g)
        np.testing.assert_array_equal(got[p.outputs[0]], ref[p.outputs[0]])
        cfg = compile_chain_group.last_config
        n_groups = len(cfg["groups"])
        assert n_groups == -(-8 // g)
        # ring fields: streamed input + one boundary per non-final group
        assert len(cfg["ring_fields"]) == 1 + (n_groups - 1)

    def test_mixed_rank_inputs_and_scalars(self):
        """hotspot: scalar coefficients + static planes + copy BC."""
        from stencilflow_tpu.backend.group import run_chain_group
        p = sft.parse_program(synthesize_stencil(
            num_stages=4, dimensions=(8, 16, 16), shape="hotspot"),
            name="grp_hot")
        inputs = sft.load_input_arrays(p, seed=72)
        ref = _oracle(p, inputs)
        got = run_chain_group(p, inputs, interpret=True, panel=4, group=2)
        for o in p.outputs:
            np.testing.assert_allclose(got[o], ref[o], rtol=3e-5,
                                       atol=1e-6)

    def test_forks_and_ternaries_hdiff(self):
        """hdiff: forks/joins; a field consumed by several groups.

        Tolerance, not bit-equality: hdiff's `a - coeff*(...)` stages
        are FMA-contractible, and XLA *CPU* contracts them to ~1 ulp
        from the numpy oracle in EVERY jnp backend (xla/overlap/panel
        measured: the identical 57-cell 1-ulp pattern on this program)
        — a pre-existing interpret-platform artifact, not group-mode
        semantics."""
        from stencilflow_tpu.backend.group import run_chain_group
        p = sft.parse_program(synthesize_stencil(
            num_stages=2, dimensions=(8, 16, 16), shape="hdiff"),
            name="grp_hdiff")
        inputs = sft.load_input_arrays(p, seed=73)
        ref = _oracle(p, inputs)
        got = run_chain_group(p, inputs, interpret=True, panel=4, group=2)
        for o in p.outputs:
            np.testing.assert_allclose(got[o], ref[o], rtol=1e-6,
                                       atol=1e-7)

    def test_i_offset_larger_than_panel(self):
        """Unlike panel mode, |oi| > B is in scope (windows widen)."""
        from stencilflow_tpu.backend.group import run_chain_group
        spec = {
            "inputs": {"a": {"data": "random:-1,1",
                             "data_type": "float32"}},
            "outputs": ["y"], "dimensions": [12, 8, 8],
            "program": {
                "m": {"computation_string":
                      "m = a[i-3,j,k] + 0.5*a[i+2,j+1,k]",
                      "boundary_conditions": {
                          "a": {"type": "constant", "value": 0.5}},
                      "data_type": "float32"},
                "y": {"computation_string": "y = m[i,j,k] + m[i+3,j,k-1]",
                      "boundary_conditions": {
                          "m": {"type": "constant", "value": 0.5}},
                      "data_type": "float32"}}}
        p = sft.parse_program(spec, name="grp_wide_i")
        inputs = sft.load_input_arrays(p, seed=74)
        ref = _oracle(p, inputs)["y"]
        for B, g in ((1, 1), (2, 2), (2, 1)):
            got = run_chain_group(p, inputs, interpret=True, panel=B,
                                  group=g)["y"]
            np.testing.assert_array_equal(got, ref)

    def test_multiple_outputs_at_different_lags(self):
        from stencilflow_tpu.backend.group import run_chain_group
        spec = jacobi(3, 16, iterations=6)
        spec["outputs"] = ["s1", "s3", "s5"]
        p = sft.parse_program(spec, name="grp_multi_out")
        inputs = sft.load_input_arrays(p, seed=75)
        ref = _oracle(p, inputs)
        got = run_chain_group(p, inputs, interpret=True, panel=2, group=2)
        for o in p.outputs:
            np.testing.assert_array_equal(got[o], ref[o])

    def test_interior_split_trace(self):
        """The compiled-only interior split, forced under interpret:
        values stay within XLA-CPU FMA-contraction distance of the
        oracle (bit-exactness on compiled Mosaic is verified on chip —
        see compile_chain_group's note)."""
        import jax.numpy as jnp
        from stencilflow_tpu.backend.group import compile_chain_group
        p = _program_jacobi3d(size=16, iters=8)
        inputs = sft.load_input_arrays(p, seed=76)
        ref = _oracle(p, inputs)
        fn = compile_chain_group(p, panel=2, group=2, interpret=True,
                                 interior_split="force")
        got = fn({k: jnp.asarray(v) for k, v in inputs.items()})
        for o in p.outputs:
            np.testing.assert_allclose(np.asarray(got[o]), ref[o],
                                       rtol=1e-6)

    def test_bf16_ring_storage(self):
        import jax.numpy as jnp
        from stencilflow_tpu.backend.group import compile_chain_group
        p = _program_jacobi3d(size=16, iters=4)
        inputs = sft.load_input_arrays(p, seed=77)
        ref = _oracle(p, inputs)
        fn = compile_chain_group(p, panel=2, group=2, interpret=True,
                                 ring_storage="bfloat16")
        got = fn({k: jnp.asarray(v) for k, v in inputs.items()})
        o = p.outputs[0]
        err = np.max(np.abs(np.asarray(got[o]) - ref[o])
                     / (np.abs(ref[o]) + 1e-6))
        assert 0 < err < 0.05   # rounded rings: inexact but bounded

    def test_2d_rows_rotation(self):
        from stencilflow_tpu.backend.group import run_chain_group
        from stencilflow_tpu.frontend.canonicalize import rotate_2d_to_rows
        p = sft.parse_program(jacobi(2, 64, iterations=4),
                              name="grp_2d")
        rot = rotate_2d_to_rows(p)
        inputs = sft.load_input_arrays(p, seed=78)
        ref = _oracle(p, inputs)
        got = run_chain_group(rot, inputs, interpret=True, panel=8,
                              group=2)
        o = p.outputs[0]
        np.testing.assert_array_equal(
            np.asarray(got[o]).reshape(ref[o].shape), ref[o])

    @pytest.mark.parametrize("boundary", ["constant", "copy", "shrink"])
    def test_direct_input_windows(self, boundary):
        """input_windows='direct': overlapping input block refs replace
        the input ring — bit-exact incl. the clipped edge blocks (whose
        wrong-plane rows are unobservable under the i-mask invariant)."""
        import jax.numpy as jnp
        from stencilflow_tpu.backend.group import compile_chain_group
        p = _program_jacobi3d(size=16, iters=4, boundary=boundary)
        inputs = sft.load_input_arrays(p, seed=79)
        ref = _oracle(p, inputs)
        for B, g in ((2, 2), (4, 3), (2, 8)):
            fn = compile_chain_group(p, panel=B, group=g, interpret=True,
                                     input_windows="direct")
            cfg = compile_chain_group.last_config
            assert cfg["direct_inputs"] == ["a"]
            assert "a" not in cfg["ring_fields"]
            got = fn({k: jnp.asarray(v) for k, v in inputs.items()})
            for o in p.outputs:
                np.testing.assert_array_equal(np.asarray(got[o]), ref[o])

    def test_bool_ihistory_in_scope(self):
        """bool fields read at i-offsets are IN scope for group/panel/
        stream (round 5: 0/1 int32 wire, `!= 0` at read exit — verified
        compiled+bit-exact on v5e); overlap still gates them."""
        import jax.numpy as jnp
        from stencilflow_tpu.backend.group import compile_chain_group
        from stencilflow_tpu.backend.panel import compile_chain_panel
        from stencilflow_tpu.backend.overlap import compile_chain_overlap
        spec = {
            "inputs": {"a": {"data": "random:-1,1",
                             "data_type": "float32"}},
            "outputs": ["y"], "dimensions": [8, 8, 8],
            "program": {
                "m": {"computation_string": "m = a[i,j,k] > 0.1",
                      "boundary_conditions": {
                          "a": {"type": "constant", "value": 0}},
                      "data_type": "bool"},
                "y": {"computation_string":
                      "y = m[i-1,j,k] * 1.0 + m[i+1,j,k-1] * 2.0 "
                      "+ (a[i,j,k] if m[i-1,j-1,k] else 0.5)",
                      "boundary_conditions": {
                          "m": {"type": "constant", "value": 0},
                          "a": {"type": "constant", "value": 0}},
                      "data_type": "float32"}}}
        p = sft.parse_program(spec, name="grp_bool_ihist")
        inputs = sft.load_input_arrays(p, seed=80)
        ref = _oracle(p, inputs)["y"]
        from stencilflow_tpu.backend.stream import compile_chain_stream
        for mk in (lambda: compile_chain_group(p, panel=2, group=2,
                                               interpret=True),
                   lambda: compile_chain_panel(p, panel=2,
                                               interpret=True),
                   lambda: compile_chain_stream(p, interpret=True)):
            fn = mk()
            got = np.asarray(fn({k: jnp.asarray(v)
                                 for k, v in inputs.items()})["y"])
            np.testing.assert_array_equal(got, ref)
        # stream/overlap keep the gate (only under compiled Mosaic)
        with pytest.raises(ValueError, match="bool"):
            compile_chain_overlap(p, interpret=False)

    def test_vmem_gate_raises(self):
        from stencilflow_tpu.backend.group import compile_chain_group
        p = _program_jacobi3d(size=16, iters=4)
        with pytest.raises(ValueError):
            compile_chain_group(p, panel=16, group=2, interpret=True,
                                vmem_budget=4096)

    @pytest.mark.parametrize("seed", range(8))
    def test_fuzz_matches_oracle(self, seed):
        import os as _os
        import sys as _sys
        _sys.path.insert(0, _os.path.dirname(__file__))
        from test_fuzz import make_random_program
        from stencilflow_tpu.backend.group import run_chain_group
        rng = np.random.default_rng(900 + seed)
        p = sft.parse_program(make_random_program(rng, seed),
                              name=f"grpf{seed}")
        inputs = sft.load_input_arrays(p, seed=2)
        ref = _oracle(p, inputs)
        I = p.dimensions[0]
        B = 2 if I % 2 == 0 else 1
        g = 1 + seed % 3
        try:
            got = run_chain_group(p, inputs, interpret=True, panel=B,
                                  group=g)
        except ValueError:
            pytest.skip("program outside group-mode scope")
        for o in p.outputs:
            np.testing.assert_allclose(got[o], ref[o], rtol=3e-5,
                                       atol=1e-6)
