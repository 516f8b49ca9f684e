"""Out-of-core x domain decomposition (outofcore.compile_chunked_sharded,
VERDICT r4 #7): host i-chunks, each evaluated sharded over a 2-D mesh
with per-chunk j/k halo exchange.  Virtual 8-device CPU mesh.
"""
import numpy as np
import pytest

import stencilflow_tpu as sft
from stencilflow_tpu.synthesize import jacobi, synthesize_stencil


def _oracle(program, inputs):
    return {k: np.asarray(v)
            for k, v in sft.run_interpreter(program, inputs).items()}


def _mesh(shape, axes):
    import jax
    from jax.sharding import Mesh
    return Mesh(np.array(jax.devices()[:int(np.prod(shape))])
                .reshape(shape), axes)


def _raw_inputs(p, inputs):
    return {k: (np.asarray(v).reshape(p.raw_dimensions)
                if not p.inputs[k].is_scalar and all(p.inputs[k].dim_mask)
                else np.asarray(v))
            for k, v in inputs.items()}


class TestOutOfCoreSharded:

    @pytest.mark.parametrize("chunks,mesh_shape,axes,daxes", [
        (2, (4, 2), ("x", "y"), (None, "x", "y")),
        (4, (4, 2), ("x", "y"), (None, "x", None)),
        (8, (2, 4), ("x", "y"), (None, None, "y")),
        (1, (2, 2), ("x", "y"), (None, "x", "y")),
    ])
    def test_jacobi_random_chunks_by_shardings(self, chunks, mesh_shape,
                                               axes, daxes):
        from stencilflow_tpu.outofcore import run_chunked
        p = sft.parse_program(jacobi(3, 32, iterations=3), name="ocs_j")
        inputs = sft.load_input_arrays(p, seed=21)
        ref = _oracle(p, inputs)
        got = run_chunked(p, _raw_inputs(p, inputs), chunks,
                          mesh=_mesh(mesh_shape, axes), dim_axes=daxes)
        for o in p.outputs:
            np.testing.assert_array_equal(got[o], ref[o])

    def test_mixed_rank_inputs_and_memmap_out(self, tmp_path):
        """hotspot (scalars + static planes) with a memmapped output."""
        from stencilflow_tpu.outofcore import run_chunked
        p = sft.parse_program(synthesize_stencil(
            num_stages=3, dimensions=(12, 16, 16), shape="hotspot"),
            name="ocs_hot")
        inputs = sft.load_input_arrays(p, seed=22)
        ref = _oracle(p, inputs)
        out = {o: np.lib.format.open_memmap(
                   str(tmp_path / f"{o}.npy"), mode="w+",
                   dtype=np.dtype(p.kernels[o].dtype),
                   shape=tuple(p.raw_dimensions))
               for o in p.outputs}
        got = run_chunked(p, _raw_inputs(p, inputs), 3,
                          out=out, mesh=_mesh((4, 2), ("x", "y")),
                          dim_axes=(None, "x", "y"))
        for o in p.outputs:
            np.testing.assert_allclose(got[o], ref[o], rtol=3e-5,
                                       atol=1e-6)
            assert got[o] is out[o]

    def test_deep_halo_multi_hop(self):
        """chain halo (6) exceeds the 4-way j shard extent (16/4=4):
        the j halo gathers multi-hop over the mesh."""
        from stencilflow_tpu.outofcore import run_chunked
        p = sft.parse_program(jacobi(3, 16, iterations=6), name="ocs_mh")
        inputs = sft.load_input_arrays(p, seed=23)
        ref = _oracle(p, inputs)
        got = run_chunked(p, _raw_inputs(p, inputs), 2,
                          mesh=_mesh((4, 2), ("x", "y")),
                          dim_axes=(None, "x", None))
        for o in p.outputs:
            np.testing.assert_array_equal(got[o], ref[o])

    def test_plan_reports_per_device_footprint(self):
        from stencilflow_tpu.outofcore import compile_chunked_sharded
        p = sft.parse_program(jacobi(3, 32, iterations=2), name="ocs_fp")
        _fn, plan = compile_chunked_sharded(p, 4, _mesh((4, 2),
                                                        ("x", "y")),
                                            dim_axes=(None, "x", "y"))
        assert plan.backend == "sharded-xla"
        assert plan.config["devices"] == 8
        # (8+2*2) * (32/4+2*2) * (32/2+2*2) * 4B * 3 fields (a, s0, s1)
        assert plan.config["per_device_tile_bytes"] == \
            12 * 12 * 20 * 4 * 3

    def test_gates(self):
        from stencilflow_tpu.outofcore import compile_chunked_sharded
        p = sft.parse_program(jacobi(3, 32, iterations=2), name="ocs_g")
        mesh = _mesh((4, 2), ("x", "y"))
        with pytest.raises(ValueError, match="dim 0"):
            compile_chunked_sharded(p, 2, mesh,
                                    dim_axes=("x", None, None))
        with pytest.raises(ValueError, match="divisible"):
            compile_chunked_sharded(
                sft.parse_program(jacobi(3, 30, iterations=2),
                                  name="ocs_nd"),
                2, mesh, dim_axes=(None, "x", None))
        with pytest.raises(ValueError, match="unknown mesh axis"):
            compile_chunked_sharded(p, 2, mesh,
                                    dim_axes=(None, "z", None))
