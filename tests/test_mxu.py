"""MXU banded-matmul lowering tests (backend/linear.py + stream.py).

Wide affine stages lower to L @ P @ R banded matmuls; results must match
the oracle bit-for-nearly-bit (f32 matmul accumulation differs only in
rounding association)."""
import os

import numpy as np
import pytest

import jax.numpy as jnp

import stencilflow_tpu as sft
from stencilflow_tpu.backend.linear import (MatrixPool, extract_linear,
                                            plan_linear_stage)
from stencilflow_tpu.backend.stream import compile_chain_stream
from stencilflow_tpu.synthesize import synthesize_stencil

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(program, inputs, mxu="auto", mxu_precision="split"):
    fn = compile_chain_stream(program, interpret=True, mxu=mxu,
                              mxu_precision=mxu_precision)
    out = fn({k: jnp.asarray(v) for k, v in inputs.items()})
    return {k: np.asarray(v) for k, v in out.items()}


class TestExtraction:
    def test_affine_chain_with_temporaries(self):
        from stencilflow_tpu.frontend.parser import parse_computation
        stmts = parse_computation(
            "k", "t = 2.0 * a[i,j,k] + 1.0; k = t - 0.5 * a[i,j+1,k]",
            {"a": (True, True, True)}, {}, {})
        spec = sft.KernelSpec("k", stmts, np.dtype(np.float32), {})
        coeffs = extract_linear(spec)
        assert coeffs[("a", (0, 0, 0))] == 2.0
        assert coeffs[("a", (0, 1, 0))] == -0.5
        assert coeffs[("const",)] == 1.0

    def test_nonlinear_returns_none(self):
        from stencilflow_tpu.frontend.parser import parse_computation
        stmts = parse_computation(
            "k", "k = a[i,j,k] * a[i,j,k+1]", {"a": (True, True, True)},
            {}, {})
        spec = sft.KernelSpec("k", stmts, np.dtype(np.float32), {})
        assert extract_linear(spec) is None

    def test_plan_rank_and_groups(self):
        spec = synthesize_stencil(num_stages=1, dimensions=(8, 12, 16),
                                  shape="box", extent=1)
        p = sft.parse_program(spec, name="b")
        pool = MatrixPool()
        mp = plan_linear_stage(list(p.kernels.values())[0], (12, 16),
                               p.dimensions, pool, min_footprint=9)
        assert mp is not None
        assert mp.footprint == 27
        assert len(mp.groups) == 3          # i-offsets -1, 0, +1
        # box is rank 1: a single L/R pair per group
        assert all(len(g.terms) == 1 for g in mp.groups)


class TestMXUvsOracle:
    @pytest.mark.parametrize("extent,bval", [(1, 0.0), (2, 0.7)])
    def test_box_chain(self, extent, bval):
        spec = synthesize_stencil(
            num_stages=2, dimensions=(10, 12, 16), shape="box",
            extent=extent, boundary="constant", boundary_value=bval)
        p = sft.parse_program(spec, name=f"box{extent}")
        inputs = sft.load_input_arrays(p, seed=extent)
        ref = np.asarray(sft.run_interpreter(p, inputs)["s1"])
        got = _run(p, inputs)["s1"]
        np.testing.assert_allclose(got, ref, rtol=3e-5, atol=1e-6)

    def test_box_chain_bf16_single_pass(self):
        # opt-in single-pass mode: bf16-level accuracy, no __lo residual
        # matrices, one matmul per side (linear.finalize_pool sentinel)
        from stencilflow_tpu.backend.linear import (MatrixPool,
                                                    finalize_pool,
                                                    plan_all_stages)
        spec = synthesize_stencil(
            num_stages=2, dimensions=(10, 12, 16), shape="box", extent=2,
            boundary="constant", boundary_value=0.3)
        p = sft.parse_program(spec, name="boxbf16")
        inputs = sft.load_input_arrays(p, seed=3)
        ref = np.asarray(sft.run_interpreter(p, inputs)["s1"])
        got = _run(p, inputs, mxu_precision="bf16")["s1"]
        np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-3)
        # and it is genuinely the reduced-precision path, not split
        split = _run(p, inputs, mxu_precision="split")["s1"]
        assert np.max(np.abs(got - split)) > 0
        pool = MatrixPool()
        plans = plan_all_stages(p, (12, 16), p.dimensions, pool, 9)
        pkeys, _arrs, pmeta, _tk = finalize_pool(plans, pool, p, "bf16")
        assert not any(k.endswith("__lo") for k in pkeys)
        assert pmeta.get("__precision__") == "bf16"

    def test_unknown_precision_raises(self):
        spec = synthesize_stencil(num_stages=1, dimensions=(8, 12, 16),
                                  shape="box", extent=1)
        p = sft.parse_program(spec, name="badprec")
        with pytest.raises(ValueError, match="mxu_precision"):
            _run(p, sft.load_input_arrays(p), mxu_precision="fast")

    def test_cross_wide_is_rank2(self):
        spec = synthesize_stencil(num_stages=2, dimensions=(12, 16),
                                  shape="cross", extent=3)
        p = sft.parse_program(spec, name="crossw")
        pool = MatrixPool()
        mp = plan_linear_stage(list(p.kernels.values())[0], (12, 16),
                               p.dimensions, pool, min_footprint=9)
        assert mp is not None and len(mp.groups) == 1
        assert len(mp.groups[0].terms) == 2     # cross = rank 2
        inputs = sft.load_input_arrays(p, seed=5)
        ref = np.asarray(sft.run_interpreter(p, inputs)["s1"])
        got = _run(p, inputs)["s1"]
        np.testing.assert_allclose(got, ref, rtol=3e-5, atol=1e-6)

    def test_shrink_box_matches_after_prune(self):
        spec = synthesize_stencil(num_stages=2, dimensions=(12, 14, 16),
                                  shape="box", extent=1, boundary="shrink")
        p = sft.parse_program(spec, name="boxshrink")
        inputs = sft.load_input_arrays(p, seed=6)
        ref = np.asarray(sft.run_interpreter(p, inputs)["s1"])
        got = _run(p, inputs)["s1"]
        h = 2
        core = (slice(h, -h),) * 3
        np.testing.assert_allclose(got[core], ref[core], rtol=3e-5,
                                   atol=1e-6)

    def test_mxu_off_matches_on(self):
        spec = synthesize_stencil(num_stages=1, dimensions=(8, 12, 16),
                                  shape="box", extent=1)
        p = sft.parse_program(spec, name="onoff")
        inputs = sft.load_input_arrays(p, seed=7)
        on = _run(p, inputs, mxu="auto")["s0"]
        off = _run(p, inputs, mxu="off")["s0"]
        np.testing.assert_allclose(on, off, rtol=3e-5, atol=1e-6)

    def test_blocked_band_exact(self):
        # blocked representation reproduces the full banded product exactly
        from stencilflow_tpu.backend.linear import (_band_matrix,
                                                    _blocked_rows)
        rng = np.random.default_rng(0)
        full = _band_matrix(384, [-2, -1, 0, 1, 3], [1., 2., 3., 4., 5.])
        blocks, starts = _blocked_rows(full)
        assert blocks.shape[0] == 3 and blocks.shape[1] == 128
        assert blocks.shape[2] <= 3 * 384 // 4
        p = rng.standard_normal((384, 48)).astype(np.float32)
        want = full @ p
        got = np.concatenate([blocks[t] @ p[s:s + blocks.shape[2]]
                              for t, s in enumerate(starts)], axis=0)
        np.testing.assert_allclose(got, want, rtol=1e-4,
                                   atol=1e-6)

    def test_blocked_band_skipped_when_unprofitable(self):
        from stencilflow_tpu.backend.linear import (_band_matrix,
                                                    _blocked_rows)
        # indivisible size
        assert _blocked_rows(_band_matrix(200, [0, 1], [1., 1.])) is None
        # too small
        assert _blocked_rows(_band_matrix(128, [0, 1], [1., 1.])) is None
        # band too wide relative to the plane
        wide = _band_matrix(256, list(range(-100, 101)), [1.0] * 201)
        assert _blocked_rows(wide) is None
        # MXU-chunk neutral: at n=256 a radius-2 window still fills
        # ceil(136/128)=2 contraction chunks == the full plane (measured
        # neutral on chip, RESULTS.md) -> keep the full matmul
        assert _blocked_rows(
            _band_matrix(256, [-2, -1, 0, 1, 2], [1.] * 5)) is None

    @pytest.mark.parametrize("dims", [(4, 384, 16), (4, 16, 384)])
    def test_blocked_chain_matches_oracle(self, dims):
        # 384-wide planes trigger the blocked-banded lowering on the wide
        # axis (>= 3 MXU contraction chunks, so the window saves real
        # flops); result must still match the whole-domain oracle
        spec = synthesize_stencil(num_stages=2, dimensions=dims,
                                  shape="box", extent=2,
                                  boundary="constant", boundary_value=0.25)
        p = sft.parse_program(spec, name=f"blk{dims[1]}x{dims[2]}")
        pool = MatrixPool()
        mp = plan_linear_stage(list(p.kernels.values())[0],
                               (dims[1], dims[2]), p.dimensions, pool,
                               min_footprint=12)
        assert mp is not None
        assert any(k.startswith(("Lb", "Rb")) for k in pool.items), \
            "expected at least one blocked band matrix"
        inputs = sft.load_input_arrays(p, seed=9)
        ref = np.asarray(sft.run_interpreter(p, inputs)["s1"])
        got = _run(p, inputs)["s1"]
        np.testing.assert_allclose(got, ref, rtol=3e-5, atol=1e-6)

    @pytest.mark.parametrize("bval", [0.0, 0.4])
    def test_jtiled_mxu_matches_oracle(self, bval):
        # a VMEM budget that cannot hold the untiled rings + transform
        # rings forces j-tiling; the MXU lowering must survive with
        # origin-aware (per-tile stacked) band matrices and corrections
        spec = synthesize_stencil(num_stages=2, dimensions=(4, 128, 32),
                                  shape="box", extent=2,
                                  boundary="constant", boundary_value=bval)
        p = sft.parse_program(spec, name=f"tiledmxu{bval}")
        inputs = sft.load_input_arrays(p, seed=11)
        ref = np.asarray(sft.run_interpreter(p, inputs)["s1"])
        fn = compile_chain_stream(p, interpret=True, vmem_budget=400 * 1024)
        cfg = compile_chain_stream.last_config
        assert cfg["jtiles"] > 1, cfg
        assert cfg["mxu_stages"], cfg
        got = np.asarray(fn({k: jnp.asarray(v)
                             for k, v in inputs.items()})["s1"])
        np.testing.assert_allclose(got, ref, rtol=3e-5, atol=1e-6)

    def test_f64_stays_on_vpu(self):
        # the band transforms compute in f32; f64 programs must keep full
        # precision on the VPU path
        import jax
        spec = synthesize_stencil(num_stages=2, dimensions=(4, 16, 16),
                                  shape="box", extent=2,
                                  data_type="float64")
        p = sft.parse_program(spec, name="f64box")
        inputs = sft.load_input_arrays(p, seed=2)
        ref = np.asarray(sft.run_interpreter(p, inputs)["s1"])
        fn = compile_chain_stream(p, interpret=True)
        assert compile_chain_stream.last_config["mxu_stages"] == []
        got = np.asarray(fn({k: jnp.asarray(v)
                             for k, v in inputs.items()})["s1"])
        np.testing.assert_allclose(got, ref, rtol=1e-12)

    def test_narrow_stencil_stays_on_vpu(self):
        from stencilflow_tpu.synthesize import jacobi
        p = sft.parse_program(jacobi(3, 8, iterations=1), name="nar")
        pool = MatrixPool()
        mp = plan_linear_stage(list(p.kernels.values())[0], (8, 8),
                               p.dimensions, pool, min_footprint=12)
        assert mp is None   # 6-point cross: below the MXU threshold


class TestShardedMXU:
    """Sharded streaming kernel with origin-aware per-shard band matrices
    (parallel/domain.py:_sharded_mxu_assets)."""

    def _run(self, p, inputs, dim_axes, mesh_shape, axes_names=("x", "y"),
             **kw):
        import jax
        from jax.sharding import Mesh
        from stencilflow_tpu.parallel.domain import compile_sharded_chain
        devs = np.array(jax.devices()[:int(np.prod(mesh_shape))])
        mesh = Mesh(devs.reshape(mesh_shape), axes_names[:len(mesh_shape)])
        fn, plan = compile_sharded_chain(p, mesh, dim_axes,
                                         local_backend="stream",
                                         interpret=True, **kw)
        sh = plan.input_shardings()
        dev_in = {n: jax.device_put(jnp.asarray(v), sh[n])
                  for n, v in inputs.items()}
        out = fn(dev_in)
        return {k: np.asarray(v) for k, v in out.items()}

    @pytest.mark.parametrize("bval", [0.0, 0.6])
    def test_jk_sharded_box(self, bval):
        from stencilflow_tpu.parallel.domain import compile_sharded_chain
        spec = synthesize_stencil(num_stages=2, dimensions=(4, 64, 64),
                                  shape="box", extent=2,
                                  boundary="constant", boundary_value=bval)
        p = sft.parse_program(spec, name=f"shmxu{bval}")
        inputs = sft.load_input_arrays(p, seed=13)
        ref = np.asarray(sft.run_interpreter(p, inputs)["s1"])
        got = self._run(p, inputs, (None, "x", "y"), (2, 2))["s1"]
        assert compile_sharded_chain.last_config["mxu_stages"], \
            compile_sharded_chain.last_config
        np.testing.assert_allclose(got, ref, rtol=3e-5, atol=1e-6)

    def test_ik_sharded_box(self):
        from stencilflow_tpu.parallel.domain import compile_sharded_chain
        spec = synthesize_stencil(num_stages=2, dimensions=(16, 24, 32),
                                  shape="box", extent=2,
                                  boundary="constant", boundary_value=0.2)
        p = sft.parse_program(spec, name="shmxu_ik")
        inputs = sft.load_input_arrays(p, seed=14)
        ref = np.asarray(sft.run_interpreter(p, inputs)["s1"])
        got = self._run(p, inputs, ("x", None, "y"), (2, 2))["s1"]
        assert compile_sharded_chain.last_config["mxu_stages"]
        np.testing.assert_allclose(got, ref, rtol=3e-5, atol=1e-6)

    def test_i_only_sharded_keeps_global_plane_mxu(self):
        # i-only sharding: plane == global domain, blocked representation
        # stays available
        from stencilflow_tpu.parallel.domain import compile_sharded_chain
        spec = synthesize_stencil(num_stages=2, dimensions=(16, 16, 32),
                                  shape="box", extent=2,
                                  boundary="constant", boundary_value=0.1)
        p = sft.parse_program(spec, name="shmxu_i")
        inputs = sft.load_input_arrays(p, seed=15)
        ref = np.asarray(sft.run_interpreter(p, inputs)["s1"])
        got = self._run(p, inputs, ("x", None, None), (2,),
                        axes_names=("x",))["s1"]
        assert compile_sharded_chain.last_config["mxu_stages"]
        np.testing.assert_allclose(got, ref, rtol=3e-5, atol=1e-6)

    def test_sharded_jtiled_mxu(self):
        # a small VMEM budget forces per-shard j-tiling on top of the mesh
        # decomposition; band matrices stack over (shard, tile) instances
        from stencilflow_tpu.parallel.domain import compile_sharded_chain
        spec = synthesize_stencil(num_stages=2, dimensions=(4, 64, 32),
                                  shape="box", extent=2,
                                  boundary="constant", boundary_value=0.3)
        p = sft.parse_program(spec, name="shmxu_jt")
        inputs = sft.load_input_arrays(p, seed=16)
        ref = np.asarray(sft.run_interpreter(p, inputs)["s1"])
        got = self._run(p, inputs, (None, "x", "y"), (2, 2),
                        vmem_budget=100 * 1024)["s1"]
        cfg = compile_sharded_chain.last_config
        assert cfg["jtiles"] > 1 and cfg["mxu_stages"], cfg
        np.testing.assert_allclose(got, ref, rtol=3e-5, atol=1e-6)


class TestLinearPlannerEdgeCases:
    def test_pool_keys_deterministic_across_processes(self):
        """Pool keys must be content digests, not salted hash(): multi-host
        tracing sorts them into the kernel argument order, so every
        process must derive identical keys."""
        import subprocess
        import sys

        snippet = (
            "import numpy as np, sys; sys.path.insert(0, '.');"
            "from stencilflow_tpu.backend.linear import MatrixPool;"
            "print(MatrixPool().add(np.eye(4, dtype=np.float32), 'L'))")
        keys = {
            subprocess.run([sys.executable, "-c", snippet],
                           capture_output=True, text=True, cwd=REPO,
                           env={**os.environ, "JAX_PLATFORMS": "cpu",
                                "PYTHONHASHSEED": str(seed)},
                           ).stdout.strip()
            for seed in (1, 2)}
        assert len(keys) == 1 and keys.pop()

    def test_fully_cancelled_stage_returns_none(self):
        """A stage whose coefficient groups all cancel must fall back to
        the VPU path (no groups to anchor the bias on), not crash the
        MXU tracer."""
        from stencilflow_tpu.backend.linear import (MatrixPool,
                                                    plan_linear_stage)
        taps = " + ".join(f"a[i,j{o:+d},k{p:+d}]"
                          for o in (-2, -1, 0, 1) for p in (-1, 0, 1, 2))
        spec = {
            "inputs": {"a": {"data": "random:-1,1",
                             "data_type": "float32"}},
            "outputs": ["s"],
            "dimensions": [4, 16, 16],
            "program": {"s": {
                "computation_string":
                    f"s = ({taps}) - ({taps}) + 5.0",
                "boundary_conditions":
                {"a": {"type": "constant", "value": 0.0}},
                "data_type": "float32"}},
        }
        p = sft.parse_program(spec, name="cancelled")
        plan = plan_linear_stage(p.kernels["s"], (16, 16), (4, 16, 16),
                                 MatrixPool(), min_footprint=9)
        assert plan is None
        # and the full program still runs through the best backend
        inputs = sft.load_input_arrays(p, seed=0)
        from stencilflow_tpu.backend import compile_chain_best
        fn, _ = compile_chain_best(p, interpret=True)
        got = np.asarray(fn({k: np.asarray(v)
                             for k, v in inputs.items()})["s"])
        np.testing.assert_allclose(got, np.full((4, 16, 16), 5.0,
                                                np.float32), rtol=1e-6)

    def test_integer_affine_stage_stays_on_vpu(self):
        """Integer kernels need exact arithmetic: plan_all_stages must
        not put them on the f32 matmul path."""
        from stencilflow_tpu.backend.linear import (MatrixPool,
                                                    plan_all_stages)
        taps = " + ".join(f"a[i,j{o:+d},k{p:+d}]"
                          for o in (-2, -1, 0, 1) for p in (-1, 0, 1, 2))
        spec = {
            "inputs": {"a": {"data": "constant:3", "data_type": "int32"}},
            "outputs": ["s"],
            "dimensions": [4, 16, 16],
            "program": {"s": {
                "computation_string": f"s = {taps}",
                "boundary_conditions":
                {"a": {"type": "constant", "value": 0.0}},
                "data_type": "int32"}},
        }
        p = sft.parse_program(spec, name="intaffine")
        assert plan_all_stages(p, (16, 16), (4, 16, 16), MatrixPool(),
                               min_footprint=9) == {}


class TestStageMajor:
    """Stage-major micro-steps: band transforms batched into block-wide
    matmuls (stream.py apply_transform_block).  Must be oracle-exact under
    the same tolerance as the plane-major MXU path, and "auto" must engage
    it exactly when transform rings exist and block > 1."""

    def _program(self, num_stages=3, dims=(12, 16, 24), extent=1,
                 bval=0.3):
        spec = synthesize_stencil(
            num_stages=num_stages, dimensions=dims, shape="box",
            extent=extent, boundary="constant", boundary_value=bval)
        return sft.parse_program(spec, name=f"sm{num_stages}x{extent}")

    @pytest.mark.parametrize("block", [2, 3, 4])
    def test_on_matches_oracle(self, block):
        p = self._program()
        inputs = sft.load_input_arrays(p, seed=7)
        ref = np.asarray(sft.run_interpreter(p, inputs)["s2"])
        fn = compile_chain_stream(p, interpret=True, block=block,
                                  stage_major="on")
        assert compile_chain_stream.last_config["stage_major"]
        got = np.asarray(fn({k: jnp.asarray(v)
                             for k, v in inputs.items()})["s2"])
        np.testing.assert_allclose(got, ref, rtol=3e-5, atol=1e-6)

    def test_on_off_agree(self):
        p = self._program(num_stages=2, extent=2, bval=0.0)
        inputs = sft.load_input_arrays(p, seed=3)
        outs = {}
        for mode in ("on", "off"):
            fn = compile_chain_stream(p, interpret=True, block=4,
                                      stage_major=mode)
            assert compile_chain_stream.last_config["stage_major"] == \
                (mode == "on")
            outs[mode] = np.asarray(
                fn({k: jnp.asarray(v) for k, v in inputs.items()})["s1"])
        # identical contraction math, only the free-dim width differs
        np.testing.assert_allclose(outs["on"], outs["off"], rtol=1e-6)

    def test_auto_engages_on_mxu_chains(self):
        p = self._program()
        inputs = sft.load_input_arrays(p, seed=1)
        fn = compile_chain_stream(p, interpret=True, block=2)
        cfg = dict(compile_chain_stream.last_config)
        assert cfg["mxu_stages"] and cfg["stage_major"]
        got = np.asarray(fn({k: jnp.asarray(v)
                             for k, v in inputs.items()})["s2"])
        ref = np.asarray(sft.run_interpreter(p, inputs)["s2"])
        np.testing.assert_allclose(got, ref, rtol=3e-5, atol=1e-6)
        # VPU chains have no transform rings: auto stays plane-major
        compile_chain_stream(p, interpret=True, block=2, mxu="off")
        assert not compile_chain_stream.last_config["stage_major"]

    def test_deep_ring_algebra(self):
        """Depth-5 chain at block=4: consumed rings must retain the
        block-1 extra planes the stage-major ordering needs."""
        p = self._program(num_stages=5, dims=(16, 16, 16))
        inputs = sft.load_input_arrays(p, seed=9)
        ref = np.asarray(sft.run_interpreter(p, inputs)["s4"])
        fn = compile_chain_stream(p, interpret=True, block=4,
                                  stage_major="on")
        got = np.asarray(fn({k: jnp.asarray(v)
                             for k, v in inputs.items()})["s4"])
        np.testing.assert_allclose(got, ref, rtol=3e-5, atol=1e-6)
