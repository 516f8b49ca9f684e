"""HBM ring spill: the memory optimizer's fast->slow placement applied to
the streaming kernel (reference optimizer.py:209-248 mapped to TPU).

A deep chain with a long-range reconvergence makes one ring much deeper
than its read count; with a VMEM budget that no j-tile can satisfy (the
chain halo exceeds every legal tile), the spill rung moves that ring to an
HBM circular buffer driven by async DMA — and the result must still match
the oracle bit-for-bit-modulo-f32."""
import numpy as np
import pytest

import jax.numpy as jnp

import stencilflow_tpu as sft
from stencilflow_tpu.backend.stream import compile_chain_stream


def _reconvergent_chain(stages=16, dims=(12, 24, 32)):
    prog = {}
    prev = "a"
    for s in range(stages):
        expr = (f"s{s} = 0.16 * ({prev}[i-1,j,k] + {prev}[i+1,j,k] + "
                f"{prev}[i,j-1,k] + {prev}[i,j+1,k] + {prev}[i,j,k-1] + "
                f"{prev}[i,j,k+1])")
        fields = {prev}
        if s == stages - 1:
            expr += " + 0.1 * s0[i,j,k]"   # long-range reconvergence
            fields.add("s0")
        prog[f"s{s}"] = {
            "computation_string": expr,
            "boundary_conditions": {
                f: {"type": "constant", "value": 0.2} for f in fields},
            "data_type": "float32"}
        prev = f"s{s}"
    return {"inputs": {"a": {"data": "random:-1,1",
                             "data_type": "float32"}},
            "outputs": [prev], "dimensions": list(dims), "program": prog}


class TestSpill:
    def test_spill_rescues_untileable_chain(self):
        p = sft.parse_program(_reconvergent_chain(), name="spill16")
        inputs = sft.load_input_arrays(p, seed=31)
        out = p.outputs[0]
        ref = np.asarray(sft.run_interpreter(p, inputs)[out])
        fn = compile_chain_stream(p, interpret=True,
                                  vmem_budget=250 * 1024)
        cfg = compile_chain_stream.last_config
        assert cfg["spilled"] == ["s0"], cfg
        assert cfg["jtiles"] == 1
        got = np.asarray(fn({k: jnp.asarray(v)
                             for k, v in inputs.items()})[out])
        np.testing.assert_allclose(got, ref, rtol=3e-5, atol=1e-6)

    def test_spill_with_bf16_ring_storage(self):
        """bf16 ring storage composes with the HBM spill rung: spilled
        rings store bf16 (half the DMA traffic), compute stays f32, and
        the halved VMEM need changes the spill decision (a budget that
        forces spill at f32 fits without it at bf16)."""
        p = sft.parse_program(_reconvergent_chain(), name="spill16bf")
        inputs = sft.load_input_arrays(p, seed=31)
        out = p.outputs[0]
        ref = np.asarray(sft.run_interpreter(p, inputs)[out])
        # f32 spills at 250K; bf16 rings fit the same budget un-spilled
        compile_chain_stream(p, interpret=True, vmem_budget=250 * 1024,
                             ring_storage="bfloat16")
        assert compile_chain_stream.last_config["spilled"] == []
        # squeeze until bf16 spills too, and check the value envelope
        fn = compile_chain_stream(p, interpret=True,
                                  vmem_budget=125 * 1024,
                                  ring_storage="bfloat16")
        cfg = compile_chain_stream.last_config
        assert cfg["spilled"] == ["s0"], cfg
        got = np.asarray(fn({k: jnp.asarray(v)
                             for k, v in inputs.items()})[out])
        rel = np.abs(got - ref).max() / np.abs(ref).max()
        assert 0 < rel < 2e-2      # per-stage bf16 rounding envelope

    def test_spill_off_raises(self):
        p = sft.parse_program(_reconvergent_chain(), name="spill16off")
        with pytest.raises(ValueError, match="VMEM"):
            compile_chain_stream(p, interpret=True,
                                 vmem_budget=250 * 1024, spill="off")

    def test_large_budget_keeps_rings_in_vmem(self):
        p = sft.parse_program(_reconvergent_chain(), name="spill16big")
        compile_chain_stream(p, interpret=True)
        assert compile_chain_stream.last_config["spilled"] == []

    def test_sharded_spill(self):
        # sharded decomposition whose per-shard rings don't fit and whose
        # chain halo defeats every per-shard j-tile: the spill rung keeps
        # the streaming kernel (previously a fused-XLA fallback)
        import jax
        from jax.sharding import Mesh
        from stencilflow_tpu.parallel.domain import compile_sharded_chain
        p = sft.parse_program(
            _reconvergent_chain(stages=16, dims=(12, 24, 64)),
            name="shspill")
        inputs = sft.load_input_arrays(p, seed=33)
        out = p.outputs[0]
        ref = np.asarray(sft.run_interpreter(p, inputs)[out])
        mesh = Mesh(np.array(jax.devices()[:2]), ("y",))
        fn, plan = compile_sharded_chain(p, mesh, (None, None, "y"),
                                         local_backend="stream",
                                         interpret=True,
                                         vmem_budget=480 * 1024)
        cfg = compile_sharded_chain.last_config
        assert cfg["backend"] == "stream" and cfg.get("spilled"), cfg
        sh = plan.input_shardings()
        dev_in = {n: jax.device_put(jnp.asarray(v), sh[n])
                  for n, v in inputs.items()}
        got = np.asarray(fn(dev_in)[out])
        np.testing.assert_allclose(got, ref, rtol=3e-5, atol=1e-6)

    def test_pipeline_segment_spill(self):
        # a pipeline segment whose rings exceed the budget spills instead
        # of dropping the whole pipeline to the fused-XLA evaluator; the
        # reconvergence is WITHIN segment 2 (s15 reads s8) so only that
        # segment carries a deep ring
        import jax
        from jax.sharding import Mesh
        from stencilflow_tpu.parallel.pipeline import compile_pipeline_split
        spec = _reconvergent_chain(stages=16, dims=(12, 24, 32))
        k16 = spec["program"]["s15"]
        k16["computation_string"] = \
            k16["computation_string"].replace("s0[i,j,k]", "s8[i,j,k]")
        k16["boundary_conditions"]["s8"] = \
            k16["boundary_conditions"].pop("s0")
        p = sft.parse_program(spec, name="ppspill")
        inputs = sft.load_input_arrays(p, seed=34)
        out = p.outputs[0]
        ref = np.asarray(sft.run_interpreter(p, inputs)[out])
        mesh = Mesh(np.array(jax.devices()[:2]), ("p",))
        # budget chosen so rings+io exceed 0.7*B (spill triggers) while
        # the post-spill rings still fit 0.7*B - io (segment budgeting
        # counts the double-buffered IO windows like every stream caller)
        fn, plan = compile_pipeline_split(p, mesh, "p",
                                          local_backend="stream",
                                          interpret=True,
                                          vmem_budget=640 * 1024)
        cfg = compile_pipeline_split.last_config
        assert cfg["backend"] == "stream", cfg
        assert any(info["spilled"] for info in cfg["segments"]), cfg
        got = np.asarray(fn({k: jnp.asarray(v)
                             for k, v in inputs.items()})[out])
        np.testing.assert_allclose(got, ref, rtol=3e-5, atol=1e-6)

    def test_spill_with_copy_bc(self):
        spec = _reconvergent_chain(stages=12)
        for k in spec["program"].values():
            for bc in k["boundary_conditions"].values():
                bc["type"] = "copy"
                bc.pop("value", None)
        p = sft.parse_program(spec, name="spillcopy")
        inputs = sft.load_input_arrays(p, seed=32)
        out = p.outputs[0]
        ref = np.asarray(sft.run_interpreter(p, inputs)[out])
        fn = compile_chain_stream(p, interpret=True,
                                  vmem_budget=185 * 1024)
        cfg = compile_chain_stream.last_config
        assert cfg["spilled"], cfg
        got = np.asarray(fn({k: jnp.asarray(v)
                             for k, v in inputs.items()})[out])
        np.testing.assert_allclose(got, ref, rtol=3e-5, atol=1e-6)
