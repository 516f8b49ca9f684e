"""Affine-run composition (backend/compose.py): exactness vs the oracle
of the ORIGINAL (uncomposed) program, discovery gates, and fallbacks.

The composed lowering is exact by construction — truncated-operator
matrix products in j/k, the boundary-row i-weight table in i — so every
test compares against the uncomposed oracle at the standard MXU envelope
(3e-5 relative), including all boundary cells for constant-0 programs.
Reference role: operator merging, StencilFusion
(/root/reference/stencilflow/stencil/stencilfusion.py:26-171).
"""
import numpy as np
import pytest

import stencilflow_tpu as sft
from stencilflow_tpu.backend.compose import (compose_program, find_runs,
                                             separable_factor)
from stencilflow_tpu.backend.stream import compile_chain_stream
from stencilflow_tpu.frontend.analysis import ChainAnalysis
from stencilflow_tpu.synthesize import jacobi, synthesize_stencil

jnp = pytest.importorskip("jax.numpy")


def _run(p, **kw):
    inputs = sft.load_input_arrays(p, seed=0)
    oracle = sft.run_interpreter(p, inputs)
    fn = compile_chain_stream(p, interpret=True, **kw)
    cfg = compile_chain_stream.last_config
    out = fn({k: jnp.asarray(v) for k, v in inputs.items()})
    return oracle, out, cfg


def _err(oracle, out, name, halo=0):
    a, b = np.asarray(out[name]), np.asarray(oracle[name])
    if halo:
        sl = tuple(slice(halo, -halo) for _ in range(a.ndim))
        a, b = a[sl], b[sl]
    return np.abs(a - b).max() / max(1e-9, np.abs(b).max())


def _box(stages=4, dims=(24, 24, 24), **kw):
    kw.setdefault("seed_data", "random:0.0,1.0")
    return sft.parse_program(
        synthesize_stencil(num_stages=stages, dimensions=dims,
                           shape="box", extent=2, **kw),
        name="box_compose")


def test_box_full_run_composes_exact():
    p = _box()
    oracle, out, cfg = _run(p)
    assert list(cfg["composed"]) == ["s3"]
    assert cfg["composed"]["s3"] == ["s0", "s1", "s2", "s3"]
    assert cfg["mxu_stages"] == ["s3"]
    assert _err(oracle, out, p.outputs[0]) < 3e-5


def test_segmented_composition():
    p = _box()
    oracle, out, cfg = _run(p, compose="2")
    assert sorted(cfg["composed"]) == ["s1", "s3"]
    assert _err(oracle, out, p.outputs[0]) < 3e-5


def test_compose_off_knob():
    p = _box()
    oracle, out, cfg = _run(p, compose="off")
    assert cfg["composed"] == {}
    assert _err(oracle, out, p.outputs[0]) < 3e-5


def test_shrink_run_composes_on_valid_region():
    p = sft.parse_program(
        synthesize_stencil(num_stages=4, dimensions=(28, 24, 24),
                           shape="box", extent=2, boundary="shrink",
                           seed_data="random:0.0,1.0"),
        name="box_shrink")
    oracle, out, cfg = _run(p)
    assert list(cfg["composed"]) == ["s3"]
    assert _err(oracle, out, p.outputs[0], halo=8) < 3e-5


def test_small_i_auto_segments():
    # I=12 cannot host the full-run D=8 edge table split: the run
    # segments automatically and stays exact
    p = _box(dims=(12, 24, 24))
    oracle, out, cfg = _run(p)
    assert cfg["composed"]
    assert _err(oracle, out, p.outputs[0]) < 3e-5


def test_jtiled_composition_exact():
    p = _box(dims=(20, 256, 32))
    inputs = sft.load_input_arrays(p, seed=0)
    oracle = sft.run_interpreter(p, inputs)
    fn = compile_chain_stream(p, interpret=True, vmem_budget=800_000)
    cfg = compile_chain_stream.last_config
    assert cfg["jtiles"] > 1 and cfg["composed"]
    out = fn({k: jnp.asarray(v) for k, v in inputs.items()})
    assert _err(oracle, out, p.outputs[0]) < 3e-5


def test_jacobi_cross_refuses():
    # the jacobi cross is not rank-1 separable: composing it would blow
    # the per-i-offset rank up linearly (scripts/compose_study.py)
    p = sft.parse_program(jacobi(3, 16, iterations=4), name="jac")
    an = ChainAnalysis.run(p)
    runs, factors = find_runs(p, an)
    assert runs == []
    assert all(separable_factor(k) is None for k in p.kernels.values())


def test_nonzero_constant_bc_refuses():
    p = _box(boundary_value=0.5)
    an = ChainAnalysis.run(p)
    runs, _ = find_runs(p, an)
    assert runs == []
    oracle, out, cfg = _run(p)
    assert cfg["composed"] == {}
    assert _err(oracle, out, p.outputs[0]) < 3e-5


def test_fork_breaks_run():
    # s1 is consumed by both s2 and the fork stage: the chain condition
    # fails and only unforked suffix runs may compose
    p = sft.parse_program(
        synthesize_stencil(num_stages=5, dimensions=(20, 20, 20),
                           shape="box", extent=1, fork_frequency=2,
                           seed_data="random:0.0,1.0"),
        name="box_fork")
    oracle, out, cfg = _run(p)
    for name, stages in cfg["composed"].items():
        assert len(stages) >= 2
    assert _err(oracle, out, p.outputs[0]) < 3e-5


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_separable_chains(seed):
    """Random per-stage rank-1 profiles (random radii, signed weights):
    the composed stream matches the uncomposed oracle within the MXU
    envelope, boundaries included."""
    rng = np.random.default_rng(seed)
    dims = (int(rng.integers(14, 26)), int(rng.integers(16, 33)),
            int(rng.integers(16, 33)))
    stages = int(rng.integers(2, 5))
    program = {}
    prev = "a"
    for s in range(stages):
        ri, rj, rk = (int(rng.integers(1, 3)) for _ in range(3))
        ai = rng.uniform(-1, 1, 2 * ri + 1).round(3)
        uj = rng.uniform(-1, 1, 2 * rj + 1).round(3)
        vk = rng.uniform(-1, 1, 2 * rk + 1).round(3)
        terms = []
        for di, wi in zip(range(-ri, ri + 1), ai):
            for dj, wj in zip(range(-rj, rj + 1), uj):
                for dk, wk in zip(range(-rk, rk + 1), vk):
                    w = float(wi * wj * wk)
                    if w == 0.0:
                        continue
                    terms.append(
                        f"({w!r})*{prev}[i{di:+d},j{dj:+d},k{dk:+d}]")
        program[f"s{s}"] = {
            "computation_string": f"s{s} = " + " + ".join(terms),
            "boundary_conditions": {
                prev: {"type": "constant", "value": 0.0}},
            "data_type": "float32",
        }
        prev = f"s{s}"
    spec = {
        "inputs": {"a": {"data": "random:0.0,1.0",
                         "data_type": "float32"}},
        "outputs": [prev],
        "dimensions": list(dims),
        "program": program,
    }
    p = sft.parse_program(spec, name=f"randsep{seed}")
    an = ChainAnalysis.run(p)
    runs, _ = find_runs(p, an)
    assert runs, "random rank-1 chain must be discovered as composable"
    oracle, out, cfg = _run(p)
    assert cfg["composed"]
    assert _err(oracle, out, p.outputs[0]) < 3e-5


def test_sharded_composition_2x2_mesh():
    """Composition on the domain-decomposed path (i-unsharded): the
    composed SMEM table indexes the global plane, per-shard j/k band
    windows come from plan_composed's origin contexts; values match the
    oracle across a 2x2 mesh within the MXU envelope."""
    import jax
    from jax.sharding import Mesh

    from stencilflow_tpu.parallel.domain import compile_sharded_chain
    if len(jax.devices()) < 4:
        import pytest
        pytest.skip("needs 4 virtual devices")
    p = _box(stages=4, dims=(32, 32, 64))
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("x", "y"))
    fn, plan = compile_sharded_chain(p, mesh, (None, "x", "y"),
                                     local_backend="stream",
                                     interpret=True)
    cfg = compile_sharded_chain.last_config
    assert cfg.get("composed") == {"s3": ["s0", "s1", "s2", "s3"]}, cfg
    inputs = sft.load_input_arrays(p, seed=5)
    sh = plan.input_shardings()
    import jax.numpy as jnp
    out = fn({n: jax.device_put(jnp.asarray(v), sh[n])
              for n, v in inputs.items()})
    oracle = sft.run_interpreter(p, inputs)
    assert _err(oracle, out, p.outputs[0]) < 3e-5
    # i-SHARDED decompositions compose too: the kernel globalizes the
    # table row via origin[0] + q, and the exchanged i-halo feeds the
    # composed operator's D-deep footprint
    fn_i, plan_i = compile_sharded_chain(p, mesh, ("x", "y", None),
                                         local_backend="stream",
                                         interpret=True)
    assert compile_sharded_chain.last_config.get("composed")
    out_i = fn_i({n: jax.device_put(jnp.asarray(v),
                                    plan_i.input_shardings()[n])
                  for n, v in inputs.items()})
    assert _err(oracle, out_i, p.outputs[0]) < 3e-5


def test_exact_interior_cancellation_keeps_boundary_diagonals():
    """(a[i-1]-a[i+1]) then (s[i-1]+s[i+1]): the interior composed
    weight at offset 0 cancels exactly, but the boundary-truncated
    i-matrix keeps nonzero entries on that diagonal — the plan must
    enumerate the product's diagonals, not the interior convolution
    (round-4 review finding, previously O(1) wrong on edge planes)."""
    spec = {
        "inputs": {"a": {"data": "random:0.0,1.0",
                         "data_type": "float32"}},
        "outputs": ["s1"], "dimensions": [16, 24, 32],
        "program": {
            "s0": {"computation_string": "s0 = a[i-1,j,k] - a[i+1,j,k]",
                   "boundary_conditions": {
                       "a": {"type": "constant", "value": 0.0}},
                   "data_type": "float32"},
            "s1": {"computation_string":
                   "s1 = s0[i-1,j,k] + s0[i+1,j,k]",
                   "boundary_conditions": {
                       "s0": {"type": "constant", "value": 0.0}},
                   "data_type": "float32"}}}
    p = sft.parse_program(spec, name="cancel")
    oracle, out, cfg = _run(p)
    assert cfg["composed"] == {"s1": ["s0", "s1"]}
    got = np.asarray(out["s1"])
    exp = np.asarray(oracle["s1"])
    assert np.abs(got - exp).max() < 3e-5          # incl. edge planes
    assert np.abs(exp[0]).max() > 0.01             # the edge is nonzero


def test_pipeline_split_composition():
    """The wavefront pipeline composes runs per segment: an 8-stage box
    chain over 2 devices becomes 2 composed radius-4 operators (the
    composition factor is capped so the composed program still has >= S
    kernels to split)."""
    import jax
    from jax.sharding import Mesh

    from stencilflow_tpu.parallel.pipeline import compile_pipeline_split
    if len(jax.devices()) < 2:
        import pytest
        pytest.skip("needs 2 virtual devices")
    p = sft.parse_program(
        synthesize_stencil(num_stages=8, dimensions=(32, 24, 32),
                           shape="box", extent=1,
                           seed_data="random:0.0,1.0"),
        name="ppbox_compose")
    mesh = Mesh(np.array(jax.devices()[:2]).reshape(1, 2), ("x", "y"))
    fn, _plan = compile_pipeline_split(p, mesh, "y",
                                       local_backend="stream",
                                       interpret=True)
    cfg = compile_pipeline_split.last_config
    assert cfg.get("composed") == {"s3": ["s0", "s1", "s2", "s3"],
                                   "s7": ["s4", "s5", "s6", "s7"]}, cfg
    import jax.numpy as jnp
    inputs = sft.load_input_arrays(p, seed=2)
    out = fn({k: jnp.asarray(v) for k, v in inputs.items()})
    oracle = sft.run_interpreter(p, inputs)
    assert _err(oracle, out, p.outputs[0]) < 3e-5
    # explicit cuts name ORIGINAL kernels: composition stays off there
    fn2, _ = compile_pipeline_split(p, mesh, "y",
                                    local_backend="stream",
                                    interpret=True, split_at=["s3"])
    assert not compile_pipeline_split.last_config.get("composed")
    out2 = fn2({k: jnp.asarray(v) for k, v in inputs.items()})
    assert _err(oracle, out2, p.outputs[0]) < 3e-5
