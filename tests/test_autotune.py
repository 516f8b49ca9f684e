"""Measured backend selection (autotune.py): candidate enumeration,
differenced-loop timing harness, cache round trip, CLI + driver wiring.

Timings on the CPU test platform are meaningless; these tests assert the
*mechanism* — every candidate runs correctly or is skipped with a scope
reason, the winner rebuilds from its cached label, and a second compile
hits the cache without re-measuring.
"""
import json
import subprocess
import sys

import numpy as np
import pytest

import stencilflow_tpu as sft
from stencilflow_tpu.autotune import (autotune, build_from_label, cache_key,
                                      compile_chain_autotuned)
from stencilflow_tpu.synthesize import jacobi


def small_program(name="at", size=16, iters=3):
    return sft.parse_program(jacobi(3, size, iterations=iters), name=name)


def test_autotune_picks_a_winner_and_all_candidates_agree():
    p = small_program()
    inputs = sft.load_input_arrays(p, seed=0)
    ref = np.asarray(sft.run_interpreter(p, inputs)[p.outputs[0]])
    res = autotune(p, interpret=True, trials=1)
    assert res.label in res.timings
    assert np.isfinite(res.seconds)
    # no candidate failed at runtime (scope skips are fine)
    assert not any(t == float("inf") for t in res.timings.values()), \
        res.skipped
    # the winner's fn computes the right answer
    got = res.fn({k: np.asarray(v) for k, v in inputs.items()})
    np.testing.assert_allclose(np.asarray(got[p.outputs[0]]), ref,
                               rtol=2e-5, atol=1e-6)


def test_build_from_label_roundtrip():
    p = small_program()
    inputs = sft.load_input_arrays(p, seed=0)
    ref = np.asarray(sft.run_interpreter(p, inputs)[p.outputs[0]])
    for label in ("stream", "panel:B=4", "xla"):
        fn = build_from_label(p, label, interpret=True)
        got = fn({k: np.asarray(v) for k, v in inputs.items()})
        np.testing.assert_allclose(np.asarray(got[p.outputs[0]]), ref,
                                   rtol=2e-5, atol=1e-6)
    with pytest.raises(KeyError):
        build_from_label(p, "nonsense")
    # the opt-in reduced-precision candidate builds from its label but
    # is NOT in the speed-only default set (accuracy is not a knob
    # autotune may trade silently)
    from stencilflow_tpu.autotune import DEFAULT_LABELS
    assert "stream:rings=bf16" not in DEFAULT_LABELS
    fn = build_from_label(p, "stream:rings=bf16", interpret=True)
    got = np.asarray(fn({k: np.asarray(v)
                         for k, v in inputs.items()})[p.outputs[0]])
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert 0 < rel < 2e-2


def test_cache_key_is_structural_not_data():
    base = jacobi(3, 16, iterations=2)
    p1 = sft.parse_program(base, name="k1")
    p2 = sft.parse_program(base, name="k2")  # name differs, structure same
    assert cache_key(p1) == cache_key(p2)
    bigger = jacobi(3, 24, iterations=2)
    assert cache_key(p1) != cache_key(sft.parse_program(bigger, name="k3"))
    # mode and lowering settings are part of the key: an emulation- or
    # no-MXU-tuned winner must never be served to a hardware/MXU run
    assert cache_key(p1) != cache_key(p1, interpret=True)
    assert cache_key(p1, mxu="auto") != cache_key(p1, mxu="off")


def test_compile_autotuned_cache_hit(tmp_path, monkeypatch):
    path = str(tmp_path / "autotune.json")
    p = small_program(size=12, iters=2)
    fn, label = compile_chain_autotuned(p, cache_path=path,
                                        interpret=True, trials=1)
    cache = json.load(open(path))
    assert len(cache) == 1
    [(key, rec)] = cache.items()
    assert rec["label"] == label

    # second call must resolve from the cache: poison autotune() to prove
    # no re-measurement happens
    import stencilflow_tpu.autotune as at
    monkeypatch.setattr(at, "autotune",
                        lambda *a, **k: (_ for _ in ()).throw(
                            AssertionError("re-measured on cache hit")))
    fn2, label2 = compile_chain_autotuned(p, cache_path=path,
                                          interpret=True)
    assert label2 == label
    inputs = sft.load_input_arrays(p, seed=0)
    ref = np.asarray(sft.run_interpreter(p, inputs)[p.outputs[0]])
    got = fn2({k: np.asarray(v) for k, v in inputs.items()})
    np.testing.assert_allclose(np.asarray(got[p.outputs[0]]), ref,
                               rtol=2e-5, atol=1e-6)


def test_stale_cache_label_retunes(tmp_path):
    path = str(tmp_path / "autotune.json")
    p = small_program(size=12, iters=2)
    key = cache_key(p, interpret=True, mxu="auto",
                    mxu_precision="split", spill="auto")
    json.dump({key: {"label": "gone:backend"}}, open(path, "w"))
    fn, label = compile_chain_autotuned(p, cache_path=path,
                                        interpret=True, trials=1)
    assert label != "gone:backend"
    assert json.load(open(path))[key]["label"] == label


def test_perturbation_loop_when_no_feedable_output():
    """A program whose output dtype differs from every input forces the
    scalar-carry timing loop."""
    spec = jacobi(3, 10, iterations=2)
    for k in spec["program"].values():
        k["data_type"] = "float64"
    p = sft.parse_program(spec, name="f64out")
    res = autotune(p, interpret=True, trials=1,
                   labels=["xla"])
    assert np.isfinite(res.seconds)


def test_cli_autotune(tmp_path):
    import os
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {**os.environ, "JAX_PLATFORMS": "cpu",
           "SFT_AUTOTUNE_CACHE": str(tmp_path / "c.json")}
    prog_path = tmp_path / "p.json"
    prog_path.write_text(json.dumps(jacobi(2, 12, iterations=2)))
    out = subprocess.run(
        [sys.executable, "-m", "stencilflow_tpu.cli", "autotune",
         str(prog_path), "--emulation", "--trials", "1", "--json"],
        capture_output=True, text=True, cwd=repo, env=env)
    assert out.returncode == 0, out.stderr
    # --json: stdout is exactly one machine-parseable line
    rec = json.loads(out.stdout)
    assert rec["winner"] in rec["timings"]
    assert (tmp_path / "c.json").exists()
    # and run consumes it
    out2 = subprocess.run(
        [sys.executable, "-m", "stencilflow_tpu.cli", "run",
         str(prog_path), "emulation", "--backend", "autotuned",
         "--compare-to-reference"],
        capture_output=True, text=True, cwd=repo, env=env)
    assert out2.returncode == 0, out2.stderr
    assert "autotuned:" in out2.stdout
    assert "verified against reference: OK" in out2.stdout
