"""Smoke test for the driver-facing artifacts: bench.py must keep
producing its one-line JSON contract on tiny shapes (the driver runs it
unattended at the end of every round — API drift must fail HERE, not
there)."""

import importlib.util
import json
import os
import pathlib

import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]

KNOWN_KEYS = {
    "metric", "value", "unit", "vs_baseline", "cli_io_value",
    "cli_io_error", "mesh_devices", "kernel_gflops_per_mol_step",
    "achieved_tflops", "mfu_vs_peak",
}


def _run_bench(monkeypatch, capsys, extra_env=()):
    for k, v in {
        "BENCH_BATCH": "2",
        "BENCH_ATOMS": "16",
        "BENCH_STEPS": "40",  # must cross halfway so the second-half
        # (and the cli_io corroboration's) throughput window is nonempty
        "BENCH_CHUNK": "10",
        "BENCH_ORDER": "8",
        "BENCH_NBR_INTERVAL": "1",
        **dict(extra_env),
    }.items():
        monkeypatch.setenv(k, v)
    spec = importlib.util.spec_from_file_location(
        "bench", os.fspath(REPO / "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    result = mod.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    parsed = json.loads(line)
    assert parsed == result
    return parsed


def test_bench_main_json_contract(monkeypatch, capsys):
    parsed = _run_bench(monkeypatch, capsys)
    assert {"metric", "value", "unit", "vs_baseline"} <= set(parsed)
    assert set(parsed) <= KNOWN_KEYS
    assert parsed["unit"] == "timestep*mol/s"
    assert parsed["value"] > 0
    assert parsed["vs_baseline"] == round(parsed["value"] / 2861.0, 3)
    # FLOP/MFU accounting (VERDICT r3 missing #3): the cheb default must
    # report analytic kernel FLOPs and fraction-of-peak.
    assert parsed["kernel_gflops_per_mol_step"] > 0
    assert parsed["achieved_tflops"] >= 0
    assert 0 <= parsed["mfu_vs_peak"] < 1
    # The production-loop corroboration run (real file IO) must succeed
    # and report a plausible throughput, not an error.
    assert "cli_io_error" not in parsed, parsed["cli_io_error"]
    assert parsed["cli_io_value"] > 0


def test_bench_mesh_plumbing(monkeypatch, capsys):
    """BENCH_MESH=N (BASELINE config 5): the bench must build an N-device
    replica mesh, shard the rollout, and report mesh_devices — validated
    on the 8-device virtual CPU mesh so a future pod run is one
    command."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs the multi-device virtual mesh")
    parsed = _run_bench(
        monkeypatch, capsys,
        extra_env={"BENCH_MESH": "2", "BENCH_CLI_IO": "0"},
    )
    assert parsed["mesh_devices"] == 2
    assert parsed["value"] > 0
