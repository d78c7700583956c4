"""Smoke test for the driver-facing artifacts: bench.py must keep
producing its one-line JSON contract on tiny shapes (the driver runs it
unattended at the end of every round — API drift must fail HERE, not
there)."""

import importlib.util
import json
import os
import pathlib

REPO = pathlib.Path(__file__).resolve().parents[1]


def test_bench_main_json_contract(monkeypatch, capsys):
    for k, v in {
        "BENCH_BATCH": "2",
        "BENCH_ATOMS": "16",
        "BENCH_STEPS": "40",  # must cross halfway so the second-half
        # (and the cli_io corroboration's) throughput window is nonempty
        "BENCH_CHUNK": "10",
        "BENCH_ORDER": "8",
        "BENCH_NBR_INTERVAL": "1",
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
    assert {"metric", "value", "unit", "vs_baseline"} <= set(parsed)
    assert set(parsed) <= {
        "metric", "value", "unit", "vs_baseline", "cli_io_value",
        "cli_io_error",
    }
    assert parsed["unit"] == "timestep*mol/s"
    assert parsed["value"] > 0
    assert parsed["vs_baseline"] == round(parsed["value"] / 2861.0, 3)
    # The production-loop corroboration run (real file IO) must succeed
    # and report a plausible throughput, not an error.
    assert "cli_io_error" not in parsed, parsed["cli_io_error"]
    assert parsed["cli_io_value"] > 0
