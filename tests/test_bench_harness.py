"""Scaling-harness logic tests (no subprocesses): bracketing canary
gate, median efficiency, and the append-not-truncate BASELINE
recorder."""

import importlib.util
import json
import os
import sys

import pytest


@pytest.fixture()
def bench(tmp_path, monkeypatch):
    spec = importlib.util.spec_from_file_location(
        "bench_under_test",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(mod, "REPO", str(tmp_path))
    return mod


def test_scaling_gate_brackets_and_appends(bench, tmp_path, monkeypatch):
    # canaries: attempt 0 = quiet/quiet, attempt 1 = quiet-BEFORE but
    # noisy AFTER (the Run C blind spot), attempt 2 = quiet/quiet
    canary_seq = iter([12.0, 12.1,   # attempt 0: valid
                       12.2, 30.0,   # attempt 1: load returned -> drop
                       12.3, 12.0])  # attempt 2: valid
    monkeypatch.setattr(bench, "run_canary", lambda: next(canary_seq))

    # legs: (8cpu, 32cpu) wall seconds per attempt; attempt 1's hi leg
    # is contention-garbage and must be excluded by the gate
    legs = iter([400.0, 125.0,    # eff 0.8
                 400.0, 390.0,    # eff 0.256 (poisoned)
                 400.0, 115.0])   # eff ~0.87
    calls = []

    class FakeProc:
        def __init__(self, val):
            self.stdout = json.dumps({
                "metric": "flagship_extract_sec", "value": val,
                "unit": "sec", "queries": {}, "sf": "x",
                "num_cpus": 0, "bench_docs": 300000,
                "docs_per_sec": 300000 / val}) + "\n"

    def fake_run(cmd, **kw):
        calls.append(kw.get("env", {}).get("WLOR_BENCH_CANARY"))
        return FakeProc(next(legs))

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    monkeypatch.setenv("WLOR_SCALING_TRIALS", "2")
    monkeypatch.setenv("WLOR_SCALING_MAX_ATTEMPTS", "3")
    monkeypatch.setenv("WLOR_SCALING_LO", "8")
    monkeypatch.setenv("WLOR_SCALING_HI", "32")

    result = bench.run_scaling()
    # gate: only attempts 0 and 2 are valid (attempt 1's post-canary
    # of 30s exceeds 1.25x the quietest)
    assert result["valid_trials"] == [0, 2]
    assert result["trials"] == 2
    # medians over valid trials: T8=400, T32=(125+115)/2=120 -> 0.833
    assert result["value"] == pytest.approx(0.833, abs=0.001)
    # every scaling subprocess must disable nested canary stamps
    assert all(c == "0" for c in calls)
    # canary pairs recorded per attempt
    assert result["canary_samples"] == [(12.0, 12.1), (12.2, 30.0),
                                        (12.3, 12.0)]
    # recorder appended a labeled section and preserved prior content
    p = tmp_path / "BASELINE.md"
    prior = "# BASELINE\n\nold table stays\n"
    p.write_text(prior + "\n## Measured results (bench.py --scaling)\n"
                 "\n### old run\n| keep | me |\n")
    bench._record_baseline(result)
    text = p.read_text()
    assert "old table stays" in text
    assert "### old run" in text          # NOT truncated
    assert "### 8v32 @300000 run" in text  # new section appended
    assert "BRACKETING" in text

def test_scaling_all_trials_invalid_does_not_crash(bench, tmp_path,
                                                   monkeypatch):
    """If every attempt fails the canary gate, the harness must fall
    back to all-sample medians instead of crashing on median([])."""
    canary_seq = iter([12.0, 40.0, 12.0, 40.0])
    monkeypatch.setattr(bench, "run_canary", lambda: next(canary_seq))
    legs = iter([400.0, 200.0, 420.0, 210.0])

    class FakeProc:
        def __init__(self, val):
            self.stdout = json.dumps({
                "metric": "flagship_extract_sec", "value": val,
                "unit": "sec", "queries": {}, "sf": "x",
                "num_cpus": 0, "bench_docs": 300000,
                "docs_per_sec": 300000 / val}) + "\n"

    monkeypatch.setattr(bench.subprocess, "run",
                        lambda cmd, **kw: FakeProc(next(legs)))
    monkeypatch.setenv("WLOR_SCALING_TRIALS", "2")
    monkeypatch.setenv("WLOR_SCALING_MAX_ATTEMPTS", "2")
    monkeypatch.setenv("WLOR_SCALING_LO", "8")
    monkeypatch.setenv("WLOR_SCALING_HI", "32")
    result = bench.run_scaling()
    assert result["trials"] == 2          # fell back to all samples
    assert result["value"] == pytest.approx((410 / 205) / 4, abs=0.001)
