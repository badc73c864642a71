"""bench.py result-emission logic (no TPU required).

The driver runs ``python bench.py`` at round end and records its single
JSON line; these tests pin the payload builder and the emit-once /
watchdog plumbing that guarantee that line is printed even when the
remote-TPU tunnel wedges a device call mid-bench (observed failure
mode: a trivial matmul blocking forever)."""

import importlib.util
import json

import pytest


@pytest.fixture()
def bench():
    spec = importlib.util.spec_from_file_location("bench_under_test",
                                                  "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


SPECS = {"B32": (32, 1), "B128": (128, 1), "B128_G4": (128, 4)}


def test_payload_best_config_and_ratio(bench):
    p = bench._train_payload(
        SPECS,
        {"B32": [100.0, 120.0], "B128": [200.0, 180.0], "B128_G4": []},
        {"B32": 50.0, "B128": 80.0},
        standin=2.0)
    assert p["value"] == 200.0
    assert p["config"].endswith("B=128")
    assert p["vs_baseline"] == 2.5          # same-config scan baseline
    assert p["vs_dispatch_standin"] == 100.0
    assert p["median"] == 190.0
    assert p["rounds"] == 2
    # configs with no completed rounds are dropped, not crashed on
    assert "B128_G4" not in p["fused_utts_per_sec"]
    json.dumps(p)                           # JSON-serializable


def test_payload_missing_scan_baseline(bench):
    p = bench._train_payload(SPECS, {"B32": [100.0]}, {}, None)
    assert p["value"] == 100.0
    assert p["vs_baseline"] is None
    assert p["vs_dispatch_standin"] is None


def test_payload_nothing_measured(bench):
    p = bench._train_payload(SPECS, {}, {}, None)
    assert p["value"] == 0.0
    assert p["vs_baseline"] is None
    json.dumps(p)


def test_emit_once_prints_exactly_one_line(bench, capsys):
    bench.emit_once({"value": 1})
    bench.emit_once({"value": 2})
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    assert json.loads(out[0]) == {"value": 1}


def test_watchdog_emits_partial_on_deadline(bench, capsys, monkeypatch):
    import os
    import time

    # deadline already passed; make the watchdog poll instantly and
    # capture the exit instead of killing pytest
    exited = []
    monkeypatch.setattr(os, "_exit", lambda code: exited.append(code))
    orig_wait = bench._emitted.wait
    monkeypatch.setattr(bench._emitted, "wait",
                        lambda timeout=None: orig_wait(0.01))
    bench._start_watchdog(time.time() - 100, 1.0,
                          lambda: {"value": 42.0})
    deadline = time.time() + 5
    while not exited and time.time() < deadline:
        time.sleep(0.01)
    assert exited == [0]
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    payload = json.loads(out[0])
    assert payload["value"] == 42.0
    assert "aborted" in payload


def test_payload_spread_and_round_samples(bench):
    import numpy as np
    # one slow outlier round must not dominate the recorded spread
    samples = [100.0] * 18 + [45.0, 101.0]
    p = bench._train_payload(
        SPECS, {"B32": samples}, {"B32": 50.0}, None,
        round_times={"B32": [(10.0 * i, v)
                             for i, v in enumerate(samples)]},
        deadline_hit=False)
    # decile spread excludes the one-window outlier; full range keeps it
    assert p["spread"] < 0.10
    assert p["spread_full_range"] > 0.5
    assert p["spread_def"].startswith("(p90-p10)")
    assert p["deadline_hit"] is False
    assert len(p["round_samples"]) == len(samples)
    assert p["round_samples"][3] == [30.0, 100.0]


def test_decile_spread_shrinks_with_stable_samples(bench):
    # range-based spread can only grow; decile spread converges
    v = [50.0, 100.0]
    assert bench._decile_spread(v) > 0.4
    v2 = v + [100.0] * 18
    assert bench._decile_spread(v2) < bench._decile_spread(v)
    assert bench._decile_spread([100.0]) == 0.0


def test_payload_real_trainer_headline(bench):
    """With warm trainer epochs measured, the headline VALUE comes from
    the real harness (median), vs_baseline from the B32_G4 scan twin,
    and the step-model numbers remain reported alongside."""
    p = bench._train_payload(
        {"B32_G4": (32, 4), "B256_G4": (256, 4)},
        {"B32_G4": [7000.0], "B256_G4": [7300.0, 7200.0]},
        {"B32_G4": 3500.0, "B256_G4": 3600.0},
        standin=2.0,
        trainer_rates=[7600.0, 7700.0, 7650.0])
    assert p["headline_source"] == "real_trainer"
    assert p["value"] == 7650.0                   # median warm epoch
    assert p["vs_baseline"] == round(7650.0 / 3500.0, 2)
    assert "NN.train_epoch" in p["config"]
    assert p["trainer_epochs_utts_per_sec"] == [7600.0, 7650.0, 7700.0]
    assert p["trainer_epoch_seconds"] == round(17306 / 7650.0, 2)
    # step-model numbers still present for round-over-round continuity
    assert p["fused_utts_per_sec"]["B256_G4"] == 7300.0
    json.dumps(p)


def test_payload_trainer_empty_falls_back_to_step_model(bench):
    p = bench._train_payload(
        {"B32_G4": (32, 4)}, {"B32_G4": [7000.0]}, {"B32_G4": 3500.0},
        None, trainer_rates=[])
    assert p["headline_source"] == "step_model_fallback"
    assert p["value"] == 7000.0
    assert "trainer_epochs_utts_per_sec" not in p


def test_payload_trainer_headline_survives_empty_step_models(bench):
    """Step models producing zero rounds must not discard a completed
    real-trainer measurement."""
    p = bench._train_payload(
        {"B32_G4": (32, 4)}, {}, {}, None,
        trainer_rates=[7600.0, 7700.0], trainer_n=1234)
    assert p["headline_source"] == "real_trainer"
    assert p["value"] == 7650.0
    assert "1234" in p["config"]
    assert p["trainer_epoch_seconds"] == round(1234 / 7650.0, 2)
    json.dumps(p)
