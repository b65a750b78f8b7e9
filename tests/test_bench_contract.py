"""The driver-robustness contract of bench.py (VERDICT r4 item #1).

The driver records the LAST stdout line of `python bench.py` as the
round's perf artifact, so the module-level helpers must guarantee:

- every emitted line is complete, self-contained JSON with the full
  schema (a timeout at any point leaves a parseable tail);
- the headline only ever moves up (a slower later mode never clobbers a
  faster earlier one);
- stages past the wall budget are skipped, not started.

These tests import bench.py without running main() — no device needed.
"""
import importlib
import json
import sys

import pytest


@pytest.fixture()
def bench(monkeypatch):
    monkeypatch.setenv("XNACALL_BENCH_BUDGET_S", "900")
    sys.modules.pop("bench", None)
    mod = importlib.import_module("bench")
    yield mod
    sys.modules.pop("bench", None)


REQUIRED_KEYS = {
    "metric", "value", "unit", "vs_baseline", "mode", "partial",
    "f16_samples_per_s_per_chip", "pure_device_samples_per_s_per_chip",
    "pure_device_f16_samples_per_s_per_chip",
    "pure_device_int8_samples_per_s_per_chip",
    "quantized_samples_per_s_per_chip", "train_samples_per_s_per_chip",
    "stitch_augment_samples_per_s_per_chip",
}


def test_initial_emit_is_parseable_zeroed_line(bench, capsys):
    # the pre-warmup emission: zeroed but schema-complete
    bench._emit()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    parsed = json.loads(line)
    assert REQUIRED_KEYS <= set(parsed)
    assert parsed["value"] == 0.0 and parsed["partial"] is True
    assert parsed["metric"] == "basecalled_samples_per_s_per_chip"


def test_every_emit_line_is_complete_json(bench, capsys):
    bench._set_headline(5.0e6, "f16/bf16")
    bench._emit()
    bench._set_headline(7.5e6, "f16/bf16")
    bench._emit()
    lines = [ln for ln in capsys.readouterr().out.splitlines() if ln.strip()]
    assert len(lines) == 2
    for ln in lines:
        assert REQUIRED_KEYS <= set(json.loads(ln))
    # latest-line-wins: the tail carries the newest headline
    assert json.loads(lines[-1])["value"] == 7.5e6


def test_headline_is_monotone_and_tracks_mode(bench):
    bench._set_headline(8.0e6, "f16/bf16")
    assert bench.RESULT["value"] == 8.0e6
    assert bench.RESULT["mode"] == "f16/bf16"
    assert bench.RESULT["vs_baseline"] == pytest.approx(8.0)
    # a slower later mode must NOT clobber the headline
    bench._set_headline(6.0e6, "int8-quantized")
    assert bench.RESULT["value"] == 8.0e6
    assert bench.RESULT["mode"] == "f16/bf16"
    bench._set_headline(9.0e6, "int8-quantized")
    assert bench.RESULT["mode"] == "int8-quantized"


def test_stage_skips_past_budget(bench, monkeypatch, capsys):
    monkeypatch.setattr(bench, "_BUDGET_S", 100.0)
    monkeypatch.setattr(bench, "_elapsed", lambda: 50.0)
    assert bench._stage("fits", min_budget_s=40.0) is True
    assert bench._stage("too-late", min_budget_s=60.0) is False
    err = capsys.readouterr().err
    assert "SKIP too-late" in err


def test_budget_env_override(monkeypatch):
    monkeypatch.setenv("XNACALL_BENCH_BUDGET_S", "123.5")
    sys.modules.pop("bench", None)
    mod = importlib.import_module("bench")
    try:
        assert mod._BUDGET_S == 123.5
    finally:
        sys.modules.pop("bench", None)
