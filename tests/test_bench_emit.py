"""bench.py emit-line contract: the one JSON line must always fit the
driver's 2000-char stdout window and stay parseable, no matter how many
queries fail or how verbose their exceptions are (round-5 ADVICE.md)."""

from __future__ import annotations

import json

from bench import fit_emit_line


def _result(timings, failures):
    return {
        "metric": "all_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "n_queries": len(timings),
        "queries": timings,
        "sf": 0.1,
    }


def test_small_run_emits_everything():
    timings = {f"q{i}": 0.5 for i in range(10)}
    line = fit_emit_line(_result(timings, {}), timings, {})
    emit = json.loads(line)
    assert emit["queries"] == timings
    assert "queries_omitted" not in emit
    assert "failures" not in emit


def test_many_queries_trimmed_from_tail():
    timings = {f"very_long_query_name_{i:04d}": 1.234 for i in range(200)}
    line = fit_emit_line(_result(timings, {}), timings, {})
    assert len(line) <= 1800
    emit = json.loads(line)
    # Head of the registry (priority order) survives; tail is dropped.
    assert "very_long_query_name_0000" in emit["queries"]
    assert emit["queries_omitted"] == len(timings) - len(emit["queries"])


def test_many_verbose_failures_still_fit():
    # Worst case: every query failed with a huge traceback — the failures
    # dict alone used to overflow the window after queries were exhausted.
    timings: dict[str, float] = {}
    failures = {f"failing_query_{i:03d}": "X" * 5000 for i in range(60)}
    line = fit_emit_line(_result(timings, failures), timings, failures)
    assert len(line) <= 1800
    emit = json.loads(line)
    assert emit["failures_total"] == 60
    assert all(len(v) <= 120 for v in emit["failures"].values())


def test_mixed_failures_and_timings_parseable_at_tiny_window():
    timings = {f"ok_{i}": 0.1 for i in range(50)}
    failures = {f"bad_{i}": "Boom: " + "y" * 300 for i in range(50)}
    line = fit_emit_line(_result(timings, failures), timings, failures, max_line=500)
    assert len(line) <= 500
    emit = json.loads(line)  # must never be cut mid-JSON
    assert emit["failures_total"] == 50
