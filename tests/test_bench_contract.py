"""bench.py stdout contract: the driver captures only the last ~2000
chars of stdout and parses the FINAL JSON line — round 7's official
record came back ``parsed: null`` because the full per-query map
outgrew that. The compact line must stay inside its budget no matter
how many catalog entries the sweep accretes. No Spark needed: the line
builder is pure."""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bench import (  # noqa: E402
    BENCH_QUERIES,
    COMPACT_LINE_BUDGET,
    HEADLINE_KEYS,
    build_compact_line,
)


def _fake_inputs():
    # realistic worst-ish case: every sweep entry + the special
    # replay/lake/pq entries, three-decimal timings, full calibration
    timings = {k: 123.456 for k in BENCH_QUERIES}
    for k in HEADLINE_KEYS + ["pq_encode", "pq_topk_served"]:
        timings[k] = 123.456
    calibration = {
        s: {"jvm": 12.345, "arrow": 12.345}
        for s in ("replay_session_start", "sweep_session_start",
                  "sweep_session_end")
    }
    return timings, calibration


def test_compact_line_fits_budget_and_parses():
    timings, calibration = _fake_inputs()
    line = build_compact_line(timings, 9999.999, 0.1, 1_854_861,
                              calibration)
    assert len(line) <= COMPACT_LINE_BUDGET, len(line)
    doc = json.loads(line)
    # fields the round record depends on
    for field in ("value", "queries", "n_queries",
                  "segmented_over_default", "skew_split_over_default",
                  "full_map"):
        assert field in doc, field
    assert set(doc["queries"]) == set(HEADLINE_KEYS)
    assert doc["n_queries"] == len(timings)


def test_compact_line_oversize_drops_calibration_not_headlines():
    timings, calibration = _fake_inputs()
    # bloat calibration far past the budget: the fallback must shed IT
    calibration["padding"] = {f"k{i}": 1.0 for i in range(200)}
    line = build_compact_line(timings, 1.0, 0.1, 1, calibration)
    assert len(line) <= COMPACT_LINE_BUDGET, len(line)
    doc = json.loads(line)
    assert "calibration" not in doc
    assert set(doc["queries"]) == set(HEADLINE_KEYS)


def test_bench_queries_all_exist_and_are_unique():
    """A typo'd or stale name in BENCH_QUERIES crashes the driver's
    official bench run — the exact failure mode that cost round 7 its
    record. Every benched name must be a real catalog entry, once."""
    from polymarket_data_ingestor_spark.plans.catalog import CATALOG

    missing = [n for n in BENCH_QUERIES if n not in CATALOG]
    assert not missing, missing
    assert len(BENCH_QUERIES) == len(set(BENCH_QUERIES))
