"""Driver-window rotation invariants.

The driver records correctness rows for only the FIRST 50 catalog
entries each round, so the registration-order epilogue
(plans/catalog_trainingdata.py) computes a staleness-priority queue
from the committed driver history (CORRECTNESS_r0*.json). These tests
pin the contract the queue exists to satisfy — no Spark session needed,
pure ordering checks.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

from polymarket_data_ingestor_spark.plans.catalog import CATALOG
from polymarket_data_ingestor_spark.plans.catalog_trainingdata import (
    _CODE_CHANGED_THIS_ROUND,
    _driver_green_history,
)

REPO = Path(__file__).resolve().parents[1]
WINDOW = 50


def test_window_is_all_oracle_paired_rows_only_pinned_last():
    """A window slot spent on a rows-only (no-oracle) entry can only
    ever produce an `err` row — every one of the first 50 entries must
    carry oracle SQL, and every rows-only entry sits past 50."""
    names = list(CATALOG)
    for n in names[:WINDOW]:
        assert CATALOG[n].sql is not None, n
    for n, q in CATALOG.items():
        if q.sql is None:
            assert names.index(n) >= WINDOW, (n, names.index(n))


def test_code_changed_entries_lead_the_window():
    """Entries whose code changed this round get first-party driver
    rows in their own round — they occupy the head of the queue."""
    names = list(CATALOG)
    k = len(_CODE_CHANGED_THIS_ROUND)
    assert set(names[:k]) == set(_CODE_CHANGED_THIS_ROUND)
    for n in _CODE_CHANGED_THIS_ROUND:
        assert n in CATALOG, n


def test_no_oracle_entry_goes_three_rounds_stale():
    """The staleness contract: after THIS round runs, no oracle-paired
    entry may be >= 3 rounds without a green driver row. Equivalently:
    every entry whose last green row is <= (latest recorded round - 2),
    including never-green entries, must be inside the current window."""
    last = _driver_green_history()
    rounds = [
        int(m.group(1))
        for p in REPO.glob("CORRECTNESS_r*.json")
        if (m := re.search(r"r(\d+)", p.name))
    ]
    assert rounds, "driver history missing from repo root"
    latest = max(rounds)
    names = list(CATALOG)
    window = set(names[:WINDOW])
    must_rotate = [
        n
        for n, q in CATALOG.items()
        if q.sql is not None and last.get(n, 0) <= latest - 2
    ]
    # the contract is only satisfiable while the must-rotate set fits
    assert len(must_rotate) <= WINDOW, len(must_rotate)
    missed = [n for n in must_rotate if n not in window]
    assert not missed, missed


def test_history_parser_ignores_err_and_mismatch_rows():
    """An `err` or hash-mismatch row must NOT count as green (r8: two
    err rows had to re-promote their entries to the window head)."""
    last = _driver_green_history()
    # r8's two err rows: their only driver exposure ever was an err
    for p in sorted(REPO.glob("CORRECTNESS_r*.json")):
        doc = json.loads(p.read_text())
        for name, row in doc.items():
            if isinstance(row, dict) and row.get("hash_match") is True:
                assert last.get(name, 0) >= 1, name
    for name, rnd in last.items():
        assert any(
            json.loads(p.read_text()).get(name, {}).get("hash_match") is True
            for p in REPO.glob(f"CORRECTNESS_r{rnd:02d}.json")
        ), (name, rnd)
