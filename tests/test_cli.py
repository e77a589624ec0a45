"""CLI wiring tests (parser + path resolution; e2e is driven in verify)."""

from __future__ import annotations

from polymarket_data_ingestor_spark.cli import _resolve_paths, build_parser

from fixture_gen import write_fixture_files


def test_parser_replay_defaults():
    args = build_parser().parse_args(["replay", "-t", "24h"])
    assert args.command == "replay"
    assert args.output == "ticks.parquet"
    assert args.markets is None and not args.log_order


def test_parser_markets_formats():
    args = build_parser().parse_args(["markets", "iran", "--format", "csv"])
    assert args.filter == "iran"
    assert args.format == "csv"


def test_parser_collect_defaults():
    args = build_parser().parse_args(["collect", "--markets-file", "m.json"])
    assert args.command == "collect"
    assert args.out_dir == "data/raw"
    assert args.markets_file == "m.json"
    assert not args.sampling and not args.compress


def test_cmd_collect_end_to_end(tmp_path, monkeypatch):
    """`collect --markets-file` drives the real loop through the CLI with
    a fake transport injected at the module seam, producing a rotated
    framed log whose first frame is the market snapshot."""
    import json as _json

    from polymarket_data_ingestor_spark.cli import main
    from polymarket_data_ingestor_spark.streaming import collector as C

    markets = [{
        "condition_id": "0x" + "a" * 64,
        "enable_order_book": True, "accepting_orders": True,
        "archived": False, "closed": False,
        "tokens": [{"token_id": str(10**70 + 1)}],
    }]
    mf = tmp_path / "markets.json"
    mf.write_text(_json.dumps(markets))
    out = tmp_path / "logs"

    class FakeConn:
        def __init__(self):
            self.msgs = [_json.dumps([{"event_type": "x"}])] * 3

        def send(self, text):
            pass

        def recv(self, timeout):
            if not self.msgs:
                raise C.TransportClosed("eof")
            return self.msgs.pop(0)

        def close(self):
            self.closed = True

    conn = FakeConn()

    class FakeTransport(C.Transport):
        def __init__(self):
            pass

        def connect(self, url):
            if conn.msgs:
                return conn
            raise C.TransportClosed("done")

    monkeypatch.setattr(C, "WebsocketsTransport", FakeTransport)
    # stop once the scripted messages drain (collect polls stop() between
    # rounds; sleep is real here but bounded by the 0.5 s backoff)
    monkeypatch.setattr(C, "NORMAL_BACKOFF_S", 0.0)
    orig_collect = C.collect

    def patched_collect(out_dir, fetch_markets, **kw):
        kw["stop"] = lambda: not conn.msgs
        return orig_collect(out_dir, fetch_markets, **kw)

    monkeypatch.setattr(C, "collect", patched_collect)
    rc = main(["collect", "--out-dir", str(out),
               "--markets-file", str(mf)])
    assert rc == 0
    files = list(out.glob("*.jsonl"))
    assert len(files) == 1
    frames = [_json.loads(x) for x in files[0].read_text().splitlines()]
    assert frames[0]["message_type"] == "active_markets"
    assert sum(f["message_type"] == "feed_message" for f in frames) == 3
    assert frames[-1]["message_type"] == "shutdown_initiated"


def test_resolve_paths_prunes_and_sorts(tmp_path):
    write_fixture_files(tmp_path, n_hours=3, msgs_per_hour=5, seed=1)
    (tmp_path / "current").mkdir(exist_ok=True)
    (tmp_path / "current" / "log.jsonl").write_text("{}\n")  # must be ignored
    got = _resolve_paths(str(tmp_path), None,
                         "2025-09-30T15:00:00", "2025-09-30T16:00:00")
    assert [p.split("/")[-1] for p in got] == ["2025-09-30-15.jsonl"]
    all_ = _resolve_paths(str(tmp_path), None, None, None)
    assert len(all_) == 3
    assert all_ == sorted(all_)


def test_parser_lake_and_manifests():
    from polymarket_data_ingestor_spark.cli import build_parser

    p = build_parser()
    a = p.parse_args(["lake", "compact", "/tmp/x",
                      "--partition-filter", "dt < '2024-01-01'"])
    assert a.lake_command == "compact" and a.path == "/tmp/x"
    a = p.parse_args(["lake", "delete", "/tmp/x",
                      "--ids-parquet", "ids.parquet", "--id-col", "k"])
    assert a.id_col == "k"
    a = p.parse_args(["lake", "upsert", "/tmp/x",
                      "--updates-parquet", "u.parquet",
                      "--key-cols", "k1,k2",
                      "--partition-cols", "dt,src"])
    assert a.key_cols == "k1,k2" and a.partition_cols == "dt,src"
    a = p.parse_args(["manifests", "--data-dir", "/tmp/raw"])
    assert a.data_dir == "/tmp/raw"


def test_cmd_lake_roundtrip(spark, tmp_path, monkeypatch):
    """Drive delete + upsert + compact + manifests through main()."""
    import json as _json

    from polymarket_data_ingestor_spark import cli
    from polymarket_data_ingestor_spark.sinks import (
        with_date_partition,
        write_partitioned_lake,
    )

    # main() calls get_spark(); reuse the test session
    monkeypatch.setattr(cli, "get_spark", lambda **kw: spark)
    from pyspark.sql import functions as F

    events = with_date_partition(
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    )
    lake = str(tmp_path / "lake")
    write_partitioned_lake(events, lake, ("dt",))
    total = events.count()

    # delete 3 rows via the CLI
    victims = events.limit(3).select("event_id")
    ids_p = str(tmp_path / "ids.parquet")
    victims.write.parquet(ids_p)
    assert cli.main(["lake", "delete", lake,
                     "--ids-parquet", ids_p, "--id-col", "event_id"]) == 0
    assert spark.read.parquet(lake).count() == total - 3

    # upsert them back via the CLI
    upd_p = str(tmp_path / "upd.parquet")
    events.join(victims, "event_id", "semi").write.parquet(upd_p)
    assert cli.main(["lake", "upsert", lake,
                     "--updates-parquet", upd_p,
                     "--key-cols", "event_id"]) == 0
    assert spark.read.parquet(lake).count() == total

    # compact via the CLI
    assert cli.main(["lake", "compact", lake]) == 0
    assert spark.read.parquet(lake).count() == total

    # expire via the CLI: dry-run reports but deletes nothing, then the
    # real run drops everything below the max day (strict boundary)
    from pathlib import Path as _Path

    days = sorted(p.name.split("=", 1)[1]
                  for p in _Path(lake).iterdir() if p.name.startswith("dt="))
    assert len(days) >= 2
    assert cli.main(["lake", "expire", lake,
                     "--older-than", days[-1], "--dry-run"]) == 0
    assert (_Path(lake) / f"dt={days[0]}").exists()
    assert cli.main(["lake", "expire", lake,
                     "--older-than", days[-1]]) == 0
    assert not (_Path(lake) / f"dt={days[0]}").exists()
    assert (_Path(lake) / f"dt={days[-1]}").exists()

    # manifests backfill over a small frame-log dir
    raw = tmp_path / "raw"
    raw.mkdir()
    (raw / "2024-01-01-00.jsonl").write_text(_json.dumps(
        {"timestamp": "t", "message_type": "feed_message",
         "content": _json.dumps([{"event_type": "book", "timestamp": "1",
                                  "market": "m", "asset_id": "11111111",
                                  "bids": [], "asks": []}])}) + "\n")
    assert cli.main(["manifests", "--data-dir", str(raw)]) == 0
    from polymarket_data_ingestor_spark.manifest import read_manifest_max
    assert read_manifest_max(raw / "2024-01-01-00.jsonl") == 1


def test_cmd_lake_stats_incremental_matches_full(spark, tmp_path,
                                                 monkeypatch, capsys):
    """`lake stats`: fold day-1 then day-2 deltas into a summary state
    via the CLI; the maintained result must equal one aggregation over
    the union (the monoid contract, now operable from the shell), and
    a quantile run over the same state dir layout works end to end."""
    from polymarket_data_ingestor_spark import cli

    monkeypatch.setattr(cli, "get_spark", lambda **kw: spark)
    from pyspark.sql import functions as F

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    d1p, d2p = str(tmp_path / "d1"), str(tmp_path / "d2")
    ev.filter(F.col("event_id") % 2 == 0).write.parquet(d1p)
    ev.filter(F.col("event_id") % 2 == 1).write.parquet(d2p)
    state = str(tmp_path / "stat_state")

    for delta in (d1p, d2p):
        assert cli.main(["lake", "stats", delta, "--state", state,
                         "--stat", "summary", "--keys", "event_type",
                         "--value", "value"]) == 0
    from polymarket_data_ingestor_spark.streaming.live import (
        read_rollup_state,
    )
    got = {
        r["event_type"]: (r["n"], r["sum_v"])
        for r in read_rollup_state(spark, state).collect()
    }
    want = {
        r["event_type"]: (r["n"], r["sum_v"])
        for r in ev.groupBy("event_type").agg(
            F.count("value").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_v"),
        ).collect()
    }
    assert got == want

    # quantile stat over the same flow (fresh state dir)
    qstate = str(tmp_path / "q_state")
    assert cli.main(["lake", "stats", d1p, "--state", qstate,
                     "--stat", "quantiles", "--keys", "event_type",
                     "--value", "value", "--quantiles", "0.5"]) == 0
    assert cli.main(["lake", "stats", d2p, "--state", qstate,
                     "--stat", "quantiles", "--keys", "event_type",
                     "--value", "value", "--quantiles", "0.5"]) == 0
    out = capsys.readouterr().out
    assert "'p50':" in out and "keys)" in out

    # empty --keys refuses with exit 2
    assert cli.main(["lake", "stats", d1p, "--state", state,
                     "--stat", "summary", "--keys", "",
                     "--value", "value"]) == 2
    assert cli.main(["lake", "stats", d1p, "--state", state,
                     "--stat", "summary", "--keys", "event_type",
                     "--value", "value", "--retain-versions", "0"]) == 2


def test_cmd_lake_stats_versioned_commit(spark, tmp_path, monkeypatch):
    """The ADVICE-r10 hazard, pinned: `lake stats` state is MVCC —
    each fold commits a NEW v=N+1 directory, so a crash mid-write
    cannot destroy accumulated history; predecessors are GC'd only
    after the commit; a pre-versioned flat state dir is folded once
    as the implicit predecessor and then retired."""
    import pathlib

    from polymarket_data_ingestor_spark import cli
    from polymarket_data_ingestor_spark.operators.analytics import (
        rollup_state,
    )
    from polymarket_data_ingestor_spark.streaming.live import (
        read_rollup_state,
    )
    from pyspark.sql import functions as F

    monkeypatch.setattr(cli, "get_spark", lambda **kw: spark)
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    d1p, d2p = str(tmp_path / "d1"), str(tmp_path / "d2")
    ev.filter(F.col("event_id") % 2 == 0).write.parquet(d1p)
    ev.filter(F.col("event_id") % 2 == 1).write.parquet(d2p)

    # legacy FLAT state (what the pre-r11 CLI wrote) — one delta's worth
    state = str(tmp_path / "stat_state")
    rollup_state(spark.read.parquet(d1p), ("event_type",),
                 "value").coalesce(1).write.parquet(state)
    legacy_parts = list(pathlib.Path(state).glob("part-*"))
    assert legacy_parts  # layout sanity

    # fold delta 2: migrates the flat state into v=1 and retires it
    assert cli.main(["lake", "stats", d2p, "--state", state,
                     "--stat", "summary", "--keys", "event_type",
                     "--value", "value"]) == 0
    assert (pathlib.Path(state) / "v=1" / "_SUCCESS").exists()
    assert not list(pathlib.Path(state).glob("part-*"))  # retired
    want = {
        r["event_type"]: (r["n"], r["sum_v"])
        for r in rollup_state(ev, ("event_type",), "value").collect()
    }
    got = {
        r["event_type"]: (r["n"], r["sum_v"])
        for r in read_rollup_state(spark, state).collect()
    }
    assert got == want

    # crash mid-write of v=2 must leave v=1 (the full history) intact:
    # simulate it with a torn v=2 dir (files landed, no _SUCCESS)
    torn = pathlib.Path(state) / "v=2"
    torn.mkdir()
    (torn / "part-00000-torn.parquet").write_bytes(b"not parquet")
    # v=2 has no _SUCCESS → reader and the next fold both ignore it
    got_after = {
        r["event_type"]: (r["n"], r["sum_v"])
        for r in read_rollup_state(spark, state).collect()
    }
    assert got_after == want

    # next fold skips the torn dir (versions lists only committed) and
    # commits v=2 over it
    d3p = str(tmp_path / "d3")
    ev.limit(0).write.parquet(d3p)
    assert cli.main(["lake", "stats", d3p, "--state", state,
                     "--stat", "summary", "--keys", "event_type",
                     "--value", "value"]) == 0
    assert (pathlib.Path(state) / "v=2" / "_SUCCESS").exists()
    got_final = {
        r["event_type"]: (r["n"], r["sum_v"])
        for r in read_rollup_state(spark, state).collect()
    }
    assert got_final == want

    # r11 review finding: a crash BETWEEN the v=1 commit and the
    # legacy-file deletes must not orphan the flat files forever —
    # simulate the window by dropping a stale legacy part file next to
    # the committed versions; the next fold retires it (post-commit)
    # and does NOT fold its stale aggregates back in
    stray = pathlib.Path(state) / "part-00000-stale-legacy.parquet"
    rollup_state(spark.read.parquet(d1p), ("event_type",),
                 "value").coalesce(1).write.parquet(str(tmp_path / "sl"))
    import shutil as _sh

    _sh.copy(next((tmp_path / "sl").glob("part-*")), stray)
    assert cli.main(["lake", "stats", d3p, "--state", state,
                     "--stat", "summary", "--keys", "event_type",
                     "--value", "value"]) == 0
    assert not stray.exists()  # retired on the NEXT fold
    got_after_retire = {
        r["event_type"]: (r["n"], r["sum_v"])
        for r in read_rollup_state(spark, state).collect()
    }
    assert got_after_retire == want  # stale aggregates NOT re-folded

    # r11 third review: a pending label-compaction recovery manifest
    # at the state root is NOT legacy residue — the cumulative fold's
    # retirement must leave it alone (deleting it would brick that
    # compaction's recovery)
    manifest = pathlib.Path(state) / "_compact_d=m.json"
    manifest.write_text('{"labels": ["a"], "contract": null}')
    assert cli.main(["lake", "stats", d3p, "--state", state,
                     "--stat", "summary", "--keys", "event_type",
                     "--value", "value"]) == 0
    assert manifest.exists()


# ---------------------------------------------------------------------------
# r13 session-2 review fixes (cli.py + sinks.py)
# ---------------------------------------------------------------------------

def test_resolve_paths_dedups_compressed_siblings(tmp_path, capsys):
    """A compressed+uncompressed pair of the same hour must replay
    ONCE (compressed preferred), not silently double the hour's ticks
    (review finding)."""
    write_fixture_files(tmp_path, n_hours=2, msgs_per_hour=5, seed=4)
    flat = sorted(tmp_path.glob("*.jsonl"))
    # archival left both behind for the first hour
    (tmp_path / (flat[0].name + ".zst")).write_bytes(b"")
    got = _resolve_paths(str(tmp_path), None, None, None)
    names = [p.split("/")[-1] for p in got]
    assert len(got) == 2
    assert flat[0].name + ".zst" in names  # compressed preferred
    assert flat[0].name not in names
    assert "duplicate-hour" in capsys.readouterr().err


def test_parse_quantiles_pure_arg_validation():
    """--quantiles is validated BEFORE any Spark session / state
    commit: a post-commit parse crash steered operators into
    double-folding the delta (review finding)."""
    from polymarket_data_ingestor_spark.cli import _parse_quantiles

    assert _parse_quantiles("0.5,0.9,0.99") == (0.5, 0.9, 0.99)
    assert _parse_quantiles("0.5,") == (0.5,)  # trailing comma tolerated
    assert isinstance(_parse_quantiles("p50"), str)
    assert isinstance(_parse_quantiles(","), str)
    assert "in [0, 1]" in _parse_quantiles("0.5,1.5")

    import polymarket_data_ingestor_spark.cli as cli

    rc = cli.main([
        "lake", "stats", "/nonexistent-delta", "--stat", "quantiles",
        "--state", "/nonexistent-state", "--keys", "k", "--value", "v",
        "--quantiles", "p50",
    ])
    assert rc == 2  # refused in the pure-argument phase


def test_cmd_replay_all_empty_markets_refused(tmp_path):
    import polymarket_data_ingestor_spark.cli as cli

    write_fixture_files(tmp_path, n_hours=1, msgs_per_hour=5, seed=5)
    rc = cli.main([
        "replay", "--data-dir", str(tmp_path),
        "-o", str(tmp_path / "t.parquet"), "--markets", ",",
    ])
    assert rc == 2


def test_compact_refuses_data_column_filter(spark, tmp_path):
    """compact with a predicate on a NON-partition column would
    silently delete every non-matching row in the touched partitions
    while reporting success (review finding) — refused at analysis
    time, lake untouched."""
    import pytest as _pytest

    from polymarket_data_ingestor_spark.sinks import (
        compact_lake_partitions,
        write_partitioned_lake,
    )

    lake = str(tmp_path / "lake")
    df = spark.createDataFrame(
        [("2024-01-01", 1, 10.0), ("2024-01-01", 2, -5.0),
         ("2024-01-02", 3, 7.0)],
        "dt string, id int, price double",
    )
    write_partitioned_lake(df, lake, ("dt",))
    before = sorted(map(tuple, spark.read.parquet(lake).collect()))
    with _pytest.raises(ValueError, match="partition_filter"):
        compact_lake_partitions(
            spark, lake, ("dt",), partition_filter="price > 0"
        )
    assert sorted(map(tuple, spark.read.parquet(lake).collect())) == before
    # partition-column predicates still work
    n = compact_lake_partitions(
        spark, lake, ("dt",), partition_filter="dt < '2024-01-02'"
    )
    assert n == 1
    assert sorted(map(tuple, spark.read.parquet(lake).collect())) == before


def test_upsert_null_key_rows_replaced_not_duplicated(spark, tmp_path):
    """NULL-key rows must be REPLACED by a NULL-key update, not
    duplicated forever (review finding: plain anti-join never matches
    NULL = NULL; apply_cdc_stream accreted one copy per micro-batch)."""
    from polymarket_data_ingestor_spark.sinks import (
        upsert_lake_partitions,
        write_partitioned_lake,
    )

    lake = str(tmp_path / "lake")
    schema = "dt string, k string, v int"
    write_partitioned_lake(
        spark.createDataFrame(
            [("2024-01-01", None, 1), ("2024-01-01", "a", 2)], schema
        ),
        lake, ("dt",),
    )
    upsert_lake_partitions(
        spark, lake,
        spark.createDataFrame([("2024-01-01", None, 99)], schema),
        ("k",), ("dt",),
    )
    rows = {
        (r["k"], r["v"]) for r in spark.read.parquet(lake).collect()
    }
    assert rows == {(None, 99), ("a", 2)}


def test_register_bucketed_table_rejects_unsafe_identifiers(spark, tmp_path):
    import pytest as _pytest

    from polymarket_data_ingestor_spark.sinks import register_bucketed_table

    with _pytest.raises(ValueError, match="table identifier"):
        register_bucketed_table(
            spark, "t; DROP TABLE x", str(tmp_path), ("k",), 4
        )
    with _pytest.raises(ValueError, match="quote"):
        register_bucketed_table(
            spark, "t_ok", str(tmp_path) + "/o'brien", ("k",), 4
        )
