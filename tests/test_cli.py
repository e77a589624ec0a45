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
