"""Streaming tests: collector semantics + live tick generation parity."""

from __future__ import annotations

import json
from datetime import datetime, timedelta, timezone
from pathlib import Path

import pandas as pd
import pytest

from polymarket_data_ingestor_spark.operators.replay import TICK_COLUMNS, replay
from polymarket_data_ingestor_spark.streaming.collector import (
    FrameWriter,
    split_markets,
    subscribe_message,
    take_chunk,
)
from polymarket_data_ingestor_spark.streaming.live import (
    live_ticks,
    read_frames_stream,
)

from fixture_gen import make_markets, naive_replay, write_fixture_files


# --- sharding (mirrors the reference's own split_markets unit tests,
#     collector/src/client/mod.rs:416-506) ---------------------------------

def _mkt(n_tokens: int, i: int = 0) -> dict:
    return {
        "condition_id": f"m{i}",
        "tokens": [{"token_id": f"t{i}_{j}"} for j in range(n_tokens)],
    }


def test_split_markets_empty():
    assert split_markets([]) == []


def test_split_markets_single():
    chunks = split_markets([_mkt(2)])
    assert [len(c) for c in chunks] == [1]


def test_split_markets_even_fill():
    # 25 markets x 2 tokens: 12 markets (24 assets) then boundary at 25
    markets = [_mkt(2, i) for i in range(25)]
    chunks = split_markets(markets)
    assert sum(len(c) for c in chunks) == 25
    for c in chunks:
        assert sum(len(m["tokens"]) for m in c) <= 25


def test_split_markets_oversized_alone():
    markets = [_mkt(30, 0), _mkt(2, 1)]
    chunks = split_markets(markets)
    assert len(chunks) == 2
    assert [m["condition_id"] for m in chunks[0]] == ["m0"]


def test_take_chunk_boundary():
    # 12 x 2 = 24, next market of 2 would exceed 25 → split at 12
    markets = [_mkt(2, i) for i in range(13)]
    chunk, rest = take_chunk(markets)
    assert len(chunk) == 12
    assert len(rest) == 1


def test_subscribe_message_shape():
    msg = json.loads(subscribe_message([_mkt(2, 0), _mkt(1, 1)]))
    assert msg["type"] == "MARKET"
    assert msg["assets_ids"] == ["t0_0", "t0_1", "t1_0"]


# --- FrameWriter rotation --------------------------------------------------

def test_frame_writer_rotation_and_headers(tmp_path):
    clock = {"now": datetime(2025, 9, 30, 14, 59, 58, tzinfo=timezone.utc)}
    w = FrameWriter(tmp_path, markets=make_markets(),
                    now=lambda: clock["now"])
    w.handle_message(json.dumps([{"event_type": "book"}]))
    w.handle_message("PONG")
    clock["now"] += timedelta(seconds=5)  # crosses the hour boundary
    w.handle_message(json.dumps([{"event_type": "last_trade_price"}]))
    final = w.shutdown()

    files = sorted(p.name for p in tmp_path.glob("*.jsonl"))
    assert files == ["2025-09-30-14.jsonl", "2025-09-30-15.jsonl"]
    assert final.name == "2025-09-30-15.jsonl"
    for f in files:
        lines = [json.loads(x) for x in
                 (tmp_path / f).read_text().splitlines()]
        # line-1 invariant: active_markets snapshot first (main.rs:176-179)
        assert lines[0]["message_type"] == "active_markets"
        assert json.loads(lines[0]["content"])["count"] == 4
    last = [json.loads(x) for x in
            (tmp_path / files[1]).read_text().splitlines()]
    assert last[-1]["message_type"] == "shutdown_initiated"


def test_frame_writer_output_replays(spark, tmp_path):
    """Collector output must be directly replayable by the batch engine."""
    t = {"now": datetime(2025, 9, 30, 14, 0, 1, tzinfo=timezone.utc)}
    w = FrameWriter(tmp_path, markets=make_markets(), now=lambda: t["now"])
    mkt, asset = "0x" + "9" * 64, str(10**70)
    w.handle_message(json.dumps([{
        "event_type": "book", "timestamp": "1000", "market": mkt,
        "asset_id": asset, "bids": [{"price": "0.4", "size": "7"}],
        "asks": [{"price": "0.6", "size": "3"}]}]))
    w.handle_message("PONG")
    w.shutdown()
    rows = [tuple(r) for r in
            replay(spark, [str(tmp_path / "2025-09-30-14.jsonl")],
                   in_log_order=True, ticks_only=False)
            .select(*TICK_COLUMNS).collect()]
    assert rows == [
        ("1000", "BBO", mkt, asset, "ASK", 0.6, 3.0),
        ("1000", "BBO", mkt, asset, "BID", 0.4, 7.0),
    ]


# --- live streaming tick generation ---------------------------------------

@pytest.mark.slow
def test_live_ticks_matches_batch_replay(spark, tmp_path):
    """Streaming (1 file per micro-batch, state across batches) ≡ batch."""
    src = tmp_path / "frames"
    paths = write_fixture_files(src, n_hours=3, msgs_per_hour=80, seed=21)
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"

    stream = read_frames_stream(spark, str(src) + "/*.jsonl",
                                max_files_per_trigger=1)
    q = (
        live_ticks(stream)
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = (
        pd.read_parquet(out)
        .sort_values(TICK_COLUMNS, kind="mergesort")
        .reset_index(drop=True)
    )
    want = (
        pd.DataFrame(naive_replay(paths), columns=TICK_COLUMNS)
        .sort_values(TICK_COLUMNS, kind="mergesort")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
