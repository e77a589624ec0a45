"""Tests for the tick query layer (bars / summary / outcome join / top-of-book)."""

from __future__ import annotations

import pandas as pd
import pytest

from polymarket_data_ingestor_spark.operators.bars import (
    bbo_bars,
    label_outcomes,
    ohlc_bars,
    top_of_book,
    trade_summary,
    twap_bars,
    volume_bars,
    vwap_bars,
)
from polymarket_data_ingestor_spark.operators.replay import replay, with_event_time
from polymarket_data_ingestor_spark.sources.frames import read_frames
from polymarket_data_ingestor_spark.sources.markets import (
    market_tokens,
    read_market_info,
)

from fixture_gen import naive_replay, write_fixture_files

TICK_COLS = ["timestamp", "kind", "market", "asset", "side", "price", "size"]


@pytest.fixture(scope="module")
def ticks_env(spark, tmp_path_factory):
    paths = write_fixture_files(tmp_path_factory.mktemp("bars"), n_hours=2,
                                msgs_per_hour=200, seed=11)
    spaths = [str(p) for p in paths]
    ticks = with_event_time(replay(spark, spaths, ticks_only=False))
    oracle = pd.DataFrame(naive_replay(paths), columns=TICK_COLS)
    oracle["event_time"] = pd.to_datetime(
        oracle["timestamp"].astype("int64"), unit="ms"
    )
    return spark, spaths, ticks, oracle


def test_bbo_bars_last_semantics(ticks_env):
    _, _, ticks, oracle = ticks_env
    got = bbo_bars(ticks, "1 minute").toPandas()
    bbo = oracle[oracle["kind"] == "BBO"].copy()
    bbo["bar_time"] = bbo["event_time"].dt.floor("1min")
    # naive_replay output is in strict log order → groupby last is correct
    want = (bbo.groupby(["bar_time", "asset", "side"], as_index=False)
               .agg(price=("price", "last"), size=("size", "last")))
    got = got.sort_values(["bar_time", "asset", "side"]).reset_index(drop=True)
    want = want.sort_values(["bar_time", "asset", "side"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["bar_time", "asset", "side", "price", "size"]], want,
        check_dtype=False,
    )


def test_volume_bars(ticks_env):
    _, _, ticks, oracle = ticks_env
    got = volume_bars(ticks, "1 hour").toPandas()
    tr = oracle[oracle["kind"] == "TRADE"].copy()
    tr["bar_time"] = tr["event_time"].dt.floor("1h")
    want = (tr.groupby(["bar_time", "asset"], as_index=False)
              .agg(volume=("size", "sum"), n_trades=("size", "count")))
    got = got.sort_values(["bar_time", "asset"]).reset_index(drop=True)
    want = want.sort_values(["bar_time", "asset"]).reset_index(drop=True)
    assert got["n_trades"].tolist() == want["n_trades"].tolist()
    assert got["volume"].tolist() == pytest.approx(want["volume"].tolist())


def test_ohlc_bars(ticks_env):
    _, _, ticks, oracle = ticks_env
    got = ohlc_bars(ticks, "1 minute").toPandas()
    tr = oracle[oracle["kind"] == "TRADE"].copy()
    tr["bar_time"] = tr["event_time"].dt.floor("1min")
    # naive_replay output is in strict log order → first/last are correct
    want = (tr.groupby(["bar_time", "asset"], as_index=False)
              .agg(open=("price", "first"), high=("price", "max"),
                   low=("price", "min"), close=("price", "last"),
                   volume=("size", "sum"), n_trades=("size", "count")))
    got = got.sort_values(["bar_time", "asset"]).reset_index(drop=True)
    want = want.sort_values(["bar_time", "asset"]).reset_index(drop=True)
    for c in ("open", "high", "low", "close"):
        assert got[c].tolist() == want[c].tolist(), c
    assert got["n_trades"].tolist() == want["n_trades"].tolist()
    assert got["volume"].tolist() == pytest.approx(want["volume"].tolist())


def test_twap_bars(ticks_env):
    _, _, ticks, oracle = ticks_env
    got = twap_bars(ticks, "1 hour").toPandas()
    bbo = oracle[oracle["kind"] == "BBO"].copy().reset_index(drop=True)
    bbo["t"] = bbo["event_time"].astype("int64") // 1000  # µs
    bbo["bar_time"] = bbo["event_time"].dt.floor("1h")
    bbo["end"] = (bbo["bar_time"] + pd.Timedelta(hours=1)).astype("int64") // 1000
    # TWAP orders observations by exchange TIME (ties broken by log
    # order) — the feed's exchange timestamps are not monotone in log
    # order, so sort before the groupby-shift (mergesort = stable, log
    # order preserved within equal timestamps)
    bbo = bbo.sort_values("t", kind="mergesort").reset_index(drop=True)
    bbo["nxt"] = bbo.groupby(["asset", "side"])["t"].shift(-1)
    bbo["dur"] = bbo[["nxt", "end"]].min(axis=1).fillna(bbo["end"]) - bbo["t"]
    want = (
        bbo.assign(pd_=bbo["price"] * bbo["dur"])
        .groupby(["bar_time", "asset", "side"], as_index=False)
        .agg(pd_=("pd_", "sum"), d=("dur", "sum"), n_obs=("dur", "count"))
    )
    want["twap"] = want["pd_"] / want["d"]
    keys = ["bar_time", "asset", "side"]
    got = got.sort_values(keys).reset_index(drop=True)
    want = want.sort_values(keys).reset_index(drop=True)
    assert got["n_obs"].tolist() == want["n_obs"].tolist()
    assert got["twap"].tolist() == pytest.approx(want["twap"].tolist())


def test_vwap_bars(ticks_env):
    _, _, ticks, oracle = ticks_env
    got = vwap_bars(ticks, "1 hour", by=("asset",)).toPandas()
    tr = oracle[oracle["kind"] == "TRADE"].copy()
    tr["bar_time"] = tr["event_time"].dt.floor("1h")
    want = (
        tr.assign(ps=tr["price"] * tr["size"])
        .groupby(["bar_time", "asset"], as_index=False)
        .agg(ps=("ps", "sum"), volume=("size", "sum"), n_trades=("size", "count"))
    )
    want["vwap"] = want["ps"] / want["volume"]
    keys = ["bar_time", "asset"]
    got = got.sort_values(keys).reset_index(drop=True)
    want = want.sort_values(keys).reset_index(drop=True)
    assert got[keys].values.tolist() == want[keys].values.tolist()
    assert got["n_trades"].tolist() == want["n_trades"].tolist()
    assert got["vwap"].tolist() == pytest.approx(want["vwap"].tolist())
    assert got["volume"].tolist() == pytest.approx(want["volume"].tolist())


def test_vwap_zero_volume_bucket_is_null_not_abort(spark):
    """A bucket whose trades all have size 0 has no defined VWAP: it
    must emit a NULL vwap row, not abort the job with an ANSI
    DIVIDE_BY_ZERO (zero sizes are finite, so the replay packer's
    non-finite rejection does not screen them — one poison bucket
    would kill a full-corpus rollup). DuckDB's 0.0/0.0 is NULL, so
    NULL also keeps the oracle pair exact on this input class."""
    import pyspark.sql.functions as F

    ticks = spark.createDataFrame(
        [
            ("TRADE", "a", "2024-01-01 00:01:00", 0.5, 0.0),
            ("TRADE", "a", "2024-01-01 00:02:00", 0.6, 0.0),
            ("TRADE", "b", "2024-01-01 00:01:00", 0.5, 2.0),
        ],
        "kind string, asset string, event_time string, "
        "price double, size double",
    ).withColumn("event_time", F.col("event_time").cast("timestamp"))
    rows = {
        r["asset"]: (r["vwap"], r["volume"], r["n_trades"])
        for r in vwap_bars(ticks).collect()
    }
    assert rows["a"] == (None, 0.0, 2)
    assert rows["b"][0] == pytest.approx(0.5) and rows["b"][2] == 1


def test_trade_summary(ticks_env):
    _, _, ticks, oracle = ticks_env
    got = trade_summary(ticks).toPandas().iloc[0]
    tr = oracle[oracle["kind"] == "TRADE"]
    assert got["price_count"] == len(tr)
    assert got["price_mean"] == pytest.approx(tr["price"].mean())
    assert got["price_std"] == pytest.approx(tr["price"].std())
    assert got["size_p50"] == pytest.approx(tr["size"].median())
    assert got["price_min"] == tr["price"].min()
    assert got["size_max"] == tr["size"].max()


def test_label_outcomes_broadcast(ticks_env):
    spark, spaths, ticks, _ = ticks_env
    tokens = market_tokens(read_market_info(read_frames(spark, spaths)))
    labeled = label_outcomes(ticks, tokens)
    assert labeled.filter("outcome IS NULL").count() == 0
    assert set(r.outcome for r in labeled.select("outcome").distinct().collect()) \
        == {"Yes", "No"}
    # the join must be planned as a broadcast
    assert "BroadcastHashJoin" in labeled._jdf.queryExecution().executedPlan().toString()


def test_top_of_book_matches_final_state(ticks_env):
    _, _, ticks, oracle = ticks_env
    got = top_of_book(ticks).toPandas()
    bbo = oracle[oracle["kind"] == "BBO"]
    want = bbo.groupby(["asset", "side"], as_index=False).last()
    merged = got.merge(want, on=["asset", "side"], suffixes=("_g", "_w"))
    assert len(merged) == len(got) == len(want)
    assert (merged["price_g"] == merged["price_w"]).all()
    assert (merged["size_g"] == merged["size_w"]).all()
