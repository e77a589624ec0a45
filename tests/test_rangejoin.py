"""Range join + multi-resolution rollup semantics tests."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from polymarket_data_ingestor_spark.operators.rangejoin import (
    multi_resolution_bars,
    range_join_count,
)


def _ts(minute, second=0):
    return datetime(2024, 1, 1, 10, minute, second)


def test_range_join_window_bounds(spark):
    probe = spark.createDataFrame(
        [(1, 100, _ts(20))], "event_id long, user_id long, ts timestamp"
    )
    ref = spark.createDataFrame(
        [
            (100, _ts(10, 0)),   # exactly -10min: EXCLUDED (strict >)
            (100, _ts(10, 1)),   # inside
            (100, _ts(19, 59)),  # inside
            (100, _ts(20, 0)),   # same instant: INCLUDED (<=)
            (100, _ts(20, 1)),   # after: excluded
            (999, _ts(19, 0)),   # other user: excluded
        ],
        "user_id long, ts timestamp",
    )
    out = range_join_count(probe, ref, key="user_id", window_seconds=600)
    assert out.first().n_in_window == 3


def test_range_join_identical_probe_rows_stay_distinct(spark):
    """Two fully identical probe rows must yield two output rows with the
    correct per-row count (not one collapsed row with a doubled count)."""
    probe = spark.createDataFrame(
        [(1, 100, _ts(20)), (1, 100, _ts(20))],
        "event_id long, user_id long, ts timestamp",
    )
    ref = spark.createDataFrame(
        [(100, _ts(19)), (100, _ts(18))], "user_id long, ts timestamp"
    )
    out = range_join_count(probe, ref, key="user_id",
                           window_seconds=600).collect()
    assert [r.n_in_window for r in out] == [2, 2]


def test_range_join_no_reference(spark):
    probe = spark.createDataFrame(
        [(1, 5, _ts(0))], "event_id long, user_id long, ts timestamp"
    )
    ref = spark.createDataFrame([], "user_id long, ts timestamp")
    assert range_join_count(probe, ref, key="user_id").first().n_in_window == 0


def test_multires_minute_matches_direct(spark):
    from polymarket_data_ingestor_spark.plans.catalog import table

    e = table(spark, "/root/testdata/sf0.001", "events")
    minute, hour = multi_resolution_bars(e)
    # minute level equals a direct computation from raw
    direct = (
        e.groupBy(F.date_trunc("minute", "ts").alias("bar_time"), "event_type")
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
            .alias("total"),
            F.count(F.lit(1)).alias("n"),
            F.max_by("value", "event_id").alias("last_value"),
        )
    )
    assert minute.exceptAll(direct).count() == 0
    assert direct.exceptAll(minute).count() == 0
    # hour totals equal the sum of their minutes (lossless composition)
    recomposed = (
        minute.groupBy(
            F.date_trunc("hour", "bar_time").alias("bar_time"), "event_type"
        ).agg(F.round(F.sum("total"), 6).alias("total"))
    )
    hr = hour.select("bar_time", "event_type", F.round("total", 6).alias("total"))
    assert hr.exceptAll(recomposed).count() == 0


def test_interval_overlap_join_semantics(spark):
    """Half-open [start,end): touching endpoints do not overlap; a long
    interval spanning many bins still pairs EXACTLY once (the
    max-start-bin rule replaces a distinct pass); empty intervals match
    nothing."""
    from datetime import datetime, timedelta, timezone

    from polymarket_data_ingestor_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    base = datetime(2024, 1, 1, tzinfo=timezone.utc)

    def t(minute):
        return base + timedelta(minutes=minute)

    left = spark.createDataFrame(
        [
            ("u", 1, t(0), t(50)),    # spans 5 bins at 600s
            ("u", 2, t(10), t(10)),   # empty
            ("u", 3, t(30), t(35)),
            ("v", 4, t(0), t(10)),    # other key
        ],
        "user string, lid long, start timestamp, end timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u", 10, t(45), t(55)),  # overlaps 1 only
            ("u", 11, t(35), t(40)),  # touches 3's end -> NO overlap
            ("u", 12, t(31), t(32)),  # inside 3 (and 1)
            ("w", 13, t(0), t(60)),   # other key
        ],
        "user string, rid long, start timestamp, end timestamp",
    )
    got = sorted(
        (r.lid, r.rid)
        for r in interval_overlap_join(
            left, right, key="user",
            left_cols=["lid"], right_cols=["rid"],
            bin_seconds=600,
        ).collect()
    )
    assert got == [(1, 10), (1, 11), (1, 12), (3, 12)]
