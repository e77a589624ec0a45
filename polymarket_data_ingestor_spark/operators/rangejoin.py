"""Range join + multi-resolution (hypertable-style) rollups.

Two time-series operators beyond the reference surface:

* :func:`range_join_count` — "events of B within a window before each A"
  (e.g. clicks in the 10 minutes before each purchase). The naive
  inequality join is quadratic per key; the scalable form bucketizes the
  reference side into fixed time bins and equi-joins each probe to the
  two bins its window can span, turning an O(n·m) theta-join into an
  equi-join with ≤2x fan-out. Catalyst plans it as a hash join on
  (key, bin).
* :func:`multi_resolution_bars` — TimescaleDB-style continuous-aggregate
  hierarchy: the finest bars are computed from raw data once, coarser
  resolutions are derived *from the finer bars* (sum of sums; last of
  lasts via the carried order key), never re-scanning raw. At 100 TB the
  raw scan happens once per refresh instead of once per resolution.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_count(
    probe: DataFrame,
    reference: DataFrame,
    key: str,
    probe_ts: str = "ts",
    ref_ts: str = "ts",
    window_seconds: int = 600,
    count_name: str = "n_in_window",
) -> DataFrame:
    """Count reference rows within ``(probe_ts - window, probe_ts]`` per key.

    Bin-bucketed: a window of W seconds can only intersect a probe's own
    W-second bin and the previous one, so the reference is aggregated per
    (key, bin) into sorted timestamp arrays once, each probe looks at ≤2
    bins, and the in-bin refinement filters exact bounds. One equi-shuffle
    on (key, bin); no theta-join.
    """
    w_ms = window_seconds * 1000
    # Unique per-row id so the 2-bin explode re-merges row-by-row — two
    # fully identical probe rows must NOT collapse into one doubled-count
    # output row. (monotonically_increasing_id is partition-stable here:
    # it is assigned and re-grouped within the same plan.)
    # .cast("timestamp") tolerates TIMESTAMP_NTZ inputs (no-op on TIMESTAMP;
    # exact under a UTC session timezone)
    p = probe.withColumn("__rid", F.monotonically_increasing_id()).withColumn(
        "__pms", F.unix_millis(F.col(probe_ts).cast("timestamp"))
    )
    r = reference.select(
        F.col(key), F.unix_millis(F.col(ref_ts).cast("timestamp")).alias("__rms")
    ).withColumn("__bin", F.expr(f"__rms div {w_ms}"))
    binned = r.groupBy(key, "__bin").agg(
        F.sort_array(F.collect_list("__rms")).alias("__times")
    )

    probes = p.withColumn(
        "__bin", F.explode(
            F.array(F.expr(f"__pms div {w_ms}"), F.expr(f"__pms div {w_ms} - 1"))
        )
    )
    joined = probes.join(binned, on=[key, "__bin"], how="left")
    # count timestamps in (__pms - w_ms, __pms] within each bin's array
    in_window = F.size(
        F.filter(
            F.coalesce(F.col("__times"), F.array()),
            lambda t: (t > F.col("__pms") - w_ms) & (t <= F.col("__pms")),
        )
    )
    out_cols = [c for c in probe.columns]
    return (
        joined.withColumn("__n", in_window)
        .groupBy("__rid", *out_cols)
        .agg(F.sum("__n").cast("long").alias(count_name))
        .drop("__rid")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_cols: Sequence[str],
    right_cols: Sequence[str],
    l_start: str = "start",
    l_end: str = "end",
    r_start: str = "start",
    r_end: str = "end",
    bin_seconds: int = 600,
) -> DataFrame:
    """Interval × interval overlap join per key: all (left, right) pairs
    whose half-open intervals ``[start, end)`` intersect.

    Bin-bucketed like :func:`range_join_count` — no theta-join. Each
    interval explodes to the bins it covers (≈ length/bin + 1 rows; pick
    ``bin_seconds`` near the typical interval length — that is the scale
    knob), pairs meet on a (key, bin) equi-join, and the exact overlap
    predicate refines. Each overlapping pair is emitted EXACTLY once
    with no distinct pass: the pair is kept only in the bin containing
    ``max(l_start, r_start)`` — both intervals provably cover that bin
    when they overlap (overlap means r_start < l_end, so
    ``r_start div bin ≤ (l_end-1) div bin``, and symmetrically), and it
    is unique per pair.

    Empty intervals (``end ≤ start``) match nothing. ``left_cols`` /
    ``right_cols`` name the output payload and must be disjoint.
    """
    overlap_cols = set(left_cols) & set(right_cols)
    if overlap_cols:
        raise ValueError(
            f"left_cols and right_cols must be disjoint, both have "
            f"{sorted(overlap_cols)}"
        )
    g = bin_seconds * 1000

    def _ms(c: str):
        return F.unix_millis(F.col(c).cast("timestamp"))

    l = left.select(
        F.col(key), *left_cols,
        _ms(l_start).alias("__ls"), _ms(l_end).alias("__le"),
    ).filter(F.col("__le") > F.col("__ls"))
    r = right.select(
        F.col(key), *right_cols,
        _ms(r_start).alias("__rs"), _ms(r_end).alias("__re"),
    ).filter(F.col("__re") > F.col("__rs"))
    lb = l.withColumn(
        "__bin",
        F.explode(F.sequence(
            F.expr(f"__ls div {g}"), F.expr(f"(__le - 1) div {g}")
        )),
    )
    rb = r.withColumn(
        "__bin",
        F.explode(F.sequence(
            F.expr(f"__rs div {g}"), F.expr(f"(__re - 1) div {g}")
        )),
    )
    return (
        lb.join(rb, [key, "__bin"])
        .filter(
            (F.col("__rs") < F.col("__le"))
            & (F.col("__ls") < F.col("__re"))
            & (
                F.col("__bin")
                == F.greatest(
                    F.expr(f"__ls div {g}"), F.expr(f"__rs div {g}")
                )
            )
        )
        .select(F.col(key), *left_cols, *right_cols)
    )


def multi_resolution_bars(
    events: DataFrame,
    ts_col: str = "ts",
    key_cols: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
    order_col: str = "event_id",
) -> tuple[DataFrame, DataFrame]:
    """(minute_bars, hour_bars): the hour level derived FROM minute bars.

    Each level carries (sum, count, last_value, last_order) so the next
    level composes exactly: sums add, counts add, last = max_by over the
    carried order key. Decimal-exact sums end-to-end.
    """
    dec = F.col(value_col).cast("decimal(18,2)")
    minute = (
        events.groupBy(
            F.date_trunc("minute", ts_col).alias("bar_time"), *key_cols
        )
        .agg(
            F.sum(dec).alias("__sum_dec"),
            F.count(F.lit(1)).alias("n"),
            F.max_by(value_col, order_col).alias("last_value"),
            F.max(order_col).alias("__last_ord"),
        )
    )
    hour = (
        minute.groupBy(
            F.date_trunc("hour", "bar_time").alias("bar_time"), *key_cols
        )
        .agg(
            F.sum("__sum_dec").alias("__sum_dec"),
            F.sum("n").alias("n"),
            F.max_by("last_value", "__last_ord").alias("last_value"),
            F.max("__last_ord").alias("__last_ord"),
        )
    )

    def finish(df: DataFrame) -> DataFrame:
        return df.select(
            "bar_time",
            *key_cols,
            F.col("__sum_dec").cast("double").alias("total"),
            "n",
            "last_value",
        )

    return finish(minute), finish(hour)
