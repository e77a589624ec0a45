"""As-of join (SURVEY §2.3 note: "BBO prevailing at time t").

Spark has no native ASOF JOIN; the scalable composition is the union-tag
trick — one shuffle, no range explosion:

1. tag probe rows and reference rows, union them on the shared key space;
2. one window pass per key ordered by ``(order, is_probe)`` carries the
   most recent reference payload forward (``last_value(..., ignorenulls)``);
3. keep the probe rows.

Complexity is a single shuffle + sort over N+M rows — versus the naive
range-join which is quadratic per key. Equivalent to DuckDB/Pandas
``ASOF JOIN`` with ``direction='backward'`` (reference value at the
greatest order key ≤ the probe's).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    probe: DataFrame,
    reference: DataFrame,
    by: Sequence[str],
    order_col: str,
    value_cols: Sequence[str],
    strict: bool = False,
    tolerance=None,
    direction: str = "backward",
) -> DataFrame:
    """For each probe row, attach the latest reference values at-or-before
    its ``order_col`` (per ``by`` group) — or, with
    ``direction="forward"``, the EARLIEST at-or-after, or with
    ``direction="nearest"``, whichever of the two is closer (equal
    distance prefers backward) — full pandas ``merge_asof`` direction
    parity. With a ``tolerance``, nearest-then-bound equals
    bound-then-nearest (the bound is symmetric), so the semantics are
    unambiguous.

    ``strict=True`` excludes the same-instant reference row (strictly
    before / strictly after) by flipping which side wins the ordering
    tie at equal ``order_col``.

    ``tolerance`` (pandas ``merge_asof`` parity) bounds staleness (or
    forward look-ahead): a match farther than ``tolerance`` from the
    probe yields nulls instead. Requires an order column with a
    subtraction (numeric/timestamp difference comparable to the
    tolerance literal); the carried reference order rides the same
    window pass, so the bound costs no extra shuffle.

    Returns the probe rows + ``value_cols`` (null when no reference row
    qualifies / none within tolerance). A matched reference row whose
    value column is NULL yields NULL — the matched row's own values are
    returned, never an older/farther row's (pandas ``merge_asof``
    parity; the whole matched row travels as one struct through the
    window pick). Both inputs must share the ``by`` + ``order_col``
    columns; ``value_cols`` must not collide with probe columns. With
    multiple reference rows at the SAME order key the carried one is
    unspecified — use a unique order key (or a pre-aggregated
    reference) when that matters.

    A NULL ``order_col`` on EITHER side raises at execution: a NULL
    sorts before every real key, so a NULL-ord reference row would
    silently become "the latest quote before" every probe in its group
    (and a NULL-ord probe would match arbitrarily) — pandas
    ``merge_asof`` refuses NaN keys for the same reason; filter
    upstream. Documented divergence: NULL ``by`` keys GROUP TOGETHER
    (Spark window semantics) rather than matching nothing as in
    pandas — grouping the unknown-key rows with each other is the
    useful behavior for feed data, and dropping them silently would be
    the worst one.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            "direction must be 'backward', 'forward', or 'nearest', "
            f"got {direction!r}"
        )
    by = list(by)
    value_cols = list(value_cols)
    probe_cols = probe.columns
    for c in value_cols:
        if c in probe_cols:
            raise ValueError(f"value column {c!r} collides with probe column")
        if c.startswith("__"):
            # "__o" (and any future internal field) is reserved inside the
            # matched-row struct; a value column named "__o" would yield a
            # duplicate struct field and silently wrong extraction.
            raise ValueError(
                f"value column {c!r} collides with internal '__'-prefixed "
                "names; rename it before the as-of join"
            )

    # The whole matched reference row travels as ONE struct so the window
    # pick is atomic: ``last(__ref, ignorenulls)`` skips probe rows (their
    # __ref is a NULL struct) but returns the matched reference row's own
    # fields even when a value column is NULL — per-column picks would
    # skip past a NULL value to an older/farther row's value, breaking
    # pandas ``merge_asof`` parity (which returns the matched row's NaN).
    ref_type = T.StructType(
        [T.StructField("__o", reference.schema[order_col].dataType)]
        + [reference.schema[c] for c in value_cols]
    )

    def _ord_guard(side: str):
        # rides the window ORDER key, so no plan can prune it (the
        # pack_sequences pushdown lesson); NULL order keys otherwise
        # silently win/lose every sort tie (docstring)
        return F.when(
            F.col(order_col).isNotNull(), F.col(order_col)
        ).otherwise(
            F.raise_error(
                F.lit(
                    f"asof_join: NULL {order_col!r} in the {side} side "
                    "— as-of order keys must be non-NULL (pandas "
                    "merge_asof refuses NaN keys for the same reason); "
                    "filter upstream"
                )
            )
        )

    p = probe.select(
        *by,
        _ord_guard("probe").alias("__ord"),
        F.lit(1).alias("__is_probe"),
        F.struct(*probe_cols).alias("__row"),
        F.lit(None).cast(ref_type).alias("__ref"),
    )
    r = reference.select(
        *by,
        _ord_guard("reference").alias("__ord"),
        F.lit(0).alias("__is_probe"),
        F.lit(None).cast(p.schema["__row"].dataType).alias("__row"),
        F.struct(
            F.col(order_col).alias("__o"), *value_cols
        ).cast(ref_type).alias("__ref"),
    )
    # Tie order decides whether a same-instant reference row lands inside
    # the probe's frame. Backward frame is preceding..current, so the ref
    # must sort BEFORE the probe to be included (asc; strict flips it
    # out). Forward frame is current..following: the ref must sort AFTER
    # the probe (desc; strict flips it out) — the exact mirror.
    def _pass(d: str, suffix: str = ""):
        if d == "backward":
            tie = (
                F.col("__is_probe").desc() if strict
                else F.col("__is_probe").asc()
            )
            frame = (Window.unboundedPreceding, Window.currentRow)
            pick = F.last
        else:
            tie = (
                F.col("__is_probe").asc() if strict
                else F.col("__is_probe").desc()
            )
            frame = (Window.currentRow, Window.unboundedFollowing)
            pick = F.first
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col("__ord"), tie)
            .rowsBetween(*frame)
        )
        return [pick("__ref", ignorenulls=True).over(w)
                .alias(f"__ref{suffix}")]

    unioned = p.unionByName(r)

    def _bounded(ref_col: str, gap):
        # Unpack the matched struct; with a tolerance, a too-far match
        # yields NULLs. All value columns come from the SAME struct, so
        # the gap decision and the returned values agree on the row.
        if tolerance is None:
            return [F.col(ref_col)[c].alias(c) for c in value_cols]
        within = gap <= F.lit(tolerance)
        return [F.when(within, F.col(ref_col)[c]).alias(c)
                for c in value_cols]

    if direction != "nearest":
        carried = unioned.select(
            "__is_probe", "__row", "__ord", *_pass(direction)
        )
        ref_ord = F.col("__ref")["__o"]
        gap = (
            F.col("__ord") - ref_ord
            if direction == "backward"
            else ref_ord - F.col("__ord")
        )
        vals = _bounded("__ref", gap)
        return carried.filter(F.col("__is_probe") == 1).select(
            *[F.col("__row")[c].alias(c) for c in probe_cols], *vals
        )

    # nearest: both passes ride ONE union + one hash exchange (same
    # partitioning; the opposite tie orders cost a second sort, not a
    # second shuffle), then a per-row gap comparison picks the closer
    # side — equal distance prefers backward, pandas merge_asof's rule.
    carried = unioned.select(
        "__is_probe", "__row", "__ord",
        *_pass("backward", "__b"), *_pass("forward", "__f"),
    )
    gap_b = F.col("__ord") - F.col("__ref__b")["__o"]
    gap_f = F.col("__ref__f")["__o"] - F.col("__ord")
    vb = _bounded("__ref__b", gap_b)
    vf = _bounded("__ref__f", gap_f)
    use_b = F.col("__ref__f").isNull() | (
        F.col("__ref__b").isNotNull() & (gap_b <= gap_f)
    )
    vals = [
        F.when(use_b, b).otherwise(f).alias(c)
        for c, b, f in zip(value_cols, vb, vf)
    ]
    return carried.filter(F.col("__is_probe") == 1).select(
        *[F.col("__row")[c].alias(c) for c in probe_cols], *vals
    )


def trades_with_prevailing_bbo(ticks: DataFrame) -> DataFrame:
    """Enrich TRADE ticks with the prevailing best bid/ask (per asset).

    The notebook's implicit as-of query made explicit: each trade gets the
    most recent BBO quote at-or-before it in replay order. Requires the
    replay ordering columns (``ticks_only=False`` output).
    """
    # message-level order key (emit_idx excluded so a quote's ASK+BID rows
    # share one key and pivot into a single row)
    order = F.concat_ws(
        "|",
        F.col("file_hour"),
        F.lpad(F.col("line_id").cast("string"), 20, "0"),
        F.lpad(F.col("msg_idx").cast("string"), 10, "0"),
    )
    with_ord = ticks.withColumn("__seq", order)
    trades = with_ord.filter(F.col("kind") == "TRADE")
    quotes = (
        with_ord.filter(F.col("kind") == "BBO")
        .groupBy("asset", "__seq")
        .pivot("side", ["ASK", "BID"])
        .agg(F.first("price"))
        .withColumnsRenamed({"ASK": "best_ask", "BID": "best_bid"})
    )
    return asof_join(
        trades.select("timestamp", "market", "asset", "side", "price",
                      "size", "__seq"),
        quotes,
        by=["asset"],
        order_col="__seq",
        value_cols=["best_ask", "best_bid"],
    ).drop("__seq")
