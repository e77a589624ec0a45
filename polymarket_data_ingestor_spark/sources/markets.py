"""Market-dimension queries (SURVEY §3.3, §2.2 F5/F8).

Every hourly log file begins with an ``active_markets`` frame — a full market
dimension snapshot (``collector/src/main.rs:176-179,212-229``). The reference's
``markets`` command scans the first such frame of the first file in range
(``cli/src/tick_generator.rs:142-161``) and renders it filtered/unnested
(``cli/src/main.rs:171-241``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polymarket_data_ingestor_spark.schemas import ACTIVE_MARKETS_SCHEMA


def read_market_info(frames: DataFrame, last: bool = False) -> DataFrame:
    """First (or last) ``active_markets`` snapshot → one market per row.

    Mirrors ``read_market_info`` (``cli/src/tick_generator.rs:142-161``) +
    the first/last file selection (W2, ``cli/src/main.rs:179-185``). The
    ``limit(1)`` makes the snapshot driver-small by construction, so every
    downstream join against it should be a broadcast.
    """
    snaps = frames.filter(F.col("message_type") == "active_markets")
    order = [F.col("file_hour"), F.col("line_id")]
    if last:
        order = [c.desc() for c in order]
    first = snaps.orderBy(*order).limit(1)
    parsed = first.select(
        F.from_json("content", ACTIVE_MARKETS_SCHEMA).alias("snap")
    )
    return parsed.select(F.explode("snap.markets").alias("m")).select("m.*")


def read_market_info_variant(
    frames: DataFrame, last: bool = False
) -> DataFrame:
    """Dynamic-field-preserving snapshot reader: one VARIANT per market.

    :func:`read_market_info` projects through the fixed
    ``ACTIVE_MARKETS_SCHEMA``, silently dropping fields the upstream API
    adds later (the reference's ``serde_json::Value`` passthrough keeps
    them, ``collector/src/lib.rs`` market struct's flattened extras).
    This variant-typed reader keeps EVERY field: ``market`` is a Spark 4
    VARIANT column — extract typed paths with ``F.variant_get(market,
    "$.field", type)`` or serialize back with ``F.to_json``. No schema
    maintenance as the wire format evolves.
    """
    snaps = frames.filter(F.col("message_type") == "active_markets")
    order = [F.col("file_hour"), F.col("line_id")]
    if last:
        order = [c.desc() for c in order]
    first = snaps.orderBy(*order).limit(1)
    return first.select(
        F.explode(
            F.variant_get(
                F.parse_json("content"), "$.markets", "array<variant>"
            )
        ).alias("market")
    )


def active_markets(markets: DataFrame) -> DataFrame:
    """Active-market predicate F1 (``collector/src/lib.rs:69-71``)."""
    return markets.filter(
        F.col("enable_order_book")
        & F.col("accepting_orders")
        & ~F.col("archived")
        & ~F.col("closed")
    )


def filter_markets(markets: DataFrame, question_filter: str) -> DataFrame:
    """Case-insensitive substring filter F5 (``cli/src/main.rs:215-222``)."""
    return markets.filter(
        F.lower(F.col("question")).contains(question_filter.lower())
    )


def market_tokens(markets: DataFrame) -> DataFrame:
    """Unnest tokens (F8): one row per (market, token/outcome).

    Output matches the reference CSV sink columns
    (``cli/src/main.rs:224-231``) plus ``condition_id`` for joins; this is
    the outcome-label dimension the notebook's dict-map join (J1/F10) uses.
    """
    return markets.select(
        "condition_id",
        "question",
        "question_id",
        F.explode("tokens").alias("t"),
    ).select(
        "condition_id",
        "question",
        "question_id",
        F.col("t.outcome").alias("outcome"),
        F.col("t.token_id").alias("token_id"),
        F.col("t.price").alias("price"),
        F.col("t.winner").alias("winner"),
    )
