"""Order-book reconstruction → tick emission (SURVEY §2.10 O1).

The one operator Spark lacks natively: per-asset stateful replay of feed
messages into a tick table, re-expressed as a grouped-map pandas UDF
(``applyInPandas``) keyed on ``asset_id``. Semantics mirror
``MarketState::update`` (``cli/src/tick_generator.rs:224-367``) exactly:

* ``book`` snapshot ⇒ replace both sides, emit 2 BBO rows;
* ``price_change`` diff ⇒ upsert levels, ``size == 0`` deletes
  (``tick_generator.rs:257-272``); diffs before any snapshot apply to an
  empty book (``:339-343``); emit 2 BBO rows;
* ``last_trade_price`` ⇒ emit 1 TRADE row, book untouched (``:322-330``);
* unknown event types ⇒ ignored (``:391-392``).

Parity landmines encoded here (SURVEY §1.4):

* BBO rows on *every* book event, ASK row first then BID
  (``tick_generator.rs:283-316``);
* empty side emits ``(price=0, size=0)`` (``:274-281``);
* sink side labels are ``BID``/``ASK`` while the wire uses ``BUY``/``SELL``
  (``:85-88`` vs ``:407-413``);
* book math in exact decimal, downcast to f64 only at emission
  (``:89-90,199-207``);
* state persists across hourly files — guaranteed here because *all* of an
  asset's messages land in one group, sorted by ``(file_hour, line_id,
  msg_idx)`` before the kernel runs (``cli/src/main.rs:142-164``).

Scale notes: state per asset is one small dict-of-dicts (books are tiny), so
groups stream through Arrow batches with O(books) memory per task exactly
like the reference's single pass — but parallel across assets. The only
shuffle is the groupBy hash partitioning on ``asset_id``; at 1000 executors
that is the minimal co-location the semantics permit. Skewed assets (one
hyper-active market) are bounded by per-asset data volume, not by executor
count — mitigate by replaying narrower time ranges, which the path pruning
already gives us.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence
from decimal import Decimal

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Kernel output: the 7 reference tick columns + the replay ordering key so
# callers can reproduce strict log order (SURVEY §7 "global row order").
REPLAY_OUTPUT_SCHEMA = StructType(
    [
        StructField("timestamp", StringType(), False),
        StructField("kind", StringType(), False),
        StructField("market", StringType(), False),
        StructField("asset", StringType(), False),
        StructField("side", StringType(), False),
        StructField("price", DoubleType(), False),
        StructField("size", DoubleType(), False),
        StructField("file_hour", StringType(), False),
        StructField("line_id", LongType(), False),
        StructField("msg_idx", LongType(), False),
        StructField("emit_idx", LongType(), False),
    ]
)

TICK_COLUMNS = ["timestamp", "kind", "market", "asset", "side", "price", "size"]
ORDER_COLUMNS = ["file_hour", "line_id", "msg_idx", "emit_idx"]

# Ship this module's code inside the serialized plan instead of by reference:
# executors then never need the package on their PYTHONPATH (the kernel only
# uses pandas + stdlib). Without this, a driver script running from outside
# the package root fails with ModuleNotFoundError in the Python workers.
try:  # pragma: no cover - environment-dependent
    import sys as _sys

    from pyspark import cloudpickle as _cloudpickle

    _cloudpickle.register_pickle_by_value(_sys.modules[__name__])
except Exception:  # noqa: BLE001 - best-effort; PYTHONPATH fallback applies
    pass

_ZERO = Decimal(0)


def _iter_levels(arr):
    """Null-safe iteration over an Arrow list column value.

    Arrow→pandas yields numpy arrays for lists and None/NaN for nulls, so
    plain ``arr or ()`` would hit numpy truth-value ambiguity.
    """
    if arr is None or isinstance(arr, float):
        return ()
    return arr


def _top(levels: dict, highest: bool) -> tuple[float, float]:
    """Top-of-book for one side; empty side → (0.0, 0.0).

    Mirrors ``tick_generator.rs:274-281`` (``unwrap_or_default`` on an empty
    ``BTreeMap``). ``highest=True`` for bids (best bid = max price),
    ``False`` for asks (best ask = min price).
    """
    if not levels:
        return 0.0, 0.0
    price = max(levels) if highest else min(levels)
    return float(price), float(levels[price])


def _replay_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Replay all messages of one asset in log order; emit tick rows.

    Pure-Python book state: ``{"bids": {Decimal: Decimal}, "asks": ...}``.
    Exact decimal arithmetic during replay, f64 downcast at emission — the
    reference's split (``tick_generator.rs:15,89-90``).
    """
    pdf = pdf.sort_values(["file_hour", "line_id", "msg_idx"], kind="mergesort")
    bids: dict[Decimal, Decimal] = {}
    asks: dict[Decimal, Decimal] = {}
    out: dict[str, list] = {c: [] for c in TICK_COLUMNS + ORDER_COLUMNS}

    o_ts = out["timestamp"]
    o_kind = out["kind"]
    o_market = out["market"]
    o_asset = out["asset"]
    o_side = out["side"]
    o_price = out["price"]
    o_size = out["size"]
    o_fh = out["file_hour"]
    o_li = out["line_id"]
    o_mi = out["msg_idx"]
    o_ei = out["emit_idx"]

    def emit_bbo(ts, market, asset, fh, li, mi):
        # Exactly two rows per book event, ASK first then BID
        # (tick_generator.rs:283-316).
        ask_p, ask_s = _top(asks, highest=False)
        bid_p, bid_s = _top(bids, highest=True)
        o_ts.extend((ts, ts))
        o_kind.extend(("BBO", "BBO"))
        o_market.extend((market, market))
        o_asset.extend((asset, asset))
        o_side.extend(("ASK", "BID"))
        o_price.extend((ask_p, bid_p))
        o_size.extend((ask_s, bid_s))
        o_fh.extend((fh, fh))
        o_li.extend((li, li))
        o_mi.extend((mi, mi))
        o_ei.extend((0, 1))

    for row in pdf.itertuples(index=False):
        et = row.event_type
        if et == "book":
            # Snapshot replaces both sides (tick_generator.rs:242-254).
            bids.clear()
            asks.clear()
            for lv in _iter_levels(row.bids):
                bids[Decimal(lv["price"])] = Decimal(lv["size"])
            for lv in _iter_levels(row.asks):
                asks[Decimal(lv["price"])] = Decimal(lv["size"])
            emit_bbo(row.timestamp, row.market, row.asset_id,
                     row.file_hour, row.line_id, row.msg_idx)
        elif et == "price_change":
            # Upsert levels; size==0 deletes (tick_generator.rs:257-272).
            for ch in _iter_levels(row.changes):
                side_levels = bids if ch["side"] == "BUY" else asks
                price = Decimal(ch["price"])
                size = Decimal(ch["size"])
                if size == _ZERO:
                    side_levels.pop(price, None)
                else:
                    side_levels[price] = size
            emit_bbo(row.timestamp, row.market, row.asset_id,
                     row.file_hour, row.line_id, row.msg_idx)
        elif et == "last_trade_price":
            # One TRADE row; wire BUY/SELL → sink BID/ASK
            # (tick_generator.rs:85-88,209-221); no book mutation.
            o_ts.append(row.timestamp)
            o_kind.append("TRADE")
            o_market.append(row.market)
            o_asset.append(row.asset_id)
            o_side.append("BID" if row.side == "BUY" else "ASK")
            o_price.append(float(Decimal(row.price)))
            o_size.append(float(Decimal(row.size)))
            o_fh.append(row.file_hour)
            o_li.append(row.line_id)
            o_mi.append(row.msg_idx)
            o_ei.append(0)
        # else: unknown event_type — ignored (tick_generator.rs:391-392).

    return pd.DataFrame(out)


def replay_feed_messages(
    feed: DataFrame,
    markets: Iterable[str] | None = None,
    in_log_order: bool = False,
) -> DataFrame:
    """Feed-message rows → tick DataFrame via the stateful kernel.

    ``feed`` is the output of :func:`...sources.frames.parse_feed_messages`.
    ``markets`` is the optional market-id filter (F2,
    ``cli/src/tick_generator.rs:229-231``) — applied *before* the shuffle so
    the filter prunes at the scan, exactly as the reference checks it before
    mutating state.

    ``in_log_order=True`` globally sorts the result by the replay key,
    reproducing the reference's strict interleaved log-order Parquet. Default
    keeps per-asset-contiguous order (cheaper: no extra global sort).
    """
    if markets is not None:
        ids = list(markets)
        # Literal IN for small sets — Catalyst pushes it to the scan; for
        # very large sets callers should pre-join a broadcast id table.
        feed = feed.filter(F.col("market").isin(ids))
    # Prune unknown event types before the shuffle: the kernel would drop
    # them anyway, but dropping here avoids shuffling dead rows.
    feed = feed.filter(
        F.col("event_type").isin("book", "price_change", "last_trade_price")
    )
    ticks = feed.groupBy("asset_id").applyInPandas(
        _replay_group, schema=REPLAY_OUTPUT_SCHEMA
    )
    if in_log_order:
        ticks = ticks.orderBy(*ORDER_COLUMNS)
    return ticks


def replay(
    spark_or_frames,
    paths: Sequence[str] | None = None,
    markets: Iterable[str] | None = None,
    in_log_order: bool = False,
    ticks_only: bool = True,
) -> DataFrame:
    """End-to-end replay: raw frame logs → tick table (SURVEY §3.1).

    ``replay(spark, paths)`` reads + parses + replays; ``replay(frames_df)``
    replays an already-read frames DataFrame. ``ticks_only=True`` projects to
    the reference's exact 7-column sink schema (``tick_generator.rs:50-58``).
    """
    from polymarket_data_ingestor_spark.sources.frames import (
        parse_feed_messages,
        read_frames,
    )

    if paths is not None:
        frames = read_frames(spark_or_frames, paths)
    else:
        frames = spark_or_frames
    feed = parse_feed_messages(frames)
    ticks = replay_feed_messages(feed, markets=markets, in_log_order=in_log_order)
    if ticks_only:
        ticks = ticks.select(*TICK_COLUMNS)
    return ticks


def with_event_time(ticks: DataFrame, column: str = "event_time") -> DataFrame:
    """Add a typed timestamp column from the verbatim epoch-ms string.

    The notebook's ``astype(int) + to_datetime(unit='ms')`` (C11,
    ``bbo.ipynb`` cell 0) as a Catalyst expression.
    """
    return ticks.withColumn(
        column, F.timestamp_millis(F.col("timestamp").cast("long"))
    )
