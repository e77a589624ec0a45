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
* the reference keeps book math in exact decimal and downcasts to f64 at
  emission (``:89-90,199-207``); we cast the wire's decimal strings to f64
  once, JVM-side — injective in the tick domain (≤4 dp prices), so keying
  and outputs are bit-identical to the reference's Decimal→f64 path;
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

import numpy as np
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

# Packed message kind codes (see replay_feed_messages).
KIND_BOOK, KIND_CHANGE, KIND_TRADE = 0, 1, 2

#: Output enum lookup tables for the kernel: indexing these with a
#: bool-viewed int8 mask yields object arrays sharing two interned
#: strings — cheaper to build and to Arrow-convert than np.where's
#: fixed-width unicode arrays.
_KIND_ENUM = np.array(["BBO", "TRADE"], dtype=object)
_SIDE_ENUM = np.array(["BID", "ASK"], dtype=object)

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

def _replay_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Replay one asset's *book events* in log order; emit BBO tick rows.

    Input is the packed form produced by :func:`replay_feed_messages`:
    levels arrive as flat ``array<double>`` columns (``[p1, s1, p2, s2,
    ...]``; change prices sign-encode the side, BUY positive / SELL
    negative) — numpy-friendly, no per-level dicts through Arrow. Trades
    never reach this kernel (they're a stateless JVM projection).

    Numeric note: the wire's decimal strings are cast to f64 JVM-side;
    within the tick domain (≤4 dp prices, ≤6 dp sizes) the string→double
    mapping is injective, so float dict keys reproduce the reference's
    ``BTreeMap<Decimal>`` keying exactly, and emitted values equal its
    ``to_f64`` downcasts (``tick_generator.rs:89-90``).
    """
    pdf = pdf.sort_values(["file_hour", "line_id", "msg_idx"], kind="mergesort")
    bids: dict[float, float] = {}
    asks: dict[float, float] = {}
    # Incremental top-of-book: recomputing min/max over the dict per event
    # is O(depth) and dominates on deep books (a hot asset accumulating
    # hundreds of levels); tracking the best and recomputing only when the
    # best level is deleted is O(1) amortized.
    best_bid: float | None = None
    best_ask: float | None = None

    # The loop appends only to numeric buffers (cheap); per-row string
    # columns are recovered afterwards by vectorized fancy-indexing of the
    # input arrays — building object columns row-by-row in Python costs as
    # much as the replay itself on large groups.
    src_idx: list[int] = []  # input ordinal per output row
    is_trade: list[bool] = []
    is_ask_row: list[bool] = []  # ASK leg of a BBO pair / SELL trade
    prices: list[float] = []
    sizes: list[float] = []

    # Python-native hot loop: numpy SCALARS (np.float64/np.int8) pay a
    # C-object dispatch on every compare, negate, hash and dict probe —
    # measured ~2-3x the whole kernel on large groups. ``tolist()``
    # converts each message's arrays to Python floats ONCE (bit-exact:
    # float64 → Python float is the identity on the value), and
    # ``math.copysign`` replaces ``np.signbit`` (identical -0.0
    # semantics) so the loop touches no numpy scalar at all. Cells
    # arrive as numpy arrays under Arrow but plain lists when the
    # kernel is driven directly (tests, seeded restarts) — ``_pl``
    # accepts both; a list's elements are already Python floats.
    from math import copysign

    def _pl(a):
        return a.tolist() if hasattr(a, "tolist") else a

    kinds = pdf["kind_code"].to_numpy().tolist()
    b_col = pdf["bids_flat"].to_numpy()
    a_col = pdf["asks_flat"].to_numpy()
    c_col = pdf["changes_flat"].to_numpy()
    for i in range(len(kinds)):
        kind = kinds[i]
        # A NULL flat array marks a message the packing pass rejected
        # (unparseable price/size, non-BUY/SELL side, or a missing/null
        # collection — required Vecs in the reference's serde structs):
        # drop the whole message, exactly like the reference's parse-time
        # rejection — no emission, no state mutation.
        if kind == KIND_BOOK:
            b_flat, a_flat = b_col[i], a_col[i]
            if b_flat is None or a_flat is None:
                continue
        else:
            c_flat = c_col[i]
            if c_flat is None:
                continue
        if kind == KIND_TRADE:
            # One TRADE row; no book mutation (tick_generator.rs:322-330).
            cl = _pl(c_flat)
            sp = cl[0]
            buy = copysign(1.0, sp) > 0.0  # sign bit: 0.0 vs -0.0 exact
            src_idx.append(i)
            is_trade.append(True)
            is_ask_row.append(not buy)
            prices.append(sp if buy else -sp)
            sizes.append(cl[1])
            continue
        if kind == KIND_BOOK:
            # Snapshot replaces both sides (tick_generator.rs:242-254).
            bl = _pl(b_flat)
            al = _pl(a_flat)
            bids = dict(zip(bl[0::2], bl[1::2]))
            asks = dict(zip(al[0::2], al[1::2]))
            best_bid = max(bids) if bids else None
            best_ask = min(asks) if asks else None
        else:
            # Diff upserts; size==0 deletes (tick_generator.rs:257-272);
            # sign of the packed price encodes BUY(+)/SELL(-).
            cl = _pl(c_flat)
            for sp, size in zip(cl[0::2], cl[1::2]):
                if copysign(1.0, sp) > 0.0:
                    price = sp
                    if size == 0.0:
                        if bids.pop(price, None) is not None \
                                and price == best_bid:
                            best_bid = max(bids) if bids else None
                    else:
                        bids[price] = size
                        if best_bid is None or price > best_bid:
                            best_bid = price
                else:
                    price = -sp
                    if size == 0.0:
                        if asks.pop(price, None) is not None \
                                and price == best_ask:
                            best_ask = min(asks) if asks else None
                    else:
                        asks[price] = size
                        if best_ask is None or price < best_ask:
                            best_ask = price
        # Exactly two rows per book event, ASK first then BID
        # (tick_generator.rs:283-316); empty side → (0, 0) (:274-281).
        src_idx.extend((i, i))
        is_trade.extend((False, False))
        is_ask_row.extend((True, False))
        if best_ask is not None:
            prices.append(best_ask)
            sizes.append(asks[best_ask])
        else:
            prices.append(0.0)
            sizes.append(0.0)
        if best_bid is not None:
            prices.append(best_bid)
            sizes.append(bids[best_bid])
        else:
            prices.append(0.0)
            sizes.append(0.0)

    idx = np.asarray(src_idx, dtype=np.int64)
    trade_mask = np.asarray(is_trade, dtype=bool)
    ask_mask = np.asarray(is_ask_row, dtype=bool)
    # emit_idx: 0 for trades and ASK legs, 1 for BID legs of BBO pairs
    emit = (~trade_mask & ~ask_mask).astype(np.int64)
    # Column-by-column assembly, NOT the dict constructor: pandas
    # consolidates a dict of same-dtype columns into 2-D blocks
    # (vstack + merge — measured ~2-3 s of pure copying on a 932k-row
    # hot-asset output, about half the kernel's wall time), and the
    # Arrow serializer reads columns individually so the consolidated
    # layout is never used. Assigning columns onto an empty frame
    # keeps one block per column — zero copies. The enum columns index
    # a 2-element object array (shared interned strings) instead of
    # np.where's fixed-width unicode materialization.
    out = pd.DataFrame()
    out["timestamp"] = pdf["timestamp"].to_numpy()[idx]
    out["kind"] = _KIND_ENUM[trade_mask.view(np.int8)]
    out["market"] = pdf["market"].to_numpy()[idx]
    out["asset"] = pdf["asset_id"].to_numpy()[idx]
    out["side"] = _SIDE_ENUM[ask_mask.view(np.int8)]
    out["price"] = np.asarray(prices, dtype=np.float64)
    out["size"] = np.asarray(sizes, dtype=np.float64)
    out["file_hour"] = pdf["file_hour"].to_numpy()[idx]
    out["line_id"] = pdf["line_id"].to_numpy()[idx]
    out["msg_idx"] = pdf["msg_idx"].to_numpy()[idx]
    out["emit_idx"] = emit
    return out


def replay_feed_messages(
    feed: DataFrame,
    markets: Iterable[str] | None = None,
    in_log_order: bool = False,
    split_at_snapshots: bool = False,
    snapshots_per_segment: int = 1000,
    assume_skewed: bool = False,
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

    ``split_at_snapshots=True`` is the hot-asset skew mitigation: a
    ``book`` snapshot fully resets per-asset state, so an asset's stream
    factors into independent segments at snapshot boundaries — segment 0
    (pre-snapshot diffs against an empty book, ``tick_generator.rs:339-343``)
    plus one segment per ``snapshots_per_segment`` snapshots (coarse on
    purpose: each segment must stay big enough to amortize per-group
    kernel overhead — a segment per *individual* snapshot on a
    snapshot-heavy feed explodes the group count and the overhead eats
    the win). The kernel then groups on ``(asset_id, segment)`` instead
    of ``asset_id``, spreading a hyper-active asset across executors;
    outputs are identical row-for-row (the order columns still
    reconstruct global order).

    Safe-by-default: a cheap column-pruned gate pass (per-(asset, file)
    book-event counts — no array packing, no window) runs FIRST, and
    when no (asset, file) cell reaches ``snapshots_per_segment`` the
    plain per-asset path is taken — the ordinal window / carry-join /
    segment machinery never enters the plan, so on a uniform profile
    the only cost over the default is the gate's tokenize+count scan.
    When the gate fires, the machinery costs a per-(asset, file)
    ordinal window — its sorts parallelize across files, so no stage is
    serial in one asset's volume — plus the per-file VALID-snapshot
    totals pass (boundaries land only on snapshots the kernel will
    apply; malformed books never open a segment). Per-file resolution
    means an asset whose snapshots spread just under
    ``snapshots_per_segment`` per file never splits — pick the stride
    at or below the hottest asset's per-file snapshot density.
    ``assume_skewed=True`` skips the gate and runs the machinery
    unconditionally — for callers that already established skew
    externally (:func:`replay`'s raw-text manifest gate).
    Measured on the bench's skewed fixture (one asset = 50% of 1.2M
    messages, sf0.1): ~3.9 s vs ~11 s unsplit.
    """
    if markets is not None:
        ids = list(markets)
        # Literal IN for small sets — Catalyst pushes it to the scan; for
        # very large sets callers should pre-join a broadcast id table.
        feed = feed.filter(F.col("market").isin(ids))

    # One scan, one shuffle: every message is packed JVM-side into a slim
    # row — a kind code plus flat double arrays (pairs of [price, size];
    # change/trade prices sign-encode BUY(+)/SELL(-)). The Arrow→pandas hop
    # then moves numpy float arrays instead of per-level dicts (~10x
    # cheaper), and the raw JSON is scanned exactly once. Trades ride the
    # same shuffle as packed pairs: at 100 TB re-scanning the raw logs for
    # a stateless trade branch would cost far more than shuffling these
    # few extra bytes.
    #
    # Validity is FUSED into the packing pass (the reference's serde
    # rejects a whole message when any level's price/size fails Decimal
    # parse or a side isn't the BUY/SELL enum — tick_generator.rs serde
    # structs): a level that fails the rules packs to a NULL element,
    # and flatten() propagates any NULL element to a NULL flat array;
    # a NULL collection (the reference structs make changes/bids/asks
    # required Vecs, so a missing/null collection fails serde there)
    # transforms to NULL directly. The kernel then drops any message
    # whose relevant flat array is NULL — one array traversal both
    # validates and packs (the r2 version traversed each array twice:
    # a forall validity pass plus the packing transform). Empty-but-
    # present arrays stay valid: they pack to empty (non-NULL) arrays.
    # try_cast: under ANSI mode a plain cast would THROW on garbage
    # instead of classifying it for rejection.
    #
    # _finite: try_cast ACCEPTS "NaN"/"Infinity"/"-Infinity" as doubles,
    # but the reference's Decimal parse rejects those strings (serde
    # fails -> whole message dropped) — and a NaN price would corrupt
    # the kernel besides (NaN dict keys never equal themselves, so every
    # NaN upsert opens a phantom level, and a later max()/min() best
    # recompute propagates NaN into the BBO order-dependently; review
    # finding, reproduced: a NaN price_change emitted a BBO pair the
    # reference would not emit). Spark orders NaN above +Infinity, so
    # strictly-between-infinities excludes NaN and both infinities in
    # one predicate.
    def _finite(v):
        return F.when(
            (v > F.lit(float("-inf"))) & (v < F.lit(float("inf"))), v
        )

    def level_pairs(col):
        def pack(lv):
            p = _finite(lv["price"].try_cast("double"))
            s = _finite(lv["size"].try_cast("double"))
            return F.when(p.isNotNull() & s.isNotNull(), F.array(p, s))

        return F.flatten(F.transform(col, pack))

    def signed_pack(side, price, size):
        # Sign-encodes BUY(+)/SELL(-); an unknown side yields NULL (not
        # a sign-encoded guess), poisoning the element → message.
        p = _finite(price.try_cast("double"))
        s = _finite(size.try_cast("double"))
        sp = F.when(side == "BUY", p).when(side == "SELL", -p)
        return F.when(sp.isNotNull() & s.isNotNull(), F.array(sp, s))

    change_pairs = F.flatten(
        F.transform(
            F.col("changes"),
            lambda ch: signed_pack(ch["side"], ch["price"], ch["size"]),
        )
    )
    trade_pair = signed_pack(F.col("side"), F.col("price"), F.col("size"))
    packed = feed.filter(
        F.col("event_type").isin("book", "price_change", "last_trade_price")
        # malformed messages without a key would otherwise form a null
        # group; serde in the reference rejects them at parse time
        & F.col("asset_id").isNotNull()
        & F.col("market").isNotNull()
        & F.col("timestamp").isNotNull()
    ).select(
        "asset_id",
        "file_hour",
        "line_id",
        "msg_idx",
        "timestamp",
        "market",
        F.when(F.col("event_type") == "book", KIND_BOOK)
        .when(F.col("event_type") == "price_change", KIND_CHANGE)
        .otherwise(KIND_TRADE)
        .cast("int")
        .alias("kind_code"),
        level_pairs(F.col("bids")).alias("bids_flat"),
        level_pairs(F.col("asks")).alias("asks_flat"),
        F.when(F.col("event_type") == "price_change", change_pairs)
        .when(F.col("event_type") == "last_trade_price", trade_pair)
        .alias("changes_flat"),
    )
    if split_at_snapshots:
        from pyspark.sql import Window

        # A segment boundary falls on a snapshot (which replaces the
        # whole book, making prior state irrelevant), so each segment
        # replays standalone; the pre-boundary prefix replays against
        # the empty book — both exactly the unsegmented semantics.
        #
        # STAGE 0 — the cheap gate. Before paying for ANY of the split
        # machinery (ordinal window, carry join, segment grouping), run
        # a validity-agnostic per-(asset, file) count of book events.
        # Catalyst prunes this branch to (event_type, asset_id,
        # file_hour) — none of the packed array expressions are built —
        # so it costs one light tokenize+count pass plus a tiny
        # aggregate. Total book counts upper-bound the valid-snapshot
        # counts used by the opening rule below, so if NO (asset, file)
        # cell reaches snapshots_per_segment here, no cell can open a
        # segment either, and the plain per-asset path is taken with
        # byte-identical output and no window/join in the plan at all.
        # This makes split_at_snapshots safe-by-default on uniform
        # profiles: the only overhead is this gate pass.
        k = int(snapshots_per_segment)
        if assume_skewed:
            # The caller already established skew (replay()'s raw-text
            # manifest gate) — don't pay a second gate pass here.
            any_hot = True
        else:
            # The gate is an eager Spark job at plan-BUILD time (the
            # hot/cold decision picks which plan to build). Memoize it
            # per (analyzed-plan semantic hash, k) so repeated
            # constructions over the same source (retry loops, timing
            # harnesses, notebooks) pay it once — the same
            # immutable-log contract the path-keyed cache in replay()
            # relies on. If the semantic hash is unavailable, fall
            # back to computing the gate each call.
            try:
                gkey = (
                    packed._jdf.queryExecution().analyzed().semanticHash(),
                    k,
                )
            except Exception:  # pragma: no cover - py4j API drift
                gkey = None
            any_hot = _FEED_GATE_CACHE.get(gkey) if gkey is not None else None
            if any_hot is None:
                gate_counts = packed.groupBy("asset_id", "file_hour").agg(
                    F.sum(
                        F.when(F.col("kind_code") == KIND_BOOK, 1).otherwise(0)
                    ).alias("__n_books")
                )
                any_hot = (
                    gate_counts.filter(F.col("__n_books") >= F.lit(k))
                    .limit(1)
                    .count()
                    > 0
                )
                if gkey is not None:
                    if len(_FEED_GATE_CACHE) >= _GATE_STATS_CACHE_MAX:
                        _FEED_GATE_CACHE.clear()
                    _FEED_GATE_CACHE[gkey] = any_hot
    if split_at_snapshots and any_hot:
        # The ordinal window partitions on (asset_id, file_hour), NOT
        # asset_id alone: a per-asset global window would serialize a
        # hot asset's entire stream (heavy packed arrays included)
        # through ONE task's sort — re-introducing at assignment time
        # exactly the serial bottleneck the split exists to remove.
        # Per-file ordinals sort in parallel across files; in files
        # holding >= snapshots_per_segment of an asset's snapshots
        # ("opening" files — i.e. only where the asset is actually
        # hot), boundaries fall on every snapshots_per_segment-th
        # snapshot WITHIN the file (always including its first), and
        # all other rows belong to the latest segment opened in an
        # earlier file (state carries across files), resolved via a
        # #files-per-asset-row carry relation — never a big sort.
        #
        # NOTE the interaction between snapshots_per_segment and
        # per-file snapshot density: a file opens segments only when it
        # alone holds >= k of the asset's VALID snapshots. An asset
        # whose snapshots spread just under k per file (e.g. k=1000,
        # ~999 snapshots/hour across many files) never splits — by
        # design, because boundaries are resolved per-file to keep every
        # stage parallel; pick k at or below the per-file snapshot
        # density of the assets you want split (the reference rotates
        # hourly, so "snapshots per hour of the hottest asset" is the
        # right yardstick).
        wf = (
            Window.partitionBy("asset_id", "file_hour")
            .orderBy("line_id", "msg_idx")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        # Only snapshots the KERNEL will actually apply may open a
        # segment: a malformed book message (NULL bids_flat/asks_flat —
        # rejected by the packing pass) is dropped by the kernel
        # WITHOUT resetting state, so a boundary landing on one would
        # make the new segment replay subsequent diffs against an empty
        # book while the unsegmented path carries prior state. Gating
        # is_snap on validity keeps boundary placement and kernel
        # behavior in lockstep; the same gated expression feeds the
        # per-file totals so in-file ordinals and carry labels agree.
        is_snap = F.when(
            (F.col("kind_code") == KIND_BOOK)
            & F.col("bids_flat").isNotNull()
            & F.col("asks_flat").isNotNull(),
            1,
        ).otherwise(0)
        snap_c = F.sum(is_snap).over(wf)

        def _seg(hour_col, c):
            # Segment label = "file_hour#ordinal-of-opening-snapshot"
            # (ordinals 1..k -> 1, k+1..2k -> k+1, ...).
            return F.concat_ws(
                "#", hour_col,
                (c - ((c - F.lit(1)) % F.lit(k))).cast("string"),
            )

        # Per-(asset, file) VALID-snapshot totals: a plain
        # partial-aggregated count (no window, no dependence on the big
        # sort). This branch deliberately re-scans the source rather
        # than reusing the window's exchange: Catalyst prunes the count
        # branch to (event_type, asset_id, bids, asks) — validity needs
        # the book arrays, but changes_flat / market / timestamp are
        # never built, and this pass runs only after the cheap gate has
        # already established real skew — while sharing the exchange is
        # impossible anyway (column
        # pruning specializes each consumer's subtree below the
        # exchange, so ReuseExchange never fires; verified on the
        # executed plan). A file OPENS segments for an asset only when
        # it holds at least snapshots_per_segment of its snapshots —
        # so a cold asset (few snapshots per file) never splits and
        # keeps exactly the unsegmented one-group-per-asset
        # granularity, while a hot asset's files each contribute
        # boundaries. The per-asset carry (latest segment opened in an
        # EARLIER file) is a window over this #files-row relation only.
        packed = packed.withColumn("__snap_c", snap_c)
        per_file = packed.groupBy("asset_id", "file_hour").agg(
            F.sum(is_snap).alias("__n_snaps")
        )
        opens = F.col("__n_snaps") >= F.lit(k)
        w_carry = (
            Window.partitionBy("asset_id")
            .orderBy("file_hour")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        per_file = per_file.withColumn(
            "__carry_seg",
            F.last(
                F.when(opens, _seg(F.col("file_hour"), F.col("__n_snaps"))),
                ignorenulls=True,
            ).over(w_carry),
        ).select(
            "asset_id", "file_hour", "__carry_seg", opens.alias("__opens")
        )

        packed = (
            packed
            .join(F.broadcast(per_file), ["asset_id", "file_hour"])
            .withColumn(
                "__segment",
                F.coalesce(
                    F.when(
                        (F.col("__snap_c") >= 1) & F.col("__opens"),
                        _seg(F.col("file_hour"), F.col("__snap_c")),
                    ),
                    F.col("__carry_seg"),
                    F.lit(""),  # global prefix: empty-book replay
                ),
            )
        )
        group_cols = ["asset_id", "__segment"]
    else:
        group_cols = ["asset_id"]
    ticks = packed.groupBy(*group_cols).applyInPandas(
        _replay_group, schema=REPLAY_OUTPUT_SCHEMA
    )
    if in_log_order:
        ticks = ticks.orderBy(*ORDER_COLUMNS)
    return ticks


#: Memoized raw-text gate statistics: path-signature → max per-(asset, file)
#: book-line count. Hourly feed logs are immutable once rotated (the
#: collector's contract, ``collector/src/main.rs`` hourly rotation), so the
#: stat is a property of the file set — this is the in-process form of the
#: per-file manifest a 100 TB deployment would maintain at ingest time.
#: Local paths are additionally keyed by (size, mtime) so a rewritten file
#: invalidates its entry. Bounded to keep long-lived drivers flat.
_GATE_STATS_CACHE: dict[tuple, int] = {}
_GATE_STATS_CACHE_MAX = 256
#: Parse-based gate results for replay_feed_messages, keyed by
#: (analyzed-plan semantic hash, snapshots_per_segment).
_FEED_GATE_CACHE: dict[tuple, bool] = {}

#: Matches an ``asset_id`` key/value inside a frame line — canonical
#: definition in ``polymarket_data_ingestor_spark.manifest`` (shared with
#: the ingest-time sidecar writer so the two can never drift).
from polymarket_data_ingestor_spark.manifest import (  # noqa: E402
    ASSET_ID_RE as _ASSET_ID_RE,
    read_manifest_counts,
    write_manifest,
)


def _max_snapshot_cell(spark, paths: Sequence[str]) -> int:
    """Upper bound on any (asset, file)'s book-event count.

    Sidecar-first: a file whose ``<file>.manifest.json`` is present and
    size-consistent (written at rotation by ``FrameWriter``, or
    backfilled by :func:`write_gate_manifests`) contributes its recorded
    ``max_book_count`` with a driver-side read — no Spark job at all.
    On a warm lake every file has one and the gate costs a handful of
    tiny file reads. Files without a valid sidecar fall back to the raw
    scan below, restricted to exactly those files.

    The scan reads the files as plain text (no JSON tokenization of
    non-book lines), keeps only lines containing the substring ``book``
    — any JSON encoding of ``"event_type": "book"`` contains it, so no
    book event is missed — extracts every ``asset_id`` mentioned on
    those lines, and counts per (asset_id, file). Every valid snapshot
    of asset A in file f lies on such a line and mentions A, so the
    returned max is >= the valid-snapshot count of every cell: if it is
    below the segment stride, the split machinery provably has nothing
    to split and the plain per-asset plan is byte-identical.
    Over-counting (an asset's non-book message sharing a multi-message
    frame with a book event, or the validity-agnostic count) only ever
    errs toward running the machinery — never toward missing skew. The
    sidecar counts use the same semantics, so the two sources agree.

    Aggregation unit: the replay grouping keys on the hour TOKEN from
    the file NAME, so two files named ``2024-01-01-00.jsonl`` in
    different directories land in the SAME cell — per-(asset, hour)
    counts must therefore be SUMMED across files (sidecar + sidecar,
    scan + scan, and sidecar + scan alike) before taking the max. A
    per-file max here would under-approximate exactly the
    multi-directory skew case and break the errs-toward-splitting
    invariant.
    """
    import os
    import re as _re

    key_parts = []
    for p in sorted(str(x) for x in paths):
        try:
            st = os.stat(p)
            key_parts.append((p, st.st_size, int(st.st_mtime)))
        except OSError:  # remote/glob paths: immutable-log contract applies
            key_parts.append((p, -1, -1))
    key = tuple(key_parts)
    if key in _GATE_STATS_CACHE:
        return _GATE_STATS_CACHE[key]
    hour_re = _re.compile(_file_hour_re())
    side_cells: dict[tuple[str, str], int] = {}
    scan_paths: list[str] = []
    for p in (str(x) for x in paths):
        counts = read_manifest_counts(p)
        if counts is None:
            scan_paths.append(p)
            continue
        m = hour_re.search(p)
        hour = m.group(1) if m else ""  # '' mirrors regexp_extract miss
        for asset, n in counts.items():
            side_cells[(hour, asset)] = side_cells.get((hour, asset), 0) + n
    if scan_paths:
        cand = spark.read.text(scan_paths).filter(
            F.col("value").contains("book")
        )
        cells = (
            cand.select(
                F.regexp_extract(
                    F.input_file_name(), _file_hour_re(), 1
                ).alias("file_hour"),
                F.explode(
                    F.regexp_extract_all("value", F.lit(_ASSET_ID_RE), 1)
                ).alias("asset_id"),
            )
            .groupBy("file_hour", "asset_id")
            .count()
        )
        if side_cells:
            side_df = spark.createDataFrame(
                [(h, a, n) for (h, a), n in side_cells.items()],
                "file_hour string, asset_id string, count long",
            )
            cells = cells.unionByName(side_df)
        row = (
            cells.groupBy("file_hour", "asset_id")
            .agg(F.sum("count").alias("n"))
            .agg(F.max("n"))
            .first()
        )
        max_cell = int(row[0]) if row and row[0] is not None else 0
    else:
        max_cell = max(side_cells.values(), default=0)
    if len(_GATE_STATS_CACHE) >= _GATE_STATS_CACHE_MAX:
        _GATE_STATS_CACHE.clear()
    _GATE_STATS_CACHE[key] = max_cell
    return max_cell


def write_gate_manifests(spark, paths: Sequence[str]) -> int:
    """Backfill gate sidecars for an existing (warm) frame lake: one raw
    scan computes every file's per-asset book-line counts, then a
    ``<file>.manifest.json`` is written next to each LOCAL file. Returns
    the number of sidecars written.

    This is the maintenance-job form of what ``FrameWriter`` does at
    rotation — run it once over a lake that predates manifests and every
    later ``replay(split_at_snapshots=True)`` gate is a sidecar read.
    The collected rows are (file, asset, count) aggregates — bounded by
    files × active assets, not by data volume; for an object-store lake,
    swap the ``Path.write_text`` for the Hadoop FileSystem API (the
    sinks module's ``_delete_partition_dirs`` shows the pattern).
    """
    from collections import defaultdict
    from pathlib import Path
    from urllib.parse import unquote, urlparse

    cand = spark.read.text(list(paths)).filter(
        F.col("value").contains("book")
    )
    rows = (
        cand.select(
            F.input_file_name().alias("file"),
            F.explode(
                F.regexp_extract_all("value", F.lit(_ASSET_ID_RE), 1)
            ).alias("asset_id"),
        )
        .groupBy("file", "asset_id")
        .count()
        .collect()
    )
    per_file: dict[str, dict[str, int]] = defaultdict(dict)
    for r in rows:
        local = unquote(urlparse(r["file"]).path)
        per_file[local][r["asset_id"]] = int(r["count"])
    # files with zero book lines still deserve a sidecar (max=0 lets the
    # gate skip them without a scan): inputFiles() lists them from the
    # scan relation's metadata, no second data pass
    for f in spark.read.text(list(paths)).inputFiles():
        per_file.setdefault(unquote(urlparse(f).path), {})
    n = 0
    for local, counts in per_file.items():
        if Path(local).is_file():
            write_manifest(local, counts)
            n += 1
    return n


def _file_hour_re() -> str:
    """The canonical hour-bucket regex, imported from sources.frames at
    call time (same function-local import pattern replay() already uses)
    — a drifting copy here would silently merge unmatched files into one
    '' gate cell and force the hot path forever."""
    from polymarket_data_ingestor_spark.sources.frames import _FILE_HOUR_RE

    return _FILE_HOUR_RE


def replay(
    spark_or_frames,
    paths: Sequence[str] | None = None,
    markets: Iterable[str] | None = None,
    in_log_order: bool = False,
    ticks_only: bool = True,
    split_at_snapshots: bool | str = "auto",
    snapshots_per_segment: int = 1000,
) -> DataFrame:
    """End-to-end replay: raw frame logs → tick table (SURVEY §3.1).

    ``replay(spark, paths)`` reads + parses + replays; ``replay(frames_df)``
    replays an already-read frames DataFrame. ``ticks_only=True`` projects to
    the reference's exact 7-column sink schema (``tick_generator.rs:50-58``).
    ``split_at_snapshots`` — see :func:`replay_feed_messages` (hot-asset
    skew mitigation; identical output). When ``paths`` are given, the
    cold-profile gate runs as a raw-text scan (regex count, no JSON parse
    of non-book lines) whose result is memoized per immutable file set —
    so on a uniform profile the gate costs nothing after the first call,
    and the first call pays only the light text pass, not a second JSON
    parse.

    ``split_at_snapshots="auto"`` (the default since r15) applies the
    skew mitigation automatically: with ``paths``, the memoized raw-text
    gate decides hot vs cold exactly as the explicit ``True`` path
    always has — so a feed where one hyper-active asset carries half the
    messages no longer serializes that asset on one task by default
    (measured on the skewed sf0.1 bench fixture: ~11.5 s → ~4.5 s at 32
    cores, and the default path stops scaling NEGATIVELY with cores).
    Output is bit-identical row-for-row either way (a segment starts at
    a ``book`` snapshot, which fully resets per-asset state — parity is
    pinned by tests/test_replay.py and the bench's row-hash assert).
    Without ``paths`` (an already-parsed frames DataFrame), "auto"
    takes the plain per-asset path: the only gate available there is
    the parse-based eager Spark job, which a plan-building default must
    not silently run. Pass ``True`` to opt in to that gate, ``False``
    to force the plain path.
    """
    from polymarket_data_ingestor_spark.sources.frames import (
        parse_feed_messages,
        read_frames,
    )

    if split_at_snapshots == "auto":
        split_at_snapshots = paths is not None
    if paths is not None:
        frames = read_frames(spark_or_frames, paths)
    else:
        frames = spark_or_frames
    gate = "feed"
    if split_at_snapshots and paths is not None:
        # Path-aware gate: resolve hot/cold here from the raw-text
        # manifest; replay_feed_messages then skips its own (costlier,
        # parse-based) gate either way.
        if _max_snapshot_cell(spark_or_frames, paths) >= int(
            snapshots_per_segment
        ):
            gate = "hot"
        else:
            gate = "cold"
    feed = parse_feed_messages(frames)
    ticks = replay_feed_messages(
        feed,
        markets=markets,
        in_log_order=in_log_order,
        split_at_snapshots=split_at_snapshots and gate != "cold",
        snapshots_per_segment=snapshots_per_segment,
        assume_skewed=(gate == "hot"),
    )
    if ticks_only:
        ticks = ticks.select(*TICK_COLUMNS)
    return ticks


def write_tick_lake(
    ticks: DataFrame,
    path: str,
    mode: str = "overwrite",
    compact: bool = True,
) -> None:
    """Write ticks as an hour-partitioned Parquet lake (S7 at scale).

    ``partitionBy(file_hour)`` gives downstream time-range queries free
    partition pruning (the Catalyst-native version of the reference's
    filename-based pruning); snappy matches the reference sink codec
    (``tick_generator.rs:60-63``). Requires ``ticks_only=False`` replay
    output (the partition column).

    ``compact=True`` (default) hash-repartitions rows by ``file_hour``
    before the write, so each hour lands as ONE file instead of one
    file per upstream task — without it, every replay task holding any
    of an hour's assets opens a writer for that hour (tasks × hours
    small files; 372 vs 12 at the sf0.1 bench shape, and the write was
    ~25% faster compacted). Pass ``compact=False`` when a single hour
    is too big for one task — e.g. compose with a finer repartition on
    ``(file_hour, asset)`` — the small-files tradeoff is then the
    caller's.
    """
    if compact:
        ticks = ticks.repartition(F.col("file_hour"))
    (
        ticks.write.mode(mode)
        .partitionBy("file_hour")
        .parquet(path, compression="snappy")
    )


def with_event_time(ticks: DataFrame, column: str = "event_time") -> DataFrame:
    """Add a typed timestamp column from the verbatim epoch-ms string.

    The notebook's ``astype(int) + to_datetime(unit='ms')`` (C11,
    ``bbo.ipynb`` cell 0) as a Catalyst expression.
    """
    return ticks.withColumn(
        column, F.timestamp_millis(F.col("timestamp").cast("long"))
    )
