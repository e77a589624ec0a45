"""As-of join tests: semantics + the prevailing-BBO tick query."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from polymarket_data_ingestor_spark.operators.asof import (
    asof_join,
    trades_with_prevailing_bbo,
)
from polymarket_data_ingestor_spark.operators.replay import replay

from fixture_gen import naive_replay, write_fixture_files


def test_asof_backward_semantics(spark):
    probe = spark.createDataFrame(
        [("a", 5), ("a", 10), ("a", 2), ("b", 7)], "k string, t long"
    )
    ref = spark.createDataFrame(
        [("a", 3, 30.0), ("a", 5, 50.0), ("a", 9, 90.0), ("c", 1, 10.0)],
        "k string, t long, v double",
    )
    got = {
        (r.k, r.t): r.v
        for r in asof_join(probe, ref, by=["k"], order_col="t",
                           value_cols=["v"]).collect()
    }
    assert got == {
        ("a", 2): None,       # nothing at-or-before 2
        ("a", 5): 50.0,       # exact match wins (backward, inclusive)
        ("a", 10): 90.0,      # most recent before 10
        ("b", 7): None,       # no reference rows for key b
    }


def test_asof_strict_excludes_same_instant(spark):
    probe = spark.createDataFrame([("a", 5)], "k string, t long")
    ref = spark.createDataFrame(
        [("a", 3, 30.0), ("a", 5, 50.0)], "k string, t long, v double"
    )
    got = asof_join(probe, ref, by=["k"], order_col="t", value_cols=["v"],
                    strict=True).first()
    assert got.v == 30.0  # the t=5 reference no longer qualifies


def test_asof_tolerance_bounds_staleness(spark):
    """merge_asof tolerance parity: a match older than the bound yields
    null, in-bound matches (inclusive) are kept."""
    probe = spark.createDataFrame(
        [("a", 10), ("a", 20), ("a", 100)], "k string, t long"
    )
    ref = spark.createDataFrame(
        [("a", 8, 80.0), ("a", 18, 180.0)], "k string, t long, v double"
    )
    got = {
        (r.k, r.t): r.v
        for r in asof_join(probe, ref, by=["k"], order_col="t",
                           value_cols=["v"], tolerance=2).collect()
    }
    assert got == {
        ("a", 10): 80.0,      # gap 2 == tolerance: kept (inclusive)
        ("a", 20): 180.0,     # gap 2: kept
        ("a", 100): None,     # match exists (t=18) but 82 > 2: nulled
    }


def test_asof_value_collision_raises(spark):
    df = spark.createDataFrame([("a", 1, 2.0)], "k string, t long, v double")
    with pytest.raises(ValueError, match="collides"):
        asof_join(df, df, by=["k"], order_col="t", value_cols=["v"])


def test_trades_with_prevailing_bbo(spark, tmp_path):
    paths = write_fixture_files(tmp_path, n_hours=2, msgs_per_hour=150,
                                seed=13)
    ticks = replay(spark, [str(p) for p in paths], ticks_only=False)
    got = trades_with_prevailing_bbo(ticks).toPandas()

    # independent expectation from the naive oracle's strict log order
    rows = naive_replay(paths)
    last_quote: dict[str, dict[str, float]] = {}
    want = []
    for ts, kind, market, asset, side, price, size in rows:
        if kind == "BBO":
            last_quote.setdefault(asset, {})[side] = price
        else:
            q = last_quote.get(asset, {})
            want.append((ts, asset, price, q.get("ASK"), q.get("BID")))
    want_df = (
        pd.DataFrame(want, columns=["timestamp", "asset", "price",
                                    "best_ask", "best_bid"])
        .sort_values(["timestamp", "asset", "price"], kind="mergesort")
        .reset_index(drop=True)
    )
    got_df = (
        got[["timestamp", "asset", "price", "best_ask", "best_bid"]]
        .sort_values(["timestamp", "asset", "price"], kind="mergesort")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got_df, want_df)
    assert len(got_df) == sum(1 for r in rows if r[1] == "TRADE")


def test_asof_forward_semantics(spark):
    probe = spark.createDataFrame(
        [("a", 5), ("a", 10), ("a", 2), ("b", 7)], "k string, t long"
    )
    ref = spark.createDataFrame(
        [("a", 3, 30.0), ("a", 5, 50.0), ("a", 9, 90.0), ("c", 1, 10.0)],
        "k string, t long, v double",
    )
    got = {
        (r.k, r.t): r.v
        for r in asof_join(probe, ref, by=["k"], order_col="t",
                           value_cols=["v"],
                           direction="forward").collect()
    }
    assert got == {
        ("a", 2): 30.0,       # earliest at-or-after 2
        ("a", 5): 50.0,       # exact match wins (forward, inclusive)
        ("a", 10): None,      # nothing at-or-after 10
        ("b", 7): None,       # no reference rows for key b
    }
    # strict: the same-instant t=5 reference no longer qualifies
    s = {
        (r.k, r.t): r.v
        for r in asof_join(probe, ref, by=["k"], order_col="t",
                           value_cols=["v"], strict=True,
                           direction="forward").collect()
    }
    assert s[("a", 5)] == 90.0
    # tolerance bounds the look-ahead: t=2 -> 3 is within 2; t=5 -> 5
    # within; but with tolerance=1, t=2's nearest (3) still matches
    # while a gap of 4 (5 -> 9 under strict) would not
    tol = {
        (r.k, r.t): r.v
        for r in asof_join(probe, ref, by=["k"], order_col="t",
                           value_cols=["v"], strict=True, tolerance=1,
                           direction="forward").collect()
    }
    assert tol[("a", 2)] == 30.0 and tol[("a", 5)] is None


def test_asof_forward_matches_pandas_merge_asof(spark):
    """Randomized parity against pandas merge_asof(direction='forward')
    — the API whose semantics the parameter mirrors."""
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(7)
    probe = pd.DataFrame({
        "k": rng.choice(["x", "y", "z"], 60),
        "t": rng.randint(0, 100, 60).astype("int64"),
    })
    ref = pd.DataFrame({
        "k": rng.choice(["x", "y"], 40),
        "t": rng.randint(0, 100, 40).astype("int64"),
        "v": rng.rand(40).round(3),
    })
    # unique (k, t) on the reference: at duplicate order keys both
    # engines' pick is unspecified (documented), so dedup for parity
    ref = ref.drop_duplicates(["k", "t"]).reset_index(drop=True)
    want = pd.merge_asof(
        probe.sort_values("t").reset_index(drop=True),
        ref.sort_values("t").reset_index(drop=True),
        on="t", by="k", direction="forward",
    )
    got = asof_join(
        spark.createDataFrame(probe), spark.createDataFrame(ref),
        by=["k"], order_col="t", value_cols=["v"], direction="forward",
    ).toPandas()
    wm = {(r.k, r.t): None if pd.isna(r.v) else r.v
          for r in want.itertuples()}
    gm = {(r.k, r.t): None if pd.isna(r.v) else r.v
          for r in got.itertuples()}
    assert gm == wm


def test_asof_nearest_semantics(spark):
    probe = spark.createDataFrame(
        [("a", 5), ("a", 10), ("a", 2)], "k string, t long"
    )
    ref = spark.createDataFrame(
        [("a", 3, 30.0), ("a", 6, 60.0), ("a", 20, 200.0)],
        "k string, t long, v double",
    )
    got = {
        (r.k, r.t): r.v
        for r in asof_join(probe, ref, by=["k"], order_col="t",
                           value_cols=["v"],
                           direction="nearest").collect()
    }
    assert got == {
        ("a", 2): 30.0,   # 3 (gap 1) beats nothing-behind
        ("a", 5): 60.0,   # forward 6 (gap 1) beats backward 3 (gap 2)
        ("a", 10): 60.0,  # backward 6 (gap 4) beats forward 20 (gap 10)
    }
    # equal distance prefers backward (pandas rule): probe 4 or 5?
    # probe t=4: backward 3 (gap 1) vs forward 6 (gap 2) -> 30.0;
    # craft an exact tie instead: ref at 3 and 7, probe 5
    tie_ref = spark.createDataFrame(
        [("a", 3, 30.0), ("a", 7, 70.0)], "k string, t long, v double"
    )
    tie = asof_join(
        spark.createDataFrame([("a", 5)], "k string, t long"),
        tie_ref, by=["k"], order_col="t", value_cols=["v"],
        direction="nearest",
    ).first()
    assert tie.v == 30.0
    # tolerance: nearest outside the bound -> null even if the other
    # side has a (farther) match
    tol = asof_join(
        spark.createDataFrame([("a", 10)], "k string, t long"),
        tie_ref, by=["k"], order_col="t", value_cols=["v"],
        direction="nearest", tolerance=2,
    ).first()
    assert tol.v is None


def test_asof_nearest_matches_pandas_merge_asof(spark):
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(11)
    probe = pd.DataFrame({
        "k": rng.choice(["x", "y", "z"], 60),
        "t": rng.randint(0, 100, 60).astype("int64"),
    })
    ref = pd.DataFrame({
        "k": rng.choice(["x", "y"], 40),
        "t": rng.randint(0, 100, 40).astype("int64"),
        "v": rng.rand(40).round(3),
    }).drop_duplicates(["k", "t"]).reset_index(drop=True)
    for tol in (None, 5):
        want = pd.merge_asof(
            probe.sort_values("t").reset_index(drop=True),
            ref.sort_values("t").reset_index(drop=True),
            on="t", by="k", direction="nearest",
            tolerance=tol,
        )
        got = asof_join(
            spark.createDataFrame(probe), spark.createDataFrame(ref),
            by=["k"], order_col="t", value_cols=["v"],
            direction="nearest", tolerance=tol,
        ).toPandas()
        wm = {(r.k, r.t): None if pd.isna(r.v) else r.v
              for r in want.itertuples()}
        gm = {(r.k, r.t): None if pd.isna(r.v) else r.v
              for r in got.itertuples()}
        assert gm == wm, f"tolerance={tol}"


def test_asof_null_value_returns_matched_rows_null(spark):
    """A matched reference row whose value column is NULL must yield
    NULL — not skip to an older/farther row's value (pandas merge_asof
    returns the matched row's NaN). Regression for the per-column
    ignorenulls pick."""
    probe = spark.createDataFrame([("a", 10)], "k string, t long")
    ref = spark.createDataFrame(
        [("a", 3, 30.0), ("a", 9, None), ("a", 12, None), ("a", 20, 99.0)],
        "k string, t long, v double",
    )
    for direction in ("backward", "forward", "nearest"):
        got = asof_join(probe, ref, by=["k"], order_col="t",
                        value_cols=["v"], direction=direction).first()
        assert got.v is None, direction


def test_asof_nearest_multi_value_cols_from_same_row(spark):
    """All value columns must come from the SAME matched row: with two
    value columns where the nearest row has one NULL, the non-null
    column must still be that row's value, not a different row's."""
    probe = spark.createDataFrame([("a", 10)], "k string, t long")
    ref = spark.createDataFrame(
        [("a", 3, 30.0, 300.0), ("a", 9, None, 900.0)],
        "k string, t long, v double, w double",
    )
    got = asof_join(probe, ref, by=["k"], order_col="t",
                    value_cols=["v", "w"], direction="nearest").first()
    assert got.v is None and got.w == 900.0


def test_asof_null_values_match_pandas_merge_asof(spark):
    """Randomized parity with ~30% NULL values injected into the
    reference value column, all three directions."""
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(23)
    probe = pd.DataFrame({
        "k": rng.choice(["x", "y", "z"], 60),
        "t": rng.randint(0, 100, 60).astype("int64"),
    })
    ref = pd.DataFrame({
        "k": rng.choice(["x", "y"], 40),
        "t": rng.randint(0, 100, 40).astype("int64"),
        "v": rng.rand(40).round(3),
    }).drop_duplicates(["k", "t"]).reset_index(drop=True)
    ref.loc[rng.rand(len(ref)) < 0.3, "v"] = np.nan
    for direction in ("backward", "forward", "nearest"):
        want = pd.merge_asof(
            probe.sort_values("t").reset_index(drop=True),
            ref.sort_values("t").reset_index(drop=True),
            on="t", by="k", direction=direction,
        )
        got = asof_join(
            spark.createDataFrame(probe), spark.createDataFrame(ref),
            by=["k"], order_col="t", value_cols=["v"],
            direction=direction,
        ).toPandas()
        # NaN-valued matches and no-match both surface as NaN in pandas;
        # parity here is on the SURFACED value per probe row.
        wm = {(r.k, r.t): None if pd.isna(r.v) else r.v
              for r in want.itertuples()}
        gm = {(r.k, r.t): None if pd.isna(r.v) else r.v
              for r in got.itertuples()}
        assert gm == wm, direction


def test_asof_rejects_internal_value_col_names(spark):
    """A value column named '__o' (or any '__'-name) would collide with
    the matched-row struct's internal order field — must raise."""
    import pytest

    probe = spark.createDataFrame([(1, 10)], "k int, t int")
    ref = spark.createDataFrame([(1, 9, 5)], "k int, t int, __o int")
    with pytest.raises(ValueError, match="internal"):
        asof_join(probe, ref, by=["k"], order_col="t", value_cols=["__o"])


def test_asof_null_order_key_raises_not_garbage(spark):
    """A NULL order key sorts before every real key, so a NULL-ord
    reference row would silently become 'the latest quote before'
    every probe in its group — raise instead (pandas merge_asof
    refuses NaN keys); NULL by-keys GROUP TOGETHER (documented
    divergence from pandas' match-nothing)."""
    import pytest
    from pyspark.sql import functions as F

    from polymarket_data_ingestor_spark.operators.asof import asof_join

    probe = spark.createDataFrame(
        [("a", 5), ("a", 9)], "k string, t long"
    )
    ref_null = spark.createDataFrame(
        [("a", None, 1.0), ("a", 3, 2.0)], "k string, t long, v double"
    )
    with pytest.raises(Exception, match="NULL 't' in the reference"):
        asof_join(probe, ref_null, by=["k"], order_col="t",
                  value_cols=["v"]).collect()
    probe_null = spark.createDataFrame(
        [("a", None)], "k string, t long"
    )
    ref = ref_null.filter(F.col("t").isNotNull())
    with pytest.raises(Exception, match="NULL 't' in the probe"):
        asof_join(probe_null, ref, by=["k"], order_col="t",
                  value_cols=["v"]).collect()
    # NULL by-keys group together: the NULL-k probe sees the NULL-k ref
    got = asof_join(
        spark.createDataFrame([(None, 5)], "k string, t long"),
        spark.createDataFrame([(None, 3, 7.0)],
                              "k string, t long, v double"),
        by=["k"], order_col="t", value_cols=["v"],
    ).collect()
    assert len(got) == 1 and got[0]["v"] == 7.0
