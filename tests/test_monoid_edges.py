"""Edge-case pins for the r10 monoid family + dq_split: empty inputs,
all-NULL columns, and minimal capacities must degrade to empty/tiny
results — never to exceptions or wrong-schema frames (foreachBatch
twins hit exactly these shapes on quiet streams)."""

from __future__ import annotations

from pyspark.sql import functions as F

from polymarket_data_ingestor_spark.operators.analytics import (
    dq_split,
    finalize_heavy_hitters,
    finalize_quantile_rollup,
    finalize_sample_rollup,
    heavy_hitters_state,
    kmv_distinct_estimate,
    merge_quantile_rollup,
    merge_sample_rollup,
    quantile_rollup_state,
    sample_rollup_state,
)

SCHEMA = "g string, v double, item string"


def _empty(spark):
    return spark.createDataFrame([], SCHEMA)


def test_quantile_rollup_empty_and_all_null(spark):
    empty_state = quantile_rollup_state(_empty(spark), ("g",), "v")
    assert empty_state.count() == 0
    assert finalize_quantile_rollup(empty_state, (0.5,)).count() == 0

    nulls = spark.createDataFrame(
        [("a", None, "x"), ("a", None, "y")], SCHEMA
    )
    st = quantile_rollup_state(nulls, ("g",), "v")
    assert st.count() == 0  # documented: no non-null values, no row

    # merging an empty state into a real one is the identity
    real = quantile_rollup_state(
        spark.createDataFrame([("a", 1.0, "x"), ("a", 3.0, "y")], SCHEMA),
        ("g",), "v",
    )
    merged = merge_quantile_rollup(real, empty_state, keys=("g",))
    row = finalize_quantile_rollup(merged, (0.5,)).collect()
    assert [(r["g"], r["p50"]) for r in row] == [("a", 1.0)]


def test_heavy_hitters_empty_all_null_and_k1(spark):
    assert heavy_hitters_state(_empty(spark), ("g",), "item").count() == 0
    nulls = spark.createDataFrame(
        [("a", 1.0, None), ("a", 2.0, None)], SCHEMA
    )
    assert heavy_hitters_state(nulls, ("g",), "item").count() == 0

    # k=1 (the most lossy legal capacity): bounds still hold
    df = spark.createDataFrame(
        [("a", 0.0, it) for it in
         ["x"] * 8 + ["y"] * 3 + ["z"] * 2], SCHEMA
    ).coalesce(1)
    rows = finalize_heavy_hitters(
        heavy_hitters_state(df, ("g",), "item", k=1)
    ).collect()
    assert len(rows) <= 1
    for r in rows:
        true = {"x": 8, "y": 3, "z": 2}[r["item"]]
        assert r["est_count"] <= true <= r["est_count"] + r["max_undercount"]


def test_sample_rollup_empty_k1_and_duplicate_ids(spark):
    empty_state = sample_rollup_state(_empty(spark), ("g",), "item")
    assert empty_state.count() == 0
    assert finalize_sample_rollup(empty_state).count() == 0

    # duplicate ids never waste slots; k=1 keeps exactly one
    df = spark.createDataFrame(
        [("a", 0.0, "x")] * 5 + [("a", 0.0, "y")] * 5, SCHEMA
    )
    st = sample_rollup_state(df, ("g",), "item", k=1, seed=2)
    rows = finalize_sample_rollup(st).collect()
    assert len(rows) == 1 and rows[0]["sample_id"] in ("x", "y")
    # below capacity the KMV estimate is the exact distinct count
    st2 = sample_rollup_state(df, ("g",), "item", k=8, seed=2)
    est = kmv_distinct_estimate(st2).collect()[0]["n_distinct_est"]
    assert est == 2.0
    # merging with the empty state is the identity
    merged = merge_sample_rollup(st2, empty_state, keys=("g",))
    assert sorted(
        r["sample_id"] for r in finalize_sample_rollup(merged).collect()
    ) == ["x", "y"]


def test_kmv_estimate_zero_hash_is_finite(spark):
    """ADVICE-r10: hash32 can legitimately be 0 (md5 prefix
    "00000000"); at capacity the k-th smallest hash being 0 must give
    the clamped finite ceiling (k−1)·2³², never Infinity."""
    import math

    from pyspark.sql import functions as F

    # two ids colliding at hash 0 fill a k=2 state: h_k = 0
    st = spark.createDataFrame(
        [("a", [0, 0], ["i0", "i1"], 2, 1)],
        "g string, s_hash array<bigint>, s_id array<string>, "
        "s_k int, s_seed int",
    )
    est = kmv_distinct_estimate(st).collect()[0]["n_distinct_est"]
    assert math.isfinite(est) and est == (2 - 1) * 2.0 ** 32
    # a zero NOT in the k-th slot keeps the normal estimator
    st2 = spark.createDataFrame(
        [("a", [0, 1 << 31], ["i0", "i1"], 2, 1)],
        "g string, s_hash array<bigint>, s_id array<string>, "
        "s_k int, s_seed int",
    )
    est2 = kmv_distinct_estimate(st2).collect()[0]["n_distinct_est"]
    assert est2 == (2 - 1) * 2.0 ** 32 / float(1 << 31)


def test_dq_split_empty_and_all_bad(spark):
    empty = spark.createDataFrame([], "k long, v double")
    clean, bad = dq_split(empty, {"v": {"min": 0.0}})
    assert clean.count() == 0 and bad.count() == 0
    assert "dq_failed" in bad.columns and "dq_failed" not in clean.columns

    allbad = spark.createDataFrame([(1, -1.0), (2, -2.0)],
                                   "k long, v double")
    clean, bad = dq_split(allbad, {"v": {"min": 0.0}})
    assert clean.count() == 0 and bad.count() == 2


def test_cli_lake_stats_distinct_flow(spark, tmp_path, monkeypatch,
                                      capsys):
    """The --stat distinct CLI path (HLL state; binary sketch column
    must stay out of the printed rows)."""
    from polymarket_data_ingestor_spark import cli

    monkeypatch.setattr(cli, "get_spark", lambda **kw: spark)
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    d1 = str(tmp_path / "d1")
    ev.write.parquet(d1)
    state = str(tmp_path / "dstate")
    assert cli.main(["lake", "stats", d1, "--state", state,
                     "--stat", "distinct", "--keys", "event_type",
                     "--value", "user_id"]) == 0
    out = capsys.readouterr().out
    assert "'n_distinct':" in out and "'hll'" not in out


def test_monoids_multi_column_and_typed_keys(spark):
    """Every monoid groups correctly by MULTIPLE key columns of
    non-string types (bigint + string): the schema builder reproduces
    the key dtypes and the pandas groupby/merge path round-trips
    tuple keys — only single string keys were pinned elsewhere."""
    df = spark.createDataFrame(
        [(1, "a", 10.0, "x"), (1, "a", 30.0, "x"), (1, "b", 5.0, "y"),
         (2, "a", 7.0, "y"), (2, "a", 9.0, "z")],
        "uid long, side string, v double, item string",
    )
    keys = ("uid", "side")

    st = quantile_rollup_state(df, keys, "v", k=64)
    got = {
        (r["uid"], r["side"]): r["p50"]
        for r in finalize_quantile_rollup(st, (0.5,)).collect()
    }
    assert got == {(1, "a"): 10.0, (1, "b"): 5.0, (2, "a"): 7.0}, got
    assert dict(st.dtypes)["uid"] == "bigint"

    hh = {
        (r["uid"], r["side"], r["item"]): r["est_count"]
        for r in finalize_heavy_hitters(
            heavy_hitters_state(df, keys, "item", k=8)
        ).collect()
    }
    assert hh == {(1, "a", "x"): 2, (1, "b", "y"): 1,
                  (2, "a", "y"): 1, (2, "a", "z"): 1}, hh

    smp = {
        (r["uid"], r["side"])
        for r in finalize_sample_rollup(
            sample_rollup_state(df, keys, "item", k=4)
        ).collect()
    }
    assert smp == {(1, "a"), (1, "b"), (2, "a")}, smp

    from polymarket_data_ingestor_spark.operators.analytics import (
        finalize_topk_rollup,
        topk_rollup_state,
    )

    tk = {
        (r["uid"], r["side"], r["rank"]): r["item"]
        for r in finalize_topk_rollup(
            topk_rollup_state(df, keys, "item", "v", k=1)
        ).collect()
    }
    assert tk == {(1, "a", 1): "x", (1, "b", 1): "y",
                  (2, "a", 1): "z"}, tk


def test_cli_lake_stats_sample_flow(spark, tmp_path, monkeypatch,
                                    capsys):
    """--stat sample through the CLI: the maintained bottom-k sample
    over two deltas equals a one-pass sample (true monoid, via the
    shell)."""
    from polymarket_data_ingestor_spark import cli

    monkeypatch.setattr(cli, "get_spark", lambda **kw: spark)
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    d1, d2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    ev.filter(F.col("event_id") % 2 == 0).write.parquet(d1)
    ev.filter(F.col("event_id") % 2 == 1).write.parquet(d2)
    state = str(tmp_path / "sstate")
    for d in (d1, d2):
        assert cli.main(["lake", "stats", d, "--state", state,
                         "--stat", "sample", "--keys", "event_type",
                         "--value", "user_id", "--k", "5"]) == 0
    from polymarket_data_ingestor_spark.streaming.live import (
        read_rollup_state,
    )

    got = {
        (r["event_type"], r["sample_id"])
        for r in finalize_sample_rollup(
            read_rollup_state(spark, state)
        ).collect()
    }
    want = {
        (r["event_type"], r["sample_id"])
        for r in finalize_sample_rollup(
            sample_rollup_state(ev, ("event_type",), "user_id", k=5)
        ).collect()
    }
    assert got == want and len(got) == 25  # 5 types x k=5


def test_cli_lake_stats_minhash_flow(spark, tmp_path, monkeypatch,
                                     capsys):
    """--stat minhash through the CLI: two-delta maintained signatures
    equal a one-pass state (true monoid, via the shell)."""
    from polymarket_data_ingestor_spark import cli
    from polymarket_data_ingestor_spark.operators.analytics import (
        minhash_rollup_state,
    )
    from polymarket_data_ingestor_spark.streaming.live import (
        read_rollup_state,
    )

    monkeypatch.setattr(cli, "get_spark", lambda **kw: spark)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    d1, d2 = str(tmp_path / "m1"), str(tmp_path / "m2")
    docs.filter(F.col("doc_id") % 2 == 0).write.parquet(d1)
    docs.filter(F.col("doc_id") % 2 == 1).write.parquet(d2)
    state = str(tmp_path / "mhstate")
    for d in (d1, d2):
        assert cli.main(["lake", "stats", d, "--state", state,
                         "--stat", "minhash", "--keys", "lang",
                         "--value", "text", "--k", "8",
                         "--seed", "2"]) == 0
    got = {
        r["lang"]: list(r["mh_sig"])
        for r in read_rollup_state(spark, state).collect()
    }
    want = {
        r["lang"]: list(r["mh_sig"])
        for r in minhash_rollup_state(
            docs, ("lang",), "text", n_hashes=8, seed=2).collect()
    }
    assert got == want
    out = capsys.readouterr().out
    assert "'slot':" in out and "'mh_sig'" not in out


def test_topk_rollup_empty_nulls_k1_and_ties(spark):
    from polymarket_data_ingestor_spark.operators.analytics import (
        finalize_topk_rollup,
        merge_topk_rollup,
        topk_rollup_state,
    )

    empty_state = topk_rollup_state(_empty(spark), ("g",), "item", "v")
    assert empty_state.count() == 0
    assert finalize_topk_rollup(empty_state).count() == 0

    # NULL ids and NULL scores are ignored; all-NULL key emits nothing
    df = spark.createDataFrame(
        [("a", 3.0, "x"), ("a", None, "y"), ("a", 5.0, None),
         ("a", 1.0, "z")], SCHEMA
    )
    st = topk_rollup_state(df, ("g",), "item", "v", k=2)
    rows = finalize_topk_rollup(st).collect()
    assert [(r["rank"], r["item"], r["score"]) for r in rows] == [
        (1, "x", 3.0), (2, "z", 1.0)
    ]
    all_null = topk_rollup_state(
        spark.createDataFrame([("a", None, None)], SCHEMA),
        ("g",), "item", "v", k=2,
    )
    assert all_null.count() == 0

    # k=1 with a score tie: string-id ASC breaks it deterministically
    tie = spark.createDataFrame(
        [("a", 7.0, "bb"), ("a", 7.0, "aa")], SCHEMA
    )
    rows = finalize_topk_rollup(
        topk_rollup_state(tie, ("g",), "item", "v", k=1)
    ).collect()
    assert [(r["item"], r["score"]) for r in rows] == [("aa", 7.0)]

    # merging with the empty state is the identity
    merged = merge_topk_rollup(st, empty_state, keys=("g",))
    assert sorted(
        (r["rank"], r["item"]) for r in
        finalize_topk_rollup(merged).collect()
    ) == [(1, "x"), (2, "z")]


def test_cli_lake_stats_topk_flow(spark, tmp_path, monkeypatch, capsys):
    """--stat topk through the CLI: maintained leaderboard over two
    deltas equals a one-pass top-k (true monoid, via the shell);
    --stat topk without --score refuses with exit 2."""
    from polymarket_data_ingestor_spark import cli
    from polymarket_data_ingestor_spark.operators.analytics import (
        finalize_topk_rollup,
        topk_rollup_state,
    )
    from polymarket_data_ingestor_spark.streaming.live import (
        read_rollup_state,
    )

    monkeypatch.setattr(cli, "get_spark", lambda **kw: spark)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    d1, d2 = str(tmp_path / "t1"), str(tmp_path / "t2")
    docs.filter(F.col("doc_id") % 2 == 0).write.parquet(d1)
    docs.filter(F.col("doc_id") % 2 == 1).write.parquet(d2)
    state = str(tmp_path / "tkstate")
    assert cli.main(["lake", "stats", d1, "--state", state,
                     "--stat", "topk", "--keys", "source",
                     "--value", "doc_id"]) == 2  # no --score
    for d in (d1, d2):
        assert cli.main(["lake", "stats", d, "--state", state,
                         "--stat", "topk", "--keys", "source",
                         "--value", "doc_id", "--score", "n_chars",
                         "--k", "3"]) == 0
    got = [
        (r["source"], r["rank"], r["item"], r["score"])
        for r in finalize_topk_rollup(read_rollup_state(spark, state))
        .orderBy("source", "rank").collect()
    ]
    want = [
        (r["source"], r["rank"], r["item"], r["score"])
        for r in finalize_topk_rollup(
            topk_rollup_state(docs, ("source",), "doc_id", "n_chars",
                              k=3)
        ).orderBy("source", "rank").collect()
    ]
    assert got == want and len(got) == 3 * docs.select(
        "source").distinct().count()
    assert "'rank':" in capsys.readouterr().out


def test_minhash_rollup_empty_nulls_and_contract(spark):
    from polymarket_data_ingestor_spark.operators.analytics import (
        finalize_minhash_rollup,
        merge_minhash_rollup,
        minhash_rollup_state,
        minhash_similarity_pairs,
    )

    assert minhash_rollup_state(_empty(spark), ("g",), "item").count() == 0
    nulls = spark.createDataFrame([("a", 1.0, None)], SCHEMA)
    assert minhash_rollup_state(nulls, ("g",), "item").count() == 0

    df = spark.createDataFrame(
        [("a", 0.0, "x"), ("a", 0.0, "y"), ("b", 0.0, "x")], SCHEMA
    )
    st = minhash_rollup_state(df, ("g",), "item", n_hashes=4, seed=2)
    # duplicate items are idempotent: re-folding the same rows is a no-op
    again = merge_minhash_rollup(
        st, minhash_rollup_state(df, ("g",), "item", 4, 2), keys=("g",)
    )
    assert (
        {r["g"]: list(r["mh_sig"]) for r in again.collect()}
        == {r["g"]: list(r["mh_sig"]) for r in st.collect()}
    )
    # finalize: n_hashes rows per key, slot is long
    fin = finalize_minhash_rollup(st)
    assert fin.count() == 8 and dict(fin.dtypes)["slot"] == "bigint"
    # single-key state: similarity has no pairs, not an error
    only_a = minhash_rollup_state(
        df.filter(F.col("g") == "a"), ("g",), "item", 4, 2
    )
    assert minhash_similarity_pairs(only_a, ("g",)).count() == 0
    # identical item sets -> est_jaccard 1.0
    twin = spark.createDataFrame(
        [("a", 0.0, "x"), ("b", 0.0, "x")], SCHEMA
    )
    sim = minhash_similarity_pairs(
        minhash_rollup_state(twin, ("g",), "item", 4, 2), ("g",)
    ).collect()
    assert [(r["g_a"], r["g_b"], r["est_jaccard"]) for r in sim] == [
        ("a", "b", 1.0)
    ]
    # n_hashes bounds
    import pytest as _pytest

    with _pytest.raises(ValueError, match="n_hashes"):
        minhash_rollup_state(df, ("g",), "item", n_hashes=0)
    with _pytest.raises(ValueError, match="n_hashes"):
        minhash_rollup_state(df, ("g",), "item", n_hashes=257)


def test_topk_nan_inf_scores_and_minhash_multikey_similarity(spark):
    """r11 deliberate edge sweep, pinned: genuine Spark-side NaN
    scores are dropped (JVM dropna keeps NaN; the pandas prepare
    drops it), ±inf order correctly with dense ranks; minhash
    similarity works over MULTI-COLUMN keys (struct<struct ordering),
    honors min_similarity, and n_hashes=1 self-merge is idempotent."""
    from polymarket_data_ingestor_spark.operators.analytics import (
        finalize_topk_rollup,
        merge_minhash_rollup,
        minhash_rollup_state,
        minhash_similarity_pairs,
        topk_rollup_state,
    )

    df = spark.createDataFrame(
        [("a", float("nan"), "x"), ("a", 2.0, "y"),
         ("a", float("inf"), "z"), ("a", float("-inf"), "w")], SCHEMA
    )
    rows = finalize_topk_rollup(
        topk_rollup_state(df, ("g",), "item", "v", k=4)).collect()
    assert [(r["rank"], r["item"], r["score"]) for r in rows] == [
        (1, "z", float("inf")), (2, "y", 2.0),
        (3, "w", float("-inf")),
    ]

    mk = spark.createDataFrame(
        [(1, "a", "x"), (1, "a", "y"), (1, "b", "x"),
         (2, "a", "x"), (2, "a", "y")],
        "uid long, side string, item string",
    )
    st = minhash_rollup_state(mk, ("uid", "side"), "item",
                              n_hashes=4, seed=2)
    pairs = {
        ((r["uid_a"], r["side_a"]), (r["uid_b"], r["side_b"])):
        r["est_jaccard"]
        for r in minhash_similarity_pairs(st, ("uid", "side")).collect()
    }
    assert len(pairs) == 3
    assert pairs[((1, "a"), (2, "a"))] == 1.0  # identical item sets
    n_flt = minhash_similarity_pairs(
        st, ("uid", "side"), min_similarity=0.9).count()
    assert 1 <= n_flt < 3

    one = minhash_rollup_state(mk, ("uid",), "item", n_hashes=1, seed=2)
    m = merge_minhash_rollup(one, one, keys=("uid",))
    assert (
        {r["uid"]: list(r["mh_sig"]) for r in one.collect()}
        == {r["uid"]: list(r["mh_sig"]) for r in m.collect()}
    )


def test_cli_lake_stats_windowed_mode(spark, tmp_path, monkeypatch,
                                      capsys):
    """--label windowed mode through the CLI: per-day folds, --window
    merges only the newest N labels, --retain-labels expires, and the
    argument guards refuse windowed flags without --label."""
    from polymarket_data_ingestor_spark import cli
    from polymarket_data_ingestor_spark.operators.analytics import (
        rollup_state,
    )
    from polymarket_data_ingestor_spark.streaming import state_labels

    monkeypatch.setattr(cli, "get_spark", lambda **kw: spark)
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    days = [r["d"] for r in ev.select(
        F.to_date("ts").alias("d")).distinct().orderBy("d").limit(3)
        .collect()]
    deltas = []
    for i, d in enumerate(days):
        p = str(tmp_path / f"day{i}")
        ev.filter(F.to_date("ts") == d).write.parquet(p)
        deltas.append(p)
    state = str(tmp_path / "wstate")

    # guards
    assert cli.main(["lake", "stats", deltas[0], "--state", state,
                     "--stat", "summary", "--keys", "event_type",
                     "--value", "value", "--window", "2"]) == 2
    assert cli.main(["lake", "stats", deltas[0], "--state", state,
                     "--stat", "summary", "--keys", "event_type",
                     "--value", "value", "--label", "../x"]) == 2

    for d, delta in zip(days, deltas):
        assert cli.main(["lake", "stats", delta, "--state", state,
                         "--stat", "summary", "--keys", "event_type",
                         "--value", "value",
                         "--label", d.isoformat(),
                         "--window", "2"]) == 0
    out = capsys.readouterr().out
    assert "window: 2 label(s)" in out

    # the printed window (= CLI's last fold) equals a direct rollup
    # over the last two days; verify via the stored labels instead of
    # parsing stdout: merge d= dirs of the newest two labels
    labels = state_labels(spark, state)
    assert labels == sorted(d.isoformat() for d in days)
    merged = spark.read.parquet(
        f"{state}/d={labels[-2]}", f"{state}/d={labels[-1]}")
    got_n = {
        r["event_type"]: r["n"]
        for r in merged.groupBy("event_type").agg(
            F.sum("n").alias("n")).collect()
    }
    want_n = {
        r["event_type"]: r["n"]
        for r in rollup_state(
            ev.filter(F.to_date("ts").isin(days[-2:])),
            ("event_type",), "value").collect()
    }
    assert got_n == want_n

    # retention from the shell
    assert cli.main(["lake", "stats", deltas[-1], "--state", state,
                     "--stat", "summary", "--keys", "event_type",
                     "--value", "value",
                     "--label", days[-1].isoformat(),
                     "--retain-labels", "2"]) == 0
    assert state_labels(spark, state) == sorted(
        d.isoformat() for d in days[-2:])

    # the windowed path is merge-fn generic: a SKETCH stat (quantiles)
    # folds and windows through the same CLI flow
    qstate = str(tmp_path / "wqstate")
    for d, delta in zip(days[:2], deltas[:2]):
        assert cli.main(["lake", "stats", delta, "--state", qstate,
                         "--stat", "quantiles", "--keys", "event_type",
                         "--value", "value", "--quantiles", "0.5",
                         "--label", d.isoformat(),
                         "--window", "2"]) == 0
    out = capsys.readouterr().out
    assert "'p50':" in out and "window: 2 label(s)" in out


def test_cli_lake_compact_labels(spark, tmp_path, monkeypatch):
    """compact-labels through the CLI: dailies merge into a coarse
    label, the sources retire, window answers unchanged; a re-run
    after the merge (resume semantics) exits 0; bad args exit 2."""
    from polymarket_data_ingestor_spark import cli
    from polymarket_data_ingestor_spark.operators.analytics import (
        merge_rollup,
        rollup_state,
    )
    from polymarket_data_ingestor_spark.streaming import (
        fold_labeled_state,
        read_window_state,
        state_labels,
    )

    monkeypatch.setattr(cli, "get_spark", lambda **kw: spark)
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    days = [r["d"] for r in ev.select(
        F.to_date("ts").alias("d")).distinct().orderBy("d").limit(2)
        .collect()]
    state = str(tmp_path / "clstate")
    for d in days:
        fold_labeled_state(
            spark, state, d.isoformat(),
            rollup_state(ev.filter(F.to_date("ts") == d),
                         ("event_type",), "value"),
        )
    labels_arg = ",".join(d.isoformat() for d in days)
    mfn = lambda *st: merge_rollup(*st, keys=("event_type",))  # noqa: E731
    want = {
        r["event_type"]: (r["n"], r["sum_v"])
        for r in read_window_state(spark, state, mfn).collect()
    }

    assert cli.main(["lake", "compact-labels", state, "--stat",
                     "summary", "--keys", "event_type",
                     "--labels", labels_arg, "--into", "2024-01"]) == 0
    assert state_labels(spark, state) == ["2024-01"]
    got = {
        r["event_type"]: (r["n"], r["sum_v"])
        for r in read_window_state(spark, state, mfn).collect()
    }
    assert got == want

    # a re-run after COMPLETION refuses (no manifest + committed
    # into-label = immutability guard; re-targeting an existing coarse
    # label must never clobber it — r11 second review)
    assert cli.main(["lake", "compact-labels", state, "--stat",
                     "summary", "--keys", "event_type",
                     "--labels", labels_arg, "--into", "2024-01"]) == 1
    assert state_labels(spark, state) == ["2024-01"]

    # guards: empty keys/labels, bad into-label, uncommitted sources
    # with no committed target
    assert cli.main(["lake", "compact-labels", state, "--stat",
                     "summary", "--keys", "", "--labels", labels_arg,
                     "--into", "x"]) == 2
    assert cli.main(["lake", "compact-labels", state, "--stat",
                     "summary", "--keys", "event_type",
                     "--labels", labels_arg, "--into", "../x"]) == 2
    assert cli.main(["lake", "compact-labels", state, "--stat",
                     "summary", "--keys", "event_type",
                     "--labels", "ghost1,ghost2", "--into", "g"]) == 1


def test_cli_lake_stats_show(spark, tmp_path, monkeypatch, capsys):
    """Read-only `lake stats-show` over BOTH layouts: cumulative v=N
    (auto-detected, --window refused) and labeled d=<label>
    (windowed); missing state exits 1; never writes."""
    import pathlib

    from polymarket_data_ingestor_spark import cli
    from polymarket_data_ingestor_spark.operators.analytics import (
        rollup_state,
    )
    from polymarket_data_ingestor_spark.streaming import (
        fold_labeled_state,
    )

    monkeypatch.setattr(cli, "get_spark", lambda **kw: spark)
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    d1 = str(tmp_path / "d1")
    ev.write.parquet(d1)

    # cumulative layout via a real fold
    cstate = str(tmp_path / "cstate")
    assert cli.main(["lake", "stats", d1, "--state", cstate,
                     "--stat", "summary", "--keys", "event_type",
                     "--value", "value"]) == 0
    capsys.readouterr()
    before = sorted(p.name for p in pathlib.Path(cstate).iterdir())
    assert cli.main(["lake", "stats-show", cstate, "--stat", "summary",
                     "--keys", "event_type"]) == 0
    out = capsys.readouterr().out
    assert "'avg_v':" in out and "cumulative v=1" in out
    # read-only: the state dir is unchanged
    assert sorted(p.name for p in pathlib.Path(cstate).iterdir()) \
        == before
    # --window on a cumulative state refuses
    assert cli.main(["lake", "stats-show", cstate, "--stat", "summary",
                     "--keys", "event_type", "--window", "2"]) == 2

    # labeled layout
    lstate = str(tmp_path / "lstate")
    days = [r["d"] for r in ev.select(
        F.to_date("ts").alias("d")).distinct().orderBy("d").limit(2)
        .collect()]
    for d in days:
        fold_labeled_state(
            spark, lstate, d.isoformat(),
            rollup_state(ev.filter(F.to_date("ts") == d),
                         ("event_type",), "value"),
        )
    assert cli.main(["lake", "stats-show", lstate, "--stat", "summary",
                     "--keys", "event_type", "--window", "1"]) == 0
    out = capsys.readouterr().out
    assert f"window: 1 label(s) [{days[-1].isoformat()}.." in out

    # nothing committed
    assert cli.main(["lake", "stats-show", str(tmp_path / "nope"),
                     "--stat", "summary", "--keys", "event_type"]) == 1


def test_minhash_prehashed_range_guard(spark):
    """r11 ADVICE, pinned: prehashed=True range-checks [0, 2^32) — a
    64-bit hash (xxhash64/murmur) would silently overflow the
    Carter-Wegman long multiply for higher slots (and diverge from the
    DuckDB oracle running the identical arithmetic). NULLs are still
    IGNORED (dropped), never raised on; in-range values build the same
    state the raw-item path's own hash32 would for those longs."""
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError

    from polymarket_data_ingestor_spark.operators.analytics import (
        minhash_rollup_state,
    )

    ok = spark.createDataFrame(
        [("a", 0), ("a", 2 ** 32 - 1), ("a", None)],
        "g string, h long",
    )
    st = minhash_rollup_state(ok, ("g",), "h", n_hashes=4, seed=0,
                              prehashed=True)
    rows = st.collect()
    assert len(rows) == 1 and len(rows[0]["mh_sig"]) == 4
    assert all(s >= 0 for s in rows[0]["mh_sig"])

    for bad_val in (-1, 2 ** 32, 2 ** 62):
        bad = spark.createDataFrame([("a", bad_val)], "g string, h long")
        bad_st = minhash_rollup_state(bad, ("g",), "h", n_hashes=4,
                                      seed=0, prehashed=True)
        with _pytest.raises(Exception, match="hash32 range") as ei:
            bad_st.collect()
        assert isinstance(ei.value, Py4JJavaError) or "hash32" in str(
            ei.value)


def test_minhash_similarity_broadcast_guard(spark):
    """r11 verdict #3 + r12 second review, pinned: above the
    broadcast_max_bytes BUDGET (bytes, not keys — a k=1024 sample row
    is ~64x a minhash row, so one key-count threshold cannot fit both)
    the pair join is forced to a DISTRIBUTED cartesian
    (shuffle_replicate_nl) — a caller keying by DOCUMENT would
    broadcast-explode a corpus-sized table into every executor, and
    merely dropping the hint lets the planner's size stats re-pick
    BNLJ — and the results are identical either way."""
    from polymarket_data_ingestor_spark.operators.analytics import (
        minhash_rollup_state,
        minhash_similarity_pairs,
    )

    df = spark.createDataFrame(
        [("a", "x"), ("a", "y"), ("b", "x"), ("c", "z")],
        "g string, item string",
    )
    st = minhash_rollup_state(df, ("g",), "item", n_hashes=4, seed=2)
    st = st.persist()
    try:
        hinted = minhash_similarity_pairs(st, ("g",))
        plain = minhash_similarity_pairs(st, ("g",),
                                         broadcast_max_bytes=1)
        hp = hinted._jdf.queryExecution().executedPlan().toString()
        pp = plain._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in hp or "BroadcastNestedLoopJoin" in hp
        assert "Broadcast" not in pp and "CartesianProduct" in pp, pp
        key = lambda r: (r["g_a"], r["g_b"])  # noqa: E731
        assert sorted(map(key, hinted.collect())) == sorted(
            map(key, plain.collect()))
    finally:
        st.unpersist()


def test_fold_labeled_state_multi_file(spark, tmp_path):
    """r11 verdict #4, pinned: a label committed with n_files > 1
    still lists, reads, window-merges, and compacts correctly (readers
    glob the directory; file count is a write-parallelism knob, not a
    layout contract), and n_files < 1 refuses."""
    import pathlib

    import pytest as _pytest

    from polymarket_data_ingestor_spark.operators.analytics import (
        merge_rollup,
        rollup_state,
    )
    from polymarket_data_ingestor_spark.streaming import (
        compact_state_labels,
        fold_labeled_state,
        read_window_state,
        state_labels,
    )

    df = spark.createDataFrame(
        [(f"k{i % 7}", float(i)) for i in range(40)], "g string, v double"
    )
    state = str(tmp_path / "mfstate")
    st = rollup_state(df.repartition(4), ("g",), "v")
    with _pytest.raises(ValueError, match="n_files"):
        fold_labeled_state(spark, state, "d1", st, n_files=0)
    # n_files is a coalesce CAP — feed a state with >1 partitions so
    # the multi-file layout is genuinely exercised (AQE shrinks a
    # tiny agg to 1 partition on its own)
    fold_labeled_state(spark, state, "d1", st.repartition(3), n_files=3)
    fold_labeled_state(spark, state, "d2", st, n_files=1)
    n_parts = len(list(pathlib.Path(f"{state}/d=d1").glob("part-*")))
    assert n_parts > 1  # genuinely multi-file
    assert state_labels(spark, state) == ["d1", "d2"]

    mfn = lambda *s: merge_rollup(*s, keys=("g",))  # noqa: E731
    win = read_window_state(spark, state, mfn)
    want = {r["g"]: (r["n"], r["sum_v"])
            for r in mfn(st, st).collect()}
    got = {r["g"]: (r["n"], r["sum_v"]) for r in win.collect()}
    assert got == want

    action, removed = compact_state_labels(
        spark, state, ["d1", "d2"], "m1", mfn, contract="summary/g")
    assert action == "merged" and removed == ["d1", "d2"]
    got2 = {r["g"]: (r["n"], r["sum_v"])
            for r in read_window_state(spark, state, mfn).collect()}
    assert got2 == want


def test_cli_lake_stats_layout_mixing_refused(spark, tmp_path,
                                              monkeypatch, capsys):
    """r11 ADVICE, pinned: a state directory's layout is a contract —
    folding --label into a cumulative (v=N) state, or cumulative into
    a labeled (d=) state, refuses with exit 2 and leaves the
    directory untouched (one accidental labeled fold would otherwise
    shadow the whole cumulative history in stats-show's auto-detect)."""
    import pathlib

    from polymarket_data_ingestor_spark import cli

    monkeypatch.setattr(cli, "get_spark", lambda **kw: spark)
    delta = str(tmp_path / "delta")
    spark.createDataFrame(
        [("a", 1.0), ("b", 2.0)], "g string, v double"
    ).write.parquet(delta)
    base = ["lake", "stats", delta, "--stat", "summary",
            "--keys", "g", "--value", "v"]

    cstate = str(tmp_path / "cstate")
    assert cli.main(base + ["--state", cstate]) == 0
    before = sorted(p.name for p in pathlib.Path(cstate).iterdir())
    assert cli.main(base + ["--state", cstate, "--label", "d1"]) == 2
    assert "cumulative (v=N)" in capsys.readouterr().err
    assert sorted(p.name for p in pathlib.Path(cstate).iterdir()) == before

    lstate = str(tmp_path / "lstate")
    assert cli.main(base + ["--state", lstate, "--label", "d1"]) == 0
    before = sorted(p.name for p in pathlib.Path(lstate).iterdir())
    assert cli.main(base + ["--state", lstate]) == 2
    assert "labeled (d=<label>)" in capsys.readouterr().err
    assert sorted(p.name for p in pathlib.Path(lstate).iterdir()) == before

    # --state-files flows through both modes; <1 refuses pre-Spark
    assert cli.main(base + ["--state", cstate, "--state-files", "0"]) == 2
    assert cli.main(base + ["--state", cstate, "--state-files", "2"]) == 0
    assert cli.main(base + ["--state", lstate, "--label", "d2",
                            "--state-files", "2"]) == 0


def test_cli_lake_stats_multi_stat_single_delta_read(spark, tmp_path,
                                                     monkeypatch,
                                                     capsys):
    """r11 verdict #5, pinned: `--stat a,b,c` folds every stat off ONE
    cached delta — the delta path's reader is invoked exactly once and
    the resulting DataFrame is persisted (so the parquet scan runs
    once; subsequent builds read InMemoryTableScan), each stat commits
    under <state>/<stat>, and the values match per-stat single folds."""
    import pyspark.sql as pysql

    from polymarket_data_ingestor_spark import cli

    monkeypatch.setattr(cli, "get_spark", lambda **kw: spark)
    delta = str(tmp_path / "delta")
    spark.createDataFrame(
        [(f"g{i % 3}", float(i), f"it{i}") for i in range(30)],
        "g string, v double, item string",
    ).write.parquet(delta)

    # Spark 4: pyspark.sql.DataFrame is the abstract base; the session
    # hands out pyspark.sql.classic.dataframe.DataFrame, whose OWN
    # persist would shadow a base-class patch
    from pyspark.sql.classic.dataframe import DataFrame as _CDF

    delta_reads = []
    persisted = []
    real_parquet = pysql.readwriter.DataFrameReader.parquet
    real_persist = _CDF.persist

    def counting_parquet(self, *paths, **kw):
        if list(paths) == [delta]:
            delta_reads.append(paths)
        return real_parquet(self, *paths, **kw)

    def recording_persist(self, *a, **kw):
        persisted.append(self)
        return real_persist(self, *a, **kw)

    monkeypatch.setattr(pysql.readwriter.DataFrameReader, "parquet",
                        counting_parquet)
    monkeypatch.setattr(_CDF, "persist", recording_persist)

    multi = str(tmp_path / "multi")
    assert cli.main(["lake", "stats", delta, "--state", multi,
                     "--stat", "summary,quantiles,topk",
                     "--keys", "g", "--value", "v",
                     "--score", "v"]) == 0
    assert len(delta_reads) == 1, delta_reads
    assert len(persisted) >= 1  # the shared delta cache
    out = capsys.readouterr().out
    for stat in ("summary", "quantiles", "topk"):
        assert f"state: {multi}/{stat}/v=1" in out, out

    # values == per-stat single folds (same delta, fresh dirs)
    import duckdb as _duck

    for stat in ("summary", "quantiles", "topk"):
        single = str(tmp_path / f"single_{stat}")
        assert cli.main(["lake", "stats", delta, "--state", single,
                         "--stat", stat, "--keys", "g", "--value", "v",
                         "--score", "v"]) == 0
        con = _duck.connect()
        a = con.execute(
            f"SELECT * FROM '{multi}/{stat}/v=1/*.parquet' ORDER BY ALL"
        ).fetchall()
        b = con.execute(
            f"SELECT * FROM '{single}/v=1/*.parquet' ORDER BY ALL"
        ).fetchall()
        assert a == b, stat

    # guards: unknown stat / duplicate stat / ambiguous --k refuse
    # pre-Spark
    assert cli.main(["lake", "stats", delta, "--state", multi,
                     "--stat", "summary,bogus", "--keys", "g",
                     "--value", "v"]) == 2
    assert cli.main(["lake", "stats", delta, "--state", multi,
                     "--stat", "summary,summary", "--keys", "g",
                     "--value", "v"]) == 2
    assert cli.main(["lake", "stats", delta, "--state", multi,
                     "--stat", "summary,quantiles", "--keys", "g",
                     "--value", "v", "--k", "8192"]) == 2
    assert "ambiguous" in capsys.readouterr().err

    # atomicity (r12 review): layout problems for ANY stat in the list
    # refuse BEFORE the first fold — a mid-loop refusal would let the
    # natural re-run double-fold the delta into the committed stats
    import pathlib as _pl

    from polymarket_data_ingestor_spark.streaming import (
        fold_labeled_state,
    )
    from polymarket_data_ingestor_spark.operators.analytics import (
        rollup_state,
    )

    atom = str(tmp_path / "atomic")
    # poison the SECOND stat's dir with a labeled layout
    fold_labeled_state(
        spark, f"{atom}/quantiles", "d1",
        rollup_state(spark.read.parquet(delta), ("g",), "v"))
    capsys.readouterr()
    assert cli.main(["lake", "stats", delta, "--state", atom,
                     "--stat", "summary,quantiles", "--keys", "g",
                     "--value", "v"]) == 2
    assert "labeled (d=<label>)" in capsys.readouterr().err
    # the FIRST stat's dir was never created — nothing committed
    assert not (_pl.Path(atom) / "summary").exists()


def test_cli_lake_stats_show_single_label(spark, tmp_path, monkeypatch,
                                          capsys):
    """r11 verdict #8 parity: stats-show --label reads EXACTLY one
    committed label (one-day inspection); missing label exits 1,
    --label+--window refuse, cumulative layout refuses --label."""
    from polymarket_data_ingestor_spark import cli
    from polymarket_data_ingestor_spark.operators.analytics import (
        rollup_state,
    )
    from polymarket_data_ingestor_spark.streaming import (
        fold_labeled_state,
    )

    monkeypatch.setattr(cli, "get_spark", lambda **kw: spark)
    state = str(tmp_path / "slstate")
    for lb, vals in [("d1", [1.0, 3.0]), ("d2", [10.0, 30.0])]:
        df = spark.createDataFrame([("a", v) for v in vals],
                                   "g string, v double")
        fold_labeled_state(spark, state, lb, rollup_state(df, ("g",), "v"))

    assert cli.main(["lake", "stats-show", state, "--stat", "summary",
                     "--keys", "g", "--label", "d1"]) == 0
    out = capsys.readouterr().out
    assert "'n': 2" in out and "'avg_v': 2.0" in out
    assert "window: 1 label(s) [d1..d1]" in out

    assert cli.main(["lake", "stats-show", state, "--stat", "summary",
                     "--keys", "g", "--label", "ghost"]) == 1
    assert "no committed label" in capsys.readouterr().err
    assert cli.main(["lake", "stats-show", state, "--stat", "summary",
                     "--keys", "g", "--label", "d1",
                     "--window", "2"]) == 2
    assert cli.main(["lake", "stats-show", state, "--stat", "summary",
                     "--keys", "g", "--label", "../x"]) == 2

    # cumulative layout refuses --label like it refuses --window
    delta = str(tmp_path / "delta")
    spark.createDataFrame([("a", 1.0)], "g string, v double") \
        .write.parquet(delta)
    cstate = str(tmp_path / "cstate")
    assert cli.main(["lake", "stats", delta, "--state", cstate,
                     "--stat", "summary", "--keys", "g",
                     "--value", "v"]) == 0
    capsys.readouterr()
    assert cli.main(["lake", "stats-show", cstate, "--stat", "summary",
                     "--keys", "g", "--label", "d1"]) == 2


def test_linreg_rollup_edges_merge_and_naive_model(spark):
    """r12 OLS monoid: empty/all-NULL inputs degrade to empty states;
    a single point (or constant x) reports NULL coefficients; a
    perfect line is EXACT (2.0/1.0/1.0 — decimal sums + fixed double
    trees); split-merge equals one-pass bit-for-bit; coefficients
    match an independent float OLS to 1e-9; mixed scales and
    non-representable values raise; multi-column keys work."""
    import pytest as _pytest

    from polymarket_data_ingestor_spark.operators.analytics import (
        finalize_linreg_rollup,
        linreg_rollup_state,
        merge_linreg_rollup,
    )

    empty = spark.createDataFrame([], "g string, x double, y double")
    assert linreg_rollup_state(empty, ("g",), "x", "y").count() == 0
    nulls = spark.createDataFrame(
        [("a", None, 1.0), ("a", 2.0, None)], "g string, x double, y double"
    )
    assert linreg_rollup_state(nulls, ("g",), "x", "y").count() == 0

    # deterministic pseudorandom data (no RNG: hash-ish arithmetic)
    rows = []
    for i in range(200):
        x = float(i % 37) + (i * 7 % 11) * 0.125
        noise = ((i * 2654435761) % 1000 - 500) / 250.0
        rows.append(("a", x, 3.5 * x - 2.0 + noise))
        if i < 50:
            rows.append(("b", float(i), 10.0 - 0.25 * i))
    rows.append(("c", 5.0, 1.0))           # single point
    rows.append(("d", 2.0, 1.0))           # constant x, two points
    rows.append(("d", 2.0, 9.0))
    # constant NON-DYADIC x (r12 second review): the double image of
    # n·Σx² − (Σx)² is ulp noise (≈1e-16), not 0 — only the exact
    # min/max witness reports the documented NULL instead of a
    # garbage slope (measured 16.0 before the fix)
    rows.extend([("e", 0.1, float(i)) for i in range(7)])
    df = spark.createDataFrame(rows, "g string, x double, y double")
    fin = {r["g"]: r.asDict()
           for r in finalize_linreg_rollup(
               linreg_rollup_state(df, ("g",), "x", "y")).collect()}

    # perfect line: exact
    assert fin["b"]["slope"] == -0.25 and fin["b"]["intercept"] == 10.0
    assert fin["b"]["r2"] == 1.0
    # degenerate keys: NULL coefficients, n_pairs kept
    assert fin["c"] == {"g": "c", "n_pairs": 1, "slope": None,
                        "intercept": None, "r2": None}
    assert fin["d"]["slope"] is None and fin["d"]["n_pairs"] == 2
    assert fin["e"] == {"g": "e", "n_pairs": 7, "slope": None,
                        "intercept": None, "r2": None}

    # independent float OLS model for the noisy key
    xs = [r[1] for r in rows if r[0] == "a"]
    ys = [r[2] for r in rows if r[0] == "a"]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    sxy = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    sxx = sum((x - mx) ** 2 for x in xs)
    syy = sum((y - my) ** 2 for y in ys)
    assert fin["a"]["slope"] == _pytest.approx(sxy / sxx, abs=1e-9)
    assert fin["a"]["intercept"] == _pytest.approx(
        my - (sxy / sxx) * mx, abs=1e-9)
    assert fin["a"]["r2"] == _pytest.approx(sxy * sxy / (sxx * syy),
                                            abs=1e-9)

    # split-merge == one-pass, bit-for-bit (decimal sums)
    one = linreg_rollup_state(df, ("g",), "x", "y")
    a1 = linreg_rollup_state(df.filter("x < 10"), ("g",), "x", "y")
    a2 = linreg_rollup_state(df.filter("x >= 10"), ("g",), "x", "y")
    merged = merge_linreg_rollup(a1, a2, keys=("g",))
    as_map = lambda st: {  # noqa: E731
        r["g"]: (r["lr_n"], r["lr_sx"], r["lr_sy"], r["lr_sxx"],
                 r["lr_syy"], r["lr_sxy"], r["lr_min_x"],
                 r["lr_max_x"], r["lr_min_y"], r["lr_max_y"])
        for r in st.collect()}
    assert as_map(merged) == as_map(one)

    # contracts
    with _pytest.raises(Exception, match="unit contract"):
        merge_linreg_rollup(
            one, linreg_rollup_state(df, ("g",), "x", "y", scale=2),
            keys=("g",),
        ).collect()
    with _pytest.raises(Exception, match="not representable"):
        linreg_rollup_state(
            spark.createDataFrame([("a", 1e14, 1.0)],
                                  "g string, x double, y double"),
            ("g",), "x", "y").collect()
    with _pytest.raises(ValueError, match="scale"):
        linreg_rollup_state(df, ("g",), "x", "y", scale=10)

    # multi-column, non-string keys
    mk = spark.createDataFrame(
        [(1, "s", float(i), 2.0 * i) for i in range(5)],
        "uid long, side string, x double, y double",
    )
    r = finalize_linreg_rollup(
        linreg_rollup_state(mk, ("uid", "side"), "x", "y")).collect()
    assert [(q["uid"], q["side"], q["slope"], q["intercept"])
            for q in r] == [(1, "s", 2.0, 0.0)]


def test_cli_lake_stats_linreg_flow(spark, tmp_path, monkeypatch,
                                    capsys):
    """--stat linreg through the CLI: fold with --x, coefficients in
    the printed report; missing --x refuses pre-Spark."""
    from polymarket_data_ingestor_spark import cli

    monkeypatch.setattr(cli, "get_spark", lambda **kw: spark)
    delta = str(tmp_path / "delta")
    spark.createDataFrame(
        [("m1", float(i), 2.0 * i + 1.0) for i in range(10)],
        "g string, x double, y double",
    ).write.parquet(delta)
    state = str(tmp_path / "lrstate")

    assert cli.main(["lake", "stats", delta, "--state", state,
                     "--stat", "linreg", "--keys", "g",
                     "--value", "y"]) == 2
    assert "--x" in capsys.readouterr().err

    assert cli.main(["lake", "stats", delta, "--state", state,
                     "--stat", "linreg", "--keys", "g",
                     "--value", "y", "--x", "x"]) == 0
    out = capsys.readouterr().out
    assert "'slope': 2.0" in out and "'intercept': 1.0" in out
    assert "'r2': 1.0" in out


def test_kmv_overlap_exact_regime_capacity_bound_and_plan(spark):
    """r12 KMV set-overlap: in the exact regime (both keys below k)
    n_common/jaccard equal the true set intersection/Jaccard computed
    naively; at CAPACITY the estimator lands within the ~1/√K rank
    error of the truth; mixed (k, seed) contracts raise; the plan
    reads the checkpointed state (zero FileScans) and broadcasts."""
    import math

    import pytest as _pytest

    from polymarket_data_ingestor_spark.operators.analytics import (
        kmv_overlap_pairs,
        sample_rollup_state,
    )

    # exact regime: known sets via a naive python model
    sets = {
        "a": {f"u{i}" for i in range(40)},
        "b": {f"u{i}" for i in range(20, 70)},
        "c": {f"v{i}" for i in range(10)},
    }
    rows = [(g, u) for g, us in sets.items() for u in us]
    df = spark.createDataFrame(rows, "g string, uid string")
    st = sample_rollup_state(df, ("g",), "uid", k=256, seed=5)
    got = {(r["g_a"], r["g_b"]): r.asDict()
           for r in kmv_overlap_pairs(st, ("g",)).collect()}
    for (ga, gb), r in got.items():
        inter = len(sets[ga] & sets[gb])
        union = len(sets[ga] | sets[gb])
        assert r["n_common"] == inter, r
        assert r["jaccard"] == inter / union, r
        assert r["n_common_est"] == _pytest.approx(inter, abs=1e-9), r
        assert r["k_used"] == union

    # capacity regime: 5000-element sets, 60% overlap, k=128 — the
    # estimate must land within 4/√K relative error of the truth
    big_a = {f"w{i}" for i in range(5000)}
    big_b = {f"w{i}" for i in range(2000, 7000)}
    rows2 = [("A", u) for u in big_a] + [("B", u) for u in big_b]
    df2 = spark.createDataFrame(rows2, "g string, uid string")
    st2 = sample_rollup_state(df2, ("g",), "uid", k=128, seed=5)
    r = kmv_overlap_pairs(st2, ("g",)).collect()[0]
    true_inter = len(big_a & big_b)
    assert r["k_used"] == 128
    tol = 4.0 / math.sqrt(128)  # ~0.35 relative
    assert abs(r["n_common_est"] - true_inter) <= tol * true_inter, r

    # mixed contract raises at execution
    st3 = sample_rollup_state(df, ("g",), "uid", k=64, seed=5)
    with _pytest.raises(Exception, match="identity contract"):
        kmv_overlap_pairs(st.unionByName(st3), ("g",)).collect()
    # ... and the guard survives ANY projection: the r12 advisor found
    # the k_used-only guard let a (keys, jaccard) select prune the
    # raise and silently mix hash families. The guard now lives inside
    # kk, which every value column builds on.
    mixed = kmv_overlap_pairs(st.unionByName(st3), ("g",))
    for col in ("jaccard", "n_common", "n_common_est"):
        with _pytest.raises(Exception, match="identity contract"):
            mixed.select("g_a", "g_b", col).collect()

    # plan: checkpointed state (no FileScan/Python), broadcast join;
    # the guard falls back to a distributed cartesian above the bound
    out = kmv_overlap_pairs(st, ("g",))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "FileScan" not in plan and "EvalPython" not in plan, plan
    assert "Broadcast" in plan, plan
    guarded = kmv_overlap_pairs(st, ("g",), broadcast_max_bytes=1)
    gp = guarded._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" in gp and "Broadcast" not in gp, gp
    assert sorted(map(lambda q: (q["g_a"], q["g_b"]), guarded.collect())) \
        == sorted(got.keys())


def test_pairwise_state_banded_matches_exact_and_plan(spark):
    """r13 (r12 verdict #2): above the broadcast budget the state-pair
    family no longer has to eat a keys² cartesian — the scaffold bands
    the maintained sketch itself. Pins: banded output IDENTICAL to the
    exact path on a planted corpus (both operators, threshold > 0);
    banded plans contain NO cartesian and NO BroadcastNestedLoopJoin;
    banded without a positive threshold refuses; the auto path picks
    banding above budget, and the threshold-0 above-budget fallback
    warns loudly."""
    import warnings as _warnings

    import pytest as _pytest

    from polymarket_data_ingestor_spark.operators.analytics import (
        kmv_overlap_pairs,
        minhash_rollup_state,
        minhash_similarity_pairs,
        sample_rollup_state,
    )

    # planted corpus: overlapping item sets across 6 keys, plus one
    # isolated key that must appear in NO thresholded pair
    rows = []
    for g in range(6):
        rows += [(f"g{g}", f"i{j}") for j in range(g * 10, g * 10 + 40)]
    rows += [("lone", f"z{j}") for j in range(30)]
    df = spark.createDataFrame(rows, "g string, item string")

    def _pin(make):
        exact = make(banded=False)
        band = make(banded=True)
        ex = sorted(map(tuple, exact.collect()))
        bd = sorted(map(tuple, band.collect()))
        assert ex == bd and ex, (ex[:3], bd[:3])
        plan = band._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastNestedLoop" not in plan, plan
        assert not any("lone" in str(r) for r in ex)

    mh = minhash_rollup_state(df, ("g",), "item", n_hashes=16, seed=3)
    _pin(lambda banded: minhash_similarity_pairs(
        mh, ("g",), min_similarity=0.05, banded=banded))
    sm = sample_rollup_state(df, ("g",), "item", k=64, seed=3)
    _pin(lambda banded: kmv_overlap_pairs(
        sm, ("g",), min_jaccard=0.05, banded=banded))

    # banded without a positive threshold would silently lose score-0
    # pairs from the output — refuse
    with _pytest.raises(ValueError, match="positive"):
        minhash_similarity_pairs(mh, ("g",), banded=True)
    with _pytest.raises(ValueError, match="positive"):
        kmv_overlap_pairs(sm, ("g",), banded=True)

    # auto: above budget + positive threshold -> banded (no cartesian)
    auto = minhash_similarity_pairs(
        mh, ("g",), min_similarity=0.05, broadcast_max_bytes=1)
    ap = auto._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in ap and "BroadcastNestedLoop" \
        not in ap, ap
    # above budget + threshold 0 -> cartesian, loudly warned
    with _warnings.catch_warnings(record=True) as w:
        _warnings.simplefilter("always")
        fb = minhash_similarity_pairs(
            mh, ("g",), broadcast_max_bytes=1)
        assert any("DISTRIBUTED CARTESIAN" in str(x.message) for x in w)
    fp = fb._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" in fp, fp


def test_corr_rollup_edges_merge_and_naive_model(spark):
    """r12 correlation monoid: perfect linear pair → corr exactly 1.0;
    noisy pair matches an independent float Pearson to 1e-9; single
    row → NULL covar+corr; constant NON-DYADIC column → NULL corr via
    the exact witnesses (the linreg lesson applied at birth);
    split-merge equals one-pass bit-for-bit including schema order;
    mixed contracts and mismatched finalize cols raise; listwise
    completeness drops a row missing ANY feature."""
    import math

    import pytest as _pytest

    from polymarket_data_ingestor_spark.operators.analytics import (
        corr_rollup_state,
        finalize_corr_rollup,
        merge_corr_rollup,
    )

    rows = []
    for i in range(50):
        rows.append(("g1", float(i), 2.0 * i + 3.0, float((i * 37) % 11)))
    rows.append(("g2", 1.0, 2.0, 3.0))                       # single row
    rows += [("g3", 0.1, float(i), 5.0) for i in range(4)]   # const a, c
    rows.append(("g1", None, 1.0, 1.0))                      # listwise
    df = spark.createDataFrame(rows, "g string, a double, b double, c double")
    cols = ("a", "b", "c")
    st = corr_rollup_state(df, ("g",), cols)
    out = {(r["g"], r["col_a"], r["col_b"]): r.asDict()
           for r in finalize_corr_rollup(st, cols).collect()}
    assert len(out) == 9  # 3 keys x 3 pairs

    assert out[("g1", "a", "b")]["corr"] == 1.0
    assert out[("g1", "a", "b")]["n_rows"] == 50  # NULL-a row dropped

    xs = [r[1] for r in rows if r[0] == "g1" and r[1] is not None]
    cs = [r[3] for r in rows if r[0] == "g1" and r[1] is not None]
    n = len(xs)
    mx, mc = sum(xs) / n, sum(cs) / n
    num = sum((x - mx) * (y - mc) for x, y in zip(xs, cs))
    den = math.sqrt(sum((x - mx) ** 2 for x in xs)
                    * sum((y - mc) ** 2 for y in cs))
    assert out[("g1", "a", "c")]["corr"] == _pytest.approx(
        num / den, abs=1e-9)
    assert out[("g1", "a", "c")]["covar"] == _pytest.approx(
        num / (n - 1), abs=1e-9)

    g2 = out[("g2", "a", "b")]
    assert g2["covar"] is None and g2["corr"] is None and g2["n_rows"] == 1
    g3 = out[("g3", "a", "b")]
    assert g3["corr"] is None and g3["covar"] is not None

    one = corr_rollup_state(df, ("g",), cols)
    m1 = corr_rollup_state(df.filter("a < 20"), ("g",), cols)
    m2 = corr_rollup_state(df.filter("a >= 20 or a is null"),
                           ("g",), cols)
    merged = merge_corr_rollup(m1, m2, keys=("g",))
    assert merged.columns == one.columns  # schema-order contract
    snap = lambda s: sorted(tuple(r) for r in s.collect())  # noqa: E731
    assert snap(merged) == snap(one)

    with _pytest.raises(Exception, match="cr_cols contract"):
        finalize_corr_rollup(st, ("a", "b")).collect()
    with _pytest.raises(Exception, match="rebuild one side"):
        merge_corr_rollup(
            st, corr_rollup_state(df, ("g",), cols, scale=4),
            keys=("g",),
        ).collect()
    with _pytest.raises(Exception, match="not representable"):
        corr_rollup_state(
            spark.createDataFrame([("a", 1e14, 1.0, 1.0)],
                                  "g string, a double, b double, c double"),
            ("g",), cols).collect()
    with _pytest.raises(ValueError, match="at least 2"):
        corr_rollup_state(df, ("g",), ("a",))
    with _pytest.raises(ValueError, match="duplicate"):
        corr_rollup_state(df, ("g",), ("a", "a"))


def test_cli_lake_stats_corr_flow(spark, tmp_path, monkeypatch, capsys):
    """--stat corr through the CLI: --value is the feature-column
    comma list; cumulative fold + stats-show (with --value) report the
    pairwise matrix; corr refuses to combine with other stats, <2
    columns refuse, stats-show without --value refuses."""
    from polymarket_data_ingestor_spark import cli

    monkeypatch.setattr(cli, "get_spark", lambda **kw: spark)
    delta = str(tmp_path / "delta")
    spark.createDataFrame(
        [("s", float(i), 2.0 * i + 1.0, float((i * 7) % 5))
         for i in range(20)],
        "g string, a double, b double, c double",
    ).write.parquet(delta)
    state = str(tmp_path / "crstate")

    base = ["lake", "stats", delta, "--keys", "g"]
    # guards, all pre-fold
    assert cli.main(base + ["--state", state, "--stat", "corr",
                            "--value", "a"]) == 2
    assert "at least two" in capsys.readouterr().err
    assert cli.main(base + ["--state", state, "--stat", "summary,corr",
                            "--value", "a,b"]) == 2
    assert "corr:<col_a+col_b" in capsys.readouterr().err
    # :<cols> suffix is corr-only; corr:<one col> refuses; --k on a
    # stat with no sketch refuses (r12 advisor)
    assert cli.main(base + ["--state", state, "--stat", "summary:a",
                            "--value", "a"]) == 2
    assert "only corr takes" in capsys.readouterr().err
    assert cli.main(base + ["--state", state, "--stat", "corr:a",
                            "--value", "b"]) == 2
    assert "at least two" in capsys.readouterr().err
    assert cli.main(base + ["--state", state, "--stat", "corr",
                            "--value", "a,b", "--k", "64"]) == 2
    assert "takes no --k" in capsys.readouterr().err
    assert cli.main(base + ["--state", state, "--stat", "summary"]) == 2
    assert "--value is required" in capsys.readouterr().err

    assert cli.main(base + ["--state", state, "--stat", "corr",
                            "--value", "a,b,c"]) == 0
    out = capsys.readouterr().out
    assert "'col_a': 'a', 'col_b': 'b'" in out and "'corr': 1.0" in out
    assert f"state: {state}/v=1" in out

    # read-only path: --value names the finalize columns
    assert cli.main(["lake", "stats-show", state, "--stat", "corr",
                     "--keys", "g"]) == 2
    assert "--value" in capsys.readouterr().err
    assert cli.main(["lake", "stats-show", state, "--stat", "corr",
                     "--keys", "g", "--value", "a,b,c"]) == 0
    out = capsys.readouterr().out
    assert "'corr': 1.0" in out and "cumulative v=1" in out
    # mismatched cols hit the state's cr_cols contract at execution
    import pytest as _pytest

    with _pytest.raises(Exception, match="cr_cols contract"):
        cli.main(["lake", "stats-show", state, "--stat", "corr",
                  "--keys", "g", "--value", "b,a"])


def test_cli_lake_stats_corr_multistat(spark, tmp_path, monkeypatch,
                                       capsys):
    """r12 verdict #5: corr joins a multi-stat fold as
    corr:<col_a+col_b[+...]> — the suffix carries its feature columns,
    --value stays the other stats' single column, and both states
    land under <state>/<stat> off the one cached delta. The suffixed
    form alone also works with NO --value at all, and its output
    matches the bare-corr fold of the same delta."""
    from polymarket_data_ingestor_spark import cli

    monkeypatch.setattr(cli, "get_spark", lambda **kw: spark)
    delta = str(tmp_path / "delta")
    spark.createDataFrame(
        [("s", float(i), 2.0 * i + 1.0, float((i * 7) % 5))
         for i in range(20)],
        "g string, a double, b double, c double",
    ).write.parquet(delta)

    # multi-stat: summary over --value, corr over the suffix cols
    state = str(tmp_path / "multi")
    assert cli.main(["lake", "stats", delta, "--keys", "g",
                     "--state", state, "--stat", "summary,corr:a+b+c",
                     "--value", "a"]) == 0
    out = capsys.readouterr().out
    assert "'col_a': 'a', 'col_b': 'b'" in out and "'corr': 1.0" in out
    assert f"state: {state}/summary/v=1" in out
    assert f"state: {state}/corr/v=1" in out

    # suffixed corr alone: no --value needed; matches the bare form
    s2 = str(tmp_path / "suffixonly")
    assert cli.main(["lake", "stats", delta, "--keys", "g",
                     "--state", s2, "--stat", "corr:a+b+c"]) == 0
    out2 = capsys.readouterr().out
    s3 = str(tmp_path / "bare")
    assert cli.main(["lake", "stats", delta, "--keys", "g",
                     "--state", s3, "--stat", "corr",
                     "--value", "a,b,c"]) == 0
    out3 = capsys.readouterr().out
    lines2 = sorted(ln for ln in out2.splitlines() if "'corr'" in ln)
    lines3 = sorted(ln for ln in out3.splitlines() if "'corr'" in ln)
    assert lines2 == lines3 and lines2


def test_integral_keys_survive_arrow_null_upcast_exactly(spark):
    """A NULL-bearing bigint key batch is float64-upcast across Arrow
    (numpy has no nullable int): without the scaffold's Int64
    restoration, key values above 2^53 silently MERGE distinct keys
    and round on the way back (review finding — the hazard the
    heavy-hitters ITEM cast documents, for KEYS). Within 2^53 the
    restoration is exact incl. the NULL key; beyond it the kernel
    refuses loudly."""
    import pytest

    big_a = (1 << 53) - 2   # distinct, adjacent, float-representable
    big_b = (1 << 53) - 1
    df = spark.createDataFrame(
        [(big_a, 1.0), (big_b, 2.0), (None, 3.0), (big_a, 4.0)],
        "k bigint, v double",
    ).coalesce(1)  # one batch -> the NULL forces the float upcast
    st = quantile_rollup_state(df, ("k",), "v", k=16)
    got = {r["k"]: r for r in st.collect()}
    assert set(got) == {big_a, big_b, None}
    # per-key level-0 buffers carry the right values — two distinct
    # keys, not one float-merged key
    assert sorted(got[big_a]["q_levels"][0]) == [1.0, 4.0]
    assert got[big_b]["q_levels"][0] == [2.0]
    assert got[None]["q_levels"][0] == [3.0]

    over = spark.createDataFrame(
        [((1 << 53) + 1, 1.0), (None, 2.0)], "k bigint, v double"
    ).coalesce(1)
    with pytest.raises(Exception, match="2\\^53|beyond"):
        quantile_rollup_state(over, ("k",), "v", k=16).collect()
