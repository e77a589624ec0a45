"""Bucketed co-located join: the repeated-join scale pattern (SURVEY §4).

When the same huge⋈huge join runs repeatedly (e.g. lineitem⋈orders every
hour), bucketing both sides on the join key at write time removes the
per-query shuffle entirely: Spark reads co-located buckets and sort-merge
joins them with zero Exchange. This test materializes bucketed copies of
the test tables and asserts the plan property.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    # warehouse.dir is a static conf; external-table paths sidestep it
    wh = tmp_path_factory.mktemp("warehouse")
    for name, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
        df = spark.read.parquet(f"{SF}/{name}.parquet")
        (
            df.write.mode("overwrite")
            .bucketBy(8, key)
            .sortBy(key)
            .option("path", str(wh / f"b_{name}"))
            .saveAsTable(f"b_{name}")
        )
    yield spark
    for t in ("b_lineitem", "b_orders"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_has_no_shuffle(bucketed):
    spark = bucketed
    li = spark.table("b_lineitem")
    o = spark.table("b_orders")
    # disable broadcast so the join strategy is the bucketed SMJ, as it
    # would be when both sides are huge
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(o, li.l_orderkey == o.o_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.count(F.lit(1)).alias("n"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # the join itself reads co-located buckets: the only exchange in
        # the plan is the one feeding the final groupBy aggregation
        assert plan.count("Exchange hashpartitioning") == 1
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        # and the result matches the plain-parquet join
        got = {r.o_orderpriority: r.n for r in joined.collect()}
        plain = (
            spark.read.parquet(f"{SF}/lineitem.parquet")
            .join(
                spark.read.parquet(f"{SF}/orders.parquet"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        want = {r.o_orderpriority: r.n for r in plain.collect()}
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
