"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship star-schema rollup on sf0.001;
``queries()``/``oracle_sql()`` expose the full operator catalog
(polymarket_data_ingestor_spark.plans.catalog) — every entry is paired with
an ANSI-SQL DuckDB oracle unless genuinely non-SQL-expressible.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from polymarket_data_ingestor_spark.plans.catalog import CATALOG  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return CATALOG["region_revenue"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.spark for name, q in CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query (where expressible)."""
    return {name: q.sql for name, q in CATALOG.items() if q.sql is not None}
