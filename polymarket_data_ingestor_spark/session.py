"""SparkSession factory with scale-oriented defaults.

The reference engine is a single-threaded Rust pipeline; our engine targets a
multi-executor cluster, so session defaults matter: AQE for runtime re-planning
(skew joins, partition coalescing), Arrow for the one pandas-UDF boundary, and
shuffle-partition counts sized to the deployment rather than Spark's 200
default.
"""

from __future__ import annotations

import os
from pathlib import Path

from pyspark.sql import SparkSession

# Make the package importable in executor Python workers regardless of where
# the driver script lives (workers inherit PYTHONPATH, not driver sys.path).
_PKG_ROOT = str(Path(__file__).resolve().parents[1])
if _PKG_ROOT not in os.environ.get("PYTHONPATH", "").split(os.pathsep):
    os.environ["PYTHONPATH"] = (
        _PKG_ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")
    ).rstrip(os.pathsep)

# On a real cluster these come from spark-submit / cluster conf; the env vars
# below let the bench driver pin core counts without code changes.
_DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "polymarket-data-ingestor-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's tuned defaults.

    Defaults are chosen for correctness-at-scale:

    * ``spark.sql.adaptive.enabled`` — AQE re-plans at runtime: coalesces
      post-shuffle partitions, converts sort-merge to broadcast joins when a
      side turns out small, and splits skewed partitions (the Spark analogue
      of the reference's hot-shard connection splitting,
      ``collector/src/client/reconnecter.rs:280-350``).
    * Arrow execution for the grouped-map replay kernel (SURVEY §2.10 O1).
      Batch size 131072: a local sweep (10k/32k/64k/128k/256k rows on the
      sf0.1 replay fixture) shows the Python-worker hop cost is dominated
      by per-batch overhead — 128k-row batches run the replay kernel ~1.8×
      faster than the 10k the reference buffers at
      (``cli/src/tick_generator.rs:69``), and every Arrow-stage catalog
      query improves too. 128k rows of the widest bench schema
      (embeddings: 64 float32 + id ≈ 0.5 KB/row) is ~70 MB per in-flight
      batch per task — inside a 4 GiB-executor budget at 100 TB; gains
      past 128k are <15% and double that footprint, so this is the knee.
    * ``parquet.compression=snappy`` to match the reference tick sink
      (``cli/src/tick_generator.rs:60-63``).
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", _DEFAULT_CPUS))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # local mode: one shuffle partition per core is the sweet spot; on a
        # cluster this should be ~2-3x total executor cores (set via conf).
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "131072")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.sql.session.timeZone", "UTC")
        # files.maxPartitionBytes default 128m is right for the 100 TB
        # target; do not shrink it for the local test scale.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
