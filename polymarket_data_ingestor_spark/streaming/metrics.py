"""Throughput telemetry (SURVEY §2.4 A1/A2) as Spark-native observability.

The reference samples msgs/sec + bytes/sec every ~15 s with hand-rolled
counters (``collector/src/main.rs:275-290``) and tracks open-connection
counts (``collector/src/client/mod.rs:144-191``). The Spark-native
equivalents:

* batch / micro-batch: ``df.observe(Observation | name, exprs...)`` —
  metrics ride the job, no second pass (the ``throughput_15s`` catalog
  query is the historical/windowed version);
* streaming: a ``StreamingQueryListener`` reading each progress event's
  ``numInputRows`` / ``batchDuration`` — the direct analogue of the
  reference's periodic sampler.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener


def with_throughput_observation(df: DataFrame, name: str = "throughput"):
    """Attach msgs/bytes counters to a batch job (A1, one-pass).

    Returns ``(df, observation)``; read ``observation.get`` after an action
    completes: ``{"n_msgs": ..., "n_bytes": ...}``.
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_msgs"),
        F.sum(F.length(F.col("content")).cast("bigint")).alias("n_bytes"),
    )
    return observed, obs


class ThroughputListener(StreamingQueryListener):
    """Streaming msgs/sec sampler (A1/A2 analogue).

    Collects one record per progress event: rows, batch duration, and
    derived rows/sec. Attach with ``spark.streams.addListener``; read
    ``listener.samples``.
    """

    def __init__(self) -> None:
        self.samples: list[dict] = []
        self.active_queries: set[str] = set()

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        self.active_queries.add(event.id)

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        duration_ms = (p.durationMs or {}).get("triggerExecution", 0)
        self.samples.append(
            {
                "query_id": str(p.id),
                "batch_id": p.batchId,
                "num_input_rows": p.numInputRows,
                "duration_ms": duration_ms,
                "rows_per_sec": (
                    p.numInputRows / (duration_ms / 1000.0)
                    if duration_ms
                    else None
                ),
            }
        )

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        self.active_queries.discard(event.id)

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass
