"""Dump .explain("formatted") for catalog queries + bench-only paths.

Usage: python tools/explain_dump.py <out_dir> <suffix> [name ...]

Writes <out_dir>/<name>_<suffix>.txt for each requested query (default:
every BENCH_QUERIES entry plus the replay-family bench paths). Driver-only
work — no job runs, so plans are capturable without perturbing timings.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parents[1])
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from polymarket_data_ingestor_spark.plans.catalog import CATALOG  # noqa: E402
from polymarket_data_ingestor_spark.session import get_spark  # noqa: E402


def _explain_str(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> int:
    out_dir = Path(sys.argv[1])
    suffix = sys.argv[2]
    names = sys.argv[3:]
    out_dir.mkdir(parents=True, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="explain-dump")

    if not names:
        import bench

        names = list(bench.BENCH_QUERIES) + [
            "replay_e2e",
            "replay_e2e_split",
            "tick_lake_write",
        ]

    from bench import _ensure_replay_fixture

    for name in names:
        try:
            if name == "replay_e2e":
                from polymarket_data_ingestor_spark.operators.replay import replay

                paths = _ensure_replay_fixture(sf_dir, Path("/tmp/pdi_bench"))
                df = replay(spark, paths)
            elif name == "replay_e2e_split":
                from polymarket_data_ingestor_spark.operators.replay import replay

                paths = _ensure_replay_fixture(sf_dir, Path("/tmp/pdi_bench"))
                df = replay(spark, paths, split_at_snapshots=True)
            elif name == "replay_e2e_skewed":
                from bench import _ensure_skewed_fixture
                from polymarket_data_ingestor_spark.operators.replay import replay

                skew = _ensure_skewed_fixture(sf_dir, Path("/tmp/pdi_bench"))
                df = replay(spark, skew)  # default path (r15: auto gate)
            elif name == "tick_lake_write":
                from polymarket_data_ingestor_spark.operators.replay import replay

                paths = _ensure_replay_fixture(sf_dir, Path("/tmp/pdi_bench"))
                ticks = replay(spark, paths, ticks_only=False)
                from pyspark.sql import functions as F

                df = ticks.repartition(F.col("file_hour"))
            else:
                df = CATALOG[name].spark(spark, sf_dir)
            txt = _explain_str(df)
        except Exception as e:  # noqa: BLE001
            txt = f"EXPLAIN FAILED: {type(e).__name__}: {e}"
        (out_dir / f"{name}_{suffix}.txt").write_text(txt + "\n")
        print(f"wrote {name}_{suffix}.txt")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
