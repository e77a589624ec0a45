"""Per-entry phase profiler: split a catalog query's wall time into
DataFrame construction (Python + analysis), physical planning, first
execution (codegen + run), and steady-state re-execution.

At the local bench scale most tables are tiny, so a slow entry is as
likely to be paying driver-side costs (huge expression trees, codegen)
as executor work — this tool tells which, per guide §1 (measure first)
and §7.3 (driver-side work shows up as "nothing running").

Usage: python tools/profile_entry.py <name> [name ...]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parents[1])
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from polymarket_data_ingestor_spark.plans.catalog import CATALOG  # noqa: E402
from polymarket_data_ingestor_spark.session import get_spark  # noqa: E402


def profile(spark, name: str, sf_dir: str) -> dict[str, float]:
    q = CATALOG[name]
    t0 = time.perf_counter()
    df = q.spark(spark, sf_dir)
    t_build = time.perf_counter() - t0

    t0 = time.perf_counter()
    df._jdf.queryExecution().executedPlan()
    t_plan = time.perf_counter() - t0

    def run():
        df.write.format("noop").mode("overwrite").save()

    t0 = time.perf_counter()
    run()
    t_exec1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    run()
    t_exec2 = time.perf_counter() - t0

    # A fresh DataFrame each time, like the bench lambda does.
    t0 = time.perf_counter()
    q.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
    t_fresh = time.perf_counter() - t0
    return {
        "build": round(t_build, 3),
        "plan": round(t_plan, 3),
        "exec1": round(t_exec1, 3),
        "exec2": round(t_exec2, 3),
        "fresh_total": round(t_fresh, 3),
    }


def main() -> int:
    names = sys.argv[1:]
    if not names:
        print("usage: profile_entry.py <name> [name ...]")
        return 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="profile-entry")
    spark.range(1000).count()
    print(f"{'entry':34s} {'build':>7} {'plan':>7} {'exec1':>7} "
          f"{'exec2':>7} {'fresh':>7}")
    for name in names:
        r = profile(spark, name, sf_dir)
        print(f"{name:34s} {r['build']:7.3f} {r['plan']:7.3f} "
              f"{r['exec1']:7.3f} {r['exec2']:7.3f} "
              f"{r['fresh_total']:7.3f}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
