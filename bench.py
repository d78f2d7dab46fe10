#!/usr/bin/env python
"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed to full materialization (count of a cached-free plan)
— the same work the driver's correctness harness does, minus the collect.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from stonkwhisperer_spark.plans.registry import query_map  # noqa: E402
from stonkwhisperer_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="stonkwhisperer-bench", cpus=cpus)

    qmap = query_map()
    # Warm the JVM and every table's parquet footers/IO once so per-query
    # times measure the plan, not session startup or first-touch reads.
    from stonkwhisperer_spark.sources.tables import load_tables

    for df in load_tables(spark, sf_dir).values():
        df.count()

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name, fn in sorted(qmap.items()):
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 4)
        except Exception as e:  # noqa: BLE001 — one bad query must not sink the run
            errors[name] = f"{type(e).__name__}: {e}"[:200]

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "total_query_wall_sec",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "", 1).isdigit() else sf,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
