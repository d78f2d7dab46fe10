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
    # Warm the Python worker daemon too: the first Arrow-batched Python
    # stage (Python Data Source, mapInPandas) pays ~8s of fork/import
    # cost that would otherwise land on whichever query runs it first.
    spark.range(32).toPandas()
    spark.range(32, numPartitions=4).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()
    # The Python Data Source path (plan + read workers) warms separately
    # from mapInPandas — api_ingest_e2e otherwise absorbs ~4s of it.
    from stonkwhisperer_spark.sources.datasource import LandingApiDataSource

    try:
        spark.dataSource.register(LandingApiDataSource)
    except Exception:  # noqa: BLE001 — already registered
        pass
    spark.read.format("stonkw_api").option("kind", "news").option(
        "limit", 8
    ).load().write.format("noop").mode("overwrite").save()
    # ...and the streaming machinery (state-store provider + microbatch
    # planner init lands on the first streaming query otherwise).
    import tempfile

    with tempfile.TemporaryDirectory(prefix="bench_warm_") as tmp:
        spark.range(4).write.parquet(f"{tmp}/in")
        wq = (
            spark.readStream.schema("id long")
            .parquet(f"{tmp}/in")
            .groupBy("id")
            .count()
            .writeStream.format("memory")
            .queryName("bench_warmup_stream")
            .outputMode("complete")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        wq.awaitTermination(60)
        wq.stop()

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
