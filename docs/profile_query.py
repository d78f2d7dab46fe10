"""Per-query wall-time decomposition for the optimization round.

For each named query (or the N slowest from bench_full.json), splits the
bench-timed region into:

  * build_s  — fn(spark, sf_dir): driver-side plan construction, INCLUDING
               any side-effecting gate machinery (txlog commits, stream
               drains) the query runs before returning its DataFrame;
  * plan_s   — analysis + optimization of the returned plan (explain);
  * exec_s   — the noop write of the returned plan (steady state: the
               min of two runs, matching bench.py methodology);
  * jobs     — Spark job count observed during build+exec (statusTracker
               delta), the "how many actions is this query paying for"
               signal the guide's §1 empirical loop starts from.

Usage: python docs/profile_query.py <query> [<query> ...]
       python docs/profile_query.py --top N
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stonkwhisperer_spark.plans.registry import query_map  # noqa: E402
from stonkwhisperer_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="stonkwhisperer-profile", cpus=cpus)
    qmap = query_map()

    args = sys.argv[1:]
    if args and args[0] == "--top":
        n = int(args[1])
        full = json.load(open(os.path.join(os.path.dirname(__file__), "..", "bench_full.json")))
        names = [k for k, _ in sorted(full["queries"].items(), key=lambda kv: -kv[1])[:n]]
    else:
        names = args

    # Warm exactly like bench.py so the first profiled query doesn't
    # absorb session startup.
    from stonkwhisperer_spark.sources.tables import load_tables

    for df in load_tables(spark, sf_dir).values():
        df.count()
    spark.range(32).toPandas()
    spark.range(32, numPartitions=4).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()
    from stonkwhisperer_spark.sources.datasource import LandingApiDataSource

    try:
        spark.dataSource.register(LandingApiDataSource)
    except Exception:  # noqa: BLE001
        pass
    spark.read.format("stonkw_api").option("kind", "news").option("limit", 8).load().write.format(
        "noop"
    ).mode("overwrite").save()
    import tempfile

    with tempfile.TemporaryDirectory(prefix="prof_warm_") as tmp:
        spark.range(4).write.parquet(f"{tmp}/in")
        wq = (
            spark.readStream.schema("id long")
            .parquet(f"{tmp}/in")
            .groupBy("id")
            .count()
            .writeStream.format("memory")
            .queryName("prof_warmup_stream")
            .outputMode("complete")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        wq.awaitTermination(60)
        wq.stop()

    st = spark.sparkContext.statusTracker()
    out = {}
    for name in names:
        fn = qmap[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        rec = {}
        for attempt in range(2):
            jobs0 = len(st.getJobIdsForGroup() or [])
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
            t2 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t3 = time.perf_counter()
            jobs1 = len(st.getJobIdsForGroup() or [])
            cur = {
                "build_s": round(t1 - t0, 3),
                "plan_s": round(t2 - t1, 3),
                "exec_s": round(t3 - t2, 3),
                "total_s": round(t3 - t0, 3),
                "jobs": jobs1 - jobs0,
            }
            if not rec or cur["total_s"] < rec["total_s"]:
                rec = cur
            spark.catalog.clearCache()
            gc.collect()
        out[name] = rec
        print(f"{name:36s} build {rec['build_s']:7.3f}  plan {rec['plan_s']:6.3f}  "
              f"exec {rec['exec_s']:7.3f}  total {rec['total_s']:7.3f}  jobs {rec['jobs']}",
              flush=True)
    with open("/tmp/profile_out.json", "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    spark.stop()


if __name__ == "__main__":
    main()
