"""cProfile a single registered query end-to-end (build + noop exec).

Decomposes the bench-timed region into driver-side Python work
(txlog JSON parsing, pyarrow footer reads, bloom builds) vs JVM wait
(py4j socket reads = Spark job time). Usage:

    python docs/cprofile_query.py <query> [sort_key]
"""

from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stonkwhisperer_spark.plans.registry import query_map  # noqa: E402
from stonkwhisperer_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="stonkwhisperer-cprofile", cpus=cpus)
    qmap = query_map()
    name = sys.argv[1]
    sort = sys.argv[2] if len(sys.argv) > 2 else "cumulative"
    fn = qmap[name]

    # Warm like bench.py (tables + python worker + streaming machinery).
    from stonkwhisperer_spark.sources.tables import load_tables

    for df in load_tables(spark, sf_dir).values():
        df.count()
    spark.range(32).toPandas()
    spark.range(32, numPartitions=4).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()
    import tempfile

    with tempfile.TemporaryDirectory(prefix="cprof_warm_") as tmp:
        spark.range(4).write.parquet(f"{tmp}/in")
        wq = (
            spark.readStream.schema("id long")
            .parquet(f"{tmp}/in")
            .groupBy("id")
            .count()
            .writeStream.format("memory")
            .queryName("cprof_warmup_stream")
            .outputMode("complete")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        wq.awaitTermination(60)
        wq.stop()

    # One unprofiled run first (codegen/JIT), then the profiled run —
    # matches bench.py's min-of-two steady-state convention.
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    first = time.perf_counter() - t0
    spark.catalog.clearCache()

    pr = cProfile.Profile()
    t0 = time.perf_counter()
    pr.enable()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    pr.disable()
    steady = time.perf_counter() - t0

    buf = io.StringIO()
    st = pstats.Stats(pr, stream=buf)
    st.sort_stats(sort).print_stats(45)
    print(f"=== {name}: first {first:.2f}s, profiled-steady {steady:.2f}s ===")
    print(buf.getvalue())
    spark.stop()


if __name__ == "__main__":
    main()
