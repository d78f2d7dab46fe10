"""What does ONE tiny staging write actually cost? (optimization r16,
VERDICT r15 item 1c: profile the driver-side action floor under the
merge engine's ~12 AQE stage-jobs per staging write.)

Times, min-of-N on an idle box, for a ~37k-row 4-col frame already
materialized to JVM blocks (localCheckpoint — the merge engine's batch
shape):

  * plain parquet write (no rebalance, AQE on)
  * REBALANCE-hinted write (the _stage_files shape)
  * REBALANCE write with AQE coalescing disabled for the action
  * noop write (no file commit protocol at all)
  * empty-plan floor: spark.range(1) noop write

Usage: python docs/staging_write_bench.py [n_rounds]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from stonkwhisperer_spark.session import get_spark, scratch_dir  # noqa: E402


def main() -> None:
    n_rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="staging-write-bench")

    from stonkwhisperer_spark.plans.queries_text import bm25_tf_index
    from stonkwhisperer_spark.sources.tables import load_tables

    for df in load_tables(spark, sf_dir).values():
        df.count()
    spark.range(32).toPandas()

    tf = bm25_tf_index(spark, sf_dir).localCheckpoint(eager=True)
    print(f"rows={tf.count()}")
    st = spark.sparkContext.statusTracker()

    def timed(label, fn):
        best, jobs = 1e9, 0
        for _ in range(n_rounds):
            j0 = len(st.getJobIdsForGroup() or [])
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            j1 = len(st.getJobIdsForGroup() or [])
            if dt < best:
                best, jobs = dt, j1 - j0
        print(f"{label:44s} {best:7.3f}s  jobs={jobs}", flush=True)

    scratch = scratch_dir("staging_write_")
    i = [0]

    def out():
        i[0] += 1
        return f"{scratch}/o{i[0]}"

    try:
        timed("range(1) noop (action floor)", lambda: spark.range(1)
              .write.format("noop").mode("overwrite").save())
        timed("tf noop (plan floor)", lambda: tf
              .write.format("noop").mode("overwrite").save())
        timed("tf plain parquet write", lambda: tf
              .write.mode("overwrite").parquet(out()))
        timed("tf rebalance parquet write", lambda: tf.hint("rebalance")
              .write.mode("overwrite").parquet(out()))
        timed("tf coalesce(1) parquet write", lambda: tf.coalesce(1)
              .write.mode("overwrite").parquet(out()))

        def no_aqe_write():
            spark.conf.set("spark.sql.adaptive.enabled", "false")
            try:
                tf.coalesce(1).write.mode("overwrite").parquet(out())
            finally:
                spark.conf.set("spark.sql.adaptive.enabled", "true")

        timed("tf coalesce(1) write, AQE off", no_aqe_write)

        # The upsert staging plan shape: checkpointed batch joined with
        # a marker slice then unioned, rebalanced, written.
        marks = tf.select("doc_id", "tok").dropDuplicates(["doc_id", "tok"]).withColumn(
            "_m", F.lit(True)
        )
        j = tf.join(marks, ["doc_id", "tok"], "left")
        timed("tf ⋈ marks rebalance write", lambda: j.drop("_m")
              .hint("rebalance").write.mode("overwrite").parquet(out()))
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
