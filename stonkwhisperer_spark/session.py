"""SparkSession factory.

Scale posture (SURVEY.md §7.2 M6): AQE on (runtime coalesce + skew-join),
shuffle partitions sized to cores for local mode (a cluster deployment
would size to 2-3x total executor cores), Arrow enabled for the few
Pandas-UDF paths, UTC session timezone so timestamp semantics match the
reference (TIMESTAMPTZ, UTC everywhere — reference
data_pipeline/tasks/transformation.py:59-60).

ANSI note: queries in plans/ are written to be ANSI-safe (try_cast where
input may be malformed) so they behave identically whether the hosting
session has ANSI on (Spark 4 default) or off.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "stonkwhisperer-spark",
    cpus: str | int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS") or "*"
    n_shuffle = shuffle_partitions or int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", "32"))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        # Console progress bars write \r-refreshed stage lines to stdout,
        # which can push bench.py's single JSON result line past a
        # log-tail capture window — keep stdout clean in all harness runs.
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
