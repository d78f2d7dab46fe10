"""Loaders for the driver-provided parquet tables (TESTDATA.md).

Parquet is the columnar path: Catalyst pushes filters and prunes columns
at the scan (verify with .explain → PushedFilters / ReadSchema). At 100 TB
these reads become partitioned-directory scans; nothing here assumes a
single file.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stonkwhisperer_spark.schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _pin_session_confs(spark: SparkSession) -> None:
    # Runtime-settable confs the engine's timestamp semantics require,
    # pinned here so they hold in any hosting session (driver's included):
    # * UTC session tz — reference uses TIMESTAMPTZ-UTC end-to-end
    #   (transformation.py:59-60) and the DuckDB oracle is naive-UTC.
    # * nanosAsLong — events.parquet carries TIMESTAMP(NANOS) which
    #   Spark 4 otherwise refuses; we downcast ns→µs ourselves.
    # NOTE: these mutate the hosting session globally (any later parquet
    # read in the same session sees nanosAsLong). Guarded so we set them
    # once and never fight a session that already has the right values.
    if spark.conf.get("spark.sql.session.timeZone", "") != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _pin_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # ns-since-epoch → µs → naive-UTC timestamp (matches DuckDB's
        # own ns→µs truncation). `div` keeps the math in exact int64.
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}


def spread(df: DataFrame, *cols: str, min_partitions: int | None = None) -> DataFrame:
    """Hash-repartition the input before expression-heavy per-row work
    (regex chains, higher-order array functions — which execute
    interpreted, not codegen'd, and so dominate wall time).

    Why unconditional: the scan's *split count* is a lie for small
    inputs — Spark cuts a single parquet file into defaultParallelism
    byte-range splits, but all rows live in one row group, so one task
    reads everything and 31 read nothing. Only an explicit exchange
    guarantees balanced work. The repartition is one linear pass over
    the rows it feeds — negligible next to the quadratic/hash work
    downstream — and doubles as the skew-spreader on real clusters.
    Row values are unaffected; only layout changes.
    """
    n = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, *cols) if cols else df.repartition(n)
