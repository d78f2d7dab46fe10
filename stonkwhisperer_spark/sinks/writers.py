"""Sinks (SURVEY.md §2.2 K1–K6): partitioned columnar writes and
idempotent merge-append writers.

Reference semantics re-expressed Spark-first:
  * K1 — pandas→parquet→S3 under ``ingestion_date=YYYY-MM-DD``
    (data_pipeline/tasks/load_to_s3.py:16-27) becomes
    ``write.partitionBy("ingestion_date").parquet(path)``: one commit,
    no BytesIO hop, partition pruning on read for free.
  * K3/K4 — the Postgres insert-with-anti-join-dedup workers
    (loading.py:150-193, 213-314) become ``merge_append``: left-anti on
    the natural key vs the target, then append. Re-running a batch
    inserts 0 rows — the reference's core invariant (loading.py:150-161).
  * K5 — stock-bar insert with broadcast ticker→company_id resolve and
    skip-unknown (loading.py:93-125, 327-355) becomes ``upsert_bars``.
  * K6 — TimescaleDB hypertable DDL (migration.py:30-36) becomes a
    date-partitioned table layout (``bar_date`` partition column).

On a platform with Delta/Iceberg, ``merge_append`` is ``MERGE INTO ...
WHEN NOT MATCHED THEN INSERT`` — atomic under concurrent writers. The
parquet implementation here has the same idempotence for serial re-runs
(the reference's Celery model) but no cross-writer transaction; the
docstrings call this out rather than pretending otherwise.

Scale: the anti-join shuffles on the high-cardinality natural key; the
target side is pruned to key columns only, so the "read the whole
target" cost is a key-column scan, and partition pruning applies when
``target_partition_filter`` narrows it.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from stonkwhisperer_spark.operators.joins import broadcast_enrich, new_rows_anti


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str] = ("ingestion_date",),
    mode: str = "append",
) -> None:
    """K1: partitioned parquet write; adds ``ingestion_date`` =
    current_date() when absent (reference load_to_s3.py:20-27 layout).
    Sized for scale: callers repartition on the partition columns first
    if many small files per partition would result."""
    for c in partition_cols:
        if c == "ingestion_date" and c not in df.columns:
            df = df.withColumn(c, F.current_date())
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def _target_exists(spark: SparkSession, path: str) -> bool:
    # local/posix check suffices in this environment; on cloud storage
    # use the Hadoop FileSystem API via spark._jvm (same semantics).
    return os.path.exists(path)


def merge_append(
    spark: SparkSession,
    target_path: str,
    batch: DataFrame,
    keys: Sequence[str],
    target_partition_filter: Column | None = None,
    partition_cols: Sequence[str] | None = None,
) -> int:
    """K3/K4: idempotent merge-append — insert batch rows whose ``keys``
    are absent from the target; returns inserted-row count (the
    reference returns it for logging, loading.py:119).

    Batch is pre-deduplicated on the keys (the reference's intra-batch
    cache, loading.py:274). Idempotent: re-running the same batch
    inserts 0 rows. Not atomic across concurrent writers — use Delta
    MERGE for that.
    """
    batch = batch.dropDuplicates(list(keys))
    if _target_exists(spark, target_path):
        existing = spark.read.parquet(target_path)
        if target_partition_filter is not None:
            existing = existing.filter(target_partition_filter)
        new_rows = new_rows_anti(batch, existing, keys)
    else:
        new_rows = batch
    # Two actions (count + write) on one plan: cache the small insert
    # set rather than recompute the anti-join.
    new_rows = new_rows.cache()
    try:
        n = new_rows.count()
        if n:
            writer = new_rows.write.mode("append")
            if partition_cols:
                writer = writer.partitionBy(*partition_cols)
            writer.parquet(target_path)
    finally:
        new_rows.unpersist()
    return n


def conform(df: DataFrame, schema) -> DataFrame:
    """K6: enforce a declared table contract before writing — the
    parquet-path stand-in for DDL. The reference pins its layout with
    ``create_hypertable('stock_bars','timestamp')`` + SQLAlchemy column
    types (migration.py:30-36); on Delta/Iceberg that is ``CREATE TABLE
    ... PARTITIONED BY (...)``. Plain parquet has no catalog, so the
    contract is enforced at write time instead: every schema column
    must exist, is cast to the declared type, and extras are dropped.
    Raises on missing columns rather than writing a drifted table."""
    missing = [f.name for f in schema.fields if f.name not in df.columns]
    if missing:
        raise ValueError(f"schema contract violated, missing columns: {missing}")
    return df.select(*[F.col(f.name).cast(f.dataType) for f in schema.fields])


def ensure_table(
    spark: SparkSession,
    name: str,
    schema,
    path: str,
    partition_cols: Sequence[str] = (),
) -> None:
    """K6 proper: REAL catalog DDL for the time-partitioned table
    contract — the Spark respec of the reference's ``create_all`` +
    ``create_hypertable('stock_bars','timestamp')`` (migration.py:11-46).

    ``CREATE TABLE IF NOT EXISTS ... USING parquet PARTITIONED BY (...)
    LOCATION path`` registers the declared contract in the session
    catalog, making the path-written data a first-class SQL table with
    partition pruning; ``MSCK REPAIR`` recovers partitions that
    path-based writers (write_partitioned / upsert_bars) added outside
    the catalog. On Delta/Iceberg the same call is ``USING delta`` and
    the repair step disappears (the log tracks partitions). The
    declared ``schema`` must include the partition columns."""
    missing = [c for c in partition_cols if c not in {f.name for f in schema.fields}]
    if missing:
        raise ValueError(f"partition columns absent from declared schema: {missing}")
    cols = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields)
    part = f" PARTITIONED BY ({', '.join(partition_cols)})" if partition_cols else ""
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {name} ({cols}) USING parquet{part} LOCATION '{path}'"
    )
    if partition_cols:
        spark.sql(f"MSCK REPAIR TABLE {name}")


def upsert_bars(
    spark: SparkSession,
    target_path: str,
    bars: DataFrame,
    companies: DataFrame,
    ticker_col: str = "ticker",
    ts_col: str = "bar_ts",
) -> int:
    """K5: resolve ticker→company_id via broadcast dim join (inner =
    skip unknown tickers, loading.py:330-333), derive the ``bar_date``
    partition column (K6 hypertable layout), then idempotent
    merge-append on the composite (company_id, ts) unique key
    (models/stock_bar.py:20-22)."""
    resolved = broadcast_enrich(
        bars,
        companies.select(F.col(ticker_col), F.col("id").alias("company_id")),
        ticker_col,
        "inner",
    ).withColumn("bar_date", F.to_date(F.col(ts_col)))
    return merge_append(
        spark, target_path, resolved, ["company_id", ts_col], partition_cols=["bar_date"]
    )
