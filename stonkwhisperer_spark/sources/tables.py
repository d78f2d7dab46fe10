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


def _scan_row_groups(df: DataFrame, cap: int = 64) -> int | None:
    """Best-effort count of the REAL parallelizable units under df's
    scan: parquet row groups (Spark's byte-range split count lies for
    small files — one row group means one task does all the work no
    matter how many splits the planner cuts). Reads only footers,
    driver-side, sampling at most ``cap`` files and extrapolating.
    Returns None when undeterminable (non-parquet, no scan, errors)."""
    try:
        files = [f for f in df.inputFiles() if f.endswith(".parquet")]
        if not files:
            return None
        import pyarrow.parquet as pq

        sample = files[:cap]
        groups = sum(
            pq.ParquetFile(f.removeprefix("file://").removeprefix("file:")).metadata.num_row_groups
            for f in sample
        )
        if len(files) > len(sample):
            groups = int(groups * len(files) / len(sample))
        return groups
    except Exception:  # noqa: BLE001 — layout probe is advisory only
        return None


def spread(df: DataFrame, *cols: str, min_partitions: int | None = None) -> DataFrame:
    """Hash-repartition the input before expression-heavy per-row work
    (regex chains, wide literal expression trees) — but ONLY when the
    scan's physical layout can't already parallelize it.

    The driver's testdata is one parquet file with one row group per
    table: Spark cuts it into defaultParallelism byte-range splits, but
    all rows live in the single row group, so one task reads everything
    and the rest read nothing — there an explicit exchange is the only
    way to balance the expensive downstream stage. At production scale
    the same table is thousands of files × row groups and the scan is
    already parallel; repartitioning then would be a gratuitous full
    exchange of the corpus. So: probe the parquet footers (cheap,
    driver-side, metadata only) and no-op when row groups >= target
    partitions. Row values are unaffected; only layout changes.
    """
    n = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    groups = _scan_row_groups(df)
    if groups is not None and groups >= n:
        return df
    return df.repartition(n, *cols) if cols else df.repartition(n)


def no_pushdown(pred) -> "F.Column":
    """Pin a filter predicate to the operator where it is written —
    i.e., ABOVE the preceding :func:`spread` exchange — by wrapping it
    in an always-true non-deterministic guard the optimizer cannot
    split off or simplify.

    Why: Catalyst pushes deterministic filters below
    RepartitionByExpression and into the parquet scan. For a cheap
    predicate that's exactly right; for a predicate over an expensive
    expression (the multi-regex language-ID argmax) it is a 10×
    regression on single-row-group inputs — the whole regex pass
    executes inside the ONE scan task instead of the 32-way
    repartitioned stage, and FilterExec evaluates it without the
    subexpression elimination ProjectExec would apply. (Measured at
    sf0.1: quality gate 2.7 s pushed vs 1.0 s pinned.)

    The guard must be (a) a single unsplittable expression — a bare
    `rand() > -1 AND pred` conjunction gets split and the
    deterministic half pushed anyway — and (b) outside the optimizer's
    range analysis: Spark 4 folds `rand() >= 0` to true (rand's [0,1)
    range is known), so the guard uses unbounded `randn()`. Values are
    unaffected: the guard is always true and `null AND/CASE` semantics
    match a bare filter (null drops the row either way)."""
    return F.when(F.randn() > F.lit(-1e9), pred).otherwise(F.lit(False))
