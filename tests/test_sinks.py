"""Sink property tests (SURVEY.md §5.4): partition layout and the
idempotence invariant — re-running a batch inserts 0 rows
(reference loading.py:150-161)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from stonkwhisperer_spark.sinks.writers import merge_append, upsert_bars, write_partitioned


def _articles(spark, n=20, offset=0):
    return spark.range(offset, offset + n).select(
        F.concat(F.lit("https://ex.com/"), F.col("id")).alias("url"),
        F.concat(F.lit("title "), F.col("id")).alias("title"),
    )


def test_write_partitioned_layout(spark, tmp_path):
    path = str(tmp_path / "landing")
    write_partitioned(_articles(spark), path)
    parts = [d for d in os.listdir(path) if d.startswith("ingestion_date=")]
    assert len(parts) == 1
    assert spark.read.parquet(path).count() == 20


def test_merge_append_idempotent(spark, tmp_path):
    path = str(tmp_path / "articles")
    batch = _articles(spark)
    assert merge_append(spark, path, batch, ["url"]) == 20
    # the reference invariant: re-run => 0 new rows
    assert merge_append(spark, path, batch, ["url"]) == 0
    assert spark.read.parquet(path).count() == 20
    # overlapping batch: only genuinely-new keys insert
    assert merge_append(spark, path, _articles(spark, n=20, offset=10), ["url"]) == 10
    assert spark.read.parquet(path).count() == 30


def test_merge_append_dedups_batch(spark, tmp_path):
    path = str(tmp_path / "dedup")
    dup_batch = _articles(spark, n=5).unionByName(_articles(spark, n=5))
    assert merge_append(spark, path, dup_batch, ["url"]) == 5


def test_upsert_bars_resolves_fk_and_skips_unknown(spark, tmp_path):
    path = str(tmp_path / "bars")
    companies = spark.createDataFrame(
        [("c1", "AAPL"), ("c2", "MSFT")], "id string, ticker string"
    )
    bars = spark.createDataFrame(
        [
            ("AAPL", "2024-01-02 09:30:00", 190.0),
            ("MSFT", "2024-01-02 09:30:00", 370.0),
            ("NOPE", "2024-01-02 09:30:00", 1.0),  # unknown ticker -> skipped
        ],
        "ticker string, bar_ts string, close double",
    ).withColumn("bar_ts", F.col("bar_ts").cast("timestamp_ntz"))
    assert upsert_bars(spark, path, bars, companies) == 2
    out = spark.read.parquet(path)
    assert set(out.columns) >= {"company_id", "bar_ts", "close", "bar_date"}
    assert out.count() == 2
    # composite-key idempotence (company_id, bar_ts)
    assert upsert_bars(spark, path, bars, companies) == 0
    # partition layout: hypertable-style date partitions
    assert any(d.startswith("bar_date=") for d in os.listdir(path))


def test_concurrent_merge_caveat(spark, tmp_path):
    """merge_append is idempotent for SERIAL re-runs but NOT atomic
    under concurrent writers — this test demonstrates the documented
    race (README "ACID table format") rather than hiding it: two
    writers that both compute their anti-join against the same target
    snapshot, then both append, CAN land duplicate keys. Delta/Iceberg
    MERGE INTO closes this; neither is installable in this sandbox."""
    from stonkwhisperer_spark.operators.joins import new_rows_anti
    from stonkwhisperer_spark.sinks.writers import merge_append

    target = str(tmp_path / "t")
    base = spark.createDataFrame([("k1", 1)], "k string, v int")
    assert merge_append(spark, target, base, ["k"]) == 1

    # Both writers snapshot the target BEFORE either writes (the
    # interleaving a table format's optimistic commit would reject).
    batch = spark.createDataFrame([("k2", 2)], "k string, v int")
    existing = spark.read.parquet(target)
    writer_a = new_rows_anti(batch, existing, ["k"]).collect()
    writer_b = new_rows_anti(batch, existing, ["k"]).collect()
    for rows in (writer_a, writer_b):
        spark.createDataFrame(rows, batch.schema).write.mode("append").parquet(target)

    dup_counts = (
        spark.read.parquet(target).groupBy("k").count().filter("count > 1").collect()
    )
    assert dup_counts and dup_counts[0]["k"] == "k2"  # the race is real

    # ...while the serial path stays idempotent on the same target.
    assert merge_append(spark, target, batch, ["k"]) == 0


def test_ensure_table_catalog_ddl_and_pruning(spark, tmp_path):
    """K6 end-to-end: upsert_bars writes the bar_date-partitioned
    layout, ensure_table registers the declared contract as a real
    catalog table, and a bar_date predicate prunes partitions at the
    scan (the hypertable chunk-exclusion equivalent)."""
    import datetime as dt

    from pyspark.sql import types as T

    from stonkwhisperer_spark.sinks.writers import ensure_table, upsert_bars

    target = str(tmp_path / "bars")
    rows = [
        ("AAPL", dt.datetime(2024, 1, d, 9, 30), 190.0, 191.0, 189.0, 190.5, 190.2, 100, 5)
        for d in (2, 3, 4)
    ]
    bars = spark.createDataFrame(
        rows,
        "ticker string, bar_ts timestamp, open double, high double, low double,"
        " close double, vwap double, volume int, trade_count int",
    )
    companies = spark.createDataFrame([("c1", "AAPL")], "id string, ticker string")
    assert upsert_bars(spark, target, bars, companies) == 3

    table_schema = T.StructType(
        [f for f in spark.read.parquet(target).schema.fields if f.name != "bar_date"]
        + [T.StructField("bar_date", T.DateType())]
    )
    spark.sql("DROP TABLE IF EXISTS stock_bars_t")
    ensure_table(spark, "stock_bars_t", table_schema, target, ["bar_date"])
    try:
        q = spark.sql("SELECT ticker, volume FROM stock_bars_t WHERE bar_date = DATE'2024-01-03'")
        assert q.count() == 1
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [isnotnull(bar_date" in plan  # pruning reaches the scan

        # the catalog table tracks later path-written partitions after repair
        more = spark.createDataFrame(
            [("AAPL", dt.datetime(2024, 1, 5, 9, 30), 1.0, 1.0, 1.0, 1.0, 1.0, 1, 1)],
            bars.schema,
        )
        assert upsert_bars(spark, target, more, companies) == 1
        spark.sql("MSCK REPAIR TABLE stock_bars_t")
        assert spark.table("stock_bars_t").count() == 4
    finally:
        spark.sql("DROP TABLE IF EXISTS stock_bars_t")
