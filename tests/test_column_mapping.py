"""Column mapping on the parquet txlog: RENAME COLUMN as a
metadata-only commit — no data rewrite, logical view on every read
surface, physical names on disk."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from stonkwhisperer_spark.sinks.writers import (
    _commits,
    add_constraint,
    committed_files,
    delete_where_dv,
    merge_append,
    merge_upsert,
    read_committed,
    read_committed_pruned,
    rename_column,
    table_changes,
    table_schema,
)


def _seed(spark, target, n=30):
    df = spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    merge_append(spark, target, df.filter(F.col("k") < n // 2), ["k"])
    merge_append(spark, target, df.filter(F.col("k") >= n // 2), ["k"])
    return df


def test_rename_is_metadata_only_and_renames_all_reads(spark, tmp_path):
    target = str(tmp_path / "t")
    _seed(spark, target)
    before = {
        f: os.path.getmtime(os.path.join(target, f))
        for f in committed_files(target)
    }
    rename_column(target, "v", "val")
    after = {
        f: os.path.getmtime(os.path.join(target, f))
        for f in committed_files(target)
    }
    assert after == before  # zero data files rewritten
    got = read_committed(spark, target)
    assert got.columns == ["k", "val"]
    assert got.filter(F.col("val") == 100).count() == 1
    assert [f.name for f in table_schema(target).fields] == ["k", "val"]
    # Physical names on disk are unchanged.
    import pyarrow.parquet as pq

    for f in committed_files(target):
        assert "v" in pq.ParquetFile(os.path.join(target, f)).schema_arrow.names


def test_write_after_rename_lands_physically_and_reads_logically(spark, tmp_path):
    import pyarrow.parquet as pq

    target = str(tmp_path / "t")
    _seed(spark, target)
    rename_column(target, "v", "val")
    batch = spark.createDataFrame([(100, 111), (0, -1)], "k long, val long")
    inserted, updated = merge_upsert(spark, target, batch, ["k"])
    assert (inserted, updated) == (1, 1)
    got = read_committed(spark, target)
    assert got.columns == ["k", "val"]
    assert got.filter(F.col("k") == 0).first()["val"] == -1
    # Every data file — including post-rename ones — stores 'v'.
    for f in committed_files(target):
        names = pq.ParquetFile(os.path.join(target, f)).schema_arrow.names
        assert "v" in names and "val" not in names


def test_rename_time_travel_and_cdc(spark, tmp_path):
    target = str(tmp_path / "t")
    _seed(spark, target)
    v_before = _commits(target)[-1]["version"]
    rename_column(target, "v", "val")
    # Time travel before the rename shows the OLD logical name.
    old = read_committed(spark, target, version=v_before)
    assert old.columns == ["k", "v"]
    # The change feed (spanning commits before AND after) is logical.
    merge_upsert(
        spark, target,
        spark.createDataFrame([(0, -5)], "k long, val long"), ["k"],
    )
    feed = table_changes(spark, target, from_version=0)
    assert "val" in feed.columns and "v" not in feed.columns


def test_rename_guards(spark, tmp_path):
    target = str(tmp_path / "t")
    _seed(spark, target)
    with pytest.raises(ValueError, match="no such column"):
        rename_column(target, "nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        rename_column(target, "v", "k")
    add_constraint(spark, target, "pos_v", "v >= 0")
    with pytest.raises(ValueError, match="drop the constraint first"):
        rename_column(target, "v", "val")
    from stonkwhisperer_spark.sinks.writers import drop_constraint

    drop_constraint(target, "pos_v")
    rename_column(target, "v", "val")
    # Retired physical name cannot come back as a new column…
    with pytest.raises(ValueError, match="retired physical name"):
        merge_append(
            spark,
            target,
            spark.createDataFrame([(900, 1, 2)], "k long, val long, v long"),
            ["k"],
        )
    # …nor as a rename target.
    with pytest.raises(ValueError, match="retired physical name"):
        rename_column(target, "k", "v")
    # Chained rename keeps working (val -> score, physical stays v).
    rename_column(target, "val", "score")
    assert read_committed(spark, target).columns == ["k", "score"]


def test_rename_pruning_merge_keys_and_stream(spark, tmp_path):
    target = str(tmp_path / "t")
    _seed(spark, target)
    rename_column(target, "k", "key_id")
    # Zone-map pruning on the renamed column (stats are physical).
    df, files_read, files_total = read_committed_pruned(
        spark, target, "key_id", 0, 5
    )
    assert df.filter(F.col("key_id").between(0, 5)).count() == 6
    assert files_read < files_total
    # Merging BY the renamed key works.
    batch = spark.createDataFrame([(2, 999), (77, 770)], "key_id long, v long")
    assert merge_upsert(spark, target, batch, ["key_id"]) == (1, 1)
    # The streaming source emits the logical schema.
    from stonkwhisperer_spark.sources.txlog_stream import (
        TxlogChangeFeedDataSource,
    )

    try:
        spark.dataSource.register(TxlogChangeFeedDataSource)
    except Exception:  # noqa: BLE001 — already registered
        pass
    feed = (
        spark.readStream.format("stonkw_txlog_cdc")
        .option("path", target)
        .load()
    )
    assert "key_id" in feed.columns and "k" not in feed.columns
    q = (
        feed.writeStream.format("memory")
        .queryName("colmap_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(120)
    finally:
        q.stop()
    rows = spark.table("colmap_stream")
    assert rows.filter(F.col("key_id") == 77).count() == 1


def test_merge_append_reinserts_dv_deleted_keys(spark, tmp_path):
    """A DV-masked row is not part of the table: merge_append must not
    let its key suppress a re-insert (regression for the anti-join
    reading raw files instead of the DV-filtered snapshot)."""
    target = str(tmp_path / "t")
    _seed(spark, target, n=20)
    assert delete_where_dv(spark, target, F.col("k") == 3) == 1
    batch = spark.createDataFrame([(3, 333)], "k long, v long")
    assert merge_append(spark, target, batch, ["k"]) == 1
    got = read_committed(spark, target).filter(F.col("k") == 3).collect()
    assert [(r["k"], r["v"]) for r in got] == [(3, 333)]


def test_drop_column_metadata_only(spark, tmp_path):
    """DROP COLUMN: metadata-only, pruned at the scan, shed on rewrite,
    visible again under time travel; names are retired."""
    import pyarrow.parquet as pq

    from stonkwhisperer_spark.sinks.writers import compact, drop_column

    target = str(tmp_path / "t")
    _seed(spark, target)
    before = {
        f: os.path.getmtime(os.path.join(target, f))
        for f in committed_files(target)
    }
    v_before = _commits(target)[-1]["version"]
    drop_column(target, "v")
    after = {
        f: os.path.getmtime(os.path.join(target, f))
        for f in committed_files(target)
    }
    assert after == before  # zero data files rewritten
    got = read_committed(spark, target)
    assert got.columns == ["k"]
    assert "v" not in str(table_schema(target))
    assert got.count() == 30
    # Time travel before the drop still shows it.
    assert read_committed(spark, target, version=v_before).columns == ["k", "v"]
    # New writes cannot reuse either name.
    with pytest.raises(ValueError, match="retired"):
        merge_append(
            spark, target,
            spark.createDataFrame([(99, 1)], "k long, v long"), ["k"],
        )
    # Writes without the column work; rewrites shed the bytes.
    assert merge_append(
        spark, target, spark.createDataFrame([(99,)], "k long"), ["k"]
    ) == 1
    compact(spark, target)
    for f in committed_files(target):
        names = pq.ParquetFile(os.path.join(target, f)).schema_arrow.names
        assert "v" not in names
    assert read_committed(spark, target).count() == 31


def test_drop_renamed_column_and_guards(spark, tmp_path):
    from stonkwhisperer_spark.sinks.writers import drop_column

    target = str(tmp_path / "t")
    _seed(spark, target)
    rename_column(target, "v", "val")
    drop_column(target, "val")  # drop BY the logical name
    assert read_committed(spark, target).columns == ["k"]
    with pytest.raises(ValueError, match="no such column"):
        drop_column(target, "val")
    with pytest.raises(ValueError, match="no such column"):
        rename_column(target, "val", "x")
    # Neither 'val' (dropped logical) nor 'v' (its physical) revive.
    for dead in ("val", "v"):
        with pytest.raises(ValueError, match="retired"):
            rename_column(target, "k", dead)


def test_generated_columns(spark, tmp_path):
    """GENERATED ALWAYS AS: absent -> computed, present-but-wrong ->
    rejected, present-and-right -> accepted; definitions survive
    across write paths and block conflicting renames/drops."""
    from stonkwhisperer_spark.sinks.writers import (
        add_generated_column,
        append_txn,
        drop_generated_column,
        table_generated,
    )

    target = str(tmp_path / "t")
    seed = spark.createDataFrame(
        [(1, "2024-03-05 10:00:00")], "k long, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    merge_append(spark, target, seed, ["k"])
    add_generated_column(target, "event_date", "to_date(ts)")
    assert table_generated(target) == {"event_date": "to_date(ts)"}
    # Absent column -> computed, on every write path.
    more = spark.createDataFrame(
        [(2, "2024-03-06 09:00:00")], "k long, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    assert merge_append(spark, target, more, ["k"]) == 1
    txn_rows = spark.createDataFrame(
        [(3, "2024-03-07 08:00:00")], "k long, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    assert append_txn(spark, target, txn_rows, "gen", 0) == 1
    got = read_committed(spark, target)
    dates = {str(r["event_date"]) for r in got.filter(F.col("k") >= 2).collect()}
    assert dates == {"2024-03-06", "2024-03-07"}
    # Provided-but-wrong value -> rejected whole.
    lying = (
        spark.createDataFrame(
            [(4, "2024-03-08 07:00:00", "1999-01-01")],
            "k long, ts string, event_date string",
        )
        .withColumn("ts", F.col("ts").cast("timestamp_ntz"))
        .withColumn("event_date", F.col("event_date").cast("date"))
    )
    with pytest.raises(ValueError, match="generated column 'event_date'"):
        merge_append(spark, target, lying, ["k"])
    # Provided-and-correct -> accepted.
    honest = lying.withColumn("event_date", F.to_date("ts"))
    assert merge_append(spark, target, honest, ["k"]) == 1
    # Renaming/dropping the source or target column is blocked.
    with pytest.raises(ValueError, match="generated column"):
        rename_column(target, "ts", "event_ts")
    from stonkwhisperer_spark.sinks.writers import drop_column

    with pytest.raises(ValueError, match="generated column"):
        drop_column(target, "event_date")
    drop_generated_column(target, "event_date")
    rename_column(target, "ts", "event_ts")  # now fine
    assert "event_ts" in read_committed(spark, target).columns


def test_restore_across_rename_boundary(spark, tmp_path):
    """RESTORE to a pre-rename version: the file view reverts, the
    CURRENT logical names stay (rename is metadata, data-only restore),
    and the mixed-name CDC sides reconcile through physical names."""
    from stonkwhisperer_spark.sinks.writers import delete_where, restore

    target = str(tmp_path / "t")
    _seed(spark, target)  # k, v over two files
    v_before = _commits(target)[-1]["version"]
    delete_where(spark, target, F.col("k") >= 20)  # changes the file view
    rename_column(target, "v", "val")
    restore(spark, target, version=v_before)
    got = read_committed(spark, target)
    # Data reverted; the rename (metadata) survives, as with schema
    # evolution ("restore reverts DATA only").
    assert got.count() == 30
    assert got.columns == ["k", "val"]
    feed = table_changes(spark, target, from_version=v_before + 2)
    assert "val" in feed.columns and "v" not in feed.columns
    assert feed.filter(F.col("_change_type") == "insert").count() > 0


def test_restore_dv_diff_across_rename(spark, tmp_path):
    """A DV-only restore whose resurrected rows were read under the
    OLD logical name must still commit (relabel through physical)."""
    from stonkwhisperer_spark.sinks.writers import delete_where_dv, restore

    target = str(tmp_path / "t")
    _seed(spark, target)
    v_before = _commits(target)[-1]["version"]
    delete_where_dv(spark, target, F.col("k") < 5)
    rename_column(target, "v", "val")
    restore(spark, target, version=v_before)
    got = read_committed(spark, target)
    assert got.count() == 30 and got.columns == ["k", "val"]
