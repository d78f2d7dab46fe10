"""Cross-micro-batch stateful gap-fill (applyInPandasWithState): the
last value of batch N seeds batch N+1 — the semantic batch windows
cannot express."""

from __future__ import annotations

import datetime as dt

import pytest

from stonkwhisperer_spark.streaming.stateful import streaming_ffill


def test_streaming_ffill_carries_state_across_batches(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1, 9, 30, 0)
    schema = "symbol string, ts timestamp, price double"
    ticks = str(tmp_path / "ticks")
    # batch 1: AAPL ends with 101.0 on the wire
    spark.createDataFrame(
        [("AAPL", t0, 100.0), ("AAPL", t0 + dt.timedelta(minutes=1), None),
         ("AAPL", t0 + dt.timedelta(minutes=2), 101.0),
         ("MSFT", t0, None)],  # MSFT has no observed value yet
        schema,
    ).coalesce(1).write.mode("append").parquet(ticks)
    # batch 2: AAPL leads with a null -> must fill from batch 1's 101.0
    spark.createDataFrame(
        [("AAPL", t0 + dt.timedelta(minutes=10), None),
         ("AAPL", t0 + dt.timedelta(minutes=11), 102.0)],
        schema,
    ).coalesce(1).write.mode("append").parquet(ticks)

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(ticks)
    )
    out_path = str(tmp_path / "filled")
    q = (
        streaming_ffill(stream, key_col="symbol", ts_col="ts", value_col="price")
        .writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    rows = {(r.symbol, r.ts.minute): r for r in spark.read.parquet(out_path).collect()}
    assert len(rows) == 6
    assert rows[("AAPL", 31)].price == 100.0 and rows[("AAPL", 31)].filled
    # cross-batch carry: batch-2 leading null filled with batch-1 close
    assert rows[("AAPL", 40)].price == 101.0 and rows[("AAPL", 40)].filled
    assert rows[("AAPL", 41)].price == 102.0 and not rows[("AAPL", 41)].filled
    # never-observed key stays null rather than inventing a value
    assert rows[("MSFT", 30)].price is None and not rows[("MSFT", 30)].filled


def test_streaming_ffill_multichunk_out_of_order(spark, tmp_path):
    """Regression (ADVICE r2): applyInPandasWithState delivers a key's
    micro-batch as MULTIPLE Arrow chunks with no cross-chunk ordering;
    per-chunk sorting filled from a stale `last`. Force tiny chunks and
    write the rows time-DESCENDING so any per-chunk fill produces wrong
    values; the concat-then-sort implementation must fill correctly."""
    import datetime as dt

    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "10")
    try:
        t0 = dt.datetime(2024, 1, 1, 9, 30, 0)
        schema = "symbol string, ts timestamp, price double"
        n = 100
        # minute i: price = float(i) when i % 10 == 0, else null (to be
        # filled from the last multiple-of-10 minute before it).
        rows = [
            ("K", t0 + dt.timedelta(minutes=i), float(i) if i % 10 == 0 else None)
            for i in range(n)
        ]
        rows.reverse()  # descending on the wire → spans chunks out of order
        ticks = str(tmp_path / "ticks")
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(ticks)

        stream = spark.readStream.schema(schema).parquet(ticks)
        out_path = str(tmp_path / "filled")
        q = (
            streaming_ffill(stream, key_col="symbol", ts_col="ts", value_col="price")
            .writeStream.format("parquet")
            .option("path", out_path)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        got = {r.ts: r.price for r in spark.read.parquet(out_path).collect()}
        assert len(got) == n
        for i in range(n):
            expect = float((i // 10) * 10)
            assert got[t0 + dt.timedelta(minutes=i)] == expect, f"minute {i}"
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)


def test_streaming_ffill_tws_carries_state_across_batches(spark, tmp_path):
    """Same cross-batch carry contract on the Spark 4
    transformWithStateInPandas successor API. The TWS state server
    speaks protobuf to the JVM; this sandbox ships pyspark without
    protobuf (and installs are disallowed), so the test skips there —
    the operator itself is environment-gated, not stubbed."""
    pytest.importorskip("google.protobuf.descriptor")
    from stonkwhisperer_spark.streaming.stateful import streaming_ffill_tws

    t0 = dt.datetime(2024, 1, 1, 9, 30, 0)
    schema = "symbol string, ts timestamp, price double"
    ticks = str(tmp_path / "ticks")
    spark.createDataFrame(
        [("AAPL", t0, 100.0), ("AAPL", t0 + dt.timedelta(minutes=1), None),
         ("AAPL", t0 + dt.timedelta(minutes=2), 101.0),
         ("MSFT", t0, None)],
        schema,
    ).coalesce(1).write.mode("append").parquet(ticks)
    spark.createDataFrame(
        [("AAPL", t0 + dt.timedelta(minutes=10), None),
         ("AAPL", t0 + dt.timedelta(minutes=11), 102.0)],
        schema,
    ).coalesce(1).write.mode("append").parquet(ticks)

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(ticks)
    )
    out_path = str(tmp_path / "filled")
    q = (
        streaming_ffill_tws(stream, key_col="symbol", ts_col="ts", value_col="price")
        .writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    rows = {(r.symbol, r.ts.minute): r for r in spark.read.parquet(out_path).collect()}
    assert len(rows) == 6
    assert rows[("AAPL", 31)].price == 100.0 and rows[("AAPL", 31)].filled
    assert rows[("AAPL", 40)].price == 101.0 and rows[("AAPL", 40)].filled
    assert rows[("AAPL", 41)].price == 102.0 and not rows[("AAPL", 41)].filled
    assert rows[("MSFT", 30)].price is None and not rows[("MSFT", 30)].filled
