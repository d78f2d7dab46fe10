"""Structured Streaming jobs (SURVEY.md §2.9, build plan M4).

The reference ingests by daily batch poll; its streaming-equivalent
semantics map to:

  * landing-zone file source with ``maxFilesPerTrigger`` — the
    "newest-first, limit N" polling rate limit (extraction.py:116-119);
  * event-time watermark + ``dropDuplicatesWithinWatermark`` — the
    in-stream half of the url/reddit_id dedup (loading.py:150-161);
    cross-run dedup stays in the ``foreachBatch`` merge (the
    merge_append sink), exactly the split SURVEY §2.9 prescribes;
  * tumbling-window minute bars over raw ticks — the aggregation the
    reference outsources to its bar vendor (extraction.py:196-222),
    with ``min_by``/``max_by`` open/close picks;
  * ``foreachBatch`` merge-append — per-micro-batch idempotent insert,
    so a replayed micro-batch (at-least-once delivery) lands 0 rows.

State stays bounded: every stateful op (dedup, window agg) sits behind
the watermark, so state for closed windows/expired keys is evicted —
the property that keeps a 100 TB/day stream from accumulating unbounded
executor state.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from stonkwhisperer_spark.sinks.writers import merge_append


def read_landing_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over a landing zone of parquet drops.
    ``max_files_per_trigger`` is the source-side rate limit (F3)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def dedup_within_watermark(
    df: DataFrame, keys: Sequence[str], ts_col: str, delay: str = "10 minutes"
) -> DataFrame:
    """In-stream dedup on the natural key, state bounded by the
    watermark. Cross-run dupes are the merge sink's job."""
    return df.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(list(keys))


def minute_bars(
    ticks: DataFrame,
    ts_col: str = "ts",
    key_col: str = "symbol",
    value_col: str = "price",
    watermark: str = "10 minutes",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Tumbling 1-minute OHLCV per key over a tick stream (same shape
    as the batch ohlcv_1min flagship; works on batch frames too when
    ``watermark=None``). Late ticks beyond the watermark are dropped —
    the documented late-data policy. Pass ``tiebreak_col`` to make the
    open/close picks deterministic when two ticks share a timestamp
    (composite (ts, tiebreak) ordering, same discipline as the batch
    ohlcv_1min)."""
    src = ticks.withWatermark(ts_col, watermark) if watermark else ticks
    v, t = F.col(value_col), F.col(ts_col)
    order = F.struct(t, F.col(tiebreak_col)) if tiebreak_col else t
    return (
        src.groupBy(F.window(t, "1 minute").alias("w"), F.col(key_col))
        .agg(
            F.min_by(v, order).alias("open"),
            F.max(v).alias("high"),
            F.min(v).alias("low"),
            F.max_by(v, order).alias("close"),
            F.count("*").alias("n_ticks"),
        )
        .select(
            F.col("w.start").alias("bar_ts"), key_col, "open", "high", "low", "close", "n_ticks"
        )
    )


def start_merge_stream(
    stream_df: DataFrame,
    target_path: str,
    keys: Sequence[str],
    checkpoint: str,
    available_now: bool = True,
    processing_time: str | None = None,
) -> StreamingQuery:
    """foreachBatch merge-append sink: each micro-batch left-anti joins
    the target on ``keys`` and appends only new rows — replayed batches
    insert 0 (per-batch idempotence on top of checkpoint exactly-once).
    ``available_now=True`` drains the backlog then stops (the batch-
    shaped trigger used in tests and backfills);
    ``processing_time='5 seconds'`` instead runs continuously, firing a
    micro-batch per interval — the long-lived ingest deployment shape."""

    def sink(batch_df: DataFrame, _epoch: int) -> None:
        merge_append(batch_df.sparkSession, target_path, batch_df, keys)

    writer = (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if processing_time is not None:
        writer = writer.trigger(processingTime=processing_time)
    elif available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_txn_append_stream(
    stream_df: DataFrame,
    target_path: str,
    app_id: str,
    checkpoint: str,
    partition_cols: Sequence[str] | None = None,
    available_now: bool = True,
    processing_time: str | None = None,
) -> StreamingQuery:
    """EXACTLY-ONCE streaming sink into the parquet txlog — the Delta
    ``writeStream.format("delta")`` contract: each micro-batch commits
    via :func:`append_txn` with (app_id, epoch_id) as the transaction
    identity, so a micro-batch replayed after a checkpoint recovery
    lands zero duplicate rows — and a whole re-run over a FRESH
    checkpoint with the same app_id is likewise a no-op whenever its
    epoch numbering realigns (deterministic source + fixed per-trigger
    limits; Delta's txnAppId/txnVersion carries the same caveat — the
    ledger keys on declared transaction identity, not row content).
    This upgrades
    foreachBatch's native at-least-once delivery to exactly-once table
    contents WITHOUT any key-based dedup: idempotence comes from the
    commit ledger, not the data, so it holds even for tables with no
    natural key.

    Blind append per batch — no target read, O(micro-batch) cost
    regardless of table size; the scalable continuous-ingest shape for
    a 100 TB table (contrast :func:`start_merge_stream`, which pays a
    key anti-join per batch for cross-source dedup)."""
    from stonkwhisperer_spark.sinks.writers import append_txn

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        append_txn(
            batch_df.sparkSession,
            target_path,
            batch_df,
            app_id,
            epoch_id,
            partition_cols=partition_cols,
        )

    writer = (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if processing_time is not None:
        writer = writer.trigger(processingTime=processing_time)
    elif available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_txn_merge_ingest(
    spark: SparkSession,
    landing: str,
    schema: T.StructType,
    target_path: str,
    keys: Sequence[str],
    app_id: str,
    checkpoint_root: str,
    max_files_per_trigger: int = 1,
    shuffle_width: int = 8,
    timeout_sec: float = 300.0,
) -> tuple[int, int]:
    """Exactly-once streaming MERGE ingest, drained and then PROVEN
    replay-safe — the shared engine of the r13 index-maintenance
    streaming arm (bm25_index_stream_upsert / minhash_index_stream_
    upsert):

    1. a rate-limited file-source stream over ``landing`` drains under
       ``Trigger.AvailableNow`` into ``target_path`` via per-micro-batch
       :func:`sinks.writers.merge_upsert_txn` keyed (``app_id``, epoch)
       — Delta's ``foreachBatch + txnVersion`` pattern;
    2. the drain is asserted to have split across >=2 micro-batches
       (genuinely a stream, not a single batch in disguise) with both
       MERGE arms non-empty cumulatively;
    3. the WHOLE stream re-runs over a fresh checkpoint and must
       re-present the same number of micro-batches (a zero-batch replay
       would pass the no-op checks vacuously) while applying ZERO rows
       and leaving the committed version unmoved — the txn ledger makes
       the replay structurally a no-op, which key-level idempotence
       alone could not (a replayed old batch would resurrect stale
       values over a later batch's rows).

    Returns the first drain's cumulative (inserted, updated).

    Per-micro-batch MERGE shuffles run at ``shuffle_width`` (the
    ``_stream_shuffle_width`` harness-scale discipline: session width
    over a few-MB batch is pure scheduling overhead; production sizes
    this to the cluster), restored after each drain.

    Scale: per poll interval this is the batch path's O(batch) keyed
    copy-on-write MERGE; checkpoint + ledger give exactly-once table
    contents end-to-end; the maintained table is the only state — no
    watermark, no state store."""
    from stonkwhisperer_spark.sinks.writers import (
        _committed_version,
        merge_upsert_txn,
    )

    key_cols = list(keys)
    arms: list[tuple[int, int]] = []

    def sink(mb: DataFrame, epoch_id: int) -> None:
        arms.append(
            merge_upsert_txn(
                mb.sparkSession, target_path, mb, key_cols, app_id, epoch_id
            )
        )

    def drain(ckpt: str) -> None:
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_width))
        try:
            q = (
                read_landing_stream(
                    spark, landing, schema,
                    max_files_per_trigger=max_files_per_trigger,
                )
                .writeStream.foreachBatch(sink)
                .option("checkpointLocation", ckpt)
                .outputMode("update")
                .trigger(availableNow=True)
                .start()
            )
            try:
                if not q.awaitTermination(timeout_sec):
                    raise TimeoutError(
                        f"ingest stream over {landing} did not drain "
                        f"within {timeout_sec}s"
                    )
            finally:
                trace_progress(q, landing)
                q.stop()
            exc = q.exception()
            if exc is not None:
                raise exc
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)

    drain(f"{checkpoint_root}/ckpt1")
    if len(arms) < 2:
        raise AssertionError(
            f"ingest drained in {len(arms)} micro-batch(es) — the rate "
            "limit did not split the backlog; not a stream"
        )
    inserted = sum(a[0] for a in arms)
    updated = sum(a[1] for a in arms)
    if inserted == 0 or updated == 0:
        raise AssertionError(
            f"MERGE arms not both exercised across the drain: "
            f"inserted={inserted}, updated={updated}"
        )
    v_before, n_before = _committed_version(target_path), len(arms)
    drain(f"{checkpoint_root}/ckpt2")
    replayed = arms[n_before:]
    if len(replayed) != n_before:
        raise AssertionError(
            f"replay presented {len(replayed)} micro-batch(es), expected "
            f"{n_before} — a short replay would pass the no-op checks "
            "vacuously"
        )
    if sum(i + u for i, u in replayed) != 0:
        raise AssertionError(f"replayed stream applied rows: {replayed}")
    if _committed_version(target_path) != v_before:
        raise AssertionError("replayed stream moved the committed version")
    return inserted, updated


def start_cdc_apply_stream(
    spark: SparkSession,
    source_path: str,
    target_path: str,
    keys: Sequence[str],
    app_id: str,
    checkpoint: str,
    available_now: bool = True,
    processing_time: str | None = None,
) -> StreamingQuery:
    """Stream one txlog table's change-data feed INTO another — the
    canonical CDF consumer (Delta's "replicate a table with
    readStream.option('readChangeFeed') + foreachBatch MERGE"):
    subscribe to the source's typed change feed
    (``format("stonkw_txlog_cdc")``), and per micro-batch apply the
    LATEST change per key to the target via the idempotent
    :func:`sinks.writers.merge_upsert_txn`.

    A micro-batch may span several source commits, so a key can carry
    multiple images; the reduction keeps the newest change per key by
    ``_commit_version`` — an insert/update_postimage upserts, a
    ``delete`` row DELETES the replica key (pre-images are observers'
    data, not state), so the replica tracks the source through the
    full insert/update/delete lifecycle instead of only growing.
    Exactly-once: the (app_id, epoch_id) transaction marker makes
    replayed batches structural no-ops — necessary with upserts, where
    key-level idempotence alone would let a replayed old batch
    resurrect stale values over a later batch's rows.

    Scale: the feed is O(changed rows) per poll (never a source table
    scan), the reduction is one bounded shuffle on the merge keys, and
    the merge rewrites only the target files owning matched keys —
    end-to-end O(delta) replication for a 100 TB source."""
    from pyspark.sql.window import Window

    from stonkwhisperer_spark.sinks.writers import merge_cdc_txn

    key_cols = list(keys)

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        latest = (
            batch_df.filter(
                F.col("_change_type").isin(
                    "insert", "update_postimage", "delete"
                )
            )
            .withColumn(
                "_rn",
                F.row_number().over(
                    Window.partitionBy(*key_cols).orderBy(
                        F.col("_commit_version").desc()
                    )
                ),
            )
            .filter(F.col("_rn") == 1)
            .drop("_rn", "_commit_version")
        )
        # merge_cdc_txn pins the reduced batch to JVM-local blocks
        # (pin_batch) AFTER its txn-ledger short-circuit, so a real
        # apply executes the Python-data-source feed exactly once and
        # a replayed epoch executes it zero times — see the engine's
        # pin_batch note and docs/BENCH_METHOD.md round 15.
        merge_cdc_txn(
            batch_df.sparkSession,
            target_path,
            latest,
            key_cols,
            app_id,
            epoch_id,
        )

    stream = (
        spark.readStream.format("stonkw_txlog_cdc")
        .option("path", source_path)
        .load()
    )
    writer = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if processing_time is not None:
        writer = writer.trigger(processingTime=processing_time)
    elif available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def join_streams_time_bounded(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lookback: str = "10 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stream-stream inner join: right-side rows match left-side rows
    with the same ``key`` whose event time falls in
    ``[left_ts - lookback, left_ts]`` — e.g. "attach every sentiment
    score published in the 10 minutes before each tick".

    Both sides carry watermarks AND the join condition bounds event
    time — the two requirements that let Spark evict buffered rows:
    state per side is (watermark + lookback) of data per key, never
    history. Without the time bound the state store grows forever;
    this helper makes the bound impossible to forget. Works on batch
    frames too (watermarks are a no-op there) — the parity surface
    the test uses."""
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    lc, rc = F.col(f"_l.{left_ts}"), F.col(f"_r.{right_ts}")
    return lw.alias("_l").join(
        rw.alias("_r"),
        (F.col(f"_l.{key}") == F.col(f"_r.{key}"))
        & (rc >= lc - F.expr(f"INTERVAL {lookback}"))
        & (rc <= lc),
    )


def enable_available_now_wrapper(spark: SparkSession) -> None:
    """Turn on Spark's ``AvailableNowDataStreamWrapper`` for sources —
    like every Python data source (``PythonMicroBatchStream`` does not
    implement ``SupportsTriggerAvailableNow``; verified against the
    Spark 4.1.2 class files) — that would otherwise downgrade
    ``Trigger.AvailableNow`` to single-batch execution with a WARN.
    With the wrapper, an UNratelimited txlog CDC subscription under
    ``availableNow`` captures the head commit version at start, drains
    to exactly that offset, and terminates natively — no drain-polling
    helper, no downgrade warning.

    The wrapper's own one-line activation WARN advises "extreme care"
    because it assumes the delegate's ``latestOffset`` is deterministic
    and replay-stable. The txlog source's offsets are committed log
    versions — deterministic by construction (CAS-committed, replayed
    via ``partitions(start, end)``) — so the advisory does not apply;
    we suppress that single logger rather than the message class it
    guards. DO NOT combine the wrapper with ``maxCommitsPerTrigger``:
    the wrapper treats the FIRST ``latestOffset()`` result as the final
    target, so a rate-limited reader stops after one slice (verified
    empirically; ``tests/test_streaming.py`` pins the behavior). Rate-
    limited drains use ``processingTime`` + :func:`drain_until_caught_up`;
    :func:`run_available_now` raises loudly if a stream stopped short."""
    spark.conf.set("spark.sql.streaming.triggerAvailableNowWrapper.enabled", "true")
    try:
        jvm = spark.sparkContext._jvm
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            "org.apache.spark.sql.execution.streaming.runtime."
            "AvailableNowMicroBatchStreamWrapper",
            jvm.org.apache.logging.log4j.Level.ERROR,
        )
    except Exception:  # noqa: BLE001 — cosmetic; the conf is what matters
        pass


def parse_offset(eo) -> dict | None:
    """Parse a streaming-progress endOffset into a dict, or None if it
    isn't one. The Python-source bridge serializes offsets as JSON or
    dict-repr strings depending on path; malformed/foreign entries
    degrade to None (ADVICE r7: never let a progress sample raise an
    unrelated AttributeError inside a poll loop)."""
    import ast as _ast
    import json as _json

    if isinstance(eo, dict):
        return eo
    if not isinstance(eo, str):
        return None
    try:
        off = _json.loads(eo)
    except _json.JSONDecodeError:
        try:
            off = _ast.literal_eval(eo)
        except (ValueError, SyntaxError):
            return None
    return off if isinstance(off, dict) else None


def trace_progress(query: StreamingQuery, label: str) -> None:
    """Opt-in micro-batch forensics (``STONKW_STREAM_TRACE=<file>``):
    append one JSON line per drained stream with every micro-batch's
    batchId, input rows, and the full ``durationMs`` breakdown
    (addBatch / getBatch / latestOffset / queryPlanning /
    triggerExecution / walCommit). Default off — zero cost in normal
    runs. Exists so a flagged bench number can be decomposed at the
    mechanism level (per-batch cost × batch count) instead of argued
    about at the suite level; see docs/BENCH_METHOD.md."""
    path = os.environ.get("STONKW_STREAM_TRACE")
    if not path:
        return
    import json as _json
    import time as _time

    recs = []
    for p in query.recentProgress or []:
        if not isinstance(p, dict):
            continue
        recs.append(
            {
                "batchId": p.get("batchId"),
                "numInputRows": p.get("numInputRows"),
                "durationMs": p.get("durationMs"),
            }
        )
    try:
        with open(path, "a") as f:
            f.write(
                _json.dumps(
                    {"label": label, "t": _time.time(), "batches": recs}
                )
                + "\n"
            )
    except OSError:  # noqa: PERF203 — tracing must never sink the drain
        pass


def run_available_now(
    query: StreamingQuery,
    table_path: str,
    timeout_sec: float = 300.0,
) -> int:
    """Await an ``availableNow``-triggered txlog CDC stream (started
    under :func:`enable_available_now_wrapper`) and VERIFY it drained
    the whole backlog: after natural termination, the last completed
    batch's end offset must cover every commit present at call time.
    The assert is the guard against the wrapper's one known footgun —
    a rate-limited reader silently stopping after its first slice.
    Returns the commit version reached.

    Scale: one driver-side blocking await plus O(1) log metadata; no
    polling, no empty micro-batches — the wrapper terminates the query
    the moment the captured offset is reached."""
    from stonkwhisperer_spark.sinks.writers import _committed_version

    head = _committed_version(table_path)
    try:
        if not query.awaitTermination(timeout_sec):
            query.stop()
            raise TimeoutError(
                f"availableNow stream over {table_path} still running "
                f"after {timeout_sec}s"
            )
        exc = query.exception()
        if exc is not None:
            raise exc
    finally:
        # In finally: the forensics hook must record the timed-out and
        # failed drains too — those are the ones worth decomposing.
        trace_progress(query, table_path)
    reached = -1
    p = query.lastProgress
    if p and p.get("sources"):
        off = parse_offset(p["sources"][0].get("endOffset"))
        if off is not None:
            reached = int(off.get("version", -1))
    if reached < head:
        raise AssertionError(
            f"availableNow stream over {table_path} terminated at commit "
            f"version {reached} but the head is {head} — stopped short "
            "(rate-limited reader under the availableNow wrapper? use "
            "processingTime + drain_until_caught_up for that path)"
        )
    return reached


def drain_until_caught_up(
    query: StreamingQuery,
    table_path: str,
    timeout_sec: float = 300.0,
    poll_sec: float = 0.05,
) -> int:
    """Drain-until-caught-up for a RATE-LIMITED txlog CDC subscription
    (``maxCommitsPerTrigger`` set). Unratelimited drains should use
    ``Trigger.AvailableNow`` + :func:`enable_available_now_wrapper` +
    :func:`run_available_now` instead — native single-batch drain, no
    polling. This helper exists because no availableNow path can honor
    the rate limit: the plain bridge downgrades to ONE micro-batch (one
    slice, silent stop-short) and the wrapper captures the first
    ``latestOffset()`` slice as its final target (same stop-short,
    verified empirically).

    Start the stream with a ``processingTime`` trigger (e.g.
    ``processing_time="0 seconds"``) and call this helper: it blocks
    until a COMPLETED micro-batch's end offset covers every commit
    present at call time — the rate limit simply spreads the backlog
    over several micro-batches — then stops the query. Returns the
    commit version reached. Raises the query's own exception if it
    fails, or TimeoutError past ``timeout_sec``.

    Scale: pure driver-side progress polling — no extra Spark jobs, no
    data reads beyond what the stream itself plans."""
    import time as _time

    from stonkwhisperer_spark.sinks.writers import _committed_version

    head = _committed_version(table_path)
    deadline = _time.monotonic() + timeout_sec
    reached = -1
    try:
        while _time.monotonic() < deadline:
            exc = query.exception()
            if exc is not None:
                raise exc
            p = query.lastProgress
            if p and p.get("sources"):
                off = parse_offset(p["sources"][0].get("endOffset"))
                if off is not None:
                    reached = int(off.get("version", -1))
                    if reached >= head:
                        return reached
            _time.sleep(poll_sec)
        raise TimeoutError(
            f"stream did not catch up to commit version {head} at "
            f"{table_path} within {timeout_sec}s (reached {reached})"
        )
    finally:
        trace_progress(query, table_path)
        query.stop()
