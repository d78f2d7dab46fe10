"""Registered analytics queries (SURVEY.md §2 inventory → Spark-first).

Conventions for oracle parity (see registry docstring):
* DECIMAL-exact aggregation: ``sum(cast(x as decimal(...)))`` then a
  final cast to double — associativity-proof, so Spark's partial aggs
  and DuckDB's single-threaded agg hash identically.
* Deterministic dedup/argmin: explicit tie-breaks on a unique key.
* Timestamps stay naive-UTC on both sides (parquet NTZ ↔ DuckDB naive).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from stonkwhisperer_spark.functions.text import (
    clean_text_for_nlp,
    clean_text_for_nlp_sql,
    token_count,
    token_count_sql,
)
from stonkwhisperer_spark.plans.registry import register
from stonkwhisperer_spark.sources.tables import load_table

DEC = "decimal(18,6)"  # exact carrier for double-valued measures


# --------------------------------------------------------------------------
# Flagship: minute-bar OHLCV construction (SURVEY §7.2 M0).
# Reference semantics: Alpaca delivers minute OHLCV per symbol
# (extraction.py:196-222); we rebuild the bars from the raw event stream —
# the operation the reference outsources to its vendor — with a tumbling
# window agg, the same shape Structured Streaming uses (§2.9).
# --------------------------------------------------------------------------
@register(
    "ohlcv_1min",
    # DuckDB has no arg_min over a composite ordering key, so the oracle
    # materializes the (ts, event_id) tie-break with row_number windows.
    oracle=f"""
    WITH e AS (
      SELECT date_trunc('minute', ts) AS bucket_ts, event_type, value,
             row_number() OVER (PARTITION BY date_trunc('minute', ts), event_type
                                ORDER BY ts, event_id)           AS rn_a,
             row_number() OVER (PARTITION BY date_trunc('minute', ts), event_type
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events
    )
    SELECT bucket_ts,
           event_type,
           max(CASE WHEN rn_a = 1 THEN value END)              AS open,
           max(value)                                          AS high,
           min(value)                                          AS low,
           max(CASE WHEN rn_d = 1 THEN value END)              AS close,
           cast(sum(cast(value AS {DEC})) AS double)           AS volume,
           count(*)                                            AS n_events
    FROM e
    GROUP BY 1, 2
    """,
)
def q_ohlcv_1min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-minute OHLCV per event_type over the events stream table.

    Scale: single shuffle on (minute, event_type); partial aggregation is
    map-side (min/max/min_by/max_by/sum all have partial merge), so the
    shuffle carries one row per group per mapper, not raw events.
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            # date_trunc yields session-tz TIMESTAMP; cast back to NTZ
            # (session is pinned UTC by load_table) to match the
            # naive-UTC oracle type.
            F.date_trunc("minute", F.col("ts")).cast("timestamp_ntz").alias("bucket_ts"),
            "event_type",
        )
        .agg(
            # Composite ordering key (ts, event_id) makes the open/close
            # pick deterministic even when two events share a timestamp.
            F.min_by("value", F.struct("ts", "event_id")).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", F.struct("ts", "event_id")).alias("close"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("volume"),
            F.count("*").alias("n_events"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q1-shaped pricing summary: the canonical scan→filter→agg plan the
# reference never had (it has no grouped aggregation at all — SURVEY §2.5);
# this is the headline relational benchmark query.
# --------------------------------------------------------------------------
_D122 = "decimal(12,2)"


@register(
    "pricing_summary",
    oracle=f"""
    SELECT l_returnflag,
           l_linestatus,
           cast(sum(cast(l_quantity AS {_D122})) AS double)       AS sum_qty,
           cast(sum(cast(l_extendedprice AS {_D122})) AS double)  AS sum_base_price,
           cast(sum(cast(l_extendedprice AS {_D122})
                    * cast(1 - l_discount AS {_D122})) AS double) AS sum_disc_price,
           cast(sum(cast(l_extendedprice AS {_D122})
                    * cast(1 - l_discount AS {_D122})
                    * cast(1 + l_tax AS {_D122})) AS double)      AS sum_charge,
           count(*)                                               AS count_order
    FROM lineitem
    WHERE l_shipdate <= timestamp '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary with decimal-exact money arithmetic.

    Scale: filter pushes to the parquet scan (PushedFilters on
    l_shipdate); 2-key groupBy has ~6 groups → map-side partials reduce
    the shuffle to a handful of rows per task.
    """
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast(_D122)
    disc = (F.lit(1) - F.col("l_discount")).cast(_D122)
    tax = (F.lit(1) + F.col("l_tax")).cast(_D122)
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast(_D122)).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * disc).cast("double").alias("sum_disc_price"),
            F.sum(price * disc * tax).cast("double").alias("sum_charge"),
            F.count("*").alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# F3: "newest first, limit 100" top-k (reference extraction.py:116-119) —
# Spark plans this as TakeOrderedAndProject (no global sort materialized).
# --------------------------------------------------------------------------
@register(
    "topk_newest_events",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value
    FROM events
    ORDER BY ts DESC, event_id DESC
    LIMIT 100
    """,
)
def q_topk_newest_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 newest events (source-side LIMIT F3). Deterministic
    tie-break on event_id. Scale: per-partition heap + single-reduce
    TakeOrderedAndProject — no full shuffle, no global sort."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.select("event_id", "ts", "user_id", "event_type", "value")
        .orderBy(F.desc("ts"), F.desc("event_id"))
        .limit(100)
    )


# --------------------------------------------------------------------------
# C1: clean_text_for_nlp as a pure codegen chain (reference
# transformation.py:278-291) + token counting extension.
# --------------------------------------------------------------------------
@register(
    "clean_documents",
    oracle=f"""
    SELECT doc_id,
           lang,
           {clean_text_for_nlp_sql("text")} AS text_cleaned,
           {token_count_sql("text")}        AS n_tokens
    FROM documents
    """,
)
def q_clean_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """clean_text_for_nlp (C1) + whitespace token count over documents.
    Map-only: no shuffle, stays inside WholeStageCodegen."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        "lang",
        clean_text_for_nlp("text").alias("text_cleaned"),
        token_count("text").alias("n_tokens"),
    )


# --------------------------------------------------------------------------
# A1/A2: dedup keep-first with deterministic victim selection (reference
# transformation.py:47-49 — pandas keep="first" in arrival order; here the
# stable key doc_id stands in for arrival order, per SURVEY §7.4).
#
# The dedup key is md5(text) — a HIGH-cardinality content hash, the same
# shape as the reference's natural keys (url at transformation.py:47-49,
# reddit_id at :108-112). A high-cardinality key is what makes the
# window-per-key plan scale: each key's partition holds a handful of rows,
# so the shuffle is uniform. (Low-cardinality keys go through
# dedup_low_card below — agg + semi-join, no per-key window.)
# --------------------------------------------------------------------------
@register(
    "dedup_keep_first",
    oracle="""
    SELECT doc_id, lang, source, n_chars
    FROM (
      SELECT doc_id, lang, source, n_chars,
             row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      FROM documents
    )
    WHERE rn = 1
    """,
)
def q_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-first exact-content dedup on md5(text) via row_number — the
    emulation of pandas drop_duplicates(keep='first') (A1/A2) and the
    exact-dedup stage of an LLM data pipeline.
    Scale: one hash shuffle on the content-hash key; high cardinality
    keeps the shuffle uniform and each window partition tiny."""
    docs = load_table(spark, sf_dir, "documents")
    w = W.partitionBy(F.md5(F.col("text").cast("binary"))).orderBy("doc_id")
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "source", "n_chars")
    )


# --------------------------------------------------------------------------
# Low-cardinality dedup variant: when the key has few distinct values
# (e.g. (lang, source) — dozens of groups), a window would sort each
# whole group on a single task. min()-aggregate + semi-join instead:
# map-side partial min makes the shuffle tiny, and the join back is a
# broadcast (the aggregated side is as small as the key space).
# --------------------------------------------------------------------------
@register(
    "dedup_low_card",
    oracle="""
    SELECT d.doc_id, d.lang, d.source, d.n_chars
    FROM documents d
    JOIN (SELECT min(doc_id) AS doc_id FROM documents GROUP BY lang, source) k
      ON d.doc_id = k.doc_id
    """,
)
def q_dedup_low_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-first dedup on the low-cardinality (lang, source) key via
    min(doc_id)-per-group + broadcast semi-join — avoids the
    single-task-per-group window sort a low-card window key would cause.
    Scale: partial-agg shuffle of ~|key space| rows, then a broadcast
    semi-join; no skewed window anywhere."""
    docs = load_table(spark, sf_dir, "documents")
    keepers = docs.groupBy("lang", "source").agg(F.min("doc_id").alias("doc_id"))
    return docs.join(
        F.broadcast(keepers.select("doc_id")), "doc_id", "left_semi"
    ).select("doc_id", "lang", "source", "n_chars")
