"""Extension queries: as-of join (bars↔sentiment), JSON parsing (C14),
and date formatting/arithmetic rollups (C7/C8)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from stonkwhisperer_spark.operators.asof import asof_join
from stonkwhisperer_spark.plans.registry import register
from stonkwhisperer_spark.sources.tables import load_table

_D122 = "decimal(12,2)"


# --------------------------------------------------------------------------
# As-of join: minute bars pick up the latest sentiment score at or
# before the bar time (SURVEY §7.2 M5 extension; DuckDB oracle uses its
# native ASOF LEFT JOIN).
# --------------------------------------------------------------------------
@register(
    "asof_sentiment_bars",
    oracle="""
    WITH bars AS (
      SELECT date_trunc('minute', ts) AS bucket_ts, event_type,
             count(*) AS n_events
      FROM events GROUP BY 1, 2
    ),
    raw_sent AS (
      SELECT event_type, ts, value AS score, event_id
      FROM events WHERE event_id % 37 = 0
    ),
    sent AS (
      SELECT event_type, ts, score FROM (
        SELECT *, row_number() OVER (
                 PARTITION BY event_type, ts ORDER BY event_id DESC) AS rn
        FROM raw_sent
      ) WHERE rn = 1
    )
    SELECT b.event_type, b.bucket_ts, b.n_events, s.score AS last_sentiment
    FROM bars b ASOF LEFT JOIN sent s
      ON b.event_type = s.event_type AND b.bucket_ts >= s.ts
    """,
)
def q_asof_sentiment_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward-inclusive as-of join of minute bars to a sparse
    sentiment stream via the union+window construction: ONE shuffle +
    per-key sort over |bars|+|sentiment| — no range-join explosion.
    Right side pre-deduped per (key, ts) so the pick is deterministic."""
    events = load_table(spark, sf_dir, "events")
    bars = (
        events.groupBy(
            F.date_trunc("minute", F.col("ts")).cast("timestamp_ntz").alias("bucket_ts"),
            "event_type",
        ).agg(F.count("*").alias("n_events"))
    )
    raw_sent = events.filter(F.col("event_id") % 37 == 0).select(
        "event_type", "ts", F.col("value").alias("score"), "event_id"
    )
    w = W.partitionBy("event_type", "ts").orderBy(F.desc("event_id"))
    sent = (
        raw_sent.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("event_type", "ts", "score")
    )
    joined = asof_join(
        bars,
        sent,
        on=["event_type"],
        left_ts="bucket_ts",
        right_ts="ts",
        value_cols=["score"],
    )
    return joined.select(
        "event_type", "bucket_ts", "n_events", F.col("score").alias("last_sentiment")
    )


# --------------------------------------------------------------------------
# C14: JSON payload parsing (events.props carries a JSON object).
# --------------------------------------------------------------------------
@register(
    "events_props_parsed",
    oracle="""
    SELECT event_id,
           cast(json_extract_string(props, '$.k') AS int) AS k
    FROM events
    """,
)
def q_events_props_parsed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json over the props JSON column with an explicit schema
    (C14) — map-only; the parsed struct prunes to the single field."""
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id", F.from_json("props", "k int").getField("k").alias("k")
    )


# --------------------------------------------------------------------------
# C7/C8: date formatting + date arithmetic in a monthly rollup.
# --------------------------------------------------------------------------
@register(
    "orders_monthly",
    oracle=f"""
    SELECT cast(date_trunc('month', o_orderdate) AS timestamp)  AS month_ts,
           strftime(o_orderdate, '%Y-%m')                       AS month_str,
           min(cast(o_orderdate AS date) + 30)                  AS first_due_date,
           cast(sum(cast(o_totalprice AS {_D122})) AS double)   AS total_price,
           count(*)                                             AS n_orders
    FROM orders
    GROUP BY 1, 2
    """,
)
def q_orders_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly order rollup exercising date formatting (C7,
    date_format ≡ strftime) and date arithmetic (C8, +30 days) with
    decimal-exact totals. Single low-cardinality shuffle with map-side
    partials."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.date_trunc("month", F.col("o_orderdate")).cast("timestamp_ntz").alias("month_ts"),
            F.date_format("o_orderdate", "yyyy-MM").alias("month_str"),
        )
        .agg(
            F.min(F.date_add(F.col("o_orderdate").cast("date"), 30)).alias("first_due_date"),
            F.sum(F.col("o_totalprice").cast(_D122)).cast("double").alias("total_price"),
            F.count("*").alias("n_orders"),
        )
    )
