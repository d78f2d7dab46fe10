"""Additional aggregation/set-operation breadth: pivot, decimal-exact
VWAP (the finance rollup a stock engine owes its users), and set
difference (the except-shaped complement of the anti-join family)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stonkwhisperer_spark.plans.registry import register
from stonkwhisperer_spark.sources.tables import load_table

DEC = "decimal(18,6)"

_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


# --------------------------------------------------------------------------
# Pivot: per-user event-type counts as columns (wide-format rollup).
# --------------------------------------------------------------------------
@register(
    "user_event_pivot",
    oracle=f"""
    SELECT user_id,
           {", ".join(f"count(CASE WHEN event_type = '{t}' THEN 1 END) AS {t}" for t in _EVENT_TYPES)}
    FROM events
    GROUP BY user_id
    """,
)
def q_user_event_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user counts pivoted to one column per event type. The value
    list is EXPLICIT — with it, Spark skips the extra distinct-values
    job and plans a single hash aggregation (map-side partials), same
    as a plain groupBy."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("user_id")
        .pivot("event_type", list(_EVENT_TYPES))
        .count()
        .na.fill(dict.fromkeys(_EVENT_TYPES, 0))
    )


# --------------------------------------------------------------------------
# VWAP: volume-weighted average price per minute bucket, decimal-exact.
# --------------------------------------------------------------------------
@register(
    "vwap_1min",
    oracle=f"""
    WITH ticks AS (
      SELECT date_trunc('minute', ts) AS bucket_ts, event_type,
             value AS price, (event_id % 1000) + 1 AS volume
      FROM events
    )
    SELECT bucket_ts, event_type,
           cast(sum(cast(price AS {DEC}) * cast(volume AS {DEC})) AS double)
             / cast(sum(cast(volume AS {DEC})) AS double)        AS vwap,
           cast(sum(cast(volume AS {DEC})) AS double)            AS total_volume
    FROM ticks
    GROUP BY bucket_ts, event_type
    """,
)
def q_vwap_1min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-weighted average price per (minute, type): both the
    price*volume numerator and the volume denominator accumulate as
    DECIMAL (associativity-proof), with ONE double division at the end
    — same single-shuffle shape as ohlcv_1min."""
    events = load_table(spark, sf_dir, "events")
    price = F.col("value").cast(DEC)
    volume = ((F.col("event_id") % 1000) + 1).cast(DEC)
    return (
        events.groupBy(
            F.date_trunc("minute", F.col("ts")).cast("timestamp_ntz").alias("bucket_ts"),
            "event_type",
        )
        .agg(
            (
                F.sum(price * volume).cast("double")
                / F.sum(volume).cast("double")
            ).alias("vwap"),
            F.sum(volume).cast("double").alias("total_volume"),
        )
    )


# --------------------------------------------------------------------------
# Set difference: users who clicked but never purchased (exceptAll's
# distinct cousin; completes the U-family beyond union U1).
# --------------------------------------------------------------------------
@register(
    "clickers_minus_buyers",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'click'
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
)
def q_clickers_minus_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct set difference): click users minus purchase
    users — DataFrame ``subtract``, planned as aggregate + anti-join on
    the high-cardinality user key (exceptAll exists for the multiset
    variant)."""
    events = load_table(spark, sf_dir, "events")
    clickers = events.filter(F.col("event_type") == "click").select("user_id")
    buyers = events.filter(F.col("event_type") == "purchase").select("user_id")
    return clickers.subtract(buyers)


# --------------------------------------------------------------------------
# Set intersection: users who both clicked AND purchased (completes the
# set-op family: union U1, except, intersect).
# --------------------------------------------------------------------------
@register(
    "clickers_and_buyers",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'click'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
)
def q_clickers_and_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct set intersection): users present in both the
    click and purchase populations — DataFrame ``intersect``, planned as
    aggregate + left-semi join on the high-cardinality user key."""
    events = load_table(spark, sf_dir, "events")
    clickers = events.filter(F.col("event_type") == "click").select("user_id")
    buyers = events.filter(F.col("event_type") == "purchase").select("user_id")
    return clickers.intersect(buyers)
