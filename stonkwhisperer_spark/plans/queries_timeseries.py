"""Time-series registered queries (SURVEY.md §2.6 W1–W4).

The signature reference op: sort by (symbol, timestamp), per-symbol
ffill/bfill of price columns, 0-fill of volume columns
(data_pipeline/tasks/transformation.py:206-215).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stonkwhisperer_spark.operators.gapfill import gap_fill
from stonkwhisperer_spark.plans.registry import register
from stonkwhisperer_spark.sources.tables import load_table


# --------------------------------------------------------------------------
# W1–W4 over the events table: null out a deterministic subset of values
# (the "gaps"), then per-user ffill → bfill → constant fill, ordered by
# (ts, event_id) — the tie-breaker SURVEY §7.4 requires for duplicate
# timestamps.
# --------------------------------------------------------------------------
@register(
    "gapfill_events",
    oracle="""
    WITH gappy AS (
      SELECT event_id, user_id, ts,
             CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END       AS price,
             CASE WHEN event_id % 5 = 0 THEN NULL
                  ELSE event_id % 1000 END                             AS volume
      FROM events
    )
    SELECT event_id, user_id, ts,
           coalesce(
             last_value(price IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             first_value(price IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
           )                                                           AS price,
           coalesce(volume, 0)                                         AS volume
    FROM gappy
    """,
)
def q_gapfill_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key gap-fill (W1–W4): ffill price gaps, bfill leading nulls,
    0-fill volume — reference transformation.py:206-215 as windows.
    Scale: one shuffle on user_id; both window frames share that
    partitioning+sort, so Catalyst plans a single Window exec; no global
    sort (W1's sort lives inside each key partition)."""
    events = load_table(spark, sf_dir, "events")
    gappy = events.select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_id") % 7 == 0, F.lit(None))
        .otherwise(F.col("value"))
        .alias("price"),
        F.when(F.col("event_id") % 5 == 0, F.lit(None))
        .otherwise(F.col("event_id") % 1000)
        .alias("volume"),
    )
    return gap_fill(
        gappy,
        keys=["user_id"],
        order=["ts", "event_id"],
        fill_cols=["price"],
        const_fill={"volume": 0},
    )
