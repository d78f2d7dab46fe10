"""Sessionization: gaps-and-islands session assignment over the event
stream — the classic per-user analytics rollup (extension beyond the
reference's operator set; SURVEY §2.6 notes it has no ranking ops)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from stonkwhisperer_spark.plans.registry import register
from stonkwhisperer_spark.sources.tables import load_table

_GAP_US = 600 * 1_000_000  # 10-minute inactivity closes a session (exact µs)


@register(
    "event_sessions",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, ts, event_id,
             epoch_us(ts) - epoch_us(lag(ts) OVER w) AS gap
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN gap IS NULL OR gap > {_GAP_US} THEN 1 ELSE 0 END AS new_sess
      FROM ordered
    ),
    numbered AS (
      SELECT user_id, ts, event_id,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM marked
    )
    SELECT user_id,
           cast(session_id AS bigint)  AS session_id,
           min(ts)                     AS session_start,
           max(ts)                     AS session_end,
           count(*)                    AS n_events
    FROM numbered
    GROUP BY user_id, session_id
    """,
)
def q_event_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sessionization (10-min inactivity gap) via
    gaps-and-islands: lag → new-session flag → running sum → rollup.
    Scale: ONE shuffle on user_id; both windows and the final aggregate
    share that partitioning (the groupBy keys include user_id), so
    Catalyst plans lag + running-sum + partial agg over a single
    exchange. Gaps compare in exact integer microseconds on both
    engines — no float boundary cases."""
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = us - F.lag(us).over(w)
    marked = events.select(
        "user_id",
        "ts",
        "event_id",
        F.when(gap.isNull() | (gap > _GAP_US), F.lit(1)).otherwise(F.lit(0)).alias("new_sess"),
    )
    run = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    numbered = marked.select(
        "user_id", "ts", F.sum("new_sess").over(run).cast("bigint").alias("session_id")
    )
    return numbered.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
    )
