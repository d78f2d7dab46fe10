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


# --------------------------------------------------------------------------
# Funnel analysis: strictly-ordered view → click → purchase progression
# per user — the sequential-pattern family (not expressible as one
# groupBy; each stage conditions on the previous stage's timestamp).
# --------------------------------------------------------------------------
@register(
    "purchase_funnel",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS t FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS t
      FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t
      FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT (SELECT count(*) FROM v) AS n_viewed,
           (SELECT count(*) FROM c) AS n_clicked_after_view,
           (SELECT count(*) FROM p) AS n_purchased_after_click
    """,
)
def q_purchase_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-stage funnel with STRICT event-time ordering: users whose
    first view precedes a click that precedes a purchase. Each stage is
    earliest-qualifying-event-after-previous-stage — a per-user min
    aggregation joined forward, NOT a window over full history, so
    per-user state never exceeds one timestamp per stage.

    Scale: three user_id-partitioned shuffles (one per stage), each
    stage's frame shrinking monotonically (funnel property); the three
    1-row counts combine via broadcast cross joins, no collect. Strict
    '>' comparisons make stage attribution deterministic in exact
    microseconds."""
    events = load_table(spark, sf_dir, "events")

    def stage(event_type: str, after: DataFrame | None) -> DataFrame:
        e = events.filter(F.col("event_type") == event_type).select("user_id", "ts")
        if after is not None:
            e = e.join(after, "user_id").filter(F.col("ts") > F.col("t")).select(
                "user_id", "ts"
            )
        return e.groupBy("user_id").agg(F.min("ts").alias("t"))

    v = stage("view", None)
    c = stage("click", v)
    p = stage("purchase", c)
    return (
        v.agg(F.count("*").alias("n_viewed"))
        .crossJoin(F.broadcast(c.agg(F.count("*").alias("n_clicked_after_view"))))
        .crossJoin(F.broadcast(p.agg(F.count("*").alias("n_purchased_after_click"))))
    )


# --------------------------------------------------------------------------
# Cohort retention: users grouped by first-activity week × how many are
# active k weeks later — the classic retention-matrix rollup.
# --------------------------------------------------------------------------
@register(
    "weekly_cohort_retention",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      FROM events GROUP BY user_id
    ),
    active AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS activity_week
      FROM events
    )
    SELECT f.cohort_week,
           cast(date_diff('day', f.cohort_week, a.activity_week) / 7 AS int)
             AS week_offset,
           count(*) AS n_active_users
    FROM first_seen f JOIN active a USING (user_id)
    GROUP BY f.cohort_week, week_offset
    """,
)
def q_weekly_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention matrix: cohort = ISO week of each user's first event
    (both engines truncate weeks to Monday), cell = distinct users of
    that cohort active in week cohort+k. The offset divides an exact
    day difference (always a multiple of 7 after same-rule truncation)
    so no engine-specific week-counting semantics are involved.

    Scale: one user_id shuffle builds first-seen, one builds the
    distinct (user, week) activity set; the cohort join is user-keyed
    and the final rollup is low-cardinality (weeks × offsets) with
    map-side partials."""
    events = load_table(spark, sf_dir, "events")
    # to_date: DuckDB's date_trunc('week') yields DATE while Spark's
    # yields TIMESTAMP — align the output type engine-side.
    first_seen = events.groupBy("user_id").agg(
        F.to_date(F.date_trunc("week", F.min("ts"))).alias("cohort_week")
    )
    active = events.select(
        "user_id", F.to_date(F.date_trunc("week", "ts")).alias("activity_week")
    ).distinct()
    return (
        first_seen.join(active, "user_id")
        .select(
            "cohort_week",
            (F.datediff("activity_week", "cohort_week") / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count("*").alias("n_active_users"))
    )
