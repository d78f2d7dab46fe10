"""End-to-end flows (SURVEY §3.1–3.3, build plan M3): the reference's
three Prefect flows re-expressed as single Spark jobs.

Reference flow shape (news_etl_flow.py / praw_etl_flow.py /
alpaca_etl_flow.py): extract → Celery fan-out fetch → transform →
S3 parquet → Databricks merge job. Here each flow is ONE lazy plan:
landing-zone read → pipeline transform → idempotent merge sink — no
cross-system hops, no hand-rolled 4-way splits (partitioning is the
fan-out), and the whole thing is restart-safe because the sink is
idempotent (re-running a flow inserts 0 rows).

FLOW_CONFIG mirrors the reference's core/constants.py:1-28 knobs.
Each flow returns the inserted-row count, like the reference's flows
return their record counts (flows/news_etl_flow.py:23) — the A5
"sum over batch results" surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from stonkwhisperer_spark.pipelines import clean_bars, clean_news, clean_posts
from stonkwhisperer_spark.sinks.writers import merge_append
from stonkwhisperer_spark.sources.landing import read_landing

# Reference core/constants.py:1-28 equivalents.
FLOW_CONFIG = {
    "news_categories": 5,          # NEWS_CATEGORIES keyword queries
    "subreddits": 5,               # SUBREDDIT list
    "tickers": 15,                 # TICKERS list
    "fetch_limit_per_flow": 100,   # DATA_FETCH_LIMIT_PER_FLOW
    "flairs": None,                # optional F1 source predicate
}


def news_flow(
    spark: SparkSession, landing_path: str, target_path: str, fmt: str = "parquet"
) -> int:
    """Landing news drops → clean_news → merge-append on url.
    One shuffle (url dedup window) + the merge anti-join."""
    raw = read_landing(spark, landing_path, "news", fmt=fmt)
    clean = clean_news(raw, order_col="_arrival_id")
    return merge_append(spark, target_path, clean, ["url"])


def posts_flow(
    spark: SparkSession,
    landing_path: str,
    target_path: str,
    flairs: list[str] | None = None,
    fmt: str = "parquet",
) -> int:
    """Landing reddit drops → clean_posts (optional F1 flair filter) →
    merge-append on reddit_id."""
    raw = read_landing(spark, landing_path, "posts", fmt=fmt)
    clean = clean_posts(raw, order_col="_arrival_id", flairs=flairs)
    return merge_append(spark, target_path, clean, ["reddit_id"])


def bars_flow(
    spark: SparkSession,
    landing_path: str,
    target_path: str,
    companies: DataFrame,
    fmt: str = "parquet",
) -> int:
    """Landing bar drops → clean_bars (coerce + gap-fill) → FK resolve
    + merge-append on (company_id, bar_ts), bar_date-partitioned."""
    from stonkwhisperer_spark.sinks.writers import upsert_bars

    raw = read_landing(spark, landing_path, "bars", fmt=fmt)
    clean = clean_bars(raw, tiebreak_col="_arrival_id")
    return upsert_bars(spark, target_path, clean, companies)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose every testdata table as a temp view so users can run
    plain ``spark.sql(...)`` — the SQL half of the DataFrame/SQL API
    surface."""
    from stonkwhisperer_spark.sources.tables import load_tables

    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
