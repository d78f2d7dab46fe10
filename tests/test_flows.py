"""End-to-end flow integration (M3): landing drop → pipeline → merge
sink, idempotent on re-run — the full path a reference user runs."""

from __future__ import annotations

from pyspark.sql import functions as F

from stonkwhisperer_spark.flows import bars_flow, news_flow, posts_flow, register_views
from stonkwhisperer_spark.schemas import RAW_BARS_SCHEMA, RAW_NEWS_SCHEMA, RAW_POSTS_SCHEMA


def test_news_flow_end_to_end(spark, tmp_path):
    landing, target = str(tmp_path / "in"), str(tmp_path / "out")
    rows = [
        (("s", "S"), "a", "T1", "d", "https://e/1", None, "2024-03-01 10:00:00", "body one"),
        (("s", "S"), "a", "T2", "d", "https://e/2", None, "2024-03-01 11:00:00", "body two"),
        (("s", "S"), "a", "T1d", "d", "https://e/1", None, "2024-03-01 10:30:00", "dup url"),
    ]
    spark.createDataFrame(rows, RAW_NEWS_SCHEMA).coalesce(1).write.parquet(landing)
    assert news_flow(spark, landing, target) == 2
    # idempotence across flow re-runs (the reference's core invariant)
    assert news_flow(spark, landing, target) == 0
    out = spark.read.parquet(target)
    assert out.count() == 2 and "content_cleaned" in out.columns


def test_posts_flow_with_flair_filter(spark, tmp_path):
    landing, target = str(tmp_path / "in"), str(tmp_path / "out")
    rows = [
        ("t3_a", "r/s", "u", "T", "body", 1, 0, True, None, "DD", 0.9,
         "https://r/a", 1700000000, None, None, None, None, None, None),
        ("t3_b", "r/s", "u", "T", "body", 1, 0, True, None, "Meme", 0.9,
         "https://r/b", 1700000060, None, None, None, None, None, None),
    ]
    spark.createDataFrame(rows, RAW_POSTS_SCHEMA).coalesce(1).write.parquet(landing)
    assert posts_flow(spark, landing, target, flairs=["DD"]) == 1
    assert spark.read.parquet(target).collect()[0].reddit_id == "t3_a"


def test_bars_flow_fk_and_partitioning(spark, tmp_path):
    import os

    landing, target = str(tmp_path / "in"), str(tmp_path / "out")
    rows = [
        ("AAPL", "2024-01-02 09:30:00", "190.5", "191", "190", "190.8", "190.6", "100", "5"),
        ("AAPL", "2024-01-02 09:31:00", "N/A", "192", "190", "191.0", "190.9", "x", "6"),
        ("NOPE", "2024-01-02 09:30:00", "1", "1", "1", "1", "1", "1", "1"),
    ]
    spark.createDataFrame(rows, RAW_BARS_SCHEMA).coalesce(1).write.parquet(landing)
    companies = spark.createDataFrame([("c1", "AAPL")], "id string, ticker string")
    assert bars_flow(spark, landing, target, companies) == 2  # NOPE skipped
    out = spark.read.parquet(target)
    aapl_931 = [r for r in out.collect() if r.bar_ts.minute == 31][0]
    assert float(aapl_931.open) == 190.5  # 'N/A' coerced then gap-filled
    assert aapl_931.volume == 0  # 'x' coerced then 0-filled
    assert any(d.startswith("bar_date=") for d in os.listdir(target))
    assert bars_flow(spark, landing, target, companies) == 0


def test_register_views_sql_surface(spark):
    register_views(spark, "/root/testdata/sf0.001")
    n = spark.sql(
        "SELECT count(*) AS n FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
    ).collect()[0].n
    assert n > 0
