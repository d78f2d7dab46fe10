"""Landing-zone readers (S1-S3 contract) + fetch adapter plumbing
(S4/S5): declared schemas, arrival ids, partition-batched fetch."""

from __future__ import annotations

from pyspark.sql import functions as F

from stonkwhisperer_spark.pipelines import clean_news
from stonkwhisperer_spark.schemas import RAW_NEWS_SCHEMA
from stonkwhisperer_spark.sources.fetch import fetch_url_content
from stonkwhisperer_spark.sources.landing import read_landing


def _drop_news(spark, path):
    rows = [
        (("s1", "Source One"), "an author", "T1", "desc", "https://e.com/1", None,
         "2024-03-01 10:00:00", "Body one."),
        (("s2", "Source Two"), None, "T2 headline", None, "https://e.com/2", None,
         "2024-03-02 11:00:00", None),
        (("s1", "Source One"), "an author", "T1-dup", "desc", "https://e.com/1", None,
         "2024-03-01 10:05:00", "Body dup."),
    ]
    spark.createDataFrame(rows, RAW_NEWS_SCHEMA).coalesce(1).write.parquet(path)


def test_read_landing_schema_and_pipeline(spark, tmp_path):
    path = str(tmp_path / "news_drop")
    _drop_news(spark, path)
    raw = read_landing(spark, path, "news")
    assert [f.name for f in raw.schema.fields[:-1]] == [f.name for f in RAW_NEWS_SCHEMA.fields]
    assert "_arrival_id" in raw.columns

    clean = clean_news(raw)
    rows = {r.url: r for r in clean.collect()}
    # url dedup kept one row per url; null content+description coalesced
    # down to the raw title (C2 chain)
    assert len(rows) == 2
    assert rows["https://e.com/2"].content == "T2 headline"
    assert rows["https://e.com/2"].author == "No Author"
    assert rows["https://e.com/1"].source_name == "Source One"
    assert rows["https://e.com/1"].published_at is not None


def test_fetch_url_content_stub(spark):
    df = spark.createDataFrame(
        [("https://x.com/a",), ("https://x.com/404",), ("https://x.com/a",)], "url string"
    )
    out = {r.url: r for r in fetch_url_content(df.repartition(2)).collect()}
    assert len(out) == 2  # distinct urls only
    assert out["https://x.com/a"].content is not None
    assert out["https://x.com/404"].content is None
    assert out["https://x.com/404"].fetch_status.endswith("404")
    # no per-row python: the stage is arrow-batched (MapInPandas /
    # ArrowEvalPython), never row-at-a-time BatchEvalPython
    plan = fetch_url_content(df)._jdf.queryExecution().toString()
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan
